"""algorithm_factory: the reference's per-algorithm construction surface
(sb_rl.py:40-83) re-expressed for the on-device trainers.

The reference validates the `-a` name against stable_baselines3 and builds
PPO (all defaults), DDPG (custom net + NormalActionNoise), or a generic
MlpPolicy algorithm. Here:

  * PPO — SB3-default on-policy trainer (train/ppo.py); recommended, as in
    the reference README.
  * A2C — same trainer with SB3 A2C defaults: plain policy gradient
    (no ratio clip), n_steps 5 (scaled by the env batch), a single epoch
    over the whole batch, gae_lambda 1.0, lr 7e-4 RMSprop(alpha .99,
    eps 1e-5), no advantage normalization.
  * SAC / TD3 / DDPG — off-policy; not yet implemented on-device. The
    factory raises with a clear message (the reference README itself ships
    only PPO-trained artifacts and notes SAC's int8 export is broken,
    README.md:168-195).

Unknown names raise ValueError, mirroring the reference's getattr check
(sb_rl.py:576-578).
"""

from .ppo import PPO, PPOConfig

KNOWN = ("PPO", "A2C", "SAC", "TD3", "DDPG")
IMPLEMENTED = ("PPO", "A2C")


def algorithm_factory(name, env, n_envs=1024, n_steps=None,
                      minibatch_size=None, **overrides):
    """Returns (trainer, config) for the given algorithm name."""
    if name not in KNOWN:
        raise ValueError(
            f"unknown algorithm {name!r} (reference accepts SB3 names; "
            f"known: {KNOWN})")
    if name == "PPO":
        cfg = PPOConfig(n_envs=n_envs,
                        n_steps=n_steps or 64,
                        minibatch_size=minibatch_size or 4096,
                        **overrides)
    elif name == "A2C":
        ns = n_steps or 5                      # SB3 A2C default n_steps=5
        cfg = PPOConfig(n_envs=n_envs, n_steps=ns,
                        minibatch_size=minibatch_size or n_envs * ns,
                        n_epochs=1, clip_range=None, gae_lambda=1.0,
                        lr=overrides.pop("lr", 7e-4), optimizer="rmsprop",
                        normalize_advantage=False, **overrides)
    else:
        raise NotImplementedError(
            f"{name} is an off-policy SB3 algorithm; the on-device "
            f"implementations currently cover {IMPLEMENTED} (the reference "
            "recommends PPO and ships only PPO artifacts)")
    return PPO(env, cfg), cfg
