"""On-device off-policy trainers: SAC, TD3, DDPG (SB3-default semantics).

The reference's algorithm_factory builds these through SB3 (sb_rl.py:40-83):
PPO/others all-default, DDPG with net_arch pi=[300,200] qf=[200,150] and
NormalActionNoise(sigma=0.1). The README notes SAC trains well (but its int8
export hits an unsupported Exp op) while A2C/TD3 train poorly
(README.md:168-195). Here the whole loop — env collection over the vmapped
VecEnv, a circular on-device replay buffer, and the critic/actor/alpha
updates — is one jitted iteration; nothing leaves the chip.

SB3 defaults implemented:
  SAC : squashed diagonal Gaussian actor (256-256 ReLU), twin Q, soft target
        tau=0.005, lr 3e-4, batch 256, buffer 1e6, auto entropy tuning with
        target entropy -act_dim, train_freq=1 (per vec-env step) with
        gradient_steps = 1.
  TD3 : deterministic actor (400-300 ReLU in SB3; here SB3's actual default
        net_arch [400,300]), twin Q, policy delay 2, target smoothing noise
        0.2 clipped 0.5, exploration NormalActionNoise(0.1) as the reference
        uses for DDPG.
  DDPG: TD3 machinery with policy_delay=1, no target smoothing, single set
        of reference-factory nets pi=[300,200] qf=[200,150], Normal noise
        sigma=0.1 (sb_rl.py:45-61).
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..envs.vector import VecEnv
from . import evaluation

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


# ------------------------------------------------------------------ nets

def _init_mlp(key, sizes, out_dim):
    """sizes = (input_dim, h1, h2, ...); fan-in uniform init (torch
    Linear default, what SB3 uses for its off-policy nets)."""
    layer_dims = list(sizes) + [out_dim]
    ks = jax.random.split(key, len(layer_dims) - 1)
    params = []
    for i in range(len(layer_dims) - 1):
        bound = 1.0 / jnp.sqrt(layer_dims[i])
        w = jax.random.uniform(ks[i], (layer_dims[i], layer_dims[i + 1]),
                               minval=-bound, maxval=bound)
        params.append({"w": w, "b": jnp.zeros(layer_dims[i + 1])})
    return params


def _apply_mlp(params, x, final_tanh=False):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
        elif final_tanh:
            x = jnp.tanh(x)
    return x


# ------------------------------------------------------------------ config

@dataclass(frozen=True)
class OffPolicyConfig:
    algo: str = "SAC"                 # SAC | TD3 | DDPG
    n_envs: int = 256
    buffer_size: int = 1_000_000
    batch_size: int = 256
    learning_starts: int = 100        # TRANSITIONS (env steps summed over
                                      # all envs) before updates, matching
                                      # SB3's num_timesteps semantics
    train_freq: int = 1               # env steps per iteration
    gradient_steps: int = 1           # updates per env step
    lr: float = 3e-4                  # SAC; TD3/DDPG use 1e-3 (SB3)
    tau: float = 0.005
    gamma: float = 0.99
    # SAC entropy tuning
    ent_coef_auto: bool = True
    init_alpha: float = 1.0
    # TD3/DDPG
    action_noise: float = 0.1         # reference factory NormalActionNoise
    target_noise: float = 0.2
    target_noise_clip: float = 0.5
    policy_delay: int = 2
    actor_hidden: tuple = (256, 256)
    critic_hidden: tuple = (256, 256)
    privileged_critic: bool = False   # asymmetric critics: Q sees
                                      # [obs, act, env.privileged(state)]
                                      # (training-only; actor keeps the
                                      # deployment obs interface — mirrors
                                      # train/ppo.py privileged_critic)


def default_config(algo, n_envs=256, **overrides):
    algo = algo.upper()
    if algo == "SAC":
        cfg = OffPolicyConfig(algo="SAC", n_envs=n_envs, **overrides)
    elif algo == "TD3":
        cfg = OffPolicyConfig(algo="TD3", n_envs=n_envs,
                              lr=overrides.pop("lr", 1e-3),
                              actor_hidden=(400, 300),
                              critic_hidden=(400, 300), **overrides)
    elif algo == "DDPG":
        # reference factory: pi [300,200], qf [200,150], noise sigma .1
        cfg = OffPolicyConfig(algo="DDPG", n_envs=n_envs,
                              lr=overrides.pop("lr", 1e-3),
                              actor_hidden=(300, 200),
                              critic_hidden=(200, 150),
                              policy_delay=1, target_noise=0.0,
                              target_noise_clip=0.0, **overrides)
    else:
        raise ValueError(algo)
    return cfg


class Buffer(NamedTuple):
    obs: jnp.ndarray
    act: jnp.ndarray
    rew: jnp.ndarray
    next_obs: jnp.ndarray
    done: jnp.ndarray      # terminated only (truncation bootstraps, SB3
    ptr: jnp.ndarray       # total transitions written
    # handle_timeout_termination semantics)
    priv: jnp.ndarray      # (cap, priv_dim) critic-only features at obs
    next_priv: jnp.ndarray  # ... and at next_obs ((cap, 0) when symmetric)


class OPTrainState(NamedTuple):
    params: Any            # dict: actor, q1, q2, q1_t, q2_t, log_alpha
    opt_actor: Any
    opt_critic: Any
    opt_alpha: Any
    buffer: Buffer
    env_states: Any
    last_obs: jnp.ndarray
    key: jnp.ndarray
    steps: jnp.ndarray     # global env steps
    grad_steps: jnp.ndarray


class OffPolicy:
    def __init__(self, env, config: OffPolicyConfig):
        self.env = env
        self.cfg = config
        # asymmetric critics only where the env exposes features
        self.priv_dim = (getattr(env, "priv_dim", 0)
                         if config.privileged_critic else 0)
        self.vec = VecEnv(env, config.n_envs, with_priv=self.priv_dim > 0)
        self.opt_a = optax.adam(config.lr)
        self.opt_c = optax.adam(config.lr)
        self.opt_al = optax.adam(config.lr)
        self.target_entropy = -float(env.act_dim)
        self._evaluator = None  # lazy ChunkedEvaluator (see evaluate)

    def _priv(self, env_states):
        """(B, priv_dim) critic-only features for the states that produced
        the current obs; (B, 0) when symmetric (zero-width concat keeps one
        code path, as in train/ppo.py)."""
        if self.priv_dim == 0:
            return jnp.zeros((self.cfg.n_envs, 0), jnp.float32)
        return jax.vmap(self.env.privileged)(env_states)

    # ------------------------------------------------------------ params
    def _init_params(self, key):
        cfg = self.cfg
        ko, k1, k2 = jax.random.split(key, 3)
        od, ad = self.env.obs_dim, self.env.act_dim
        qin = od + ad + self.priv_dim   # priv LAST so symmetric warm
        # starts zero-pad the tail rows (cf. mlp.pad_privileged_critic)
        actor_out = 2 * ad if cfg.algo == "SAC" else ad
        return {
            "actor": _init_mlp(ko, (od,) + cfg.actor_hidden, actor_out),
            "q1": _init_mlp(k1, (qin,) + cfg.critic_hidden, 1),
            "q2": _init_mlp(k2, (qin,) + cfg.critic_hidden, 1),
            "log_alpha": jnp.log(jnp.float32(cfg.init_alpha)),
        }

    def _adapt_q_width(self, qp):
        """Resize a loaded Q net's first layer to this trainer's input
        width: zero-pad new trailing (privileged) rows — Q initially
        identical, gradient flows in from the first update — or slice a
        wider checkpoint back down for a symmetric run."""
        qin = self.env.obs_dim + self.env.act_dim + self.priv_dim
        w = qp[0]["w"]
        if w.shape[0] < qin:
            pad = jnp.zeros((qin - w.shape[0], w.shape[1]), w.dtype)
            qp = [{**qp[0], "w": jnp.concatenate([w, pad], axis=0)},
                  *qp[1:]]
        elif w.shape[0] > qin:
            qp = [{**qp[0], "w": w[:qin]}, *qp[1:]]
        return qp

    def init(self, key, params=None):
        """Fresh train state; `params` warm-starts from a prior run of the
        SAME algorithm (the reference's `-m` curriculum mechanism,
        algorithm_class.load at sb_rl.py:524).  Missing target networks are
        re-seeded from the loaded online networks."""
        cfg = self.cfg
        kp, ke, kk = jax.random.split(key, 3)
        if params is None:
            params = self._init_params(kp)
        else:
            base = self._init_params(kp)
            loaded = {k: jax.tree.map(jnp.asarray, v)
                      for k, v in params.items()}
            missing = {k for k in ("actor", "q1", "q2")
                       if k not in loaded}
            if missing:
                raise ValueError(
                    f"warm-start params are missing networks {sorted(missing)}"
                    f" — not a {cfg.algo} checkpoint?")
            for qk in ("q1", "q2"):
                loaded[qk] = self._adapt_q_width(loaded[qk])
            params = {**base, **loaded}
        params["q1_t"] = jax.tree.map(lambda x: x, params["q1"])
        params["q2_t"] = jax.tree.map(lambda x: x, params["q2"])
        if cfg.algo == "SAC":
            params["actor_t"] = params["actor"]  # unused; keeps tree static
        else:
            params["actor_t"] = jax.tree.map(lambda x: x, params["actor"])
        env_states, obs = self.vec.reset(ke)
        cap = cfg.buffer_size
        od, ad = self.env.obs_dim, self.env.act_dim
        buf = Buffer(obs=jnp.zeros((cap, od)), act=jnp.zeros((cap, ad)),
                     rew=jnp.zeros(cap), next_obs=jnp.zeros((cap, od)),
                     done=jnp.zeros(cap), ptr=jnp.int32(0),
                     priv=jnp.zeros((cap, self.priv_dim)),
                     next_priv=jnp.zeros((cap, self.priv_dim)))
        return OPTrainState(
            params=params, opt_actor=self.opt_a.init(params["actor"]),
            opt_critic=self.opt_c.init((params["q1"], params["q2"])),
            opt_alpha=self.opt_al.init(params["log_alpha"]),
            buffer=buf, env_states=env_states, last_obs=obs, key=kk,
            steps=jnp.int32(0), grad_steps=jnp.int32(0))

    # ------------------------------------------------------------- actor
    def _sac_dist(self, params, obs):
        out = _apply_mlp(params["actor"], obs)
        mean, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std

    def _sac_sample(self, params, obs, key):
        mean, log_std = self._sac_dist(params, obs)
        std = jnp.exp(log_std)
        z = mean + std * jax.random.normal(key, mean.shape)
        a = jnp.tanh(z)
        # tanh-squash log-prob correction (SB3 SquashedDiagGaussian)
        logp = jnp.sum(-0.5 * ((z - mean) / std) ** 2 - log_std
                       - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
        logp = logp - jnp.sum(jnp.log(1.0 - a * a + 1e-6), axis=-1)
        return a, logp

    def _act(self, params, obs, key, deterministic=False):
        cfg = self.cfg
        if cfg.algo == "SAC":
            if deterministic:
                mean, _ = self._sac_dist(params, obs)
                return jnp.tanh(mean)
            a, _ = self._sac_sample(params, obs, key)
            return a
        a = _apply_mlp(params["actor"], obs, final_tanh=True)
        if not deterministic:
            a = a + cfg.action_noise * jax.random.normal(key, a.shape)
        return jnp.clip(a, -1.0, 1.0)

    def _q(self, qp, obs, act, priv=None):
        parts = [obs, act] if priv is None else [obs, act, priv]
        return _apply_mlp(qp, jnp.concatenate(parts, -1))[..., 0]

    # ------------------------------------------------------------ collect
    def _collect(self, ts: OPTrainState, n_steps):
        cfg = self.cfg
        B = cfg.n_envs
        cap = cfg.buffer_size

        def step_fn(carry, _):
            ts = carry
            key, k = jax.random.split(ts.key)
            # uniform random actions before learning_starts (SB3 warmup).
            # SB3 compares num_timesteps = TRANSITIONS across all envs;
            # ts.steps counts vectorized steps, so scale by n_envs.
            a_pol = self._act(ts.params, ts.last_obs, k)
            a_rand = jax.random.uniform(k, a_pol.shape, minval=-1.0,
                                        maxval=1.0)
            a = jnp.where(ts.steps * cfg.n_envs < cfg.learning_starts,
                          a_rand, a_pol)
            # critic-only features aligned with last_obs (pre-step states)
            cur_priv = self._priv(ts.env_states)
            env_states, out = self.vec.step(ts.env_states, a)
            # true next obs: pre-reset terminal obs when done
            nxt = jnp.where(out.done[:, None], out.terminal_obs, out.obs)
            nxt_priv = jnp.where(out.done[:, None], out.terminal_priv,
                                 self._priv(env_states))
            idx = (ts.buffer.ptr + jnp.arange(B)) % cap
            buf = ts.buffer._replace(
                obs=ts.buffer.obs.at[idx].set(ts.last_obs),
                act=ts.buffer.act.at[idx].set(a),
                rew=ts.buffer.rew.at[idx].set(out.reward),
                next_obs=ts.buffer.next_obs.at[idx].set(nxt),
                done=ts.buffer.done.at[idx].set(
                    out.terminated.astype(jnp.float32)),
                ptr=ts.buffer.ptr + B,
                priv=ts.buffer.priv.at[idx].set(cur_priv),
                next_priv=ts.buffer.next_priv.at[idx].set(nxt_priv))
            ts = ts._replace(env_states=env_states, last_obs=out.obs,
                             key=key, buffer=buf, steps=ts.steps + 1)
            return ts, out.reward.mean()

        ts, rews = jax.lax.scan(step_fn, ts, None, length=n_steps)
        return ts, rews.mean()

    # ------------------------------------------------------------- update
    def _update(self, ts: OPTrainState, key):
        cfg = self.cfg
        p = ts.params
        cap = cfg.buffer_size
        n_valid = jnp.minimum(ts.buffer.ptr, cap)
        k_idx, k_t, k_a = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (cfg.batch_size,), 0,
                                 jnp.maximum(n_valid, 1))
        obs = ts.buffer.obs[idx]
        act = ts.buffer.act[idx]
        rew = ts.buffer.rew[idx]
        nxt = ts.buffer.next_obs[idx]
        done = ts.buffer.done[idx]
        priv = ts.buffer.priv[idx]          # (batch, 0) when symmetric
        nxt_priv = ts.buffer.next_priv[idx]
        alpha = jnp.exp(p["log_alpha"])

        # ---- target actions / values
        if cfg.algo == "SAC":
            na, nlogp = self._sac_sample(p, nxt, k_t)
            qt = jnp.minimum(self._q(p["q1_t"], nxt, na, nxt_priv),
                             self._q(p["q2_t"], nxt, na, nxt_priv)
                             ) - alpha * nlogp
        else:
            na = _apply_mlp(p["actor_t"], nxt, final_tanh=True)
            if cfg.target_noise > 0:
                eps = jnp.clip(
                    cfg.target_noise * jax.random.normal(k_t, na.shape),
                    -cfg.target_noise_clip, cfg.target_noise_clip)
                na = jnp.clip(na + eps, -1.0, 1.0)
            qt = jnp.minimum(self._q(p["q1_t"], nxt, na, nxt_priv),
                             self._q(p["q2_t"], nxt, na, nxt_priv))
        y = rew + cfg.gamma * (1.0 - done) * qt

        def critic_loss(qs):
            q1p, q2p = qs
            l1 = jnp.mean((self._q(q1p, obs, act, priv) - y) ** 2)
            l2 = jnp.mean((self._q(q2p, obs, act, priv) - y) ** 2)
            return l1 + l2

        cl, cgrads = jax.value_and_grad(critic_loss)((p["q1"], p["q2"]))
        cupd, opt_c = self.opt_c.update(cgrads, ts.opt_critic)
        q1, q2 = optax.apply_updates((p["q1"], p["q2"]), cupd)
        p = {**p, "q1": q1, "q2": q2}

        # ---- actor (+ alpha) update, gated by policy_delay for TD3
        do_actor = (ts.grad_steps % cfg.policy_delay) == 0

        if cfg.algo == "SAC":
            def actor_loss(ap):
                a, logp = self._sac_sample({**p, "actor": ap}, obs, k_a)
                q = jnp.minimum(self._q(p["q1"], obs, a, priv),
                                self._q(p["q2"], obs, a, priv))
                return jnp.mean(alpha * logp - q), logp

            (al, logp), agrads = jax.value_and_grad(
                actor_loss, has_aux=True)(p["actor"])
        else:
            def actor_loss(ap):
                a = _apply_mlp(ap, obs, final_tanh=True)
                return -jnp.mean(self._q(p["q1"], obs, a, priv)), jnp.zeros(
                    cfg.batch_size)

            (al, logp), agrads = jax.value_and_grad(
                actor_loss, has_aux=True)(p["actor"])
        agrads = jax.tree.map(
            lambda g: jnp.where(do_actor, g, jnp.zeros_like(g)), agrads)
        aupd, opt_a = self.opt_a.update(agrads, ts.opt_actor)
        actor = optax.apply_updates(p["actor"], aupd)
        p = {**p, "actor": actor}

        # ---- entropy coefficient (SAC auto)
        if cfg.algo == "SAC" and cfg.ent_coef_auto:
            def alpha_loss(la):
                return -jnp.mean(jnp.exp(la) * (jax.lax.stop_gradient(
                    logp) + self.target_entropy))

            all_, algrad = jax.value_and_grad(alpha_loss)(p["log_alpha"])
            alupd, opt_al = self.opt_al.update(algrad, ts.opt_alpha)
            log_alpha = optax.apply_updates(p["log_alpha"], alupd)
            p = {**p, "log_alpha": log_alpha}
        else:
            opt_al = ts.opt_alpha

        # ---- soft target updates (actor target only for TD3/DDPG)
        tau = cfg.tau
        soft = lambda t, s: jax.tree.map(
            lambda a, b: (1 - tau) * a + tau * b, t, s)
        p = {**p, "q1_t": soft(p["q1_t"], p["q1"]),
             "q2_t": soft(p["q2_t"], p["q2"])}
        if cfg.algo != "SAC":
            actor_t = jax.tree.map(
                lambda a, b: jnp.where(do_actor, (1 - tau) * a + tau * b, a),
                p["actor_t"], p["actor"])
            p = {**p, "actor_t": actor_t}

        ts = ts._replace(params=p, opt_actor=opt_a, opt_critic=opt_c,
                         opt_alpha=opt_al, grad_steps=ts.grad_steps + 1)
        return ts, dict(critic_loss=cl, actor_loss=al,
                        alpha=jnp.exp(p["log_alpha"]))

    # ----------------------------------------------------------- iterate
    @partial(jax.jit, static_argnums=0)
    def iteration(self, ts: OPTrainState):
        """cfg.train_freq env steps across the vec env + gradient updates
        (gradient_steps per env step, SB3 train_freq semantics)."""
        cfg = self.cfg
        ts, mean_rew = self._collect(ts, cfg.train_freq)

        def upd(carry, key):
            ts = carry
            ts, m = self._update(ts, key)
            return ts, m

        key, k = jax.random.split(ts.key)
        ts = ts._replace(key=key)
        n_upd = cfg.train_freq * cfg.gradient_steps
        keys = jax.random.split(k, n_upd)
        # SB3 gates updates on num_timesteps (transitions), not vec steps
        do = ts.steps * cfg.n_envs >= cfg.learning_starts

        def maybe_upd(carry, kk):
            ts = carry
            ts2, m = self._update(ts, kk)
            ts = jax.tree.map(lambda a, b: jnp.where(do, a, b), ts2, ts)
            return ts, m

        ts, metrics = jax.lax.scan(maybe_upd, ts, keys)
        out = {k2: v.mean() for k2, v in metrics.items()}
        out["mean_step_reward"] = mean_rew
        return ts, out

    # -------------------------------------------------------------- eval
    def evaluate(self, params, n_episodes, key, max_steps=None):
        """Deterministic-policy eval via the shared chunked rollout
        (train/evaluation.py owns the TPU-watchdog chunking invariant)."""
        if self._evaluator is None:
            self._evaluator = evaluation.ChunkedEvaluator(
                self.env,
                lambda p, o: self._act(p, o, None, deterministic=True))
        return self._evaluator.evaluate(params, n_episodes, key, max_steps)
