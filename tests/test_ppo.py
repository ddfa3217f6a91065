"""PPO trainer: SB3-default math (GAE, clipped loss, minibatch schedule),
iteration smoke test on a tiny config, sharded multi-device iteration on the
virtual CPU mesh, and a learnability smoke test on a trivial bandit-like env.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from balance_robot_tpu.models import mlp
from balance_robot_tpu.train.ppo import PPO, PPOConfig


def test_gae_matches_manual():
    env = _make_env01()
    cfg = PPOConfig(n_envs=2, n_steps=4, minibatch_size=4, n_epochs=1)
    ppo = PPO(env, cfg)
    # synthetic trajectory
    traj = {
        "value": jnp.array([[1.0, 2], [0.5, 1], [0.2, 0.5], [0.1, 0.2]]),
        "reward": jnp.array([[1.0, 0], [1, 0], [1, 1], [0, 1]]),
        "done": jnp.array([[False, False], [False, True],
                           [False, False], [True, False]]),
    }
    ts = ppo.init(jax.random.PRNGKey(0))
    last_val = mlp.value(ts.params, ts.last_obs)
    adv, ret = ppo._gae(ts, traj)
    # manual backward recursion (SB3 buffers.py semantics)
    g, lam = cfg.gamma, cfg.gae_lambda
    adv_m = np.zeros((4, 2))
    next_val = np.asarray(last_val)
    gae = np.zeros(2)
    for t in reversed(range(4)):
        nonterm = 1.0 - np.asarray(traj["done"][t], float)
        delta = (np.asarray(traj["reward"][t]) + g * next_val * nonterm
                 - np.asarray(traj["value"][t]))
        gae = delta + g * lam * nonterm * gae
        adv_m[t] = gae
        next_val = np.asarray(traj["value"][t])
    np.testing.assert_allclose(np.asarray(adv), adv_m, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret),
                               adv_m + np.asarray(traj["value"]), atol=1e-6)


def _make_env01():
    import balance_robot_tpu as brt
    return brt.make("Env01-v1")


def test_iteration_runs_and_params_move():
    env = _make_env01()
    cfg = PPOConfig(n_envs=2, n_steps=4, minibatch_size=8, n_epochs=1)
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(0))
    p0 = np.asarray(ts.params["pi_w1"]).copy()
    ts, metrics = ppo.iteration(ts)
    assert np.isfinite(float(metrics["loss"]))
    # SB3's explained_variance diagnostic (<= 1 by construction)
    assert float(metrics["explained_variance"]) <= 1.0 + 1e-6
    assert not np.allclose(np.asarray(ts.params["pi_w1"]), p0)


def test_privileged_critic_ppo():
    """Asymmetric actor-critic (PPOConfig.privileged_critic): the value net
    sees env.privileged(state) — Env03 block kinematics + attack-side hint —
    while the actor keeps the deployment 6-obs interface.  Warm start from a
    symmetric checkpoint zero-pads the critic (value initially unchanged);
    export slices the critic back to the actor width."""
    import balance_robot_tpu as brt

    env = brt.make("Env03-v2")
    env.use_fast_solver()
    cfg = PPOConfig(n_envs=2, n_steps=4, minibatch_size=4, n_epochs=1,
                    privileged_critic=True)
    ppo = PPO(env, cfg)
    assert ppo.priv_dim == 8
    # warm start from a symmetric checkpoint: padded value fn is identical
    # wherever the privileged features are zero
    sym = mlp.init_params(jax.random.PRNGKey(0))
    ts = ppo.init(jax.random.PRNGKey(1), params=sym)
    assert ts.params["vf_w1"].shape == (6 + 8, 64)
    obs = jnp.linspace(-1, 1, 18).reshape(3, 6)
    np.testing.assert_allclose(
        np.asarray(mlp.value(ts.params, jnp.concatenate(
            [obs, jnp.zeros((3, 8))], axis=-1))),
        np.asarray(mlp.value(sym, obs)), rtol=1e-6)
    ts2, m = ppo.iteration(ts)
    assert np.isfinite(float(m["loss"]))
    # the privileged rows actually receive gradient (the block is live from
    # reset, so the features are nonzero in the rollout)
    assert float(jnp.abs(ts2.params["vf_w1"][6:]).sum()) > 0.0
    # deployment path: slice back to the 6-obs interface
    dep = mlp.deployable_params(ts2.params)
    assert dep["vf_w1"].shape[0] == 6
    assert mlp.policy_mean(dep, obs[0]).shape == (2,)
    # and a symmetric re-init from the wide checkpoint shrinks it back
    ppo_sym = PPO(env, PPOConfig(n_envs=2, n_steps=4, minibatch_size=4,
                                 n_epochs=1))
    ts3 = ppo_sym.init(jax.random.PRNGKey(2), params=ts2.params)
    assert ts3.params["vf_w1"].shape[0] == 6


def test_privileged_features_env03():
    """env.privileged: (8,) finite features; reset fires the block so the
    geometry is live (parked flag 0) and Env03-v2's per-instance attack
    side surfaces as the +-1 hint."""
    import balance_robot_tpu as brt

    env = brt.make("Env03-v2")
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    p = np.asarray(env.privileged(state))
    assert p.shape == (8,) and np.isfinite(p).all()
    assert p[6] == 0.0                  # block flying at reset, not parked
    assert abs(p[7]) == 1.0             # fixed attack side: +-1 hint
    # block on the 0.3 m spawn circle -> normalized rel pos magnitude ~1
    assert 0.5 < np.linalg.norm(p[0:2]) < 1.5


def test_sharded_iteration_multichip():
    """Full train step over the 8-device virtual mesh (the dryrun path)."""
    import balance_robot_tpu as brt
    from balance_robot_tpu.parallel import mesh as pm
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = pm.make_mesh(jax.devices()[:8])
    env = _make_env01()
    cfg = PPOConfig(n_envs=16, n_steps=2, minibatch_size=8, n_epochs=1)
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(0))
    ts = pm.shard_train_state(ts, mesh, 16)
    with mesh:
        ts, metrics = ppo.iteration(ts)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated, env batch stays sharded
    assert len(ts.params["pi_w1"].sharding.device_set) == 8


def test_evaluate_chunked():
    """evaluate runs as host-chunked kernels (one device program per 250
    control steps — a full 6000-step episode in one kernel trips the TPU
    watchdog) and respects termination/masking."""
    env = _make_env01()
    cfg = PPOConfig(n_envs=2, n_steps=2, minibatch_size=4, n_epochs=1)
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(0))
    ret, length = ppo.evaluate(ts.params, 3, jax.random.PRNGKey(1),
                               max_steps=300)
    assert np.isfinite(float(ret))
    assert 1 <= float(length) <= 300


def test_evaluate_detail_exact_max_steps():
    """evaluate_detail truncates returns AND lengths exactly at max_steps
    even though chunks are fixed-length kernels (the round-2 version let
    returns include the overshoot tail of the last chunk)."""
    from balance_robot_tpu.train.evaluation import ChunkedEvaluator

    class UnitRewardEnv:
        """Never terminates, reward 1.0/step — return must equal length."""
        max_episode_steps = 6000

        def reset(self, key):
            return jnp.zeros(()), jnp.zeros(6)

        def step(self, state, action):
            return state + 1.0, jnp.zeros(6), jnp.float32(1.0), \
                jnp.asarray(False), jnp.asarray(False)

    ev = ChunkedEvaluator(UnitRewardEnv(), lambda p, o: jnp.zeros((o.shape[0],
                                                                   2)))
    # 300 is not a multiple of the 250-step chunk: old code returned 500.0
    rets, lens = ev.evaluate_detail(None, jax.random.split(
        jax.random.PRNGKey(0), 3), max_steps=300)
    np.testing.assert_array_equal(rets, np.full(3, 300.0))
    np.testing.assert_array_equal(lens, np.full(3, 300))


def test_algorithm_factory():
    from balance_robot_tpu.train.factory import algorithm_factory
    env = _make_env01()
    trainer, cfg = algorithm_factory("A2C", env, n_envs=4)
    assert cfg.clip_range is None and cfg.n_epochs == 1
    assert cfg.optimizer == "rmsprop" and cfg.gae_lambda == 1.0
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, metrics = trainer.iteration(ts)
    assert np.isfinite(float(metrics["loss"]))
    with pytest.raises(ValueError, match="unknown algorithm"):
        algorithm_factory("DQN", env)


def test_offpolicy_trainers():
    """SAC / TD3 / DDPG: one iteration each on tiny configs; finite params,
    buffer writes, deterministic eval."""
    from balance_robot_tpu.train.factory import algorithm_factory
    env = _make_env01()
    for algo in ("SAC", "TD3", "DDPG"):
        tr, cfg = algorithm_factory(algo, env, n_envs=4, buffer_size=1024,
                                    batch_size=16, learning_starts=1,
                                    train_freq=2, gradient_steps=1)
        ts = tr.init(jax.random.PRNGKey(0))
        ts, m = tr.iteration(ts)
        ts, m = tr.iteration(ts)
        assert int(ts.buffer.ptr) == 16          # 2 iters x 2 steps x 4 envs
        assert np.isfinite(float(m["critic_loss"]))
        assert all(bool(jnp.isfinite(x).all())
                   for x in jax.tree.leaves(ts.params)), algo
        # the chunked rollout machinery is shared (train/evaluation.py), so
        # one full evaluate (SAC) covers it; the per-algorithm DETERMINISTIC
        # act branch differs (SAC tanh-mean vs TD3/DDPG actor w/o noise) and
        # is exercised directly for all three without paying three rollout
        # compiles.
        obs_batch = jnp.zeros((3, 6), jnp.float32).at[:, 0].set(
            jnp.array([-0.5, 0.0, 0.5]))
        a_det = tr._act(ts.params, obs_batch, None, deterministic=True)
        assert a_det.shape == (3, 2), algo
        assert bool(jnp.isfinite(a_det).all()), algo
        assert bool((jnp.abs(a_det) <= 1.0).all()), algo
        if algo == "SAC":
            r, L = tr.evaluate(ts.params, 2, jax.random.PRNGKey(1),
                               max_steps=250)
            assert np.isfinite(float(r))


def test_offpolicy_privileged_critic():
    """Asymmetric Q critics (OffPolicyConfig.privileged_critic): Q sees
    [obs, act, env.privileged(state)]; the buffer stores priv/next_priv;
    a symmetric checkpoint warm-starts by zero-padding the trailing rows
    (Q initially identical where priv = 0)."""
    import balance_robot_tpu as brt
    from balance_robot_tpu.train.factory import algorithm_factory

    env = brt.make("Env03-v2")
    env.use_fast_solver()
    tr, cfg = algorithm_factory("SAC", env, n_envs=2, buffer_size=256,
                                batch_size=8, learning_starts=1,
                                train_freq=2, gradient_steps=1,
                                privileged_critic=True)
    assert tr.priv_dim == 8
    ts = tr.init(jax.random.PRNGKey(0))
    assert ts.params["q1"][0]["w"].shape[0] == 6 + 2 + 8
    assert ts.buffer.priv.shape == (256, 8)
    ts, m = tr.iteration(ts)
    ts, m = tr.iteration(ts)
    assert np.isfinite(float(m["critic_loss"]))
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree.leaves(ts.params))
    # warm start from a symmetric checkpoint: zero-pad -> identical Q at
    # priv = 0
    sym = tr._init_params(jax.random.PRNGKey(1))
    sym_q1 = [{**l, "w": l["w"][:8]} if i == 0 else l
              for i, l in enumerate(sym["q1"])]
    ts2 = tr.init(jax.random.PRNGKey(2),
                  params={"actor": sym["actor"], "q1": sym_q1,
                          "q2": sym["q2"], "log_alpha": sym["log_alpha"]})
    assert ts2.params["q1"][0]["w"].shape[0] == 16
    obs = jnp.ones((3, 6))
    act = jnp.full((3, 2), 0.3)
    np.testing.assert_allclose(
        np.asarray(tr._q(ts2.params["q1"], obs, act, jnp.zeros((3, 8)))),
        np.asarray(_apply_mlp_q(sym_q1, jnp.concatenate([obs, act], -1))),
        rtol=1e-6)


def _apply_mlp_q(params, x):
    from balance_robot_tpu.train.offpolicy import _apply_mlp
    return _apply_mlp(params, x)[..., 0]


def test_checkpoint_nested_roundtrip(tmp_path):
    from balance_robot_tpu.train import checkpoint as ck
    from balance_robot_tpu.train.factory import algorithm_factory
    env = _make_env01()
    tr, _ = algorithm_factory("SAC", env, n_envs=2, buffer_size=64,
                              batch_size=8)
    ts = tr.init(jax.random.PRNGKey(0))
    ck.save(tmp_path / "p", ts.params)
    back = ck.load_into(tmp_path / "p", ts.params)
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_offpolicy_warm_start():
    """`-m` curriculum for SAC/TD3/DDPG (reference algorithm_class.load,
    sb_rl.py:524): online nets load, targets re-seed from them, and a
    non-matching checkpoint fails loudly instead of silently starting
    fresh (round-1 behavior)."""
    from balance_robot_tpu.train.factory import algorithm_factory

    env = _make_env01()
    tr, _ = algorithm_factory("TD3", env, n_envs=2, buffer_size=128,
                              batch_size=8, learning_starts=1,
                              train_freq=1, gradient_steps=1)
    ts = tr.init(jax.random.PRNGKey(0))
    saved = jax.tree.map(np.asarray, ts.params)
    ts2 = tr.init(jax.random.PRNGKey(9), params=saved)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ts2.params["actor"])[0]),
        np.asarray(jax.tree.leaves(saved["actor"])[0]))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ts2.params["q1_t"])[0]),
        np.asarray(jax.tree.leaves(ts2.params["q1"])[0]))
    with pytest.raises(ValueError, match="missing networks"):
        tr.init(jax.random.PRNGKey(1), params={"pi_w1": np.zeros((6, 64))})


def test_privileged_obs_teacher_wrapper():
    """PrivilegedObsEnv (the TEACHER's view): obs = [obs6, privileged8];
    a zero-row-padded warm start reproduces the 6-obs policy exactly, and a
    full PPO iteration on the wrapped env runs and moves the padded rows."""
    import balance_robot_tpu as brt
    from balance_robot_tpu.envs.privileged import PrivilegedObsEnv

    base = brt.make("Env03-v2")
    env = PrivilegedObsEnv(base)
    assert env.obs_dim == base.obs_dim + base.priv_dim == 14
    # wrapped obs: first 6 entries are the deployment obs, the rest the
    # privileged features of the SAME state
    key = jax.random.PRNGKey(3)
    s, o = env.reset(key)
    _, o6 = base.reset(key)
    np.testing.assert_allclose(np.asarray(o[:6]), np.asarray(o6))
    np.testing.assert_allclose(np.asarray(o[6:]),
                               np.asarray(base.privileged(s)))
    s2, o2, r, term, trunc = env.step(s, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(o2[6:]),
                               np.asarray(base.privileged(s2)))
    # delegation: env-instance properties still drive auto-reset carries
    assert hasattr(env, "carry_across_reset")
    assert env.max_episode_steps == base.max_episode_steps

    # zero-padded warm start == incumbent policy on every reachable state
    p6 = mlp.init_params(jax.random.PRNGKey(0), 6, 2)
    p14 = mlp.pad_privileged_actor(p6, env.obs_dim)
    assert p14["pi_w1"].shape[0] == 14
    np.testing.assert_allclose(
        np.asarray(mlp.policy_mean(p14, o)),
        np.asarray(mlp.policy_mean(p6, o[:6])), atol=1e-7)

    cfg = PPOConfig(n_envs=2, n_steps=4, minibatch_size=8, n_epochs=1)
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(1),
                  params=mlp.pad_privileged_critic(p14, env.obs_dim))
    rows0 = np.asarray(ts.params["pi_w1"][6:]).copy()
    ts, metrics = ppo.iteration(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(ts.params["pi_w1"][6:]), rows0)


def test_net2net_widen_exact_and_alive():
    """net2net_widen: the widened net computes EXACTLY the original
    policy/value on any input (new input rows zero, new-unit outgoing
    zero), and every new block becomes trainable (nonzero grads reach the
    new outgoing rows at the first step)."""
    p6 = mlp.init_params(jax.random.PRNGKey(0), 6, 2)
    pw = mlp.net2net_widen(p6, jax.random.PRNGKey(1), obs_dim=14,
                           hidden=256, vf_obs_dim=14)
    assert pw["pi_w1"].shape == (14, 256) and pw["vf_w1"].shape == (14, 256)
    obs14 = jax.random.normal(jax.random.PRNGKey(2), (32, 14))
    np.testing.assert_allclose(
        np.asarray(mlp.policy_mean(pw, obs14)),
        np.asarray(mlp.policy_mean(p6, obs14[:, :6])), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mlp.value(pw, obs14)),
        np.asarray(mlp.value(p6, obs14[:, :6])), atol=1e-5)
    # aliveness: a supervised step produces nonzero grads on the new
    # outgoing rows (they'd be identically zero in a naive zero-block embed)
    def loss(p):
        return jnp.mean(mlp.policy_mean(p, obs14) ** 2) + jnp.mean(
            mlp.value(p, obs14) ** 2)
    g = jax.grad(loss)(pw)
    assert float(jnp.abs(g["pi_wout"][64:]).max()) > 0
    assert float(jnp.abs(g["vf_wout"][64:]).max()) > 0
