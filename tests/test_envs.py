"""Env suite behavior: registry, vec auto-reset, Env02 friction DR,
Env03 block events, Cal01, move-env machinery (with an injected inner
policy).  All on CPU with tiny shapes — fast contract tests, not physics
parity (tests/test_physics_parity.py covers that)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.envs.vector import VecEnv


def test_registry_matches_reference_ids():
    ids = brt.env_ids()
    for ref_id in ["Env01-v1", "Env01-v2", "Env01-v3", "Env02-v1",
                   "Env03-v1", "Env03-v1-fail", "Env03-v2", "Cal01"]:
        assert ref_id in ids
    env = brt.make("Env03-v2")
    assert env.max_episode_steps == 1200       # balance_robot/__init__.py:50
    assert brt.make("Env01-v1").max_episode_steps == 6000


def test_env01_step_contract():
    env = brt.make("Env01-v1")
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (6,)
    state, obs, r, term, trunc = jax.jit(env.step)(
        state, jnp.array([0.5, -0.5]))
    assert obs.shape == (6,) and obs.dtype == jnp.float32
    assert not bool(trunc)


def test_vec_autoreset():
    env = brt.make("Env01-v1")
    vec = VecEnv(env, 4)
    states, obs = vec.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 6)
    # force truncation via the step counter -> auto-reset must zero t
    states = states._replace(
        t=jnp.full(4, env.max_episode_steps - 1, jnp.int32))
    states, out = vec.step(states, jnp.zeros((4, 2)))
    assert bool(out.truncated.all())
    assert bool(out.done.all())
    assert np.all(np.asarray(states.t) == 0)            # fresh episodes
    assert out.terminal_obs.shape == (4, 6)


def test_env02_friction_in_state():
    env = brt.make("Env02-v1")
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    states, _ = jax.vmap(env.reset)(keys)
    fr = np.asarray(states.aux["friction"])
    assert fr.min() >= 0.5 and fr.max() <= 1.0 and fr.std() > 0.05


def test_env03_block_spawn_and_events():
    env = brt.make("Env03-v1")
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(1))
    qpos = np.asarray(jnp.stack(state.phys.qpos))
    qvel = np.array(jnp.stack(state.phys.qvel))   # writable copy
    # block spawned on the 0.3 m circle with |v| = 5 (env03_v1.py:88-114)
    r = np.linalg.norm(qpos[9:11] - qpos[0:2])
    assert abs(r - 0.3) < 0.02
    assert abs(np.linalg.norm(qvel[8:11]) - 5.0) < 1e-3
    assert qpos[11] == pytest.approx(0.15)
    # slow block gets parked at (10,10,0) at the next step
    qvel[8:11] = 0.0
    state = state._replace(phys=state.phys._replace(qvel=tuple(qvel)))
    state2, *_ = jax.jit(env.step)(state, jnp.zeros(2))
    qpos2 = np.asarray(jnp.stack(state2.phys.qpos))
    assert np.allclose(qpos2[9:11], [10, 10], atol=1e-6)
    assert bool(state2.aux["delay_started"])


def test_env03_v2_attack_side_persists():
    env = brt.make("Env03-v2")
    vec = VecEnv(env, 8)
    states, _ = vec.reset(jax.random.PRNGKey(3))
    side0 = np.asarray(states.aux["attack_front"]).copy()
    # force done and auto-reset: the per-instance attack side must persist
    states = states._replace(
        t=jnp.full(8, env.max_episode_steps - 1, jnp.int32))
    states, out = vec.step(states, jnp.zeros((8, 2)))
    assert bool(out.done.all())
    np.testing.assert_array_equal(
        np.asarray(states.aux["attack_front"]), side0)


def test_vecenv_autoreset_reanchors_fd_state():
    """Auto-reset must leave the fd pitch_dot state anchored to the FRESH
    episode's initial pitch at t=0 — the reference's reset_model calls
    _get_obs, which unconditionally re-anchors last_pitch/last_time
    (RobotBaseEnv.py:154-155).  A carry of the dead episode's last_pitch
    (the old behavior) made the first post-reset fd step an O(±300) spike
    in an obs whose normal range is ±4."""
    from balance_robot_tpu.envs.base import pitch_of

    env = brt.make("Env01-v1")
    env.use_fast_solver()
    vec = VecEnv(env, 4)
    states, _ = vec.reset(jax.random.PRNGKey(5))
    # force truncation on the next step -> auto-reset
    states = states._replace(
        t=jnp.full(4, env.max_episode_steps - 1, jnp.int32))
    states, out = vec.step(states, jnp.zeros((4, 2)))
    assert bool(out.done.all())
    p_new = np.asarray(pitch_of([q for q in states.phys.qpos]))
    np.testing.assert_allclose(np.asarray(states.last_pitch), p_new,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(states.last_t), 0.0, atol=1e-9)
    # and the first step of the fresh episode produces a sane obs[1]
    states, out = vec.step(states, jnp.zeros((4, 2)))
    assert np.abs(np.asarray(out.obs[:, 1])).max() < 50.0


def test_cal01_constant_ctrl():
    env = brt.make("Cal01")
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state, obs, r, term, trunc = jax.jit(env.step)(state,
                                                   jnp.array([0.7, -0.7]))
    t, vl, vr = env.telemetry(state)
    # constant ctrl=20 regardless of action: wheels spin up positively
    assert float(vl) > 1.0 and float(vr) > 1.0
    assert not bool(term)


def test_move_env_machinery():
    from balance_robot_tpu.envs.move import EnvMove05, lidar_distances
    from balance_robot_tpu.models import mlp
    from balance_robot_tpu.ops import quant
    params = mlp.init_params(jax.random.PRNGKey(0))
    env = EnvMove05(inner_policy=quant.quantize_policy(params))
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (10,)
    # lidar slots zeroed (reference WIP behavior, RobotMoveBaseEnv:347-359)
    assert np.all(np.asarray(obs[2:]) == 0.0)
    state, obs, r, term, trunc = jax.jit(env.step)(state,
                                                   jnp.array([0.5, 0.0]))
    assert np.isfinite(float(r))
    # lidar: robot at the center of the corridor sees the +-0.25 walls at
    # ~0.24 for side rays but range-limits to 0.3 after correction
    d = np.asarray(lidar_distances(jnp.array([0., 0, 0, 1, 0, 0, 0, 0, 0])))
    assert d.shape == (8,)
    assert np.all(d >= 0) and np.all(d <= 0.3)


def test_move_lidar_sees_wall():
    from balance_robot_tpu.envs.move import lidar_distances
    # robot near the x=+0.24 wall, heading +x (ray middle dir local +y...):
    # place it rotated so rays point at the wall: heading s.t. local +y -> +x
    # quat for Rz(-pi/2): (cos(-pi/4), 0, 0, sin(-pi/4))
    qpos = jnp.array([0.1, 0.0, 0.0,
                      jnp.cos(-jnp.pi / 4), 0.0, 0.0, jnp.sin(-jnp.pi / 4),
                      0.0, 0.0])
    d = np.asarray(lidar_distances(qpos))
    # wall surface at x = 0.24 -> middle rays ~0.14
    assert d[3] < 0.2 and d[4] < 0.2


def test_move_env_packaged_inner_policy():
    """The packaged int8 inner-policy artifact (envs/assets/inner_policy
    .brq.npz, generated by tools/make_inner_policy.py from the flagship
    balance checkpoint) loads by default and balances the robot for 60
    control steps (reference ships RobotMovePolicy.tflite the same way,
    RobotMoveBaseEnv.py:81-97)."""
    import balance_robot_tpu as brt
    env = brt.make("EnvMove05-v1")      # default ctor -> packaged artifact
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    for _ in range(60):
        state, obs, r, term, trunc = step(state, jnp.array([0.3, 0.0]))
    assert bool(jnp.isfinite(obs).all())
    assert not bool(term)               # inner policy keeps it upright


def test_env01_v2_obs_pitch_noise_bounded():
    """Env01-v2 adds U(-0.025, 0.025) rad noise inside get_pitch
    (env01_v2.py:16-20); the obs pitch slot must differ from the true
    kinematic pitch by at most 0.025 rad and must actually vary."""
    from balance_robot_tpu.envs import base
    env = brt.make("Env01-v2")
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    diffs = []
    for _ in range(10):
        state, obs, r, term, trunc = step(state, jnp.zeros(2))
        true_pitch = float(base.pitch_of(jnp.stack(state.phys.qpos)))
        diffs.append(float(obs[0]) * 0.25 - true_pitch)   # PITCH_MAX=0.25
    diffs = np.array(diffs)
    assert np.all(np.abs(diffs) <= 0.025 + 1e-6)
    assert np.std(diffs) > 1e-4          # noise is actually drawn per step


def test_env01_v3_schedule_and_sensor_bias():
    """Env01-v3: per-episode delay_target_speed in +-(10,20) and pitch bias
    +-2 deg (env01_v3.py:44-52); target speed follows the time schedule
    1x / -1x / 2x / 3x checked on sim time (env01_v3.py:28-36)."""
    from balance_robot_tpu.envs import base
    env = brt.make("Env01-v3")
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(2))
    dts = float(state.aux["delay_target_speed"])
    off = float(state.aux["pitch_offset"])
    assert 10.0 <= abs(dts) <= 20.0
    assert abs(off) <= 0.0349066 + 1e-9
    # sensor bias applied in _pitch
    qpos = jnp.stack(state.phys.qpos)
    biased = float(env._pitch(state, qpos, jax.random.PRNGKey(0)))
    assert np.isclose(biased - float(base.pitch_of(qpos)), off, atol=1e-6)
    # schedule: construct states at given sim times via the step counter
    dt = 0.005                            # 250 substeps x 2e-5 s
    for t_sim, expect in [(0.5, 0.0), (1.5, dts), (3.5, -dts),
                          (5.0, 2 * dts), (6.0, 3 * dts)]:
        st = state._replace(t=jnp.int32(round(t_sim / dt)))
        st = env._update_targets(st)
        assert np.isclose(float(st.target_wheel_speed), expect, atol=1e-5), \
            (t_sim, expect, float(st.target_wheel_speed))
