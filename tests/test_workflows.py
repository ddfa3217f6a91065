"""Workflow-surface tests: the reference's test-loop semantics (grace +
auto-reset, sb_rl.py:175-180), Cal01 stdout telemetry (cal01.py:31),
trajectory recording (RecordVideo analogue, sb_rl.py:502-507), and replay
padding for scenes with decorative bodies (env03_v1_fail.xml)."""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import balance_robot_tpu as brt


def _load_replay():
    path = pathlib.Path(__file__).parent.parent / "tools" / "replay.py"
    spec = importlib.util.spec_from_file_location("replay", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_replay_expand_frames_pads_and_drops_fail():
    replay = _load_replay()
    T, nq_rec = 40, 16
    qpos = np.zeros((T, nq_rec))
    qpos[:, 3] = 1.0                      # identity quat [w,x,y,z]
    qpos[:, 0] = 0.5                      # robot at x=0.5
    # tip past 50 deg about x from frame 25 (quat [cos, sin, 0, 0])
    a = np.radians(60.0)
    qpos[25:, 3] = np.cos(a / 2)
    qpos[25:, 4] = np.sin(a / 2)
    out = replay.expand_frames(qpos, "Env03-v1-fail", nq_rec + 7)
    assert out.shape == (T, 23)
    # parked before the fall (env03_v1_fail.py:95-97)
    np.testing.assert_allclose(out[:25, 16:19],
                               np.tile([10.0, 10.0, -2.0], (25, 1)))
    # dropping after: above the robot, z decreasing from 0.5
    np.testing.assert_allclose(out[25, 16:18], [0.5 - 0.3, 0.3])
    assert out[25, 18] == pytest.approx(0.5)
    assert out[30, 18] < out[26, 18]
    assert out[-1, 18] >= 0.06            # rests, never below the floor
    # non-fail env: padded but parked throughout
    out2 = replay.expand_frames(qpos, "Env03-v2", nq_rec + 7)
    np.testing.assert_allclose(out2[:, 16:19], [[10.0, 10.0, -2.0]] * T)
    # identical nq passes through, impossible padding raises
    assert replay.expand_frames(qpos, "Env03-v2", 16) is qpos
    with pytest.raises(ValueError, match="cannot pad"):
        replay.expand_frames(qpos, "Env03-v2", 20)
    with pytest.raises(ValueError, match="exceeds"):
        replay.expand_frames(qpos, "Env03-v2", 9)


def test_run_episodes_grace_and_telemetry(capsys):
    """`cli test -e Cal01` must print the per-step `time, vel_l, vel_r`
    CSV (the env's entire purpose, cal01.py:31) and keep stepping for 200
    grace iterations after termination before resetting
    (sb_rl.py:175-180)."""
    from balance_robot_tpu import cli

    env = brt.make("Cal01")
    env.use_fast_solver()
    calls = []

    def act(obs):
        calls.append(1)
        return np.zeros(2, np.float32)

    cli._run_episodes(env, act, episodes=1, max_steps=6000)
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    ep_lines = [l for l in lines if l.startswith("episode 0:")]
    assert len(ep_lines) == 1
    # Cal01 terminates at sim time > 1.0 s = 201 control steps
    assert "len=201" in ep_lines[0]
    # telemetry CSV: one row per step including the grace period
    csv_rows = [l for l in lines if l.count(",") == 2]
    assert len(csv_rows) == len(calls)
    assert 201 + cli.GRACE_STEPS <= len(csv_rows) <= 202 + cli.GRACE_STEPS
    t0, vl, vr = (float(x) for x in csv_rows[0].split(","))
    assert t0 == pytest.approx(0.005)
    # constant ctrl=20 spins the wheels up: by the end of the ramp the
    # wheel speeds must be well away from zero (motor-model calibration
    # signal, cal01.py:19-31)
    tN, vlN, vrN = (float(x) for x in csv_rows[200].split(","))
    assert abs(vlN) > 1.0 and abs(vrN) > 1.0


def test_record_episode_chunked():
    """record_episode must roll out in CHUNK-sized kernels (watchdog
    invariant) and return the trajectory truncated to the horizon."""
    from balance_robot_tpu.train import runner
    from balance_robot_tpu.models import mlp

    env = brt.make("Env01-v1")
    env.use_fast_solver()
    params = mlp.init_params(jax.random.PRNGKey(0))
    qpos, length = runner.record_episode(env, params,
                                         jax.random.PRNGKey(1),
                                         max_steps=300)
    assert qpos.shape[1] == 9
    assert qpos.shape[0] <= 300
    assert 1 <= length <= 300
    assert np.isfinite(qpos).all()
    # memoized evaluator: second call reuses the compiled chunk
    assert env._brt_record_evaluator is not None
    qpos2, _ = runner.record_episode(env, params, jax.random.PRNGKey(2),
                                     max_steps=300)
    assert qpos2.shape[1] == 9


def test_cli_record_every_flag_exposed():
    """--record-every is reachable from the product surface (round-1 gap:
    record_every defaulted to 0 and no flag set it -> movies/ stayed
    empty)."""
    from balance_robot_tpu import cli

    param = {p.name: p for p in cli.train.params}["record_every"]
    assert param.default == 10


def test_cli_platform_override():
    """--platform cpu forces the backend via jax.config.update from the
    group callback, so the whole CLI surface runs on hosts where the TPU
    tunnel is unreachable (the JAX_PLATFORMS env var is read too late:
    sitecustomize imports jax before any user code runs)."""
    import jax
    from click.testing import CliRunner

    from balance_robot_tpu import cli

    param = {p.name: p for p in cli.cli.params}["platform"]
    assert param.default is None          # default: jax's own backend pick

    # Reset, then check the group callback (which runs before subcommand
    # help) performs the update. Restore cpu for the rest of the suite.
    jax.config.update("jax_platforms", "")
    try:
        res = CliRunner().invoke(
            cli.cli, ["-a", "PPO", "--platform", "cpu", "test", "--help"])
        assert res.exit_code == 0
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", "cpu")


def test_cli_algorithms_match_factory():
    from balance_robot_tpu import cli
    from balance_robot_tpu.train import factory

    assert tuple(cli.ALGORITHMS) == tuple(factory.IMPLEMENTED)


def test_serial_act_protocol_roundtrip():
    """The HIL serial protocol (obs CSV out at 6 decimals, action CSV line
    back — reference sb_rl.py:418-437) exercised over a loopback transport:
    the MCU side is simulated by echoing a function of the parsed obs."""
    from balance_robot_tpu import cli

    class Loopback:
        def __init__(self):
            self.sent = []

        def write(self, data):
            row = [float(x) for x in data.decode().strip().split(",")]
            self.sent.append(row)
            # fake MCU: action = [-obs[0], obs[1]] clipped
            a = np.clip([-row[0], row[1]], -1, 1)
            self._resp = (",".join(f"{v:.4f}" for v in a) + "\r\n").encode()

        def readline(self):
            return self._resp

    ser = Loopback()
    act = cli._serial_act(ser)
    obs = np.array([0.5, -0.25, 0.125, 1.0, -1.0, 0.75], np.float32)
    a = act(obs)
    assert a.shape == (2,) and a.dtype == np.float32
    assert np.allclose(a, [-0.5, -0.25], atol=1e-4)
    # obs serialized at 6 decimals
    assert len(ser.sent[0]) == 6
    assert ser.sent[0] == pytest.approx(obs.tolist(), abs=1e-6)
