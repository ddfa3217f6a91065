"""CLI — the reference sb_rl.py workflow surface, TPU-native.

Same command set and defaults (reference sb_rl.py:559-605): global options
`-a/--algorithm` and `-m/--model`, commands train / test / convert /
test-onnx / test-tflite / test-tflite-quant / test-tflite-arduino, default
model path `models/{env}_{algo}/best_model` (sb_rl.py:98,150), folders
models/ logs/ movies/ created up front (sb_rl.py:596-600).

TPU-native extensions: `--num-envs/--rollout-steps` for the batched engine,
`quantize` (replaces the out-of-repo quantize_tflite.py + docker step with a
single command), and trajectory recording instead of a live GL viewer
(replay with tools/replay.py on a host with rendering).

Run:  python -m balance_robot_tpu.cli -a PPO train -e Env01-v2
"""

import json
import pathlib
import sys

import click
import numpy as np

# Literal so `--help` etc. never import jax/optax (train.factory pulls in
# the trainers); must match train.factory.IMPLEMENTED — asserted by
# tests/test_envs.py.  (README notes SAC quantizes badly, A2C/TD3 poor.)
ALGORITHMS = ("PPO", "A2C", "SAC", "TD3", "DDPG")
MODEL_DIR = "models"
LOG_DIR = "logs"
MOVIE_DIR = "movies"


def _make_folders():
    for d in (MODEL_DIR, LOG_DIR, MOVIE_DIR):
        pathlib.Path(d).mkdir(exist_ok=True)


def _default_model(env, algo):
    return f"{MODEL_DIR}/{env}_{algo}/best_model"


@click.group()
@click.option("-a", "--algorithm", required=True,
              help="RL algorithm (native: PPO)")
@click.option("-m", "--model", required=False, default=None,
              help="model file (warm start / inference)")
@click.option("--platform", type=click.Choice(["tpu", "cpu"]), default=None,
              help="force the JAX backend (cpu runs everywhere, e.g. when "
                   "no accelerator is reachable; default: jax's own pick)")
@click.pass_context
def cli(ctx, algorithm, model, platform):
    if platform is not None:
        # Must happen before any backend use; config.update (not the
        # JAX_PLATFORMS env var) because the interpreter's sitecustomize
        # hook has already imported jax by the time we run.
        import jax

        jax.config.update("jax_platforms", platform)
    algo = algorithm.upper()
    if algo not in ALGORITHMS:
        raise click.ClickException(
            f"algorithm {algorithm!r} not available natively; "
            f"choose from {ALGORITHMS}")
    ctx.ensure_object(dict)
    ctx.obj["ALGORITHM_NAME"] = algo
    ctx.obj["MODEL_PATH"] = model
    _make_folders()


@cli.command()
@click.option("-e", "--env", "env_id", required=True)
@click.option("--num-envs", default=1024, show_default=True)
@click.option("--rollout-steps", default=32, show_default=True)
@click.option("--minibatch", default=1024, show_default=True)
@click.option("--seed", default=0, show_default=True)
@click.option("--total-timesteps", default=int(1e10), show_default=True)
@click.option("--max-wall", default=None, type=float)
@click.option("--gamma", default=0.99, show_default=True,
              help="discount (SB3 default 0.99; 0.999 recommended at TPU "
                   "scale - the massively parallel exploration otherwise "
                   "finds the pitch*dv reward exploit, see docs)")
@click.option("--eval-freq", default=200_000, show_default=True,
              help="global env steps between evals")
@click.option("--resume", is_flag=True, default=False,
              help="continue from <run dir>/resume_state.npz (full "
                   "params+opt+env+rng restore after preemption)")
@click.option("--lr", default=3e-4, show_default=True)
@click.option("--epochs", default=10, show_default=True,
              help="PPO epochs per iteration (SB3 default 10; 3-4 "
                   "recommended when fine-tuning a warm start)")
@click.option("--solver", type=click.Choice(["fast", "exact"]),
              default="fast", show_default=True,
              help="constraint-solver grade: fast = training (2x speed, "
                   "1.5e-8 qpos parity over 10k substeps), exact = "
                   "machine-exact vs MuJoCo")
@click.option("--physics", type=click.Choice(["pallas", "xla"]),
              default="pallas", show_default=True,
              help="pallas = fused 250-substep TPU control-step kernel "
                   "(5.7x on 8-dof scenes, 8.2x on the Env03 block scenes); "
                   "xla = reference path (required on CPU)")
@click.option("--record-every", default=10, show_default=True,
              help="capture a deterministic eval trajectory to movies/ "
                   "every N evals (0 = off) — the RecordVideo analogue "
                   "(reference records every 50 episodes, sb_rl.py:502-507);"
                   " render with tools/replay.py")
@click.option("--privileged-critic", is_flag=True, default=False,
              help="asymmetric critics: the value net (PPO/A2C) or Q nets "
                   "(SAC/TD3/DDPG) also see the env's privileged features "
                   "(Env03: block kinematics in the heading frame) — "
                   "training-only; the deployed policy keeps the 6-obs "
                   "interface and export slices the critic back")
@click.pass_context
def train(ctx, env_id, num_envs, rollout_steps, minibatch, seed,
          total_timesteps, max_wall, gamma, eval_freq, resume, lr, epochs,
          solver, physics, record_every, privileged_critic):
    """Train (warm start with -m = the curriculum mechanism)."""
    import balance_robot_tpu as brt
    from .train.ppo import PPOConfig
    from .train import runner, checkpoint

    env = brt.make(env_id)
    if solver == "fast":
        env.use_fast_solver()
    if physics == "pallas" and hasattr(env, "use_pallas_physics"):
        try:
            env.use_pallas_physics()
        except NotImplementedError as e:
            click.echo(f"pallas physics unavailable for {env_id}: {e}; "
                       "using the XLA path")
    algo = ctx.obj["ALGORITHM_NAME"]
    init = None
    if ctx.obj["MODEL_PATH"]:
        init = checkpoint.load(ctx.obj["MODEL_PATH"])
        click.echo(f"warm start from {ctx.obj['MODEL_PATH']}")
    trainer = None
    if algo == "A2C":
        from .train.factory import algorithm_factory
        _, cfg = algorithm_factory("A2C", env, n_envs=num_envs, gamma=gamma,
                                   privileged_critic=privileged_critic)
    elif algo in ("SAC", "TD3", "DDPG"):
        from .train.factory import algorithm_factory
        trainer, cfg = algorithm_factory(algo, env, n_envs=num_envs,
                                         gamma=gamma,
                                         privileged_critic=privileged_critic)
    else:
        cfg = PPOConfig(n_envs=num_envs, n_steps=rollout_steps,
                        minibatch_size=minibatch, gamma=gamma, lr=lr,
                        n_epochs=epochs,
                        privileged_critic=privileged_critic)
    runner.train(env, cfg, seed=seed, total_timesteps=total_timesteps,
                 init_params=init, max_wall_s=max_wall, eval_freq=eval_freq,
                 run_name=f"{env_id}_{algo}", resume=resume,
                 trainer=trainer, record_every=record_every)


@cli.command("bc-init")
@click.option("-e", "--env", "env_id", required=True)
@click.option("--out", default=None,
              help="output npz (default models/bc_init_<env>.npz)")
@click.option("--gamma", default=0.999, show_default=True)
@click.option("--log-std", default=-1.0, show_default=True)
@click.option("--seed", default=0, show_default=True)
@click.pass_context
def bc_init(ctx, env_id, out, gamma, log_std, seed):
    """Stage 0 of the curriculum: clone the PD balance expert into the
    policy MLP as a PPO warm start (see README's gamma note)."""
    import jax
    import balance_robot_tpu as brt
    from .train import bc, checkpoint

    env = brt.make(env_id)
    cfg = bc.BCConfig(gamma=gamma, log_std=log_std)
    params = bc.fit(env, cfg, jax.random.PRNGKey(seed), verbose=True)
    out = out or f"models/bc_init_{env_id}.npz"
    checkpoint.save(out, params)
    click.echo(f"saved {out} — train with -m {out}")


GRACE_STEPS = 200   # post-termination viewer steps before auto-reset
                    # (reference sb_rl.py:175-180)


def _run_episodes(env, act_fn, episodes, max_steps, show_io=False,
                  record=None, show_i=False):
    """Shared inference loop for the test-* commands (reference
    sb_rl.py:163-182): deterministic episodes with returns printed at
    termination, then GRACE_STEPS further physics steps (the reference
    keeps the viewer stepping so a fall plays out) before auto-resetting
    into the next episode.  show_io logs every 30th step like the
    reference (sb_rl.py:168-171).  Optionally records the qpos trajectory
    for tools/replay.py.  Envs exposing `telemetry(state)` (Cal01) get
    their `time, vel_l, vel_r` CSV rows printed every step — the
    reference's stdout-as-telemetry calibration workflow (cal01.py:31)."""
    import jax
    import jax.numpy as jnp

    step = jax.jit(env.step)
    reset = jax.jit(env.reset)
    key = jax.random.PRNGKey(0)
    traj = []
    telemetry = getattr(env, "telemetry", None)
    for ep in range(episodes):
        key, k = jax.random.split(key)
        state, obs = reset(k)
        ret, t, done_at = 0.0, 0, None
        while t < max_steps + GRACE_STEPS + 1:
            action = act_fn(np.asarray(obs))
            if show_io and t % 30 == 0:
                click.echo(f"obs={np.asarray(obs)} action={action}")
            if show_i and t % 30 == 0:
                # reference --show-i: obs in Python list syntax, ready to
                # paste into a quantization envelope (sb_rl.py:170-171)
                click.echo(str([float(v) for v in np.asarray(obs)]) + ",")
            state, obs, r, term, trunc = step(state, jnp.asarray(action))
            if record is not None:
                traj.append(np.asarray(jnp.stack(state.phys.qpos)))
            if telemetry is not None:
                tt, vl, vr = (float(x) for x in telemetry(state))
                click.echo(f"{tt:.6f}, {vl:.6f}, {vr:.6f}")
            t += 1
            if done_at is None:
                ret += float(r)
                if bool(term) or bool(trunc):
                    done_at = t
                    click.echo(f"episode {ep}: return={ret:.1f} len={t}")
            elif t - done_at > GRACE_STEPS:
                break
        if done_at is None:
            click.echo(f"episode {ep}: return={ret:.1f} len={t}")
    if record is not None:
        np.savez(record, qpos=np.stack(traj) if traj else np.zeros((0,)))
        click.echo(f"trajectory recorded to {record} "
                   f"(replay: python tools/replay.py {record})")


@cli.command()
@click.option("-e", "--env", "env_id", required=True)
@click.option("--show-io", is_flag=True, default=False)
@click.option("--show-i", is_flag=True, default=False,
              help="log obs in Python array syntax every 30th step "
                   "(reference sb_rl.py:139,170-171)")
@click.option("--episodes", default=3, show_default=True)
@click.option("--record", default=None, help="record qpos trajectory (npz)")
@click.pass_context
def test(ctx, env_id, show_io, show_i, episodes, record):
    """Run the trained policy in the env (native inference)."""
    import balance_robot_tpu as brt
    from .train import checkpoint
    from .models import mlp

    env = brt.make(env_id)
    path = ctx.obj["MODEL_PATH"] or _default_model(
        env_id, ctx.obj["ALGORITHM_NAME"])
    params = checkpoint.load(path)

    def act(obs):
        return np.asarray(mlp.policy_mean(params, obs[None, :])[0])

    _run_episodes(env, act, episodes, env.max_episode_steps, show_io, record,
                  show_i=show_i)


@cli.command()
@click.option("-e", "--env", "env_id", required=True)
@click.pass_context
def convert(ctx, env_id):
    """Export ONNX + TF SavedModel + int8 TFLite + model.h + brq."""
    from .train import checkpoint
    from .export import pipeline

    path = ctx.obj["MODEL_PATH"] or _default_model(
        env_id, ctx.obj["ALGORITHM_NAME"])
    params = checkpoint.load(path)
    base = pathlib.Path(path).parent
    onnx_path = base / "best_model.onnx"
    pipeline.export_onnx(params, onnx_path)
    # validate the artifact immediately (the reference defers this to
    # test-onnx's onnx.checker, sb_rl.py:209; failing at export time is
    # strictly safer — a broken graph must not ship silently)
    from .export import onnx_runtime
    onnx_runtime.check_model(onnx_runtime.load_model(onnx_path))
    click.echo(f"wrote {onnx_path}")
    sm = base / "saved_model"
    pipeline.export_savedmodel(params, sm)
    click.echo(f"wrote {sm}")
    try:
        pipeline.export_brq(params, base / "best_model_int8.brq")
        click.echo(f"wrote {base / 'best_model_int8.brq'}.npz")
    except NotImplementedError as e:
        click.echo(f"skipping .brq: {e}")


@cli.command()
@click.option("-e", "--env", "env_id", required=True)
@click.pass_context
def quantize(ctx, env_id):
    """SavedModel -> int8 TFLite -> model.h (replaces quantize_tflite.py)."""
    from .export import pipeline

    path = ctx.obj["MODEL_PATH"] or _default_model(
        env_id, ctx.obj["ALGORITHM_NAME"])
    base = pathlib.Path(path).parent
    sm = base / "saved_model"
    if not sm.exists():
        raise click.ClickException(f"{sm} missing — run convert first")
    tfl = pipeline.quantize_tflite(sm, base / "int8_model.tflite")
    click.echo(f"wrote {tfl}")
    f32 = pipeline.quantize_tflite(sm, base / "float_model.tflite",
                                   float32=True)
    click.echo(f"wrote {f32}")
    hh = pipeline.write_model_h(tfl, base / "model.h")
    click.echo(f"wrote {hh}")


def _tflite_act(tflite_path, quantized):
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=str(tflite_path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    outs = interp.get_output_details()
    # the actions tensor is the one with shape [1, 2] named 'actions'
    act_out = next(o for o in outs if list(o["shape"]) == [1, 2]
                   and "log_std" not in o["name"])
    if quantized:
        iscale, izp = inp["quantization"]
        oscale, ozp = act_out["quantization"]

        def act(obs):
            q = np.round(obs / iscale) + izp
            q = np.clip(q, -128, 127).astype(np.int8)[None, :]
            interp.set_tensor(inp["index"], q)
            interp.invoke()
            out = interp.get_tensor(act_out["index"])[0]
            return (oscale * (out.astype(np.float32) - ozp))
    else:
        def act(obs):
            interp.set_tensor(inp["index"],
                              obs.astype(np.float32)[None, :])
            interp.invoke()
            return interp.get_tensor(act_out["index"])[0]
    return act


@cli.command("test-tflite")
@click.option("-e", "--env", "env_id", required=True)
@click.option("--show-i", "show_io", is_flag=True, default=False)
@click.option("--episodes", default=1, show_default=True)
@click.pass_context
def test_tflite(ctx, env_id, show_io, episodes):
    """Run the float32 TFLite model in the env."""
    import balance_robot_tpu as brt

    env = brt.make(env_id)
    base = pathlib.Path(ctx.obj["MODEL_PATH"]
                        or _default_model(env_id,
                                          ctx.obj["ALGORITHM_NAME"])).parent
    act = _tflite_act(base / "float_model.tflite", quantized=False)
    _run_episodes(env, act, episodes, env.max_episode_steps, show_io)


@cli.command("test-tflite-quant")
@click.option("-e", "--env", "env_id", required=True)
@click.option("--show-i", "show_io", is_flag=True, default=False)
@click.option("--episodes", default=1, show_default=True)
@click.pass_context
def test_tflite_quant(ctx, env_id, show_io, episodes):
    """Run the int8 TFLite model with the reference's quantize/dequantize
    shim (round, +zero_point, clip to [-128,127]; sb_rl.py:336-357)."""
    import balance_robot_tpu as brt

    env = brt.make(env_id)
    base = pathlib.Path(ctx.obj["MODEL_PATH"]
                        or _default_model(env_id,
                                          ctx.obj["ALGORITHM_NAME"])).parent
    act = _tflite_act(base / "int8_model.tflite", quantized=True)
    _run_episodes(env, act, episodes, env.max_episode_steps, show_io)


@cli.command("test-onnx")
@click.option("-e", "--env", "env_id", required=True)
@click.option("--show-io", is_flag=True, default=False)
@click.option("--episodes", default=1, show_default=True)
@click.pass_context
def test_onnx(ctx, env_id, show_io, episodes):
    """Run the exported ONNX model in the env (reference sb_rl.py:185-230:
    onnx.checker + InferenceSession episode loop).  Uses onnxruntime when
    installed, else the built-in numpy executor (export/onnx_runtime.py) —
    both validate the graph first."""
    import balance_robot_tpu as brt
    from .export import onnx_runtime

    env = brt.make(env_id)
    path = ctx.obj["MODEL_PATH"]
    if path is None:
        path = pathlib.Path(_default_model(
            env_id, ctx.obj["ALGORITHM_NAME"])).parent / "best_model.onnx"
    elif not str(path).endswith(".onnx"):
        path = pathlib.Path(path).parent / "best_model.onnx"
    if not pathlib.Path(path).is_file():
        raise click.ClickException(f"could not open model file: {path} "
                                   "(run `convert` first)")
    sess = onnx_runtime.session(path)
    input_name = sess.get_inputs()[0].name
    output_name = sess.get_outputs()[0].name

    def act(obs):
        feed = {input_name: obs.astype(np.float32)[None, :]}
        return sess.run([output_name], feed)[0][0]

    _run_episodes(env, act, episodes, env.max_episode_steps, show_io)


@cli.command("test-tflite-arduino")
@click.option("-e", "--env", "env_id", required=True)
@click.option("--port", default="/dev/ttyACM0", show_default=True)
@click.pass_context
def test_tflite_arduino(ctx, env_id, port):
    """Hardware-in-the-loop over serial (obs out, actions back at 115200
    baud, CSV — reference sb_rl.py:367-489). Requires pyserial + hardware."""
    try:
        import serial  # noqa: F401
    except ImportError:
        raise click.ClickException(
            "pyserial is not installed in this environment; HIL testing "
            "requires the physical robot attached over USB serial")
    import balance_robot_tpu as brt

    env = brt.make(env_id)
    ser = serial.Serial(port, 115200, timeout=1)
    _run_episodes(env, _serial_act(ser), 1, env.max_episode_steps,
                  show_io=True)


def _serial_act(ser):
    """CSV-over-serial policy: obs out, action line back (the reference's
    MCU protocol, sb_rl.py:418-437). `ser` is any object with
    write(bytes)/readline() — a pyserial port on hardware, a loopback in
    tests."""
    def act(obs):
        ser.write((",".join(f"{v:.6f}" for v in obs) + "\n").encode())
        line = ser.readline().decode().strip()
        return np.array([float(x) for x in line.split(",")], np.float32)

    return act


def main():
    cli(obj={})


if __name__ == "__main__":
    main()
