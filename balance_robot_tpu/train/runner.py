"""Training-loop services: eval gating, best-model tracking, checkpoints,
stop-on-threshold — the reference's callback stack re-expressed around the
jitted PPO iteration (SURVEY §2.4):

  * EvalCallback: evaluate every `eval_freq` *global* env steps with the
    deterministic policy; save `best_model` on improvement
    (sb_rl.py:536-543 evaluates every 20k steps).
  * StopTrainingOnRewardThreshold(6000): stop when eval mean reward crosses
    the env's reward_threshold (sb_rl.py:529).
  * CheckpointCallback every 40k steps -> cp_* artifacts (sb_rl.py:545-550).
  * Monitor-style episode stats + CSV/TensorBoard logging (logs/).

The device never blocks on the host: iterations are dispatched asynchronously
and only eval boundaries synchronize.
"""

import json
import pathlib
import time

import numpy as np
import jax

from .ppo import PPO, PPOConfig
from . import checkpoint as ckpt


def record_episode(env, params, key, max_steps=None):
    """One deterministic policy episode as a qpos trajectory (T, nq) for
    tools/replay.py — the headless equivalent of the reference's RecordVideo
    wrapper (sb_rl.py:502-507): render by replaying through real MuJoCo on a
    host with GL.

    Runs through the shared ChunkedEvaluator (train/evaluation.py): a full
    6000-step episode in one scan is 1.5M sequential substeps, which trips
    the TPU watchdog and crashes the worker.  The evaluator is memoized on
    the env so repeated recordings during one training run don't recompile."""
    from ..models import mlp
    from . import evaluation
    import jax.numpy as jnp

    ev = getattr(env, "_brt_record_evaluator", None)
    if ev is None:
        ev = evaluation.ChunkedEvaluator(
            env, lambda p, o: jnp.clip(mlp.policy_mean(p, o), -1.0, 1.0))
        env._brt_record_evaluator = ev
    return ev.record(params, key, max_steps)


def train(env, config: PPOConfig, seed=0,
          total_timesteps=int(1e10),
          eval_freq=20_000, ckpt_freq=40_000, n_eval_episodes=5,
          reward_threshold=None, models_dir="models", logs_dir="logs",
          run_name=None, init_params=None, max_wall_s=None, verbose=True,
          mesh=None, resume=False, trainer=None, movies_dir="movies",
          record_every=0):
    """Returns (best_params, history). SB3-default semantics throughout.

    `resume=True` restores (params, opt_state, env_states, rng) and the
    global step counter from `<models_dir>/<run_name>/resume_state.npz` if
    present — deterministic restart after preemption (SURVEY §5).
    `trainer` overrides the default PPO trainer (e.g. an off-policy trainer
    from train.factory — its config must carry n_envs and n_steps or
    train_freq)."""
    cfg = config
    ppo = trainer if trainer is not None else PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(seed), params=init_params)

    run_name = run_name or f"{env.id}_PPO"
    mdir = pathlib.Path(models_dir) / run_name
    mdir.mkdir(parents=True, exist_ok=True)
    resume_path = mdir / "resume_state.npz"
    resumed_steps = 0
    if resume and resume_path.exists():
        ts, resumed_steps = ckpt.load_train_state(resume_path, ts)
        if verbose:
            print(f"[{run_name}] resumed at step {resumed_steps} "
                  f"from {resume_path}", flush=True)
    if mesh is not None:
        from ..parallel import mesh as pm
        ts = pm.shard_train_state(ts, mesh, cfg.n_envs)
    ldir = pathlib.Path(logs_dir)
    ldir.mkdir(parents=True, exist_ok=True)
    log_path = ldir / f"{run_name}.csv"
    logf = open(log_path, "a")
    if logf.tell() == 0:
        logf.write("steps,wall_s,mean_ep_return,eval_return,eval_len,"
                   "loss,v_loss,entropy\n")
    # TensorBoard alongside the CSV (the reference's tensorboard_log,
    # sb_rl.py:58,69,81); optional dependency
    try:
        from torch.utils.tensorboard import SummaryWriter
        tb = SummaryWriter(log_dir=str(ldir / "tb" / run_name))
    except ImportError:
        tb = None

    threshold = (reward_threshold if reward_threshold is not None
                 else getattr(env, "reward_threshold", None))
    steps_per_iter = cfg.n_envs * getattr(cfg, "n_steps",
                                          getattr(cfg, "train_freq", 1))
    steps = resumed_steps
    next_eval = steps + eval_freq
    next_ckpt = steps + ckpt_freq
    history = []
    t0 = time.time()
    eval_key = jax.random.PRNGKey(seed + 1)
    # Seed best-model tracking from the INITIAL parameters: a warm-started
    # run must never overwrite a better prior best_model with a worse one
    # (SB3's EvalCallback starts at -inf and can regress the artifact).
    best_params = jax.tree.map(np.asarray, ts.params)
    if init_params is not None or resumed_steps:
        eval_key, k0 = jax.random.split(eval_key)
        b_ret, b_len = ppo.evaluate(ts.params, n_eval_episodes, k0)
        best, best_len = float(b_ret), float(b_len)
        if verbose:
            print(f"[{run_name}] warm-start eval: ret={best:.1f} "
                  f"len={best_len:.0f}", flush=True)
    else:
        best, best_len = -np.inf, -np.inf

    while steps < total_timesteps:
        ts, metrics = ppo.iteration(ts)
        steps += steps_per_iter
        if steps >= next_ckpt:
            ckpt.save(mdir / f"cp_{steps}", ts.params)
            ckpt.save_train_state(resume_path, ts, steps=steps)
            next_ckpt += ckpt_freq
        if steps >= next_eval:
            next_eval += eval_freq
            eval_key, k = jax.random.split(eval_key)
            eval_ret, eval_len = ppo.evaluate(ts.params, n_eval_episodes, k)
            eval_ret = float(eval_ret)
            m = {k2: float(v) for k2, v in metrics.items()}
            m.setdefault("mean_ep_return", float("nan"))
            m.setdefault("loss", m.get("critic_loss", float("nan")))
            m.setdefault("v_loss", m.get("critic_loss", float("nan")))
            m.setdefault("entropy", float("nan"))
            wall = time.time() - t0
            row = dict(steps=steps, wall_s=round(wall, 1),
                       mean_ep_return=round(m["mean_ep_return"], 2),
                       eval_return=round(eval_ret, 2),
                       eval_len=round(float(eval_len), 1),
                       loss=m["loss"], v_loss=m["v_loss"],
                       entropy=m["entropy"])
            history.append(row)
            logf.write(",".join(str(row[c]) for c in
                                ["steps", "wall_s", "mean_ep_return",
                                 "eval_return", "eval_len", "loss",
                                 "v_loss", "entropy"]) + "\n")
            logf.flush()
            if tb is not None:
                tb.add_scalar("rollout/ep_rew_mean", row["mean_ep_return"],
                              steps)
                tb.add_scalar("eval/mean_reward", eval_ret, steps)
                tb.add_scalar("eval/mean_ep_length", row["eval_len"], steps)
                tb.add_scalar("train/loss", m["loss"], steps)
                tb.add_scalar("train/value_loss", m["v_loss"], steps)
                tb.add_scalar("train/entropy_loss", -m["entropy"], steps)
                if "explained_variance" in m:      # PPO/A2C (SB3 metric)
                    tb.add_scalar("train/explained_variance",
                                  m["explained_variance"], steps)
                tb.add_scalar("time/fps", steps / max(wall, 1e-9), steps)
                tb.flush()
            if verbose:
                print(f"[{run_name}] steps={steps} wall={wall:.0f}s "
                      f"train_ep_ret={m['mean_ep_return']:.1f} "
                      f"eval_ret={eval_ret:.1f} eval_len={float(eval_len):.0f}",
                      flush=True)
            if eval_ret > best:
                best = eval_ret
                best_params = jax.tree.map(np.asarray, ts.params)
                ckpt.save(mdir / "best_model", best_params)
            # trajectory capture every `record_every` evals -> movies/
            # (the reference's RecordVideo-every-50-episodes analogue;
            # render via tools/replay.py)
            if record_every and len(history) % record_every == 0 \
                    and trainer is None:
                eval_key, kr = jax.random.split(eval_key)
                qpos, ep_len = record_episode(env, ts.params, kr)
                mv = pathlib.Path(movies_dir)
                mv.mkdir(parents=True, exist_ok=True)
                np.savez(mv / f"{run_name}_{steps}.npz",
                         qpos=qpos[:max(ep_len, 1)])
            # survival-selected artifact (framework extra: the reference's
            # human gate is "balances consistently", i.e. episode length)
            if float(eval_len) > best_len:
                best_len = float(eval_len)
                ckpt.save(mdir / "longest_model",
                          jax.tree.map(np.asarray, ts.params))
            if threshold is not None and eval_ret >= threshold:
                if verbose:
                    print(f"[{run_name}] reward threshold {threshold} "
                          f"reached — stopping", flush=True)
                break
        if max_wall_s is not None and time.time() - t0 > max_wall_s:
            if verbose:
                print(f"[{run_name}] wall-clock budget reached", flush=True)
            break
    logf.close()
    if tb is not None:
        tb.close()
    ckpt.save(mdir / "final_model", jax.tree.map(np.asarray, ts.params))
    # always leave resume state at exit so a wall-budget or preempted run
    # can continue with --resume regardless of ckpt cadence
    ckpt.save_train_state(resume_path, ts, steps=steps)
    return best_params, history
