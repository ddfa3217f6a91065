"""DAgger distillation: privileged-obs TEACHER -> deployment 6-obs student.

The round-3 result (docs/TRAINING.md): the privileged CRITIC verifiably fixes
value estimation (launch-aligned EV -0.05 -> +0.11, back/front gap closed)
but the pooled survival level did not move — the remaining Env03-v2 losses
are ACTOR-side. This tool attacks them with the standard teacher-student
recipe for observability-limited deployment interfaces:

  1. a teacher trained with `tools/train_run.py --privileged-actor` sees the
     block (envs/privileged.py) and should approach the oracle's ~99%
     recoverability;
  2. the 6-obs student is trained by DAgger: roll out the STUDENT (its own
     state distribution — the fix for the round-2 BC collapse, which cloned
     off-distribution noisy open-loop CEM actions), label every visited
     state with the teacher's deterministic action, regress student mean ->
     teacher action. The student converges to the observable-optimal
     projection E[teacher action | 6-obs state].

The teacher never deploys (the real robot has no block sensor — reference
src/balance_robot/envs/RobotBaseEnv.py:43-49 pins the 6-obs interface); the
teacher-vs-student survival gap is the measured observability floor.

Usage:
  python tools/distill_teacher.py --teacher models/Env03-v2_teacher/best_model.npz \
      --init models/Env03-v2_PPO/best_model.npz --out models/Env03-v2_dagger_r4
"""
import argparse
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import balance_robot_tpu as brt
from balance_robot_tpu.envs.vector import VecEnv
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import checkpoint as ckpt
from balance_robot_tpu.train import evaluation

ap = argparse.ArgumentParser()
ap.add_argument("--env", default="Env03-v2")
ap.add_argument("--teacher", required=True,
                help="label source: a 6-obs policy OR a privileged-actor "
                     "(obs+priv input) checkpoint of any hidden width")
ap.add_argument("--init", default=None,
                help="student init checkpoint; omit with --student-hidden "
                     "to distill into a freshly initialized net")
ap.add_argument("--student-hidden", type=int, default=None,
                help="fresh student hidden width (with --init absent)")
ap.add_argument("--student-priv", action="store_true",
                help="the STUDENT also sees [obs, privileged] — used to "
                     "clone the incumbent into a wide privileged net as "
                     "the warm start for teacher-v2 PPO")
ap.add_argument("--out", required=True)
ap.add_argument("--vf-coef", type=float, default=0.0,
                help="also clone the teacher's VALUE head (weight of the "
                     "value-MSE term). Essential when the clone warm-starts "
                     "a PPO run: a random critic makes early advantages "
                     "garbage and can destroy the cloned actor.")
ap.add_argument("--envs", type=int, default=1024)
ap.add_argument("--collect-steps", type=int, default=64,
                help="control steps per DAgger iteration per env")
ap.add_argument("--iters", type=int, default=40)
ap.add_argument("--beta0", type=int, default=1,
                help="first N iterations drive with the TEACHER's actions "
                     "(classic DAgger beta schedule); after that the "
                     "student drives its own distribution")
ap.add_argument("--noise", type=float, default=0.05,
                help="exploration noise on the DRIVING action (labels stay "
                     "deterministic) — state-coverage around the nominal")
ap.add_argument("--lr", type=float, default=1e-3)
ap.add_argument("--epochs", type=int, default=4,
                help="update epochs per iteration (each epoch = one pass "
                     "worth of minibatches over the aggregated buffer)")
ap.add_argument("--mb", type=int, default=4096)
ap.add_argument("--cap", type=int, default=4_000_000,
                help="aggregated-dataset capacity (rolling)")
ap.add_argument("--eval-every", type=int, default=5)
ap.add_argument("--eval-episodes", type=int, default=512)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--max-wall", type=float, default=None)
ap.add_argument("--platform", choices=["tpu", "cpu"], default=None)
args = ap.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

env = brt.make(args.env)
env.use_fast_solver()
if hasattr(env, "use_pallas_physics") and \
        jax.devices()[0].platform == "tpu":
    env.use_pallas_physics()
max_steps = env.max_episode_steps
obs_dim, act_dim = env.obs_dim, env.act_dim

priv_dim = env.priv_dim
teacher = ckpt.load(args.teacher)
t_in = teacher["pi_w1"].shape[0]
assert t_in in (obs_dim, obs_dim + priv_dim), \
    f"teacher input width {t_in} matches neither obs nor obs+priv"
s_in = obs_dim + priv_dim if args.student_priv else obs_dim
if args.init:
    student = ckpt.load(args.init)
    assert student["pi_w1"].shape[0] == s_in, \
        f"student init width {student['pi_w1'].shape[0]} != {s_in}"
else:
    assert args.student_hidden, "--init or --student-hidden required"
    student = mlp.init_params(jax.random.PRNGKey(args.seed + 7),
                              s_in, act_dim, hidden=args.student_hidden,
                              vf_obs_dim=s_in)
    # inherit the teacher's converged exploration noise: a fresh log_std 0
    # would smother the cloned behavior in any later PPO warm start
    student = {**student, "log_std": jnp.asarray(teacher["log_std"])}

out_dir = pathlib.Path(args.out)
out_dir.mkdir(parents=True, exist_ok=True)

vec = VecEnv(env, args.envs)
optim = optax.adam(args.lr)
opt_state = optim.init(student)

B, T = args.envs, args.collect_steps


@jax.jit
def reset_all(key):
    return vec.reset(key)


@jax.jit
def collect(student, states, obs, key, beta):
    """Roll T steps; driver = teacher w.p. beta else student (+ noise);
    label every visited state with the teacher's deterministic action."""

    def step_fn(carry, k):
        states, obs = carry
        priv = jax.vmap(env.privileged)(states)
        aug = jnp.concatenate([obs, priv], axis=-1)
        t_act = jnp.clip(mlp.policy_mean(
            teacher, aug if t_in > obs_dim else obs), -1.0, 1.0)
        s_obs = aug if args.student_priv else obs
        s_act = jnp.clip(mlp.policy_mean(student, s_obs), -1.0, 1.0)
        kd, kn = jax.random.split(k)
        drive = jax.random.bernoulli(kd, beta, (B, 1))
        act = jnp.where(drive, t_act, s_act)
        act = jnp.clip(
            act + args.noise * jax.random.normal(kn, act.shape), -1.0, 1.0)
        t_val = mlp.value(teacher, aug if t_in > obs_dim else obs)
        states, out = vec.step(states, act)
        return (states, out.obs), (s_obs, t_act, t_val)

    (states, obs), (d_obs, d_act, d_val) = jax.lax.scan(
        step_fn, (states, obs), jax.random.split(key, T))
    return (states, obs, d_obs.reshape(T * B, -1),
            d_act.reshape(T * B, -1), d_val.reshape(T * B))


@jax.jit
def insert(buf_obs, buf_act, buf_val, n, d_obs, d_act, d_val):
    idx = (n + jnp.arange(T * B)) % args.cap
    return (buf_obs.at[idx].set(d_obs), buf_act.at[idx].set(d_act),
            buf_val.at[idx].set(d_val),
            jnp.minimum(n + T * B, args.cap))


@partial(jax.jit, static_argnums=7)
def update(student, opt_state, buf_obs, buf_act, buf_val, n_valid, key,
           n_mb):
    def mb_step(carry, k):
        student, opt_state = carry
        idx = jax.random.randint(k, (args.mb,), 0, n_valid)
        o, a, v = buf_obs[idx], buf_act[idx], buf_val[idx]

        def loss_fn(p):
            loss = jnp.mean((mlp.policy_mean(p, o) - a) ** 2)
            if args.vf_coef:
                loss = loss + args.vf_coef * jnp.mean(
                    (mlp.value(p, o) - v) ** 2)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(student)
        updates, opt_state = optim.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        return (student, opt_state), loss

    (student, opt_state), losses = jax.lax.scan(
        mb_step, (student, opt_state), jax.random.split(key, n_mb))
    return student, opt_state, losses.mean()


# paired selection eval (fixed keys — burst_refine.py conventions)
# the evaluator rolls the STUDENT's view of the env
if args.student_priv:
    from balance_robot_tpu.envs.privileged import PrivilegedObsEnv
    _eval_env = PrivilegedObsEnv(env)
else:
    _eval_env = env
_evaluator = evaluation.ChunkedEvaluator(
    _eval_env, lambda p, o: jnp.clip(mlp.policy_mean(p, o), -1.0, 1.0))
EVAL_KEYS = jax.random.split(jax.random.PRNGKey(args.seed),
                             args.eval_episodes)


def big_eval(params):
    ret, lens = _evaluator.evaluate_detail(params, EVAL_KEYS)
    return (float((lens >= max_steps).mean()), float(ret.mean()),
            float(lens.mean()))


t0 = time.time()
buf_obs = jnp.zeros((args.cap, s_in), jnp.float32)
buf_act = jnp.zeros((args.cap, act_dim), jnp.float32)
buf_val = jnp.zeros((args.cap,), jnp.float32)
n = jnp.int32(0)

key = jax.random.PRNGKey(args.seed + 1)
key, kr = jax.random.split(key)
states, obs = reset_all(kr)

full0, ret0, len0 = big_eval(student)
best = dict(full=full0, ret=ret0, it=-1)
ckpt.save(out_dir / "best_model", student)
print(f"[dagger] init {args.init}: full={100 * full0:.1f}% ret={ret0:.0f} "
      f"len={len0:.0f}", flush=True)

for it in range(args.iters):
    if args.max_wall and time.time() - t0 > args.max_wall:
        print("[dagger] wall budget reached", flush=True)
        break
    key, kc, ku = jax.random.split(key, 3)
    beta = 1.0 if it < args.beta0 else 0.0
    states, obs, d_obs, d_act, d_val = collect(student, states, obs, kc,
                                               jnp.float32(beta))
    # pre-update imitation gap on the fresh on-policy batch (held-out:
    # the student has not trained on these states yet)
    gap = float(jnp.mean(
        (jnp.clip(mlp.policy_mean(student, d_obs), -1, 1) - d_act) ** 2))
    buf_obs, buf_act, buf_val, n = insert(buf_obs, buf_act, buf_val, n,
                                          d_obs, d_act, d_val)
    # fixed minibatch count (fresh-data sized): a buffer-dependent count
    # would change the static arg every iteration and recompile the
    # update kernel each time
    n_mb = max(1, args.epochs * (T * B) // args.mb)
    student, opt_state, loss = update(student, opt_state, buf_obs, buf_act,
                                      buf_val, n, ku, n_mb)
    print(f"[dagger {it}] beta={beta:.0f} buffer={int(n)} "
          f"heldout-gap={gap:.5f} train-loss={float(loss):.5f}", flush=True)
    if (it + 1) % args.eval_every == 0 or it == args.iters - 1:
        full, ret, lens = big_eval(student)
        mark = ""
        if full > best["full"] or (full == best["full"]
                                   and ret > best["ret"]):
            best = dict(full=full, ret=ret, it=it)
            ckpt.save(out_dir / "best_model", student)
            mark = "  <-- new best"
        print(f"[dagger {it}] eval full={100 * full:.1f}% ret={ret:.0f} "
              f"len={lens:.0f}{mark}", flush=True)

ckpt.save(out_dir / "final_model", student)
print(f"[dagger] best: it={best['it']} full={100 * best['full']:.1f}% "
      f"ret={best['ret']:.0f} -> {out_dir}/best_model.npz", flush=True)
