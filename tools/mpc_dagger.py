"""Closed-loop recovery expert for the Env03 block envs (MPC-DAgger).

tools/oracle_probe.py showed the flagship's fatal launches are dynamically
recoverable (population-recoverable 99%), but its OPEN-loop CEM winners are
knife-edge: replaying the exact winning sequence in a differently-shaped
batch (different XLA accumulation order) already diverges — recovery states
are chaotic, so open-loop action sequences carry almost no distillable
signal.  This tool builds a CLOSED-loop expert instead: receding-horizon
CEM that replans every `--exec-k` control steps, executing only the head of
the plan.  Replanning is feedback, so the induced (obs, action) stream is a
robust recovery demonstration suitable for BC/DAgger fine-tuning
(tools/bc_finetune.py).

All F fatal states are planned in parallel: each CEM generation rolls the
full (F*pop) population as ONE flat vmapped batch so the fused 14-dof
pallas kernel sees a single large env axis.

No reference analogue (the reference delegates training wholesale to SB3;
SURVEY §2.3) — this is TPU-native tooling for closing the flagship target.

Usage:
  python tools/mpc_dagger.py models/Env03-v2_r2f/best_model.npz \
      --episodes 512 --pop 64 --iters 2 --plan-h 25 --exec-k 4 \
      --replay-steps 148 --dump runs/dagger_mpc.npz
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.envs.base import pitch_of
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import checkpoint as ckpt
from balance_robot_tpu.train.harvest import harvest_fatal_states

ap = argparse.ArgumentParser()
ap.add_argument("model")
ap.add_argument("--env", default="Env03-v2")
ap.add_argument("--episodes", type=int, default=512)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--max-fatal", type=int, default=128)
ap.add_argument("--plan-h", type=int, default=20,
                help="CEM lookahead (control steps)")
ap.add_argument("--tail-h", type=int, default=60,
                help="policy-controlled tail appended to every plan "
                     "rollout before scoring: a plan is only good if it "
                     "hands off into a state the POLICY can continue from "
                     "(that handoff is the thing BC must learn)")
ap.add_argument("--exec-k", type=int, default=4,
                help="steps executed per replan — the feedback interval")
ap.add_argument("--pop", type=int, default=64)
ap.add_argument("--iters", type=int, default=2, help="CEM iters per replan")
ap.add_argument("--elite-frac", type=float, default=0.125)
ap.add_argument("--init-std", type=float, default=0.3)
ap.add_argument("--replay-steps", type=int, default=148,
                help="total expert steps per state (multiple of exec-k)")
ap.add_argument("--dump", default="runs/dagger_mpc.npz")
ap.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                help="force the JAX backend (config.update, not the env "
                     "var: sitecustomize has already imported jax)")
args = ap.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

env = brt.make(args.env)
env.use_fast_solver()
if jax.devices()[0].platform == "tpu" and hasattr(env, "use_pallas_physics"):
    env.use_pallas_physics()
params = ckpt.load(args.model)
Hs, Ht, K, P = args.plan_h, args.tail_h, args.exec_k, args.pop

# ------------------------------------------------------------------ harvest
t0 = time.time()
bank, info = harvest_fatal_states(env, params, episodes=args.episodes,
                                  seed=args.seed, max_states=args.max_fatal)
print(f"harvest: full-horizon {100 * info['full_rate']:.1f}%, "
      f"bank {info['n_bank']} fatal launches ({time.time() - t0:.0f}s)",
      flush=True)
if info["n_bank"] == 0:
    print("nothing to plan from")
    sys.exit(0)
F = info["n_bank"]
fatal_states = bank


# ---------------------------------------------------------------- rollouts
def plan_score_rollout(state0, obs0, actions):
    """Plan evaluation: Hs open-loop steps, then a Ht-step POLICY tail.

    Scoring the handoff is the point — a recovery maneuver only counts if
    it ends in a state the policy itself can keep balancing from, because
    the BC student will be exactly that policy plus the cloned maneuver."""
    def body_plan(carry, a):
        state, obs, alive, surv = carry
        state2, obs2, r, term, trunc = env.step(state, a)
        sel = lambda A, B: jax.tree.map(
            lambda x, y: jnp.where(alive, x, y), A, B)
        state = sel(state2, state)
        obs = jnp.where(alive, obs2, obs)
        surv = surv + alive.astype(jnp.int32)
        alive = alive & ~term
        return (state, obs, alive, surv), None

    def body_tail(carry, _):
        state, obs, alive, surv = carry
        a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
        return body_plan(carry, a)

    carry = (state0, obs0, jnp.asarray(True), jnp.int32(0))
    carry, _ = jax.lax.scan(body_plan, carry, actions)
    (stateH, obsH, aliveH, surv), _ = jax.lax.scan(
        body_tail, carry, None, length=Ht)
    qpos = jnp.stack(stateH.phys.qpos)
    qvel = jnp.stack(stateH.phys.qvel)
    pitchH = pitch_of(tuple(qpos))
    recovered = aliveH & (jnp.abs(pitchH) < 0.25) & (jnp.abs(qvel[3]) < 2.0)
    return (surv.astype(jnp.float32)
            + 50.0 * recovered.astype(jnp.float32)
            - jnp.abs(pitchH))


@jax.jit
def policy_plan(states, obs):
    """Closed-loop policy rollout -> (F,Hs,2) initial CEM mean."""
    def one(state0, obs0):
        def body(carry, _):
            state, obs, alive = carry
            a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
            state2, obs2, r, term, trunc = env.step(state, a)
            sel = lambda A, B: jax.tree.map(
                lambda x, y: jnp.where(alive, x, y), A, B)
            state = sel(state2, state)
            obs = jnp.where(alive, obs2, obs)
            alive = alive & ~term
            return (state, obs, alive), a

        _, acts = jax.lax.scan(body, (state0, obs0, jnp.asarray(True)),
                               None, length=Hs)
        return acts

    return jax.vmap(one)(states, obs)


@jax.jit
def cem_iter(states, obs, mean, std, key):
    eps = jax.random.normal(key, (F, P, Hs, 2))
    cand = jnp.clip(mean[:, None] + std[:, None] * eps, -1.0, 1.0)
    states_flat = jax.tree.map(lambda x: jnp.repeat(x, P, axis=0), states)
    obs_flat = jnp.repeat(obs, P, axis=0)
    score = jax.vmap(plan_score_rollout)(
        states_flat, obs_flat, cand.reshape(F * P, Hs, 2)).reshape(F, P)
    k = max(1, int(P * args.elite_frac))
    elite_idx = jnp.argsort(-score, axis=1)[:, :k]
    elite = jnp.take_along_axis(cand, elite_idx[:, :, None, None], axis=1)
    return elite.mean(axis=1), elite.std(axis=1) + 0.02


@jax.jit
def exec_head(states, obs, alive, mean):
    """Execute the first K plan steps closed over the env; record
    (obs, action) for alive states and advance them.  `obs` is the
    observation stream threaded from reset/previous steps — the env's
    _get_obs is stateful (finite-difference pitch_dot), so obs must come
    from the same step call that advanced the state, never be recomputed."""
    def body(carry, a):
        states, obs, alive = carry
        states2, obs2, r, term, trunc = jax.vmap(env.step)(states, a)
        sel = lambda A, B: jax.tree.map(
            lambda x, y: jnp.where(
                alive.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), A, B)
        rec_obs, rec_alive = obs, alive
        states = sel(states2, states)
        obs = jnp.where(alive[:, None], obs2, obs)
        alive = alive & ~term
        return (states, obs, alive), (rec_obs, a, rec_alive)

    (states, obs, alive), (obs_k, act_k, alive_k) = jax.lax.scan(
        body, (states, obs, alive), jnp.moveaxis(mean[:, :K], 0, 1))
    return states, obs, alive, obs_k, act_k, alive_k


@jax.jit
def shift_plan(mean, std):
    """Receding horizon: drop the executed head, repeat the tail action,
    re-open std on the fresh tail."""
    mean2 = jnp.concatenate(
        [mean[:, K:], jnp.repeat(mean[:, -1:], K, axis=1)], axis=1)
    std2 = jnp.concatenate(
        [std[:, K:], jnp.full((F, K, 2), args.init_std)], axis=1)
    return mean2, std2


# -------------------------------------------------------------- MPC replay
R = (args.replay_steps // K) * K
# The banked obs from the snapshot's own step — recomputing env._obs on the
# bare state gives fd pitch_dot = 0 (dt == 0) mid-incident.  The state keeps
# its last_pitch/last_t carry, exactly as a live rollout would.
obs, states = info["obs"], fatal_states
alive = jnp.ones(F, bool)
mean = policy_plan(states, obs)
std = jnp.full_like(mean, args.init_std)
key = jax.random.PRNGKey(args.seed + 999)
obs_rows, act_rows, alive_rows = [], [], []
t0 = time.time()
for step in range(0, R, K):
    for _ in range(args.iters):
        key, k = jax.random.split(key)
        mean, std = cem_iter(states, obs, mean, std, k)
    states, obs, alive, obs_k, act_k, alive_k = exec_head(
        states, obs, alive, mean)
    mean, std = shift_plan(mean, std)
    obs_rows.append(np.asarray(obs_k))      # (K,F,6)
    act_rows.append(np.asarray(act_k))      # (K,F,2)
    alive_rows.append(np.asarray(alive_k))  # (K,F)
    if (step // K) % 8 == 0:
        print(f"[mpc {step:3d}/{R}] expert-alive "
              f"{100 * float(jnp.mean(alive)):.0f}%  "
              f"({time.time() - t0:.0f}s)", flush=True)

# final recovery check: upright & slow & alive at the end
pitch_end = jax.vmap(lambda s: pitch_of(s.phys.qpos))(states)
pdot_end = jax.vmap(lambda s: jnp.stack(s.phys.qvel)[3])(states)
recovered = np.asarray(alive & (jnp.abs(pitch_end) < 0.25)
                       & (jnp.abs(pdot_end) < 2.0))
surv = np.asarray(alive)
print(f"\nMPC expert: {F} fatal launches -> survived {R} steps: "
      f"{surv.sum()} ({100 * surv.mean():.0f}%), recovered upright: "
      f"{recovered.sum()} ({100 * recovered.mean():.0f}%)")

# Closed-loop recoverability read-out (round-4 verdict task 1c): the
# open-loop CEM "99% population-recoverable" is an existence proof under
# frozen noise — THIS number, full-state receding-horizon search with
# feedback, is the realistic upper bound for any 6-obs policy.  The
# alive-curve separates clearing THE killing launch (~64 steps covers the
# median-76-step death lag) from surviving the follow-on launches that the
# 148-step window also contains.
alive_curve = np.concatenate(alive_rows, axis=0)     # (R,F) pre-step alive
for t in (48, 64, 96, R - 1):
    if t < alive_curve.shape[0]:
        print(f"  alive@{t + 1:3d} steps: "
              f"{100 * alive_curve[t].mean():.0f}%")
h_launch = 0.0065                 # incumbent per-launch death hazard
for name, r in (("survived-window", surv.mean()),
                ("recovered-upright", recovered.mean())):
    ceil = (1.0 - h_launch * (1.0 - r)) ** 16
    print(f"  pooled ceiling if policy matched expert ({name} "
          f"r={100 * r:.0f}%): {100 * ceil:.1f}% "
          f"[(1 - {h_launch}*(1-r))^16]")

# -------------------------------------------------------------------- dump
obs_all = np.concatenate(obs_rows, axis=0)     # (R,F,6)
act_all = np.concatenate(act_rows, axis=0)     # (R,F,2)
alive_all = np.concatenate(alive_rows, axis=0)  # (R,F)
keep = alive_all & recovered[None, :]           # only successful experts
obs_np = obs_all[keep]
act_np = act_all[keep]
np.savez(args.dump, obs=obs_np, act=act_np,
         n_traj=int(recovered.sum()), replay_steps=R,
         expert_survival=float(surv.mean()),
         expert_recovered=float(recovered.mean()))
print(f"dagger data: {obs_np.shape[0]} (obs, act) pairs from "
      f"{int(recovered.sum())} recovery demonstrations -> {args.dump}")
