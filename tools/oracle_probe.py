"""Oracle recoverability probe for the Env03 block envs.

Question it answers: of the block launches the current policy DIES to, how
many are physically recoverable at all?  That number separates "keep
training" from "physics ceiling" for the flagship target, and the oracle's
winning action sequences are DAgger-style teacher data for recovery.

Method (one process, all on-device):
  1. HARVEST — roll the policy over N episodes; for every episode keep a
     snapshot of the full EnvState at the most recent block launch.  For
     episodes that die, that snapshot is the fatal pre-impact state (the
     block is on the 0.3 m spawn circle, impact ~8 control steps away).
  2. PROBE — CEM over open-loop action sequences a_{0..H-1} in [-1,1]^2
     from each fatal state, population P per state, all F x P rollouts
     vmapped in one kernel.  Score = survival steps + recovery bonus
     (upright and slow at the horizon).  The CEM mean is seeded with the
     policy's own closed-loop actions, so the search refines the policy
     rather than starting blind.
  3. Report the recoverable fraction; optionally dump (obs, action)
     pairs along each winning trajectory for BC/DAgger fine-tuning.

Usage:
  python tools/oracle_probe.py models/Env03-v2_PPO/best_model.npz \
      --episodes 512 --pop 128 --iters 8 --dump-dagger runs/dagger.npz
"""
import argparse
import pathlib
import sys

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
ap.add_argument("--chunk", type=int, default=250)
ap.add_argument("--horizon", type=int, default=100,
                help="CEM action-sequence length (control steps; launch->"
                     "impact is ~8, recovery a few dozen)")
ap.add_argument("--pop", type=int, default=128)
ap.add_argument("--iters", type=int, default=8)
ap.add_argument("--elite-frac", type=float, default=0.1)
ap.add_argument("--init-std", type=float, default=0.4)
ap.add_argument("--max-fatal", type=int, default=256,
                help="cap on fatal states probed (keeps F*P bounded)")
ap.add_argument("--dump-dagger", default=None)
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
H = args.horizon


# ------------------------------------------------------------------ harvest
# Shared with burst_refine/mpc_dagger (train/harvest.py): one owner for the
# launch-detection + snap_t>0 bank semantics.  info["obs"] is the obs each
# snapshot's own step emitted — the fd pitch_dot cannot be recomputed.
fatal_states, info = harvest_fatal_states(
    env, params, episodes=args.episodes, seed=args.seed, chunk=args.chunk,
    max_states=args.max_fatal)
print(f"harvest: {args.episodes} episodes, full-horizon "
      f"{100 * info['full_rate']:.1f}%, fatal launches {info['n_fatal']}",
      flush=True)
if info["n_bank"] == 0:
    print("no failures to probe")
    sys.exit(0)
F = info["n_bank"]
fatal_obs = jnp.asarray(info["obs"])
death_dt = info["death_dt"]
print(f"probing F={F} fatal states (policy died {np.median(death_dt):.0f} "
      f"steps after launch, median)", flush=True)


# -------------------------------------------------------------------- CEM
def seq_rollout(state0, actions):
    """Open-loop rollout of (H,2) actions; returns (survival_steps,
    recovered, score, obs_traj)."""
    def body(carry, a):
        state, alive, surv = carry
        state2, obs, r, term, trunc = env.step(state, a)
        sel = lambda A, B: jax.tree.map(
            lambda x, y: jnp.where(alive, x, y), A, B)
        state = sel(state2, state)
        surv = surv + alive.astype(jnp.int32)
        alive = alive & ~term
        return (state, alive, surv), obs

    (stateH, aliveH, surv), obs_traj = jax.lax.scan(
        body, (state0, jnp.asarray(True), jnp.int32(0)), actions)
    qpos = jnp.stack(stateH.phys.qpos)
    qvel = jnp.stack(stateH.phys.qvel)
    pitchH = pitch_of(tuple(qpos))
    # angular velocity about x of the free joint (nv layout: 8-dof robot
    # base 0:6 + wheels 6:8; pitch rate is qvel[3])
    pdotH = qvel[3]
    recovered = aliveH & (jnp.abs(pitchH) < 0.25) & (jnp.abs(pdotH) < 2.0)
    score = (surv.astype(jnp.float32)
             + 50.0 * recovered.astype(jnp.float32)
             - jnp.abs(pitchH))
    return surv, recovered, score, obs_traj


def policy_rollout(state0, obs0):
    """Closed-loop policy actions from (state0, obs0) — CEM's initial mean.

    obs0 is the banked snapshot-step obs (fd pitch_dot is stateful and
    cannot be recomputed from the bare state)."""
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

    (_, _, _), acts = jax.lax.scan(
        body, (state0, obs0, jnp.asarray(True)), None, length=H)
    return acts


@jax.jit
def cem_init_mean(states, obs):
    return jax.vmap(policy_rollout)(states, obs)     # (F,H,2)


@jax.jit
def cem_generation(states, mean, std, key):
    """One CEM generation. mean/std (F,H,2) -> updated, plus stats.

    The F x P rollouts run as ONE flat batch so the fused physics kernel
    sees a single large vmap axis (F*P envs)."""
    P = args.pop
    eps = jax.random.normal(key, (F, P, H, 2))
    cand = jnp.clip(mean[:, None] + std[:, None] * eps, -1.0, 1.0)
    states_flat = jax.tree.map(
        lambda x: jnp.repeat(x, P, axis=0), states)   # (F*P, ...)
    cand_flat = cand.reshape(F * P, H, 2)
    surv, rec, score = jax.vmap(
        lambda s, a: seq_rollout(s, a)[:3])(states_flat, cand_flat)
    surv = surv.reshape(F, P)
    rec = rec.reshape(F, P)
    score = score.reshape(F, P)
    k = max(1, int(args.pop * args.elite_frac))
    elite_idx = jnp.argsort(-score, axis=1)[:, :k]    # (F,k)
    elite = jnp.take_along_axis(
        cand, elite_idx[:, :, None, None], axis=1)    # (F,k,H,2)
    new_mean = elite.mean(axis=1)
    new_std = elite.std(axis=1) + 0.02
    best = score.max(axis=1)
    rec_any = rec.any(axis=1)
    # the single best SEQUENCE per state — recovery maneuvers are
    # multimodal, so the mean of elites is often worse than any elite;
    # DAgger labels must come from concrete winners, not the mean.
    bi = jnp.argmax(score, axis=1)
    best_cand = cand[jnp.arange(F), bi]               # (F,H,2)
    return new_mean, new_std, best, rec_any, best_cand


@jax.jit
def eval_mean(states, mean):
    surv, rec, score, obs_traj = jax.vmap(seq_rollout)(states, mean)
    return surv, rec, score, obs_traj


mean = cem_init_mean(fatal_states, fatal_obs)
std = jnp.full_like(mean, args.init_std)
key = jax.random.PRNGKey(args.seed + 999)
rec_union = np.zeros(F, bool)
run_best_score = np.full(F, -np.inf, np.float32)
run_best_act = np.asarray(mean)
for it in range(args.iters):
    key, k = jax.random.split(key)
    mean, std, best, rec_any, bcand = cem_generation(
        fatal_states, mean, std, k)
    rec_union |= np.asarray(rec_any)
    best = np.asarray(best)
    upd = best > run_best_score
    run_best_score = np.where(upd, best, run_best_score)
    run_best_act[upd] = np.asarray(bcand)[upd]
    print(f"[cem {it}] population-recoverable {100 * rec_union.mean():.0f}%"
          f"  best-score med {np.median(best):.0f}", flush=True)

surv, rec, score, obs_traj = eval_mean(fatal_states,
                                       jnp.asarray(run_best_act))
rec = np.asarray(rec)
print(f"\nORACLE: {F} fatal launches -> best sequence recovers {rec.sum()} "
      f"({100 * rec.mean():.0f}%); any-candidate-seen "
      f"{100 * rec_union.mean():.0f}%")
print(f"  surviving full CEM horizon: "
      f"{100 * (np.asarray(surv) >= H).mean():.0f}%")
print("  -> ceiling estimate: current full-horizon rate + "
      "recoverable fraction of the loss mass")

if args.dump_dagger:
    # winning trajectories only: (obs_t, a_t) pairs where the best
    # sequence recovered; actions are the open-loop winners, obs the
    # induced closed-form stream from replaying them.
    m = rec
    # seq_rollout's obs stream is POST-step: obs_traj[t] follows act[t].
    # BC inputs must be the pre-action obs -> shift right, prepend the
    # banked snapshot-step obs (never recomputed: fd pitch_dot is stateful).
    obs0 = np.asarray(fatal_obs)                       # (F,6)
    post = np.asarray(obs_traj)                        # (F,H,6)
    pre = np.concatenate([obs0[:, None], post[:, :-1]], axis=1)
    obs_np = pre[m]                       # (R,H,6)
    act_np = run_best_act[m]              # (R,H,2)
    np.savez(args.dump_dagger,
             obs=obs_np.reshape(-1, obs_np.shape[-1]),
             act=act_np.reshape(-1, act_np.shape[-1]),
             obs_traj=obs_np, act_traj=act_np,
             n_traj=int(m.sum()), horizon=H)
    print(f"dagger data ({int(m.sum())} trajs) -> {args.dump_dagger}")
