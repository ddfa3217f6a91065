"""Iterated burst fine-tuning with large-eval checkpoint selection.

Motivation (measured, round 2): PPO on Env03-v2 at this policy's quality
level oscillates — long runs degrade (entropy collapse), but the first few
million steps of a gentle warm-started run IMPROVE the policy (82.8% ->
85.2% full-horizon at 4M steps of lr 1e-4 before degrading).  So: run SHORT
bursts from the current best, snapshot densely, select with a large
fixed-key eval, and restart from the winner.  Everything happens in one
process so the trainer and eval kernels compile exactly once.

Selection is paired (same eval keys for every snapshot); the winner should
be re-evaluated on a fresh seed for reporting (tools/eval_policy.py).

Usage:
  python tools/burst_refine.py --init models/Env03-v2_r2a/cp_4030464.npz \
      --bursts 6 --burst-steps 12000000 --lr 5e-5 --out models/Env03-v2_r2b
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train.ppo import PPO, PPOConfig
from balance_robot_tpu.train import checkpoint as ckpt
from balance_robot_tpu.train import evaluation

ap = argparse.ArgumentParser()
ap.add_argument("--env", default="Env03-v2")
ap.add_argument("--init", required=True)
ap.add_argument("--out", default="models/Env03-v2_r2b")
ap.add_argument("--bursts", type=int, default=6)
ap.add_argument("--burst-steps", type=int, default=12_000_000)
ap.add_argument("--snap-steps", type=int, default=1_000_000)
ap.add_argument("--lr", type=float, default=5e-5)
ap.add_argument("--lr-decay", type=float, default=0.7,
                help="lr multiplier applied after a burst with no "
                     "improvement")
ap.add_argument("--epochs", type=int, default=10)
ap.add_argument("--ent-coef", type=float, default=0.0,
                help="entropy bonus: the converged policy's std is ~0.03 "
                     "(entropy collapse), so PPO cannot explore alternate "
                     "recovery maneuvers; a small bonus re-inflates "
                     "exploration while the deterministic selection eval "
                     "guards the reported metric")
ap.add_argument("--envs", type=int, default=1024)
ap.add_argument("--steps", type=int, default=32)
ap.add_argument("--mb", type=int, default=1024)
ap.add_argument("--gamma", type=float, default=0.999)
ap.add_argument("--eval-episodes", type=int, default=512)
ap.add_argument("--confirm", action="store_true",
                help="honest ratchet: accept a paired-eval win only if it "
                     "ALSO holds on a second disjoint fixed key set. "
                     "Round-3 lesson: max-over-snapshots on one key set "
                     "overfits selection noise (r3a picked 89.8% paired "
                     "that pooled at 84.6%).")
ap.add_argument("--min-win", type=float, default=None,
                help="with --confirm: required margin over the incumbent on "
                     "BOTH the primary and the disjoint confirm set, as a "
                     "full-horizon fraction. Default (None) = 2*SE of the "
                     "incumbent's eval, SE = sqrt(p(1-p)/n): at p~0.89 and "
                     "n=512 that is ~2.8 pts; n=1024 ~2.0 pts. Round-2..4 "
                     "lesson: sub-SE 'confirmed' wins (r3a +0.9, r4h +1.2) "
                     "failed pooled fresh-seed re-eval BOTH times — a "
                     "margin below noise plus max-over-snapshots selection "
                     "guarantees overfit winners.")
ap.add_argument("--no-final-gate", action="store_true",
                help="skip the pooled fresh-seed final gate (2 disjoint "
                     "fresh-key evals of winner vs incumbent; the winner "
                     "must pool at least as high or the artifact reverts). "
                     "The gate is on by default with --confirm because it "
                     "has overruled 'confirmed' wins twice (r3a 84.6%, "
                     "r4h 87.1% vs the 89.5% incumbent).")
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--max-wall", type=float, default=7200)
ap.add_argument("--train-block-speed", type=float, default=None,
                help="domain hardening: train against faster blocks than "
                     "the standard env (selection/eval stays standard). "
                     "Failure analysis shows losses are uniform random "
                     "block hits; overtraining the hit severity is the "
                     "robustness lever.")
ap.add_argument("--train-block-delay", type=float, default=None,
                help="domain hardening: shorter respawn delay -> more hits "
                     "per episode, enriching the post-impact recovery "
                     "regime in the rollout data without changing per-hit "
                     "severity (selection/eval stays standard).")
ap.add_argument("--train-back-frac", type=float, default=None,
                help="P(attack side = back) for TRAINING env instances. "
                     "Forensics (runs/forensics_best.log): back-side "
                     "episodes survive 78.0%% vs front 91.7%% — rebalance "
                     "the data toward the weak side (selection/eval stays "
                     "the standard 50/50 per-instance draw).")
ap.add_argument("--survival-reward", action="store_true",
                help="train with reward = 1.0/alive-step instead of the "
                     "reference balance reward. The reported metric IS "
                     "full-horizon survival; the shaped reward's "
                     "|pitch|/yaw terms can trade against aggressive "
                     "recovery maneuvers at the margin (selection/eval "
                     "stays on the standard env + reference reward).")
ap.add_argument("--failure-replay", type=int, default=0,
                help="harvest fatal pre-impact states from --init over this "
                     "many episodes and mix them into TRAINING resets "
                     "(prob --replay-frac). On-policy hard-state replay: "
                     "the oracle probe shows 99%% of deaths are recoverable "
                     "(runs/oracle_r1.log) — PPO just never samples the "
                     "recovery regime densely enough.")
ap.add_argument("--replay-frac", type=float, default=0.25)
ap.add_argument("--privileged-critic", action="store_true",
                help="asymmetric actor-critic: value net also sees block "
                     "kinematics + attack side (training-only; warm starts "
                     "from a symmetric checkpoint by zero-padding the new "
                     "critic rows — see train/ppo.py)")
ap.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                help="force the JAX backend (config.update, not the env var: "
                     "sitecustomize has already imported jax)")
args = ap.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)


def _make_env(block_speed=None, block_delay=None):
    e = brt.make(args.env)
    e.use_fast_solver()
    if block_speed is not None:
        e.block_speed = block_speed
    if block_delay is not None:
        e.block_delay = block_delay
    if hasattr(e, "use_pallas_physics") and \
            jax.devices()[0].platform == "tpu":
        e.use_pallas_physics()
    return e


env = _make_env()                              # eval/selection: standard env
_hardened = (args.train_block_speed is not None
             or args.train_block_delay is not None
             or args.train_back_frac is not None
             or args.survival_reward
             or args.failure_replay > 0)
train_env = (_make_env(args.train_block_speed, args.train_block_delay)
             if _hardened else env)
if args.survival_reward or args.train_back_frac is not None:
    import types

    if args.survival_reward:
        def _survival_reward(self, state, key):
            return jnp.float32(1.0)

        train_env._reward = types.MethodType(_survival_reward, train_env)

    if args.train_back_frac is not None:
        back_frac = args.train_back_frac
        _orig_init_aux = type(train_env)._init_aux

        def _biased_init_aux(self, key):
            aux = _orig_init_aux(self, key)
            aux["attack_front"] = jax.random.uniform(key) > back_frac
            return aux

        train_env._init_aux = types.MethodType(_biased_init_aux, train_env)
max_steps = env.max_episode_steps
out_dir = pathlib.Path(args.out)
out_dir.mkdir(parents=True, exist_ok=True)

# -------------------------------------------------------- failure replay
_orig_train_reset = train_env.reset        # bound before any patching


def _install_failure_replay(cur_params, burst_seed):
    """(Re)patch train_env.reset: with prob --replay-frac start the episode
    from a fatal pre-impact state harvested from the CURRENT best policy
    (fresh rng + t=0 so replays diverge and get a full horizon; snapshots
    are post-launch, so the block-delay machinery is in its fired state and
    self-consistent).  Called at the top of every burst — DAgger-style: the
    bank tracks the failures the latest policy actually has.

    Replayed episodes use the BANKED observation (the fd pitch_dot cannot
    be recomputed from the bare state — harvest.py) and re-anchor last_t to
    the new t=0 clock so the next fd step sees dt=5 ms exactly as in the
    source episode.  carry_across_reset is patched so a replayed state
    keeps ITS attack side (the banked flight direction must stay
    consistent with aux) instead of being stamped with the slot's."""
    import types
    from balance_robot_tpu.train.harvest import harvest_fatal_states

    bank, info = harvest_fatal_states(
        env, cur_params, episodes=args.failure_replay,
        seed=args.seed + 55 + burst_seed)
    print(f"[replay] bank: {info['n_bank']} fatal states from "
          f"{info['episodes']} episodes (full-horizon "
          f"{100 * info['full_rate']:.1f}%)", flush=True)
    if info["n_bank"] == 0:
        train_env.reset = _orig_train_reset
        return
    B = info["n_bank"]
    bank_obs = jnp.asarray(info["obs"])
    frac = args.replay_frac

    def _replay_reset(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        state0, obs0 = _orig_train_reset(k1)
        i = jax.random.randint(k3, (), 0, B)
        bs = jax.tree.map(lambda x: x[i], bank)
        # t=0 restarts the TimeLimit clock; last_t follows it so the next
        # fd step computes (p1 - p_snap)/0.005 like the source episode
        bs = bs._replace(key=k1, t=jnp.int32(0), last_t=jnp.float32(0.0))
        use = jax.random.uniform(k2) < frac
        state = jax.tree.map(
            lambda a, b: jnp.where(use, a, b), bs, state0)
        if "attack_front" in state.aux:
            state = state._replace(
                aux={**state.aux, "replayed": use})
        obs = jnp.where(use, bank_obs[i], obs0)
        return state, obs

    train_env.reset = types.MethodType(_replay_reset, train_env)

    if hasattr(train_env, "carry_across_reset"):
        _orig_carry = type(train_env).carry_across_reset

        def _replay_carry(self, old_state, new_state):
            carried = _orig_carry(self, old_state, new_state)
            # a replayed bank state keeps its own side — its in-flight
            # block already travels that way; normal resets inherit the
            # env-instance side as usual
            side = jnp.where(new_state.aux.get("replayed", False),
                             new_state.aux["attack_front"],
                             carried.aux["attack_front"])
            return carried._replace(
                aux={**carried.aux, "attack_front": side})

        train_env.carry_across_reset = types.MethodType(_replay_carry,
                                                        train_env)


# ---------------------------------------------------------------- eval
# One owner for the watchdog-critical chunked rollout (train/evaluation.py).
_evaluator = evaluation.ChunkedEvaluator(
    env, lambda p, o: jnp.clip(mlp.policy_mean(p, o), -1.0, 1.0))

EVAL_KEYS = jax.random.split(jax.random.PRNGKey(args.seed),
                             args.eval_episodes)
CONFIRM_KEYS = jax.random.split(jax.random.PRNGKey(args.seed + 7919),
                                args.eval_episodes)


def big_eval(params, keys=None):
    """(full_horizon_rate, mean_return, mean_len) on the FIXED key set —
    paired across snapshots so selection noise is mostly common-mode."""
    ret, lens = _evaluator.evaluate_detail(
        params, EVAL_KEYS if keys is None else keys)
    return (float((lens >= max_steps).mean()),
            float(ret.mean()), float(lens.mean()))


# ---------------------------------------------------------------- bursts
t0 = time.time()
init_params = best_params = ckpt.load(args.init)
score0 = big_eval(best_params)
best = dict(score=score0[0], ret=score0[1], src=str(args.init))
min_win = args.min_win
if min_win is None:
    # 2*SE of a binomial proportion at the incumbent's level: the smallest
    # margin distinguishable from paired-selection noise at this eval size.
    p0 = min(max(score0[0], 0.05), 0.95)
    min_win = 2.0 * float(np.sqrt(p0 * (1.0 - p0) / args.eval_episodes))
    print(f"[burst] auto min_win = 2*SE = {100 * min_win:.2f} pts "
          f"(p={100 * p0:.1f}%, n={args.eval_episodes})", flush=True)
if args.confirm:
    c0 = big_eval(best_params, CONFIRM_KEYS)
    best["cscore"] = c0[0]
    print(f"[burst] init confirm set: full={100 * c0[0]:.1f}%", flush=True)
# the advertised artifact must exist even if every burst is dry (common at
# the plateau — the ratchet only has to win occasionally)
ckpt.save(out_dir / "best_model", best_params)
print(f"[burst] init {args.init}: full={100 * score0[0]:.1f}% "
      f"ret={score0[1]:.0f} len={score0[2]:.0f}", flush=True)

lr = args.lr
history = []
_ppo_cache = {}
key = jax.random.PRNGKey(args.seed + 100)
for b in range(args.bursts):
    if time.time() - t0 > args.max_wall:
        print("[burst] wall budget reached", flush=True)
        break
    cfg = PPOConfig(n_envs=args.envs, n_steps=args.steps,
                    minibatch_size=args.mb, n_epochs=args.epochs,
                    gamma=args.gamma, lr=lr, ent_coef=args.ent_coef,
                    privileged_critic=args.privileged_critic)
    if args.failure_replay:
        # The replay bank swaps train_env.reset each burst, so the jitted
        # iteration MUST be retraced (it closes over reset at trace time).
        _install_failure_replay(best_params, burst_seed=b)
        ppo = PPO(train_env, cfg)
    else:
        # Reuse one PPO per lr: PPO.iteration jits with static self, so a
        # fresh instance per burst would re-trace (and on cache miss
        # re-compile) an identical program every burst.  cfg only varies
        # in lr across bursts.
        ppo = _ppo_cache.get(lr)
        if ppo is None:
            ppo = _ppo_cache[lr] = PPO(train_env, cfg)
    key, kb = jax.random.split(key)
    ts = ppo.init(kb, params=best_params)
    spi = cfg.n_envs * cfg.n_steps
    snaps, steps, next_snap = [], 0, args.snap_steps
    while steps < args.burst_steps:
        ts, metrics = ppo.iteration(ts)
        steps += spi
        if steps >= next_snap:
            snaps.append((steps, jax.tree.map(np.asarray, ts.params)))
            next_snap += args.snap_steps
            print(f"[burst {b}] {steps / 1e6:5.2f}M train: "
                  f"ev={float(metrics['explained_variance']):+.3f} "
                  f"ent={float(metrics['entropy']):+.2f}", flush=True)
    improved = False
    for s_steps, params in snaps:
        full, ret, length = big_eval(params)
        tag = ""
        if full > best["score"] + (min_win if args.confirm else 0.0):
            if args.confirm:
                cfull, _, _ = big_eval(params, CONFIRM_KEYS)
                # the margin must hold on the DISJOINT set too — a primary
                # win with a flat confirm is exactly the selection-noise
                # signature that produced the r3a/r4h false positives
                if cfull < best["cscore"] + min_win:
                    print(f"[burst {b}] {s_steps / 1e6:5.1f}M primary win "
                          f"{100 * full:.1f}% did NOT confirm "
                          f"({100 * cfull:.1f}% < "
                          f"{100 * best['cscore']:.1f}% + "
                          f"{100 * min_win:.1f}) — rejected",
                          flush=True)
                    history.append(dict(burst=b, steps=s_steps, lr=lr,
                                        full=full, ret=ret, len=length,
                                        confirm=cfull, rejected=True))
                    continue
                best_c = cfull
            else:
                best_c = None
            best = dict(score=full, ret=ret, src=f"burst{b}@{s_steps}")
            if best_c is not None:
                best["cscore"] = best_c
            best_params = params
            ckpt.save(out_dir / "best_model", params)
            improved = True
            tag = ("  <-- new best (confirmed)" if args.confirm
                   else "  <-- new best")
        print(f"[burst {b} lr={lr:.1e}] {s_steps / 1e6:5.1f}M "
              f"full={100 * full:5.1f}% ret={ret:7.0f} len={length:6.0f}"
              f"{tag}", flush=True)
        history.append(dict(burst=b, steps=s_steps, lr=lr, full=full,
                            ret=ret, len=length))
    if not improved:
        lr *= args.lr_decay
        print(f"[burst {b}] no improvement -> lr {lr:.2e}", flush=True)
    (out_dir / "burst_history.json").write_text(json.dumps(
        dict(best=best, history=history), indent=1))

# --------------------------------------------------- pooled fresh-seed gate
# Paired selection on fixed key sets has twice "confirmed" winners that a
# pooled fresh-seed eval overruled (r3a 84.6%, r4h 87.1% vs 89.5%).  The
# final authority is therefore the pooled metric itself: winner vs incumbent
# on two fresh disjoint key sets; the winner keeps the artifact only if its
# pooled rate is at least the incumbent's.
accepted = best["src"] != str(args.init)
if accepted and args.confirm and not args.no_final_gate:
    pooled = {}
    for name, p in (("incumbent", init_params), ("winner", best_params)):
        fulls = []
        for s in (1009, 2003):
            keys = jax.random.split(jax.random.PRNGKey(args.seed + s),
                                    args.eval_episodes)
            fulls.append(big_eval(p, keys)[0])
        pooled[name] = float(np.mean(fulls))
        print(f"[gate] {name} pooled fresh-seed "
              f"(2x{args.eval_episodes}): {100 * pooled[name]:.1f}%",
              flush=True)
    if pooled["winner"] < pooled["incumbent"]:
        print(f"[gate] winner pooled {100 * pooled['winner']:.1f}% < "
              f"incumbent {100 * pooled['incumbent']:.1f}% — REVERTING "
              f"artifact to the incumbent", flush=True)
        ckpt.save(out_dir / "best_model", init_params)
        best = dict(score=score0[0], ret=score0[1], src=str(args.init),
                    reverted_by_gate=True)
        accepted = False
    best["pooled"] = pooled
(out_dir / "burst_history.json").write_text(json.dumps(
    dict(best=best, history=history, accepted=accepted,
         min_win=min_win), indent=1))

print(f"[burst] DONE accepted={accepted} best={best} "
      f"wall={time.time() - t0:.0f}s")
print(f"[burst] final artifact: {out_dir / 'best_model.npz'}")
