"""DAgger fine-tune: clone recovery demonstrations into the flagship policy.

Consumes the (obs, act) pairs produced by tools/mpc_dagger.py (closed-loop
CEM expert from the policy's own fatal states) and fine-tunes the policy
mean by MSE, anchored on the policy's OWN behavior over nominal on-policy
observations so the ~12% failure-regime data cannot degrade the ~88% it
already handles (the failure of naive fine-tuning observed in the r2f/r2g
burst logs).  Value net and log_std are untouched — a follow-up PPO polish
(tools/burst_refine.py) re-fits them.

No reference analogue (the reference delegates training to SB3; SURVEY
§2.3) — TPU-native tooling for the flagship Env03-v2 target.

Usage:
  python tools/bc_finetune.py models/Env03-v2_r2f/best_model.npz \
      --dagger runs/dagger_mpc.npz --out models/Env03-v2_dagger \
      --steps 3000 --dagger-frac 0.3
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import balance_robot_tpu as brt
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import checkpoint as ckpt
from balance_robot_tpu.train import evaluation

ap = argparse.ArgumentParser()
ap.add_argument("model")
ap.add_argument("--dagger", action="append", required=True,
                help="npz from tools/mpc_dagger.py (repeatable)")
ap.add_argument("--env", default="Env03-v2")
ap.add_argument("--anchor-episodes", type=int, default=256,
                help="on-policy episodes whose (obs, own-mean) pairs anchor "
                     "nominal behavior during the clone")
ap.add_argument("--dagger-frac", type=float, default=0.3,
                help="fraction of each batch drawn from the dagger set")
ap.add_argument("--steps", type=int, default=3000)
ap.add_argument("--batch", type=int, default=4096)
ap.add_argument("--lr", type=float, default=3e-4)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--eval-episodes", type=int, default=512)
ap.add_argument("--out", default="models/Env03-v2_dagger")
ap.add_argument("--kl-anchor", action="store_true",
                help="anchor in the policy's own action-distribution "
                    "geometry: Gaussian KL(new||old) on anchor obs instead "
                    "of raw mean-MSE. With the converged sigma ~0.03, KL is "
                    "~1/(2*sigma^2) ~ 550x stronger per unit mean shift — "
                    "the plain-MSE anchor that let the r2 clone collapse "
                    "(docs/TRAINING.md negative result 3) was weak exactly "
                    "where the PPO objective is stiff.")
ap.add_argument("--anchor-weight", type=float, default=1.0,
                help="multiplier on the anchor term. With --kl-anchor the "
                     "KL is ~1/(2*sigma^2) ~ 550x stronger per unit mean "
                     "shift than MSE; weights in ~[0.02, 0.5] interpolate "
                     "between the collapse regime (plain MSE anchor, "
                     "negative result 3) and the too-stiff-to-learn regime "
                     "(runs/bc_kl_smoke.log: dagger-mse barely moves).")
ap.add_argument("--eval-every", type=int, default=0,
                help="run a selection eval every N clone steps and keep the "
                    "best snapshot (burst_refine-style ratchet; 0 = off, "
                    "report/save only the final params)")
ap.add_argument("--select-episodes", type=int, default=128,
                help="episodes per mid-clone selection eval (fixed keys -> "
                    "paired comparisons; report the winner on a fresh seed)")
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
max_steps = env.max_episode_steps
CHUNK = 250

# ------------------------------------------------------------ dagger data
obs_d, act_d = [], []
for p in args.dagger:
    z = np.load(p)
    obs_d.append(z["obs"])
    act_d.append(z["act"])
obs_d = jnp.asarray(np.concatenate(obs_d))
act_d = jnp.asarray(np.clip(np.concatenate(act_d), -1.0, 1.0))
print(f"dagger set: {obs_d.shape[0]} pairs", flush=True)

# ------------------------------------------------------------ anchor data
# On-policy observation stream under the CURRENT deterministic policy;
# labels are the policy's own mean (self-distillation anchor).  Chunked
# device kernels (watchdog invariant — see train/evaluation.py).


@jax.jit
def _reset_all(keys):
    states, obs = jax.vmap(env.reset)(keys)
    n = keys.shape[0]
    return states, obs, jnp.zeros(n, bool)


@jax.jit
def _collect_chunk(carry):
    def body(carry, _):
        states, obs, done = carry
        a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
        states2, obs2, r, term, trunc = jax.vmap(env.step)(states, a)
        keep = lambda A, B: jax.tree.map(
            lambda x, y: jnp.where(
                done.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), A, B)
        rec_obs, rec_alive = obs, ~done
        states = keep(states, states2)
        obs = jnp.where(done[:, None], obs, obs2)
        done = done | term | trunc
        return (states, obs, done), (rec_obs, rec_alive)

    carry, (obs_c, alive_c) = jax.lax.scan(body, carry, None, length=CHUNK)
    return carry, obs_c, alive_c


keys = jax.random.split(jax.random.PRNGKey(args.seed + 7),
                        args.anchor_episodes)
carry = _reset_all(keys)
obs_a, t0, steps = [], time.time(), 0
while steps < max_steps:
    carry, obs_c, alive_c = _collect_chunk(carry)
    m = np.asarray(alive_c).reshape(-1)
    obs_a.append(np.asarray(obs_c).reshape(-1, obs_c.shape[-1])[m])
    steps += CHUNK
    if bool(carry[2].all()):
        break
obs_a = jnp.asarray(np.concatenate(obs_a))
act_a = jax.jit(lambda o: jnp.clip(mlp.policy_mean(params, o), -1, 1))(obs_a)
print(f"anchor set: {obs_a.shape[0]} on-policy pairs "
      f"({time.time() - t0:.0f}s)", flush=True)

# ----------------------------------------------------------------- clone
B = args.batch
n_d = max(1, int(B * args.dagger_frac))
n_a = B - n_d
opt = optax.adam(args.lr)
opt_state = opt.init(params)


@jax.jit
def train_step(params, opt_state, key):
    kd, ka = jax.random.split(key)
    i_d = jax.random.randint(kd, (n_d,), 0, obs_d.shape[0])
    i_a = jax.random.randint(ka, (n_a,), 0, obs_a.shape[0])
    o = jnp.concatenate([obs_d[i_d], obs_a[i_a]])
    a = jnp.concatenate([act_d[i_d], act_a[i_a]])

    def loss_fn(p):
        pred = mlp.policy_mean(p, o)
        # per-set means so the report separates regression sources
        l_d = jnp.mean((pred[:n_d] - a[:n_d]) ** 2)
        if args.kl_anchor:
            # log_std is frozen during the clone, so KL(new||old) per
            # anchor obs reduces to sum_d (d_mu_d)^2 / (2 sigma_d^2).
            inv_2var = 0.5 * jnp.exp(-2.0 * params["log_std"])
            l_a = jnp.mean(jnp.sum(
                ((pred[n_d:] - a[n_d:]) ** 2) * inv_2var, axis=-1))
        else:
            l_a = jnp.mean((pred[n_d:] - a[n_d:]) ** 2)
        return (args.dagger_frac * l_d
                + (1 - args.dagger_frac) * args.anchor_weight * l_a,
                (l_d, l_a))

    (loss, (l_d, l_a)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, l_d, l_a


# (clone loop runs below, after the eval helpers it selects with)

# ------------------------------------------------------------------ eval
# One owner for the watchdog-critical chunked rollout (train/evaluation.py).
_evaluator = evaluation.ChunkedEvaluator(
    env, lambda p, o: jnp.clip(mlp.policy_mean(p, o), -1.0, 1.0))


def full_eval(p, seed, episodes=None):
    ret, lens = _evaluator.evaluate_detail(
        p, jax.random.split(jax.random.PRNGKey(seed),
                            episodes or args.eval_episodes))
    return (float((lens >= max_steps).mean()),
            float(ret.mean()), float(lens.mean()))


# ----------------------------------------------------------------- clone
key = jax.random.PRNGKey(args.seed)
t0 = time.time()
best = None                     # (full, ret, step, params) under paired keys
if args.eval_every:
    f0, r0, _ = full_eval(params, args.seed + 1, args.select_episodes)
    best = (f0, r0, -1, params)
    print(f"[bc  init] selection full={100 * f0:.1f}% ret={r0:.0f} "
          f"({args.select_episodes} paired episodes)", flush=True)
for i in range(args.steps):
    key, k = jax.random.split(key)
    params, opt_state, l_d, l_a = train_step(params, opt_state, k)
    if i % 500 == 0 or i == args.steps - 1:
        print(f"[bc {i:5d}] dagger-mse {float(l_d):.5f} "
              f"anchor-{'kl' if args.kl_anchor else 'mse'} "
              f"{float(l_a):.5f}", flush=True)
    if args.eval_every and ((i + 1) % args.eval_every == 0
                            or i == args.steps - 1):
        f, r, _ = full_eval(params, args.seed + 1, args.select_episodes)
        tag = ""
        if (f, r) > (best[0], best[1]):
            best = (f, r, i, params)
            tag = "  <-- new best"
        print(f"[bc {i:5d}] selection full={100 * f:.1f}% "
              f"ret={r:.0f}{tag}", flush=True)
if best is not None:
    print(f"selection winner: step {best[2]} "
          f"full={100 * best[0]:.1f}% ret={best[1]:.0f}", flush=True)
    params = best[3]
print(f"clone done ({time.time() - t0:.0f}s)", flush=True)

full, ret, length = full_eval(params, args.seed)
print(f"cloned policy: full={100 * full:.1f}% ret={ret:.0f} len={length:.0f}"
      f"  ({args.eval_episodes} episodes)")
out = pathlib.Path(args.out)
out.mkdir(parents=True, exist_ok=True)
ckpt.save(out / "best_model", params)
print(f"saved -> {out / 'best_model.npz'}")
