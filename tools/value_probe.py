"""Does the critic anticipate block impacts?  (privileged-critic diagnostic)

Rolls deterministic episodes on an Env03 env and records, per control step,
the critic's value V(s) (with the critic input the checkpoint was trained
on: [obs] or [obs, privileged]), the reward, and block-launch events.
Reports:

  * overall explained variance of V vs the empirical discounted
    return-to-go (the quantity GAE bootstraps from);
  * the mean V trace aligned on launches, split by episodes that survive
    the launch window vs die in it — an anticipating critic dips BETWEEN
    launch and impact (~8 steps), a blind one only after the hit.

A symmetric 6-obs critic cannot see the flight, so its launch-aligned trace
is flat until the impact perturbs the obs; the privileged critic
(train/ppo.py privileged_critic) should price the flight in immediately.

Usage:
  python tools/value_probe.py models/Env03-v2_r3a/best_model.npz \
      [--env Env03-v2] [--episodes 128] [--gamma 0.999] [--platform cpu]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import checkpoint as ckpt

ap = argparse.ArgumentParser()
ap.add_argument("model")
ap.add_argument("--env", default="Env03-v2")
ap.add_argument("--episodes", type=int, default=128)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--chunk", type=int, default=250)
ap.add_argument("--gamma", type=float, default=0.999)
ap.add_argument("--window", type=int, default=40,
                help="steps after a launch treated as the impact window")
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

obs_dim = int(params["pi_w1"].shape[0])
vf_in = int(params["vf_w1"].shape[0])
use_priv = vf_in > obs_dim
if use_priv:
    assert vf_in == obs_dim + env.priv_dim, \
        f"critic width {vf_in} != obs {obs_dim} + priv {env.priv_dim}"
print(f"critic: {'privileged' if use_priv else 'symmetric'} "
      f"(vf input {vf_in})")


def _block_dist(state):
    q = jnp.stack(state.phys.qpos)
    return jnp.linalg.norm(q[9:11] - q[0:2])


def _value(p, obs, states):
    if not use_priv:
        return mlp.value(p, obs)
    priv = jax.vmap(env.privileged)(states)
    return mlp.value(p, jnp.concatenate([obs, priv], axis=-1))


@jax.jit
def reset_all(keys):
    states, obs = jax.vmap(env.reset)(keys)
    n = keys.shape[0]
    return (states, obs, jnp.zeros(n, bool), jnp.zeros(n, jnp.int32),
            jnp.zeros(n, bool))


@jax.jit
def chunk(carry):
    """One CHUNK of steps recording (V, reward, fired, alive) per step —
    chunked device kernels (TPU watchdog, see train/evaluation.py)."""
    def body(carry, _):
        states, obs, done, t, prev_parked = carry
        v = _value(params, obs, states)
        a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
        states2, obs2, r, term, trunc = jax.vmap(env.step)(states, a)
        alive = ~done
        d2 = jax.vmap(_block_dist)(states2)
        fired = prev_parked & (d2 < 0.5) & alive
        keep = lambda A, B: jax.tree.map(
            lambda x, y: jnp.where(
                done.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), A, B)
        states = keep(states, states2)
        obs = keep(obs, obs2)
        rec = (v, jnp.where(alive, r, 0.0), fired, alive)
        t = t + alive.astype(jnp.int32)
        done = done | term | trunc
        prev_parked = jnp.where(alive, d2 > 2.0, prev_parked)
        return (states, obs, done, t, prev_parked), rec

    return jax.lax.scan(body, carry, None, length=args.chunk)


keys = jax.random.split(jax.random.PRNGKey(args.seed), args.episodes)
carry = reset_all(keys)
V, R, F, A = [], [], [], []
steps = 0
while steps < max_steps:
    carry, (v, r, f, al) = chunk(carry)
    V.append(np.asarray(v)); R.append(np.asarray(r))
    F.append(np.asarray(f)); A.append(np.asarray(al))
    steps += args.chunk
    if bool(carry[2].all()):
        break
V = np.concatenate(V)[:max_steps]        # (T, B)
R = np.concatenate(R)[:max_steps]
F = np.concatenate(F)[:max_steps]
A = np.concatenate(A)[:max_steps]
T, B = V.shape
lens = A.sum(0)

# empirical discounted return-to-go (alive steps only); terminal episodes
# end with 0 beyond death, full-horizon ones are truncated — drop the last
# H steps of each episode from the EV to bound truncation-bootstrap bias
G = np.zeros_like(R)
acc = np.zeros(B)
for t in range(T - 1, -1, -1):
    acc = R[t] + args.gamma * acc * A[t]
    G[t] = acc
H_trunc = 100
mask = A.copy()
for b in range(B):
    L = int(lens[b])
    mask[max(0, L - H_trunc):, b] = False   # tail: return-to-go ill-defined
m = mask.reshape(-1)
ev = 1.0 - np.var(G.reshape(-1)[m] - V.reshape(-1)[m]) / (
    np.var(G.reshape(-1)[m]) + 1e-8)
print(f"{args.env} {args.model}: {args.episodes} episodes, "
      f"full-horizon {100 * (lens >= max_steps).mean():.1f}%")
print(f"explained variance of V vs discounted return-to-go "
      f"(gamma={args.gamma}, tails dropped): {ev:+.3f}")

# launch-aligned V traces
W = args.window
pre = 5
trace_sur, trace_die = [], []
for b in range(B):
    for t in np.nonzero(F[:, b])[0]:
        if t < pre or t + W >= T:
            continue
        seg = V[t - pre:t + W, b]
        alive_seg = A[t:t + W, b]
        (trace_sur if alive_seg.all() else trace_die).append(seg)
for name, tr in (("survived window", trace_sur), ("died in window",
                                                  trace_die)):
    if not tr:
        print(f"  launch-aligned V ({name}): none")
        continue
    tr = np.stack(tr)
    base = tr[:, :pre].mean()
    print(f"  launch-aligned V ({name}, n={len(tr)}): "
          f"pre {base:7.1f}  launch+4 {tr[:, pre + 4].mean():7.1f}  "
          f"launch+8 {tr[:, pre + 8].mean():7.1f}  "
          f"launch+{W - 1} {tr[:, -1].mean():7.1f}")
    dip = base - tr[:, pre + 8].mean()
    print(f"    anticipation dip by impact (~launch+8): {dip:+.1f}")
