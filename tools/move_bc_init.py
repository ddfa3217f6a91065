"""Fit the EnvMove05 deployment MLP to a scripted wheel-speed threshold
policy (the best THRESH member from tools/move_probe.py) as a BC init for
the PPO run toward the registered 900 reward threshold.

The policy only reads obs[0] = wheel_speed/170 (obs[1] = yaw/45 maps to
a1 = 0; lidar slots are zeroed as-built — envs/move.py::_obs), so this is a
1-D function fit:  a0(ws) = lo + (hi - lo) * sigmoid((mid - ws) / width).

Also stamps `log_std` (default -1.5): PPO warm starts sample with
std = exp(log_std), and the SB3 default 0 (std 1) would wash out the
limit-cycle behavior the init encodes before the first update.
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import checkpoint as ckpt

ap = argparse.ArgumentParser()
ap.add_argument("--mid", type=float, required=True, help="threshold [rad/s]")
ap.add_argument("--width", type=float, required=True)
ap.add_argument("--a-hi", type=float, required=True)
ap.add_argument("--a-lo", type=float, required=True)
ap.add_argument("--out", required=True)
ap.add_argument("--log-std", type=float, default=-1.5)
ap.add_argument("--steps", type=int, default=3000)
ap.add_argument("--seed", type=int, default=0)
args = ap.parse_args()

jax.config.update("jax_platforms", "cpu")


def target_a0(ws):
    g = jax.nn.sigmoid((args.mid - ws) / args.width)
    return args.a_lo + (args.a_hi - args.a_lo) * g


params = mlp.init_params(jax.random.PRNGKey(args.seed), 10, 2)
optim = optax.adam(1e-3)
opt_state = optim.init(params)


@jax.jit
def step(params, opt_state, key):
    k1, k2 = jax.random.split(key)
    n = 4096
    obs = jnp.zeros((n, 10))
    ws = jax.random.uniform(k1, (n,), minval=-20.0, maxval=60.0)
    obs = obs.at[:, 0].set(ws / 170.0)
    obs = obs.at[:, 1].set(jax.random.uniform(k2, (n,), minval=-1.0,
                                              maxval=1.0))
    lab = jnp.stack([target_a0(ws), jnp.zeros(n)], axis=-1)

    def loss_fn(p):
        # Relative error: the harvest reward term is ~0.03*ws/(20*a0), so
        # a0 needs ~1e-3 ABSOLUTE precision near the small a_lo plateau —
        # plain MSE spends all capacity on the a_hi step and leaves a0
        # wobbling +-3e-3 (even negative) exactly where the denominator
        # lives.  Scale each residual by 1/(|target|+1e-2).
        err = (mlp.policy_mean(p, obs) - lab) / (jnp.abs(lab) + 1e-2)
        return jnp.mean(err ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optim.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


key = jax.random.PRNGKey(args.seed + 1)
for i in range(args.steps):
    key, k = jax.random.split(key)
    params, opt_state, loss = step(params, opt_state, k)
    if i % 500 == 0 or i == args.steps - 1:
        print(f"fit step {i}: mse={float(loss):.6f}", flush=True)

params = dict(params)
params["log_std"] = jnp.full((2,), args.log_std, jnp.float32)
out = pathlib.Path(args.out)
out.parent.mkdir(parents=True, exist_ok=True)
ckpt.save(out.with_suffix(""), params)
# report the fit along the 1-D section that matters
ws = np.linspace(-5, 45, 11)
obs = np.zeros((11, 10), np.float32)
obs[:, 0] = ws / 170.0
pred = np.asarray(mlp.policy_mean(params, jnp.asarray(obs)))
tgt = np.asarray(target_a0(jnp.asarray(ws)))
for w, p_, t_ in zip(ws, pred, tgt):
    print(f"  ws={w:6.1f}  a0 fit={p_[0]:+.4f} target={t_:+.4f}  "
          f"a1={p_[1]:+.4f}")
print(f"saved -> {out}")
