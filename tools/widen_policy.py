"""Produce a function-preserving wide (and optionally privileged-input)
copy of a trained checkpoint — the teacher-v2 PPO warm start
(mlp.net2net_widen; see docs/TRAINING.md round-4 log).

Usage:
  python tools/widen_policy.py models/Env03-v2_PPO/best_model.npz \
      --env Env03-v2 --priv --hidden 256 --out models/x/wide_init.npz
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
ap.add_argument("--hidden", type=int, default=256)
ap.add_argument("--priv", action="store_true",
                help="widen the input to [obs, privileged] too")
ap.add_argument("--out", required=True)
ap.add_argument("--seed", type=int, default=0)
args = ap.parse_args()

jax.config.update("jax_platforms", "cpu")
env = brt.make(args.env)
in_dim = env.obs_dim + (env.priv_dim if args.priv else 0)
params = ckpt.load(args.model)
wide = mlp.net2net_widen(params, jax.random.PRNGKey(args.seed),
                         obs_dim=in_dim, hidden=args.hidden,
                         vf_obs_dim=in_dim)
# exactness check on random inputs
x = jax.random.normal(jax.random.PRNGKey(1), (64, in_dim))
old_in = params["pi_w1"].shape[0]
np.testing.assert_allclose(
    np.asarray(mlp.policy_mean(wide, x)),
    np.asarray(mlp.policy_mean(params, x[:, :old_in])), atol=1e-5)
np.testing.assert_allclose(
    np.asarray(mlp.value(wide, x)),
    np.asarray(mlp.value(params, x[:, :params["vf_w1"].shape[0]])),
    atol=1e-4)
out = pathlib.Path(args.out)
out.parent.mkdir(parents=True, exist_ok=True)
ckpt.save(out.with_suffix(""), wide)
print(f"exact wide copy: in {old_in}->{in_dim}, hidden "
      f"{params['pi_w1'].shape[1]}->{args.hidden} -> {out}")
