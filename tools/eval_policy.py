"""Large-scale deterministic policy evaluation.

Usage: python tools/eval_policy.py MODEL.npz [--env Env01-v2] [--episodes 256]

Runs N vmapped deterministic episodes (chunked kernels — see
PPO.evaluate's watchdog note), reporting return / length statistics split by
recoverable vs unrecoverable starts (the reference reset distribution puts
~13%% of Env01-v2 episodes beyond the 50-degree termination threshold at t=0;
no policy can save those). "Consistent balance" = recoverable episodes
surviving the full horizon.
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.envs.base import pitch_of, TERMINATE_PITCH
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import checkpoint as ckpt
from balance_robot_tpu.train import evaluation

p = argparse.ArgumentParser()
p.add_argument("model")
p.add_argument("--env", default="Env01-v2")
p.add_argument("--episodes", type=int, default=256)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--chunk", type=int, default=250)
p.add_argument("--dump", default=None,
               help="npz path for per-episode (return, length, start pitch) "
                    "arrays — failure analysis of the non-surviving tail")
p.add_argument("--int8", action="store_true",
               help="run the checkpoint through the int8 deployment path "
                    "(post-training quantization + integer inference sim)")
p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
               help="force the JAX backend (config.update, not the env var: "
                    "sitecustomize has already imported jax)")
args = p.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

env = brt.make(args.env)
params = ckpt.load(args.model)
# privileged-obs TEACHER checkpoint (tools/train_run.py --privileged-actor):
# the actor input is wider than the deployment obs — evaluate it through the
# same wrapped view it trained on
if "pi_w1" in params and params["pi_w1"].shape[0] > env.obs_dim:
    from balance_robot_tpu.envs.privileged import PrivilegedObsEnv
    env = PrivilegedObsEnv(env)
    assert params["pi_w1"].shape[0] == env.obs_dim, \
        f"teacher obs width {params['pi_w1'].shape[0]} != {env.obs_dim}"
    print(f"[teacher checkpoint: evaluating through PrivilegedObsEnv "
          f"({env.obs_dim}-obs)]")
max_steps = env.max_episode_steps


# Deterministic act fn by checkpoint format: PPO/A2C MLPs carry pi_w1;
# off-policy (SAC/TD3/DDPG) checkpoints carry an "actor" layer list — SAC's
# actor emits [mean, log_std] (out = 2*act_dim, deterministic = tanh(mean)),
# TD3/DDPG emit tanh(out) directly (train/offpolicy.py::_act).
if any(k.startswith("actor/") for k in params):
    from balance_robot_tpu.train.offpolicy import _apply_mlp
    n_layers = 1 + max(int(k.split("/")[1]) for k in params
                       if k.startswith("actor/"))
    actor = [{"w": jnp.asarray(params[f"actor/{i}/w"]),
              "b": jnp.asarray(params[f"actor/{i}/b"])}
             for i in range(n_layers)]
    sac = actor[-1]["b"].shape[-1] == 2 * env.act_dim

    def _op_act(p, o):
        out = _apply_mlp(actor, o)
        if sac:                                         # tanh(mean)
            mean, _ = jnp.split(out, 2, axis=-1)
            return jnp.tanh(mean)
        return jnp.clip(jnp.tanh(out), -1.0, 1.0)       # TD3/DDPG
    _act_fn = _op_act
else:
    _act_fn = lambda p, o: jnp.clip(mlp.policy_mean(p, o), -1.0, 1.0)

if args.int8:
    # Evaluate through the full int8 deployment path (ops/quant.py): the
    # same artifact the MCU runs, so numbers are comparable to the
    # reference's shipped int8 policy (tools/eval_reference_policy.py).
    from balance_robot_tpu.ops import quant
    _int8_fn = quant.int8_policy_fn(quant.quantize_policy(params))
    _act_fn = lambda p, o: _int8_fn(o)
    print("[int8 deployment path]")

# One owner for the watchdog-critical chunked rollout (train/evaluation.py).
_evaluator = evaluation.ChunkedEvaluator(env, _act_fn, chunk=args.chunk)


@jax.jit
def start_pitches(keys):
    # env.reset is pure: re-resetting with the same keys reproduces the
    # evaluator's start states exactly.
    states, _ = jax.vmap(env.reset)(keys)
    return jax.vmap(lambda s: pitch_of(s.phys.qpos))(states)


keys = jax.random.split(jax.random.PRNGKey(args.seed), args.episodes)
p0 = start_pitches(keys)
ret, lens = _evaluator.evaluate_detail(params, keys)
recoverable = np.abs(np.asarray(p0)) < TERMINATE_PITCH
if args.dump:
    np.savez(args.dump, ret=ret, lens=lens, p0=np.asarray(p0),
             seed=args.seed)
    print(f"per-episode arrays -> {args.dump}")

print(f"{args.env}  {args.model}  ({args.episodes} deterministic episodes, "
      f"horizon {max_steps})")
for name, m in (("all", np.ones_like(recoverable)),
                ("recoverable starts", recoverable),
                ("unrecoverable starts", ~recoverable)):
    if m.sum() == 0:
        continue
    full = (lens[m] >= max_steps).mean()
    print(f"  {name:22s} n={int(m.sum()):4d}  return mean {ret[m].mean():8.1f}"
          f"  len mean {lens[m].mean():6.0f} median {np.median(lens[m]):6.0f}"
          f"  full-horizon {100 * full:5.1f}%")
