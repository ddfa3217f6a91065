"""Launch an off-policy (SAC/TD3/DDPG) training run.

The CLI `train` command uses factory defaults (SB3-equivalent); this tool
additionally exposes the vectorization knobs that govern the
update-to-data ratio: with n_envs parallel envs and SB3 `train_freq=1,
gradient_steps=1` semantics, one jitted iteration collects n_envs
transitions but does gradient_steps updates — so the effective ratio is
gradient_steps / n_envs (SB3 single-env default is 1/1).  Matching the
reference's "SAC trains well" finding (reference README.md:168-178) needs
enough updates per transition, not just transitions.

Usage:
  python tools/train_offpolicy.py SAC Env01-v2 --envs 64 --grad-steps 8 \
      --max-steps 3000000 --max-wall 1800
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

import balance_robot_tpu as brt
from balance_robot_tpu.train import runner
from balance_robot_tpu.train import checkpoint
from balance_robot_tpu.train.factory import algorithm_factory

p = argparse.ArgumentParser()
p.add_argument("algo", choices=("SAC", "TD3", "DDPG"))
p.add_argument("env_id")
p.add_argument("--envs", type=int, default=64)
p.add_argument("--grad-steps", type=int, default=8,
               help="gradient updates per vectorized env step")
p.add_argument("--batch", type=int, default=256)
p.add_argument("--buffer", type=int, default=1_000_000)
p.add_argument("--lr", type=float, default=None,
               help="override the per-algo SB3 default")
p.add_argument("--gamma", type=float, default=0.99)
p.add_argument("--learning-starts", type=int, default=10_000,
               help="random-action warmup in TRANSITIONS (SB3 SAC "
                    "default 100 is tuned for 1 env; a vectorized run "
                    "fills that in <1 iteration)")
p.add_argument("--seed", type=int, default=0)
p.add_argument("--init", default=None)
p.add_argument("--resume", action="store_true",
               help="exact restart from <models>/<run-name>/resume_state.npz"
                    " (params + opts + replay buffer pointer state)")
p.add_argument("--max-steps", type=int, default=int(5e6))
p.add_argument("--max-wall", type=float, default=None)
p.add_argument("--eval-freq", type=int, default=100_000)
p.add_argument("--eval-episodes", type=int, default=16)
p.add_argument("--run-name", default=None)
p.add_argument("--solver", choices=("fast", "exact"), default="fast")
p.add_argument("--physics", choices=("pallas", "xla"), default="pallas")
p.add_argument("--privileged-critic", action="store_true")
p.add_argument("--platform", choices=["tpu", "cpu"], default=None)
args = p.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

env = brt.make(args.env_id)
if args.solver == "fast":
    env.use_fast_solver()
if args.physics == "pallas" and hasattr(env, "use_pallas_physics"):
    try:
        env.use_pallas_physics()
    except NotImplementedError as e:
        print(f"pallas physics unavailable for {args.env_id}: {e}; "
              "using the XLA path")

overrides = dict(gradient_steps=args.grad_steps, batch_size=args.batch,
                 buffer_size=args.buffer, gamma=args.gamma,
                 learning_starts=args.learning_starts,
                 privileged_critic=args.privileged_critic)
if args.lr is not None:
    overrides["lr"] = args.lr
trainer, cfg = algorithm_factory(args.algo, env, n_envs=args.envs,
                                 **overrides)
init = checkpoint.load(args.init) if args.init else None
run_name = args.run_name or f"{args.env_id}_{args.algo}"
best, hist = runner.train(
    env, cfg, seed=args.seed, total_timesteps=args.max_steps,
    eval_freq=args.eval_freq, ckpt_freq=4 * args.eval_freq,
    n_eval_episodes=args.eval_episodes, init_params=init,
    max_wall_s=args.max_wall, trainer=trainer, run_name=run_name,
    resume=args.resume, models_dir="models", logs_dir="logs")
print(f"done; artifacts under models/{run_name}/")
