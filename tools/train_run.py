"""Launch a PPO training run (TPU). Usage:
  python tools/train_run.py ENV_ID [--envs N] [--steps N] [--mb N] [--seed S]
      [--init params.npz] [--max-steps N] [--max-wall S] [--run-name NAME]
"""
import argparse, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import jax
import balance_robot_tpu as brt
from balance_robot_tpu.train.ppo import PPOConfig
from balance_robot_tpu.train import runner, checkpoint

p = argparse.ArgumentParser()
p.add_argument("env_id")
p.add_argument("--envs", type=int, default=1024)
p.add_argument("--steps", type=int, default=32)
p.add_argument("--mb", type=int, default=1024)
p.add_argument("--epochs", type=int, default=10)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--init", default=None)
p.add_argument("--resume", action="store_true",
               help="exact restart from <models>/<run-name>/resume_state.npz "
                    "(params + optimizer + env states + rng + step counter)")
p.add_argument("--max-steps", type=int, default=int(3e7))
p.add_argument("--max-wall", type=float, default=None)
p.add_argument("--run-name", default=None)
p.add_argument("--eval-freq", type=int, default=200_000)
p.add_argument("--eval-episodes", type=int, default=5)
p.add_argument("--gamma", type=float, default=0.99)
p.add_argument("--ent-coef", type=float, default=0.0)
p.add_argument("--lr", type=float, default=3e-4)
p.add_argument("--solver", choices=("fast", "turbo", "exact"), default="fast",
               help="constraint-solver grade: exact = machine-exact; fast = "
                    "training (2x speed, 1.5e-8 parity); turbo = newton 2/"
                    "ls 4 (3.6x, ~5e-4 qpos drift over 40 control steps)")
p.add_argument("--physics", choices=("pallas", "xla"), default="pallas",
               help="pallas = fused 250-substep TPU kernel (8-dof scenes; "
                    "~5x rollout speed); xla = reference path")
p.add_argument("--privileged-critic", action="store_true",
               help="asymmetric actor-critic: value net sees the env's "
                    "privileged features (training-only; see train/ppo.py)")
p.add_argument("--privileged-actor", action="store_true",
               help="TEACHER mode: the actor ALSO sees the privileged "
                    "features (obs = [obs, privileged]); training "
                    "infrastructure for DAgger distillation + the "
                    "observability-floor measurement (envs/privileged.py). "
                    "Never exported.")
p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
               help="force the JAX backend (config.update, not the env "
                    "var: sitecustomize has already imported jax)")
args = p.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

env = brt.make(args.env_id)
if args.solver == "fast":
    env.use_fast_solver()
elif args.solver == "turbo":
    from balance_robot_tpu.physics import fast_solver
    env.params = fast_solver(env.params, newton_iters=2, ls_iters=4)
if args.physics == "pallas" and hasattr(env, "use_pallas_physics"):
    try:
        env.use_pallas_physics()
    except NotImplementedError as e:
        print(f"pallas physics unavailable for {args.env_id}: {e}; "
              "using the XLA path")
if args.privileged_actor:
    from balance_robot_tpu.envs.privileged import PrivilegedObsEnv
    env = PrivilegedObsEnv(env)
cfg = PPOConfig(n_envs=args.envs, n_steps=args.steps,
                minibatch_size=args.mb, n_epochs=args.epochs,
                gamma=args.gamma, ent_coef=args.ent_coef, lr=args.lr,
                privileged_critic=args.privileged_critic)
init = checkpoint.load(args.init) if args.init else None
if init is not None and args.privileged_actor:
    # warm start the teacher from a 6-obs checkpoint: zero rows on the new
    # privileged inputs keep the initial policy exactly the incumbent
    # (PPO.init pads the critic the same way)
    from balance_robot_tpu.models import mlp
    init = mlp.pad_privileged_actor(init, env.obs_dim)
best, hist = runner.train(
    env, cfg, seed=args.seed, total_timesteps=args.max_steps,
    eval_freq=args.eval_freq, ckpt_freq=2 * args.eval_freq,
    n_eval_episodes=args.eval_episodes,
    init_params=init, max_wall_s=args.max_wall, resume=args.resume,
    run_name=args.run_name, models_dir="models", logs_dir="logs")
print("done; best saved under models/")
