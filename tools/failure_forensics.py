"""Per-episode failure forensics for the Env03 block envs.

Runs N deterministic episodes (chunked kernels, see PPO.evaluate's watchdog
note) and records, per episode: length, attack side, number of block
launches survived, the time from the LAST launch to failure, and the pitch /
pitch-rate at failure.  The aggregate answers the questions that decide the
training strategy for the flagship target:

  - are failures concentrated on one attack side?           -> side-specific
  - do they happen right after a launch (impact kill) or    -> recovery vs
    between launches (drift / compounding error)?              steady-state
  - at which hit count do they happen (fatigue vs uniform)? -> per-hit iid?

Usage: python tools/failure_forensics.py MODEL.npz [--episodes 512]
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

p = argparse.ArgumentParser()
p.add_argument("model")
p.add_argument("--env", default="Env03-v2")
p.add_argument("--episodes", type=int, default=512)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--chunk", type=int, default=250)
p.add_argument("--dump", default=None)
p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
               help="force the JAX backend (config.update, not the env "
                    "var: sitecustomize has already imported jax)")
args = p.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

env = brt.make(args.env)
env.use_fast_solver()
if jax.devices()[0].platform == "tpu" and hasattr(env, "use_pallas_physics"):
    env.use_pallas_physics()
params = ckpt.load(args.model)
max_steps = env.max_episode_steps


def block_dist(state):
    q = jnp.stack(state.phys.qpos)
    return jnp.linalg.norm(q[9:11] - q[0:2])


@jax.jit
def reset_all(keys):
    states, obs = jax.vmap(env.reset)(keys)
    n = keys.shape[0]
    extras = dict(
        n_fires=jnp.ones(n, jnp.int32),      # reset fires the first block
        last_fire_t=jnp.zeros(n, jnp.int32),
        fail_pitch=jnp.zeros(n),
        fail_pdot=jnp.zeros(n),
        prev_pitch=jax.vmap(lambda s: pitch_of(s.phys.qpos))(states),
        prev_parked=jnp.zeros(n, bool),
    )
    return (states, obs, jnp.zeros(n), jnp.zeros(n, bool),
            jnp.zeros(n, jnp.int32), extras)


@jax.jit
def chunk(carry):
    def body(carry, _):
        states, obs, ret, done, t, ex = carry
        a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
        states2, obs2, r, term, trunc = jax.vmap(env.step)(states, a)
        keep = lambda A, B: jax.tree.map(
            lambda x, y: jnp.where(
                done.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), A, B)
        pitch2 = jax.vmap(lambda s: pitch_of(s.phys.qpos))(states2)
        # launch detection: the block was parked far away last step and is
        # now back on the 0.3 m spawn circle.
        d2 = jax.vmap(block_dist)(states2)
        parked2 = d2 > 2.0
        fired = ex["prev_parked"] & (d2 < 0.5)
        alive = ~done
        new_fail = alive & term
        pdot = (pitch2 - ex["prev_pitch"]) / 0.005
        ex2 = dict(
            n_fires=ex["n_fires"] + (fired & alive).astype(jnp.int32),
            last_fire_t=jnp.where(fired & alive, t + 1, ex["last_fire_t"]),
            fail_pitch=jnp.where(new_fail, pitch2, ex["fail_pitch"]),
            fail_pdot=jnp.where(new_fail, pdot, ex["fail_pdot"]),
            prev_pitch=jnp.where(alive, pitch2, ex["prev_pitch"]),
            prev_parked=jnp.where(alive, parked2, ex["prev_parked"]),
        )
        states = keep(states, states2)
        obs = keep(obs, obs2)
        ret = ret + jnp.where(done, 0.0, r)
        t = t + alive.astype(jnp.int32)
        done = done | term | trunc
        return (states, obs, ret, done, t, ex2), None

    carry, _ = jax.lax.scan(body, carry, None, length=args.chunk)
    return carry


keys = jax.random.split(jax.random.PRNGKey(args.seed), args.episodes)
carry = reset_all(keys)
attack_front = np.asarray(carry[0].aux["attack_front"])
steps = 0
while steps < max_steps:
    carry = chunk(carry)
    steps += args.chunk
    if bool(carry[3].all()):
        break

_, _, ret, _, lens, ex = carry
lens = np.asarray(lens)
ret = np.asarray(ret)
n_fires = np.asarray(ex["n_fires"])
last_fire = np.asarray(ex["last_fire_t"])
fail_pitch = np.asarray(ex["fail_pitch"])
fail_pdot = np.asarray(ex["fail_pdot"])

full = lens >= max_steps


def _pct(mask):
    """Guarded percentage over a possibly-empty slice (small --episodes can
    draw a single attack side; a weak checkpoint can have zero survivors)."""
    return f"{100 * full[mask].mean():.1f}%" if mask.any() else "n/a"


failed = ~full
print(f"{args.env} {args.model}: n={args.episodes} full-horizon "
      f"{100 * full.mean():.1f}%  (front {_pct(attack_front)}"
      f" n={attack_front.sum()}, back {_pct(~attack_front)}"
      f" n={(~attack_front).sum()})")
if failed.sum():
    dt_fail = lens[failed] - last_fire[failed]
    full_fires = (f"~{np.median(n_fires[full]):.0f}" if full.any()
                  else "n/a")
    print(f"failures: {failed.sum()}")
    print(f"  hits survived (n_fires at death): "
          f"min {n_fires[failed].min()} med {np.median(n_fires[failed]):.0f} "
          f"max {n_fires[failed].max()}  (full-horizon episodes see "
          f"{full_fires})")
    print(f"  steps from last launch to death: "
          f"min {dt_fail.min()} med {np.median(dt_fail):.0f} "
          f"p90 {np.percentile(dt_fail, 90):.0f} max {dt_fail.max()}")
    print(f"  death pitch sign: +{(fail_pitch[failed] > 0).sum()} "
          f"/ -{(fail_pitch[failed] < 0).sum()}   |pdot| med "
          f"{np.median(np.abs(fail_pdot[failed])):.1f} rad/s")
    frac_impact = (dt_fail <= 40).mean()
    print(f"  fraction dying within 0.2 s of a launch: "
          f"{100 * frac_impact:.0f}%")
    hist, edges = np.histogram(lens[failed], bins=[0, 150, 300, 450, 600,
                                                   750, 900, 1050, 1200])
    print("  death-time histogram (steps):",
          {f"{edges[i]}-{edges[i + 1]}": int(hist[i])
           for i in range(len(hist))})
if args.dump:
    np.savez(args.dump, lens=lens, ret=ret, n_fires=n_fires,
             last_fire=last_fire, fail_pitch=fail_pitch,
             fail_pdot=fail_pdot, attack_front=attack_front)
    print(f"-> {args.dump}")
