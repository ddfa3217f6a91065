"""On-hardware pallas-vs-XLA obs drift measurement (the Mosaic
float-contraction bound).

The fused pallas kernels are bit-exact against XLA in interpret mode
(tests/test_pallas_block.py, test_pallas_step.py); on hardware Mosaic
contracts floats differently, so trajectories diverge chaotically.
Measured on a v5-lite chip (2026-08-17, 64 envs, deterministic actions):

  env        step1      step5    note
  Env03-v2   8.9e-06    1.7e-04  14-dof block kernel
  Env01-v2   3.3e-04    9.7e-04  8-dof kernel; the finite-difference
                                 pitch_dot obs divides by dt=5 ms, so a
                                 state delta shows up x200 in the obs

bench.py asserts the Env01-v2 bounds on every round's chip run so a
Mosaic regression fails loudly instead of silently corrupting training;
tools/check_pallas_drift.py is the standalone probe.
"""

import numpy as np
import jax
import jax.numpy as jnp

# ~10x headroom over the measured values above
STEP1_BOUND = {"Env01-v2": 3e-3, "Env03-v2": 1e-4}
STEP5_BOUND = {"Env01-v2": 1e-2, "Env03-v2": 2e-3}


def obs_drift(env_id, steps=5, batch=64, seed=0):
    """Per-step max|obs_pallas - obs_xla| over a batch of identical resets
    driven by identical deterministic actions.  Element [0] is the reset
    obs (must be 0.0 — both paths share reset); element [k] is after k
    control steps."""
    import balance_robot_tpu as brt

    env_x = brt.make(env_id)
    env_x.use_fast_solver()
    env_p = brt.make(env_id)
    env_p.use_fast_solver()
    env_p.use_pallas_physics()

    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    sx, ox = jax.jit(jax.vmap(env_x.reset))(keys)
    sp, op = jax.jit(jax.vmap(env_p.reset))(keys)
    step_x = jax.jit(jax.vmap(env_x.step))
    step_p = jax.jit(jax.vmap(env_p.step))

    out = [float(jnp.max(jnp.abs(ox - op)))]
    for t in range(steps):
        a = jnp.tile(jnp.asarray(
            [[0.3 * np.sin(0.1 * t), -0.2 * np.sin(0.13 * t)]],
            jnp.float32), (batch, 1))
        sx, ox, _, _, _ = step_x(sx, a)
        sp, op, _, _, _ = step_p(sp, a)
        out.append(float(jnp.max(jnp.abs(ox - op))))
    return out


def assert_drift_bounded(env_id, steps=5, batch=16, seed=0):
    """Raises AssertionError if the on-chip kernel has drifted past the
    documented envelope.  Call only on real TPU hardware."""
    d = obs_drift(env_id, steps=steps, batch=batch, seed=seed)
    assert d[0] == 0.0, f"reset obs differ: {d[0]:.3e}"
    assert d[1] < STEP1_BOUND[env_id], \
        f"{env_id} step-1 drift {d[1]:.3e} > {STEP1_BOUND[env_id]:.0e}"
    last = min(steps, 5)
    assert d[last] < STEP5_BOUND[env_id], \
        f"{env_id} step-{last} drift {d[last]:.3e} > " \
        f"{STEP5_BOUND[env_id]:.0e}"
    return d
