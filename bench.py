"""Benchmark: vectorized env throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: env-steps/s at 4096 envs on a single chip — each env step is a full
reference-parity control step (250 implicitfast substeps + contacts + Newton
solve + obs / reward / termination / auto-reset) plus the policy forward,
with the training-grade solver (newton 4 / ls 6: 1.5e-8 qpos agreement with
real MuJoCo over 10k substeps — the grade the trainer actually runs) and the
fused pallas control-step kernel (250 substeps per kernel; bit-identical to
the XLA path in interpret mode, ~1e-5/control-step float-contraction
divergence on hardware — see physics/pallas_step.py and docs/PERFORMANCE.md).
vs_baseline is the speedup over the reference's single-env CPU throughput
measured on this host by tools/measure_reference.py (the reference publishes
no numbers; BASELINE.md).

Timing note: under the axon tunnel `block_until_ready` does NOT synchronize;
every timed repetition ends with a scalar value readback (`float(...)`),
which does. The ~36 ms tunnel round-trip is amortized over seconds-long
repetitions.
"""

import json
import pathlib
import time

import jax
import jax.numpy as jnp

from balance_robot_tpu.envs.env01 import Env01V2
from balance_robot_tpu.envs.vector import VecEnv
from balance_robot_tpu.models import mlp

N_ENVS = 4096
N_STEPS = 25        # control steps per timed scan
REPEATS = 4


def _require_live_backend(timeout_s=90.0):
    """Fail fast if the TPU tunnel is dead instead of hanging forever.

    The axon relay can die between rounds (observed 2026-08-17); with it
    down, the first backend-touching call blocks indefinitely and a driver
    running `python bench.py` with no timeout would stall.  Probe device
    init on a daemon thread and exit(1) with a diagnostic if it doesn't
    come up in time — the hung thread is abandoned via os._exit."""
    import os
    import sys
    import threading

    result = {}

    def probe():
        try:
            result["devices"] = jax.devices()
        except Exception as e:                      # pragma: no cover
            result["error"] = repr(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" in result:
        return result["devices"]
    why = result.get("error", "probe thread still blocked - TPU tunnel "
                              "relay down?")
    print(f"bench: backend init did not complete in {timeout_s:.0f}s "
          f"({why}); refusing to hang", file=sys.stderr)
    sys.stderr.flush()
    os._exit(1)


def main():
    _require_live_backend()
    env = Env01V2().use_fast_solver().use_pallas_physics()
    vec = VecEnv(env, N_ENVS)
    key = jax.random.PRNGKey(0)
    params = mlp.init_params(jax.random.PRNGKey(1))
    states, obs = vec.reset(key)

    @jax.jit
    def run(states, obs, key):
        def body(carry, _):
            states, obs, key = carry
            key, k = jax.random.split(key)
            mean, log_std, _ = mlp.forward(params, obs)
            actions = mlp.sample(k, mean, log_std)
            states, out = vec.step(states, actions)
            return (states, out.obs, key), out.reward.mean()
        (states, obs, key), rews = jax.lax.scan(
            body, (states, obs, key), None, length=N_STEPS)
        return states, obs, key, rews.mean()

    # compile + warmup (value readback = real synchronization)
    t0 = time.perf_counter()
    states, obs, key, r = run(states, obs, key)
    float(r)
    compile_s = time.perf_counter() - t0

    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        states, obs, key, r = run(states, obs, key)
        float(r)
        dt = time.perf_counter() - t0
        best = max(best, N_ENVS * N_STEPS / dt)

    ref_file = pathlib.Path(__file__).parent / "tools/reference_baseline.json"
    ref_sps = json.loads(ref_file.read_text())[
        "reference_env_steps_per_sec_cpu"] if ref_file.exists() else 140.8

    # On-hardware pallas drift bounds (utils/drift.py): a Mosaic regression
    # must fail the bench loudly, not silently corrupt training.  Both fused
    # kernels are asserted: Env01-v2 (8-dof, physics/pallas_step.py) and
    # Env03-v2 (14-dof block kernel, physics/pallas_block.py) — the flagship
    # trains on the latter.
    if jax.devices()[0].platform == "tpu":
        import sys
        from balance_robot_tpu.utils import drift
        for env_id in ("Env01-v2", "Env03-v2"):
            d = drift.assert_drift_bounded(env_id, steps=3, batch=16)
            print(f"pallas drift {env_id} ok: step1={d[1]:.2e} "
                  f"step3={d[3]:.2e} (bounds "
                  f"{drift.STEP1_BOUND[env_id]:.0e}"
                  f"/{drift.STEP5_BOUND[env_id]:.0e})", file=sys.stderr)

    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_4096envs",
        "value": round(best, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(best / ref_sps, 1),
    }))


if __name__ == "__main__":
    main()
