"""Measure the reference env's single-env CPU throughput (the baseline).

The reference publishes no numbers (BASELINE.md); this drives the real
reference env (mujoco C physics, 250 substeps per control step) with random
actions and records control-steps/s. Result is cached in
tools/reference_baseline.json and used by bench.py for vs_baseline.
"""
import json, sys, time, pathlib
import numpy as np

sys.path.insert(0, "/root/reference/src")
import gymnasium
import balance_robot  # noqa: F401

def measure(env_id="Env01-v1", steps=400):
    env = gymnasium.make(env_id)
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    # warmup
    for _ in range(20):
        _, _, term, trunc, _ = env.step(rng.uniform(-1, 1, 2).astype(np.float32))
        if term or trunc:
            env.reset()
    t0 = time.perf_counter()
    n = 0
    for _ in range(steps):
        _, _, term, trunc, _ = env.step(rng.uniform(-1, 1, 2).astype(np.float32))
        n += 1
        if term or trunc:
            env.reset()
    dt = time.perf_counter() - t0
    env.close()
    return n / dt

if __name__ == "__main__":
    sps = measure()
    out = {"reference_env_steps_per_sec_cpu": sps,
           "env_id": "Env01-v1", "note": "single env, random actions, "
           "250 mujoco substeps per control step, measured on bench host"}
    p = pathlib.Path(__file__).parent / "reference_baseline.json"
    p.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
