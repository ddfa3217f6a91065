"""Checkpoint/resume: params (and optionally full train state) as npz.

Replaces the reference's SB3 .zip checkpoints (CheckpointCallback /
best_model.zip, sb_rl.py:536-550).  The `-m` warm-start flow (sb_rl.py:519-525)
— which is also the curriculum mechanism (Env01-v2 -> Env03-v2) — maps to
`load()` + `train(init_params=...)`.

Plain npz keeps artifacts dependency-free and loadable from the CLI, the
export pipeline, and the native runtime tooling.  orbax is available in the
environment for sharded multi-host state; single-host params fit trivially.
"""

import pathlib

import numpy as np
import jax


def save(path, params):
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in params.items()}
    np.savez(str(path) + ".npz" if not str(path).endswith(".npz") else path,
             **flat)


def load(path):
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def save_train_state(path, ts):
    """Full resume state: params + opt state + env states + rng."""
    leaves, treedef = jax.tree.flatten(ts)
    np.savez(path, treedef=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
