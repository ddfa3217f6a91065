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
    """Flat dicts of arrays save as-is; nested pytrees (off-policy params:
    lists of layer dicts) flatten to path-joined keys ('actor/0/w')."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in kp)
        flat[name] = np.asarray(leaf)
    np.savez(str(path) + ".npz" if not str(path).endswith(".npz") else path,
             **flat)


def load(path):
    """Returns a dict of arrays. Nested saves come back with path-joined
    keys; `load_into(tree_like, path)` restores full structure."""
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def load_into(path, tree_like):
    """Restore a nested pytree saved by `save`, using `tree_like` (a pytree
    of the same structure, e.g. freshly initialized params) for structure."""
    flat = load(path)
    leaves, treedef = jax.tree.flatten(tree_like)
    keys = ["/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                     for p in kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(tree_like)[0]]
    return jax.tree.unflatten(treedef, [flat[k] for k in keys])


def save_train_state(path, ts, steps=0):
    """Full preemption-resume state: params + opt state + env states + rng.

    The pytree STRUCTURE is not serialized — `load_train_state` rebuilds it
    from a freshly-initialized TrainState of the same config and swaps in the
    saved leaves, so the artifact stays a plain npz (replaces the reference's
    SB3 zip; resume semantics are deterministic restart from
    (params, opt_state, env_state, rng), SURVEY §5)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree.leaves(ts)
    np.savez(path, __steps__=np.int64(steps),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_train_state(path, ts_like):
    """Restore a train state saved by `save_train_state`.

    `ts_like` is a TrainState built by `PPO.init` with the SAME config; its
    tree structure indexes the saved leaves. Returns (ts, steps)."""
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    leaves, treedef = jax.tree.flatten(ts_like)
    with np.load(path) as f:
        steps = int(f["__steps__"]) if "__steps__" in f.files else 0
        n_saved = sum(1 for k in f.files if k.startswith("leaf_"))
        if n_saved != len(leaves):
            raise ValueError(
                f"resume state at {path} has {n_saved} leaves; the current "
                f"config produces {len(leaves)} — configs must match")
        saved = [f[f"leaf_{i}"] for i in range(n_saved)]
    try:
        restored = [np.asarray(s, dtype=l.dtype).reshape(np.shape(l))
                    for s, l in zip(saved, leaves)]
    except ValueError as e:
        raise ValueError(
            f"resume state at {path} has mismatched leaf shapes "
            f"({e}) — configs must match") from e
    return jax.tree.unflatten(treedef, restored), steps
