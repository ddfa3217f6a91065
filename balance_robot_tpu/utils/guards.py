"""NaN/Inf guards for the physics/env step (SURVEY §5: the TPU-native
replacement for sanitizers — the step is pure, so the only runtime corruption
mode is numeric, and `checkify` surfaces it with a named location instead of
silently propagating through the batch).

Usage:
    step = checked_step(env)            # debug/CI builds
    err, (state, obs, r, term, trunc) = step(state, action)
    err.throw()                         # raises with the failing check name
"""

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked_step(env):
    """Wrap `env.step` with finiteness checks on the post-step physics state
    and observation. Returns a checkify-ed, jittable function."""

    def _step(state, action):
        state, obs, reward, term, trunc = env.step(state, action)
        qpos = jnp.stack(state.phys.qpos)
        qvel = jnp.stack(state.phys.qvel)
        checkify.check(jnp.all(jnp.isfinite(qpos)),
                       "non-finite qpos after physics step")
        checkify.check(jnp.all(jnp.isfinite(qvel)),
                       "non-finite qvel after physics step")
        checkify.check(jnp.all(jnp.isfinite(obs)),
                       "non-finite observation")
        checkify.check(jnp.isfinite(reward), "non-finite reward")
        return state, obs, reward, term, trunc

    return jax.jit(checkify.checkify(_step))


def assert_finite_tree(tree, name="tree"):
    """Host-side finiteness sweep over a pytree (params, opt state) — used at
    checkpoint boundaries so a poisoned train state never gets persisted."""
    bad = [
        path for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
        and not bool(jnp.all(jnp.isfinite(leaf)))
    ]
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name} at: "
            + ", ".join(jax.tree_util.keystr(p) for p in bad))
