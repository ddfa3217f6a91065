"""balance_robot_tpu: TPU-native framework with the capabilities of the
reference balance-robot MuJoCo RL repo (see SURVEY.md).

Env registry mirrors the reference's Gymnasium registration
(reference src/balance_robot/__init__.py:5-66): same ids,
max_episode_steps, and reward thresholds.
"""

_REGISTRY = {}


def register(env_id, factory):
    _REGISTRY[env_id] = factory


def make(env_id):
    """Create a functional env by its reference-compatible id."""
    if env_id not in _REGISTRY:
        raise KeyError(
            f"Unknown env id {env_id!r}. Available: {sorted(_REGISTRY)}")
    return _REGISTRY[env_id]()


def env_ids():
    return sorted(_REGISTRY)


def _populate():
    from .envs.env01 import Env01V1, Env01V2, Env01V3
    from .envs.env02 import Env02V1
    from .envs.env03 import Env03V1, Env03V2, Env03V1Fail
    from .envs.cal01 import Cal01
    for cls in (Env01V1, Env01V2, Env01V3, Env02V1, Env03V1, Env03V2,
                Env03V1Fail, Cal01):
        register(cls.id, cls)
    try:
        from .envs.move import EnvMove05
        register(EnvMove05.id, EnvMove05)
    except ImportError:
        pass


_populate()


def _enable_persistent_compile_cache():
    """Persistent on-disk XLA/Mosaic compile cache.

    The dev hosts are 1-vCPU: every fresh process otherwise pays the full
    compile of the fused physics kernels (minutes).  Importing this package
    already pulls in jax (the env modules), so configuring here covers every
    tool/CLI entry point.  Opt out or redirect with BRT_COMPILE_CACHE
    (0 disables; any other value is the cache dir)."""
    import os
    cache = os.environ.get("BRT_COMPILE_CACHE")
    if cache == "0":
        return
    if not cache:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


_enable_persistent_compile_cache()
