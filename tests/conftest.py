"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The axon sitecustomize hook registers the TPU backend in every interpreter;
tests run on CPU so they are hermetic and can use float64 for oracle parity.
`--xla_force_host_platform_device_count=8` gives 8 virtual CPU devices for
sharding tests (SURVEY.md §4)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
