"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware (the standard JAX
multi-device testing recipe; substitutes for the fake backend the reference
never had — SURVEY.md §4)."""

import os

_USE_TPU = os.environ.get("SNSDE_TEST_TPU", "0") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # The axon TPU plugin ignores JAX_PLATFORMS; force CPU via config too.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
