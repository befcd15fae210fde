"""Test harness: force an 8-device virtual CPU platform so sharding tests run
anywhere (SURVEY.md §4 tier 4). Must set flags before jax initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon PJRT plugin registers itself as "axon,cpu" regardless of the env
# var; force the CPU platform for the test suite (backend not yet initialized
# at conftest time, so this takes effect).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# The suite is compile-dominated on this 1-CPU image; skipping XLA's
# optimization passes cuts the default tier ~18% (measured 249 -> 205 s on
# the generation/flash/spec/int8 slice) without touching what the tests
# verify — every parity reference is computed in-process under the same
# flag. Production paths never see this (tests-only config).
jax.config.update("jax_disable_most_optimizations", True)
