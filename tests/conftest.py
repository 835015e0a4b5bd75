"""Test configuration: force an 8-device CPU mesh so sharding/collective code
paths run without TPU hardware (SURVEY.md §4 item 3).

Note: the environment's sitecustomize registers the TPU backend and sets
jax_platforms itself, so the JAX_PLATFORMS env var alone is not enough —
override the config after import, before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
