"""Test configuration: force an 8-device CPU mesh so sharding/collective code
paths run without TPU hardware (SURVEY.md §4 item 3).

Escape hatch: CTCLIP_TEST_PLATFORM=tpu keeps the real backend so the
TPU-gated Pallas kernel tests (tests/test_pallas.py) actually run on the
chip:

    CTCLIP_TEST_PLATFORM=tpu python -m pytest tests/test_pallas.py -q

Note: the environment's sitecustomize registers the TPU backend and sets
jax_platforms itself, so the JAX_PLATFORMS env var alone is not enough —
override the config after import, before any backend is initialized.
"""
import os

_platform = os.environ.get("CTCLIP_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
# exact-comparison tests need f32 matmuls to BE f32 on every backend (on TPU
# the default precision runs them as bf16 passes -> ~1e-3 noise vs the
# kernels' explicit preferred_element_type accumulation)
jax.config.update("jax_default_matmul_precision", "highest")
