"""Test environment: force CPU with an 8-device virtual mesh.

Multi-device sharding code is exercised without TPU hardware, per the test
strategy in SURVEY.md §4 (XLA_FLAGS=--xla_force_host_platform_device_count=8).

This container's sitecustomize force-registers the axon TPU backend in every
python process and pins ``jax_platforms="axon,cpu"`` via jax.config, so env
vars alone can't steer tests to CPU; the config override below runs before
any backend is initialized (conftest loads before test imports touch jax).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# RUN_TPU_TESTS=1 keeps the real backend so the `-m tpu` kernel-parity tests
# (tests/test_tpu_kernel_parity.py) can exercise Mosaic on the chip:
#   RUN_TPU_TESTS=1 python -m pytest tests/ -m tpu
if not os.environ.get("RUN_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
