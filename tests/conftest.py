"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh (the TPU-native analog of
a fake distributed backend — SURVEY.md §4(g)); all numerics tests run in
float32 on CPU for determinism and torch-parity comparisons.

Note: this environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) via a
site hook, so the platform must be overridden through ``jax.config`` rather
than the environment variable.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# NSD_TEST_PLATFORM=tpu runs the suite against the real chip (used for the
# TPU-gated real-shape Pallas parity tests, which skip on CPU). Leave the
# platform config untouched in that case: the site hook's pinned platform
# (here the axon tunnel) registers the chip; forcing "tpu" would try the
# local libtpu client instead and fail.
if os.environ.get("NSD_TEST_PLATFORM", "cpu") != "tpu":
    jax.config.update("jax_platforms", "cpu")
