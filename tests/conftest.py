"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that sharding /
multi-chip code paths can be exercised without TPU hardware (mirrors the
reference's strategy of keeping unit tests model-free and CI hardware-free;
see SURVEY.md §4). This must run before `jax` is imported anywhere.
"""

import os

# Force CPU even when the environment selects a TPU backend (the driver env
# sets JAX_PLATFORMS=axon globally) — unit tests must not depend on TPU
# availability or pay relay latency.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
