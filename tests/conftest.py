"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without a TPU pod (SURVEY.md §4)."""

import os

# Force (not setdefault): the environment pre-sets JAX_PLATFORMS=axon,
# which would silently route "CPU" tests to the real TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
