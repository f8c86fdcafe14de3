"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without a TPU pod (SURVEY.md §4).

The environment's sitecustomize (PYTHONPATH=/root/.axon_site) imports
jax and registers the axon TPU backend at interpreter startup with
JAX_PLATFORMS=axon, so plain env vars set here are too late — but the
backends are not yet initialized at conftest time, so jax.config
updates still take effect.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any late jax re-reads

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; axon backend was already initialized"
)
