"""Persistent XLA compilation cache (utils/compile_cache.py).

The reference pays its compile cost once per nvcc build; a JAX process
pays per run unless the persistent cache is on. These tests check the
enable() wiring: idempotence, opt-out, and that a compiled executable
actually lands in (and is served from) the cache directory across
processes."""

import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from tpu_raytracer.utils import enable_compilation_cache
assert enable_compilation_cache(sys.argv[1]) is True
import jax.numpy as jnp

@jax.jit
def f(x):
    # big enough to clear the 1s min-compile-time persistence gate on
    # any host: a chain of 48 matmuls defeats CSE via distinct shifts
    for i in range(48):
        x = jnp.tanh(x @ x.T + float(i)) @ x
    return x.sum()

t0 = time.perf_counter()
f(jnp.ones((128, 128))).block_until_ready()
print("COMPILE_S", time.perf_counter() - t0)
"""


def _run_child(cache_dir):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cache_dir)],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("COMPILE_S")]
    return float(line[0].split()[1])


def test_cache_roundtrip_across_processes(tmp_path):
    cache = tmp_path / "xla"
    cold = _run_child(cache)
    files = [f for f in os.listdir(cache) if not f.startswith(".")]
    assert files, "no executable persisted to the cache dir"
    warm = _run_child(cache)
    # the warm child deserializes instead of compiling; require a real
    # drop (cold compiles of this chain take seconds)
    assert warm < cold * 0.7, (cold, warm)


def test_opt_out_env(monkeypatch, tmp_path):
    import tpu_raytracer.utils.compile_cache as cc

    monkeypatch.setenv("TRT_COMPILE_CACHE", "0")
    assert cc.enable(str(tmp_path / "never")) is False
    assert not (tmp_path / "never").exists()


def test_idempotent(tmp_path):
    import tpu_raytracer.utils.compile_cache as cc

    prev = cc._enabled
    try:
        cc._enabled = True  # pretend a prior enable ran
        assert cc.enable(str(tmp_path / "ignored")) is True
    finally:
        cc._enabled = prev
