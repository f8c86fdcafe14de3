"""Examples stay runnable: compile-check all, subprocess-run the two
fastest end-to-end (the rest exercise the same APIs at larger sizes)."""

import os
import py_compile
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    os.path.join(ROOT, "examples", f)
    for f in os.listdir(os.path.join(ROOT, "examples"))
    if f.endswith(".py")
)


def test_all_examples_compile():
    assert len(EXAMPLES) >= 6
    for f in EXAMPLES:
        py_compile.compile(f, doraise=True)


@pytest.mark.parametrize("name", ["01_basic_render.py", "06_aovs_and_extras.py"])
def test_example_runs(name):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", name)],
        capture_output=True, text=True, timeout=840, env=env, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote /tmp/example" in r.stdout
