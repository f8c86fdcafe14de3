"""Native OBJ parser (native/obj_loader.cpp) vs the Python oracle.

Mirrors test_native_bvh.py: the native path must be BIT-identical to
scene/objloader._parse_obj_py on every output array, across quads,
mixed face tokens, negative indices, and texture fans.
"""

import numpy as np
import pytest

from tpu_raytracer.scene import objloader, procgen
from tpu_raytracer.scene.native_obj import native_available, parse_obj_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native OBJ parser unavailable"
)

CASES = {
    "cube": lambda: procgen.cube_obj(),
    "mixed_tokens": lambda: (
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "f 1/1 2/2 3/3\n"     # textured
        "f 2 3 4\n"           # untextured
        "f 1/1 2 3/3\n"       # mixed -> degrades untextured
    ),
    "quad_fan": lambda: (
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n"
    ),
    # NOTE: the Python parser subtracts 1 from negative indices too
    # (so OBJ-spec "-1 = last" is actually offset by one and wraps via
    # numpy); the native parser mirrors that exactly — parity with the
    # Python loader, not with the OBJ spec
    "negative_indices": lambda: (
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f -1 -2 -3\n"
    ),
    "v_vt_vn_syntax": lambda: (
        "v 0 0 0\nv 2 0 0\nv 0 2 0\n"
        "vt 0.5 0.25\nvt 1 0\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1\n"
    ),
    "floats": lambda: (
        "v 1e-3 -2.5E2 +0.125\nv .5 -0.0 3\nv 1 2 3\n"
        "f 1 2 3\n"
    ),
    "cr_and_crlf_lines": lambda: (
        "v 0 0 0\rv 1 0 0\r\nv 0 1 0\rf 1 2 3\r"
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_native_obj_matches_python(name):
    text = CASES[name]()
    ref = objloader._parse_obj_py(text)
    got = parse_obj_native(text)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_native_obj_rejects_malformed():
    with pytest.raises(ValueError):
        parse_obj_native("v 1 2 x\nf 1 2 3\n")


@pytest.mark.parametrize("text", [
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf /1 2 3\n",  # empty vertex index
    "v 0x1 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",  # C hex float
])
def test_native_obj_rejects_where_python_raises(text):
    """Inputs the Python parser raises on must not silently parse
    natively (review finding: strtol/strtod accept '' and hex)."""
    with pytest.raises(ValueError):
        objloader._parse_obj_py(text)
    with pytest.raises(ValueError):
        parse_obj_native(text)


def test_parse_obj_env_routing(monkeypatch):
    """TRT_NATIVE_OBJ=1 forces the native parser through the public
    parse_obj; results equal the Python path."""
    text = CASES["quad_fan"]()
    ref = objloader._parse_obj_py(text)
    monkeypatch.setenv("TRT_NATIVE_OBJ", "1")
    got = objloader.parse_obj(text)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
