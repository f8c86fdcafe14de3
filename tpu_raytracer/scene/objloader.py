"""Wavefront OBJ loader (reference: CudaRaytracer/OBJLoader.hpp:12-181).

Behavioral parity with the reference parser:
  * two passes: vertices/normals/texcoords first, faces second
    (OBJLoader.hpp:36-71, 80-172);
  * polygon faces are fan-triangulated: (0, i, i+1) for i in 1..n-2
    (OBJLoader.hpp:139-169);
  * face normals are RECOMPUTED from winding — normalize(cross(vi-v0,
    vi1-v0)) — even when vn records exist (the vn-averaging branch is
    commented out in the reference, OBJLoader.hpp:119-135);
  * UVs are attached when the face carries vt indices, with the fan's
    local indexing tex[t0], tex[ti], tex[ti+1] (OBJLoader.hpp:145-159);
  * a missing file raises (the reference exit(1)s, OBJLoader.hpp:23-27).
"""

from __future__ import annotations

import os

import numpy as np

from .mesh import MeshPrimitive

# Texts above this size route to the native C++ parser when available
# (bit-identical results, measured 6.5x faster at 82k tris; the reference's
# loader is C++, OBJLoader.hpp). TRT_NATIVE_OBJ=0 forces Python,
# =1 forces native at any size.
_NATIVE_OBJ_THRESHOLD = 256 * 1024


def parse_obj(text: str):
    """Parse OBJ source text into raw triangle arrays
    (v0, v1, v2, uv0, uv1, uv2, has_uv)."""
    env = os.environ.get("TRT_NATIVE_OBJ")
    use_native = (
        env == "1"
        or (env != "0" and len(text) > _NATIVE_OBJ_THRESHOLD)
    )
    if use_native:
        from . import native_obj

        if native_obj.native_available():
            return native_obj.parse_obj_native(text)
        if env == "1":
            raise RuntimeError("native OBJ parser unavailable")
    return _parse_obj_py(text)


def _parse_obj_py(text: str):
    """Pure-Python reference parser (used for small files and as the
    bit-exactness oracle for the native parser)."""
    vertices: list[list[float]] = []
    tex_coords: list[list[float]] = []

    tri_v: list[tuple[int, int, int]] = []
    tri_t: list[tuple[int, int, int] | None] = []

    for line in text.splitlines():
        tokens = line.split()
        if not tokens:
            continue
        tag = tokens[0]
        if tag == "v":
            vertices.append([float(tokens[1]), float(tokens[2]), float(tokens[3])])
        elif tag == "vt":
            tex_coords.append([float(tokens[1]), float(tokens[2])])
        elif tag == "f":
            v_idx: list[int] = []
            t_idx: list[int] = []
            for tok in tokens[1:]:
                parts = tok.split("/")
                v_idx.append(int(parts[0]) - 1)
                if len(parts) > 1 and parts[1] != "":
                    t_idx.append(int(parts[1]) - 1)
            # attach UVs only when EVERY face token carried a vt index;
            # a face mixing 'v/t' and bare 'v' degrades to un-textured
            # instead of mis-indexing the fan
            textured = len(t_idx) == len(v_idx)
            for i in range(1, len(v_idx) - 1):
                tri_v.append((v_idx[0], v_idx[i], v_idx[i + 1]))
                if textured:
                    tri_t.append((t_idx[0], t_idx[i], t_idx[i + 1]))
                else:
                    tri_t.append(None)

    verts = np.asarray(vertices, np.float32).reshape(-1, 3)
    uvs = (
        np.asarray(tex_coords, np.float32).reshape(-1, 2)
        if tex_coords
        else np.zeros((0, 2), np.float32)
    )
    iv = np.asarray(tri_v, np.int64).reshape(-1, 3)
    v0, v1, v2 = verts[iv[:, 0]], verts[iv[:, 1]], verts[iv[:, 2]]

    has_uv = np.array([t is not None for t in tri_t], bool)
    uv0 = np.zeros((len(iv), 2), np.float32)
    uv1 = np.zeros((len(iv), 2), np.float32)
    uv2 = np.zeros((len(iv), 2), np.float32)
    if has_uv.any():
        it = np.asarray([t for t in tri_t if t is not None], np.int64).reshape(-1, 3)
        uv0[has_uv] = uvs[it[:, 0]]
        uv1[has_uv] = uvs[it[:, 1]]
        uv2[has_uv] = uvs[it[:, 2]]
    return v0, v1, v2, uv0, uv1, uv2, has_uv


def parse_obj_vertex_normals(text: str):
    """Per-corner VERTEX normals — the `vn` records the reference
    collects (OBJLoader.hpp:55-62) and its disabled normal-interpolation
    fan path (OBJLoader.hpp:119-135), realized.

    Walks the SAME face iteration as the geometry parsers (identical
    fan triangulation order), attaching a face's vn triple only when
    EVERY token carries a vn index (`v//vn` or `v/vt/vn`) — mixed faces
    degrade to face normals, mirroring the mixed-vt rule. Runs as a
    pure-Python side pass so it composes with the native geometry
    parser (which stays on its 7-field C ABI).

    Returns (vn0, vn1, vn2 [T, 3] f32, mask [T] bool)."""
    normals: list[list[float]] = []
    tri_n: list[tuple[int, int, int] | None] = []
    for line in text.splitlines():
        tokens = line.split()
        if not tokens:
            continue
        tag = tokens[0]
        if tag == "vn":
            normals.append(
                [float(tokens[1]), float(tokens[2]), float(tokens[3])]
            )
        elif tag == "f":
            n_idx: list[int] = []
            n_face = len(tokens) - 1
            for tok in tokens[1:]:
                parts = tok.split("/")
                if len(parts) > 2 and parts[2] != "":
                    n_idx.append(int(parts[2]) - 1)
            has_n = len(n_idx) == n_face
            for i in range(1, n_face - 1):
                tri_n.append(
                    (n_idx[0], n_idx[i], n_idx[i + 1]) if has_n else None
                )
    ns = (
        np.asarray(normals, np.float32).reshape(-1, 3)
        if normals else np.zeros((0, 3), np.float32)
    )
    mask = np.array([n is not None for n in tri_n], bool)
    vn0 = np.zeros((len(tri_n), 3), np.float32)
    vn1 = np.zeros((len(tri_n), 3), np.float32)
    vn2 = np.zeros((len(tri_n), 3), np.float32)
    if mask.any():
        idx = np.asarray(
            [n for n in tri_n if n is not None], np.int64
        ).reshape(-1, 3)
        vn0[mask] = ns[idx[:, 0]]
        vn1[mask] = ns[idx[:, 1]]
        vn2[mask] = ns[idx[:, 2]]
    return vn0, vn1, vn2, mask


def load(fp: str, max_depth: int = 48, exact_normals: bool = True,
         vertex_normals: bool = False) -> MeshPrimitive:
    """Load an OBJ file into a MeshPrimitive (BVH built in the
    constructor, like OBJLoader.hpp:177 -> MeshPrimitive.cpp:5-15).

    ``vertex_normals=True`` additionally attaches the file's `vn`
    records for smooth (interpolated) shading normals — opt-in: the
    reference's vn-averaging branch is disabled scaffolding
    (OBJLoader.hpp:119-135), so parity default is face normals."""
    with open(fp) as f:
        text = f.read()
    mesh = loads(text, max_depth=max_depth, exact_normals=exact_normals,
                 vertex_normals=vertex_normals)
    print(f"OBJ File: {fp}")
    print(f"Loaded {mesh.num_triangles} triangles")
    return mesh


def loads(text: str, max_depth: int = 48, exact_normals: bool = True,
          vertex_normals: bool = False) -> MeshPrimitive:
    """Load OBJ source from a string (see load)."""
    v0, v1, v2, uv0, uv1, uv2, _ = parse_obj(text)
    vn = (None,) * 4
    if vertex_normals:
        vn = parse_obj_vertex_normals(text)
        if not vn[3].any():
            vn = (None,) * 4  # no usable vn records: plain face normals
    return MeshPrimitive.from_triangles(
        v0, v1, v2, None, uv0, uv1, uv2,
        max_depth=max_depth, exact_normals=exact_normals,
        vn0=vn[0], vn1=vn[1], vn2=vn[2], vn_mask=vn[3],
    )
