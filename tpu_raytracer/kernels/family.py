"""Alternate packet-geometry kernel families.

The packet kernels size every VMEM tile off module-level constants
(traversal.PIX_H/PIX_W -> TILE/TILE_S) read from the environment at
import time — one geometry per process. That is the right default for
primary rays (4096-ray packets amortize the pop synchronisation best,
PERF_LOG r1 packet sweep) but measurably wrong for incoherent BOUNCE
casts, where a narrower packet shrinks the traversed node union (the
r3/r4 wall: reflection and path-bounce casts are union-bound, not
pop-bound).

This module instantiates a SECOND (or third…) copy of the kernel
family at a different geometry by re-executing the kernel modules with
a temporary ``TRT_PIX_H/W`` override, so one process can route each
cast to the geometry its coherence class wants: primaries at 64x64,
bounce casts at 16x64. The re-exec is the supported CPython idiom for
"module with different import-time config" (fresh entries in
``sys.modules`` during exec, restored after); the fresh modules stay
alive in ``_FAMILIES`` and the default family is untouched.

Because ``cast_rays_pallas`` lazily imports its sibling kernels
(``from .tlas import …``) at TRACE time, family casts run inside a
``sys.modules`` swap context so those lazy imports resolve to the
family's own modules. The swap window (trace only — compiled
executables hold no module references) and the family build are
serialized by a module lock, so a concurrent import/trace in another
thread cannot observe mixed-geometry modules.

Tie semantics across geometries: accepted hit DISTANCES are
bit-identical (the accept predicate is per-ray and packet membership
never changes the set of tested candidates), but the accepted
triangle — and on multi-instance scenes the accepted INSTANCE — may
flip on EXACT t-ties (coplanar surfaces), because the strict-``<``
accept resolves ties by visit order and visit order follows packet
membership (same caveat as any tree change; see the TLAS tie note,
kernels/tlas.py). Tie flips are t-preserving by construction:
tests/test_kernel_family.py re-intersects both picks as its oracle.
"""

from __future__ import annotations

import importlib
import os
import sys
import threading
from contextlib import contextmanager

_PKG = "tpu_raytracer.kernels"
# dependency order: traversal first (the others import its constants)
_MODS = ("traversal", "dual", "tlas", "paged", "paged_wide",
         "paged_major")

_FAMILIES: dict = {}
# serializes family builds and swap windows (get_family's sys.modules
# pop/re-import and _entries' install/restore both mutate process
# globals). NOTE the lock covers only FAMILY operations: a
# default-family trace on another thread takes no lock, and its lazy
# kernel imports during a concurrent swap window would resolve to the
# swapped (narrow-geometry) modules. Callers that trace from multiple
# threads must serialize renders themselves (app/web.py holds its own
# render lock for exactly this). RLock: a family cast traced inside
# another family's swap window (nested _entries) must not self-deadlock.
_LOCK = threading.RLock()


def _full(name: str) -> str:
    return f"{_PKG}.{name}"


@contextmanager
def _entries(mods: dict):
    """Temporarily install ``mods`` (name -> module) as the package's
    sys.modules entries and attributes; restore the originals after.
    Holds the module lock for the whole window."""
    with _LOCK:
        with _entries_unlocked(mods):
            yield


@contextmanager
def _entries_unlocked(mods: dict):
    pkg = sys.modules[_PKG]
    saved_sys = {}
    saved_attr = {}
    for name, m in mods.items():
        full = _full(name)
        saved_sys[full] = sys.modules.get(full)
        saved_attr[name] = getattr(pkg, name, None)
        sys.modules[full] = m
        setattr(pkg, name, m)
    try:
        yield
    finally:
        for name in mods:
            full = _full(name)
            if saved_sys[full] is None:
                sys.modules.pop(full, None)
            else:
                sys.modules[full] = saved_sys[full]
            if saved_attr[name] is None:
                if hasattr(pkg, name):
                    delattr(pkg, name)
            else:
                setattr(pkg, name, saved_attr[name])


def get_family(pix_h: int, pix_w: int = 64) -> dict:
    """Kernel family (name -> module) at ``pix_h`` x ``pix_w`` packets.
    Built once per geometry and cached for the process lifetime."""
    key = (int(pix_h), int(pix_w))
    if key in _FAMILIES:
        return _FAMILIES[key]
    with _LOCK:
        return _get_family_locked(key)


def _get_family_locked(key) -> dict:
    if key in _FAMILIES:  # lost the build race to another thread
        return _FAMILIES[key]
    if (key[0] * key[1]) % (8 * 128) != 0:
        raise ValueError(
            f"packet geometry {key} needs pix_h*pix_w divisible by "
            "1024 (TILE_S must be 8-aligned)"
        )

    # pop the default family out of sys.modules so the re-imports
    # execute fresh module objects under the override env
    saved = {}
    for name in _MODS:
        full = _full(name)
        if full in sys.modules:
            saved[full] = sys.modules.pop(full)
    env_saved = {k: os.environ.get(k) for k in ("TRT_PIX_H", "TRT_PIX_W")}
    os.environ["TRT_PIX_H"] = str(key[0])
    os.environ["TRT_PIX_W"] = str(key[1])
    try:
        fresh = {}
        for name in _MODS:
            fresh[name] = importlib.import_module(_full(name))
    finally:
        for k, v in env_saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        pkg = sys.modules[_PKG]
        for name in _MODS:
            full = _full(name)
            if full in saved:
                sys.modules[full] = saved[full]
                setattr(pkg, name, saved[full])
            else:
                # default family was never imported: drop the fresh
                # entry so a later plain import builds the default
                sys.modules.pop(full, None)
                if hasattr(pkg, name):
                    delattr(pkg, name)

    _FAMILIES[key] = fresh
    return fresh


def family_cast_fn(pix_h: int, pix_w: int = 64):
    """``cast_rays_pallas`` bound to the (pix_h, pix_w) family. The
    sys.modules swap wraps the call so trace-time lazy imports inside
    the family resolve to the family's own kernel modules."""
    mods = get_family(pix_h, pix_w)
    trav = mods["traversal"]

    def cast(scene, origin, directions, **kw):
        with _entries(mods):
            return trav.cast_rays_pallas(scene, origin, directions, **kw)

    return cast
