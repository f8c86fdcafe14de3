"""Binary -> 4-wide BVH collapse (host side) for the wide packet kernel.

The resident packet kernel is serial-step-bound: ~26 pop syncs + ~17
leaf-row iterations per 4096-ray tile at ~600 cycles each (PERF_LOG r2
anatomy). A 4-wide node covers what three binary internal nodes cover
(a parent plus its two children), so popping 4-wide nodes cuts the pop
count — and hence the scalar-sync count — by ~3x for ~1.3x the vector
work per pop (4 child slab tests vs 2). The r1 8-wide attempt failed at
128-ray packets where pops did not amortize (PERF_LOG v4); this collapse
is built for the 4096-ray regime where they do.

Collapse rule (classic 2-level): wide node W(r) for binary internal r
has entries = for each child c of r: c itself if c is a leaf, else c's
two children. Entries that are internal binary nodes become wide child
nodes (recursively); leaf entries carry their (start, count) range
directly. Unlike the binary kernel's packed scheme there is NO implicit
first-child rule — all four child ids live in the code table — so no
preorder invariant is required (wide ids are still assigned in DFS
order for locality).

Output encoding (consumed by kernels/wide4.py):
  * wcode[4*w + c]: internal -> wide child id; leaf ->
    -(start * 1024 + count) - 1; absent -> -1 (a count-0 leaf).
  * wbox[w, c]: child AABB (min xyz, max xyz); absent children get an
    inverted box (+BIG min, -BIG max) that can never pass a slab test.
  * wroot[m]: wide root per mesh.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_LEAF_SHIFT = 1 << 10  # matches kernels/traversal.py LEAF_BITS
_BIG = np.float32(3.0e38)


@dataclasses.dataclass(frozen=True)
class Wide4Arrays:
    wcode: np.ndarray  # [4*W] i32
    wbox_min: np.ndarray  # [W, 4, 3] f32
    wbox_max: np.ndarray  # [W, 4, 3] f32
    wroot: np.ndarray  # [M] i32

    @property
    def num_nodes(self) -> int:
        return len(self.wbox_min)


def collapse4(
    child_a: np.ndarray,
    child_b: np.ndarray,
    leaf_start: np.ndarray,
    leaf_count: np.ndarray,
    node_min: np.ndarray,
    node_max: np.ndarray,
    mesh_root: np.ndarray,
) -> Wide4Arrays:
    """Collapse the merged binary BVH arrays (SceneArrays fields, as
    numpy) into the 4-wide layout. Pure host numpy, run once per scene
    at compile."""
    child_a = np.asarray(child_a)
    child_b = np.asarray(child_b)
    leaf_start = np.asarray(leaf_start)
    leaf_count = np.asarray(leaf_count)
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    is_leaf = child_a < 0
    if (leaf_count[~is_leaf] != 0).any():
        pass  # internal nodes carry no leaf range; nothing to check

    def entries_of(r: int) -> list[int]:
        """Binary entry nodes of wide node W(r): children, with
        internal children expanded to their two children."""
        out = []
        for c in (int(child_a[r]), int(child_b[r])):
            if is_leaf[c]:
                out.append(c)
            else:
                out.append(int(child_a[c]))
                out.append(int(child_b[c]))
        return out

    wcode: list[int] = []
    wmin: list[np.ndarray] = []
    wmax: list[np.ndarray] = []

    wroot = np.zeros(len(mesh_root), np.int32)
    for m, root in enumerate(np.asarray(mesh_root)):
        root = int(root)
        # wide id assignment: DFS preorder over wide nodes of this mesh
        if is_leaf[root]:
            # degenerate single-leaf mesh: one wide node, one leaf entry
            wroot[m] = len(wmin)
            codes = [-(int(leaf_start[root]) * _LEAF_SHIFT
                       + int(leaf_count[root])) - 1, -1, -1, -1]
            mn = np.full((4, 3), _BIG, np.float32)
            mx = np.full((4, 3), -_BIG, np.float32)
            mn[0] = node_min[root]
            mx[0] = node_max[root]
            wcode.extend(codes)
            wmin.append(mn)
            wmax.append(mx)
            continue

        wroot[m] = len(wmin)
        # stack of (binary internal node, its assigned wide id)
        next_id = len(wmin) + 1
        # reserve slot for the root wide node
        wcode.extend([0, 0, 0, 0])
        wmin.append(np.zeros((4, 3), np.float32))
        wmax.append(np.zeros((4, 3), np.float32))
        stack = [(root, wroot[m])]
        while stack:
            r, wid = stack.pop()
            ents = entries_of(r)
            codes = [-1, -1, -1, -1]
            mn = np.full((4, 3), _BIG, np.float32)
            mx = np.full((4, 3), -_BIG, np.float32)
            for c, e in enumerate(ents):
                mn[c] = node_min[e]
                mx[c] = node_max[e]
                if is_leaf[e]:
                    codes[c] = -(int(leaf_start[e]) * _LEAF_SHIFT
                                 + int(leaf_count[e])) - 1
                else:
                    codes[c] = next_id
                    # reserve the child wide node
                    wcode.extend([0, 0, 0, 0])
                    wmin.append(np.zeros((4, 3), np.float32))
                    wmax.append(np.zeros((4, 3), np.float32))
                    stack.append((e, next_id))
                    next_id += 1
            wcode[4 * wid : 4 * wid + 4] = codes
            wmin[wid] = mn
            wmax[wid] = mx

    return Wide4Arrays(
        wcode=np.asarray(wcode, np.int32),
        wbox_min=np.stack(wmin) if wmin else np.zeros((0, 4, 3), np.float32),
        wbox_max=np.stack(wmax) if wmax else np.zeros((0, 4, 3), np.float32),
        wroot=wroot,
    )
