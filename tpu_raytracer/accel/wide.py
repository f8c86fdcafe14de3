"""Binary BVH -> 8-wide BVH collapse (host side).

The packet kernel's cost is dominated by per-node scalar/vector
round-trips, so the traversal tree is collapsed to branching factor 8:
one pop tests all 8 children's AABBs as one [8 children, 128 rays]
vector op. Children of a wide node are allocated CONTIGUOUSLY so the
node stores a single child_base int; each child's box lives in the
parent's record (like the binary kernel layout).

Collapse policy: expand the binary frontier under a node, always
splitting the frontier entry with the largest half-surface-area box,
until 8 entries (or all leaves) remain — the standard greedy BVH8
collapse. Leaf nodes keep the binary builder's contiguous triangle
ranges, so triangle data is untouched.

Wide code word (mirrors the binary kernel's packing):
  code >= 0: internal, children at slots [code, code+8)
  code <  0: leaf, -(code+1) = leaf_start * 1024 + leaf_count
Empty child slots get an inverted (never-hit) box and code -1
(empty leaf); they are never pushed because their boxes never hit.
"""

from __future__ import annotations

import numpy as np

LEAF_BITS = 10
LEAF_SHIFT = 1 << LEAF_BITS
WIDE_ARITY = 8
_INF = np.float32(np.inf)


def _half_area(mn, mx):
    s = mx - mn
    return s[0] * (s[1] + s[2]) + s[1] * s[2]


def collapse_to_wide(
    node_min: np.ndarray,
    node_max: np.ndarray,
    child_a: np.ndarray,
    child_b: np.ndarray,
    leaf_start: np.ndarray,
    leaf_count: np.ndarray,
    roots: np.ndarray,
):
    """Collapse (possibly multi-mesh, offset-linked) binary BVH arrays
    into wide arrays.

    Returns (wide_code [M] i32, wide_box [M, 8, 6] f32, wide_roots).
    wide_box[s, j] = (minx, miny, minz, maxx, maxy, maxz) of child j.
    """
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    is_leaf = child_a < 0

    wide_code: list[int] = []
    wide_box: list[np.ndarray] = []

    def alloc(n):
        base = len(wide_code)
        wide_code.extend([-1] * n)
        for _ in range(n):
            box = np.zeros((WIDE_ARITY, 6), np.float32)
            box[:, 0:3] = _INF
            box[:, 3:6] = -_INF
            wide_box.append(box)
        return base

    def leaf_code(b):
        return -(int(leaf_start[b]) * LEAF_SHIFT + int(leaf_count[b])) - 1

    def expand(b) -> list[int]:
        """Greedy frontier expansion to <= 8 binary nodes."""
        frontier = [int(child_a[b]), int(child_b[b])]
        while len(frontier) < WIDE_ARITY:
            best, best_area = -1, -1.0
            for i, f in enumerate(frontier):
                if not is_leaf[f]:
                    area = float(_half_area(node_min[f], node_max[f]))
                    if area > best_area:
                        best, best_area = i, area
            if best < 0:
                break
            f = frontier.pop(best)
            frontier.extend([int(child_a[f]), int(child_b[f])])
        return frontier

    wide_roots = []
    for root in np.asarray(roots).tolist():
        root_slot = alloc(1)
        wide_roots.append(root_slot)
        stack = [(root_slot, int(root))]
        while stack:
            slot, b = stack.pop()
            if is_leaf[b]:
                wide_code[slot] = leaf_code(b)
                continue
            frontier = expand(b)
            # exact-size child block: unused slots would cost 256B each
            # in the kernel's VMEM node table
            base = alloc(len(frontier))
            wide_code[slot] = base
            for j, f in enumerate(frontier):
                wide_box[slot][j, 0:3] = node_min[f]
                wide_box[slot][j, 3:6] = node_max[f]
                stack.append((base + j, f))

    return (
        np.asarray(wide_code, np.int32),
        np.stack(wide_box).astype(np.float32),
        np.asarray(wide_roots, np.int32),
    )
