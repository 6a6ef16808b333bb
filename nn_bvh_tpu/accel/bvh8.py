"""BVH8 wide nodes: host-side collapse of the binary BVH + VMEM packing.

Why wide nodes on TPU: the Pallas packet kernel's while_loop is scalar-
sequential — its cost is (nodes visited) x (per-iteration cost). For
incoherent packets the visit set saturates toward the whole tree, so time
scales with NODE COUNT. Collapsing the binary tree (aggregates.cpp:505
LinearBVHNode layout) into 8-wide nodes cuts the interior-node count ~7x and
lets one iteration slab-test 8 children against the whole (8,128) ray tile —
the TPU analog of the reference's GPU HW traversal taking multiple children
per step (gpu/aggregate.cpp), and of Ylitie et al.'s wide BVHs for SIMT.

Child meta encoding (shared with the kernel stack):
  >= 0  -> wide-node index (interior child)
  <  0  -> leaf: -(1 + offset*8 + (count-1)), count in 1..MAX_LEAF(=8)
  empty children get inverted bounds (never hit) and meta 0.
"""

from __future__ import annotations

import numpy as np

LANES = 128
WIDTH = 8
NODES_PER_TILE = 16  # 16 nodes x 8 fields = 128 lanes


def collapse_bvh8(node_lo: np.ndarray, node_hi: np.ndarray,
                  node_meta: np.ndarray):
    """Binary flat BVH (build.BVH layout: interior -> children (self+1,
    offset)) -> wide arrays (W,8,3) lo/hi + (W,8) i32 child meta.

    Greedy collapse: each wide node absorbs binary descendants breadth-by-
    surface-area until it holds 8 children (binary subtree roots); interior
    children become new wide nodes."""
    node_lo = np.asarray(node_lo, np.float32)
    node_hi = np.asarray(node_hi, np.float32)
    meta = np.asarray(node_meta)
    offs, cnts = meta[:, 0], meta[:, 1]

    def area(i):
        d = node_hi[i] - node_lo[i]
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    wide_lo, wide_hi, wide_meta = [], [], []
    # queue of (binary_root, wide_index)
    wide_of_binary = {}

    def alloc_wide():
        # empty children: lo = hi = +3e38 misses for BOTH direction signs
        # (positive: tn ~ +big > t_best; negative: tf ~ -big fails tf > 0)
        wide_lo.append(np.full((WIDTH, 3), 3e38, np.float32))
        wide_hi.append(np.full((WIDTH, 3), 3e38, np.float32))
        wide_meta.append(np.zeros(WIDTH, np.int64))
        return len(wide_lo) - 1

    root_w = alloc_wide()
    stack = [(0, root_w)]
    while stack:
        b, w = stack.pop()
        if cnts[b] > 0:
            # degenerate: binary root itself is a leaf
            children = [b]
        else:
            children = [b + 1, int(offs[b])]
            while len(children) < WIDTH:
                # expand the interior child with the largest surface area
                best, best_a = -1, -1.0
                for k, c in enumerate(children):
                    if cnts[c] == 0:
                        a = area(c)
                        if a > best_a:
                            best, best_a = k, a
                if best < 0:
                    break
                c = children.pop(best)
                children.extend([c + 1, int(offs[c])])
        for k, c in enumerate(children):
            wide_lo[w][k] = node_lo[c]
            wide_hi[w][k] = node_hi[c]
            if cnts[c] > 0:
                wide_meta[w][k] = -(1 + int(offs[c]) * 8 + (int(cnts[c]) - 1))
            else:
                cw = alloc_wide()
                wide_meta[w][k] = cw
                stack.append((c, cw))
    return (np.stack(wide_lo), np.stack(wide_hi),
            np.stack(wide_meta).astype(np.int64))


def pack_wide(wide_lo: np.ndarray, wide_hi: np.ndarray,
              wide_meta: np.ndarray):
    """-> (bounds_tab (Wb*8, 128) f32, meta_tab (Wb*8, 128) i32).

    Tile t holds NODES_PER_TILE wide nodes: sublane r = child r; bounds
    lanes = node_in_tile*8 + field (lox loy loz hix hiy hiz, 2 pad);
    meta lane = node_in_tile (i32 child meta)."""
    W = len(wide_lo)
    nb = -(-W // NODES_PER_TILE)
    bt = np.zeros((nb, WIDTH, LANES), np.float32)
    mt = np.zeros((nb, WIDTH, LANES), np.int32)
    idx = np.arange(W)
    blk, slot = idx // NODES_PER_TILE, idx % NODES_PER_TILE
    for f in range(3):
        bt[blk, :, slot * 8 + f] = wide_lo[:, :, f]
        bt[blk, :, slot * 8 + 3 + f] = wide_hi[:, :, f]
    mt[blk, :, slot] = wide_meta.astype(np.int32)
    return bt.reshape(nb * WIDTH, LANES), mt.reshape(nb * WIDTH, LANES)
