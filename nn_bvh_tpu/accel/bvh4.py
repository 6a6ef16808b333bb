"""BVH4 wide nodes with bf16-packed bounds: host-side collapse + packing.

Why 4-wide with compressed bounds on TPU:

- The Pallas packet kernels are iteration-bound: the while loop is scalar-
  sequential and each iteration visits ONE node per packet. Collapsing the
  binary tree (the reference's LinearBVHNode layout, cpu/aggregates.cpp:505)
  into 4-wide nodes halves the interior-node count, and one iteration
  slab-tests all 4 children as vector work — per-visit latency (the measured
  bottleneck, tools/perf/kernel_lab.py) is paid half as often.
- bf16 bounds (lo rounded down, hi rounded up — conservative, so traversal
  stays watertight; boxes inflate by <=0.4%) pack a child's 6 bounds into 3
  f32 lanes. A whole BVH4 node is 4 lanes x 8 sublanes = 128 B, so crown's
  3.5M-tri tree (~150k wide nodes) is ~9 MB — RESIDENT in VMEM (~16 MB/core).
  That deletes the per-visit cache-tag machinery and the conflict-miss DMA
  stalls that made the HBM block-cache kernel (hbm_traverse.py) 3.4x slower
  than the VMEM kernel on identical work and ~50x slower at crown scale.

The 8-wide variant (bvh8.py) measured SLOWER than binary: its per-visit child
extraction + 8-key sort dominated. 4 children keep the sort network at 5
compare-exchanges and the decode at two lane-broadcasts per node.

Table layout (pack_bvh4): 64 nodes per (8, 128) f32 block.
  lane  = (node % 64) * 2 + (child % 2)
  rows  = [0..3] for children 0,1;  [4..7] for children 2,3
  row r+0..2 = packed bounds axis x,y,z: u32 = bf16(lo)<<16... stored so that
               bitcast(u & 0xFFFF0000) == lo and bitcast(u << 16) == hi
  row r+3    = child meta, i32 bitcast into the f32 table:
               >= 0 -> wide-node index (interior child)
               <  0 -> leaf: -(1 + tri_offset*16 + (count-1)), count in 1..16
               empty children get lo=hi=+3e38 (hit by no ray) and meta 0.
"""

from __future__ import annotations

import numpy as np

LANES = 128
WIDTH = 4
NODES_PER_BLOCK = 64


def _bf16_down(x: np.ndarray) -> np.ndarray:
    """Largest bf16 <= x, as u32 bits (low 16 bits zero)."""
    u = np.asarray(x, np.float32).view(np.uint32)
    tail = (u & np.uint32(0xFFFF)) != 0
    t = u & np.uint32(0xFFFF0000)
    # negative values truncate toward zero = UP; push one bf16 ulp down
    adj = (tail & (np.asarray(x) < 0)).astype(np.uint32) << 16
    return t + adj


def _bf16_up(x: np.ndarray) -> np.ndarray:
    """Smallest bf16 >= x, as u32 bits (low 16 bits zero)."""
    u = np.asarray(x, np.float32).view(np.uint32)
    tail = (u & np.uint32(0xFFFF)) != 0
    t = u & np.uint32(0xFFFF0000)
    adj = (tail & (np.asarray(x) >= 0)).astype(np.uint32) << 16
    return t + adj


def collapse_bvh4(node_lo: np.ndarray, node_hi: np.ndarray,
                  node_meta: np.ndarray, max_leaf: int = 8):
    """Binary flat BVH (build.BVH layout: interior -> children (self+1,
    offset)) -> (wide_lo (W,4,3), wide_hi (W,4,3), wide_meta (W,4) i64).

    Greedy: each wide node starts from a binary node's two children and
    repeatedly expands the largest-area interior child until it holds 4
    binary subtree roots. Iterative with an explicit stack + preallocated
    arrays (crown-scale trees are ~1M binary nodes; appending Python lists
    per node is too slow)."""
    node_lo = np.asarray(node_lo, np.float32)
    node_hi = np.asarray(node_hi, np.float32)
    meta = np.asarray(node_meta)
    offs, cnts = meta[:, 0].astype(np.int64), meta[:, 1].astype(np.int64)
    ext = node_hi - node_lo
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]

    n_bin = len(node_lo)
    cap = max(4, n_bin)  # wide count <= binary interior count + 1
    wide_lo = np.full((cap, WIDTH, 3), 3e38, np.float32)
    wide_hi = np.full((cap, WIDTH, 3), 3e38, np.float32)
    wide_meta = np.zeros((cap, WIDTH), np.int64)
    n_wide = 1  # root = 0

    def leaf_entry(c):
        assert 1 <= cnts[c] <= 16
        return -(1 + offs[c] * 16 + (cnts[c] - 1))

    stack = [(0, 0)]  # (binary root, wide index)
    while stack:
        b, w = stack.pop()
        if cnts[b] > 0:
            children = [b]  # degenerate: binary root itself is a leaf
        else:
            children = [b + 1, int(offs[b])]
            while len(children) < WIDTH:
                best, best_a = -1, -1.0
                for k, c in enumerate(children):
                    if cnts[c] == 0 and area[c] > best_a:
                        best, best_a = k, float(area[c])
                if best < 0:
                    break
                c = children.pop(best)
                children.extend([c + 1, int(offs[c])])
        for k, c in enumerate(children):
            wide_lo[w, k] = node_lo[c]
            wide_hi[w, k] = node_hi[c]
            if cnts[c] > 0:
                wide_meta[w, k] = leaf_entry(c)
            else:
                cw = n_wide
                n_wide += 1
                wide_meta[w, k] = cw
                stack.append((c, cw))
    return wide_lo[:n_wide], wide_hi[:n_wide], wide_meta[:n_wide]


def wide_depth(wide_meta: np.ndarray) -> int:
    """Max stack occupancy bound: 3 extra entries per interior level."""
    W = len(wide_meta)
    depth = np.zeros(W, np.int32)
    # children always have larger indices than parents (DFS alloc order is
    # not guaranteed by the stack, but indices ARE allocated parent-first)
    for w in range(W):
        for k in range(WIDTH):
            m = wide_meta[w, k]
            if m > 0:
                if depth[m] < depth[w] + 1:
                    depth[m] = depth[w] + 1
    return int(depth.max()) + 1 if W else 1


def pack_bvh4(wide_lo: np.ndarray, wide_hi: np.ndarray,
              wide_meta: np.ndarray) -> np.ndarray:
    """-> (nb*8, 128) f32 table per the module-docstring layout."""
    W = len(wide_lo)
    nb = -(-W // NODES_PER_BLOCK)
    tab = np.zeros((nb, 8, LANES), np.float32)
    n = np.arange(W)
    blk = n // NODES_PER_BLOCK
    lane = (n % NODES_PER_BLOCK) * 2
    for c in range(WIDTH):
        rows = 4 * (c // 2)
        col = lane + (c % 2)
        for ax in range(3):
            lo_b = _bf16_down(wide_lo[:, c, ax])
            hi_b = _bf16_up(wide_hi[:, c, ax])
            packed = lo_b | (hi_b >> np.uint32(16))
            tab[blk, rows + ax, col] = packed.view(np.float32)
        tab[blk, rows + 3, col] = wide_meta[:, c].astype(np.int32).view(np.float32)
    return tab.reshape(nb * 8, LANES)
