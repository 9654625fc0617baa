"""Clos/Hall factorization of arbitrary static permutations for Mosaic.

Mosaic (Pallas TPU) supports dynamic lane gathers only *within* a 128-lane
row; arbitrary-width gathers and per-lane sublane shuffles are unsupported.
The fused generic-layout decoder (ops/pallas_generic.py) therefore needs its
check-major <-> bit-major edge regroup — an arbitrary permutation over the
flat edge space — expressed in primitives Mosaic does support:

  * per-row lane gathers of width 128 (``jnp.take_along_axis`` axis=-1),
  * [128, 128] tile transposes,
  * elementwise tile selects with constant masks.

Any permutation over an ``[R, 128]`` grid factors (Hall's theorem / Clos
network routing) as ``L2 ∘ X ∘ L1`` with L1/L2 within-row lane permutations
and X a per-lane permutation of rows. X factors again per lane over the
``(tile, row-in-tile)`` grid as ``A ∘ B ∘ C`` with A/C per-lane within-tile
row permutations — which become within-row lane gathers after a [128, 128]
tile transpose — and B a per-(lane, row) selection among tiles (elementwise
selects with constant index masks). The full pipeline is

    gather L1 -> transpose tiles -> gather C -> select B -> gather A
    -> transpose tiles -> gather L2

— seven constant-indexed stages, each a full-throughput VPU/XLU op.

The colorings that make the factorization proper come from repeated Euler
splits of regular bipartite multigraphs (degree 128 = 2^7, so seven exact
halvings); this is the standard O(E log C) edge-coloring construction.

All of this is host-side precomputation per matrix, cached on the plan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LANES = 128


def _euler_split(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Split a bipartite multigraph with all-even degrees into two halves of
    equal degree per vertex. Returns a bool array: True = half B.

    Walks edge-disjoint circuits (the graph decomposes into circuits since
    all degrees are even) and alternates circuit edges between halves.
    """
    n_edges = len(left)
    n_left = int(left.max()) + 1 if n_edges else 0
    n_right = int(right.max()) + 1 if n_edges else 0

    # CSR-ish adjacency of edge ids per vertex (left and right sides).
    l_order = np.argsort(left, kind="stable")
    l_starts = np.searchsorted(left[l_order], np.arange(n_left + 1))
    r_order = np.argsort(right, kind="stable")
    r_starts = np.searchsorted(right[r_order], np.arange(n_right + 1))

    l_ptr = l_starts[:-1].copy()
    r_ptr = r_starts[:-1].copy()
    used = np.zeros(n_edges, dtype=bool)
    half_b = np.zeros(n_edges, dtype=bool)

    def next_at_left(v):
        p = l_ptr[v]
        end = l_starts[v + 1]
        while p < end and used[l_order[p]]:
            p += 1
        l_ptr[v] = p
        return l_order[p] if p < end else -1

    def next_at_right(v):
        p = r_ptr[v]
        end = r_starts[v + 1]
        while p < end and used[r_order[p]]:
            p += 1
        r_ptr[v] = p
        return r_order[p] if p < end else -1

    for e0 in range(n_edges):
        if used[e0]:
            continue
        # Trace the circuit through e0, alternating halves. Circuits in a
        # bipartite graph have even length, so alternation is consistent
        # when the walk closes.
        e = e0
        take_b = False
        while True:
            used[e] = True
            half_b[e] = take_b
            take_b = not take_b
            # leave via the right endpoint, then via the left of the next
            nxt = next_at_right(right[e])
            if nxt < 0:
                break
            used[nxt] = True
            half_b[nxt] = take_b
            take_b = not take_b
            e2 = next_at_left(left[nxt])
            if e2 < 0:
                break
            e = e2
    return half_b


def _edge_color(left: np.ndarray, right: np.ndarray, colors: int) -> np.ndarray:
    """Proper edge coloring of a bipartite multigraph whose every vertex has
    degree exactly ``colors`` (a power of two), via recursive Euler splits.
    Returns an int32 color per edge in [0, colors)."""
    assert colors & (colors - 1) == 0, "colors must be a power of two"
    color = np.zeros(len(left), dtype=np.int32)
    groups = [(np.arange(len(left)), 0, colors)]
    while groups:
        idx, base, span = groups.pop()
        if span == 1:
            color[idx] = base
            continue
        half_b = _euler_split(left[idx], right[idx])
        a, b = idx[~half_b], idx[half_b]
        groups.append((a, base, span // 2))
        groups.append((b, base + span // 2, span // 2))
    return color


@dataclass(frozen=True)
class PermutePlan:
    """Constant index tables realizing ``out[i] = in[gather_map[i]]`` over a
    flat space of ``n_rows * 128`` elements (n_rows a multiple of 128) as the
    seven-stage pipeline documented in the module docstring.

    Orientation conventions (gather form — out position reads from in):
      idx_l1 [R, 128]      lane gather in source orientation
      idx_c  [Tn*128, 128] lane gather in transposed orientation
                           (row = tile*128 + original lane)
      bsel   [Tn, 128, 128] source-tile id per (dst tile, orig lane, interm
                           row) — transposed orientation
      idx_a  [Tn*128, 128] lane gather in transposed orientation
      idx_l2 [R, 128]      lane gather in target orientation
    """

    n_rows: int
    n_tiles: int
    idx_l1: np.ndarray
    idx_c: np.ndarray
    bsel: np.ndarray
    idx_a: np.ndarray
    idx_l2: np.ndarray


def build_permute_plan(gather_map: np.ndarray) -> PermutePlan:
    """Factor ``out[i] = in[gather_map[i]]`` (a permutation over S = R*128
    elements, R a multiple of 128) into the seven-stage plan."""
    s = int(gather_map.shape[0])
    if s % (LANES * LANES):
        raise ValueError("space must be a multiple of 128*128 elements")
    n_rows = s // LANES
    n_tiles = n_rows // LANES
    src = np.asarray(gather_map, dtype=np.int64)
    if not np.array_equal(np.sort(src), np.arange(s)):
        raise ValueError("gather_map must be a permutation")

    tgt = np.arange(s, dtype=np.int64)
    rs, cs = src // LANES, src % LANES
    rt, ct = tgt // LANES, tgt % LANES

    # Level 1: color elements so that each (source row, color) and each
    # (target row, color) pair is unique -> color = intermediate lane.
    k = _edge_color(rs, rt, LANES)

    idx_l1 = np.empty((n_rows, LANES), dtype=np.int32)
    idx_l1[rs, k] = cs
    idx_l2 = np.empty((n_rows, LANES), dtype=np.int32)
    idx_l2[rt, ct] = k

    # Level 2, per lane k: route rows rs -> rt via tiles. Color elements per
    # lane over the (source tile, target tile) multigraph -> intermediate
    # row-in-tile u'.
    t1, u1 = rs // LANES, rs % LANES
    t2, u2 = rt // LANES, rt % LANES
    # Independent colorings per lane: offset the tile vertex ids by lane so
    # one global coloring call handles all 128 lane-graphs at once.
    up = _edge_color(k * n_tiles + t1, k * n_tiles + t2, LANES)

    idx_c = np.empty((n_tiles * LANES, LANES), dtype=np.int32)
    idx_c[t1 * LANES + k, up] = u1
    bsel = np.empty((n_tiles, LANES, LANES), dtype=np.int32)
    bsel[t2, k, up] = t1
    idx_a = np.empty((n_tiles * LANES, LANES), dtype=np.int32)
    idx_a[t2 * LANES + k, u2] = up

    return PermutePlan(
        n_rows=n_rows,
        n_tiles=n_tiles,
        idx_l1=idx_l1,
        idx_c=idx_c,
        bsel=bsel,
        idx_a=idx_a,
        idx_l2=idx_l2,
    )


def apply_plan_reference(plan: PermutePlan, x: np.ndarray) -> np.ndarray:
    """NumPy reference of the seven-stage pipeline (used by tests and as the
    specification for the in-kernel implementation). ``x``: [..., R*128]."""
    lead = x.shape[:-1]
    r, tn = plan.n_rows, plan.n_tiles
    y = x.reshape(lead + (r, LANES))
    # L1: within-row lane gather
    y = np.take_along_axis(y, np.broadcast_to(plan.idx_l1, y.shape), axis=-1)
    # transpose tiles: [.., Tn, 128(u), 128(c)] -> [.., Tn, 128(c), 128(u)]
    y = y.reshape(lead + (tn, LANES, LANES)).swapaxes(-1, -2)
    # C: per-lane within-tile row permutation == lane gather transposed
    yc = y.reshape(lead + (tn * LANES, LANES))
    yc = np.take_along_axis(yc, np.broadcast_to(plan.idx_c, yc.shape), axis=-1)
    y = yc.reshape(lead + (tn, LANES, LANES))
    # B: per-(lane, row) tile select
    out = np.empty_like(y)
    for t2 in range(tn):
        sel = plan.bsel[t2]  # [128(c=k), 128(u')]
        acc = np.zeros(lead + (LANES, LANES), dtype=y.dtype)
        for t1 in range(tn):
            acc = np.where(sel == t1, y[..., t1, :, :], acc)
        out[..., t2, :, :] = acc
    # A: per-lane within-tile row permutation (transposed orientation)
    ya = out.reshape(lead + (tn * LANES, LANES))
    ya = np.take_along_axis(ya, np.broadcast_to(plan.idx_a, ya.shape), axis=-1)
    # transpose back
    y = ya.reshape(lead + (tn, LANES, LANES)).swapaxes(-1, -2)
    y = y.reshape(lead + (r, LANES))
    # L2
    y = np.take_along_axis(y, np.broadcast_to(plan.idx_l2, y.shape), axis=-1)
    return y.reshape(lead + (r * LANES,))
