"""Out-of-core layout compiler for the streaming (HBM-resident) decoder.

The fused generic kernel (ops/pallas_generic.py) requires the whole edge
state in VMEM, which caps frames at N ~ 40k bits (docs/KERNEL.md sizing).
The reference's largest production suite is N = 102400 (~307k edges,
~2400 edge rows — ~10 MB of messages *per frame*), far beyond VMEM. This
module compiles such codes for `ops/pallas_stream.py`, which keeps the
edge state in HBM and streams VMEM-sized blocks through compute kernels.

The check-major <-> bit-major regroup — an arbitrary permutation over the
edge space — becomes a two-pass, out-of-core Clos factorization at block
granularity (the same Hall/Birkhoff argument as ops/permute_plan.py, one
level up):

    pi = P2[dst] o X o P1[src]

  * P1[src]: a within-block permutation (VMEM, the seven-stage machinery
    of ops/permute_plan.py) that groups the block's outgoing lanes into
    per-destination-block *chunks* at fixed positions;
  * X: the cross-block exchange — block src's chunk for block dst sits at
    staged[src, dst]; the destination kernel reads staged[:, dst], which
    is a strided-but-rectangular slab (one DMA-friendly BlockSpec, ~100 KB
    contiguous per source chunk);
  * P2[dst]: a second within-block permutation from assembled chunks to
    the destination compute layout.

Chunk capacity is sized to the worst (src, dst) pair (random PEG codes
concentrate near E / (Kb_src * Kb_dst); the slack is a few percent), and
chunk rows are rounded to sublane multiples. Pad lanes map to pad lanes on
both levels, so neutral fill values propagate through the exchange.

Node layout is uniform (no degree sorting): node n sits at lane n % 128 of
lane-block n // 128; every node owns ``dmax`` slot rows (slot s of
lane-block lb at block row s * l_blk + lb_local); nodes of lower degree
leave per-lane pad slots, masked by the per-block degree planes.

Reference semantics being compiled: the jagged adjacency decode loops of
src/qkd_ldpc_algorithm.cpp:3-1029 over matrices from
src/array_and_matrix_operations.cpp:291-886.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from qkd_ldpc_v_tpu.models.hmatrix import HMatrix
from qkd_ldpc_v_tpu.ops.permute_plan import (
    LANES,
    PermutePlan,
    build_permute_plan,
)
from qkd_ldpc_v_tpu.utils import PlanCache

TILE = 128  # rows per permute tile (permute_plan spaces are [k*128, 128])


@dataclass(frozen=True)
class SideLayout:
    """Uniform blocked layout of one node side (bits or checks)."""

    count: int  # real nodes
    dmax: int  # slot rows per lane-block
    lane_blocks: int  # ceil(count / 128)
    l_blk: int  # lane-blocks per edge block
    kb: int  # number of edge blocks
    rows_blk: int  # dmax * l_blk (edge rows per block)
    deg: np.ndarray  # [kb, l_blk, 128] int32 node degrees (0 = pad lane)

    @property
    def node_rows(self) -> int:
        """Node-plane rows per block (= l_blk)."""
        return self.l_blk


def _side(rows: List[np.ndarray], cap_rows: int) -> SideLayout:
    count = len(rows)
    dmax = max(len(r) for r in rows)
    lane_blocks = -(-count // LANES)
    l_blk = max(1, cap_rows // dmax)
    kb = -(-lane_blocks // l_blk)
    deg = np.zeros(kb * l_blk * LANES, dtype=np.int32)
    deg[:count] = [len(r) for r in rows]
    return SideLayout(
        count=count,
        dmax=dmax,
        lane_blocks=lane_blocks,
        l_blk=l_blk,
        kb=kb,
        rows_blk=dmax * l_blk,
        deg=deg.reshape(kb, l_blk, LANES),
    )


def _block_pos(side: SideLayout, node: np.ndarray, slot: np.ndarray):
    """(block, in-block flat position) of edge slots on one side."""
    lb = node // LANES
    lane = node % LANES
    blk = lb // side.l_blk
    lb_local = lb % side.l_blk
    row = slot * side.l_blk + lb_local
    return blk, row * LANES + lane


def _pad_to_tiles(rows: int) -> int:
    return -(-rows // TILE) * TILE


def _complete_permutation(space: int, out_pos: np.ndarray,
                          in_pos: np.ndarray) -> np.ndarray:
    """Gather map g over [space] with g[out_pos] = in_pos and the remaining
    (pad) positions matched up in order."""
    g = np.full(space, -1, dtype=np.int64)
    g[out_pos] = in_pos
    used_in = np.zeros(space, dtype=bool)
    used_in[in_pos] = True
    free_out = np.flatnonzero(g < 0)
    free_in = np.flatnonzero(~used_in)
    g[free_out] = free_in
    return g


@dataclass(frozen=True)
class ExchangeDir:
    """One regroup direction (cm->bm or bm->cm)."""

    chunk_rows: int  # staged rows per (src, dst) chunk (multiple of 8)
    r1: int  # P1 space rows (tile-padded)
    r2: int  # P2 space rows (tile-padded)
    p1: Tuple[PermutePlan, ...]  # per src block
    p2: Tuple[PermutePlan, ...]  # per dst block


def _build_dir(src_blk: np.ndarray, src_pos: np.ndarray,
               dst_blk: np.ndarray, dst_pos: np.ndarray,
               kb_src: int, kb_dst: int,
               rows_src: int, rows_dst: int) -> ExchangeDir:
    """Factor the edge permutation (src compute layout -> dst compute
    layout) into per-block P1 / chunked exchange / per-block P2."""
    pair = src_blk * kb_dst + dst_blk
    order = np.argsort(pair, kind="stable")
    counts = np.bincount(pair, minlength=kb_src * kb_dst)
    chunk_lanes = int(counts.max())
    chunk_rows = -(-chunk_lanes // LANES)
    chunk_rows = -(-chunk_rows // 8) * 8  # sublane multiple for BlockSpecs
    # slot of each edge inside its (src, dst) chunk
    slot = np.empty(len(pair), dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    slot[order] = np.arange(len(pair)) - starts[pair[order]]

    r1 = _pad_to_tiles(max(rows_src, kb_dst * chunk_rows))
    r2 = _pad_to_tiles(max(rows_dst, kb_src * chunk_rows))
    p1 = []
    for s in range(kb_src):
        m = src_blk == s
        out_pos = dst_blk[m] * (chunk_rows * LANES) + slot[m]
        p1.append(build_permute_plan(
            _complete_permutation(r1 * LANES, out_pos, src_pos[m])
        ))
    p2 = []
    for d in range(kb_dst):
        m = dst_blk == d
        in_pos = src_blk[m] * (chunk_rows * LANES) + slot[m]
        p2.append(build_permute_plan(
            _complete_permutation(r2 * LANES, dst_pos[m], in_pos)
        ))
    return ExchangeDir(
        chunk_rows=chunk_rows, r1=r1, r2=r2,
        p1=tuple(p1), p2=tuple(p2),
    )


@dataclass(frozen=True)
class StreamPlan:
    """Host-compiled constants for the streaming decoder."""

    num_bits: int
    num_checks: int
    bits: SideLayout
    checks: SideLayout
    to_bm: ExchangeDir  # src = check blocks, dst = bit blocks
    to_cm: ExchangeDir  # src = bit blocks, dst = check blocks


def build_stream_plan(matrix: HMatrix, cap_rows: int = 256) -> StreamPlan:
    bits = _side(matrix.bit_nodes, cap_rows)
    checks = _side(matrix.check_nodes, cap_rows)

    # Flat edge enumeration in check-major order.
    check_ids = np.concatenate([
        np.full(len(r), j, dtype=np.int64)
        for j, r in enumerate(matrix.check_nodes)
    ])
    bit_ids = np.concatenate([
        np.asarray(r, dtype=np.int64) for r in matrix.check_nodes
    ])
    check_slot = np.concatenate([
        np.arange(len(r), dtype=np.int64) for r in matrix.check_nodes
    ])
    # slot of edge on the bit side: rank of the check in the bit's sorted row
    # (bit_nodes rows are ascending, so rank = position among the bit's edges
    # ordered by check id)
    order = np.lexsort((check_ids, bit_ids))
    counts = np.bincount(bit_ids, minlength=matrix.num_bit_nodes)
    starts = np.concatenate([[0], np.cumsum(counts)])
    bit_slot = np.empty(len(bit_ids), dtype=np.int64)
    bit_slot[order] = np.arange(len(bit_ids)) - starts[bit_ids[order]]

    cblk, cpos = _block_pos(checks, check_ids, check_slot)
    bblk, bpos = _block_pos(bits, bit_ids, bit_slot)

    return StreamPlan(
        num_bits=matrix.num_bit_nodes,
        num_checks=matrix.num_check_nodes,
        bits=bits,
        checks=checks,
        to_bm=_build_dir(cblk, cpos, bblk, bpos, checks.kb, bits.kb,
                         checks.rows_blk, bits.rows_blk),
        to_cm=_build_dir(bblk, bpos, cblk, cpos, bits.kb, checks.kb,
                         bits.rows_blk, checks.rows_blk),
    )


_PLAN_CACHE = PlanCache()


def stream_plan_for(matrix: HMatrix, cap_rows: int = 256) -> StreamPlan:
    plan = _PLAN_CACHE.get(matrix, extra=(cap_rows,))
    if plan is None:
        plan = build_stream_plan(matrix, cap_rows)
        _PLAN_CACHE.put(matrix, plan, extra=(cap_rows,))
    return plan
