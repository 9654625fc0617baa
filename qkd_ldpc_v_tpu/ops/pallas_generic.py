"""Fused Pallas TPU decoders for ARBITRARY sparse parity-check matrices.

The QC kernels (ops/pallas_qc.py) get their speed from circulant structure:
every cross-enumeration move is a lane rotation. The reference's production
codes, however, are *random* PEG constructions in alist/format-1/format-2
(reference: src/array_and_matrix_operations.cpp:291-886, suites
sparse_matrices/matrices_alist_{1k,10k}_all) with no circulant structure at
all — their check-major <-> bit-major regroup is an arbitrary permutation of
the edge space, which Mosaic cannot gather directly (lane gathers are
limited to 128-wide rows). This module makes those codes fast anyway:

  * edge state for a tile of frames lives in VMEM as ``[TB, R, 128]`` planes
    in *degree-grouped slot-plane* layout: check group g of degree d
    occupies d stacked plane-blocks of its checks, so every check/bit pass
    is an unrolled elementwise reduction over contiguous slot slabs — full
    VPU width, no masks, no straddling;
  * the regroup runs entirely in VMEM as a seven-stage Clos factorization
    (ops/permute_plan.py): lane-gather, tile-transpose, lane-gather,
    tile-select, lane-gather, tile-transpose, lane-gather — each stage a
    constant-indexed full-throughput op;
  * decisions travel check-major *packed into the mantissa LSB* of the new
    bit->check messages (min-sum family only — SPA can produce inf, whose
    LSB-set pattern is NaN, so SPA transports decisions in a separate
    permuted plane). The packing perturbs each message by at most 1 ulp;
    the fused kernel is therefore statistically equivalent to (not bitwise
    identical with) the XLA decoder — exact-parity claims remain the f64
    path's job (PARITY.md).

Early exit is per tile of TB frames, exactly like the QC kernels.
Algorithm semantics mirror ops/decoders.py (reference:
src/qkd_ldpc_algorithm.cpp:3-1029): hard-decision ``<= 0 -> 1``, exact
two-minimum tie handling, OMSA clamp-at-zero, the adaptive pair's
previous-decision factor selection with in-check-pass convergence, and the
optional message clamp at the reference's program points.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.hmatrix import HMatrix
from qkd_ldpc_v_tpu.ops.decoders import DecodeResult
from qkd_ldpc_v_tpu.ops.dispatch import is_traced, scalar_bundle, unbundle
from qkd_ldpc_v_tpu.ops.linapprox import (
    atanh_lin_approx,
    guard_atanh_ratio,
    tanh_lin_approx,
)
from qkd_ldpc_v_tpu.ops.permute_plan import LANES, PermutePlan, build_permute_plan
from qkd_ldpc_v_tpu.utils import PlanCache

# Largest edge-space tile count the kernel accepts: three edge buffers of
# [TB, Tn*128, 128] f32 plus planes and index tables must fit 16 MB VMEM.
MAX_TILES = 4

# Profiling hook (scripts only): replace the seven-stage regroup with a
# plain copy to measure the permutation's share of the iteration. Decoding
# is WRONG with this on; never set it outside perf probes.
_PROFILE_SKIP_PERMUTE = False

# i8x4 transport quantization step (module-level so probes can sweep it;
# baked into the kernel at build time). 0.125 saturates at +-7.875 —
# ~2.3x the channel LLR at QBER 0.03. Aggressive saturation with fine
# quantization converges closest to f32 (measured: +10% iterations vs
# +25% at step 0.25/0.375) — the classic hardware-decoder regime.
_I8_STEP = 0.125


@dataclass(frozen=True)
class NodeSide:
    """Degree-grouped plane layout of one side (bits or checks).

    groups: (degree, count, blocks, node_row_off, edge_row_off) per degree
    class; ``blocks`` = ceil(count / 128).
      * node plane space: group nodes at rows [node_row_off, +blocks)
      * edge plane space: slot s of group g at rows
        [edge_row_off + s*blocks, +blocks)
    """

    groups: Tuple[Tuple[int, int, int, int, int], ...]
    node_rows: int  # total node-plane rows
    edge_rows: int  # total edge-plane rows (pre-padding)
    order: np.ndarray  # [count_total] external node id at sorted position
    plane_pos: np.ndarray  # [count_total] node-plane position of ext node id
    valid: np.ndarray  # [node_rows, 128] int32, 1 = real node lane
    rep_src: np.ndarray  # [edge_rows] node-plane row feeding each edge row


def _node_side(rows: List[np.ndarray]) -> NodeSide:
    degrees = np.array([len(r) for r in rows], dtype=np.int64)
    order = np.argsort(degrees, kind="stable").astype(np.int32)
    sorted_deg = degrees[order]
    groups = []
    node_rows = 0
    edge_rows = 0
    start = 0
    n = len(rows)
    plane_pos = np.zeros(n, dtype=np.int64)
    while start < n:
        d = int(sorted_deg[start])
        end = start
        while end < n and sorted_deg[end] == d:
            end += 1
        count = end - start
        blocks = -(-count // LANES)
        local = np.arange(count)
        plane_pos[order[start:end]] = (
            (node_rows + local // LANES) * LANES + local % LANES
        )
        groups.append((d, count, blocks, node_rows, edge_rows))
        node_rows += blocks
        edge_rows += d * blocks
        start = end
    valid = np.zeros((node_rows, LANES), dtype=np.int32)
    valid.reshape(-1)[plane_pos] = 1
    rep_src = np.zeros(edge_rows, dtype=np.int32)
    for d, count, blocks, noff, eoff in groups:
        for s in range(d):
            rep_src[eoff + s * blocks : eoff + (s + 1) * blocks] = np.arange(
                noff, noff + blocks
            )
    return NodeSide(
        groups=tuple(groups),
        node_rows=node_rows,
        edge_rows=edge_rows,
        order=order,
        plane_pos=plane_pos,
        valid=valid,
        rep_src=rep_src,
    )


@dataclass(frozen=True)
class GenericPlan:
    """Host-compiled constants for one matrix: plane layouts for both sides
    plus the two seven-stage regroup factorizations."""

    num_bits: int
    num_checks: int
    bits: NodeSide
    checks: NodeSide
    n_tiles: int  # padded edge space = n_tiles * 128 rows
    to_bm: PermutePlan  # out_bm[i] = in_cm[map[i]]
    to_cm: PermutePlan

    @property
    def edge_space_rows(self) -> int:
        return self.n_tiles * LANES


def build_generic_plan(matrix: HMatrix) -> GenericPlan:
    """Compile the matrix's Tanner graph into the fused kernel's layout.

    Raises ValueError when the edge space exceeds MAX_TILES 128x128-row
    tiles (the VMEM feasibility gate) — callers fall back to the XLA
    decoder."""
    bits = _node_side(matrix.bit_nodes)
    checks = _node_side(matrix.check_nodes)
    used = max(bits.edge_rows, checks.edge_rows)
    n_tiles = -(-used // LANES)
    if n_tiles > MAX_TILES:
        raise ValueError(
            f"edge space {used} rows needs {n_tiles} tiles > {MAX_TILES}; "
            "use the XLA decoder for this matrix"
        )
    s = n_tiles * LANES * LANES

    bit_rows = matrix.bit_nodes
    check_rows = matrix.check_nodes
    # node -> (group index, local rank) via the sorted order
    bit_grp = np.zeros(matrix.num_bit_nodes, dtype=np.int64)
    bit_loc = np.zeros(matrix.num_bit_nodes, dtype=np.int64)
    pos = 0
    for h, (d, count, blocks, noff, eoff) in enumerate(bits.groups):
        ids = bits.order[pos : pos + count]
        bit_grp[ids] = h
        bit_loc[ids] = np.arange(count)
        pos += count
    chk_grp = np.zeros(matrix.num_check_nodes, dtype=np.int64)
    chk_loc = np.zeros(matrix.num_check_nodes, dtype=np.int64)
    pos = 0
    for g, (d, count, blocks, noff, eoff) in enumerate(checks.groups):
        ids = checks.order[pos : pos + count]
        chk_grp[ids] = g
        chk_loc[ids] = np.arange(count)
        pos += count

    to_bm = np.full(s, -1, dtype=np.int64)
    to_cm = np.full(s, -1, dtype=np.int64)
    for j in range(matrix.num_check_nodes):
        row = check_rows[j]
        g = chk_grp[j]
        d, count, blocks, noff, eoff = checks.groups[g]
        q = int(chk_loc[j])
        for slot, i in enumerate(row):
            i = int(i)
            t = int(np.searchsorted(bit_rows[i], j))
            dh, counth, blocksh, noffh, eoffh = bits.groups[bit_grp[i]]
            p = int(bit_loc[i])
            cp = (eoff + slot * blocks + (q >> 7)) * LANES + (q & 127)
            bp = (eoffh + t * blocksh + (p >> 7)) * LANES + (p & 127)
            to_bm[bp] = cp
            to_cm[cp] = bp
    # pad <-> pad, in order (keeps both maps proper permutations)
    free_b = np.flatnonzero(to_bm < 0)
    free_c = np.flatnonzero(to_cm < 0)
    to_bm[free_b] = free_c
    to_cm[free_c] = free_b

    return GenericPlan(
        num_bits=matrix.num_bit_nodes,
        num_checks=matrix.num_check_nodes,
        bits=bits,
        checks=checks,
        n_tiles=n_tiles,
        to_bm=build_permute_plan(to_bm),
        to_cm=build_permute_plan(to_cm),
    )


_PLAN_CACHE = PlanCache()


def plan_for(matrix: HMatrix) -> GenericPlan:
    plan = _PLAN_CACHE.get(matrix)
    if plan is None:
        plan = build_generic_plan(matrix)
        _PLAN_CACHE.put(matrix, plan)
    return plan


def generic_plan_feasible(matrix: HMatrix) -> bool:
    """Cheap gate used by the driver to pick the fused generic kernel."""
    try:
        e = sum(len(r) for r in matrix.check_nodes)
        if e > MAX_TILES * LANES * LANES:
            return False
        plan_for(matrix)
        return True
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _build(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int,
    interpret: bool,
    mode: str,  # "decode" | "trial" | "mc" | "frame"
    transport: str = "bf16x2",  # "bf16x2" | "f32" | "i8x4"
):
    plan = plan_for(matrix)
    dtype = jnp.dtype(jnp.float32)
    tb = batch_tile
    tn = plan.n_tiles
    r = plan.edge_space_rows
    nbr = plan.bits.node_rows
    mr = plan.checks.node_rows
    big = jnp.finfo(dtype).max
    adaptive = algorithm.is_adaptive
    spa = algorithm in (DecodingAlgorithm.SPA, DecodingAlgorithm.SPA_APPROX)
    pack = not spa  # min-sum family: decisions ride the message LSB
    # Packed transports (min-sum family only): each f32 word of the
    # edge-space buffers carries several frames' messages, so every permute
    # stage (the dominant share of the iteration body — measured 70% at
    # bf16x2) moves that many frames per op. SPA always uses f32 transport:
    # its tanh products need the mantissa.
    #   * bf16x2 — two frames as bf16 halves (frame t in the high 16 bits;
    #     bf16 is exactly f32's top half, so packing is a mask and
    #     unpacking a shift).
    #   * i8x4 — four frames as quantized bytes: a 7-bit signed fixed-point
    #     message (step I8_STEP, saturating at +-63*I8_STEP) in bits 7..1
    #     and the decision bit in bit 0 of each byte. 6-bit-magnitude
    #     min-sum is standard hardware-decoder practice; the quantizer is
    #     shared by both passes so min1/|m| tie comparisons stay exact.
    if transport not in ("bf16x2", "f32", "i8x4"):
        raise ValueError(f"unknown transport {transport!r}")
    halves = {"f32": 1, "bf16x2": 2, "i8x4": 4}[transport] if not spa else 1
    if tb % halves:
        raise ValueError(
            f"{transport} transport needs batch_tile % {halves} == 0"
        )
    tp = tb // halves  # leading dim of edge-space buffers
    if algorithm == DecodingAlgorithm.SPA:
        tanh_fn = jnp.tanh
        atanh_fn = lambda x: 0.5 * jnp.log((1.0 + x) / (1.0 - x))  # noqa: E731
    else:
        tanh_fn, atanh_fn = tanh_lin_approx, atanh_lin_approx
    # True-SPA fast mode needs the atanh domain guard (see
    # linapprox.guard_atanh_ratio); SPA-LIN's piecewise atanh is finite.
    guard = algorithm == DecodingAlgorithm.SPA

    idx_bits = max(1, (nbr * LANES - 1).bit_length())
    bit_edge_rows = plan.bits.edge_rows

    MASK_HI = -65536  # 0xFFFF0000: high bf16 half (python int: folds inline)
    MASK_HI_NOLSB = -131072  # 0xFFFE0000

    def _i32(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def _f32(x):
        return jax.lax.bitcast_convert_type(x, dtype)

    I8_STEP = _I8_STEP
    I8_INV = 1.0 / I8_STEP

    def _quant(x):
        """f32 -> saturating 7-bit signed quantizer (i8x4 transport)."""
        return jnp.clip(jnp.round(x * I8_INV), -63.0, 63.0).astype(jnp.int32)

    def unpack(w, h):
        """Transport part h of packed word w, as f32. Part h holds frames
        [h*tp, (h+1)*tp). Identity when unpacked."""
        if halves == 1:
            return w
        wi = _i32(w)
        if transport == "bf16x2":
            return _f32((wi & MASK_HI) if h == 0 else (wi << 16))
        # i8x4: sign-extend bits [8h+1, 8h+8) (bit 8h is the decision).
        q = (wi << (24 - 8 * h)) >> 25
        return q.astype(dtype) * I8_STEP

    def pack_frames(vals):
        """n transport-part f32 slabs -> one packed word (decision LSBs
        zero). bf16 packing is mantissa truncation (only ever shrinks
        magnitudes); i8x4 is round-to-nearest fixed point."""
        if halves == 1:
            return vals[0]
        if transport == "bf16x2":
            return _f32(
                (_i32(vals[0]) & MASK_HI) | ((_i32(vals[1]) >> 16) & 0xFFFF)
            )
        w = (_quant(vals[0]) << 1) & 0xFF
        for h in range(1, 4):
            w = w | (((_quant(vals[h]) << 1) & 0xFF) << (8 * h))
        return _f32(w)

    def pack_frames_dec(vals, decs):
        """pack_frames with each part's decision bit in its LSB."""
        if halves == 1:
            return _f32((_i32(vals[0]) & ~1) | decs[0])
        if transport == "bf16x2":
            w = (_i32(vals[0]) & MASK_HI_NOLSB) | (decs[0] << 16)
            w = w | ((_i32(vals[1]) >> 16) & 0xFFFE) | decs[1]
            return _f32(w)
        w = ((_quant(vals[0]) << 1) & 0xFE) | decs[0]
        for h in range(1, 4):
            w = w | ((((_quant(vals[h]) << 1) & 0xFE) | decs[h]) << (8 * h))
        return _f32(w)

    def packed_from_frames(v):
        """[tb, rows, 128] per-frame f32 -> [tp, rows, 128] transport word."""
        if halves == 1:
            return v
        return pack_frames([v[hrows(h)] for h in range(halves)])

    def full_word(rows_count, value: float):
        """Transport-layout constant slab holding `value` in every frame."""
        if halves == 1:
            return jnp.full((tp, rows_count, LANES), value, dtype)
        if transport == "bf16x2":
            hi = int(np.float32(value).view(np.int32)) & 0xFFFF0000
            w = np.int32(np.uint32(hi | (hi >> 16)))
        else:
            q = int(np.clip(np.round(value * I8_INV), -63, 63))
            b = (q << 1) & 0xFF
            w = np.int32(np.uint32(b * 0x01010101))
        return _f32(jnp.full((tp, rows_count, LANES), w, jnp.int32))

    def hrows(h):
        """Frame-row slice of half h in the per-frame [tb, ...] arrays."""
        return slice(h * tp, (h + 1) * tp)

    def clamp(x, threshold):
        if use_threshold:
            return jnp.clip(x, -threshold, threshold)
        return x

    def kernel(*args):
        bm_tabs = args[0:5]
        cm_tabs = args[5:10]
        bit_valid_ref, check_valid_ref = args[10], args[11]
        rest = args[12:]
        alice_ref = bob_ref = llr_ref = syn_ref = None
        seed_ref = ne_ref = qber_ref = None
        asyn = llrs = alice = ekeys = None
        dec_out = keys_out = None
        if mode == "decode":
            (llr_ref, syn_ref, prim_ref, sec_ref, thr_ref,
             dec_out, conv_out, iter_out,
             msg, ping, pong, dec, frz, dstage) = rest
        elif mode == "trial":
            (alice_ref, bob_ref, qber_ref, prim_ref, sec_ref, thr_ref,
             conv_out, keys_out, iter_out,
             msg, ping, pong, dec, frz, asyn, dstage, llrs) = rest
        elif mode == "frame":
            (alice_ref, llr_ref, prim_ref, sec_ref, thr_ref,
             conv_out, keys_out, iter_out,
             msg, ping, pong, dec, frz, asyn, dstage) = rest
        else:  # mc
            (seed_ref, ne_ref, qber_ref, prim_ref, sec_ref, thr_ref,
             conv_out, keys_out, iter_out,
             msg, ping, pong, dec, frz, asyn, alice, dstage, llrs) = rest
        primary = prim_ref[0, 0]
        secondary = sec_ref[0, 0]
        threshold = thr_ref[0, 0]

        def permute(tabs, src, out, scratch):
            """Seven-stage Clos pipeline: reads src (read-only), leaves the
            result in `out`, clobbers `scratch`. Stage parity is arranged so
            the final lane gather lands in `out` with no trailing copy."""
            idx_l1, idx_c, bsel, idx_a, idx_l2 = tabs
            if _PROFILE_SKIP_PERMUTE:
                for t2 in range(tn):
                    out[:, t2 * LANES:(t2 + 1) * LANES, :] = src[
                        :, t2 * LANES:(t2 + 1) * LANES, :
                    ]
                return
            for t in range(tp):  # L1 lane gather  src -> out
                out[t] = jnp.take_along_axis(src[t], idx_l1[:], axis=1)
            for t2 in range(tn):  # tile transpose  out -> scratch
                scratch[:, t2 * LANES:(t2 + 1) * LANES, :] = jnp.swapaxes(
                    out[:, t2 * LANES:(t2 + 1) * LANES, :], 1, 2
                )
            for t in range(tp):  # C gather (transposed)  scratch -> out
                out[t] = jnp.take_along_axis(scratch[t], idx_c[:], axis=1)
            for t2 in range(tn):  # B tile select  out -> scratch
                sel = bsel[t2]
                acc = out[:, 0:LANES, :]
                for t1 in range(1, tn):
                    acc = jnp.where(
                        (sel == t1)[None],
                        out[:, t1 * LANES:(t1 + 1) * LANES, :],
                        acc,
                    )
                scratch[:, t2 * LANES:(t2 + 1) * LANES, :] = acc
            for t in range(tp):  # A gather (transposed)  scratch -> out
                out[t] = jnp.take_along_axis(scratch[t], idx_a[:], axis=1)
            for t2 in range(tn):  # tile transpose back  out -> scratch
                scratch[:, t2 * LANES:(t2 + 1) * LANES, :] = jnp.swapaxes(
                    out[:, t2 * LANES:(t2 + 1) * LANES, :], 1, 2
                )
            for t in range(tp):  # L2 lane gather  scratch -> out
                out[t] = jnp.take_along_axis(scratch[t], idx_l2[:], axis=1)

        # --- prologue -----------------------------------------------------
        # Everything here runs on whole-array or slab-granularity ops:
        # Mosaic's per-instruction overhead makes hundreds of one-vreg
        # [TB, 128] ops far slower than a handful of multi-vreg slab ops
        # (measured ~140 us/tile for the original per-row formulation).
        if mode in ("trial", "mc"):
            # log((1-q)/q) arrives precomputed by the wrapper: Mosaic's
            # in-kernel log can differ from XLA's by an ulp, handing
            # engines different channel-LLR bits (round 5, PARITY.md
            # §Z=2048) — same-bits LLRs keep every engine's trial path on
            # the XLA decoder's exact trajectory.
            log_p = qber_ref[0, 0]

        if mode == "mc":
            # Hardware-PRNG keys + exactly-num_errors error subset
            # (reference channel semantics:
            # src/array_and_matrix_operations.cpp:889-933). Wide flat values
            # [TB, nbr*128]: one PRNG call each for keys and sort keys, and
            # the 32-pass bitwise k-th-smallest selection reduces the whole
            # flat row per pass.
            pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
            num_errors = ne_ref[0, 0]
            width = nbr * LANES
            abits = pltpu.bitcast(
                pltpu.prng_random_bits((tb, width)), jnp.uint32
            )
            alice_flat = (abits & 1).astype(jnp.int32)
            ebits = pltpu.bitcast(
                pltpu.prng_random_bits((tb, width)), jnp.uint32
            )
            pos_idx = jax.lax.broadcasted_iota(
                jnp.int32, (tb, width), 1
            )
            # valid-lane mask in flat coordinates: group h's lanes are valid
            # while their in-group offset is < count
            valid_flat = jnp.zeros((tb, width), jnp.int32)
            for d, count, blocks, noff, eoff in plan.bits.groups:
                lo = noff * LANES
                valid_flat = valid_flat | (
                    (pos_idx >= lo) & (pos_idx < lo + count)
                ).astype(jnp.int32)
            keys_flat = (ebits >> idx_bits << idx_bits) | pos_idx.astype(
                jnp.uint32
            )
            keys_flat = jnp.where(
                valid_flat != 0, keys_flat, jnp.uint32(0xFFFFFFFF)
            )
            t_sel = jnp.zeros((tb, 1), jnp.uint32)
            for b in reversed(range(32)):
                cand = t_sel | jnp.uint32(1 << b)
                cnt = jnp.sum(
                    (keys_flat < cand).astype(jnp.int32),
                    axis=1, keepdims=True,
                )
                t_sel = jnp.where(cnt < num_errors, cand, t_sel)
            flip_flat = jnp.where(
                num_errors > 0, (keys_flat <= t_sel).astype(jnp.int32), 0
            )
            bob_flat = alice_flat ^ flip_flat
            llr_flat = jnp.where(bob_flat == 1, -log_p, log_p).astype(dtype)
            for blk in range(nbr):
                alice[:, blk, :] = alice_flat[
                    :, blk * LANES:(blk + 1) * LANES
                ]
                llrs[:, blk, :] = llr_flat[:, blk * LANES:(blk + 1) * LANES]
        elif mode == "trial":
            bob_all = bob_ref[:, :, :]
            llrs[:, :, :] = jnp.where(bob_all == 1, -log_p, log_p).astype(dtype)

        def alice_slab(noff, blocks):
            if mode == "mc":
                return alice[:, noff:noff + blocks, :]
            return alice_ref[:, noff:noff + blocks, :]

        def llr_slab(noff, blocks):
            if mode in ("decode", "frame"):
                return llr_ref[:, noff:noff + blocks, :]
            return llrs[:, noff:noff + blocks, :]

        def stage_bit_edges(dst, value_of_slab, pad_value):
            """Replicate per-bit slabs onto the bit-major edge space: one
            slab copy per (group, slot) plus one for the pad rows.
            ``value_of_slab`` returns per-frame [tb, blocks, 128] f32; the
            staged copy is in transport layout."""
            for d, count, blocks, noff, eoff in plan.bits.groups:
                v = packed_from_frames(value_of_slab(noff, blocks))
                for s in range(d):
                    dst[:, eoff + s * blocks : eoff + (s + 1) * blocks, :] = v
            dst[:, bit_edge_rows:r, :] = full_word(r - bit_edge_rows, pad_value)

        # Alice syndrome (trial/mc/frame): replicate alice bit planes onto
        # the bit-major edge space (f32-encoded 0/1), regroup to check-major,
        # XOR-reduce per check group slot slab.
        if mode in ("trial", "mc", "frame"):
            stage_bit_edges(
                pong, lambda o, blk: alice_slab(o, blk).astype(dtype), 0.0
            )
            permute(cm_tabs, pong, ping, msg)
            for d, count, blocks, noff, eoff in plan.checks.groups:
                for h in range(halves):
                    acc = None
                    for s in range(d):
                        slab = unpack(
                            ping[:, eoff + s * blocks : eoff + (s + 1) * blocks, :],
                            h,
                        )
                        bi = (slab > 0.5).astype(jnp.int32)
                        acc = bi if acc is None else acc ^ bi
                    asyn[hrows(h), noff:noff + blocks, :] = acc

        def syn_slab(noff, blocks):
            """[TB, blocks, 128] int32 Alice-syndrome slab."""
            if mode == "decode":
                return syn_ref[:, noff:noff + blocks, :]
            return asyn[:, noff:noff + blocks, :]

        # Initial decisions + check-aligned initial messages: stage LLRs
        # onto the bit-major edge space (decision packed into the LSB),
        # regroup to check-major (reference init:
        # src/qkd_ldpc_algorithm.cpp:21-29).
        d0_all = (llr_slab(0, nbr) <= 0).astype(jnp.int32)
        dec[:, :, :] = d0_all
        frz[:, :, :] = d0_all

        def stage_msg_init(dst):
            """Initial bit->check messages: channel LLRs with the decision
            bit in each transported value's LSB (min-sum family), staged on
            the bit-major edge space in transport layout."""
            for d, count, blocks, noff, eoff in plan.bits.groups:
                v = llr_slab(noff, blocks)
                if pack:
                    dg = dec[:, noff:noff + blocks, :]
                    w = pack_frames_dec(
                        [v[hrows(h)] for h in range(halves)],
                        [dg[hrows(h)] for h in range(halves)],
                    )
                else:
                    w = packed_from_frames(v)
                for s in range(d):
                    dst[:, eoff + s * blocks : eoff + (s + 1) * blocks, :] = w
            dst[:, bit_edge_rows:r, :] = full_word(r - bit_edge_rows, 1.0)

        stage_msg_init(pong)
        permute(cm_tabs, pong, msg, ping)
        if spa:
            # SPA transports decisions in their own permuted plane, staged
            # bit-major in dstage and living check-major in `ping` (which is
            # dead at every point the transported decisions are read).
            stage_bit_edges(
                dstage,
                lambda o, blk: dec[:, o:o + blk, :].astype(dtype),
                0.0,
            )
            permute(cm_tabs, dstage, ping, pong)

        def dec_edge_slab(row_start, blocks, h):
            """[tp, blocks, 128] int32 half-h decisions on check-major edge
            rows (LSB of the transported bf16/f32 message, or the SPA
            decision plane)."""
            if pack:
                vi = jax.lax.bitcast_convert_type(
                    msg[:, row_start:row_start + blocks, :], jnp.int32
                )
                if transport == "bf16x2":
                    return ((vi >> 16) & 1) if h == 0 else (vi & 1)
                if transport == "i8x4":
                    return (vi >> (8 * h)) & 1
                return vi & 1
            return (
                ping[:, row_start:row_start + blocks, :] > 0.5
            ).astype(jnp.int32)

        def dsyn_mismatch():
            """(per-half [tp, 1] mismatch totals, per-half per-group
            mismatch planes)."""
            totals = [jnp.zeros((tp, 1), jnp.int32) for _ in range(halves)]
            mism = [[] for _ in range(halves)]
            for d, count, blocks, noff, eoff in plan.checks.groups:
                for h in range(halves):
                    acc = None
                    for s in range(d):
                        bi = dec_edge_slab(eoff + s * blocks, blocks, h)
                        acc = bi if acc is None else acc ^ bi
                    mm = (acc ^ syn_slab(noff, blocks)[hrows(h)]) * (
                        check_valid_ref[noff:noff + blocks, :][None]
                    )
                    mism[h].append(mm)
                    totals[h] = totals[h] + jnp.sum(
                        jnp.sum(mm, axis=2, keepdims=True), axis=1
                    )
            return totals, mism

        def check_pass(mism):
            """mism: None (non-adaptive) or per-half per-group mismatch
            planes."""
            for gi, (d, count, blocks, noff, eoff) in enumerate(
                plan.checks.groups
            ):
                words = [
                    msg[:, eoff + s * blocks : eoff + (s + 1) * blocks, :]
                    for s in range(d)
                ]
                syn_full = syn_slab(noff, blocks)
                if spa:
                    ss = jnp.where(syn_full == 1, -1.0, 1.0).astype(dtype)
                    ts = [tanh_fn(m * 0.5) for m in words]
                    prod = ss
                    for t in ts:
                        prod = prod * t
                    for s, t in enumerate(ts):
                        ratio = prod / t
                        if guard:
                            ratio = guard_atanh_ratio(ratio, dtype)
                        msg[:, eoff + s * blocks : eoff + (s + 1) * blocks, :] = (
                            clamp(
                                (2.0 * atanh_fn(ratio)).astype(dtype),
                                threshold,
                            )
                        )
                    continue
                outs = []  # per half: d new-message slabs
                for h in range(halves):
                    msgs = [unpack(w, h) for w in words]
                    ss = jnp.where(
                        syn_full[hrows(h)] == 1, -1.0, 1.0
                    ).astype(dtype)
                    # Pairwise two-minimum chain: exact multiset semantics
                    # (ties at the minimum emit min2 == min1, reference
                    # :381-397).
                    a = [jnp.abs(m) for m in msgs]
                    min1 = a[0]
                    min2 = jnp.full_like(min1, big)
                    for ai in a[1:]:
                        min2 = jnp.minimum(min2, jnp.maximum(min1, ai))
                        min1 = jnp.minimum(min1, ai)
                    neg = jnp.zeros(min1.shape, jnp.int32)
                    for m in msgs:
                        neg = neg + (m < 0).astype(jnp.int32)
                    row_sign = ss * jnp.where(
                        neg % 2 == 0, 1.0, -1.0
                    ).astype(dtype)
                    f = primary if mism is None else jnp.where(
                        mism[h][gi] != 0, secondary, primary
                    ).astype(dtype)
                    news = []
                    for s in range(d):
                        m, ai = msgs[s], a[s]
                        excl = jnp.where(m > 0, 1.0, -1.0).astype(dtype)
                        eabs = jnp.where(ai == min1, min2, min1)
                        if algorithm in (
                            DecodingAlgorithm.NMSA, DecodingAlgorithm.ANMSA
                        ):
                            val = f * row_sign * excl * eabs
                        else:  # OMSA / AOMSA: offset, clamp at zero
                            val = row_sign * excl * jnp.maximum(eabs - f, 0.0)
                        news.append(clamp(val.astype(dtype), threshold))
                    outs.append(news)
                for s in range(d):
                    w = pack_frames([outs[h][s] for h in range(halves)])
                    msg[:, eoff + s * blocks : eoff + (s + 1) * blocks, :] = w

        def bit_pass():
            # extrinsics arrive bit-major in `ping` after the regroup
            for d, count, blocks, noff, eoff in plan.bits.groups:
                words = [
                    ping[:, eoff + t * blocks : eoff + (t + 1) * blocks, :]
                    for t in range(d)
                ]
                llr_full = llr_slab(noff, blocks)
                vals = []  # per half: (d new-message slabs, decision slab)
                for h in range(halves):
                    es = [unpack(w, h) for w in words]
                    total = llr_full[hrows(h)]
                    for e in es:
                        total = total + e
                    dg = (total <= 0).astype(jnp.int32)
                    dec[hrows(h), noff:noff + blocks, :] = dg
                    vals.append(
                        ([clamp(total - e, threshold) for e in es], dg)
                    )
                for t in range(d):
                    if pack:
                        w = pack_frames_dec(
                            [vals[h][0][t] for h in range(halves)],
                            [vals[h][1] for h in range(halves)],
                        )
                    else:
                        w = vals[0][0][t]
                    pong[:, eoff + t * blocks : eoff + (t + 1) * blocks, :] = w
            pong[:, bit_edge_rows:r, :] = full_word(r - bit_edge_rows, 1.0)
            if spa:
                stage_bit_edges(
                    dstage,
                    lambda o, blk: dec[:, o:o + blk, :].astype(dtype),
                    0.0,
                )

        def regroup_to_bm():
            # check-major extrinsics (msg, read-only) -> bit-major in ping
            permute(bm_tabs, msg, ping, pong)

        def regroup_to_cm():
            # new bit->check messages (pong) -> check-major, directly in msg
            permute(cm_tabs, pong, msg, ping)
            if spa:
                # decisions follow: bit-major dstage -> check-major ping
                permute(cm_tabs, dstage, ping, pong)

        def freeze(h, newly):
            sel = (newly != 0)[:, :, None]  # [tp, 1, 1] broadcast
            rs = hrows(h)
            frz[rs, :, :] = jnp.where(sel, dec[rs, :, :], frz[rs, :, :])

        if not adaptive:

            def body(carry):
                it, converged, iters = carry
                check_pass(None)
                regroup_to_bm()
                bit_pass()
                regroup_to_cm()
                totals, _ = dsyn_mismatch()
                converged = list(converged)
                iters = list(iters)
                for h in range(halves):
                    ok = (totals[h] == 0).astype(jnp.int32)
                    newly = ok * (1 - converged[h])
                    iters[h] = jnp.where(newly != 0, it + 1, iters[h])
                    freeze(h, newly)
                    converged[h] = jnp.maximum(converged[h], ok)
                return it + 1, tuple(converged), tuple(iters)

        else:

            def body(carry):
                it, converged, iters = carry
                # Convergence from the *previous* decision, detected inside
                # the check pass; the same mismatch drives the factor
                # (reference: :745-776).
                totals, mism = dsyn_mismatch()
                converged = list(converged)
                iters = list(iters)
                for h in range(halves):
                    ok = (totals[h] == 0).astype(jnp.int32)
                    newly = ok * (1 - converged[h])
                    iters[h] = jnp.where(newly != 0, it + 1, iters[h])
                    freeze(h, newly)
                    converged[h] = jnp.maximum(converged[h], ok)
                check_pass(mism)
                regroup_to_bm()
                bit_pass()
                regroup_to_cm()
                return it + 1, tuple(converged), tuple(iters)

        def cond(carry):
            it, converged, iters = carry
            done = jnp.all(converged[0] != 0)
            for c in converged[1:]:
                done = done & jnp.all(c != 0)
            return (it < max_iterations) & ~done

        converged0 = tuple(
            jnp.zeros((tp, 1), jnp.int32) for _ in range(halves)
        )
        iters0 = tuple(
            jnp.full((tp, 1), max_iterations, jnp.int32)
            for _ in range(halves)
        )
        it, converged, iters = jax.lax.while_loop(
            cond, body, (jnp.int32(0), converged0, iters0)
        )

        for h in range(halves):
            rs = hrows(h)
            csel = (converged[h] != 0)[:, :, None]  # [tp, 1, 1] broadcast
            if mode == "decode":
                dec_out[rs, :, :] = jnp.where(
                    csel, frz[rs, :, :], dec[rs, :, :]
                )
                conv_out[rs, :] = converged[h].astype(jnp.int8)
                iter_out[rs, :] = iters[h]
            else:
                final = jnp.where(csel, frz[rs, :, :], dec[rs, :, :])
                diff = (final != alice_slab(0, nbr)[hrows(h)]).astype(
                    jnp.int32
                )
                diff = diff * bit_valid_ref[:, :][None]
                km = jnp.sum(jnp.sum(diff, axis=2, keepdims=True), axis=1)
                conv_out[rs, :] = converged[h].astype(jnp.int8)
                # 1 - min(km, 1) == (km == 0); the comparison form trips a
                # Mosaic relayout bug on the reduced [tp, 1] vector's layout
                # ("Non-singleton logical dimension is replicated...").
                keys_out[rs, :] = (1 - jnp.minimum(km, 1)).astype(jnp.int8)
                iter_out[rs, :] = iters[h]

    # --- pallas_call plumbing ---------------------------------------------
    edge_f32 = pltpu.VMEM((tp, r, LANES), dtype)
    scratch_shapes = [
        edge_f32,  # msg
        edge_f32,  # ping
        edge_f32,  # pong
        pltpu.VMEM((tb, nbr, LANES), jnp.int32),  # dec
        pltpu.VMEM((tb, nbr, LANES), jnp.int32),  # frz
    ]
    if mode in ("trial", "frame", "mc"):
        scratch_shapes.append(pltpu.VMEM((tb, mr, LANES), jnp.int32))  # asyn
    if mode == "mc":
        scratch_shapes.append(pltpu.VMEM((tb, nbr, LANES), jnp.int32))  # alice
    scratch_shapes.append(
        edge_f32 if spa else pltpu.VMEM((8, LANES), dtype)
    )  # dstage
    if mode in ("trial", "mc"):
        scratch_shapes.append(pltpu.VMEM((tb, nbr, LANES), dtype))  # llrs

    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    def table_spec(shape):
        if len(shape) == 2:
            return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    def tabs_of(p: PermutePlan):
        return (
            jnp.asarray(p.idx_l1), jnp.asarray(p.idx_c), jnp.asarray(p.bsel),
            jnp.asarray(p.idx_a), jnp.asarray(p.idx_l2),
        )

    const_operands = (
        tabs_of(plan.to_bm)
        + tabs_of(plan.to_cm)
        + (jnp.asarray(plan.bits.valid), jnp.asarray(plan.checks.valid))
    )
    const_specs = [table_spec(x.shape) for x in const_operands]

    def plane_spec(rows):
        return pl.BlockSpec(
            (tb, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def col_spec():
        return pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def stats_outputs(b):
        shape = (
            jax.ShapeDtypeStruct((b, 1), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        )
        return shape, (col_spec(), col_spec(), col_spec())

    def call(num_tiles, b, *operands):
        if mode == "decode":
            in_specs = const_specs + [
                plane_spec(nbr), plane_spec(mr),
                scalar_spec, scalar_spec, scalar_spec,
            ]
            out_shape = (
                jax.ShapeDtypeStruct((b, nbr, LANES), jnp.int32),
                jax.ShapeDtypeStruct((b, 1), jnp.int8),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
            )
            out_specs = (plane_spec(nbr), col_spec(), col_spec())
        elif mode == "trial":
            in_specs = const_specs + [
                plane_spec(nbr), plane_spec(nbr),
                scalar_spec, scalar_spec, scalar_spec, scalar_spec,
            ]
            out_shape, out_specs = stats_outputs(b)
        elif mode == "frame":
            in_specs = const_specs + [
                plane_spec(nbr), plane_spec(nbr),
                scalar_spec, scalar_spec, scalar_spec,
            ]
            out_shape, out_specs = stats_outputs(b)
        else:  # mc
            smem_i32 = pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            )
            in_specs = const_specs + [
                smem_i32, smem_i32, scalar_spec, scalar_spec, scalar_spec,
                scalar_spec,
            ]
            out_shape, out_specs = stats_outputs(b)
        # Computed scoped-VMEM request (round 5): scratch + resident
        # tables + double-buffered io blocks + half again for Mosaic
        # stack temporaries, floored at the 16 MiB-era default behavior
        # and capped at the probed 120 MiB ceiling. This is what lets
        # MAX_TILES exceed the original 4-tile/16 MiB envelope.
        scratch_bytes = sum(
            int(np.prod(s.shape)) * jnp.dtype(s.dtype).itemsize
            for s in scratch_shapes
        )
        table_bytes = sum(
            x.size * x.dtype.itemsize for x in const_operands
        )
        io_bytes = 2 * sum(
            int(np.prod(s.block_shape)) * 4
            for s in in_specs[len(const_specs):]
        )
        resident = scratch_bytes + table_bytes + io_bytes
        limit = int(min(max(resident + resident // 2, 16 * 1024 * 1024),
                        120 * 1024 * 1024))
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        )(*const_operands, *operands)

    return call, plan, dtype, tb


# ---------------------------------------------------------------------------
# Wrappers (XLA side: external order <-> plane order, batch padding)
# ---------------------------------------------------------------------------


def _plane_order(side: NodeSide, x: jax.Array, fill):
    """[B, count] external-order values -> [B, rows, 128] plane order."""
    b = x.shape[0]
    rows = side.node_rows
    flat = jnp.full((b, rows * LANES), fill, x.dtype)
    flat = flat.at[:, jnp.asarray(side.plane_pos)].set(x)
    return flat.reshape(b, rows, LANES)


def _from_plane_order(side: NodeSide, planes: jax.Array):
    """[B, rows, 128] -> [B, count] external order."""
    b = planes.shape[0]
    return planes.reshape(b, -1)[:, jnp.asarray(side.plane_pos)]


def make_pallas_generic_decoder(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    dtype=jnp.float32,
    batch_tile: int = 8,
    interpret: bool = False,
    transport: str = "bf16x2",
) -> Callable[..., DecodeResult]:
    """Fused decode kernel for arbitrary sparse H. Same call signature as
    ops/decoders.make_decoder; float32 only. ``transport`` selects the
    in-VMEM message transport: "bf16x2" (default; two frames per f32 word
    through the regroup pipeline, bf16-rounded messages), "i8x4" (four
    frames per word, saturating 7-bit fixed-point messages — fastest;
    hardware-decoder-style quantized min-sum) or "f32" (full-precision
    transport). SPA always uses f32 transport."""
    if jnp.dtype(dtype) != jnp.float32:
        raise ValueError("pallas generic decoder is float32-only")
    call, plan, fdtype, tb = _build(
        matrix, algorithm, max_iterations, use_threshold, batch_tile,
        interpret, mode="decode", transport=transport,
    )

    def _impl(llr_ext, syndrome_ext, prim, sec, thr) -> DecodeResult:
        b = llr_ext.shape[0]
        pad = (-b) % tb
        llr = jnp.pad(
            llr_ext.astype(fdtype), ((0, pad), (0, 0)), constant_values=1.0
        )
        syn = jnp.pad(syndrome_ext.astype(jnp.int32), ((0, pad), (0, 0)))
        llr_p = _plane_order(plan.bits, llr, 1.0)
        syn_p = _plane_order(plan.checks, syn, 0)
        bp = b + pad
        dec_p, conv, iters = call(bp // tb, bp, llr_p, syn_p, prim, sec, thr)
        decision = _from_plane_order(plan.bits, dec_p).astype(jnp.int8)
        return DecodeResult(
            decision=decision[:b],
            syndromes_match=conv[:b, 0].astype(bool),
            iterations=iters[:b, 0],
        )

    jitted = [None]

    def decode(llr_ext, syndrome_ext, primary=1.0, secondary=1.0,
               threshold=0.0) -> DecodeResult:
        if is_traced(llr_ext, syndrome_ext, primary, secondary, threshold):
            return _impl(
                llr_ext, syndrome_ext,
                jnp.full((1, 1), primary, fdtype),
                jnp.full((1, 1), secondary, fdtype),
                jnp.full((1, 1), threshold, fdtype),
            )
        if jitted[0] is None:
            def run(llr_a, syn_a, vec):
                _, (prim, sec, thr) = unbundle(vec, 0, 3)
                return _impl(llr_a, syn_a, prim, sec, thr)
            jitted[0] = jax.jit(run)
        return jitted[0](
            llr_ext, syndrome_ext,
            scalar_bundle([], [primary, secondary, threshold]),
        )

    return decode


def make_pallas_generic_trial(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int = 8,
    interpret: bool = False,
    transport: str = "bf16x2",
) -> Callable:
    """Fused Monte-Carlo trial kernel: raw keys in, per-frame stats out."""
    call, plan, fdtype, tb = _build(
        matrix, algorithm, max_iterations, use_threshold, batch_tile,
        interpret, mode="trial", transport=transport,
    )

    def _impl(alice, bob, qb, prim, sec, thr):
        b = alice.shape[0]
        pad = (-b) % tb
        alice = jnp.pad(alice.astype(jnp.int32), ((0, pad), (0, 0)))
        bob = jnp.pad(bob.astype(jnp.int32), ((0, pad), (0, 0)))
        a_p = _plane_order(plan.bits, alice, 0)
        b_p = _plane_order(plan.bits, bob, 0)
        bp = b + pad
        # optimization_barrier pins the log's lowering context so every
        # engine's jit program produces the same scalar bits.
        log_p = jax.lax.optimization_barrier(jnp.log((1.0 - qb) / qb))
        conv, keys, iters = call(bp // tb, bp, a_p, b_p, log_p, prim, sec,
                                 thr)
        return (
            conv[:b, 0].astype(bool),
            keys[:b, 0].astype(bool),
            iters[:b, 0],
        )

    jitted = [None]

    def trial(alice, bob, qber, primary=1.0, secondary=1.0, threshold=0.0):
        if is_traced(alice, bob, qber, primary, secondary, threshold):
            return _impl(
                alice, bob,
                jnp.full((1, 1), qber, fdtype),
                jnp.full((1, 1), primary, fdtype),
                jnp.full((1, 1), secondary, fdtype),
                jnp.full((1, 1), threshold, fdtype),
            )
        if jitted[0] is None:
            def run(alice_a, bob_a, vec):
                _, (qb, prim, sec, thr) = unbundle(vec, 0, 4)
                return _impl(alice_a, bob_a, qb, prim, sec, thr)
            jitted[0] = jax.jit(run)
        return jitted[0](
            alice, bob,
            scalar_bundle([], [qber, primary, secondary, threshold]),
        )

    return trial


def make_pallas_generic_frame_trial(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int = 8,
    interpret: bool = False,
    transport: str = "bf16x2",
) -> Callable:
    """Fused trial kernel for prebuilt (rate-adapted) frames: the caller
    supplies the extended Alice frame and its LLRs; the kernel owns Alice's
    syndrome, the decode, and the key comparison."""
    call, plan, fdtype, tb = _build(
        matrix, algorithm, max_iterations, use_threshold, batch_tile,
        interpret, mode="frame", transport=transport,
    )

    def _impl(alice_frame, llr, prim, sec, thr):
        b = alice_frame.shape[0]
        pad = (-b) % tb
        alice_frame = jnp.pad(alice_frame.astype(jnp.int32), ((0, pad), (0, 0)))
        llr = jnp.pad(
            llr.astype(fdtype), ((0, pad), (0, 0)), constant_values=1.0
        )
        a_p = _plane_order(plan.bits, alice_frame, 0)
        llr_p = _plane_order(plan.bits, llr, 1.0)
        bp = b + pad
        conv, keys, iters = call(bp // tb, bp, a_p, llr_p, prim, sec, thr)
        return (
            conv[:b, 0].astype(bool),
            keys[:b, 0].astype(bool),
            iters[:b, 0],
        )

    jitted = [None]

    def trial(alice_frame, llr, primary=1.0, secondary=1.0, threshold=0.0):
        if is_traced(alice_frame, llr, primary, secondary, threshold):
            return _impl(
                alice_frame, llr,
                jnp.full((1, 1), primary, fdtype),
                jnp.full((1, 1), secondary, fdtype),
                jnp.full((1, 1), threshold, fdtype),
            )
        if jitted[0] is None:
            def run(af, llr_a, vec):
                _, (prim, sec, thr) = unbundle(vec, 0, 3)
                return _impl(af, llr_a, prim, sec, thr)
            jitted[0] = jax.jit(run)
        return jitted[0](
            alice_frame, llr,
            scalar_bundle([], [primary, secondary, threshold]),
        )

    return trial


def make_pallas_generic_montecarlo(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch: int,
    batch_tile: int = 8,
    interpret: bool = False,
    transport: str = "bf16x2",
) -> Callable:
    """Fully in-kernel Monte-Carlo trials for arbitrary H: hardware-PRNG
    keys, exact-count error subset, decode, stats — HBM traffic is three
    [B]-sized vectors per batch. TPU-only (the PRNG has no CPU interpret)."""
    call, plan, fdtype, tb = _build(
        matrix, algorithm, max_iterations, use_threshold, batch_tile,
        interpret, mode="mc", transport=transport,
    )
    pad = (-batch) % tb
    padded = batch + pad

    def _impl(sd, ne, qb, prim, sec, thr):
        # optimization_barrier pins the log's lowering context so every
        # engine's jit program produces the same scalar bits.
        log_p = jax.lax.optimization_barrier(jnp.log((1.0 - qb) / qb))
        conv, keys, iters = call(
            padded // tb, padded, sd, ne, log_p, prim, sec, thr
        )
        return (
            conv[:batch, 0].astype(bool),
            keys[:batch, 0].astype(bool),
            iters[:batch, 0],
        )

    jitted = [None]

    def mc(seed, num_errors, qber, primary=1.0, secondary=1.0, threshold=0.0):
        if is_traced(seed, num_errors, qber, primary, secondary, threshold):
            return _impl(
                jnp.full((1, 1), seed, jnp.int32),
                jnp.full((1, 1), num_errors, jnp.int32),
                jnp.full((1, 1), qber, fdtype),
                jnp.full((1, 1), primary, fdtype),
                jnp.full((1, 1), secondary, fdtype),
                jnp.full((1, 1), threshold, fdtype),
            )
        if jitted[0] is None:
            def run(vec):
                (sd, ne), (qb, prim, sec, thr) = unbundle(vec, 2, 4)
                return _impl(sd, ne, qb, prim, sec, thr)
            jitted[0] = jax.jit(run)
        return jitted[0](scalar_bundle(
            [seed, num_errors], [qber, primary, secondary, threshold]
        ))

    return mc
