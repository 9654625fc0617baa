"""Streaming (HBM-resident) Pallas decoder for frames beyond VMEM.

The fused generic kernel (ops/pallas_generic.py) holds a tile's entire
edge state in VMEM, which gates out the reference's largest production
suite (N = 102400, ~307k edges — docs/KERNEL.md §sizing). This decoder
keeps the edge state in HBM and streams VMEM-sized blocks through two
Pallas kernels per iteration, orchestrated by an XLA `lax.while_loop`:

  * kernel A (grid over check blocks): assemble the block's staged chunks,
    within-block permute P2_cm to check-major compute layout, decision-
    syndrome mismatch (early exit + the adaptive pair's per-check factor),
    min-sum check pass, within-block permute P1_bm into per-destination
    chunks, write staged_bm;
  * kernel B (grid over bit blocks): same dance in the other direction —
    P2_bm, bit pass (totals, decisions in the message LSB, key compare),
    P1_cm, write staged_cm.

The cross-block exchange is pure data layout: staged arrays are
[src_blocks, dst_blocks, frames, chunk_rows, 128] and each kernel's
BlockSpec reads a strided-but-rectangular slab (one row of chunks), so
the regroup costs exactly one write + one read of the edge state per
direction — the whole iteration is ~4 sequential HBM passes at DMA-
friendly chunk sizes (~100 KB). Block layouts and the per-block Clos
factorizations come from ops/stream_plan.py.

For the min-sum family, decisions ride the message mantissa LSB exactly
like the generic kernel's transport (per-half LSBs under bf16x2 packing);
pad slots carry direction-specific neutral values (min-neutral check-side
with zero LSBs, 0.0 bit-side) which the pad<->pad level of both
permutation levels preserves.

Algorithms: all six reference decoders
(src/qkd_ldpc_algorithm.cpp:3-1029). The min-sum family
(NMSA/OMSA/ANMSA/AOMSA) uses the packed bf16x2 transport by default; the
SPA pair (tanh-product / piecewise-linear approximation) needs the f32
mantissa in flight, so it forces f32 transport and carries its decisions
on a separate staged exchange (check-side pads are tanh-neutral: huge
positive -> tanh = 1). Early-exit and iteration-count semantics match the
reference: non-adaptive convergence is detected on the decisions of each
bit pass (evaluated at the next check block sweep), the adaptive pair
converges inside the check pass on the previous iteration's decisions
(one half-iteration early, :770-776).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

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
from qkd_ldpc_v_tpu.ops.stream_plan import LANES, stream_plan_for

# Check-side pad neutral: the largest finite f32 with an even mantissa —
# never the row minimum, sign +1, decision LSB 0.
_MINNEUT = np.int32(np.uint32(0x7F7FFFFE))
# bf16x2 packed transport (two frames per f32 word, mirroring
# ops/pallas_generic.py): per-half neutral = largest finite bf16 with an
# even mantissa (0x7F7E) in both halves.
_MINNEUT2 = np.int32(np.uint32(0x7F7E7F7E))
_MASK_HI = -65536  # 0xFFFF0000: high bf16 half
_MASK_HI_NOLSB = -131072  # 0xFFFE0000
# Mosaic's default scoped-VMEM limit is 16 MiB; on some committed codes the
# staged-exchange kernels' live set lands within rounding of it (measured
# 16.05 MiB on the round-3 alist 100k asset, 48 KiB over). The v5e core
# physically carries 128 MiB and 120 MiB of scratch is measured workable
# (scripts/probe_vmem.py), so each pallas_call requests a limit computed
# from its own block working set (floored at the round-3 measured-working
# 32 MiB, capped at the probed ceiling) — this is what admits batch tiles
# beyond 8 and block caps beyond 512.
_VMEM_LIMIT_FLOOR = 32 * 1024 * 1024
_VMEM_LIMIT_CAP = 120 * 1024 * 1024


def _vmem_params(in_specs_bytes, out_bytes, scratch_bytes):
    """CompilerParams with a vmem_limit_bytes request sized to the call:
    grid in/out blocks are double-buffered by Mosaic (x2), scratch is
    single-buffered, plus half again for compiler stack temporaries
    (mirrors ops/pallas_qc_stream.py's measured ~28%-of-resident rule)."""
    resident = 2 * (in_specs_bytes + out_bytes) + scratch_bytes
    limit = resident + resident // 2
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(
            min(max(limit, _VMEM_LIMIT_FLOOR), _VMEM_LIMIT_CAP)
        )
    )


def _stack(plans, attr):
    """Stack one per-block permute table over blocks, as int32.

    Round 4 tried narrowing these to int8 (every lane-gather index is
    < 128) to cut the tables' share of per-grid-step HBM traffic; on real
    hardware the int8 gather/select tables crash the TPU backend compiler
    outright (remote-compile helper exit 1 at every probed block size,
    round 5 — CPU interpret mode never sees it, exactly as ADVICE r04
    warned), while the same kernels with int32 tables compile and run.
    The tables stay int32."""
    arr = np.stack([getattr(p, attr) for p in plans])
    if arr.min() < 0:
        raise ValueError(f"negative permute index in {attr}")
    return jnp.asarray(arr.astype(np.int32))


def _dir_tables(d):
    """(p1 tables, p2 tables) stacked over blocks, each a 5-tuple."""
    names = ("idx_l1", "idx_c", "bsel", "idx_a", "idx_l2")
    return (
        tuple(_stack(d.p1, n) for n in names),
        tuple(_stack(d.p2, n) for n in names),
    )


def _table_specs(tabs):
    return [
        pl.BlockSpec(
            (1,) + t.shape[1:],
            partial(lambda k, nd: (k,) + (0,) * nd, nd=len(t.shape) - 1),
            memory_space=pltpu.VMEM,
        )
        for t in tabs
    ]


def stream_feasible(matrix: HMatrix) -> bool:
    """The streaming decoder serves codes the fused generic kernel cannot
    hold in VMEM; tiny codes (single block per side) gain nothing."""
    try:
        dmax_b = max(len(r) for r in matrix.bit_nodes)
        dmax_c = max(len(r) for r in matrix.check_nodes)
    except ValueError:
        return False
    return dmax_b * -(-matrix.num_bit_nodes // LANES) > 256 and dmax_c < 64


def _build(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int,
    interpret: bool,
    mode: str,  # "decode" | "trial"
    cap_rows: int = 512,
    transport: str = "bf16x2",  # "bf16x2" | "f32"
):
    if transport not in ("bf16x2", "f32"):
        raise ValueError(f"unknown transport {transport!r}")
    spa = algorithm in (DecodingAlgorithm.SPA, DecodingAlgorithm.SPA_APPROX)
    if spa:
        # SPA's tanh products need the mantissa (f32 transport, matching
        # the fused generic kernel), and its decisions ride a separate
        # staged exchange instead of message LSBs — the extra in-kernel
        # pass needs a smaller block cap to stay inside scoped VMEM.
        transport = "f32"
        cap_rows = min(cap_rows, 256)
    halves = 2 if transport == "bf16x2" else 1
    if algorithm == DecodingAlgorithm.SPA:
        tanh_fn = jnp.tanh
        # Mosaic has no atanh primitive: log identity, same as the fused
        # generic kernel (equality-tested against decoders.py's
        # jnp.arctanh).
        atanh_fn = lambda x: 0.5 * jnp.log((1.0 + x) / (1.0 - x))  # noqa: E731
        guard = True  # fast-precision atanh domain guard
    else:
        tanh_fn, atanh_fn = tanh_lin_approx, atanh_lin_approx
        guard = False
    if batch_tile % halves:
        raise ValueError(f"{transport} transport needs batch_tile % {halves}"
                         " == 0")
    plan = stream_plan_for(matrix, cap_rows)
    tb = batch_tile
    tp = tb // halves  # leading dim of packed edge-space buffers
    dtype = jnp.dtype(jnp.float32)
    big = jnp.finfo(dtype).max
    adaptive = algorithm.is_adaptive
    bits, checks = plan.bits, plan.checks
    kb_b, kb_c = bits.kb, checks.kb
    ch_bm, ch_cm = plan.to_bm.chunk_rows, plan.to_cm.chunk_rows

    # --- packed-transport helpers (bf16 is exactly f32's top half) -------

    def _i32(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def _f32(x):
        return jax.lax.bitcast_convert_type(x, dtype)

    def hrows(h):
        """Frame-row slice of transport half h in per-frame [tb, ...] data."""
        return slice(h * tp, (h + 1) * tp)

    def unpack(w, h):
        """Transport half h of packed word w, as f32 (identity at f32)."""
        if halves == 1:
            return w
        wi = _i32(w)
        return _f32((wi & _MASK_HI) if h == 0 else (wi << 16))

    def lsb(w, h):
        """Decision bit of transport half h (int32 0/1)."""
        wi = _i32(w)
        if halves == 1:
            return wi & 1
        return ((wi >> 16) & 1) if h == 0 else (wi & 1)

    def pack(vals):
        """Per-half f32 slabs -> packed word (identity at f32 — check-side
        LSBs are never read, so no ulp is spent zeroing them)."""
        if halves == 1:
            return vals[0]
        return _f32(
            (_i32(vals[0]) & _MASK_HI) | ((_i32(vals[1]) >> 16) & 0xFFFE)
        )

    def pack_dec(vals, decs):
        """pack() with each half's decision bit in its LSB."""
        if halves == 1:
            return _f32((_i32(vals[0]) & ~1) | decs[0])
        w = (_i32(vals[0]) & _MASK_HI_NOLSB) | (decs[0] << 16)
        w = w | ((_i32(vals[1]) >> 16) & 0xFFFE) | decs[1]
        return _f32(w)

    NEUT = _MINNEUT if halves == 1 else _MINNEUT2

    bm_p1_t, bm_p2_t = _dir_tables(plan.to_bm)
    cm_p1_t, cm_p2_t = _dir_tables(plan.to_cm)
    deg_b = jnp.asarray(bits.deg)
    deg_c = jnp.asarray(checks.deg)

    r_a = max(plan.to_cm.r2, plan.to_bm.r1)  # kernel A scratch rows
    r_b = max(plan.to_bm.r2, plan.to_cm.r1)  # kernel B scratch rows

    def _neut_fill(buf, lo, hi, word):
        if hi > lo:
            buf[:, lo:hi, :] = jax.lax.bitcast_convert_type(
                jnp.full((tp, hi - lo, LANES), word, jnp.int32), dtype
            )

    def permute(tabs, a, b, r):
        """Seven-stage in-VMEM Clos pipeline on rows [0, r) of a/b (2-buffer
        ping-pong; result lands in b, a is clobbered)."""
        idx_l1, idx_c, bsel, idx_a, idx_l2 = (
            tabs[0][0].astype(jnp.int32),
            tabs[1][0].astype(jnp.int32),
            tabs[2],
            tabs[3][0].astype(jnp.int32),
            tabs[4][0].astype(jnp.int32),
        )
        tn = r // LANES

        def lane_gather(src, dst, idx):
            for t in range(tp):
                dst[t, 0:r, :] = jnp.take_along_axis(
                    src[t, 0:r, :], idx, axis=1
                )

        def tile_transpose(src, dst):
            for t2 in range(tn):
                dst[:, t2 * LANES:(t2 + 1) * LANES, :] = jnp.swapaxes(
                    src[:, t2 * LANES:(t2 + 1) * LANES, :], 1, 2
                )

        lane_gather(a, b, idx_l1)
        tile_transpose(b, a)
        lane_gather(a, b, idx_c)
        for t2 in range(tn):  # tile select b -> a
            sel = bsel[0, t2]
            acc = b[:, 0:LANES, :]
            for t1 in range(1, tn):
                acc = jnp.where(
                    (sel == t1)[None],
                    b[:, t1 * LANES:(t1 + 1) * LANES, :],
                    acc,
                )
            a[:, t2 * LANES:(t2 + 1) * LANES, :] = acc
        lane_gather(a, b, idx_a)
        tile_transpose(b, a)
        lane_gather(a, b, idx_l2)

    def clamp(x, threshold):
        if use_threshold:
            return jnp.clip(x, -threshold, threshold)
        return x

    # ------------------------------------------------------------------
    # Kernel A: check pass over one check block
    # ------------------------------------------------------------------

    def kernel_a(*args):
        (p2_tabs, p1_tabs) = (args[0:5], args[5:10])
        if spa:
            (staged_in, dstage_in, syn_ref, deg_ref, prim_ref, sec_ref,
             thr_ref) = args[10:17]
            out_ref, mism_ref, x0, x1 = args[17:21]
        else:
            staged_in, syn_ref, deg_ref, prim_ref, sec_ref, thr_ref = \
                args[10:16]
            out_ref, mism_ref, x0, x1 = args[16:20]
        primary = prim_ref[0, 0]
        secondary = sec_ref[0, 0]
        threshold = thr_ref[0, 0]
        l_c, dmax = checks.l_blk, checks.dmax

        def slab(s):
            return x1[:, s * l_c:(s + 1) * l_c, :]

        if spa:
            # Decision plane first (its own staged exchange): syndrome
            # mismatch totals, then the buffers are free for messages.
            for s in range(kb_b):
                x0[:, s * ch_cm:(s + 1) * ch_cm, :] = dstage_in[s, 0]
            if kb_b * ch_cm < r_a:
                x0[:, kb_b * ch_cm:r_a, :] = jnp.zeros(
                    (tp, r_a - kb_b * ch_cm, LANES), dtype
                )
            permute(p2_tabs, x0, x1, plan.to_cm.r2)
            par = None
            for s in range(dmax):
                b = (slab(s) > 0.5).astype(jnp.int32)
                par = b if par is None else par ^ b
            mism_ref[0] = jnp.sum(
                jnp.sum(par ^ syn_ref[0].astype(jnp.int32), axis=2,
                        keepdims=True), axis=1
            )

        # Assemble staged chunks (src bit blocks) into P2_cm's input space.
        for s in range(kb_b):
            x0[:, s * ch_cm:(s + 1) * ch_cm, :] = staged_in[s, 0]
        _neut_fill(x0, kb_b * ch_cm, r_a, NEUT)
        permute(p2_tabs, x0, x1, plan.to_cm.r2)
        if plan.to_cm.r2 < r_a:
            _neut_fill(x1, plan.to_cm.r2, r_a, NEUT)

        if spa:
            # Tanh-product check pass (reference :55-71). Pad slots hold
            # NEUT (huge positive) -> tanh = 1.0, product-neutral.
            ss = jnp.where(syn_ref[0] == 1, -1.0, 1.0).astype(dtype)
            ts = [tanh_fn(slab(s) * 0.5) for s in range(dmax)]
            prod = ss
            for t in ts:
                prod = prod * t
            deg = deg_ref[0][None]
            for s in range(dmax):
                ratio = prod / ts[s]
                if guard:
                    ratio = guard_atanh_ratio(ratio, dtype)
                val = clamp((2.0 * atanh_fn(ratio)).astype(dtype), threshold)
                # bit-side pad slots must arrive sum-neutral
                x0[:, s * l_c:(s + 1) * l_c, :] = jnp.where(s < deg, val, 0.0)
            if checks.rows_blk < plan.to_bm.r1:
                x0[:, checks.rows_blk:plan.to_bm.r1, :] = jnp.zeros(
                    (tp, plan.to_bm.r1 - checks.rows_blk, LANES), dtype
                )
            permute(p1_tabs, x0, x1, plan.to_bm.r1)
            for d in range(kb_b):
                out_ref[0, d] = x1[:, d * ch_bm:(d + 1) * ch_bm, :]
            return

        words = [slab(s) for s in range(dmax)]
        out_vals = []  # per half: per-slot new check->bit messages
        for h in range(halves):
            # Decision syndrome from the per-half message LSBs (pad slots
            # have LSB 0).
            syn_h = syn_ref[0][hrows(h)].astype(jnp.int32)
            par = None
            for w in words:
                b = lsb(w, h)
                par = b if par is None else par ^ b
            mism = par ^ syn_h
            mism_ref[0, hrows(h)] = jnp.sum(
                jnp.sum(mism, axis=2, keepdims=True), axis=1
            )

            msgs = [unpack(w, h) for w in words]
            ss = jnp.where(syn_h == 1, -1.0, 1.0).astype(dtype)
            a_ = [jnp.abs(m) for m in msgs]
            min1 = a_[0]
            min2 = jnp.full_like(min1, big)
            for ai in a_[1:]:
                min2 = jnp.minimum(min2, jnp.maximum(min1, ai))
                min1 = jnp.minimum(min1, ai)
            neg = None
            for m in msgs:
                b = (m < 0).astype(jnp.int32)
                neg = b if neg is None else neg + b
            row_sign = ss * jnp.where(neg % 2 == 0, 1.0, -1.0).astype(dtype)
            if adaptive:
                f = jnp.where(mism != 0, secondary, primary).astype(dtype)
            else:
                f = primary
            vals = []
            for s in range(dmax):
                m, ai = msgs[s], a_[s]
                excl = jnp.where(m > 0, 1.0, -1.0).astype(dtype)
                eabs = jnp.where(ai == min1, min2, min1)
                if algorithm in (DecodingAlgorithm.NMSA,
                                 DecodingAlgorithm.ANMSA):
                    val = f * row_sign * excl * eabs
                else:  # OMSA / AOMSA: offset, clamp at zero
                    val = row_sign * excl * jnp.maximum(eabs - f, 0.0)
                vals.append(clamp(val.astype(dtype), threshold))
            out_vals.append(vals)
        deg = deg_ref[0][None]
        for s in range(dmax):
            w = pack([out_vals[h][s] for h in range(halves)])
            # bit-side pad slots must arrive sum-neutral (0.0 both halves)
            x0[:, s * l_c:(s + 1) * l_c, :] = jnp.where(s < deg, w, 0.0)
        if checks.rows_blk < plan.to_bm.r1:
            x0[:, checks.rows_blk:plan.to_bm.r1, :] = jnp.zeros(
                (tp, plan.to_bm.r1 - checks.rows_blk, LANES), dtype
            )
        permute(p1_tabs, x0, x1, plan.to_bm.r1)
        for d in range(kb_b):
            out_ref[0, d] = x1[:, d * ch_bm:(d + 1) * ch_bm, :]

    # ------------------------------------------------------------------
    # Kernel B: bit pass over one bit block
    # ------------------------------------------------------------------

    def kernel_b(*args):
        (p2_tabs, p1_tabs) = (args[0:5], args[5:10])
        staged_in, llr_ref, deg_ref, alice_ref, prim_ref, sec_ref, thr_ref \
            = args[10:17]
        rest = args[17:]
        dout_ref = None
        if mode == "decode":
            if spa:
                out_ref, dout_ref, km_ref, dec_ref, x0, x1 = rest
            else:
                out_ref, km_ref, dec_ref, x0, x1 = rest
        else:
            if spa:
                out_ref, dout_ref, km_ref, x0, x1 = rest
            else:
                out_ref, km_ref, x0, x1 = rest
        threshold = thr_ref[0, 0]
        l_b, dmax = bits.l_blk, bits.dmax

        for s in range(kb_c):
            x0[:, s * ch_bm:(s + 1) * ch_bm, :] = staged_in[s, 0]
        if kb_c * ch_bm < r_b:
            x0[:, kb_c * ch_bm:r_b, :] = jnp.zeros(
                (tp, r_b - kb_c * ch_bm, LANES), dtype
            )
        permute(p2_tabs, x0, x1, plan.to_bm.r2)

        def slab(s):
            return x1[:, s * l_b:(s + 1) * l_b, :]

        words = [slab(s) for s in range(dmax)]
        valid = (deg_ref[0] > 0).astype(jnp.int32)[None]
        out_per_half = []
        dec_per_half = []
        for h in range(halves):
            es = [unpack(w, h) for w in words]
            total = llr_ref[0][hrows(h)]
            for e in es:
                total = total + e
            dec = (total <= 0).astype(jnp.int32)
            dec_per_half.append(dec)
            if mode == "decode":
                dec_ref[0, hrows(h)] = dec.astype(jnp.int8)
            else:
                diff = (dec != alice_ref[0][hrows(h)].astype(jnp.int32)) \
                    .astype(jnp.int32) * valid
                km_ref[0, hrows(h)] = jnp.sum(
                    jnp.sum(diff, axis=2, keepdims=True), axis=1
                )
            out_per_half.append(
                [clamp(total - es[s], threshold) for s in range(dmax)]
            )
        if mode == "decode":
            km_ref[0] = jnp.zeros((tb, 1), jnp.int32)
        deg = deg_ref[0][None]
        neutw = jax.lax.bitcast_convert_type(
            jnp.full((tp, l_b, LANES), NEUT, jnp.int32), dtype
        )
        for s in range(dmax):
            if spa:  # SPA messages keep their exact LSBs
                w = out_per_half[0][s]
            else:
                w = pack_dec(
                    [out_per_half[h][s] for h in range(halves)], dec_per_half
                )
            x0[:, s * l_b:(s + 1) * l_b, :] = jnp.where(s < deg, w, neutw)
        if bits.rows_blk < plan.to_cm.r1:
            _neut_fill(x0, bits.rows_blk, plan.to_cm.r1, NEUT)
        permute(p1_tabs, x0, x1, plan.to_cm.r1)
        for d in range(kb_c):
            out_ref[0, d] = x1[:, d * ch_cm:(d + 1) * ch_cm, :]
        if spa:
            # Decisions ride their own staged exchange (0.0 / 1.0 values).
            dv = dec_per_half[0].astype(dtype)
            for s in range(dmax):
                x0[:, s * l_b:(s + 1) * l_b, :] = jnp.where(
                    s < deg, dv, 0.0
                )
            if bits.rows_blk < plan.to_cm.r1:
                x0[:, bits.rows_blk:plan.to_cm.r1, :] = jnp.zeros(
                    (tp, plan.to_cm.r1 - bits.rows_blk, LANES), dtype
                )
            permute(p1_tabs, x0, x1, plan.to_cm.r1)
            for d in range(kb_c):
                dout_ref[0, d] = x1[:, d * ch_cm:(d + 1) * ch_cm, :]

    # ------------------------------------------------------------------
    # Kernel I: initial staging over one bit block (messages + parity)
    # ------------------------------------------------------------------

    def kernel_i(*args):
        (p1_tabs,) = (args[0:5],)
        llr_ref, deg_ref, alice_ref = args[5:8]
        rest = args[8:]
        dout_ref = None
        if mode == "trial":
            if spa:
                out_ref, dout_ref, par_ref, x0, x1 = rest
            else:
                out_ref, par_ref, x0, x1 = rest
        else:
            if spa:
                out_ref, dout_ref, x0, x1 = rest
            else:
                out_ref, x0, x1 = rest
        l_b, dmax = bits.l_blk, bits.dmax
        llrs = [llr_ref[0][hrows(h)] for h in range(halves)]
        decs = [(llr <= 0).astype(jnp.int32) for llr in llrs]
        w0 = llrs[0] if spa else pack_dec(llrs, decs)
        deg = deg_ref[0][None]
        neutw = jax.lax.bitcast_convert_type(
            jnp.full((tp, l_b, LANES), NEUT, jnp.int32), dtype
        )
        for s in range(dmax):
            x0[:, s * l_b:(s + 1) * l_b, :] = jnp.where(s < deg, w0, neutw)
        if bits.rows_blk < plan.to_cm.r1:
            _neut_fill(x0, bits.rows_blk, plan.to_cm.r1, NEUT)
        permute(p1_tabs, x0, x1, plan.to_cm.r1)
        for d in range(kb_c):
            out_ref[0, d] = x1[:, d * ch_cm:(d + 1) * ch_cm, :]
        if spa:
            # Initial decision plane (channel LLR signs) staged separately.
            dv = decs[0].astype(dtype)
            for s in range(dmax):
                x0[:, s * l_b:(s + 1) * l_b, :] = jnp.where(
                    s < deg, dv, 0.0
                )
            if bits.rows_blk < plan.to_cm.r1:
                x0[:, bits.rows_blk:plan.to_cm.r1, :] = jnp.zeros(
                    (tp, plan.to_cm.r1 - bits.rows_blk, LANES), dtype
                )
            permute(p1_tabs, x0, x1, plan.to_cm.r1)
            for d in range(kb_c):
                dout_ref[0, d] = x1[:, d * ch_cm:(d + 1) * ch_cm, :]
        if mode == "trial":
            # Alice bits as exact small f32s (0.0 / 1.0 are exact in bf16).
            av = pack([
                alice_ref[0][hrows(h)].astype(dtype) for h in range(halves)
            ])
            for s in range(dmax):
                x0[:, s * l_b:(s + 1) * l_b, :] = jnp.where(
                    s < deg, av, 0.0
                )
            if bits.rows_blk < plan.to_cm.r1:
                x0[:, bits.rows_blk:plan.to_cm.r1, :] = jnp.zeros(
                    (tp, plan.to_cm.r1 - bits.rows_blk, LANES), dtype
                )
            permute(p1_tabs, x0, x1, plan.to_cm.r1)
            for d in range(kb_c):
                par_ref[0, d] = x1[:, d * ch_cm:(d + 1) * ch_cm, :]

    # ------------------------------------------------------------------
    # Kernel S: Alice syndrome over one check block (trial mode)
    # ------------------------------------------------------------------

    def kernel_s(*args):
        (p2_tabs,) = (args[0:5],)
        staged_in = args[5]
        syn_ref, x0, x1 = args[6:9]
        l_c, dmax = checks.l_blk, checks.dmax
        for s in range(kb_b):
            x0[:, s * ch_cm:(s + 1) * ch_cm, :] = staged_in[s, 0]
        if kb_b * ch_cm < r_a:
            x0[:, kb_b * ch_cm:r_a, :] = jnp.zeros(
                (tp, r_a - kb_b * ch_cm, LANES), dtype
            )
        permute(p2_tabs, x0, x1, plan.to_cm.r2)
        for h in range(halves):
            par = None
            for s in range(dmax):
                b = (
                    unpack(x1[:, s * l_c:(s + 1) * l_c, :], h) > 0.5
                ).astype(jnp.int32)
                par = b if par is None else par ^ b
            syn_ref[0, hrows(h)] = par.astype(jnp.int8)

    # ------------------------------------------------------------------
    # pallas_call plumbing
    # ------------------------------------------------------------------

    scalar_spec = pl.BlockSpec((1, 1), lambda k: (0, 0),
                               memory_space=pltpu.SMEM)

    def staged_shape(kb_src, kb_dst, chunk):
        return (kb_src, kb_dst, tp, chunk, LANES)

    def staged_in_spec(kb_src, kb_dst, chunk):
        return pl.BlockSpec(
            (kb_src, 1, tp, chunk, LANES), lambda k: (0, k, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def staged_out_spec(kb_src, kb_dst, chunk):
        return pl.BlockSpec(
            (1, kb_dst, tp, chunk, LANES), lambda k: (k, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def plane_spec(l_blk):
        return pl.BlockSpec(
            (1, tb, l_blk, LANES), lambda k: (k, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def degplane_spec(l_blk):
        return pl.BlockSpec(
            (1, l_blk, LANES), lambda k: (k, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def col_out_spec():
        return pl.BlockSpec(
            (1, tb, 1), lambda k: (k, 0, 0), memory_space=pltpu.VMEM
        )

    f32 = jnp.float32

    def scratch(rows):
        return pltpu.VMEM((tp, rows, LANES), dtype)

    # Per-call VMEM working-set bytes for the computed vmem_limit_bytes
    # request (one grid step's blocks; Mosaic double-buffers in/out).
    def _tab_bytes(*tab_tuples):
        # Per-grid-step block = one row of each int8 table ((1,) + shape[1:]).
        return sum(
            int(np.prod(t.shape[1:])) * t.dtype.itemsize
            for tabs in tab_tuples for t in tabs
        )

    _staged_blk = tp * LANES * 4  # f32 staged words per chunk row
    _plane_b_f32 = tb * bits.l_blk * LANES * 4   # llr planes
    _plane_b_i8 = tb * bits.l_blk * LANES        # alice / decision planes
    _plane_c_i8 = tb * checks.l_blk * LANES      # syndrome planes
    _deg_b = bits.l_blk * LANES * 4
    _deg_c = checks.l_blk * LANES * 4

    call_a = pl.pallas_call(
        kernel_a,
        grid=(kb_c,),
        in_specs=(
            _table_specs(cm_p2_t) + _table_specs(bm_p1_t)
            + [staged_in_spec(kb_b, kb_c, ch_cm)]
            + ([staged_in_spec(kb_b, kb_c, ch_cm)] if spa else [])  # dstage
            + [
                plane_spec(checks.l_blk),  # syndrome planes (int32)
                degplane_spec(checks.l_blk),
                scalar_spec, scalar_spec, scalar_spec,
            ]
        ),
        out_specs=(
            staged_out_spec(kb_c, kb_b, ch_bm),
            col_out_spec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(staged_shape(kb_c, kb_b, ch_bm), f32),
            jax.ShapeDtypeStruct((kb_c, tb, 1), jnp.int32),
        ),
        scratch_shapes=[scratch(r_a), scratch(r_a)],
        interpret=interpret,
        compiler_params=_vmem_params(
            _tab_bytes(cm_p2_t, bm_p1_t)
            + kb_b * ch_cm * _staged_blk * (2 if spa else 1)
            + _plane_c_i8 + _deg_c,
            kb_b * ch_bm * _staged_blk + tb * 4,
            2 * tp * r_a * LANES * 4,
        ),
    )

    b_in = (
        _table_specs(bm_p2_t) + _table_specs(cm_p1_t)
        + [
            staged_in_spec(kb_c, kb_b, ch_bm),
            plane_spec(bits.l_blk),  # llr planes
            degplane_spec(bits.l_blk),
            plane_spec(bits.l_blk),  # alice planes (dummy in decode mode)
            scalar_spec, scalar_spec, scalar_spec,
        ]
    )
    b_out_specs = [staged_out_spec(kb_b, kb_c, ch_cm)]
    b_out_shape = [jax.ShapeDtypeStruct(staged_shape(kb_b, kb_c, ch_cm), f32)]
    if spa:  # decision-plane staged exchange
        b_out_specs.append(staged_out_spec(kb_b, kb_c, ch_cm))
        b_out_shape.append(
            jax.ShapeDtypeStruct(staged_shape(kb_b, kb_c, ch_cm), f32)
        )
    b_out_specs.append(col_out_spec())
    b_out_shape.append(jax.ShapeDtypeStruct((kb_b, tb, 1), jnp.int32))
    if mode == "decode":
        b_out_specs.append(plane_spec(bits.l_blk))
        b_out_shape.append(
            jax.ShapeDtypeStruct((kb_b, tb, bits.l_blk, LANES), jnp.int8)
        )
    call_b = pl.pallas_call(
        kernel_b,
        grid=(kb_b,),
        in_specs=b_in,
        out_specs=tuple(b_out_specs),
        out_shape=tuple(b_out_shape),
        scratch_shapes=[scratch(r_b), scratch(r_b)],
        interpret=interpret,
        compiler_params=_vmem_params(
            _tab_bytes(bm_p2_t, cm_p1_t)
            + kb_c * ch_bm * _staged_blk
            + _plane_b_f32 + _deg_b + _plane_b_i8,
            kb_c * ch_cm * _staged_blk * (2 if spa else 1) + tb * 4
            + (_plane_b_i8 if mode == "decode" else 0),
            2 * tp * r_b * LANES * 4,
        ),
    )

    i_out_specs = [staged_out_spec(kb_b, kb_c, ch_cm)]
    i_out_shape = [jax.ShapeDtypeStruct(staged_shape(kb_b, kb_c, ch_cm), f32)]
    if spa:  # initial decision plane
        i_out_specs.append(staged_out_spec(kb_b, kb_c, ch_cm))
        i_out_shape.append(
            jax.ShapeDtypeStruct(staged_shape(kb_b, kb_c, ch_cm), f32)
        )
    if mode == "trial":
        i_out_specs.append(staged_out_spec(kb_b, kb_c, ch_cm))
        i_out_shape.append(
            jax.ShapeDtypeStruct(staged_shape(kb_b, kb_c, ch_cm), f32)
        )
    call_i = pl.pallas_call(
        kernel_i,
        grid=(kb_b,),
        in_specs=(
            _table_specs(cm_p1_t)
            + [plane_spec(bits.l_blk), degplane_spec(bits.l_blk),
               plane_spec(bits.l_blk)]
        ),
        out_specs=tuple(i_out_specs),
        out_shape=tuple(i_out_shape),
        scratch_shapes=[scratch(plan.to_cm.r1), scratch(plan.to_cm.r1)],
        interpret=interpret,
        compiler_params=_vmem_params(
            _tab_bytes(cm_p1_t) + _plane_b_f32 + _deg_b + _plane_b_i8,
            kb_c * ch_cm * _staged_blk
            * (1 + int(spa) + int(mode == "trial")),
            2 * tp * plan.to_cm.r1 * LANES * 4,
        ),
    )

    call_s = pl.pallas_call(
        kernel_s,
        grid=(kb_c,),
        in_specs=(
            _table_specs(cm_p2_t) + [staged_in_spec(kb_b, kb_c, ch_cm)]
        ),
        out_specs=(plane_spec(checks.l_blk),),
        out_shape=(
            jax.ShapeDtypeStruct((kb_c, tb, checks.l_blk, LANES), jnp.int8),
        ),
        scratch_shapes=[scratch(r_a), scratch(r_a)],
        interpret=interpret,
        compiler_params=_vmem_params(
            _tab_bytes(cm_p2_t) + kb_b * ch_cm * _staged_blk,
            _plane_c_i8,
            2 * tp * r_a * LANES * 4,
        ),
    )

    # constant operand values
    cm_p2_v = tuple(jnp.asarray(t) for t in cm_p2_t)
    cm_p1_v = tuple(jnp.asarray(t) for t in cm_p1_t)
    bm_p2_v = tuple(jnp.asarray(t) for t in bm_p2_t)
    bm_p1_v = tuple(jnp.asarray(t) for t in bm_p1_t)

    def to_planes(x, side, fill):
        """[tb, count] -> [kb, tb, l_blk, 128] blocked node planes."""
        width = side.kb * side.l_blk * LANES
        x = jnp.pad(x, ((0, 0), (0, width - x.shape[1])),
                    constant_values=fill)
        x = x.reshape(tb, side.kb, side.l_blk, LANES)
        return jnp.swapaxes(x, 0, 1)

    def from_planes(p, side):
        x = jnp.swapaxes(p, 0, 1).reshape(tb, -1)
        return x[:, :side.count]

    def step(llr_planes, alice_planes, syn_planes, prim, sec, thr):
        """Full decode of one tb-frame group. Returns (conv, km_frozen,
        iters, dec_planes or None)."""
        outs_i = call_i(*cm_p1_v, llr_planes, deg_b, alice_planes)
        dstage = None
        if mode == "trial":
            if spa:
                staged, dstage, par = outs_i
            else:
                staged, par = outs_i
            (syn_planes,) = call_s(*cm_p2_v, par)
        else:
            if spa:
                staged, dstage = outs_i
            else:
                (staged,) = outs_i

        cap1 = max_iterations + (0 if adaptive else 1)

        # Initial decisions (channel LLR signs, reference :685-688) feed the
        # adaptive pair's converge-at-iteration-1 path. int8 to match the
        # kernel's narrow decision planes (the while-loop carry dtype).
        dec_init = (llr_planes <= 0).astype(jnp.int8)
        valid_b = (deg_b > 0).astype(jnp.int32)[:, None, :, :]
        diff0 = (dec_init != alice_planes).astype(jnp.int32) * valid_b
        km_init = (
            jnp.sum(diff0, axis=(0, 2, 3))[:, None] == 0
        ).astype(jnp.int32)

        def body(carry):
            if spa:
                (staged, dstage, conv, iters, kmf, km_prev, decf, dec_prev,
                 a_idx) = carry
                stagedbm, mism = call_a(
                    *cm_p2_v, *bm_p1_v, staged, dstage, syn_planes, deg_c,
                    prim, sec, thr,
                )
            else:
                dstage = None
                (staged, conv, iters, kmf, km_prev, decf, dec_prev,
                 a_idx) = carry
                stagedbm, mism = call_a(
                    *cm_p2_v, *bm_p1_v, staged, syn_planes, deg_c,
                    prim, sec, thr,
                )
            total = jnp.sum(mism, axis=0)  # [tb, 1]
            ok = (total == 0).astype(jnp.int32)
            if not adaptive:
                # The reference never tests the initial decisions for the
                # non-adaptive family (first check is after bit pass 1).
                ok = ok * (a_idx > 1).astype(jnp.int32)
                it_val = a_idx - 1
            else:
                it_val = a_idx
            newly = ok * (1 - conv)
            iters = jnp.where(newly != 0, it_val, iters)
            kmf = jnp.where(newly != 0, km_prev, kmf)
            conv = jnp.maximum(conv, ok)
            if mode == "decode":
                sel = (newly != 0)[None, :, :, None]
                decf = jnp.where(sel, dec_prev, decf)

            def bit_pass(ops):
                stagedbm_, staged_, dstage_, km_prev_, dec_prev_ = ops
                outs_b = call_b(
                    *bm_p2_v, *cm_p1_v, stagedbm_, llr_planes, deg_b,
                    alice_planes, prim, sec, thr,
                )
                dstage_n = dstage_
                dec_prev_n = dec_prev_
                if mode == "decode":
                    if spa:
                        staged_n, dstage_n, km_parts, dec_prev_n = outs_b
                    else:
                        staged_n, km_parts, dec_prev_n = outs_b
                else:
                    if spa:
                        staged_n, dstage_n, km_parts = outs_b
                    else:
                        staged_n, km_parts = outs_b
                km_prev_n = (jnp.sum(km_parts, axis=0) == 0).astype(jnp.int32)
                return staged_n, dstage_n, km_prev_n, dec_prev_n

            ops = (stagedbm, staged, dstage, km_prev, dec_prev)
            if adaptive:
                staged, dstage, km_prev, dec_prev = bit_pass(ops)
            else:
                # The non-adaptive loop's final pass (a_idx == cap1 ==
                # max_iterations + 1) exists only to *check* the decisions
                # of bit pass ``max_iterations``; running kernel B there
                # would hand unconverged frames decisions from a
                # never-checked extra iteration (diverging from the XLA
                # decoder) and waste one HBM pass. Skip it.
                staged, dstage, km_prev, dec_prev = jax.lax.cond(
                    a_idx <= max_iterations,
                    bit_pass,
                    lambda o: (o[1], o[2], o[3], o[4]),
                    ops,
                )
            out = (staged, conv, iters, kmf, km_prev, decf, dec_prev,
                   a_idx + 1)
            return (out[:1] + (dstage,) + out[1:]) if spa else out

        def cond(carry):
            conv = carry[2] if spa else carry[1]
            a_idx = carry[-1]
            return (a_idx <= cap1) & ~jnp.all(conv != 0)

        conv0 = jnp.zeros((tb, 1), jnp.int32)
        iters0 = jnp.full((tb, 1), max_iterations, jnp.int32)
        km0 = jnp.zeros((tb, 1), jnp.int32)
        init = (staged, conv0, iters0, km0, km_init, dec_init, dec_init,
                jnp.int32(1))
        if spa:
            init = init[:1] + (dstage,) + init[1:]
        final = jax.lax.while_loop(cond, body, init)
        if spa:
            final = final[:1] + final[2:]
        staged, conv, iters, kmf, km_prev, decf, dec_prev, _ = final
        # Converged frames report their frozen decision; unconverged ones
        # the last bit pass's (reference returns the final decision).
        dec_out = jnp.where((conv != 0)[None, :, :, None], decf, dec_prev)
        return conv, kmf, iters, dec_out

    return (step, plan, tb, to_planes, from_planes, dtype)


def make_pallas_stream_trial(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int = 8,
    interpret: bool = False,
    cap_rows: int = 512,
    transport: str = "bf16x2",
) -> Callable:
    """Streaming Monte-Carlo trial kernel for giant frames: raw keys in,
    per-frame (syndromes_match, keys_match, iterations) out."""
    step, plan, tb, to_planes, _, dtype = _build(
        matrix, algorithm, max_iterations, use_threshold, batch_tile,
        interpret, mode="trial", cap_rows=cap_rows, transport=transport,
    )

    def _impl(alice, bob, qb, prim, sec, thr):
        b = alice.shape[0]
        pad = (-b) % tb
        alice = jnp.pad(alice.astype(jnp.int8), ((0, pad), (0, 0)))
        bob = jnp.pad(bob.astype(jnp.int8), ((0, pad), (0, 0)))
        log_p = jnp.log((1.0 - qb[0, 0]) / qb[0, 0]).astype(dtype)
        groups = (b + pad) // tb

        def run_group(args):
            a_g, b_g = args
            llr = jnp.where(b_g == 1, -log_p, log_p).astype(dtype)
            llr_p = to_planes(llr, plan.bits, 1.0)
            a_p = to_planes(a_g, plan.bits, 0)
            conv, km, iters, _ = step(llr_p, a_p, None, prim, sec, thr)
            return conv[:, 0], km[:, 0], iters[:, 0]

        conv, km, iters = jax.lax.map(
            run_group,
            (
                alice.reshape(groups, tb, -1),
                bob.reshape(groups, tb, -1),
            ),
        )
        return (
            conv.reshape(-1)[:b].astype(bool),
            km.reshape(-1)[:b].astype(bool),
            iters.reshape(-1)[:b],
        )

    jitted = [None]

    def trial(alice, bob, qber, primary=1.0, secondary=1.0, threshold=0.0):
        if is_traced(alice, bob, qber, primary, secondary, threshold):
            return _impl(
                alice, bob,
                jnp.full((1, 1), qber, dtype),
                jnp.full((1, 1), primary, dtype),
                jnp.full((1, 1), secondary, dtype),
                jnp.full((1, 1), threshold, dtype),
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


def make_pallas_stream_decoder(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    dtype=jnp.float32,
    batch_tile: int = 8,
    interpret: bool = False,
    cap_rows: int = 512,
    transport: str = "bf16x2",
) -> Callable[..., DecodeResult]:
    """Streaming decode kernel (library API): LLRs + syndrome in,
    decisions out. Same signature as make_decoder; float32 only."""
    if jnp.dtype(dtype) != jnp.float32:
        raise ValueError("streaming decoder is float32-only")
    step, plan, tb, to_planes, from_planes, fdtype = _build(
        matrix, algorithm, max_iterations, use_threshold, batch_tile,
        interpret, mode="decode", cap_rows=cap_rows, transport=transport,
    )

    def _impl(llr_ext, syndrome_ext, prim, sec, thr) -> DecodeResult:
        b = llr_ext.shape[0]
        pad = (-b) % tb
        llr = jnp.pad(llr_ext.astype(fdtype), ((0, pad), (0, 0)),
                      constant_values=1.0)
        syn = jnp.pad(syndrome_ext.astype(jnp.int8), ((0, pad), (0, 0)))
        groups = (b + pad) // tb

        def run_group(args):
            llr_g, syn_g = args
            llr_p = to_planes(llr_g, plan.bits, 1.0)
            syn_p = to_planes(syn_g, plan.checks, 0)
            dummy_alice = jnp.zeros_like(llr_p, jnp.int8)
            conv, _, iters, dec_p = step(
                llr_p, dummy_alice, syn_p, prim, sec, thr
            )
            return conv[:, 0], iters[:, 0], from_planes(dec_p, plan.bits)

        conv, iters, dec = jax.lax.map(
            run_group,
            (llr.reshape(groups, tb, -1), syn.reshape(groups, tb, -1)),
        )
        return DecodeResult(
            decision=dec.reshape(-1, plan.num_bits)[:b].astype(jnp.int8),
            syndromes_match=conv.reshape(-1)[:b].astype(bool),
            iterations=iters.reshape(-1)[:b],
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
