"""Fused Pallas TPU decoder for QC-LDPC codes.

The jnp decoders stream the full message state through HBM several times per
iteration (check pass, regroup, bit pass, regroup, syndrome). This kernel
inverts that: the **entire decode runs inside one `pallas_call`**, with the
whole message state for a tile of frames resident in VMEM. HBM is touched
exactly twice — LLRs/syndromes in, decisions out. Per iteration the QC
structure makes every cross-enumeration move a `pltpu.roll` (lane rotation)
of a `[TB, Z]` plane: zero memory traffic, pure VPU work.

Layout per batch tile (TB frames):
  * message state  M[be][TB, Z]  — one plane per block edge, check-aligned
    (``M[be][:, z]`` is the message on edge check (r, z) <-> bit
    (c, (z+s) mod Z)); VMEM scratch, overwritten in place by extrinsics.
  * decision/frozen [nb][TB, Z] int8 planes, bit-aligned.
  * convergence bookkeeping ([TB] masks, first-success iterations) lives in
    the while-loop carry.

Early exit is per *tile*: a tile of TB frames stops iterating as soon as all
TB converge — much finer-grained than whole-batch early exit, so stragglers
only stall their own tile (the Pallas analogue of the driver's two-phase
re-decode, with identical per-frame semantics).

Algorithms and semantics match ops/decoders.py exactly (reference:
src/qkd_ldpc_algorithm.cpp:3-1029): hard-decision tie-break, two-minimum tie
handling, min-sum sign conventions, OMSA clamp-at-zero, the adaptive pair's
previous-decision factor selection and in-check-pass convergence, and the
optional message clamp at the reference's program points.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.qc import QCMatrix
from qkd_ldpc_v_tpu.ops.decoders import DecodeResult
from qkd_ldpc_v_tpu.ops.linapprox import atanh_lin_approx, tanh_lin_approx


def make_pallas_qc_decoder(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    dtype=jnp.float32,
    batch_tile: int = 16,
    interpret: bool = False,
) -> Callable[..., DecodeResult]:
    """Build the fused decoder. Same call signature as make_decoder:
    ``decode(llr_ext [B,N], syndrome_ext [B,M] int8, primary, secondary,
    threshold) -> DecodeResult``. B must be a multiple of ``batch_tile``
    (the wrapper pads)."""
    dtype = jnp.dtype(dtype)
    if dtype != jnp.float32:
        raise ValueError("pallas QC decoder is float32-only")
    z = qc.lifting
    nb, mb = qc.base_bits, qc.base_checks
    n, m = nb * z, mb * z
    if z % 128:
        raise ValueError("lifting size must be a multiple of 128 lanes")
    tb = batch_tile
    big = jnp.finfo(dtype).max
    adaptive = algorithm.is_adaptive
    spa = algorithm in (DecodingAlgorithm.SPA, DecodingAlgorithm.SPA_APPROX)
    if algorithm == DecodingAlgorithm.SPA:
        tanh_fn = jnp.tanh
        # Mosaic has no atanh primitive; use the log identity.
        atanh_fn = lambda x: 0.5 * jnp.log((1.0 + x) / (1.0 - x))  # noqa: E731
    else:
        tanh_fn, atanh_fn = tanh_lin_approx, atanh_lin_approx

    # Static base-graph tables.
    rows = []  # per base row: list of (be, c, s)
    cols = [[] for _ in range(nb)]  # per base col: list of (be, r, s)
    be = 0
    for r in range(mb):
        row = []
        for c in range(nb):
            s = int(qc.shifts[r, c])
            if s >= 0:
                row.append((be, c, s))
                cols[c].append((be, r, s))
                be += 1
        rows.append(row)
    num_be = be

    def clamp(x, threshold):
        if use_threshold:
            return jnp.clip(x, -threshold, threshold)
        return x

    def kernel(llr_ref, syn_ref, prim_ref, sec_ref, thr_ref,
               dec_out, conv_out, iter_out,
               msg, dec, frz):
        primary = prim_ref[0, 0]
        secondary = sec_ref[0, 0]
        threshold = thr_ref[0, 0]

        def llr_block(c):
            return llr_ref[:, c * z:(c + 1) * z]

        def syn_sign_block(r):
            # syndrome arrives as int32: Mosaic handles 32-bit vector
            # compare/rotate; int8 vector ops hit compiler gaps.
            blk = syn_ref[:, r * z:(r + 1) * z]
            return jnp.where(blk == 1, -1.0, 1.0).astype(dtype)

        def syn_bits_block(r):
            return syn_ref[:, r * z:(r + 1) * z]

        # ---- init: check-aligned channel LLRs, initial decisions ----
        for r in range(mb):
            for (e, c, s) in rows[r]:
                msg[e] = pltpu.roll(llr_block(c), (-s) % z, axis=1)
        for c in range(nb):
            d0 = (llr_block(c) <= 0).astype(jnp.int32)
            dec[c] = d0
            frz[c] = d0

        def dsyn_mismatch(r):
            """[TB, Z] int8: 1 where check (r, .) is unsatisfied by the
            current decisions."""
            acc = None
            for (e, c, s) in rows[r]:
                contrib = pltpu.roll(dec[c], (-s) % z, axis=1)
                acc = contrib if acc is None else acc ^ contrib
            return acc ^ syn_bits_block(r)

        def check_pass(factors):
            """factors: None (non-adaptive) or list of [TB, Z] per row."""
            for r in range(mb):
                msgs = [msg[e] for (e, c, s) in rows[r]]
                ss = syn_sign_block(r)
                if spa:
                    ts = [tanh_fn(mm * 0.5) for mm in msgs]
                    row_prod = ss
                    for t in ts:
                        row_prod = row_prod * t
                    for (e, c, s), t in zip(rows[r], ts):
                        msg[e] = clamp(
                            (2.0 * atanh_fn(row_prod / t)).astype(dtype), threshold
                        )
                else:
                    a = [jnp.abs(mm) for mm in msgs]
                    min1 = a[0]
                    for ai in a[1:]:
                        min1 = jnp.minimum(min1, ai)
                    cnt = jnp.zeros_like(min1, jnp.int32)
                    min2 = jnp.full_like(min1, big)
                    for ai in a:
                        is_min = ai == min1
                        cnt = cnt + is_min.astype(jnp.int32)
                        min2 = jnp.minimum(min2, jnp.where(is_min, big, ai))
                    min2 = jnp.where(cnt >= 2, min1, min2)
                    neg = jnp.zeros_like(cnt)
                    for mm in msgs:
                        neg = neg + (mm < 0).astype(jnp.int32)
                    row_sign = ss * jnp.where(neg % 2 == 0, 1.0, -1.0).astype(dtype)
                    f = primary if factors is None else factors[r]
                    for (e, c, s), mm, ai in zip(rows[r], msgs, a):
                        excl = jnp.where(mm > 0, 1.0, -1.0).astype(dtype)
                        eabs = jnp.where(ai == min1, min2, min1)
                        if algorithm in (
                            DecodingAlgorithm.NMSA, DecodingAlgorithm.ANMSA
                        ):
                            val = f * row_sign * excl * eabs
                        else:
                            val = row_sign * excl * jnp.maximum(eabs - f, 0.0)
                        msg[e] = clamp(val.astype(dtype), threshold)

        def bit_pass():
            for c in range(nb):
                es = [pltpu.roll(msg[e], s % z, axis=1) for (e, r, s) in cols[c]]
                total = llr_block(c)
                for ep in es:
                    total = total + ep
                dec[c] = (total <= 0).astype(jnp.int32)
                for (e, r, s), ep in zip(cols[c], es):
                    msg[e] = pltpu.roll(
                        clamp(total - ep, threshold), (-s) % z, axis=1
                    )

        # Carries are int32 (TB, 1) columns: Mosaic rejects bool vectors in
        # while-loop carries.
        def frames_ok_i32(mismatches):
            ok = None
            for mmt in mismatches:
                row_ok = jnp.all(mmt == 0, axis=1, keepdims=True)
                ok = row_ok if ok is None else ok & row_ok
            return ok.astype(jnp.int32)  # [TB, 1]

        def freeze(newly):
            for c in range(nb):
                frz[c] = jnp.where(newly != 0, dec[c], frz[c])

        if not adaptive:

            def body(carry):
                it, converged, iters = carry
                check_pass(None)
                bit_pass()
                ok = frames_ok_i32([dsyn_mismatch(r) for r in range(mb)])
                newly = ok * (1 - converged)
                iters = jnp.where(newly != 0, it + 1, iters)
                freeze(newly)
                return it + 1, jnp.maximum(converged, ok), iters

        else:

            def body(carry):
                it, converged, iters = carry
                # Adaptive: convergence from the *previous* decision, checked
                # inside the check pass; the same per-check mismatch selects
                # the factor (reference: :745-776).
                mismatches = [dsyn_mismatch(r) for r in range(mb)]
                ok = frames_ok_i32(mismatches)
                newly = ok * (1 - converged)
                iters = jnp.where(newly != 0, it + 1, iters)
                freeze(newly)
                converged = jnp.maximum(converged, ok)
                factors = [
                    jnp.where(mmt != 0, secondary, primary).astype(dtype)
                    for mmt in mismatches
                ]
                check_pass(factors)
                bit_pass()
                return it + 1, converged, iters

        def cond(carry):
            it, converged, iters = carry
            return (it < max_iterations) & ~jnp.all(converged != 0)

        converged0 = jnp.zeros((tb, 1), jnp.int32)
        iters0 = jnp.full((tb, 1), max_iterations, jnp.int32)
        it, converged, iters = jax.lax.while_loop(
            cond, body, (jnp.int32(0), converged0, iters0)
        )

        for c in range(nb):
            final = jnp.where(converged != 0, frz[c], dec[c])
            dec_out[:, c * z:(c + 1) * z] = final.astype(jnp.int8)
        conv_out[:, :] = converged.astype(jnp.int8)
        iter_out[:, :] = iters

    def run_tiles(llr, syndrome, primary, secondary, threshold):
        b = llr.shape[0]
        assert b % tb == 0
        num_tiles = b // tb
        out_shapes = (
            jax.ShapeDtypeStruct((b, n), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        )
        scalar_spec = pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
                scalar_spec,
                scalar_spec,
                scalar_spec,
            ],
            out_specs=(
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((num_be, tb, z), dtype),
                pltpu.VMEM((nb, tb, z), jnp.int32),
                pltpu.VMEM((nb, tb, z), jnp.int32),
            ],
            interpret=interpret,
        )(llr, syndrome, primary, secondary, threshold)

    def decode(
        llr_ext: jax.Array,
        syndrome_ext: jax.Array,
        primary=1.0,
        secondary=1.0,
        threshold=0.0,
    ) -> DecodeResult:
        b = llr_ext.shape[0]
        pad = (-b) % tb
        llr = jnp.pad(llr_ext.astype(dtype), ((0, pad), (0, 0)))
        # Padding frames get the all-zero syndrome and positive LLRs -> they
        # converge on iteration 1 and never hold a tile open.
        llr = llr.at[b:, :].set(1.0) if pad else llr
        syndrome = jnp.pad(syndrome_ext.astype(jnp.int32), ((0, pad), (0, 0)))
        prim = jnp.full((1, 1), primary, dtype)
        sec = jnp.full((1, 1), secondary, dtype)
        thr = jnp.full((1, 1), threshold, dtype)
        dec, conv, iters = run_tiles(llr, syndrome, prim, sec, thr)
        return DecodeResult(
            decision=dec[:b],
            syndromes_match=conv[:b, 0].astype(bool),
            iterations=iters[:b, 0],
        )

    return decode
