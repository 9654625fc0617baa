"""Fused Pallas TPU decoders for QC-LDPC codes.

The jnp decoders stream the full message state through HBM several times per
iteration (check pass, regroup, bit pass, regroup, syndrome). These kernels
invert that: the **entire decode runs inside one `pallas_call`**, with the
whole message state for a tile of frames resident in VMEM. Per iteration the
QC structure makes every cross-enumeration move a `pltpu.roll` (lane
rotation) of a `[TB, Z]` plane: zero memory traffic, pure VPU work.

Two kernel modes share one builder:

  * ``make_pallas_qc_decoder`` — the library decode API (LLRs + syndrome in,
    decisions out), signature-compatible with ops/decoders.make_decoder.
  * ``make_pallas_qc_trial`` — the Monte-Carlo driver's hot path: raw
    Alice/Bob key bits in; the kernel computes Alice's syndrome (parity
    rolls), channel LLRs, the full decode, and the key comparison, returning
    only the three per-frame statistics. HBM traffic: two int8 key arrays
    in, three tiny vectors out.

Early exit is per *tile*: a tile of TB frames stops iterating as soon as all
TB converge — much finer-grained than whole-batch early exit, so stragglers
only stall their own tile.

Algorithms and semantics match ops/decoders.py exactly (reference:
src/qkd_ldpc_algorithm.cpp:3-1029): hard-decision tie-break, two-minimum tie
handling, min-sum sign conventions, OMSA clamp-at-zero, the adaptive pair's
previous-decision factor selection and in-check-pass convergence, and the
optional message clamp at the reference's program points.

``schedule="layered"`` is the opt-in performance mode beyond the reference
(which floods): block-rows process in sequence with bit totals updated
within the sweep — ~2x fewer sweeps at equal-or-better FER; the adaptive
pair's factor then uses the *current* decisions. Min-sum family only; the
specification is the NumPy oracle in tests/test_pallas_qc.py. See
docs/KERNEL.md §layered and BASELINE.md for measurements.

Mosaic notes: vector rotates and while-loop carries must be 32-bit (int8
planes and bool carries are rejected/crash), and atanh has no primitive
(log identity used instead).
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.qc import QCMatrix
from qkd_ldpc_v_tpu.ops.decoders import DecodeResult
from qkd_ldpc_v_tpu.ops.dispatch import is_traced, scalar_bundle, unbundle
from qkd_ldpc_v_tpu.ops.linapprox import (
    atanh_lin_approx,
    guard_atanh_ratio,
    tanh_lin_approx,
)


# The v5e core has far more physical VMEM than Mosaic's 16 MiB default
# scoped limit: 120 MiB of VMEM scratch compiles and runs on the target
# chip (scripts/probe_vmem.py, round 4). The fused kernel therefore
# serves every reference frame size — including the N=102400 QC flagship
# — with zero HBM traffic mid-decode. The budget models only the
# declared scratch planes; Mosaic stack temporaries scale with the plane
# set and must fit inside the gap to the 120 MiB ceiling. Round-5
# hardware measurements pin the workable declared-plane budget: the
# Z=2048 CW=3 flagship's 83.5 MiB set compiles and runs (16.4k f/s mc
# mode), while the Z=1024 CW=4 asset's 91.4 MiB set dies in Mosaic VMEM
# allocation at the same 120 MiB request — so the gate holds declared
# planes at <= 84 MiB and drops to the next tile instead (BASELINE.md
# §fused-100k, round 5).
_VMEM_BUDGET = 84 * 1024 * 1024
_VMEM_LIMIT_CAP = 120 * 1024 * 1024
# Compile-size guard (mirrors pallas_qc_stream._MAX_BLOCK_EDGES): the
# sweep body unrolls one check update per block edge; beyond this the
# Mosaic program risks the tunnel's remote-compile helper.
_MAX_BLOCK_EDGES = 420


def _vmem_limit_bytes(scratch_shapes, io_block_bytes: int = 0) -> int:
    """vmem_limit_bytes request: declared scratch + double-buffered
    operand/output block staging (the [TB, N] key/LLR blocks of the
    trial/frame/decode modes — at N=102400 tile 16 these alone are
    ~26 MiB and round 5 measured the flagship trial kernel running 684 KB
    past a flat 48 MiB margin) + 48 MiB for compiler stack temporaries,
    clamped to the measured workable ceiling."""
    scratch = sum(
        int(np.prod(s.shape)) * jnp.dtype(s.dtype).itemsize
        for s in scratch_shapes
    )
    margin = 2 * io_block_bytes + 48 * 1024 * 1024
    return int(min(max(scratch + margin, 32 * 1024 * 1024),
                   _VMEM_LIMIT_CAP))


# Round-5 tile-sweep measurements (TPU v5e, probe_qc_tiles, BASELINE.md
# §tile-sweep): the two schedules want opposite tile regimes.
#
#   * layered: the serial block-row sweep is latency/VMEM-pressure bound —
#     throughput peaks with the whole plane set near or under ~8 MiB
#     (1k Z=128: tile 192 best, 2.62M f/s; 10k Z=512: tile 16, 367k;
#     100k Z=2048: tile 8, 28.1k — 3.4x the tile-24 rate) and collapses
#     as the live set approaches the VMEM ceiling.
#   * flooding: independent row work amortizes fixed costs — the optimum
#     tile shrinks as per-tile plane bytes grow (1k: 384 -> 2.62M;
#     10k: 48 -> 195k; Z=2048: 24 -> 16.4-18.4k; Z=1024 CW=4: 16 ->
#     14.2k; one step larger or smaller measures 2-10% worse).
#
# Tiny-plane codes (the 1k tier, <= 64 KiB per tile frame) are
# per-grid-step-overhead bound, not VMEM bound: layered keeps climbing
# to tile 384 (13.2 MiB live, 2.81M f/s vs 2.62M at 192), so they get a
# larger live-set allowance.
_TILES = (384, 192, 96, 48, 24, 16, 8)
_LAYERED_LIVE_TARGET = 8 * 1024 * 1024
_LAYERED_LIVE_TARGET_TINY = 14 * 1024 * 1024
_TINY_PBPT = 64 * 1024


def feasible_batch_tile(
    qc: QCMatrix, mode: str = "mc", schedule: str = "flooding"
) -> int:
    """Measured-best workable batch tile for the fused QC kernel, or 0
    when the code cannot fit VMEM at any tile (the driver then falls back
    to the streamed-QC / generic paths). Scratch: messages (num_be
    planes) + decisions/frozen/LLR/syndrome planes, plus the MC mode's
    key and sort-key planes. The choice is schedule-aware (see the tile
    ladder above)."""
    if qc.lifting % 128:
        return 0
    num_be = int((qc.shifts >= 0).sum())
    if num_be > _MAX_BLOCK_EDGES:
        return 0
    nb, mb = qc.base_bits, qc.base_checks
    planes = num_be + 3 * nb + mb + (2 * nb if mode == "mc" else 0)
    pbpt = planes * qc.lifting * 4  # plane bytes per tile frame
    # Codes with many block-rows amortize more per-sweep work per grid
    # step, shifting the optimum one tile step up at equal plane bytes:
    # the Z=256 mb=26 ladder code measured layered 414k at tile 24 vs
    # 374k at 16, flooding 298k at 96 vs 276k at 48, while the same-pbpt
    # Z=512 mb=6 headline prefers 16/48 (BASELINE.md §tile-sweep).
    many_rows = qc.base_checks >= 16
    if schedule == "layered":
        if pbpt <= _TINY_PBPT:
            target = _LAYERED_LIVE_TARGET_TINY
        elif many_rows:
            target = 10 * 1024 * 1024
        else:
            target = _LAYERED_LIVE_TARGET
        for tile in _TILES:
            if pbpt * tile <= target:
                return tile
        # Floor: no tile keeps the live set small, so take the smallest
        # (Z=2048 flagship: tile 8 = 28.1k f/s vs tile 16 = 25.8k).
        for tile in (8, 16):
            if pbpt * tile <= _VMEM_BUDGET:
                return tile
        return 0
    if pbpt <= _TINY_PBPT:
        want = 384
    elif pbpt <= 128 * 1024:
        want = 96
    elif pbpt <= 1024 * 1024:
        want = 96 if many_rows else 48
    elif pbpt <= 3584 * 1024:
        want = 24
    else:
        want = 16
    for tile in _TILES:
        if tile <= want and pbpt * tile <= _VMEM_BUDGET:
            return tile
    return 0


def _base_tables(qc: QCMatrix):
    """rows[r] = [(be, c, s)], cols[c] = [(be, r, s)], in storage order."""
    rows = []
    cols: List[List[Tuple[int, int, int]]] = [[] for _ in range(qc.base_bits)]
    be = 0
    for r in range(qc.base_checks):
        row = []
        for c in range(qc.base_bits):
            s = int(qc.shifts[r, c])
            if s >= 0:
                row.append((be, c, s))
                cols[c].append((be, r, s))
                be += 1
        rows.append(row)
    return rows, cols, be


def _build(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int,
    interpret: bool,
    mode: str,  # "decode" | "trial" | "mc"
    schedule: str = "flooding",  # "flooding" | "layered"
):
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    layered = schedule == "layered"
    if layered and algorithm in (
        DecodingAlgorithm.SPA, DecodingAlgorithm.SPA_APPROX
    ):
        # The layered (serial-C) schedule is a performance mode beyond the
        # reference (which floods). The min-sum family is supported; for
        # the adaptive pair the per-check factor comes from the *current*
        # decisions (free in a layered sweep — the rolled totals are
        # already in hand), the layered analogue of the reference's
        # previous-decision rule. SPA's tanh-product exclusion keeps the
        # reference schedule.
        raise ValueError("layered schedule supports the min-sum family "
                         "(NMSA/OMSA/ANMSA/AOMSA) only")
    dtype = jnp.dtype(jnp.float32)
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
    # True-SPA fast modes need the atanh domain guard (see
    # linapprox.guard_atanh_ratio); SPA-LIN's piecewise atanh is finite.
    guard = algorithm == DecodingAlgorithm.SPA and dtype != jnp.float64

    rows, cols, num_be = _base_tables(qc)

    def clamp(x, threshold):
        if use_threshold:
            return jnp.clip(x, -threshold, threshold)
        return x

    idx_bits = max(1, (n - 1).bit_length())

    def kernel(*args):
        alice_s = None
        if mode == "frame":
            (alice_ref, llr_ref, prim_ref, sec_ref, thr_ref,
             conv_out, keys_out, iter_out,
             msg, dec, frz, llr_s, syn_s) = args
        elif mode == "trial":
            (alice_ref, bob_ref, qber_ref, prim_ref, sec_ref, thr_ref,
             conv_out, keys_out, iter_out,
             msg, dec, frz, llr_s, syn_s) = args
        elif mode == "mc":
            (seed_ref, ne_ref, qber_ref, prim_ref, sec_ref, thr_ref,
             conv_out, keys_out, iter_out,
             msg, dec, frz, llr_s, syn_s, alice_s, ekeys) = args
        else:
            (llr_ref, syn_ref, prim_ref, sec_ref, thr_ref,
             dec_out, conv_out, iter_out,
             msg, dec, frz, llr_s, syn_s) = args
        primary = prim_ref[0, 0]
        secondary = sec_ref[0, 0]
        threshold = thr_ref[0, 0]

        def alice_block(c):
            return alice_s[c] if mode == "mc" else alice_ref[:, c * z:(c + 1) * z]

        def stage_syndrome_from_alice():
            # Alice's syndrome per check block: parity of rolled key blocks
            # (reference: src/array_and_matrix_operations.cpp:936-950).
            for r in range(mb):
                acc = None
                for (e, c, s) in rows[r]:
                    contrib = pltpu.roll(alice_block(c), (-s) % z, axis=1)
                    acc = contrib if acc is None else acc ^ contrib
                syn_s[r] = acc

        # ---- prologue: stage LLR planes and syndrome planes into VMEM ----
        if mode == "frame":
            # Rate-adaptive driver path: frames and LLRs arrive prebuilt
            # (punctured/shortened handling happens in XLA); the kernel still
            # owns Alice's syndrome, the decode, and the key comparison.
            for c in range(nb):
                llr_s[c] = llr_ref[:, c * z:(c + 1) * z]
            stage_syndrome_from_alice()
        elif mode == "trial":
            # log((1-q)/q) arrives precomputed by the wrapper (XLA):
            # Mosaic's transcendental log differs from XLA's by an ulp at
            # some QBERs, and an in-kernel log gave the two QC engines'
            # trial kernels different channel-LLR bits — one near-waterfall
            # frame in 512 then converged one sweep apart (round 5,
            # PARITY.md §Z=2048). Same-bits LLRs keep every engine's trial
            # path on the XLA decoder's exact trajectory.
            log_p = qber_ref[0, 0]
            for c in range(nb):
                bob_c = bob_ref[:, c * z:(c + 1) * z]
                llr_s[c] = jnp.where(bob_c == 1, -log_p, log_p).astype(dtype)
            stage_syndrome_from_alice()
        elif mode == "mc":
            # Whole Monte-Carlo trial in-kernel: generate Alice's keys and
            # exactly-num_errors error positions from the per-tile PRNG
            # stream (reference channel semantics:
            # src/array_and_matrix_operations.cpp:889-933).
            # Two seed components keep distinct chunks' tile streams from
            # colliding (seed+tile arithmetic would alias chunks whose seeds
            # differ by less than the tile count).
            pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
            num_errors = ne_ref[0, 0]
            log_p = qber_ref[0, 0]  # precomputed log((1-q)/q) — see trial
            for c in range(nb):
                abits = pltpu.bitcast(
                    pltpu.prng_random_bits((tb, z)), jnp.uint32
                )
                alice_s[c] = (abits & 1).astype(jnp.int32)
            for c in range(nb):
                ebits = pltpu.bitcast(
                    pltpu.prng_random_bits((tb, z)), jnp.uint32
                )
                pos = (
                    jax.lax.broadcasted_iota(jnp.int32, (tb, z), 1) + c * z
                ).astype(jnp.uint32)
                # Unique per-position sort keys: random high bits, position
                # low bits -> the count of selected flips is exact.
                ekeys[c] = (ebits >> idx_bits << idx_bits) | pos
            # Per-frame num_errors-th smallest key via 32-pass bitwise
            # selection (keys are unique, so count(<= kth) == num_errors).
            t = jnp.zeros((tb, 1), jnp.uint32)
            for b in reversed(range(32)):
                cand = t | jnp.uint32(1 << b)
                cnt = jnp.zeros((tb, 1), jnp.int32)
                for c in range(nb):
                    cnt = cnt + jnp.sum(
                        (ekeys[c] < cand).astype(jnp.int32),
                        axis=1, keepdims=True,
                    )
                t = jnp.where(cnt < num_errors, cand, t)
            for c in range(nb):
                flip = jnp.where(
                    num_errors > 0, (ekeys[c] <= t).astype(jnp.int32), 0
                )
                bob_c = alice_s[c] ^ flip
                llr_s[c] = jnp.where(bob_c == 1, -log_p, log_p).astype(dtype)
            stage_syndrome_from_alice()
        else:
            for c in range(nb):
                llr_s[c] = llr_ref[:, c * z:(c + 1) * z]
            for r in range(mb):
                syn_s[r] = syn_ref[:, r * z:(r + 1) * z]

        def syn_sign_block(r):
            return jnp.where(syn_s[r] == 1, -1.0, 1.0).astype(dtype)

        # ---- init: check-aligned channel LLRs, initial decisions ----
        # Layered: msg holds check->bit extrinsics (zero before the first
        # sweep) and llr_s doubles as the running bit totals; flooding: msg
        # holds check-aligned bit->check messages (channel LLRs).
        for r in range(mb):
            for (e, c, s) in rows[r]:
                if layered:
                    msg[e] = jnp.zeros((tb, z), dtype)
                else:
                    msg[e] = pltpu.roll(llr_s[c], (-s) % z, axis=1)
        for c in range(nb):
            d0 = (llr_s[c] <= 0).astype(jnp.int32)
            dec[c] = d0
            frz[c] = d0

        def dsyn_mismatch(r):
            """[TB, Z] int32: 1 where check (r, .) is unsatisfied by the
            current decisions."""
            acc = None
            for (e, c, s) in rows[r]:
                contrib = pltpu.roll(dec[c], (-s) % z, axis=1)
                acc = contrib if acc is None else acc ^ contrib
            return acc ^ syn_s[r]

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
                        ratio = row_prod / t
                        if guard:
                            ratio = guard_atanh_ratio(ratio, dtype)
                        msg[e] = clamp(
                            (2.0 * atanh_fn(ratio)).astype(dtype), threshold
                        )
                else:
                    # Pairwise two-minimum chain: exact multiset semantics,
                    # so a tie at the minimum yields min2 == min1 exactly as
                    # the reference's sequential update (:381-397).
                    a = [jnp.abs(mm) for mm in msgs]
                    min1 = a[0]
                    min2 = jnp.full_like(min1, big)
                    for ai in a[1:]:
                        min2 = jnp.minimum(min2, jnp.maximum(min1, ai))
                        min1 = jnp.minimum(min1, ai)
                    neg = jnp.zeros(min1.shape, jnp.int32)
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
                total = llr_s[c]
                for ep in es:
                    total = total + ep
                dec[c] = (total <= 0).astype(jnp.int32)
                for (e, r, s), ep in zip(cols[c], es):
                    msg[e] = pltpu.roll(
                        clamp(total - ep, threshold), (-s) % z, axis=1
                    )

        def layered_sweep():
            """Serial-C (layered) min-sum sweep: process block-rows in
            sequence; each row reads the *current* bit totals and updates
            them immediately, so information propagates within a sweep —
            ~2x fewer sweeps than flooding at equal FER (docs/KERNEL.md).
            A performance mode beyond the reference's flooding schedule."""
            for r in range(mb):
                rolled = [
                    pltpu.roll(llr_s[c], (-s) % z, axis=1)
                    for (e, c, s) in rows[r]
                ]
                msgs = [
                    rt - msg[e] for rt, (e, c, s) in zip(rolled, rows[r])
                ]
                ss = syn_sign_block(r)
                if adaptive:
                    # Per-check factor from the *current* decisions — the
                    # rolled totals are the decision inputs, so this costs
                    # one compare/xor chain, no extra rolls.
                    acc = None
                    for rt in rolled:
                        b = (rt <= 0).astype(jnp.int32)
                        acc = b if acc is None else acc ^ b
                    mism = acc ^ syn_s[r]
                    f = jnp.where(mism != 0, secondary, primary).astype(
                        dtype
                    )
                else:
                    f = primary
                a = [jnp.abs(mm) for mm in msgs]
                min1 = a[0]
                min2 = jnp.full_like(min1, big)
                for ai in a[1:]:
                    min2 = jnp.minimum(min2, jnp.maximum(min1, ai))
                    min1 = jnp.minimum(min1, ai)
                neg = jnp.zeros(min1.shape, jnp.int32)
                for mm in msgs:
                    neg = neg + (mm < 0).astype(jnp.int32)
                row_sign = ss * jnp.where(
                    neg % 2 == 0, 1.0, -1.0
                ).astype(dtype)
                for (e, c, s), mm, ai in zip(rows[r], msgs, a):
                    excl = jnp.where(mm > 0, 1.0, -1.0).astype(dtype)
                    eabs = jnp.where(ai == min1, min2, min1)
                    if algorithm in (
                        DecodingAlgorithm.NMSA, DecodingAlgorithm.ANMSA
                    ):
                        val = f * row_sign * excl * eabs
                    else:  # OMSA / AOMSA: offset, clamp at zero
                        val = row_sign * excl * jnp.maximum(eabs - f, 0.0)
                    val = clamp(val.astype(dtype), threshold)
                    llr_s[c] = llr_s[c] + pltpu.roll(
                        val - msg[e], s % z, axis=1
                    )
                    msg[e] = val
            for c in range(nb):
                dec[c] = (llr_s[c] <= 0).astype(jnp.int32)

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

        if layered:

            def body(carry):
                it, converged, iters = carry
                layered_sweep()
                ok = frames_ok_i32([dsyn_mismatch(r) for r in range(mb)])
                newly = ok * (1 - converged)
                iters = jnp.where(newly != 0, it + 1, iters)
                freeze(newly)
                return it + 1, jnp.maximum(converged, ok), iters

        elif not adaptive:

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

        if mode in ("trial", "mc", "frame"):
            km = None
            for c in range(nb):
                final = jnp.where(converged != 0, frz[c], dec[c])
                col_ok = jnp.all(final == alice_block(c), axis=1, keepdims=True)
                km = col_ok if km is None else km & col_ok
            conv_out[:, :] = converged.astype(jnp.int8)
            keys_out[:, :] = km.astype(jnp.int8)
            iter_out[:, :] = iters
        else:
            for c in range(nb):
                final = jnp.where(converged != 0, frz[c], dec[c])
                dec_out[:, c * z:(c + 1) * z] = final.astype(jnp.int8)
            conv_out[:, :] = converged.astype(jnp.int8)
            iter_out[:, :] = iters

    scratch_shapes = [
        pltpu.VMEM((num_be, tb, z), dtype),   # messages / extrinsics
        pltpu.VMEM((nb, tb, z), jnp.int32),   # decisions
        pltpu.VMEM((nb, tb, z), jnp.int32),   # frozen decisions
        pltpu.VMEM((nb, tb, z), dtype),       # LLR planes
        pltpu.VMEM((mb, tb, z), jnp.int32),   # syndrome planes
    ]
    if mode == "mc":
        scratch_shapes += [
            pltpu.VMEM((nb, tb, z), jnp.int32),   # Alice key planes
            pltpu.VMEM((nb, tb, z), jnp.uint32),  # error sort keys
        ]
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    def _stats_outputs(b):
        shape = (
            jax.ShapeDtypeStruct((b, 1), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        )
        specs = tuple(
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        )
        return shape, specs

    def call(num_tiles, b, *operands):
        if mode == "frame":
            in_specs = [
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                scalar_spec, scalar_spec, scalar_spec,
            ]
            out_shape, out_specs = _stats_outputs(b)
        elif mode == "mc":
            smem_i32 = pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            )
            in_specs = [smem_i32, smem_i32, scalar_spec, scalar_spec,
                        scalar_spec, scalar_spec]
            out_shape, out_specs = _stats_outputs(b)
        elif mode == "trial":
            in_specs = [
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                scalar_spec, scalar_spec, scalar_spec, scalar_spec,
            ]
            out_shape, out_specs = _stats_outputs(b)
        else:
            in_specs = [
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
                scalar_spec, scalar_spec, scalar_spec,
            ]
            out_shape = (
                jax.ShapeDtypeStruct((b, n), jnp.int8),
                jax.ShapeDtypeStruct((b, 1), jnp.int8),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
            )
            out_specs = (
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )
        if mode in ("frame", "trial"):
            io_bytes = 2 * tb * n * 4
        elif mode == "decode":
            io_bytes = tb * n * 4 + tb * m * 4 + tb * n
        else:  # mc: scalars in, [TB, 1] stats out
            io_bytes = 0
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit_bytes(scratch_shapes, io_bytes),
            ),
        )(*operands)

    return call, dtype, tb, n, m


def make_pallas_qc_decoder(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    dtype=jnp.float32,
    batch_tile: int = 16,
    interpret: bool = False,
    schedule: str = "flooding",
) -> Callable[..., DecodeResult]:
    """Fused decode kernel. Same call signature as make_decoder:
    ``decode(llr_ext [B,N], syndrome_ext [B,M] int8, primary, secondary,
    threshold) -> DecodeResult``. The wrapper pads B to the batch tile."""
    if jnp.dtype(dtype) != jnp.float32:
        raise ValueError("pallas QC decoder is float32-only")
    call, fdtype, tb, n, m = _build(
        qc, algorithm, max_iterations, use_threshold, batch_tile, interpret,
        mode="decode", schedule=schedule,
    )

    def _impl(llr_ext, syndrome_ext, prim, sec, thr) -> DecodeResult:
        b = llr_ext.shape[0]
        pad = (-b) % tb
        llr = jnp.pad(llr_ext.astype(fdtype), ((0, pad), (0, 0)))
        # Padding frames get the all-zero syndrome and positive LLRs -> they
        # converge on iteration 1 and never hold a tile open.
        llr = llr.at[b:, :].set(1.0) if pad else llr
        syndrome = jnp.pad(syndrome_ext.astype(jnp.int32), ((0, pad), (0, 0)))
        bp = b + pad
        dec, conv, iters = call(
            bp // tb, bp, llr, syndrome, prim, sec, thr
        )
        return DecodeResult(
            decision=dec[:b],
            syndromes_match=conv[:b, 0].astype(bool),
            iterations=iters[:b, 0],
        )

    jitted = [None]

    def decode(
        llr_ext: jax.Array,
        syndrome_ext: jax.Array,
        primary=1.0,
        secondary=1.0,
        threshold=0.0,
    ) -> DecodeResult:
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


def make_pallas_qc_trial(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int = 16,
    interpret: bool = False,
    schedule: str = "flooding",
) -> Callable:
    """Fused Monte-Carlo trial kernel (the sweep driver's hot path).

    ``trial(alice [B,N] int8, bob [B,N] int8, qber, primary, secondary,
    threshold) -> (syndromes_match [B] bool, keys_match [B] bool,
    iterations [B] int32)``

    Everything between the raw keys and the per-frame statistics — Alice's
    syndrome, channel LLRs, the full decode, the key comparison — happens
    inside the kernel with state in VMEM.
    """
    call, fdtype, tb, n, m = _build(
        qc, algorithm, max_iterations, use_threshold, batch_tile, interpret,
        mode="trial", schedule=schedule,
    )

    def _impl(alice, bob, qb, prim, sec, thr):
        b = alice.shape[0]
        pad = (-b) % tb
        # Padding frames: alice == bob == 0 -> zero syndrome, all-positive
        # LLRs, converge on iteration 1. Keys go in as int32 (int8 blocks
        # would force a 32-row minimum tile).
        alice = jnp.pad(alice.astype(jnp.int32), ((0, pad), (0, 0)))
        bob = jnp.pad(bob.astype(jnp.int32), ((0, pad), (0, 0)))
        bp = b + pad
        # optimization_barrier pins the log's lowering context so every
        # engine's jit program produces the same scalar bits.
        log_p = jax.lax.optimization_barrier(jnp.log((1.0 - qb) / qb))
        conv, keys, iters = call(
            bp // tb, bp, alice, bob, log_p, prim, sec, thr
        )
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


def make_pallas_qc_montecarlo(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch: int,
    batch_tile: int = 24,
    interpret: bool = False,
    schedule: str = "flooding",
) -> Callable:
    """Fully in-kernel Monte-Carlo trials: PRNG, channel, decode, stats.

    ``mc(seed int32, num_errors int32, qber, primary, secondary, threshold)
    -> (syndromes_match [B] bool, keys_match [B] bool, iterations [B] int32)``

    Each batch tile seeds the hardware PRNG with the two components
    ``(seed, tile_index)`` (so distinct chunks' tile streams cannot alias)
    and generates Alice's keys plus an exactly-``num_errors`` uniform error
    subset in VMEM — the only HBM traffic of an entire trial batch is three
    [B]-sized result vectors. The random stream is the TPU hardware PRNG,
    not the host threefry stream, so cross-implementation comparisons are
    statistical rather than bitwise. ``batch`` is rounded up to the tile
    internally; outputs are sliced back to ``batch``.
    """
    pad = (-batch) % batch_tile
    padded = batch + pad
    call, fdtype, tb, n, m = _build(
        qc, algorithm, max_iterations, use_threshold, batch_tile, interpret,
        mode="mc", schedule=schedule,
    )

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


def make_pallas_qc_frame_trial(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int = 16,
    interpret: bool = False,
    schedule: str = "flooding",
) -> Callable:
    """Fused trial kernel for prebuilt frames (the rate-adaptive driver path).

    ``trial(alice_frame [B,N] int8/int32, llr [B,N] f32, primary, secondary,
    threshold) -> (syndromes_match, keys_match, iterations)``

    The caller builds the extended frame and its punctured/shortened LLRs in
    XLA; the kernel computes Alice's syndrome (parity rolls), runs the full
    decode, and compares keys — all in VMEM.
    """
    call, fdtype, tb, n, m = _build(
        qc, algorithm, max_iterations, use_threshold, batch_tile, interpret,
        mode="frame", schedule=schedule,
    )

    def _impl(alice_frame, llr, prim, sec, thr):
        b = alice_frame.shape[0]
        pad = (-b) % tb
        alice_frame = jnp.pad(alice_frame.astype(jnp.int32), ((0, pad), (0, 0)))
        llr = jnp.pad(llr.astype(fdtype), ((0, pad), (0, 0)))
        llr = llr.at[b:, :].set(1.0) if pad else llr
        bp = b + pad
        conv, keys, iters = call(bp // tb, bp, alice_frame, llr, prim, sec, thr)
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
