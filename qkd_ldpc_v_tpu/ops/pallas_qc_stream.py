"""HBM-resident Pallas TPU decoder for QC-LDPC codes too large for VMEM.

The fused QC kernel (ops/pallas_qc.py) holds the whole per-tile message
state in VMEM, which caps the frame size — near N ~ 40k under Mosaic's
16 MiB default scoped limit (the round-3 world this engine was built in),
near N ~ 330k for CW=3 at the measured 84 MiB declared-plane budget
(round 5, BASELINE.md §tile-sweep). This engine lifts the cap further
for quasi-cyclic codes the TPU-native way the round-2 review asked for:
**circulant rolls instead of Clos permutes, block-rows streamed through
VMEM**:

  * the *bit totals* (one [TB, Z] plane per base column — N floats per
    frame) stay resident in VMEM for the whole decode;
  * the *extrinsic check->bit messages* (one plane per block edge — the
    state that scales with the edge count) live in HBM and stream through
    double-buffered VMEM slabs one **block-row** at a time;
  * every cross-alignment move is a `pltpu.roll` of a [TB, Z] plane — the
    QC structure's permutation — so there is no gather/permute pipeline at
    all, unlike the generic streaming engine (ops/pallas_stream.py) this
    replaces for QC codes.

Per sweep the HBM traffic is exactly one read + one write of the extrinsic
state (2 * 4 bytes * cw * N per frame); everything else is VPU work on
VMEM-resident planes, so the kernel's speed of light is HBM bandwidth —
see BASELINE.md for the measured bytes/s against the v5e roof.

Exactness: the engine restates the flooding decoder (reference
src/qkd_ldpc_algorithm.cpp:317-650) in totals + extrinsics form. With
E_old/E_new the check->bit extrinsics and T the bit totals, the bit->check
message of edge e in check r is clamp(roll(T, -s) - E_old[e]) — the clamp
commutes with the roll, so this reproduces the fused kernel's
clamp(total - ep) **bit for bit** — and the new totals are rebuilt fresh
each iteration with the accumulator *starting at the channel LLR* and the
messages added in base-row order — ((llr+e1)+e2)+..., the reference's
std::accumulate-from-llr association (:78) shared by the fused kernel
and the f64 exact mode. (Round 5: the messages-first order used before,
(e1+e2+e3)+llr, flipped one near-waterfall N=102400 frame per 512 by one
sweep against the fused kernel — f32 association across engines is
load-bearing at production scale.) Flooding is therefore exactly equal
to the fused kernel and the XLA float32 decoder
(tests/test_pallas_qc_stream.py), like the generic streaming engine's
f32 transport. The layered schedule instead updates totals
incrementally row by row — identical arithmetic to the fused layered
kernel and its NumPy oracle (tests/test_pallas_qc.py::_layered_oracle).

Early exit is per tile of TB frames; convergence freezing masks the totals
update with the per-frame converged column instead of keeping frozen
decision planes (a converged frame's totals — hence decisions — stop
moving, observationally identical to the fused kernel's frozen snapshot).

Modes mirror the fused kernel: ``decode`` (library API), ``trial``
(host-generated keys; the CPU interpret path), ``mc`` (fully in-kernel
Monte-Carlo with the hardware PRNG; TPU-only — Alice's keys spill to an
HBM side buffer and stream back for the final comparison). Schedules:
``flooding`` (the reference's; all six algorithms) and ``layered``
(min-sum family, the beyond-reference performance mode).

Mosaic notes (probed empirically, see .claude memory): rotates and
while-loop carries must be 32-bit; `atanh` via the log identity;
`prng_seed` has no CPU interpreter; DMA + semaphores work in interpret
mode.
"""

from __future__ import annotations

import math
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
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

# VMEM budget for the resident planes (totals, channel LLRs, rebuild
# accumulator, syndrome, streaming slabs, staging). This models only the
# planes the engine allocates itself; compiler stack temporaries push the
# real live set well past Mosaic's 16 MiB *default* scoped limit — hence
# the computed vmem_limit_bytes request below. The v5e core physically
# has 128 MiB of VMEM; 120 MiB of scratch is the probed request ceiling
# (scripts/probe_vmem.py) and ~84 MiB of *declared* planes the measured
# workable set (round 5, pallas_qc._VMEM_BUDGET — stack temporaries eat
# the rest). With the fused kernel serving every committed frame size,
# this engine is the next capacity tier: codes whose *fused* live set
# (which adds one [TB, Z] plane per block edge) overflows but whose
# resident totals still fit — roughly N up to ~700k for CW=3/4 QC codes
# at TB=8.
_VMEM_BUDGET = 72 * 1024 * 1024
_VMEM_LIMIT_CAP = 120 * 1024 * 1024
# Floor for the vmem_limit_bytes request: the Z=2048 flagship's flooding
# live set (resident planes + compiler stack temporaries) peaked at
# ~16.7 MiB, past the 16 MiB default; 32 MiB is the measured-working
# request from round 3 (BASELINE.md round-3 streamed-QC section).
_VMEM_LIMIT_FLOOR = 32 * 1024 * 1024
# Compile-size guard: the sweep body unrolls one check update per block
# edge (like the fused kernel); beyond this the Mosaic program gets large
# enough to risk the tunnel's remote-compile helper.
_MAX_BLOCK_EDGES = 420


def _row_tables(qc: QCMatrix):
    """rows[r] = [(be, c, s)] in storage (check-major) order — so each base
    row's block edges are contiguous in the extrinsic array. cols[c] =
    [(be, r, s)] for the per-column prologue/epilogue passes."""
    rows: List[List[Tuple[int, int, int]]] = []
    cols: List[List[Tuple[int, int, int]]] = [
        [] for _ in range(qc.base_bits)
    ]
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


def qc_stream_feasible(qc: QCMatrix, batch_tile: int = 8) -> bool:
    """Whether the streamed QC engine can run this code: Z must be a lane
    multiple, the block-edge count must stay under the compile-size guard,
    and the VMEM-resident planes must fit the budget at the batch tile.
    Engine order puts the fused kernel first wherever it fits
    (simulation.pallas_engine); this gate extends the QC ladder to codes
    whose per-edge message planes overflow the fused budget."""
    if qc.lifting % 128:
        return False
    rows, _, num_be = _row_tables(qc)
    if num_be == 0 or num_be > _MAX_BLOCK_EDGES:
        return False
    if any(not r for r in rows):
        # An all-absent base row has no check update to stream; the
        # generic engines handle such degenerate codes.
        return False
    nb, mb = qc.base_bits, qc.base_checks
    max_deg = max(len(r) for r in rows)
    # Worst case (flooding): totals + channel LLRs + rebuild accumulator +
    # syndrome + two streaming slabs + staging planes + slack.
    units = 3 * nb + mb + 2 * max_deg + 6
    return units * batch_tile * qc.lifting * 4 <= _VMEM_BUDGET


def _build(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int,
    interpret: bool,
    mode: str,  # "decode" | "trial" | "mc"
    schedule: str = "flooding",
):
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    layered = schedule == "layered"
    spa = algorithm in (DecodingAlgorithm.SPA, DecodingAlgorithm.SPA_APPROX)
    if layered and spa:
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
    if algorithm == DecodingAlgorithm.SPA:
        tanh_fn = jnp.tanh
        atanh_fn = lambda x: 0.5 * jnp.log((1.0 + x) / (1.0 - x))  # noqa: E731
    else:
        tanh_fn, atanh_fn = tanh_lin_approx, atanh_lin_approx
    guard = algorithm == DecodingAlgorithm.SPA

    rows, cols, num_be = _row_tables(qc)
    if any(not r for r in rows):
        raise ValueError("streamed QC engine needs every base row "
                         "non-empty (qc_stream_feasible gates this)")
    row_start = [r[0][0] for r in rows]
    max_deg = max(len(r) for r in rows)
    # Flooding rebuilds totals fresh each iteration (exactness); it needs
    # the channel-LLR planes and an accumulator. The accumulator doubles as
    # the mc mode's error-sort-key store (bitcast uint32 planes) — the two
    # uses are disjoint in time.
    need_llr = not layered
    need_tot2 = (not layered) or mode == "mc"
    idx_bits = max(1, (n - 1).bit_length())

    def clamp(x, threshold):
        if use_threshold:
            return jnp.clip(x, -threshold, threshold)
        return x

    def kernel(*args):
        alice_hbm = None
        if mode == "trial":
            (alice_hbm, bob_hbm, qber_ref, prim_ref, sec_ref, thr_ref,
             conv_out, keys_out, iter_out, ext_hbm) = args[:10]
            scratch = args[10:]
        elif mode == "mc":
            (seed_ref, ne_ref, qber_ref, prim_ref, sec_ref, thr_ref,
             conv_out, keys_out, iter_out, ext_hbm, alice_hbm) = args[:11]
            scratch = args[11:]
        else:
            (llr_hbm, syn_hbm, prim_ref, sec_ref, thr_ref,
             conv_out, iter_out, dec_hbm, ext_hbm) = args[:9]
            scratch = args[9:]
        pos = 0
        tot = scratch[pos]; pos += 1
        llr_s = None
        tot2 = None
        if need_llr:
            llr_s = scratch[pos]; pos += 1
        if need_tot2:
            tot2 = scratch[pos]; pos += 1
        (syn_s, slab, stg, sem_in, sem_out, sem_stg) = scratch[pos:pos + 6]

        i = pl.program_id(0)
        primary = prim_ref[0, 0]
        secondary = sec_ref[0, 0]
        threshold = thr_ref[0, 0]
        row_slice = pl.ds(i * tb, tb)

        def syn_sign_block(r):
            return jnp.where(syn_s[r] == 1, -1.0, 1.0).astype(dtype)

        def accumulate_syndrome(c, alice_c):
            """Column-major Alice-syndrome accumulation (parity of rolled
            key blocks; reference src/array_and_matrix_operations.cpp:
            936-950). syn_s must be zeroed before column 0."""
            for (e, r, s) in cols[c]:
                syn_s[r] = syn_s[r] ^ pltpu.roll(alice_c, (-s) % z, axis=1)

        def set_llr(c, value):
            tot[c] = value
            if need_llr:
                llr_s[c] = value

        # ---- prologue: stage channel LLRs (totals), syndrome ----
        if mode == "trial":
            # log((1-q)/q) arrives precomputed by the wrapper — Mosaic's
            # in-kernel log gave this engine and the fused kernel
            # different channel-LLR bits at some QBERs (one near-waterfall
            # frame per 512 then converged one sweep apart; round 5,
            # PARITY.md §Z=2048). Same-bits LLRs keep every engine's
            # trial path on the XLA decoder's exact trajectory.
            log_p = qber_ref[0, 0]
            for r in range(mb):
                syn_s[r] = jnp.zeros((tb, z), jnp.int32)

            # Double-buffered staging: column c+1's Alice and Bob planes
            # stream in while column c computes (stg slots 0/1 = Alice,
            # 2/3 = Bob; sem_in is idle until the sweeps).
            def a_dma(slot, c):
                return pltpu.make_async_copy(
                    alice_hbm.at[row_slice, c * z:(c + 1) * z],
                    stg.at[slot], sem_stg.at[slot],
                )

            def b_dma(slot, c):
                return pltpu.make_async_copy(
                    bob_hbm.at[row_slice, c * z:(c + 1) * z],
                    stg.at[2 + slot], sem_in.at[slot],
                )

            a_dma(0, 0).start()
            b_dma(0, 0).start()
            for c in range(nb):
                slot = c % 2
                if c + 1 < nb:
                    a_dma((c + 1) % 2, c + 1).start()
                    b_dma((c + 1) % 2, c + 1).start()
                a_dma(slot, c).wait()
                accumulate_syndrome(c, stg[slot])
                b_dma(slot, c).wait()
                set_llr(c, jnp.where(
                    stg[2 + slot] == 1, -log_p, log_p
                ).astype(dtype))
        elif mode == "mc":
            # Whole Monte-Carlo trial in-kernel (reference channel
            # semantics: src/array_and_matrix_operations.cpp:889-933):
            # Alice keys and an exactly-num_errors error subset from the
            # per-tile hardware PRNG stream. Alice's planes spill to the
            # HBM side buffer and stream back for the key comparison.
            pltpu.prng_seed(seed_ref[0, 0], i)
            num_errors = ne_ref[0, 0]
            log_p = qber_ref[0, 0]  # precomputed log((1-q)/q) — see trial
            for r in range(mb):
                syn_s[r] = jnp.zeros((tb, z), jnp.int32)
            for c in range(nb):
                slot = c % 2
                if c >= 2:
                    pltpu.make_async_copy(
                        stg.at[slot], alice_hbm.at[i, c - 2],
                        sem_stg.at[slot],
                    ).wait()
                abits = pltpu.bitcast(
                    pltpu.prng_random_bits((tb, z)), jnp.uint32
                )
                alice_c = (abits & 1).astype(jnp.int32)
                stg[slot] = alice_c
                accumulate_syndrome(c, alice_c)
                pltpu.make_async_copy(
                    stg.at[slot], alice_hbm.at[i, c], sem_stg.at[slot],
                ).start()
            for c in (nb - 2, nb - 1):
                if c >= 0:
                    pltpu.make_async_copy(
                        stg.at[c % 2], alice_hbm.at[i, c],
                        sem_stg.at[c % 2],
                    ).wait()
            for c in range(nb):
                ebits = pltpu.bitcast(
                    pltpu.prng_random_bits((tb, z)), jnp.uint32
                )
                posv = (
                    jax.lax.broadcasted_iota(jnp.int32, (tb, z), 1) + c * z
                ).astype(jnp.uint32)
                ekey = (ebits >> idx_bits << idx_bits) | posv
                tot2[c] = pltpu.bitcast(ekey, jnp.float32)
            # num_errors-th smallest key by 32-pass bitwise selection
            # (keys are unique: random high bits | position low bits).
            t = jnp.zeros((tb, 1), jnp.uint32)
            for b in reversed(range(32)):
                cand = t | jnp.uint32(1 << b)
                cnt = jnp.zeros((tb, 1), jnp.int32)
                for c in range(nb):
                    ekey = pltpu.bitcast(tot2[c], jnp.uint32)
                    cnt = cnt + jnp.sum(
                        (ekey < cand).astype(jnp.int32),
                        axis=1, keepdims=True,
                    )
                t = jnp.where(cnt < num_errors, cand, t)
            def a_rd(slot, c):
                return pltpu.make_async_copy(
                    alice_hbm.at[i, c], stg.at[slot], sem_stg.at[slot],
                )

            a_rd(0, 0).start()
            for c in range(nb):
                slot = c % 2
                if c + 1 < nb:
                    a_rd((c + 1) % 2, c + 1).start()
                ekey = pltpu.bitcast(tot2[c], jnp.uint32)
                flip = jnp.where(
                    num_errors > 0, (ekey <= t).astype(jnp.int32), 0
                )
                a_rd(slot, c).wait()
                bob_c = stg[slot] ^ flip
                set_llr(c, jnp.where(
                    bob_c == 1, -log_p, log_p
                ).astype(dtype))
        else:
            for c in range(nb):
                slot = c % 2
                d = pltpu.make_async_copy(
                    llr_hbm.at[row_slice, c * z:(c + 1) * z],
                    tot.at[c], sem_stg.at[slot],
                )
                d.start()
                d.wait()
                if need_llr:
                    llr_s[c] = tot[c]
            for r in range(mb):
                slot = r % 2
                d = pltpu.make_async_copy(
                    syn_hbm.at[row_slice, r * z:(r + 1) * z],
                    syn_s.at[r], sem_stg.at[slot],
                )
                d.start()
                d.wait()

        # ---- extrinsics start at zero: first sweep reads pure channel ----
        slab[0] = jnp.zeros((max_deg, tb, z), dtype)
        for r in range(mb):
            deg = len(rows[r])
            slot = r % 2
            if r >= 2:
                pltpu.make_async_copy(
                    slab.at[0, :len(rows[r - 2])],
                    ext_hbm.at[i, pl.ds(row_start[r - 2], len(rows[r - 2]))],
                    sem_out.at[slot],
                ).wait()
            pltpu.make_async_copy(
                slab.at[0, :deg],
                ext_hbm.at[i, pl.ds(row_start[r], deg)],
                sem_out.at[slot],
            ).start()
        for r in (mb - 2, mb - 1):
            if r >= 0:
                pltpu.make_async_copy(
                    slab.at[0, :len(rows[r])],
                    ext_hbm.at[i, pl.ds(row_start[r], len(rows[r]))],
                    sem_out.at[r % 2],
                ).wait()

        def ext_in(slot, r):
            deg = len(rows[r])
            return pltpu.make_async_copy(
                ext_hbm.at[i, pl.ds(row_start[r], deg)],
                slab.at[slot, :deg], sem_in.at[slot],
            )

        def ext_out(slot, r):
            deg = len(rows[r])
            return pltpu.make_async_copy(
                slab.at[slot, :deg],
                ext_hbm.at[i, pl.ds(row_start[r], deg)],
                sem_out.at[slot],
            )

        def minsum_update(msgs, signs_src, factor):
            """Two-minimum min-sum family check update over one row's
            bit->check messages; exact multiset/tie semantics
            (reference :381-397)."""
            a = [jnp.abs(mm) for mm in msgs]
            min1 = a[0]
            min2 = jnp.full_like(min1, big)
            for ai in a[1:]:
                min2 = jnp.minimum(min2, jnp.maximum(min1, ai))
                min1 = jnp.minimum(min1, ai)
            neg = jnp.zeros(min1.shape, jnp.int32)
            for mm in msgs:
                neg = neg + (mm < 0).astype(jnp.int32)
            row_sign = signs_src * jnp.where(
                neg % 2 == 0, 1.0, -1.0
            ).astype(dtype)
            outs = []
            for mm, ai in zip(msgs, a):
                excl = jnp.where(mm > 0, 1.0, -1.0).astype(dtype)
                eabs = jnp.where(ai == min1, min2, min1)
                if algorithm in (
                    DecodingAlgorithm.NMSA, DecodingAlgorithm.ANMSA
                ):
                    val = factor * row_sign * excl * eabs
                else:
                    val = row_sign * excl * jnp.maximum(eabs - factor, 0.0)
                outs.append(clamp(val.astype(dtype), threshold))
            return outs

        def spa_update(msgs, signs_src):
            ts = [tanh_fn(mm * 0.5) for mm in msgs]
            row_prod = signs_src
            for t in ts:
                row_prod = row_prod * t
            outs = []
            for t in ts:
                ratio = row_prod / t
                if guard:
                    ratio = guard_atanh_ratio(ratio, dtype)
                outs.append(clamp(
                    (2.0 * atanh_fn(ratio)).astype(dtype), threshold
                ))
            return outs

        def dsyn_ok():
            """[TB, 1] int32: 1 where the current totals' decisions satisfy
            every check (rolled-total signs — no decision planes)."""
            ok = None
            for r in range(mb):
                acc = None
                for (e, c, s) in rows[r]:
                    bit = (pltpu.roll(tot[c], (-s) % z, axis=1) <= 0)
                    bit = bit.astype(jnp.int32)
                    acc = bit if acc is None else acc ^ bit
                row_ok = jnp.all(
                    (acc ^ syn_s[r]) == 0, axis=1, keepdims=True
                )
                ok = row_ok if ok is None else ok & row_ok
            return ok.astype(jnp.int32)

        def sweep(conv_col, collect_ok):
            """One streamed pass over all block-rows. Layered updates the
            totals in place (masked by ``conv_col``); flooding accumulates
            the fresh totals into tot2 (pre-initialized to the channel
            LLRs). With ``collect_ok`` (adaptive) also returns the
            pre-update decision-syndrome check."""
            mask = (conv_col == 0).astype(dtype)  # [TB, 1]
            ok_acc = None
            ext_in(0, 0).start()
            for r in range(mb):
                deg = len(rows[r])
                slot = r % 2
                if r + 1 < mb:
                    nslot = (r + 1) % 2
                    if r >= 1:
                        ext_out(nslot, r - 1).wait()
                    ext_in(nslot, r + 1).start()
                ext_in(slot, r).wait()
                rolled = [
                    pltpu.roll(tot[c], (-s) % z, axis=1)
                    for (e, c, s) in rows[r]
                ]
                olds = [slab[slot, j] for j in range(deg)]
                if layered:
                    msgs = [rt - od for rt, od in zip(rolled, olds)]
                else:
                    # Flooding's bit->check messages are clamped at the
                    # bit-pass output (fused kernel: roll(clamp(total -
                    # ep))); the clamp commutes with the roll.
                    msgs = [
                        clamp(rt - od, threshold)
                        for rt, od in zip(rolled, olds)
                    ]
                need_mism = adaptive or collect_ok
                if need_mism:
                    acc = None
                    for rt in rolled:
                        bit = (rt <= 0).astype(jnp.int32)
                        acc = bit if acc is None else acc ^ bit
                    mism = acc ^ syn_s[r]
                if collect_ok:
                    row_ok = jnp.all(mism == 0, axis=1, keepdims=True)
                    ok_acc = row_ok if ok_acc is None else ok_acc & row_ok
                if spa:
                    vals = spa_update(msgs, syn_sign_block(r))
                else:
                    if adaptive:
                        f = jnp.where(
                            mism != 0, secondary, primary
                        ).astype(dtype)
                    else:
                        f = primary
                    vals = minsum_update(msgs, syn_sign_block(r), f)
                for (e, c, s), od, val, j in zip(
                    rows[r], olds, vals, range(deg)
                ):
                    if layered:
                        delta = pltpu.roll(val - od, s % z, axis=1)
                        tot[c] = tot[c] + delta * mask
                    else:
                        tot2[c] = tot2[c] + pltpu.roll(val, s % z, axis=1)
                    slab[slot, j] = val
                ext_out(slot, r).start()
            for r in (mb - 2, mb - 1):
                if r >= 0:
                    ext_out(r % 2, r).wait()
            return ok_acc.astype(jnp.int32) if collect_ok else None

        if layered:

            def body(carry):
                it, conv, iters = carry
                sweep(conv, collect_ok=False)
                ok = dsyn_ok()
                newly = ok * (1 - conv)
                iters = jnp.where(newly != 0, it + 1, iters)
                return it + 1, jnp.maximum(conv, ok), iters

        elif not adaptive:

            def body(carry):
                it, conv, iters = carry
                # Accumulator starts at the channel LLR so the rebuilt
                # total is ((llr+e1)+e2)+... — the reference's
                # std::accumulate-from-llr order (:78) that the fused
                # kernel and the f64 exact mode share. Round 5 measured
                # the old messages-first order ((e1+e2)+e3)+llr flipping
                # one near-waterfall N=102400 frame per 512 by one sweep
                # against the fused kernel (PARITY.md §Z=2048).
                for c in range(nb):
                    tot2[c] = llr_s[c]
                sweep(conv, collect_ok=False)
                keep = (conv != 0).astype(dtype)
                for c in range(nb):
                    tot[c] = tot[c] * keep + tot2[c] * (1.0 - keep)
                ok = dsyn_ok()
                newly = ok * (1 - conv)
                iters = jnp.where(newly != 0, it + 1, iters)
                return it + 1, jnp.maximum(conv, ok), iters

        else:

            def body(carry):
                it, conv, iters = carry
                # Adaptive pair: convergence from the *previous* decisions,
                # observed inside the check pass; the same per-check
                # mismatch selects the factor (reference :745-776).
                # llr-first accumulation as in the non-adaptive body.
                for c in range(nb):
                    tot2[c] = llr_s[c]
                ok = sweep(conv, collect_ok=True)
                newly = ok * (1 - conv)
                iters = jnp.where(newly != 0, it + 1, iters)
                conv = jnp.maximum(conv, ok)
                keep = (conv != 0).astype(dtype)
                for c in range(nb):
                    tot[c] = tot[c] * keep + tot2[c] * (1.0 - keep)
                return it + 1, conv, iters

        def cond(carry):
            it, conv, iters = carry
            return (it < max_iterations) & ~jnp.all(conv != 0)

        conv0 = jnp.zeros((tb, 1), jnp.int32)
        iters0 = jnp.full((tb, 1), max_iterations, jnp.int32)
        it, conv, iters = jax.lax.while_loop(
            cond, body, (jnp.int32(0), conv0, iters0)
        )

        if mode in ("trial", "mc"):

            def k_rd(slot, c):
                if mode == "trial":
                    return pltpu.make_async_copy(
                        alice_hbm.at[row_slice, c * z:(c + 1) * z],
                        stg.at[slot], sem_stg.at[slot],
                    )
                return pltpu.make_async_copy(
                    alice_hbm.at[i, c], stg.at[slot], sem_stg.at[slot],
                )

            km = None
            k_rd(0, 0).start()
            for c in range(nb):
                slot = c % 2
                if c + 1 < nb:
                    k_rd((c + 1) % 2, c + 1).start()
                dec_c = (tot[c] <= 0).astype(jnp.int32)
                k_rd(slot, c).wait()
                col_ok = jnp.all(dec_c == stg[slot], axis=1, keepdims=True)
                km = col_ok if km is None else km & col_ok
            conv_out[:, :] = conv.astype(jnp.int8)
            keys_out[:, :] = km.astype(jnp.int8)
            iter_out[:, :] = iters
        else:
            for c in range(nb):
                slot = c % 2
                if c >= 2:
                    pltpu.make_async_copy(
                        stg.at[slot],
                        dec_hbm.at[row_slice, (c - 2) * z:(c - 1) * z],
                        sem_stg.at[slot],
                    ).wait()
                stg[slot] = (tot[c] <= 0).astype(jnp.int32)
                pltpu.make_async_copy(
                    stg.at[slot], dec_hbm.at[row_slice, c * z:(c + 1) * z],
                    sem_stg.at[slot],
                ).start()
            for c in (nb - 2, nb - 1):
                if c >= 0:
                    pltpu.make_async_copy(
                        stg.at[c % 2],
                        dec_hbm.at[row_slice, c * z:(c + 1) * z],
                        sem_stg.at[c % 2],
                    ).wait()
            conv_out[:, :] = conv.astype(jnp.int8)
            iter_out[:, :] = iters

    scratch_shapes = [pltpu.VMEM((nb, tb, z), dtype)]       # totals
    if need_llr:
        scratch_shapes += [pltpu.VMEM((nb, tb, z), dtype)]  # channel LLRs
    if need_tot2:
        scratch_shapes += [pltpu.VMEM((nb, tb, z), dtype)]  # rebuild/ekeys
    scratch_shapes += [
        pltpu.VMEM((mb, tb, z), jnp.int32),        # syndrome planes
        pltpu.VMEM((2, max_deg, tb, z), dtype),    # streaming slabs
        pltpu.VMEM((4, tb, z), jnp.int32),         # staging planes
    ]
    # Declared resident bytes + half again as margin: Mosaic's stack
    # temporaries scale with the working set, not a constant — measured
    # ~28% of resident on an N=409600 flooding build (61.88M live over
    # 48.2M declared; a flat 16 MiB margin OOM'd by 648 KiB). Floored at
    # the measured-working 32 MiB request (round-3 flagship: resident
    # ~12 MiB, live peak ~16.7 MiB) and capped at the probed ceiling;
    # _VMEM_BUDGET (the gate) keeps 1.5x resident under the cap.
    resident = sum(
        int(jnp.dtype(s.dtype).itemsize) * math.prod(s.shape)
        for s in scratch_shapes
    )
    vmem_limit = int(min(max(resident + resident // 2,
                             _VMEM_LIMIT_FLOOR), _VMEM_LIMIT_CAP))
    scratch_shapes += [
        pltpu.SemaphoreType.DMA((2,)),             # slab in
        pltpu.SemaphoreType.DMA((2,)),             # slab out
        pltpu.SemaphoreType.DMA((2,)),             # staging
    ]

    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    stats_spec = pl.BlockSpec((tb, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)

    def call(num_tiles, b, *operands):
        ext_shape = jax.ShapeDtypeStruct((num_tiles, num_be, tb, z), dtype)
        if mode == "trial":
            in_specs = [any_spec, any_spec, scalar_spec, scalar_spec,
                        scalar_spec, scalar_spec]
            out_shape = (
                jax.ShapeDtypeStruct((b, 1), jnp.int8),
                jax.ShapeDtypeStruct((b, 1), jnp.int8),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
                ext_shape,
            )
            out_specs = (stats_spec, stats_spec, stats_spec, any_spec)
        elif mode == "mc":
            smem_i32 = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                    memory_space=pltpu.SMEM)
            in_specs = [smem_i32, smem_i32, scalar_spec, scalar_spec,
                        scalar_spec, scalar_spec]
            out_shape = (
                jax.ShapeDtypeStruct((b, 1), jnp.int8),
                jax.ShapeDtypeStruct((b, 1), jnp.int8),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
                ext_shape,
                jax.ShapeDtypeStruct((num_tiles, nb, tb, z), jnp.int32),
            )
            out_specs = (stats_spec, stats_spec, stats_spec, any_spec,
                         any_spec)
        else:
            in_specs = [any_spec, any_spec, scalar_spec, scalar_spec,
                        scalar_spec]
            out_shape = (
                jax.ShapeDtypeStruct((b, 1), jnp.int8),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
                jax.ShapeDtypeStruct((b, n), jnp.int32),
                ext_shape,
            )
            out_specs = (stats_spec, stats_spec, any_spec, any_spec)
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=vmem_limit,
            ),
        )(*operands)

    return call, dtype, tb, n, m


def make_pallas_qc_stream_trial(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch_tile: int = 8,
    interpret: bool = False,
    schedule: str = "flooding",
) -> Callable:
    """Streamed-QC Monte-Carlo trial kernel: raw Alice/Bob keys in,
    per-frame (syndromes_match, keys_match, iterations) out."""
    call, fdtype, tb, n, m = _build(
        qc, algorithm, max_iterations, use_threshold, batch_tile, interpret,
        mode="trial", schedule=schedule,
    )

    def _impl(alice, bob, qb, prim, sec, thr):
        b = alice.shape[0]
        pad = (-b) % tb
        # Padding frames: alice == bob == 0 -> zero syndrome, all-positive
        # LLRs, converge on sweep 1 and never hold the tile open.
        alice = jnp.pad(alice.astype(jnp.int32), ((0, pad), (0, 0)))
        bob = jnp.pad(bob.astype(jnp.int32), ((0, pad), (0, 0)))
        bp = b + pad
        # optimization_barrier pins the log's lowering context so every
        # engine's jit program produces the same scalar bits.
        log_p = jax.lax.optimization_barrier(jnp.log((1.0 - qb) / qb))
        conv, keys, iters, _ = call(
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


def make_pallas_qc_stream_montecarlo(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    batch: int,
    batch_tile: int = 8,
    interpret: bool = False,
    schedule: str = "flooding",
) -> Callable:
    """Fully in-kernel Monte-Carlo trials for streamed QC codes (TPU-only:
    the hardware PRNG has no CPU interpreter). Same contract as
    pallas_qc.make_pallas_qc_montecarlo."""
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
        conv, keys, iters, _, _ = call(
            padded // tb, padded, sd, ne, log_p, prim, sec, thr
        )
        return (
            conv[:batch, 0].astype(bool),
            keys[:batch, 0].astype(bool),
            iters[:batch, 0],
        )

    jitted = [None]

    def mc(seed, num_errors, qber, primary=1.0, secondary=1.0,
           threshold=0.0):
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


def make_pallas_qc_stream_decoder(
    qc: QCMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    dtype=jnp.float32,
    batch_tile: int = 8,
    interpret: bool = False,
    schedule: str = "flooding",
) -> Callable[..., DecodeResult]:
    """Streamed-QC decode kernel (library API): LLRs + syndrome in,
    decisions out. Same signature as make_decoder; float32 only."""
    if jnp.dtype(dtype) != jnp.float32:
        raise ValueError("streamed QC decoder is float32-only")
    call, fdtype, tb, n, m = _build(
        qc, algorithm, max_iterations, use_threshold, batch_tile, interpret,
        mode="decode", schedule=schedule,
    )

    def _impl(llr_ext, syndrome_ext, prim, sec, thr) -> DecodeResult:
        b = llr_ext.shape[0]
        pad = (-b) % tb
        llr = jnp.pad(llr_ext.astype(fdtype), ((0, pad), (0, 0)),
                      constant_values=1.0)
        syndrome = jnp.pad(
            syndrome_ext.astype(jnp.int32), ((0, pad), (0, 0))
        )
        bp = b + pad
        conv, iters, dec, _ = call(
            bp // tb, bp, llr, syndrome, prim, sec, thr
        )
        return DecodeResult(
            decision=dec[:b].astype(jnp.int8),
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
