"""Fused Pallas QC decoder vs the generic decoder (interpret mode on CPU).

Decisions and convergence flags must match exactly; iteration counts match
exactly for non-adaptive algorithms and within a small tolerance for the
adaptive pair (f32 accumulation-order differences feed back through the
discrete per-check factor selection).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.layout import layout_for
from qkd_ldpc_v_tpu.models.qc import generate_qc_ldpc
from qkd_ldpc_v_tpu.ops.channel import calculate_syndrome
from qkd_ldpc_v_tpu.ops.decoders import make_decoder
from qkd_ldpc_v_tpu.ops.pallas_qc import make_pallas_qc_decoder


@pytest.fixture(scope="module")
def qc():
    return generate_qc_ldpc(base_bits=8, base_checks=4, lifting=128,
                            column_weight=3, seed=5)


@pytest.fixture(scope="module")
def channel(qc):
    rng = np.random.default_rng(0)
    batch = 8
    n = qc.num_bit_nodes
    alice = jnp.asarray(rng.integers(0, 2, (batch, n)), jnp.int8)
    bob = alice ^ jnp.asarray(rng.random((batch, n)) < 0.04, jnp.int8)
    log_p = float(np.log(0.96 / 0.04))
    llr = jnp.where(bob == 1, -log_p, log_p).astype(jnp.float32)
    syndrome = calculate_syndrome(layout_for(qc.to_hmatrix()), alice)
    return alice, llr, syndrome


@pytest.mark.parametrize(
    "algorithm,primary,secondary",
    [
        (DecodingAlgorithm.SPA, 1.0, 1.0),
        (DecodingAlgorithm.NMSA, 0.8, 1.0),
        (DecodingAlgorithm.OMSA, 0.3, 1.0),
        (DecodingAlgorithm.AOMSA, 0.3, 0.6),
    ],
)
def test_matches_generic(qc, channel, algorithm, primary, secondary):
    alice, llr, syndrome = channel
    layout = layout_for(qc.to_hmatrix())
    generic = jax.jit(make_decoder(layout, algorithm, 25, False, jnp.float32))
    fused = jax.jit(
        make_pallas_qc_decoder(
            qc, algorithm, 25, False, batch_tile=8, interpret=True
        )
    )
    rg = generic(llr, syndrome, primary, secondary, 0.0)
    rk = fused(llr, syndrome, primary, secondary, 0.0)
    np.testing.assert_array_equal(
        np.asarray(rk.syndromes_match), np.asarray(rg.syndromes_match)
    )
    np.testing.assert_array_equal(np.asarray(rk.decision), np.asarray(rg.decision))
    if not algorithm.is_adaptive:
        np.testing.assert_array_equal(
            np.asarray(rk.iterations), np.asarray(rg.iterations)
        )
    else:
        assert np.abs(
            np.asarray(rk.iterations) - np.asarray(rg.iterations)
        ).max() <= 3


def test_batch_padding(qc, channel):
    """Batch not divisible by the tile: padding frames must not leak."""
    alice, llr, syndrome = channel
    fused = jax.jit(
        make_pallas_qc_decoder(
            qc, DecodingAlgorithm.NMSA, 25, False, batch_tile=8, interpret=True
        )
    )
    r_full = fused(llr, syndrome, 0.8, 1.0, 0.0)
    r_part = fused(llr[:5], syndrome[:5], 0.8, 1.0, 0.0)
    assert r_part.decision.shape == (5, qc.num_bit_nodes)
    np.testing.assert_array_equal(
        np.asarray(r_part.decision), np.asarray(r_full.decision[:5])
    )
    np.testing.assert_array_equal(
        np.asarray(r_part.iterations), np.asarray(r_full.iterations[:5])
    )


def test_mc_kth_selection_algorithm():
    """NumPy mirror of the mc kernel's 32-pass bitwise k-th-smallest
    selection over unique (rand-high-bits | position) keys: must select
    exactly K positions, uniformly."""
    rng = np.random.default_rng(0)
    n = 10240
    idx_bits = max(1, (n - 1).bit_length())
    for k in (1, 307, 5000):
        bits = rng.integers(0, 2**32, n, dtype=np.uint32)
        keys = (bits >> idx_bits << idx_bits) | np.arange(n, dtype=np.uint32)
        t = np.uint32(0)
        for b in reversed(range(32)):
            cand = t | np.uint32(1 << b)
            if int((keys < cand).sum()) < k:
                t = cand
        sel = keys <= t
        assert sel.sum() == k
        # t is the k-th smallest key
        assert t == np.sort(keys)[k - 1]


# ---------------------------------------------------------------------------
# Layered (serial-C) schedule — the QC kernel's performance mode
# ---------------------------------------------------------------------------


def _layered_oracle(qc, llr_f, syn_f, alg, factor, cap, secondary=1.0):
    """f32 NumPy layered sweep in kernel edge order (block-rows in
    sequence, edges within a row in storage order) — the specification of
    pallas_qc's layered_sweep."""
    from qkd_ldpc_v_tpu.ops.pallas_qc import _base_tables

    z, nb, mb = qc.lifting, qc.base_bits, qc.base_checks
    rows, _, num_be = _base_tables(qc)
    total = llr_f.reshape(nb, z).astype(np.float32).copy()
    c2b = np.zeros((num_be, z), np.float32)
    synb = syn_f.reshape(mb, z)
    big = np.float32(np.finfo(np.float32).max)
    for it in range(1, cap + 1):
        for r in range(mb):
            msgs = [
                np.roll(total[c], -(s % z)) - c2b[e] for (e, c, s) in rows[r]
            ]
            a = np.abs(msgs)
            min1 = a[0].copy()
            min2 = np.full(z, big)
            for ai in a[1:]:
                min2 = np.minimum(min2, np.maximum(min1, ai))
                min1 = np.minimum(min1, ai)
            neg = sum((mm < 0).astype(np.int32) for mm in msgs)
            ss = np.where(synb[r] == 1, -1.0, 1.0).astype(np.float32)
            row_sign = ss * np.where(neg % 2 == 0, 1.0, -1.0).astype(
                np.float32
            )
            if alg in (DecodingAlgorithm.ANMSA, DecodingAlgorithm.AOMSA):
                acc = np.zeros(z, np.int32)
                for (e, c, s) in rows[r]:
                    acc = acc ^ (np.roll(total[c], -(s % z)) <= 0).astype(
                        np.int32
                    )
                mism = acc ^ synb[r]
                f = np.where(mism != 0, np.float32(secondary),
                             np.float32(factor)).astype(np.float32)
            else:
                f = np.float32(factor)
            for (e, c, s), mm, ai in zip(rows[r], msgs, a):
                excl = np.where(mm > 0, 1.0, -1.0).astype(np.float32)
                eabs = np.where(ai == min1, min2, min1)
                if alg in (DecodingAlgorithm.NMSA, DecodingAlgorithm.ANMSA):
                    val = (f * row_sign * excl * eabs).astype(np.float32)
                else:
                    val = (row_sign * excl * np.maximum(
                        eabs - f, np.float32(0))
                    ).astype(np.float32)
                total[c] = (total[c] + np.roll(val - c2b[e], s % z)
                            ).astype(np.float32)
                c2b[e] = val
        dec = (total <= 0).astype(np.int8)
        ok = True
        for r in range(mb):
            acc = np.zeros(z, np.int8)
            for (e, c, s) in rows[r]:
                acc = acc ^ np.roll(dec[c], -(s % z))
            if not np.array_equal(acc, synb[r]):
                ok = False
        if ok:
            return dec.reshape(-1), it, True
    return dec.reshape(-1), cap, False


@pytest.mark.parametrize("algorithm,factor,secondary", [
    (DecodingAlgorithm.NMSA, 0.8, 1.0),
    (DecodingAlgorithm.OMSA, 0.3, 1.0),
    (DecodingAlgorithm.ANMSA, 0.88, 0.5),
    (DecodingAlgorithm.AOMSA, 0.3, 0.6),
])
def test_layered_matches_numpy_oracle(qc, channel, algorithm, factor,
                                      secondary):
    alice, llr, syn = channel
    dec = jax.jit(make_pallas_qc_decoder(
        qc, algorithm, 30, False, batch_tile=8, interpret=True,
        schedule="layered",
    ))
    rk = dec(llr, syn, factor, secondary, 0.0)
    for f in range(alice.shape[0]):
        d_o, it_o, conv_o = _layered_oracle(
            qc, np.asarray(llr)[f], np.asarray(syn)[f], algorithm, factor,
            30, secondary=secondary,
        )
        assert bool(np.asarray(rk.syndromes_match)[f]) == conv_o
        assert int(np.asarray(rk.iterations)[f]) == it_o
        np.testing.assert_array_equal(np.asarray(rk.decision)[f], d_o)


def test_layered_converges_faster(qc, channel):
    """The point of the mode: ~2x fewer sweeps than flooding."""
    alice, llr, syn = channel
    flood = jax.jit(make_pallas_qc_decoder(
        qc, DecodingAlgorithm.NMSA, 30, False, batch_tile=8, interpret=True,
    ))
    lay = jax.jit(make_pallas_qc_decoder(
        qc, DecodingAlgorithm.NMSA, 30, False, batch_tile=8, interpret=True,
        schedule="layered",
    ))
    rf = flood(llr, syn, 0.8, 1.0, 0.0)
    rl = lay(llr, syn, 0.8, 1.0, 0.0)
    assert np.asarray(rl.syndromes_match).all()
    assert (
        np.asarray(rl.iterations).mean() < np.asarray(rf.iterations).mean()
    )
    # converged layered frames recover Alice's key at this easy point
    np.testing.assert_array_equal(np.asarray(rl.decision), np.asarray(alice))


def test_layered_rejects_unsupported(qc):
    with pytest.raises(ValueError, match="layered"):
        make_pallas_qc_decoder(
            qc, DecodingAlgorithm.SPA, 30, False, interpret=True,
            schedule="layered",
        )


def test_layered_frame_mode_runs(qc):
    """Rate-adaptive frame kernel under the layered schedule: decodes an
    easy point to Alice's keys."""
    from qkd_ldpc_v_tpu.ops.pallas_qc import make_pallas_qc_frame_trial

    rng = np.random.default_rng(17)
    n = qc.num_bit_nodes
    alice = jnp.asarray(rng.integers(0, 2, (6, n)), jnp.int8)
    bob = alice ^ jnp.asarray(rng.random((6, n)) < 0.02, jnp.int8)
    log_p = float(np.log(0.98 / 0.02))
    llr = jnp.where(bob == 1, -log_p, log_p).astype(jnp.float32)
    frame = jax.jit(make_pallas_qc_frame_trial(
        qc, DecodingAlgorithm.NMSA, 30, False,
        batch_tile=8, interpret=True, schedule="layered",
    ))
    conv, keys, iters = frame(alice, llr, 0.8, 1.0, 0.0)
    assert np.asarray(conv).all()
    assert np.asarray(keys).all()
    assert (np.asarray(iters) <= 30).all()


def test_driver_layered_falls_back_with_warning(qc, caplog):
    """SPA + layered: the driver warns and floods (reference semantics)."""
    import logging

    from qkd_ldpc_v_tpu.config import Config, RQBERRange
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams
    from qkd_ldpc_v_tpu.simulation import (
        ScalingFactors, SimCombination, run_combination,
    )

    cfg = Config(
        trials_number=8,
        simulation_seed=3,
        decoding_algorithm=DecodingAlgorithm.SPA,
        decoding_alg_max_iterations=30,
        r_qber_ranges=(RQBERRange(0.99, 0.02, 0.02, 0.01),),
        batch_size=8,
        use_pallas=True,
        schedule="layered",
    )
    comb = SimCombination(0.02, HMatrixParams(), ScalingFactors())
    with caplog.at_level(logging.WARNING, logger="qkd_ldpc_v_tpu"):
        res = run_combination(qc.to_hmatrix(), comb, cfg, sim_number=0)
    assert any("layered" in r.message for r in caplog.records)
    assert 0.0 <= res.ratio_trials_success_ldpc <= 1.0


def test_mc_mode_full_plumbing_with_stubbed_prng(qc, monkeypatch):
    """The fused kernel's mc mode is TPU-only in production (hardware
    PRNG); here the PRNG is stubbed with a deterministic mixable stream in
    interpret mode and mirrored on the host — the kernel's (conv,
    keys_match, iters) must exactly equal the XLA decoder run on the
    mirrored channel (same stream contract as the streamed QC engine's
    test, tests/test_pallas_qc_stream.py)."""
    from qkd_ldpc_v_tpu.ops import pallas_qc as pk
    from qkd_ldpc_v_tpu.ops.channel import syndrome_internal
    from qkd_ldpc_v_tpu.ops.decoders import get_decoder

    calls = {"n": 0}

    def fake_seed(*_seeds):
        calls["n"] = 0

    def fake_bits(shape):
        k = calls["n"]
        calls["n"] += 1
        a = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(7919)
        b = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) * jnp.uint32(104729)
        x = a ^ b ^ jnp.uint32(k * 97531)
        x = (x ^ (x >> 13)) * jnp.uint32(2654435761)
        return x ^ (x >> 16)

    monkeypatch.setattr(pk.pltpu, "prng_seed", fake_seed)
    monkeypatch.setattr(pk.pltpu, "prng_random_bits", fake_bits)

    z = qc.lifting
    nb = qc.base_bits
    n = qc.num_bit_nodes
    tb = 8
    ne = 25
    qber = ne / n
    mc = pk.make_pallas_qc_montecarlo(
        qc, DecodingAlgorithm.NMSA, 30, False, batch=tb, batch_tile=tb,
        interpret=True,
    )
    conv, keys, iters = mc(3, ne, qber, 0.8, 0.0, 0.0)

    def np_bits(k):
        a = np.arange(tb, dtype=np.uint32)[:, None] * np.uint32(7919)
        b = np.arange(z, dtype=np.uint32)[None, :] * np.uint32(104729)
        with np.errstate(over="ignore"):
            x = (a ^ b ^ np.uint32(k * 97531)).astype(np.uint32)
            x = ((x ^ (x >> np.uint32(13)))
                 * np.uint32(2654435761)).astype(np.uint32)
        return (x ^ (x >> np.uint32(16))).astype(np.uint32)

    idx_bits = max(1, (n - 1).bit_length())
    alice = np.zeros((tb, n), np.int8)
    ekeys = np.zeros((tb, n), np.uint32)
    for c in range(nb):
        alice[:, c * z:(c + 1) * z] = (np_bits(c) & 1).astype(np.int8)
    for c in range(nb):
        eb = np_bits(nb + c)
        pos = (np.arange(z, dtype=np.uint32) + np.uint32(c * z))[None, :]
        ekeys[:, c * z:(c + 1) * z] = (
            (eb >> np.uint32(idx_bits)) << np.uint32(idx_bits)
        ) | pos
    thr = np.sort(ekeys, axis=1)[:, ne - 1:ne]
    bob = alice ^ (ekeys <= thr).astype(np.int8)

    qf = jnp.float32(qber)
    log_p = jnp.log((1.0 - qf) / qf)
    llr = np.where(bob == 1, -np.float32(log_p),
                   np.float32(log_p)).astype(np.float32)
    matrix = qc.to_hmatrix()
    layout = layout_for(matrix)
    bit_order = np.asarray(layout.bit_order)
    syn_int = np.asarray(
        syndrome_internal(layout, jnp.asarray(alice[:, bit_order]))
    )
    syn_ext = syn_int[:, np.asarray(layout.check_inv)]
    ref = get_decoder(layout, DecodingAlgorithm.NMSA, 30, False,
                      dtype=jnp.float32, jit=False)
    rres = ref(jnp.asarray(llr), jnp.asarray(syn_ext), 0.8, 0.0, 0.0)
    exp_keys = (np.asarray(rres.decision) == alice).all(axis=1) & np.asarray(
        rres.syndromes_match
    )
    np.testing.assert_array_equal(
        np.asarray(conv), np.asarray(rres.syndromes_match)
    )
    np.testing.assert_array_equal(
        np.asarray(iters), np.asarray(rres.iterations)
    )
    np.testing.assert_array_equal(np.asarray(keys), exp_keys)
