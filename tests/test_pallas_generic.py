"""Fused generic-layout Pallas decoder (interpret mode on CPU) vs the XLA
decoder, plus the Clos permutation plan it is built on.

On converged frames the fused kernel must agree with the XLA decoder on
decisions, convergence flags, and iteration counts; unconverged frames may
diverge (decisions ride the message mantissa LSB — a deliberate 1-ulp
perturbation documented in ops/pallas_generic.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.models.hmatrix import from_dense
from qkd_ldpc_v_tpu.models.layout import layout_for
from qkd_ldpc_v_tpu.ops.channel import calculate_syndrome
from qkd_ldpc_v_tpu.ops.decoders import make_decoder
from qkd_ldpc_v_tpu.ops.pallas_generic import (
    build_generic_plan,
    generic_plan_feasible,
    make_pallas_generic_decoder,
    make_pallas_generic_frame_trial,
    make_pallas_generic_trial,
)
from qkd_ldpc_v_tpu.ops.permute_plan import (
    apply_plan_reference,
    build_permute_plan,
)


# ---------------------------------------------------------------------------
# Permutation plan
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("tiles", [1, 2])
def test_permute_plan_realizes_any_permutation(tiles):
    rng = np.random.default_rng(7 + tiles)
    s = 128 * 128 * tiles
    g = rng.permutation(s)
    plan = build_permute_plan(g)
    x = rng.standard_normal((3, s)).astype(np.float32)
    np.testing.assert_array_equal(apply_plan_reference(plan, x), x[:, g])


def test_permute_plan_rejects_non_permutation():
    with pytest.raises(ValueError):
        build_permute_plan(np.zeros(128 * 128, dtype=np.int64))


# ---------------------------------------------------------------------------
# Fused decoder
# ---------------------------------------------------------------------------


def irregular_matrix():
    """Small irregular code: mixed column weights 2..5, mixed row weights."""
    rng = np.random.default_rng(11)
    n, m = 288, 144
    dense = np.zeros((m, n), dtype=np.int8)
    for col in range(n):
        w = 2 + (col % 4)
        rows = rng.choice(m, size=w, replace=False)
        dense[rows, col] = 1
    for row in range(m):  # no empty checks
        if dense[row].sum() == 0:
            dense[row, rng.integers(0, n)] = 1
    return from_dense(dense)


def channel_case(matrix, batch, qber, seed):
    rng = np.random.default_rng(seed)
    n = matrix.num_bit_nodes
    alice = jnp.asarray(rng.integers(0, 2, (batch, n)), jnp.int8)
    bob = alice ^ jnp.asarray(rng.random((batch, n)) < qber, jnp.int8)
    log_p = float(np.log((1 - qber) / qber))
    llr = jnp.where(bob == 1, -log_p, log_p).astype(jnp.float32)
    syn = calculate_syndrome(layout_for(matrix), alice)
    return alice, bob, llr, syn


ALG_CASES = [
    (DecodingAlgorithm.SPA, 1.0, 1.0),
    (DecodingAlgorithm.SPA_APPROX, 1.0, 1.0),
    (DecodingAlgorithm.NMSA, 0.8, 1.0),
    (DecodingAlgorithm.OMSA, 0.3, 1.0),
    (DecodingAlgorithm.ANMSA, 0.88, 0.5),
    (DecodingAlgorithm.AOMSA, 0.3, 0.6),
]


@pytest.mark.parametrize("algorithm,primary,secondary", ALG_CASES)
@pytest.mark.parametrize("use_threshold", [False, True])
def test_matches_xla_decoder(medium_matrix, algorithm, primary, secondary,
                             use_threshold):
    alice, bob, llr, syn = channel_case(medium_matrix, 8, 0.03, 3)
    layout = layout_for(medium_matrix)
    thr = 60.0
    generic = jax.jit(
        make_decoder(layout, algorithm, 30, use_threshold, jnp.float32)
    )
    fused = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, algorithm, 30, use_threshold,
            batch_tile=8, interpret=True, transport="f32",
        )
    )
    rg = generic(llr, syn, primary, secondary, thr)
    rk = fused(llr, syn, primary, secondary, thr)
    conv = np.asarray(rk.syndromes_match)
    np.testing.assert_array_equal(conv, np.asarray(rg.syndromes_match))
    if not algorithm.is_adaptive:
        np.testing.assert_array_equal(
            np.asarray(rk.iterations), np.asarray(rg.iterations)
        )
        # converged frames must agree bit-for-bit
        np.testing.assert_array_equal(
            np.asarray(rk.decision)[conv], np.asarray(rg.decision)[conv]
        )
    else:
        # The decision bit rides the message mantissa LSB; the resulting
        # 1-ulp damping feeds back through the adaptive per-check factor
        # selection, shifting convergence by a few iterations (same
        # tolerance as the QC kernel's adaptive pair).
        assert np.abs(
            np.asarray(rk.iterations) - np.asarray(rg.iterations)
        ).max() <= 4
        both = conv & np.asarray(rg.syndromes_match)
        same_it = both & (
            np.asarray(rk.iterations) == np.asarray(rg.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(rk.decision)[same_it], np.asarray(rg.decision)[same_it]
        )


def test_irregular_code_matches():
    matrix = irregular_matrix()
    assert generic_plan_feasible(matrix)
    plan = build_generic_plan(matrix)
    assert len(plan.bits.groups) >= 3  # genuinely irregular
    alice, bob, llr, syn = channel_case(matrix, 8, 0.02, 5)
    layout = layout_for(matrix)
    generic = jax.jit(
        make_decoder(layout, DecodingAlgorithm.NMSA, 40, False, jnp.float32)
    )
    fused = jax.jit(
        make_pallas_generic_decoder(
            matrix, DecodingAlgorithm.NMSA, 40, False,
            batch_tile=8, interpret=True, transport="f32",
        )
    )
    rg = generic(llr, syn, 0.8, 1.0, 0.0)
    rk = fused(llr, syn, 0.8, 1.0, 0.0)
    conv = np.asarray(rk.syndromes_match)
    np.testing.assert_array_equal(conv, np.asarray(rg.syndromes_match))
    np.testing.assert_array_equal(
        np.asarray(rk.iterations), np.asarray(rg.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(rk.decision)[conv], np.asarray(rg.decision)[conv]
    )


def test_multi_tile_code_matches():
    """Edge space spanning several 128x128 tiles exercises the B-select and
    cross-tile routing stages."""
    matrix = generate_regular_ldpc(
        num_bits=4096, num_checks=2048, column_weight=5, seed=21
    )
    plan = build_generic_plan(matrix)
    assert plan.n_tiles >= 2
    alice, bob, llr, syn = channel_case(matrix, 8, 0.02, 9)
    layout = layout_for(matrix)
    generic = jax.jit(
        make_decoder(layout, DecodingAlgorithm.NMSA, 12, False, jnp.float32)
    )
    fused = jax.jit(
        make_pallas_generic_decoder(
            matrix, DecodingAlgorithm.NMSA, 12, False,
            batch_tile=8, interpret=True, transport="f32",
        )
    )
    rg = generic(llr, syn, 0.8, 1.0, 0.0)
    rk = fused(llr, syn, 0.8, 1.0, 0.0)
    conv = np.asarray(rk.syndromes_match)
    np.testing.assert_array_equal(conv, np.asarray(rg.syndromes_match))
    np.testing.assert_array_equal(
        np.asarray(rk.iterations), np.asarray(rg.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(rk.decision)[conv], np.asarray(rg.decision)[conv]
    )


def test_trial_kernel_matches_decode(medium_matrix):
    alice, bob, llr, syn = channel_case(medium_matrix, 8, 0.02, 13)
    fused = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=8, interpret=True, transport="f32",
        )
    )
    trial = jax.jit(
        make_pallas_generic_trial(
            medium_matrix, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=8, interpret=True, transport="f32",
        )
    )
    rd = fused(llr, syn, 0.8, 1.0, 0.0)
    conv, keys, iters = trial(alice, bob, 0.02, 0.8, 1.0, 0.0)
    np.testing.assert_array_equal(
        np.asarray(conv), np.asarray(rd.syndromes_match)
    )
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(rd.iterations))
    expect_keys = np.all(
        np.asarray(rd.decision) == np.asarray(alice), axis=1
    ) & np.asarray(conv)
    got = np.asarray(keys)
    np.testing.assert_array_equal(got[np.asarray(conv)],
                                  expect_keys[np.asarray(conv)])


def test_frame_kernel_runs(medium_matrix):
    alice, bob, llr, syn = channel_case(medium_matrix, 6, 0.02, 17)
    frame = jax.jit(
        make_pallas_generic_frame_trial(
            medium_matrix, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=8, interpret=True,
        )
    )
    conv, keys, iters = frame(alice, llr, 0.8, 1.0, 0.0)
    assert np.asarray(conv).all()  # easy point: everything decodes
    assert np.asarray(keys).all()
    assert (np.asarray(iters) <= 30).all()


def test_batch_padding(medium_matrix):
    """Batch not divisible by the tile: padding frames must not leak."""
    alice, bob, llr, syn = channel_case(medium_matrix, 5, 0.02, 19)
    fused = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=8, interpret=True,
        )
    )
    r = fused(llr, syn, 0.8, 1.0, 0.0)
    assert r.decision.shape == (5, medium_matrix.num_bit_nodes)
    assert np.asarray(r.syndromes_match).all()


def test_feasibility_gate():
    tiny = generate_regular_ldpc(num_bits=96, num_checks=48, column_weight=3,
                                 seed=7)
    assert generic_plan_feasible(tiny)


# ---------------------------------------------------------------------------
# bf16x2 transport (the production default for the min-sum family)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("algorithm,primary,secondary", [
    (DecodingAlgorithm.NMSA, 0.8, 1.0),
    (DecodingAlgorithm.OMSA, 0.3, 1.0),
    (DecodingAlgorithm.AOMSA, 0.3, 0.6),
])
def test_bf16x2_transport_decodes(medium_matrix, algorithm, primary,
                                  secondary):
    """Packed transport (two frames per f32 word through the regroup) must
    decode correctly: on this easy operating point every frame converges to
    Alice's key, and iteration counts stay within a small window of the
    f32-transport path (messages are bf16-rounded in flight)."""
    alice, bob, llr, syn = channel_case(medium_matrix, 8, 0.02, 23)
    exact = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, algorithm, 30, False,
            batch_tile=8, interpret=True, transport="f32",
        )
    )
    fast = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, algorithm, 30, False,
            batch_tile=8, interpret=True, transport="bf16x2",
        )
    )
    re_ = exact(llr, syn, primary, secondary, 0.0)
    rf = fast(llr, syn, primary, secondary, 0.0)
    assert np.asarray(rf.syndromes_match).all()
    np.testing.assert_array_equal(
        np.asarray(rf.decision), np.asarray(alice)
    )
    assert np.abs(
        np.asarray(rf.iterations) - np.asarray(re_.iterations)
    ).max() <= 4


@pytest.mark.parametrize("algorithm,primary,secondary", [
    (DecodingAlgorithm.NMSA, 0.8, 1.0),
    (DecodingAlgorithm.AOMSA, 0.3, 0.6),
])
def test_i8x4_transport_decodes(medium_matrix, algorithm, primary,
                                secondary):
    """Experimental quantized transport (four frames per f32 word as 7-bit
    saturating fixed point). Below threshold it must still decode every
    frame to Alice's key; quantization slows convergence, so the iteration
    window is wider than bf16x2's. NOT the production default: at the
    reference 10k matrix's near-threshold operating point the quantization
    noise collapses FER (measured 0.18 vs 0.0024 at QBER 0.03) — see
    docs/KERNEL.md."""
    alice, bob, llr, syn = channel_case(medium_matrix, 8, 0.02, 23)
    exact = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, algorithm, 40, False,
            batch_tile=8, interpret=True, transport="f32",
        )
    )
    fast = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, algorithm, 40, False,
            batch_tile=8, interpret=True, transport="i8x4",
        )
    )
    re_ = exact(llr, syn, primary, secondary, 0.0)
    rf = fast(llr, syn, primary, secondary, 0.0)
    assert np.asarray(rf.syndromes_match).all()
    np.testing.assert_array_equal(
        np.asarray(rf.decision), np.asarray(alice)
    )
    assert np.abs(
        np.asarray(rf.iterations) - np.asarray(re_.iterations)
    ).max() <= 12


def test_bf16x2_trial_matches_decode(medium_matrix):
    """Packed trial kernel must agree with the packed decode kernel on the
    same channel realization (same transport, same trajectories)."""
    alice, bob, llr, syn = channel_case(medium_matrix, 8, 0.02, 29)
    fused = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=8, interpret=True, transport="bf16x2",
        )
    )
    trial = jax.jit(
        make_pallas_generic_trial(
            medium_matrix, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=8, interpret=True, transport="bf16x2",
        )
    )
    rd = fused(llr, syn, 0.8, 1.0, 0.0)
    conv, keys, iters = trial(alice, bob, 0.02, 0.8, 1.0, 0.0)
    np.testing.assert_array_equal(
        np.asarray(conv), np.asarray(rd.syndromes_match)
    )
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(rd.iterations))
    expect_keys = np.all(
        np.asarray(rd.decision) == np.asarray(alice), axis=1
    ) & np.asarray(conv)
    np.testing.assert_array_equal(np.asarray(keys), expect_keys)


def test_bf16x2_multi_tile_irregular():
    """Packed transport through the full Clos pipeline on a multi-tile
    irregular-ish code."""
    matrix = generate_regular_ldpc(
        num_bits=4096, num_checks=2048, column_weight=5, seed=21
    )
    alice, bob, llr, syn = channel_case(matrix, 8, 0.02, 31)
    fast = jax.jit(
        make_pallas_generic_decoder(
            matrix, DecodingAlgorithm.NMSA, 40, False,
            batch_tile=8, interpret=True, transport="bf16x2",
        )
    )
    rf = fast(llr, syn, 0.8, 1.0, 0.0)
    conv = np.asarray(rf.syndromes_match)
    assert conv.all()
    np.testing.assert_array_equal(np.asarray(rf.decision), np.asarray(alice))


def test_bf16x2_odd_batch_padding(medium_matrix):
    alice, bob, llr, syn = channel_case(medium_matrix, 5, 0.02, 37)
    fused = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=8, interpret=True, transport="bf16x2",
        )
    )
    r = fused(llr, syn, 0.8, 1.0, 0.0)
    assert r.decision.shape == (5, medium_matrix.num_bit_nodes)
    assert np.asarray(r.syndromes_match).all()


def test_bf16x2_rejects_odd_tile(medium_matrix):
    with pytest.raises(ValueError):
        make_pallas_generic_decoder(
            medium_matrix, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=7, interpret=True, transport="bf16x2",
        )


def test_spa_ignores_transport(medium_matrix):
    """SPA always uses f32 transport; requesting bf16x2 must not change its
    results (the flag is a no-op for the SPA family)."""
    alice, bob, llr, syn = channel_case(medium_matrix, 8, 0.02, 41)
    a = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, DecodingAlgorithm.SPA, 30, False,
            batch_tile=8, interpret=True, transport="f32",
        )
    )
    b = jax.jit(
        make_pallas_generic_decoder(
            medium_matrix, DecodingAlgorithm.SPA, 30, False,
            batch_tile=8, interpret=True, transport="bf16x2",
        )
    )
    ra = a(llr, syn, 1.0, 1.0, 0.0)
    rb = b(llr, syn, 1.0, 1.0, 0.0)
    np.testing.assert_array_equal(np.asarray(ra.decision),
                                  np.asarray(rb.decision))
    np.testing.assert_array_equal(np.asarray(ra.iterations),
                                  np.asarray(rb.iterations))


def test_mc_mode_full_plumbing_with_stubbed_prng(monkeypatch):
    """The generic kernel's mc mode is TPU-only in production (hardware
    PRNG). Stubbing the PRNG with a deterministic mixable stream and
    mirroring the flat node-plane channel on the host isolates the mc
    prologue (key generation, valid-lane masking, k-th-smallest error
    selection): mc output must exactly equal the trial kernel fed the
    mirrored Alice/Bob keys (identical decode path)."""
    from qkd_ldpc_v_tpu.ops import pallas_generic as pg

    matrix = generate_regular_ldpc(512, 256, 3, seed=21)
    plan = pg.plan_for(matrix)
    nbr = plan.bits.node_rows
    width = nbr * 128
    tb = 8
    ne = 12
    n = matrix.num_bit_nodes
    qber = ne / n

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

    monkeypatch.setattr(pg.pltpu, "prng_seed", fake_seed)
    monkeypatch.setattr(pg.pltpu, "prng_random_bits", fake_bits)

    mc = pg.make_pallas_generic_montecarlo(
        matrix, DecodingAlgorithm.NMSA, 30, False, batch=tb, batch_tile=tb,
        interpret=True,
    )
    got = [np.asarray(x) for x in mc(3, ne, qber, 0.8, 0.0, 0.0)]

    # Host mirror of the flat node-plane channel.
    def np_bits(k):
        a = np.arange(tb, dtype=np.uint32)[:, None] * np.uint32(7919)
        b = np.arange(width, dtype=np.uint32)[None, :] * np.uint32(104729)
        with np.errstate(over="ignore"):
            x = (a ^ b ^ np.uint32(k * 97531)).astype(np.uint32)
            x = ((x ^ (x >> np.uint32(13)))
                 * np.uint32(2654435761)).astype(np.uint32)
        return (x ^ (x >> np.uint32(16))).astype(np.uint32)

    idx_bits = max(1, (width - 1).bit_length())
    alice_flat = (np_bits(0) & 1).astype(np.int32)
    ebits = np_bits(1)
    pos = np.arange(width, dtype=np.uint32)[None, :]
    valid = np.zeros(width, bool)
    for d, count, blocks, noff, eoff in plan.bits.groups:
        valid[noff * 128:noff * 128 + count] = True
    keys = ((ebits >> np.uint32(idx_bits)) << np.uint32(idx_bits)) | pos
    keys = np.where(valid[None, :], keys, np.uint32(0xFFFFFFFF))
    thr = np.sort(keys, axis=1)[:, ne - 1:ne]
    flip = (keys <= thr).astype(np.int32)
    assert ((flip * valid[None, :]).sum(axis=1) == ne).all()
    bob_flat = alice_flat ^ flip

    plane_pos = np.asarray(plan.bits.plane_pos)
    alice_ext = alice_flat[:, plane_pos].astype(np.int8)
    bob_ext = bob_flat[:, plane_pos].astype(np.int8)

    trial = pg.make_pallas_generic_trial(
        matrix, DecodingAlgorithm.NMSA, 30, False, batch_tile=tb,
        interpret=True,
    )
    exp = [np.asarray(x) for x in trial(
        jnp.asarray(alice_ext), jnp.asarray(bob_ext), qber, 0.8, 0.0, 0.0
    )]
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)
