"""Batched JAX decoders vs the sequential NumPy oracle: exact agreement of
decisions, convergence flags, and iteration counts in f64 across all six
algorithms, with and without the message-LLR threshold."""

import numpy as np
import jax.numpy as jnp
import pytest

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.layout import compile_layout
from qkd_ldpc_v_tpu.ops.channel import calculate_syndrome
from qkd_ldpc_v_tpu.ops.decoders import get_decoder
from tests.oracle import calculate_syndrome as oracle_syndrome
from tests.oracle import decode_oracle

ALGS = list(DecodingAlgorithm)
FACTORS = {
    DecodingAlgorithm.SPA: (1.0, 1.0),
    DecodingAlgorithm.SPA_APPROX: (1.0, 1.0),
    DecodingAlgorithm.NMSA: (0.8, 1.0),
    DecodingAlgorithm.OMSA: (0.25, 1.0),
    DecodingAlgorithm.ANMSA: (0.88, 0.5),
    DecodingAlgorithm.AOMSA: (0.3, 0.6),
}


def make_case(matrix, batch, qber, seed):
    rng = np.random.default_rng(seed)
    n = matrix.num_bit_nodes
    alice = rng.integers(0, 2, size=(batch, n)).astype(np.int8)
    num_errors = int(n * qber)
    bob = alice.copy()
    for b in range(batch):
        pos = rng.permutation(n)[:num_errors]
        bob[b, pos] ^= 1
    q = num_errors / n
    log_p = np.log((1.0 - q) / q)
    llr = np.where(bob == 1, -log_p, log_p).astype(np.float64)
    return alice, bob, llr, q


@pytest.mark.parametrize("alg", ALGS)
@pytest.mark.parametrize("use_threshold", [False, True])
def test_matches_oracle(small_matrix, alg, use_threshold):
    layout = compile_layout(small_matrix)
    batch = 6
    alice, bob, llr, q = make_case(small_matrix, batch, qber=0.04, seed=int(alg) * 10)
    syn = np.asarray(calculate_syndrome(layout, jnp.asarray(alice)))
    primary, secondary = FACTORS[alg]
    max_iters = 60
    thr = 30.0

    decode = get_decoder(layout, alg, max_iters, use_threshold, dtype=jnp.float64)
    res = decode(
        jnp.asarray(llr), jnp.asarray(syn), primary, secondary, thr
    )
    dec = np.asarray(res.decision)
    match = np.asarray(res.syndromes_match)
    iters = np.asarray(res.iterations)

    for b in range(batch):
        o_dec, o_match, o_iters = decode_oracle(
            small_matrix,
            llr[b],
            syn[b],
            int(alg),
            max_iters,
            primary,
            secondary,
            thr,
            use_threshold,
        )
        assert o_match == bool(match[b]), f"frame {b}: match mismatch"
        assert o_iters == int(iters[b]), (
            f"frame {b}: iterations {int(iters[b])} vs oracle {o_iters}"
        )
        np.testing.assert_array_equal(
            dec[b], o_dec, err_msg=f"frame {b}: decision mismatch"
        )


@pytest.mark.parametrize("alg", ALGS)
def test_zero_errors_converges_immediately(small_matrix, alg):
    """With Bob == Alice the initial decision already satisfies the syndrome:
    every algorithm must converge at iteration 1 with keys intact."""
    layout = compile_layout(small_matrix)
    rng = np.random.default_rng(99)
    n = small_matrix.num_bit_nodes
    batch = 4
    alice = rng.integers(0, 2, size=(batch, n)).astype(np.int8)
    q = 0.02  # LLR magnitude only; no actual errors injected
    log_p = np.log((1 - q) / q)
    llr = np.where(alice == 1, -log_p, log_p).astype(np.float64)
    syn = np.asarray(calculate_syndrome(layout, jnp.asarray(alice)))
    primary, secondary = FACTORS[alg]
    decode = get_decoder(layout, alg, 50, False, dtype=jnp.float64)
    res = decode(jnp.asarray(llr), jnp.asarray(syn), primary, secondary, 0.0)
    assert bool(np.all(np.asarray(res.syndromes_match)))
    assert np.all(np.asarray(res.iterations) == 1)
    np.testing.assert_array_equal(np.asarray(res.decision), alice)


def test_textbook_johnson_spa(johnson_matrix):
    """Johnson, *Introducing LDPC Codes*, example 2.5 — the reference's
    library example (example/qkd_ldpc_example.cpp:28-33): one flipped bit,
    SPA with threshold 100, must recover Alice's word."""
    layout = compile_layout(johnson_matrix)
    alice = np.array([[0, 0, 1, 0, 1, 1]], dtype=np.int8)
    bob = np.array([[1, 0, 1, 0, 1, 1]], dtype=np.int8)
    qber = 0.2
    log_p = np.log((1 - qber) / qber)
    llr = np.where(bob == 1, -log_p, log_p).astype(np.float64)
    syn = np.asarray(calculate_syndrome(layout, jnp.asarray(alice)))
    decode = get_decoder(layout, DecodingAlgorithm.SPA, 100, True, dtype=jnp.float64)
    res = decode(jnp.asarray(llr), jnp.asarray(syn), 1.0, 1.0, 100.0)
    assert bool(res.syndromes_match[0])
    np.testing.assert_array_equal(np.asarray(res.decision)[0], alice[0])
    # The oracle agrees on the trajectory.
    o_dec, o_match, o_iters = decode_oracle(
        johnson_matrix, llr[0], syn[0], 0, 100, 1.0, 1.0, 100.0, True
    )
    assert o_match
    assert int(res.iterations[0]) == o_iters


def test_syndrome_matches_oracle(small_matrix):
    layout = compile_layout(small_matrix)
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, size=(3, small_matrix.num_bit_nodes)).astype(np.int8)
    ours = np.asarray(calculate_syndrome(layout, jnp.asarray(bits)))
    for b in range(3):
        ref = oracle_syndrome(small_matrix.check_nodes, bits[b])
        np.testing.assert_array_equal(ours[b], ref)


@pytest.mark.parametrize("alg", ALGS)
def test_f32_statistically_close(medium_matrix, alg):
    """f32 production mode: convergence outcomes should agree with f64 on
    the overwhelming majority of frames (identical seeds)."""
    layout = compile_layout(medium_matrix)
    batch = 16
    alice, bob, llr, q = make_case(medium_matrix, batch, qber=0.03, seed=123)
    syn = np.asarray(calculate_syndrome(layout, jnp.asarray(alice)))
    primary, secondary = FACTORS[alg]
    d64 = get_decoder(layout, alg, 80, True, dtype=jnp.float64)
    d32 = get_decoder(layout, alg, 80, True, dtype=jnp.float32)
    r64 = d64(jnp.asarray(llr), jnp.asarray(syn), primary, secondary, 100.0)
    r32 = d32(
        jnp.asarray(llr, dtype=np.float32), jnp.asarray(syn), primary, secondary, 100.0
    )
    agree = np.mean(
        np.asarray(r64.syndromes_match) == np.asarray(r32.syndromes_match)
    )
    assert agree >= 0.9


@pytest.mark.parametrize("alg", [DecodingAlgorithm.NMSA, DecodingAlgorithm.SPA])
def test_bfloat16_decodes(medium_matrix, alg):
    """bfloat16 is an accepted config dtype (config.py validates it): the
    generic decoder must run in bf16 and still correct the large majority of
    frames at an easy operating point. Parity claims are f64-only; bf16 is a
    bandwidth-saving mode whose FER is merely required to stay usable.

    SPA in bf16 needs the message-LLR clamp: bf16 tanh saturates to +-1 at
    |LLR| ~ 9, and atanh(+-1) = inf poisons the messages. NMSA has no
    transcendentals and runs unclamped."""
    layout = compile_layout(medium_matrix)
    batch = 16
    alice, bob, llr, q = make_case(medium_matrix, batch, qber=0.02, seed=321)
    syn = np.asarray(calculate_syndrome(layout, jnp.asarray(alice)))
    primary, secondary = FACTORS[alg]
    spa = alg == DecodingAlgorithm.SPA
    dbf = get_decoder(layout, alg, 80, spa, dtype=jnp.bfloat16)
    res = dbf(
        jnp.asarray(llr, dtype=jnp.bfloat16), jnp.asarray(syn),
        primary, secondary, 8.0 if spa else 0.0,
    )
    assert res.decision.dtype == np.int8
    matched = np.asarray(res.syndromes_match)
    dec = np.asarray(res.decision)
    keys_ok = np.all(dec == alice, axis=1)
    # bf16 messages lose precision but the code is operating far below its
    # threshold here: require >= 80% corrected frames.
    assert np.mean(matched & keys_ok) >= 0.8


def test_guard_atanh_ratio_unit():
    from qkd_ldpc_v_tpu.ops.linapprox import guard_atanh_ratio

    x = jnp.asarray([0.5, -0.5, 1.0, -1.0, 1.5, -2.0, np.nan], jnp.float32)
    g = np.asarray(guard_atanh_ratio(x, jnp.float32))
    limit = np.float32(1.0) - np.finfo(np.float32).epsneg
    assert g[0] == np.float32(0.5) and g[1] == np.float32(-0.5)  # untouched
    assert g[2] == limit and g[4] == limit
    assert g[3] == -limit and g[5] == -limit
    assert g[6] == 0.0
    assert np.all(np.isfinite(np.arctanh(g)))


def test_spa_f32_guard_matches_f64_at_depth():
    """Regression for the f32 SPA saturation bug: at production depth
    (10k-bit frames, ~13 iterations) unguarded f32 SPA pushed the check
    pass's exclusion ratio prod/tanh to |ratio| >= 1 — atanh -> inf, then
    inf - inf -> NaN in the bit pass — failing ~6-16% of frames that the
    reference's f64 arithmetic decodes (measured FER 0.163 vs 0.0006 on the
    reference's alist suite before linapprox.guard_atanh_ratio). Guarded
    f32 must now decode every frame the f64 path decodes at this operating
    point, with identical iteration counts."""
    from pathlib import Path

    from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist

    path = (
        Path(__file__).resolve().parent.parent
        / "sparse_matrices"
        / "matrices_alist"
        / "(N=10240,M=2841,R=0.72,CW=4,SEED=66).mtrx"
    )
    matrix = read_sparse_matrix_alist(path)
    layout = compile_layout(matrix)
    batch = 16
    alice, bob, llr, q = make_case(matrix, batch, qber=0.03, seed=77)
    syn = np.asarray(calculate_syndrome(layout, jnp.asarray(alice)))
    d64 = get_decoder(layout, DecodingAlgorithm.SPA, 100, False, dtype=jnp.float64)
    d32 = get_decoder(layout, DecodingAlgorithm.SPA, 100, False, dtype=jnp.float32)
    r64 = d64(jnp.asarray(llr), jnp.asarray(syn))
    r32 = d32(jnp.asarray(llr, dtype=np.float32), jnp.asarray(syn))
    ok64 = np.asarray(r64.syndromes_match)
    ok32 = np.asarray(r32.syndromes_match)
    assert ok64.all(), "operating point must be below threshold for f64"
    assert ok32.all()
    assert np.array_equal(np.asarray(r32.iterations), np.asarray(r64.iterations))
    assert np.array_equal(np.asarray(r32.decision), np.asarray(r64.decision))
