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
