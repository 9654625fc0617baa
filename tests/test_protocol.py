"""Batched protocol round tests (fixed-rate and rate-adaptive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.privacy import bits_positions_to_remove
from qkd_ldpc_v_tpu.protocol import (
    make_protocol_spec,
    qkd_ldpc,
    qkd_ldpc_rate_adapt,
)
from qkd_ldpc_v_tpu.rate_adapt import adapt_code_rate, finalize_bits_to_remove, HMatrixParams


@pytest.fixture(scope="module")
def matrix():
    return generate_regular_ldpc(num_bits=512, num_checks=256, column_weight=3, seed=11)


def _keys(matrix, batch, qber, seed):
    rng = np.random.default_rng(seed)
    n = matrix.num_bit_nodes
    alice = rng.integers(0, 2, (batch, n)).astype(np.int8)
    ne = int(n * qber)
    bob = alice.copy()
    for b in range(batch):
        pos = rng.permutation(n)[:ne]
        bob[b, pos] ^= 1
    return alice, bob, ne / n


def test_fixed_rate_round(matrix):
    alice, bob, q = _keys(matrix, 8, 0.02, seed=0)
    spec = make_protocol_spec(
        matrix, DecodingAlgorithm.SPA, 100, True, privacy_maintenance=False,
        dtype="float64",
    )
    res = qkd_ldpc(spec, jnp.asarray(alice), jnp.asarray(bob), q, threshold=100.0)
    assert bool(np.all(np.asarray(res.syndromes_match)))
    assert bool(np.all(np.asarray(res.keys_match)))
    np.testing.assert_array_equal(np.asarray(res.bob_out), alice)
    np.testing.assert_array_equal(np.asarray(res.alice_out), alice)


def test_fixed_rate_privacy(matrix):
    alice, bob, q = _keys(matrix, 4, 0.02, seed=1)
    params = HMatrixParams()
    params.bits_to_remove = bits_positions_to_remove(matrix)
    spec = make_protocol_spec(
        matrix, DecodingAlgorithm.NMSA, 100, False, privacy_maintenance=True,
        params=params, dtype="float64",
    )
    res = qkd_ldpc(spec, jnp.asarray(alice), jnp.asarray(bob), q, primary=0.8)
    n_out = matrix.num_bit_nodes - len(params.bits_to_remove)
    assert res.alice_out.shape == (4, n_out)
    ok = np.asarray(res.keys_match)
    # outputs for converged frames must agree between the parties
    a_out = np.asarray(res.alice_out)
    b_out = np.asarray(res.bob_out)
    for i in range(4):
        if ok[i]:
            np.testing.assert_array_equal(a_out[i], b_out[i])


def test_rate_adaptive_round(matrix):
    rng = np.random.default_rng(3)
    params = adapt_code_rate(rng, matrix, qber=0.07, delta=0.1, efficiency=1.35)
    assert not params.is_empty
    finalize_bits_to_remove(matrix, params, privacy_maintenance=False)
    spec = make_protocol_spec(
        matrix, DecodingAlgorithm.SPA, 150, True, privacy_maintenance=False,
        params=params, dtype="float64",
    )
    n = spec.num_key_bits
    n_frame = matrix.num_bit_nodes
    assert n == n_frame - len(params.punctured_bits) - len(params.shortened_bits)

    # Reference discipline: keys are generated at full frame length, the
    # payload is the first n bits (src/simulation.cpp:551-555 + :1169).
    alice_full, bob_full, q = _keys(matrix, 6, 0.07, seed=4)
    res = qkd_ldpc_rate_adapt(
        spec,
        jnp.asarray(alice_full[:, :n]),
        jnp.asarray(bob_full[:, :n]),
        q,
        punct_key=jax.random.PRNGKey(7),
        threshold=100.0,
    )
    # output removes p+s always
    assert res.alice_out.shape == (6, n_frame - len(params.bits_to_remove))
    ok = np.asarray(res.keys_match)
    sm = np.asarray(res.syndromes_match)
    assert ok.sum() >= 4  # easy operating point: most frames reconcile
    a_out = np.asarray(res.alice_out)
    b_out = np.asarray(res.bob_out)
    for i in range(6):
        if ok[i]:
            assert sm[i]
            np.testing.assert_array_equal(a_out[i], b_out[i])


def test_rate_adaptive_privacy(matrix):
    rng = np.random.default_rng(5)
    params = adapt_code_rate(rng, matrix, qber=0.07, delta=0.1, efficiency=1.35)
    finalize_bits_to_remove(matrix, params, privacy_maintenance=True)
    # privacy variant removes at least p + s bits, at most p + s + M
    p, s = len(params.punctured_bits), len(params.shortened_bits)
    assert p + s <= len(params.bits_to_remove) <= p + s + matrix.num_check_nodes
    spec = make_protocol_spec(
        matrix, DecodingAlgorithm.OMSA, 150, False, privacy_maintenance=True,
        params=params, dtype="float64",
    )
    alice_full, bob_full, q = _keys(matrix, 4, 0.07, seed=6)
    n = spec.num_key_bits
    res = qkd_ldpc_rate_adapt(
        spec,
        jnp.asarray(alice_full[:, :n]),
        jnp.asarray(bob_full[:, :n]),
        q,
        punct_key=jax.random.PRNGKey(8),
        primary=0.25,
    )
    assert res.alice_out.shape[1] == matrix.num_bit_nodes - len(params.bits_to_remove)


def test_shortened_bits_never_flip(matrix):
    """Shortened positions carry LLR=+max: the decoder must keep them 0."""
    rng = np.random.default_rng(9)
    params = adapt_code_rate(rng, matrix, qber=0.07, delta=0.1, efficiency=1.35)
    finalize_bits_to_remove(matrix, params, privacy_maintenance=False)
    spec = make_protocol_spec(
        matrix, DecodingAlgorithm.NMSA, 60, False, privacy_maintenance=False,
        params=params, dtype="float64",
    )
    alice_full, bob_full, q = _keys(matrix, 4, 0.07, seed=10)
    n = spec.num_key_bits
    res = qkd_ldpc_rate_adapt(
        spec,
        jnp.asarray(alice_full[:, :n]),
        jnp.asarray(bob_full[:, :n]),
        q,
        punct_key=jax.random.PRNGKey(11),
        primary=0.8,
    )
    # reconstruct: decisions at shortened positions must be 0 whenever the
    # frame converged (alice_ext is 0 there and keys matched)
    ok = np.asarray(res.keys_match)
    assert ok.any()


def test_inject_errors_exact_count_under_collisions():
    """Exactly floor(N*q) flips per frame even when raw random draws
    collide (the sort keys are unique by construction)."""
    import jax
    import jax.numpy as jnp

    from qkd_ldpc_v_tpu.ops.channel import generate_keys, inject_errors

    key = jax.random.PRNGKey(123)
    alice = generate_keys(key, 64, 4096)
    for ne in (0, 1, 122, 2048):
        bob = inject_errors(jax.random.fold_in(key, ne), alice, ne)
        flips = np.asarray(bob ^ alice).sum(axis=1)
        assert (flips == ne).all(), (ne, flips.min(), flips.max())


def test_inject_errors_per_frame_counts():
    """Per-frame error-count arrays, including zero counts."""
    import jax
    import jax.numpy as jnp

    from qkd_ldpc_v_tpu.ops.channel import generate_keys, inject_errors

    key = jax.random.PRNGKey(3)
    alice = generate_keys(key, 4, 64)
    ne = jnp.asarray([0, 1, 5, 32], jnp.int32)
    bob = inject_errors(jax.random.fold_in(key, 1), alice, ne)
    flips = np.asarray(bob ^ alice).sum(axis=1)
    np.testing.assert_array_equal(flips, [0, 1, 5, 32])


def test_protocol_spec_identity_hash_and_auto_removal(medium_matrix):
    """Specs hash by identity; rate-adaptive specs derive the mandatory
    punctured+shortened removal when the caller didn't finalize it."""
    from qkd_ldpc_v_tpu.config import DecodingAlgorithm
    from qkd_ldpc_v_tpu.protocol import make_protocol_spec
    import qkd_ldpc_v_tpu.rate_adapt as ra

    rng = np.random.default_rng(1)
    params = ra.adapt_code_rate(rng, medium_matrix, 0.08, 0.2, 1.3)
    assert not params.is_empty
    assert len(params.bits_to_remove) == 0  # caller did not finalize
    spec = make_protocol_spec(
        medium_matrix, DecodingAlgorithm.SPA, 30, False,
        privacy_maintenance=False, params=params,
    )
    assert hash(spec) == hash(spec)  # identity hash works
    p, s = len(params.punctured_bits), len(params.shortened_bits)
    assert spec.output_key_bits == medium_matrix.num_bit_nodes - p - s

    # fixed-rate privacy without explicit params also derives removals
    spec2 = make_protocol_spec(
        medium_matrix, DecodingAlgorithm.SPA, 30, False,
        privacy_maintenance=True,
    )
    assert spec2.output_key_bits < medium_matrix.num_bit_nodes


def test_inject_errors_exact_count_32bit_path():
    """The uint32 key fallback (x64 disabled) also yields exact counts."""
    import jax
    import jax.numpy as jnp

    from qkd_ldpc_v_tpu.ops.channel import generate_keys, inject_errors

    key = jax.random.PRNGKey(9)
    alice = generate_keys(key, 16, 2048)
    with jax.enable_x64(False):
        bob = inject_errors(jax.random.fold_in(key, 7), alice, 61)
    flips = np.asarray(bob ^ alice).sum(axis=1)
    assert (flips == 61).all()
