"""Rate adaptation and untainted puncturing tests."""

import numpy as np
import pytest

from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.rate_adapt import (
    adapt_code_rate,
    binary_entropy,
    finalize_bits_to_remove,
    get_punctured_bits_untainted,
    second_order_neighbors,
    select_punctured_bits_untainted,
)


@pytest.fixture(scope="module")
def matrix():
    return generate_regular_ldpc(num_bits=256, num_checks=128, column_weight=3, seed=2)


def test_adapt_code_rate_math(matrix):
    rng = np.random.default_rng(0)
    qber, delta, eff = 0.1, 0.1, 1.1
    p = adapt_code_rate(rng, matrix, qber, delta, eff)
    assert not p.is_empty
    n = matrix.num_bit_nodes
    m = matrix.num_check_nodes
    r0 = 1 - m / n
    rt = 1 - eff * binary_entropy(qber)
    s_expect = int(np.ceil((r0 - rt * (1 - delta)) * n))
    p_expect = int(delta * n - s_expect)
    assert len(p.shortened_bits) == s_expect
    assert len(p.punctured_bits) == p_expect
    # disjoint, sorted, in range
    assert np.all(np.diff(p.punctured_bits) > 0)
    assert np.all(np.diff(p.shortened_bits) > 0)
    assert not set(p.punctured_bits.tolist()) & set(p.shortened_bits.tolist())
    assert p.adapted_code_rate == pytest.approx(
        (n - m - s_expect) / (n - p_expect - s_expect)
    )
    assert p.punctured_fraction == pytest.approx(p_expect / n)
    assert p.shortened_fraction == pytest.approx(s_expect / n)


def test_adapt_code_rate_skips_unachievable(matrix):
    rng = np.random.default_rng(0)
    # Very low QBER + tiny efficiency -> optimal rate above achievable band
    p = adapt_code_rate(rng, matrix, qber=0.001, delta=0.01, efficiency=1.0)
    assert p.is_empty


def test_finalize_merge_without_privacy(matrix):
    rng = np.random.default_rng(1)
    p = adapt_code_rate(rng, matrix, 0.1, 0.1, 1.1)
    finalize_bits_to_remove(matrix, p, privacy_maintenance=False)
    expect = np.sort(np.concatenate([p.punctured_bits, p.shortened_bits]))
    np.testing.assert_array_equal(p.bits_to_remove, expect)


def test_untainted_pairwise_property(matrix):
    rng = np.random.default_rng(3)
    punct = select_punctured_bits_untainted(rng, matrix)
    assert len(punct) > 0
    n2 = second_order_neighbors(matrix)
    chosen = set(punct.tolist())
    for v in punct:
        overlap = chosen & set(n2[int(v)].tolist())
        assert not overlap, f"punctured node {v} has punctured 2nd-order nbrs"


def test_untainted_cache_roundtrip(tmp_path, matrix):
    from qkd_ldpc_v_tpu.models.hmatrix import write_alist

    mpath = tmp_path / "m.mtrx"
    write_alist(matrix, mpath)
    rng = np.random.default_rng(4)
    first = get_punctured_bits_untainted(mpath, rng, matrix)
    assert (tmp_path / "m.untp").exists()
    # second call must read the cache (different rng state, same result)
    rng2 = np.random.default_rng(999)
    second = get_punctured_bits_untainted(mpath, rng2, matrix)
    np.testing.assert_array_equal(first, second)


def test_untainted_cache_validation(tmp_path, matrix):
    from qkd_ldpc_v_tpu.models.hmatrix import write_alist

    mpath = tmp_path / "m.mtrx"
    write_alist(matrix, mpath)
    (tmp_path / "m.untp").write_text("5 99999 ")
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="out of range"):
        get_punctured_bits_untainted(mpath, rng, matrix)


def test_untainted_uses_pool_prefix(matrix):
    rng = np.random.default_rng(5)
    pool = select_punctured_bits_untainted(rng, matrix)
    matrix.punctured_bits_untainted = pool
    p = adapt_code_rate(
        np.random.default_rng(6), matrix, 0.1, 0.1, 1.1, use_untainted=True
    )
    if not p.is_empty:
        np.testing.assert_array_equal(
            p.punctured_bits, np.sort(pool[: len(p.punctured_bits)])
        )
    # request more punctures than the pool -> skipped
    big = adapt_code_rate(
        np.random.default_rng(7), matrix, 0.11, 0.9, 1.05, use_untainted=True
    )
    # either unachievable anyway or skipped due to pool size; both are empty
    assert big.is_empty or len(big.punctured_bits) <= len(pool)
