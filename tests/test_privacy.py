"""Privacy maintenance greedy-matching tests."""

import numpy as np

from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.privacy import (
    bits_positions_to_remove,
    bits_positions_to_remove_rate_adapt,
    keep_positions,
)


def test_johnson_matching(johnson_matrix):
    """Hand-checked greedy walk: all columns weight 2, stable order 0..5:
    bit0 -> check0, bit1 -> check1, bit2 -> check3, bit3 blocked,
    bit4 -> check2, bit5 blocked => remove {0,1,2,4}."""
    remove = bits_positions_to_remove(johnson_matrix)
    np.testing.assert_array_equal(remove, [0, 1, 2, 4])


def test_matching_is_injective(small_matrix):
    remove = bits_positions_to_remove(small_matrix)
    m = small_matrix.num_check_nodes
    assert len(remove) <= m
    assert np.all(np.diff(remove) > 0)
    # Verify a valid system of distinct representatives exists along the
    # greedy's own order (weight-ascending, stable).
    weights = np.array([len(r) for r in small_matrix.bit_nodes])
    order = np.argsort(weights, kind="stable")
    used = set()
    removed = set(remove.tolist())
    for i in order:
        if int(i) in removed:
            found = None
            for c in small_matrix.bit_nodes[int(i)]:
                if int(c) not in used:
                    found = int(c)
                    break
            assert found is not None
            used.add(found)


def test_rate_adapt_variant(small_matrix):
    punct = np.array([3, 10, 20], dtype=np.int32)
    short = np.array([1, 7], dtype=np.int32)
    remove = bits_positions_to_remove_rate_adapt(small_matrix, punct, short)
    removed = set(remove.tolist())
    # all punctured and shortened bits removed
    assert set(punct.tolist()) <= removed
    assert set(short.tolist()) <= removed
    assert np.all(np.diff(remove) > 0)
    # extras beyond p+s are bounded by the number of check nodes
    extras = len(remove) - len(punct) - len(short)
    assert 0 <= extras <= small_matrix.num_check_nodes


def test_keep_positions():
    keep = keep_positions(6, np.array([1, 4]))
    np.testing.assert_array_equal(keep, [0, 2, 3, 5])
    np.testing.assert_array_equal(keep_positions(4, None), [0, 1, 2, 3])
    np.testing.assert_array_equal(keep_positions(3, np.array([], np.int32)), [0, 1, 2])
