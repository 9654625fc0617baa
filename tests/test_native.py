"""Native library ↔ Python fallback equivalence for the untainted greedy."""

import numpy as np
import pytest

from qkd_ldpc_v_tpu import native
from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.rate_adapt import (
    _untainted_greedy_py,
    second_order_csr,
    second_order_neighbors,
)


@pytest.fixture(scope="module")
def matrix():
    return generate_regular_ldpc(num_bits=256, num_checks=128, column_weight=3, seed=4)


def test_csr_matches_list_form(matrix):
    flat, offsets = second_order_csr(matrix)
    lists = second_order_neighbors(matrix)
    assert len(lists) == matrix.num_bit_nodes
    # CSR rows sorted, deduped, self-free
    for i, row in enumerate(lists):
        assert np.all(np.diff(row) > 0)
        assert i not in row
    # symmetry: u in N2(v) <=> v in N2(u)
    for v in range(0, matrix.num_bit_nodes, 17):
        for u in lists[v]:
            assert v in lists[int(u)]


def test_native_matches_python(matrix):
    if native.load() is None:
        pytest.skip("native library unavailable")
    flat, offsets = second_order_csr(matrix)
    for seed in (0, 1, 123456789, (1 << 62) + 5):
        a = native.untainted_select(flat, offsets, seed)
        b = _untainted_greedy_py(flat, offsets, seed)
        np.testing.assert_array_equal(a, b)


def test_greedy_result_is_untainted_and_maximal(matrix):
    flat, offsets = second_order_csr(matrix)
    sel = _untainted_greedy_py(flat, offsets, seed=42)
    lists = second_order_neighbors(matrix)
    chosen = set(int(v) for v in sel)
    # pairwise untainted: no two selected bits are second-order neighbors
    for v in chosen:
        assert not chosen & set(int(u) for u in lists[v])
    # maximal: every unselected bit is in some selected bit's N2
    covered = set(chosen)
    for v in chosen:
        covered.update(int(u) for u in lists[v])
    assert covered == set(range(matrix.num_bit_nodes))
