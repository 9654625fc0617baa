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


class TestNativeParser:
    CASES = [
        "1 2 3\n4 5\n",
        "1 2 3\n4 5",
        "10\n\n-7 0\n",
        "  1\t2 \r\n3\n\n",
        "",
        "\n\n",
        "2147480000 -2147480000\n",
    ]

    def test_matches_python_tokenizer(self):
        if native.load() is None:
            pytest.skip("native library unavailable")
        for text in self.CASES:
            expect = [[int(t) for t in line.split()] for line in text.splitlines()]
            got = native.parse_int_lines(text)
            assert got == expect, repr(text)

    def test_malformed_returns_none(self):
        if native.load() is None:
            pytest.skip("native library unavailable")
        assert native.parse_int_lines("1 2 x\n") is None
        assert native.parse_int_lines("1.5\n") is None
        assert native.parse_int_lines("1-2\n") is None

    def test_fallback_on_overflow_and_odd_line_breaks(self):
        """Values over INT32_MAX would truncate in the int32 output, and
        lone \\r / \\v / \\f are line breaks to str.splitlines() but not to
        the native grouping — all must defer to the Python fallback."""
        if native.load() is None:
            pytest.skip("native library unavailable")
        assert native.parse_int_lines("2147483648\n") is None
        assert native.parse_int_lines("-2147483649\n") is None
        assert native.parse_int_lines("99999999999999999999\n") is None
        assert native.parse_int_lines("1 2\r3\n") is None
        assert native.parse_int_lines("1\v2\n") is None
        assert native.parse_int_lines("1\f2\n") is None
        # \r\n stays on the native path (same grouping as splitlines()).
        assert native.parse_int_lines("1 2\r\n3\n") == [[1, 2], [3]]

    def test_reader_path_uses_native(self, tmp_path):
        """read_sparse_matrix_alist through the native tokenizer equals the
        Python tokenizer result."""
        from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
        from qkd_ldpc_v_tpu.models.hmatrix import (
            read_sparse_matrix_alist,
            write_alist,
        )

        mat = generate_regular_ldpc(256, 128, 3, seed=8)
        p = tmp_path / "m.mtrx"
        write_alist(mat, p)
        back = read_sparse_matrix_alist(p)
        for a, b in zip(back.check_nodes, mat.check_nodes):
            np.testing.assert_array_equal(a, b)
