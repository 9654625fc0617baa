"""Matrix reader tests: all four formats, validation rules, and round-trips
against the reference's data assets (read directly from /root/reference)."""

import os

import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import MatrixFormat
from qkd_ldpc_v_tpu.models.hmatrix import (
    MatrixFormatError,
    from_dense,
    read_matrix,
    read_sparse_matrix_1,
    read_sparse_matrix_2,
    read_sparse_matrix_alist,
    read_sparse_uncompressed_matrix,
    write_alist,
)
from tests.conftest import REFERENCE_DIR, reference_available


def test_uncompressed_reader(tmp_path):
    p = tmp_path / "m.mtrx"
    p.write_text("1 1 0 1 0 0\n0 1 1 0 1 0\n1 0 0 0 1 1\n0 0 1 1 0 1\n")
    m = read_sparse_uncompressed_matrix(p)
    assert m.num_bit_nodes == 6
    assert m.num_check_nodes == 4
    assert m.num_edges == 12
    # every row has weight 3 and every column weight 2 -> regular
    assert m.is_regular
    m.validate_consistency()


def test_uncompressed_regularity(tmp_path):
    p = tmp_path / "m.mtrx"
    # 2x4, all row weights 2, all col weights 1 -> regular
    p.write_text("1 1 0 0\n0 0 1 1\n")
    m = read_sparse_uncompressed_matrix(p)
    assert m.is_regular


def test_uncompressed_rejects_non_binary(tmp_path):
    p = tmp_path / "m.mtrx"
    p.write_text("1 2\n0 1\n")
    with pytest.raises(MatrixFormatError, match="0 or 1"):
        read_sparse_uncompressed_matrix(p)


def test_uncompressed_rejects_ragged(tmp_path):
    p = tmp_path / "m.mtrx"
    p.write_text("1 1 0\n0 1\n")
    with pytest.raises(MatrixFormatError, match="Different lengths"):
        read_sparse_uncompressed_matrix(p)


def test_uncompressed_rejects_zero_column(tmp_path):
    p = tmp_path / "m.mtrx"
    p.write_text("1 0\n1 0\n")
    with pytest.raises(MatrixFormatError, match="Column '2' weight"):
        read_sparse_uncompressed_matrix(p)


def test_alist_roundtrip(tmp_path, small_matrix):
    p = tmp_path / "gen.mtrx"
    write_alist(small_matrix, p)
    m = read_sparse_matrix_alist(p)
    assert m.num_bit_nodes == small_matrix.num_bit_nodes
    assert m.num_check_nodes == small_matrix.num_check_nodes
    for a, b in zip(m.check_nodes, small_matrix.check_nodes):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(m.bit_nodes, small_matrix.bit_nodes):
        np.testing.assert_array_equal(a, b)
    m.validate_consistency()


def test_alist_weight_validation(tmp_path):
    p = tmp_path / "bad.mtrx"
    # 2 bits, 1 check; bit weights claim 1 but row has 2 non-zero entries
    p.write_text("2 1\n1 2\n2 1\n2\n1 0\n1 0\n1 2\n")
    with pytest.raises(MatrixFormatError, match="non-zero elements"):
        read_sparse_matrix_alist(p)


def test_format1_reader(tmp_path):
    p = tmp_path / "m.mtrx"
    # N=4, M=2, max row weight 3; rows 1-based, 0 padded
    p.write_text("4\n2\n3\n1 2 3\n3 4 0\n")
    m = read_sparse_matrix_1(p)
    assert m.num_bit_nodes == 4
    assert m.num_check_nodes == 2
    np.testing.assert_array_equal(m.check_nodes[0], [0, 1, 2])
    np.testing.assert_array_equal(m.check_nodes[1], [2, 3])
    m.validate_consistency()


def test_format1_rejects_overweight_row(tmp_path):
    p = tmp_path / "m.mtrx"
    p.write_text("4\n2\n2\n1 2 3\n3 4 0\n")
    with pytest.raises(MatrixFormatError, match="exceeded the maximum"):
        read_sparse_matrix_1(p)


def test_format1_requires_max_weight_match(tmp_path):
    p = tmp_path / "m.mtrx"
    # token counts (incl. padding zeros) are 2 and 2, declared max is 3
    p.write_text("4\n2\n3\n1 2\n3 4\n")
    with pytest.raises(MatrixFormatError, match="None of the row weights"):
        read_sparse_matrix_1(p)


def test_format2_reader(tmp_path):
    p = tmp_path / "m.mtrx"
    # N=4 M=2; rows 0-based; then 4 column lists
    p.write_text("4 2\n0 1 2\n2 3\n0\n0\n0 1\n1\n")
    m = read_sparse_matrix_2(p)
    assert m.num_bit_nodes == 4
    assert m.num_check_nodes == 2
    np.testing.assert_array_equal(m.check_nodes[0], [0, 1, 2])
    np.testing.assert_array_equal(m.bit_nodes[2], [0, 1])
    m.validate_consistency()


def test_format2_rejects_negative(tmp_path):
    p = tmp_path / "m.mtrx"
    p.write_text("4 2\n0 -1 2\n2 3\n0\n0\n0 1\n1\n")
    with pytest.raises(MatrixFormatError, match="less than zero"):
        read_sparse_matrix_2(p)


@pytest.mark.skipif(not reference_available(), reason="reference assets absent")
@pytest.mark.parametrize(
    "rel,fmt",
    [
        (
            "sparse_matrices/matrices_uncompressed/(N=6,K=2,M=4,R=0.34).mtrx",
            MatrixFormat.UNCOMPRESSED,
        ),
        ("sparse_matrices/matrices_1/(N=10,M=5,R=0.5).mtrx", MatrixFormat.SPARSE_1),
        (
            "sparse_matrices/matrices_2/(N=10240,M=5120,R=0.5).mtrx",
            MatrixFormat.SPARSE_2,
        ),
        (
            "sparse_matrices/matrices_alist/(N=10240,M=1024,R=0.90,CW=5,SEED=666).mtrx",
            MatrixFormat.ALIST,
        ),
    ],
)
def test_reference_assets_parse(rel, fmt):
    path = os.path.join(REFERENCE_DIR, rel)
    m = read_matrix(path, fmt)
    assert m.num_bit_nodes > 0
    assert m.num_check_nodes > 0
    m.validate_consistency()
    # filename encodes N and M — sanity check them
    import re

    match = re.search(r"N=(\d+),.*M=(\d+)", rel)
    assert m.num_bit_nodes == int(match.group(1))
    assert m.num_check_nodes == int(match.group(2))


@pytest.mark.skipif(not reference_available(), reason="reference assets absent")
def test_reference_assets_full_sweep():
    """Parse every shipped asset of each format (parity with C5)."""
    import glob

    cases = [
        ("matrices_uncompressed", MatrixFormat.UNCOMPRESSED),
        ("matrices_1", MatrixFormat.SPARSE_1),
        ("matrices_2", MatrixFormat.SPARSE_2),
        ("matrices_alist", MatrixFormat.ALIST),
        ("matrices_alist_1k_all", MatrixFormat.ALIST),
    ]
    total = 0
    for d, fmt in cases:
        for path in sorted(
            glob.glob(os.path.join(REFERENCE_DIR, "sparse_matrices", d, "*.mtrx"))
        ):
            m = read_matrix(path, fmt)
            assert m.num_bit_nodes > 0
            total += 1
    assert total >= 25


def test_johnson_matrix_matches_reference_asset(johnson_matrix):
    if reference_available():
        ref = read_sparse_uncompressed_matrix(
            os.path.join(
                REFERENCE_DIR,
                "sparse_matrices/matrices_uncompressed/(N=6,K=2,M=4,R=0.34).mtrx",
            )
        )
        np.testing.assert_array_equal(ref.to_dense(), johnson_matrix.to_dense())


def test_from_dense_consistency(small_matrix):
    dense = small_matrix.to_dense()
    again = from_dense(dense)
    for a, b in zip(again.check_nodes, small_matrix.check_nodes):
        np.testing.assert_array_equal(a, b)
