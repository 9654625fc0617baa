"""Shipped asset library: every committed matrix parses, every committed
config parses and builds a sweep against its suite — the framework must run
meaningful campaigns with zero reference mounts (VERDICT C25/C26)."""

import glob
import json
import os
from pathlib import Path

import pytest

from qkd_ldpc_v_tpu.config import parse_config_data
from qkd_ldpc_v_tpu.models.hmatrix import read_matrix

ROOT = Path(__file__).resolve().parents[1]

FORMAT_DIRS = {
    0: "matrices_uncompressed",
    1: "matrices_alist",
    2: "matrices_1",
    3: "matrices_2",
    4: "matrices_qc",
}


def all_matrices():
    out = []
    for fmt, d in FORMAT_DIRS.items():
        for p in sorted(glob.glob(str(ROOT / "sparse_matrices" / d / "*.mtrx"))):
            out.append((fmt, p))
    return out


def test_matrix_suite_is_substantial():
    mats = all_matrices()
    assert len(mats) >= 20
    sizes = set()
    rates = []
    for fmt, p in mats:
        name = os.path.basename(p)
        n = int(name.split("N=")[1].split(",")[0])
        m = int(name.split("M=")[1].split(",")[0])
        sizes.add(n)
        rates.append(1 - m / n)
    # the reference's three frame scales and its R = 0.36-0.92 band
    assert {1024, 10240, 102400} <= sizes
    assert min(rates) <= 0.40 and max(rates) >= 0.90


@pytest.mark.parametrize("fmt,path", all_matrices(),
                         ids=lambda v: os.path.basename(v) if isinstance(v, str) else v)
def test_matrix_parses_and_matches_filename(fmt, path):
    mat = read_matrix(path, fmt)
    name = os.path.basename(path)
    assert mat.num_bit_nodes == int(name.split("N=")[1].split(",")[0])
    assert mat.num_check_nodes == int(name.split("M=")[1].split(",")[0])


def test_untp_caches_committed():
    """1k/10k matrices ship their untainted-puncturing caches (the reference
    ships .untp next to its production matrices)."""
    missing = []
    for fmt, p in all_matrices():
        name = os.path.basename(p)
        n = int(name.split("N=")[1].split(",")[0])
        if n <= 10240 and not os.path.exists(p[:-5] + ".untp"):
            missing.append(name)
    assert not missing, f"matrices without .untp cache: {missing}"


def test_cross_format_reads_agree():
    """The same generated code is committed in several reference formats
    (alist / format-1 / format-2); every reader must produce the identical
    adjacency structure."""
    import numpy as np

    pairs = [
        ("matrices_alist", 1, "matrices_1", 2,
         "(N=1024,M=512,R=0.50,CW=3,SEED=5).mtrx"),
        ("matrices_alist", 1, "matrices_2", 3,
         "(N=1024,M=283,R=0.72,CW=4,SEED=6).mtrx"),
        ("matrices_alist", 1, "matrices_2", 3,
         "(N=10240,M=2841,R=0.72,CW=4,SEED=66).mtrx"),
    ]
    for dir_a, fmt_a, dir_b, fmt_b, name in pairs:
        a = read_matrix(ROOT / "sparse_matrices" / dir_a / name, fmt_a)
        b = read_matrix(ROOT / "sparse_matrices" / dir_b / name, fmt_b)
        assert a.is_regular == b.is_regular
        assert len(a.check_nodes) == len(b.check_nodes)
        for ra, rb in zip(a.check_nodes, b.check_nodes):
            assert np.array_equal(ra, rb)
        for ra, rb in zip(a.bit_nodes, b.bit_nodes):
            assert np.array_equal(ra, rb)


def test_dense_johnson_matches_example():
    """The committed dense asset is the Johnson textbook matrix the library
    example decodes (reference ships the same file;
    example/qkd_ldpc_example.cpp:16)."""
    import numpy as np

    mat = read_matrix(
        ROOT / "sparse_matrices" / "matrices_uncompressed"
        / "(N=6,K=2,M=4,R=0.34).mtrx",
        0,
    )
    assert mat.num_bit_nodes == 6 and mat.num_check_nodes == 4
    expected = np.array(
        [
            [1, 1, 0, 1, 0, 0],
            [0, 1, 1, 0, 1, 0],
            [1, 0, 0, 0, 1, 1],
            [0, 0, 1, 1, 0, 1],
        ]
    )
    dense = np.zeros((4, 6), dtype=int)
    for j, row in enumerate(mat.check_nodes):
        dense[j, np.asarray(row)] = 1
    assert np.array_equal(dense, expected)


def all_configs():
    return sorted(glob.glob(str(ROOT / "configs" / "*.json")))


def test_config_suite_is_substantial():
    assert len(all_configs()) >= 8


@pytest.mark.parametrize("path", all_configs(), ids=os.path.basename)
def test_config_parses_and_builds_sweep(path):
    from qkd_ldpc_v_tpu.simulation import prepare_sim_inputs
    from qkd_ldpc_v_tpu.utils import get_file_paths_in_directory

    cfg = parse_config_data(path)
    fmt_dir = FORMAT_DIRS[int(json.load(open(path))["matrix_format"])]
    matrices = get_file_paths_in_directory(
        ROOT / "sparse_matrices" / fmt_dir, ".mtrx"
    )
    assert matrices, f"no committed matrices for {fmt_dir}"
    inputs = prepare_sim_inputs(matrices, cfg)
    assert inputs
    if cfg.enable_code_rate_adaptation:
        # rate adaptation legitimately skips unachievable (R, QBER, f_EC)
        # combinations with a warning (reference:
        # src/array_and_matrix_operations.cpp:1155-1161)
        assert any(s.combinations for s in inputs)
    else:
        assert all(s.combinations for s in inputs)
