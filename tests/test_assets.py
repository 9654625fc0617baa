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
