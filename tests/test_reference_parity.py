"""A/B parity against the ACTUAL reference C++ decoders.

tools/reference_harness compiles the reference's decoder/protocol core
straight out of /root/reference/src (dependency stubs only; no code copied)
and drives it on explicit keys. Every algorithm's per-frame iteration count,
syndrome-match flag, and key-match flag must agree exactly with this
framework's float64 decoders — the strongest possible parity evidence
(SURVEY.md §7 step 9).

Skipped when the reference checkout or a C++ toolchain is unavailable.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.models.hmatrix import write_alist
from qkd_ldpc_v_tpu.oracle import calculate_syndrome, decode_oracle

HARNESS_DIR = Path(__file__).resolve().parent.parent / "tools" / "reference_harness"
REFERENCE = Path("/root/reference")


@pytest.fixture(scope="module")
def harness():
    if not REFERENCE.is_dir():
        pytest.skip("reference checkout unavailable")
    binary = HARNESS_DIR / "ref_harness"
    build = subprocess.run(
        ["make", "-C", str(HARNESS_DIR)], capture_output=True, text=True
    )
    if build.returncode != 0 or not binary.exists():
        pytest.skip(f"harness build failed: {build.stderr[-300:]}")
    return binary


@pytest.fixture(scope="module")
def matrix_file(tmp_path_factory):
    mat = generate_regular_ldpc(num_bits=512, num_checks=256, column_weight=3, seed=21)
    path = tmp_path_factory.mktemp("ab") / "code.mtrx"
    write_alist(mat, path)
    return mat, path


def _run_reference(binary, matrix_path, alg, alice, bob, qber,
                   primary=1.0, secondary=1.0, threshold=0.0, max_iters=60):
    batch = len(alice)
    lines = [f"{batch} {qber}"]
    for arr in (*alice, *bob):
        lines.append(" ".join(str(int(v)) for v in arr))
    out = subprocess.run(
        [str(binary), str(matrix_path), "1", str(alg), str(max_iters),
         str(primary), str(secondary), str(threshold)],
        input="\n".join(lines) + "\n",
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    rows = []
    for line in out.stdout.strip().splitlines():
        it, syn, keys = (int(v) for v in line.split())
        rows.append((it, bool(syn), bool(keys)))
    return rows


@pytest.mark.parametrize(
    "alg,primary,secondary,threshold",
    [
        (0, 1.0, 1.0, 0.0),    # SPA
        (0, 1.0, 1.0, 30.0),   # SPA + LLR clamp
        (1, 1.0, 1.0, 0.0),    # SPA lin approx
        (2, 0.8, 1.0, 0.0),    # NMSA
        (3, 0.3, 1.0, 0.0),    # OMSA
        (4, 0.9, 0.5, 0.0),    # ANMSA
        (5, 0.3, 0.6, 0.0),    # AOMSA
    ],
)
def test_cpp_reference_exact_agreement(harness, matrix_file, alg, primary,
                                       secondary, threshold):
    mat, path = matrix_file
    rng = np.random.default_rng(100 + alg)
    batch, n = 12, mat.num_bit_nodes
    qber = 0.04
    num_errors = int(n * qber)
    alice = rng.integers(0, 2, (batch, n))
    bob = alice.copy()
    for b in range(batch):
        pos = rng.permutation(n)[:num_errors]
        bob[b, pos] ^= 1

    ref = _run_reference(
        harness, path, alg, alice, bob, qber, primary, secondary, threshold
    )

    log_p = np.log((1 - qber) / qber)
    for b in range(batch):
        llr = np.where(bob[b] == 1, -log_p, log_p)
        syn = calculate_syndrome(mat.check_nodes, alice[b])
        dec, ok, iters = decode_oracle(
            mat, llr, syn, alg, 60, primary=primary, secondary=secondary,
            threshold=threshold, use_threshold=threshold > 0,
        )
        keys_match = bool(np.array_equal(dec, alice[b]))
        assert (iters, ok, keys_match) == ref[b], (
            f"frame {b}: ours {(iters, ok, keys_match)} vs C++ {ref[b]}"
        )
