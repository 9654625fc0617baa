"""Sweep-level A/B parity against the ACTUAL reference simulation layer.

tools/reference_harness/ref_sweep compiles the reference's simulation layer
(src/simulation.cpp: prepare_sim_inputs, QKD_LDPC_batch_simulation,
process_trials_results, write_file) straight out of /root/reference/src and
runs it end to end — real combination builder, real trial loop, real CSV
writer (the fmt stub implements the exact format specs the reference uses,
including the comma-decimal locale).

Three layers of evidence on top of tests/test_reference_parity.py's
per-frame decoder exactness:

  * statistics + CSV EXACT parity: identical synthetic per-trial outcomes
    through the reference's process_trials_results/write_file and ours must
    produce byte-identical CSV files (filename scheme, comma decimals, FER
    rounding at trial granularity, size_t-truncated throughput, the
    min-iterations-0 sentinel when no trial succeeds);
  * fixed-rate sweep parity: same config -> same combination set (rows,
    QBER x ALPHA cross, R/M/N/TYPE columns exact) with statistics agreeing
    within Monte-Carlo tolerance (trial PRNGs differ: Xoshiro vs threefry);
  * rate-adaptive sweep parity: the deterministic adaptation columns
    (DELTA;EFFICIENCY;PUNCT_FRACTION;SHORT_FRACTION;R_ADAPTED) must agree
    exactly.

Skipped when the reference checkout or a C++ toolchain is unavailable.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import (
    Config,
    DecodingAlgorithm,
    MatrixFormat,
    QBERAdaptationParameters,
    RQBERAdaptationParametersMap,
    RQBERRange,
    RScalingFactorMap,
    ScalingFactorParams,
    ScalingFactorRange,
)
from qkd_ldpc_v_tpu.simulation import (
    ScalingFactors,
    SimResult,
    prepare_sim_inputs,
    process_trials_results,
    qkd_ldpc_batch_simulation,
    write_file,
)

HARNESS_DIR = Path(__file__).resolve().parent.parent / "tools" / "reference_harness"
REFERENCE = Path("/root/reference")
MATRIX = (
    Path(__file__).resolve().parent.parent
    / "sparse_matrices"
    / "matrices_alist"
    / "(N=1024,M=512,R=0.50,CW=3,SEED=5).mtrx"
)


@pytest.fixture(scope="module")
def ref_sweep():
    if not REFERENCE.is_dir():
        pytest.skip("reference checkout unavailable")
    binary = HARNESS_DIR / "ref_sweep"
    build = subprocess.run(
        ["make", "-C", str(HARNESS_DIR), "ref_sweep"],
        capture_output=True,
        text=True,
    )
    if build.returncode != 0 or not binary.exists():
        pytest.skip(f"ref_sweep build failed: {build.stderr[-300:]}")
    return binary


def run_ref(binary, mode_args, stdin_text, timeout=600):
    out = subprocess.run(
        [str(binary), *mode_args],
        input=stdin_text,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    return Path(lines[0]), "\n".join(lines[1:]) + "\n"


# ---------------------------------------------------------------------------
# Exact statistics + CSV parity on identical synthetic trial outcomes
# ---------------------------------------------------------------------------

# (iters, syndromes_match, keys_match, runtime_us) per trial; crafted to hit
# the edge semantics: iteration ties, converged-but-keys-differ trials, the
# all-failed combination (min sentinel -> 0), and FER values that exercise
# the round-to-trial-granularity path.
STATS_CASES = [
    # (meta, trials)
    (
        dict(sim_number=0, filename="a.mtrx", regular=1, n=1024, m=512,
             delta=0.0, eff=0.0, pf=0.0, sf=0.0, ar=0.0, q=0.03,
             aq=float(int(1024 * 0.03)) / 1024, primary=0.8, secondary=0.0,
             n_remove=0),
        [(5, 1, 1, 100), (7, 1, 1, 120), (100, 0, 0, 500), (9, 1, 0, 90),
         (12, 1, 1, 130), (6, 1, 1, 101), (8, 1, 1, 99), (100, 0, 0, 505),
         (11, 1, 1, 140), (5, 1, 1, 111)],
    ),
    (
        dict(sim_number=1, filename="a.mtrx", regular=1, n=1024, m=512,
             delta=0.0, eff=0.0, pf=0.0, sf=0.0, ar=0.0, q=0.05,
             aq=float(int(1024 * 0.05)) / 1024, primary=0.8, secondary=0.0,
             n_remove=0),
        [(100, 0, 0, 400)] * 10,  # nothing converges: min must become 0
    ),
    (
        dict(sim_number=2, filename="a.mtrx", regular=0, n=1024, m=512,
             delta=0.0, eff=0.0, pf=0.0, sf=0.0, ar=0.0, q=0.02,
             aq=float(int(1024 * 0.02)) / 1024, primary=0.8, secondary=0.0,
             n_remove=0),
        [(3, 1, 1, 77)] * 9 + [(100, 0, 0, 390)],  # FER = 0.1 exactly
    ),
]


@pytest.mark.parametrize("throughput", [False, True])
def test_stats_csv_exact_parity(ref_sweep, tmp_path, throughput):
    cfg = Config(
        trials_number=10,
        simulation_seed=42,
        decoding_algorithm=DecodingAlgorithm.NMSA,
        decoding_alg_max_iterations=100,
        r_qber_ranges=(RQBERRange(0.99, 0.03, 0.03, 0.01),),
        enable_throughput_measurement=throughput,
        consider_rtt=throughput,
        rtt_ms=0.4,
    )

    cfg_lines = [
        "trials 10", "algorithm 2", "max_iters 100", "seed 42", "threads 1",
        f"throughput {int(throughput)}", f"consider_rtt {int(throughput)}",
        "rtt 0.4", "end",
    ]
    stats_lines = []
    for meta, trials in STATS_CASES:
        stats_lines.append(
            f"result {meta['sim_number']} {meta['filename']} "
            f"{meta['regular']} {meta['n']} {meta['m']} {meta['delta']} "
            f"{meta['eff']} {meta['pf']} {meta['sf']} {meta['ar']} "
            f"{meta['q']} {meta['aq']} {meta['primary']} "
            f"{meta['secondary']} {meta['n_remove']} {len(trials)}"
        )
        stats_lines += [" ".join(map(str, t)) for t in trials]
    stats_lines.append("done")

    ref_dir = tmp_path / "ref"
    ref_path, ref_csv = run_ref(
        ref_sweep, ["stats", str(ref_dir)],
        "\n".join(cfg_lines + stats_lines) + "\n",
    )

    # Ours: identical outcomes through our aggregation + writer.
    results = []
    for meta, trials in STATS_CASES:
        r = SimResult(
            sim_number=meta["sim_number"],
            matrix_filename=meta["filename"],
            is_regular=bool(meta["regular"]),
            num_bit_nodes=meta["n"],
            num_check_nodes=meta["m"],
            config_qber=meta["q"],
            accurate_qber=meta["aq"],
            delta=meta["delta"],
            efficiency=meta["eff"],
            punctured_fraction=meta["pf"],
            shortened_fraction=meta["sf"],
            adapted_code_rate=meta["ar"],
            scaling_factors=ScalingFactors(meta["primary"], meta["secondary"]),
        )
        arr = np.array(trials)
        process_trials_results(
            cfg,
            syndromes_match=arr[:, 1].astype(bool),
            keys_match=arr[:, 2].astype(bool),
            iterations=arr[:, 0],
            runtimes_us=arr[:, 3].astype(np.float64) if throughput else None,
            out_key_length=meta["n"] - meta["n_remove"],
            result=r,
        )
        results.append(r)
    our_dir = tmp_path / "ours"
    our_path = write_file(results, cfg, "0s", our_dir)

    assert our_path.name == ref_path.name
    assert our_path.read_text() == ref_csv


# ---------------------------------------------------------------------------
# Fixed-rate sweep: same combinations, statistics within MC tolerance
# ---------------------------------------------------------------------------

def parse_csv(text):
    lines = text.strip().splitlines()
    header = lines[0].split(";")
    rows = [dict(zip(header, ln.split(";"))) for ln in lines[1:]]
    return header, rows


def test_fixed_rate_sweep_parity(ref_sweep, tmp_path):
    trials = 400
    cfg_lines = [
        f"trials {trials}", "algorithm 2", "max_iters 100", "seed 42",
        "threads 1", "matrix_format 1",
        "rqber 0.99 0.02 0.03 0.01",
        "primary_range 0.75 0.85 0.05",
        "end",
    ]
    mat_dir = tmp_path / "matrices"
    mat_dir.mkdir()
    (mat_dir / MATRIX.name).write_bytes(MATRIX.read_bytes())
    ref_path, ref_csv = run_ref(
        ref_sweep, ["sweep", str(mat_dir), str(tmp_path / "ref")],
        "\n".join(cfg_lines) + "\n",
    )

    cfg = Config(
        trials_number=trials,
        simulation_seed=42,
        decoding_algorithm=DecodingAlgorithm.NMSA,
        decoding_alg_max_iterations=100,
        matrix_format=MatrixFormat.ALIST,
        r_qber_ranges=(RQBERRange(0.99, 0.02, 0.03, 0.01),),
        primary=ScalingFactorParams(
            use_range=True, range=ScalingFactorRange(0.75, 0.85, 0.05)
        ),
        batch_size=512,
    )
    inputs = prepare_sim_inputs([mat_dir / MATRIX.name], cfg)
    results = qkd_ldpc_batch_simulation(inputs, cfg)
    our_path = write_file(results, cfg, "0s", tmp_path / "ours")

    assert our_path.name == ref_path.name
    ref_header, ref_rows = parse_csv(ref_csv)
    our_header, our_rows = parse_csv(our_path.read_text())
    assert our_header == ref_header
    assert len(our_rows) == len(ref_rows) == 6  # 2 QBER x 3 alpha

    for ref_row, our_row in zip(ref_rows, our_rows):
        # The combination identity and matrix metadata must match exactly.
        for col in ("#", "MATRIX_FILENAME", "TYPE", "R", "M", "N",
                    "CONFIG_QBER", "ACCURATE_QBER", "ALPHA"):
            assert our_row[col] == ref_row[col], col
        # Statistics: different trial PRNGs, so Monte-Carlo tolerance.
        fer_ref = float(ref_row["FER"].replace(",", "."))
        fer_our = float(our_row["FER"].replace(",", "."))
        assert abs(fer_our - fer_ref) <= 0.02
        it_ref = float(ref_row["ITER_SUCCESS_MEAN"].replace(",", "."))
        it_our = float(our_row["ITER_SUCCESS_MEAN"].replace(",", "."))
        assert abs(it_our - it_ref) <= 0.5


# ---------------------------------------------------------------------------
# Rate-adaptive sweep: deterministic adaptation columns exact
# ---------------------------------------------------------------------------

def test_rate_adapt_sweep_parity(ref_sweep, tmp_path):
    trials = 60
    qber, delta, eff = 0.1, 0.1, 1.15
    cfg_lines = [
        f"trials {trials}", "algorithm 2", "max_iters 100", "seed 7",
        "threads 1", "matrix_format 1",
        "rate_adapt 1", "untainted 0", "use_adapt_ranges 0",
        f"adapt_map 0.99 {qber} {delta} {eff}",
        "primary_map 0.99 0.75",
        "end",
    ]
    mat_dir = tmp_path / "matrices"
    mat_dir.mkdir()
    (mat_dir / MATRIX.name).write_bytes(MATRIX.read_bytes())
    ref_path, ref_csv = run_ref(
        ref_sweep, ["sweep", str(mat_dir), str(tmp_path / "ref")],
        "\n".join(cfg_lines) + "\n",
    )

    cfg = Config(
        trials_number=trials,
        simulation_seed=7,
        decoding_algorithm=DecodingAlgorithm.NMSA,
        decoding_alg_max_iterations=100,
        matrix_format=MatrixFormat.ALIST,
        enable_code_rate_adaptation=True,
        enable_untainted_puncturing=False,
        use_adaptation_parameters_ranges=False,
        r_qber_adapt_params_maps=(
            RQBERAdaptationParametersMap(
                0.99, QBERAdaptationParameters(qber, delta, eff)
            ),
        ),
        primary=ScalingFactorParams(
            use_range=False, maps=(RScalingFactorMap(0.99, 0.75),)
        ),
        batch_size=64,
    )
    inputs = prepare_sim_inputs([mat_dir / MATRIX.name], cfg)
    assert inputs[0].combinations, "adaptation point unexpectedly skipped"
    results = qkd_ldpc_batch_simulation(inputs, cfg)
    our_path = write_file(results, cfg, "0s", tmp_path / "ours")

    assert our_path.name == ref_path.name
    ref_header, ref_rows = parse_csv(ref_csv)
    our_header, our_rows = parse_csv(our_path.read_text())
    assert our_header == ref_header
    assert len(our_rows) == len(ref_rows) == 1
    for col in ("#", "MATRIX_FILENAME", "TYPE", "R", "M", "N", "CONFIG_QBER",
                "ACCURATE_QBER", "DELTA", "EFFICIENCY", "PUNCT_FRACTION",
                "SHORT_FRACTION", "R_ADAPTED", "ALPHA"):
        assert our_rows[0][col] == ref_rows[0][col], col
