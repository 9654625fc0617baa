"""Headline benchmark: decoded 10k-bit frames per second at QBER 0.03.

Operating point (BASELINE.md north star): 10240-bit frames, R = 0.725,
NMSA decoder, iteration cap 100, QBER 0.03, one chip. Two paths are
measured through the real driver (run_combination):

  * headline — a QC-PEG code (models/qc.py; N=10240, R=0.70, Z=512, CW=4,
    f_EC = 1.54 — inside the reference's swept efficiency range 1.12-1.85)
    through the fused Pallas decoder (ops/pallas_qc.py) at its tuned
    alpha = 0.65, layered (serial-C) schedule — the performance mode that
    halves sweeps at equal-or-better FER; FER at this point is ~0 (0 fails
    at 2e5 trials), far below the reference's PEG alist code at its
    alpha = 0.8. The same point under the reference's flooding schedule is
    reported as ``qc_flooding_frames_per_s`` (the parity-semantics number).
  * alist — the reference's own alist matrix (its production code family)
    through the best available engine, for like-for-like comparison on the
    reference's exact workload. Always measured; reported in the same JSON
    line as ``alist_frames_per_s`` / ``alist_vs_baseline``.

vs_baseline is measured against the north-star target of 1e5 frames/s/chip
(the reference publishes no numbers of its own — see BASELINE.md).

Prints exactly one JSON line on stdout; diagnostics go to stderr.

A third field tracks the reference's largest production frames: the
N=102400 alist matrix through the streaming HBM-resident kernel
(``stream100k_frames_per_s``; see BASELINE.md §N=102400).

Every leg is timed as the median of BENCH_REPS (default 5) identical
dispatches after one warmup, and the JSON carries the min/max spread —
single sub-second dispatches through the tunnel proved unreliable
(BENCH_r03 vs BASELINE.md, VERDICT r03).

Round-5 robustness contract (VERDICT r04 item 3): every leg runs inside
its own try/except — a compile failure or crash omits that leg's fields
instead of killing the record — and a global deadline (BENCH_DEADLINE
seconds, default 3000) skips remaining legs once exceeded so the record
always completes with rc=0 inside the driver's budget. The slow 100k legs
default to 3 reps (BENCH_REPS_SLOW); the persistent XLA compilation cache
(utils.enable_compilation_cache) makes warmups cheap when the kernels are
unchanged since the last on-hardware run.

Env knobs: BENCH_REPS (default 5), BENCH_REPS_SLOW (default 3, the 100k
legs), BENCH_DEADLINE (default 3000 s), BENCH_BATCH (default 786432 —
bigger dispatches amortize tunnel noise; measured faster and tighter
than 196608 at every step of the sweep), BENCH_STEPS (default 1),
BENCH_ALIST=0 to skip the alist measurement (slow first compile),
BENCH_ALIST_BATCH (default 32768), BENCH_100K=0 to skip the 100k
measurement, BENCH_100K_TRIALS (default 1024 — enough 64-frame steps that
per-step dispatch overhead stops masking the steady-state operating point;
256 under-reported it by ~19% in round 2), BENCH_QC100K=0 to skip the
streamed-QC 100k measurement, BENCH_QC100K_TRIALS / BENCH_QC100K_BATCH /
BENCH_QC100K_SCHEDULE to reshape it.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path
from typing import NamedTuple


class Sample(NamedTuple):
    """Median-of-reps throughput with its observed spread (frames/s)."""

    median: float
    min: float
    max: float
    reps: int
    fer: float

    def fields(self, prefix: str) -> dict:
        return {
            f"{prefix}_frames_per_s": round(self.median, 1),
            f"{prefix}_fps_min": round(self.min, 1),
            f"{prefix}_fps_max": round(self.max, 1),
            f"{prefix}_fer": round(self.fer, 5),
        }

REFERENCE_MATRIX = Path(
    "/root/reference/sparse_matrices/matrices_alist_10k_all/"
    "(N=10240,M=2841,R=0.72,CW=4,SEED=666).mtrx"
)
REFERENCE_MATRIX_100K = Path(
    "/root/reference/sparse_matrices/matrices_alist_100k_all/"
    "(N=102400,M=32001,R=0.69,CW=3,SEED=777).mtrx"
)
# Committed fallbacks (scripts/make_assets.py) so every leg runs from
# this repo alone when the reference mount is absent.
_REPO = Path(__file__).resolve().parent
LOCAL_MATRIX_10K = (
    _REPO / "sparse_matrices/matrices_alist"
    / "(N=10240,M=2841,R=0.72,CW=4,SEED=66).mtrx"
)
LOCAL_MATRIX_100K = (
    _REPO / "sparse_matrices/matrices_alist"
    / "(N=102400,M=31744,R=0.69,CW=3,SEED=67).mtrx"
)
QC_MATRIX_100K = (
    _REPO / "sparse_matrices/matrices_qc"
    / "(N=102400,M=30720,R=0.70,CW=3,Z=2048,SEED=56).mtrx"
)
TARGET_FRAMES_PER_S = 1e5  # BASELINE.md north star, v5e chip
QBER = 0.03
MAX_ITERATIONS = 100
QC_ALPHA = 0.65  # tuned for the headline QC-PEG code (FER ~0 at QBER 0.03)
# Tuned on-device sweep (alpha is a traced scalar — no recompile): 0.7
# gives both the best FER (0.0015 vs 0.0198 at the round-1 0.8) and the
# fastest convergence on the reference's alist PEG code at QBER 0.03.
ALIST_ALPHA = 0.70


_T0 = time.perf_counter()


def _deadline_exceeded(label: str) -> bool:
    """True (and logs) once the global budget is spent — remaining legs are
    skipped so the record always completes inside the driver's timeout."""
    limit = float(os.environ.get("BENCH_DEADLINE", "3000"))
    spent = time.perf_counter() - _T0
    if spent > limit:
        print(
            f"bench[{label}]: skipped — deadline exceeded "
            f"({spent:.0f}s > {limit:.0f}s)",
            file=sys.stderr,
        )
        return True
    return False


def _leg(label: str, fn) -> dict:
    """Run one bench leg; a crash omits its fields instead of killing the
    whole record (VERDICT r04 item 3)."""
    if _deadline_exceeded(label):
        return {}
    try:
        return fn()
    except Exception as e:  # noqa: BLE001
        print(f"bench[{label}] failed: {e!r}", file=sys.stderr)
        return {}


def _measure(matrix, alpha, cfg_extra, batch, steps, label, reps=None):
    """Warm up once, then time BENCH_REPS (default 5) identical dispatches.

    Round-3 lesson (VERDICT r03 §weak-1): a single sub-second dispatch
    through the tunnel is not a round record — BENCH_r03's headline came in
    16% under the documented number on one 0.69 s sample. Report the median
    of >=5 timed dispatches plus the spread so the record carries its own
    error bar.
    """
    import statistics

    from qkd_ldpc_v_tpu.config import Config, DecodingAlgorithm, RQBERRange
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams
    from qkd_ldpc_v_tpu.simulation import (
        ScalingFactors,
        SimCombination,
        run_combination,
    )

    if reps is None:
        reps = int(os.environ.get("BENCH_REPS", "5"))
    reps = max(1, reps)

    def cfg_for(trials):
        return Config(
            trials_number=trials,
            simulation_seed=123,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=MAX_ITERATIONS,
            r_qber_ranges=(RQBERRange(0.99, QBER, QBER, 0.01),),
            batch_size=batch,
            **cfg_extra,
        )

    comb = SimCombination(QBER, HMatrixParams(), ScalingFactors(primary=alpha))
    t0 = time.perf_counter()
    warm = run_combination(matrix, comb, cfg_for(batch), sim_number=0)
    print(
        f"bench[{label}]: warmup {time.perf_counter() - t0:.1f}s "
        f"FER={1 - warm.ratio_trials_success_ldpc:.4f} "
        f"mean_iters={warm.iter_success_mean:.1f}",
        file=sys.stderr,
    )
    samples = []
    fer = 0.0
    for rep in range(reps):
        t0 = time.perf_counter()
        res = run_combination(
            matrix, comb, cfg_for(steps * batch), sim_number=1 + rep
        )
        elapsed = time.perf_counter() - t0
        samples.append(steps * batch / elapsed)
        fer = max(fer, 1 - res.ratio_trials_success_ldpc)
    med = statistics.median(samples)
    lo, hi = min(samples), max(samples)
    print(
        f"bench[{label}]: {steps * batch} trials x{reps} -> median "
        f"{med:.0f} frames/s [{lo:.0f}, {hi:.0f}] (FER<={fer:.4f})",
        file=sys.stderr,
    )
    return Sample(med, lo, hi, reps, fer)


def main() -> int:
    import jax

    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist
    from qkd_ldpc_v_tpu.models.qc import generate_qc_peg

    # Bigger dispatches measure faster AND tighter through the tunnel
    # (round-5 sweep: 196608 -> 325.8k median [288.8k, 336.6k]; 393216 ->
    # 348.0k [338.2k, 349.8k]; 786432 -> 355.4k [327.1k, 357.1k] at
    # ~2.2 s/dispatch): per-dispatch noise dominates sub-second legs.
    batch = int(os.environ.get("BENCH_BATCH", "786432"))
    steps = int(os.environ.get("BENCH_STEPS", "1"))
    schedule = os.environ.get("BENCH_SCHEDULE", "layered")

    dev = jax.devices()[0]
    print(f"bench: device={dev.platform}:{dev.device_kind}", file=sys.stderr)
    reps_slow = int(os.environ.get("BENCH_REPS_SLOW", "3"))

    # Headline: QC-PEG code through the fused Pallas kernel.
    qc_matrix = generate_qc_peg(
        base_bits=20, base_checks=6, lifting=512, column_weight=4, seed=9
    ).to_hmatrix()

    def leg_headline():
        head = _measure(
            qc_matrix, QC_ALPHA, {"use_pallas": True, "schedule": schedule},
            batch, steps, "qc-pallas",
        )
        return {
            "value": round(head.median, 1),
            "vs_baseline": round(head.median / TARGET_FRAMES_PER_S, 4),
            "value_fps_min": round(head.min, 1),
            "value_fps_max": round(head.max, 1),
            "bench_reps": head.reps,
        }

    head_fields = _leg("qc-pallas", leg_headline)

    def leg_flooding():
        flood = _measure(
            qc_matrix, QC_ALPHA, {"use_pallas": True}, batch, steps,
            "qc-flooding",
        )
        return {
            "qc_flooding_frames_per_s": round(flood.median, 1),
            "qc_flooding_fps_min": round(flood.min, 1),
            "qc_flooding_fps_max": round(flood.max, 1),
        }

    flood_fields = {}
    if schedule == "layered" and os.environ.get("BENCH_FLOODING", "1") != "0":
        flood_fields = _leg("qc-flooding", leg_flooding)

    # The reference's own matrix (alist PEG): always measured so the round
    # record tracks the weakest, most comparable number too. Falls back to
    # the committed 10k alist asset when the reference mount is absent, as
    # the 100k legs already do.
    matrix_10k = (
        REFERENCE_MATRIX if REFERENCE_MATRIX.exists() else LOCAL_MATRIX_10K
    )

    def leg_alist():
        # 32768 measures 27.0k median [26.9k, 27.4k] vs 24.9-25.1k at
        # 8192 (round 5) — same dispatch-noise amortization as the
        # headline batch sweep.
        alist_batch = int(os.environ.get("BENCH_ALIST_BATCH", "32768"))
        alist = read_sparse_matrix_alist(matrix_10k)
        asample = _measure(
            alist, ALIST_ALPHA, {"use_pallas": True}, alist_batch, steps,
            "alist",
        )
        return {
            **asample.fields("alist"),
            "alist_vs_baseline": round(asample.median / TARGET_FRAMES_PER_S, 4),
            "alist_matrix": matrix_10k.name,
        }

    alist_fields = {}
    if os.environ.get("BENCH_ALIST", "1") != "0" and matrix_10k.exists():
        alist_fields = _leg("alist", leg_alist)

    # The reference's largest production frames (N=102400) through the
    # streaming HBM-resident kernel (alist — the reference's own format;
    # falls back to the committed 100k asset without the mount).
    matrix_100k = (
        REFERENCE_MATRIX_100K if REFERENCE_MATRIX_100K.exists()
        else LOCAL_MATRIX_100K
    )

    def leg_stream100k():
        trials_100k = int(os.environ.get("BENCH_100K_TRIALS", "1024"))
        big = read_sparse_matrix_alist(matrix_100k)
        ssample = _measure(
            big, 0.8, {"use_pallas": True}, 64,
            max(1, trials_100k // 64), "stream-100k", reps=reps_slow,
        )
        return ssample.fields("stream100k")

    stream_fields = {}
    if os.environ.get("BENCH_100K", "1") != "0" and matrix_100k.exists():
        stream_fields = _leg("stream-100k", leg_stream100k)

    # N=102400 on the committed Z=2048 CW=3 flagship through the fused QC
    # kernel with the schedule-aware tile (BASELINE.md §fused-100k, round
    # 5): layered tile 8 measured 31.4k f/s at batch 4096, 37.6k at 8192,
    # 40.3k at 16384 (the default); flooding tile 24 ~17-18.4k.
    # BENCH_QC100K_SCHEDULE=flooding for the parity-semantics number.
    def leg_qc100k():
        from qkd_ldpc_v_tpu.models.hmatrix import read_matrix
        from qkd_ldpc_v_tpu.config import Config as _Cfg, MatrixFormat
        from qkd_ldpc_v_tpu.simulation import pallas_engine

        qc100k_trials = int(os.environ.get("BENCH_QC100K_TRIALS", "16384"))
        qc100k_batch = int(os.environ.get("BENCH_QC100K_BATCH", "16384"))
        qc100k_sched = os.environ.get("BENCH_QC100K_SCHEDULE", "layered")
        big_qc = read_matrix(QC_MATRIX_100K, MatrixFormat.QC)
        # A schedule-specific compile failure must not take down the leg —
        # fall back layered -> flooding -> omit.
        for sched in dict.fromkeys((qc100k_sched, "flooding")):
            engine = pallas_engine(
                big_qc, _Cfg(use_pallas=True, schedule=sched)
            )
            try:
                qsample = _measure(
                    big_qc, 0.8, {"use_pallas": True, "schedule": sched},
                    qc100k_batch, max(1, qc100k_trials // qc100k_batch),
                    f"qc-100k-{sched}-{engine}", reps=reps_slow,
                )
            except Exception as e:  # noqa: BLE001
                print(f"bench[qc-100k-{sched}] failed: {e!r}",
                      file=sys.stderr)
                continue
            return {
                **qsample.fields("qc100k"),
                "qc100k_schedule": sched,
                "qc100k_engine": engine,
                "qc100k_batch": qc100k_batch,
            }
        return {}

    qc100k_fields = {}
    if os.environ.get("BENCH_QC100K", "1") != "0" and QC_MATRIX_100K.exists():
        qc100k_fields = _leg("qc-100k", leg_qc100k)

    print(json.dumps({
        "metric": "decoded_10k_frames_per_s_qber0.03",
        "value": head_fields.pop("value", None),
        "unit": "frames/s",
        "vs_baseline": head_fields.pop("vs_baseline", None),
        **head_fields,
        **flood_fields,
        **alist_fields,
        **stream_fields,
        **qc100k_fields,
        "bench_seconds": round(time.perf_counter() - _T0, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
