"""Per-engine achieved-bandwidth table (BASELINE.md round-3 item).

The north star phrases the kernel target in bandwidth terms
("check<->variable kernels at HBM-bandwidth speed-of-light per chip"), so
this probe measures each Pallas engine's per-frame-iteration time with a
forced-no-convergence run (QBER past the code's threshold at a fixed
iteration cap — every frame runs exactly ``cap`` iterations, so
frames/s * cap = frame-iterations/s) and divides the engine's known HBM
traffic per frame-iteration by it.

Traffic models (bytes moved per frame per iteration):
  * qc (fused, VMEM-resident)      : ~0 — the decode never touches HBM
    between entry and exit; the meaningful roof is the VPU, not HBM.
  * generic (fused, VMEM-resident) : ~0 — same.
  * qc_stream (HBM extrinsics)     : 2 * 4 * cw * N   (read + write of the
    extrinsic planes; totals/syndrome stay in VMEM).
  * stream (staged Clos exchange)  : measured staged traffic from the
    plan (stream_plan staging arrays, read + write per iteration).

Usage: python scripts/bandwidth_table.py [--cap 64] [--engines all]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
HBM_ROOF_GBPS = 800


def _fps(matrix, cfg_extra, batch, trials, qber, alpha, cap, label):
    import dataclasses

    from qkd_ldpc_v_tpu.config import Config, DecodingAlgorithm, RQBERRange
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams
    from qkd_ldpc_v_tpu.simulation import (
        ScalingFactors, SimCombination, run_combination,
    )

    cfg = Config(
        trials_number=trials,
        simulation_seed=123,
        decoding_algorithm=DecodingAlgorithm.NMSA,
        decoding_alg_max_iterations=cap,
        r_qber_ranges=(RQBERRange(0.99, qber, qber, 0.01),),
        batch_size=batch,
        use_pallas=True,
        **cfg_extra,
    )
    comb = SimCombination(qber, HMatrixParams(), ScalingFactors(primary=alpha))
    warm_cfg = dataclasses.replace(cfg, trials_number=batch)
    t0 = time.perf_counter()
    w = run_combination(matrix, comb, warm_cfg, sim_number=0)
    print(f"[{label}] warmup {time.perf_counter() - t0:.0f}s "
          f"conv_ratio={w.ratio_trials_success_decoding:.3f}",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    res = run_combination(matrix, comb, cfg, sim_number=1)
    dt = time.perf_counter() - t0
    return trials / dt, res.ratio_trials_success_decoding


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--trials", type=int, default=1024)
    ap.add_argument("--engines", default="qc,generic,qc_stream,stream")
    args = ap.parse_args()

    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from qkd_ldpc_v_tpu.config import Config, MatrixFormat
    from qkd_ldpc_v_tpu.models.hmatrix import read_matrix, read_sparse_matrix_alist
    from qkd_ldpc_v_tpu.models.qc import generate_qc_peg
    from qkd_ldpc_v_tpu.simulation import pallas_engine

    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind}", flush=True)
    engines = args.engines.split(",")
    rows = []
    # Past-threshold QBER forces every frame to the cap.
    cap = args.cap

    if "qc" in engines:
        m = generate_qc_peg(20, 6, 512, 4, seed=9).to_hmatrix()
        fps, conv = _fps(m, {}, 24576, max(args.trials, 24576), 0.045,
                         0.65, cap, "qc")
        assert conv < 0.02, conv
        per = 1e6 / (fps * cap)
        rows.append(("qc (fused 10k)", per, 0.0, "VPU"))
    if "generic" in engines:
        m = read_sparse_matrix_alist(
            ROOT / "sparse_matrices/matrices_alist"
            / "(N=10240,M=2841,R=0.72,CW=4,SEED=66).mtrx")
        fps, conv = _fps(m, {}, 4096, max(args.trials, 4096), 0.045,
                         0.70, cap, "generic")
        assert conv < 0.02, conv
        per = 1e6 / (fps * cap)
        rows.append(("generic (fused alist 10k)", per, 0.0, "VPU"))
    if "qc_stream" in engines:
        m = read_matrix(
            ROOT / "sparse_matrices/matrices_qc"
            / "(N=102400,M=30720,R=0.70,CW=3,Z=2048,SEED=56).mtrx",
            MatrixFormat.QC)
        cfgp = Config(use_pallas=True)
        # Round 4: the flagship routes to the fused kernel; force the
        # fused gate shut so this row measures the streamed engine.
        import qkd_ldpc_v_tpu.ops.pallas_qc as _pk
        orig_gate = _pk.feasible_batch_tile
        _pk.feasible_batch_tile = lambda *a, **k: 0
        try:
            assert pallas_engine(m, cfgp) == "qc_stream"
            fps, conv = _fps(m, {}, 256, args.trials, 0.045, 0.8, cap,
                             "qc_stream")
        finally:
            _pk.feasible_batch_tile = orig_gate
        assert conv < 0.02, conv
        per = 1e6 / (fps * cap)
        traffic = 2 * 4 * 3 * m.num_bit_nodes  # bytes/frame/sweep
        rows.append(("qc_stream (100k QC)", per, traffic, "HBM"))
    if "stream" in engines:
        p = ROOT / ("sparse_matrices/matrices_alist/"
                    "(N=102400,M=31744,R=0.69,CW=3,SEED=67).mtrx")
        ref = Path("/root/reference/sparse_matrices/matrices_alist_100k_all/"
                   "(N=102400,M=32001,R=0.69,CW=3,SEED=777).mtrx")
        m = read_sparse_matrix_alist(ref if ref.exists() else p)
        fps, conv = _fps(m, {}, 64, max(256, args.trials // 4), 0.045,
                         0.8, cap, "stream")
        assert conv < 0.02, conv
        per = 1e6 / (fps * cap)
        # Staged traffic: measured in round 2 at ~79 MB per 8-frame group
        # iteration at cap_rows=512/tb=8 (docs/KERNEL.md) -> ~9.9 MB/frame.
        traffic = 79e6 / 8
        rows.append(("stream (100k alist)", per, traffic, "HBM"))

    print("\n| engine | us/frame/iter | HBM bytes/frame/iter | achieved GB/s"
          " | % of 800 GB/s roof | bound |")
    print("|---|---|---|---|---|---|")
    for name, per, traffic, bound in rows:
        gbps = traffic / per / 1e3 if traffic else 0.0
        pct = 100 * gbps / HBM_ROOF_GBPS
        print(f"| {name} | {per:.2f} | {traffic / 1e6:.2f} MB "
              f"| {gbps:.0f} | {pct:.0f}% | {bound} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
