"""Measure N=102400 decode throughput on the real TPU (BASELINE.md entry).

The reference's largest production suite is matrices_alist_100k_all
(18 matrices, CW=3). The fused (VMEM-resident) Pallas kernels gate out at
this size; with --pallas=1 (default) the driver picks the streaming
HBM-resident kernel (ops/pallas_stream.py), with --pallas=0 the generic
XLA decoder with two-phase straggler re-decode. Usage:

    python scripts/bench_100k.py [batch] [trials] [--dtype=float32|bfloat16]
                                 [--alpha=0.8] [--matrix=path] [--pallas=0|1]
                                 [--phase1=N]

Keep batch <= 64 on the streaming path: the kernel decodes sequential
8-frame groups (throughput is flat in batch), and modules with larger
batches currently crash the tunnel's remote compile helper.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from qkd_ldpc_v_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from qkd_ldpc_v_tpu.config import (  # noqa: E402
    Config, DecodingAlgorithm, RQBERRange,
)
from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist  # noqa: E402
from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams  # noqa: E402
from qkd_ldpc_v_tpu.simulation import (  # noqa: E402
    ScalingFactors, SimCombination, run_combination,
)

MATRIX = Path(
    "/root/reference/sparse_matrices/matrices_alist_100k_all/"
    "(N=102400,M=32001,R=0.69,CW=3,SEED=777).mtrx"
)
QBER = 0.03
ALPHA = 0.8


def main() -> int:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a.lstrip("-").split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    batch = int(pos[0]) if pos else 256
    trials = int(pos[1]) if len(pos) > 1 else 512
    dtype = opts.get("dtype", "float32")
    alpha = float(opts.get("alpha", ALPHA))
    matrix_path = Path(opts.get("matrix", MATRIX))
    use_pallas = opts.get("pallas", "1") not in ("0", "false")
    phase1 = int(opts.get("phase1", "-1"))  # -1 auto (XLA engines only)
    print(f"device: {jax.devices()[0]} dtype={dtype} alpha={alpha} "
          f"batch={batch} pallas={use_pallas}", file=sys.stderr)
    matrix = read_sparse_matrix_alist(matrix_path)

    def cfg(n):
        return Config(
            trials_number=n,
            simulation_seed=7,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=100,
            r_qber_ranges=(RQBERRange(0.99, QBER, QBER, 0.01),),
            batch_size=batch,
            dtype=dtype,
            use_pallas=use_pallas,
            phase1_iterations=phase1,
        )

    comb = SimCombination(QBER, HMatrixParams(), ScalingFactors(primary=alpha))
    t0 = time.perf_counter()
    warm = run_combination(matrix, comb, cfg(batch), sim_number=0)
    print(
        f"warmup {time.perf_counter()-t0:.1f}s "
        f"FER={1-warm.ratio_trials_success_ldpc:.4f} "
        f"iters={warm.iter_success_mean:.1f}",
        file=sys.stderr,
    )
    t0 = time.perf_counter()
    res = run_combination(matrix, comb, cfg(trials), sim_number=1)
    dt = time.perf_counter() - t0
    print(
        f"{matrix_path.stem} NMSA alpha={alpha} dtype={dtype} QBER={QBER}: "
        f"{trials} frames in {dt:.1f}s -> {trials/dt:.1f} frames/s "
        f"({trials/dt*102400/1e6:.1f} Mbit/s raw key), "
        f"FER={1-res.ratio_trials_success_ldpc:.4f} "
        f"mean_iters={res.iter_success_mean:.1f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
