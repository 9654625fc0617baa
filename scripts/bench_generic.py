"""Measure the fused generic kernel on the reference's alist matrix.

Raw-kernel (mc mode) throughput probe used to tune batch_tile / transport /
alpha for the reference workload; the end-to-end number lives in bench.py.

  python scripts/bench_generic.py [--tile 8] [--transport bf16x2]
                                  [--batch 8192] [--alphas 0.65,0.7,...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE_MATRIX = Path(
    "/root/reference/sparse_matrices/matrices_alist_10k_all/"
    "(N=10240,M=2841,R=0.72,CW=4,SEED=666).mtrx"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", type=Path, default=REFERENCE_MATRIX)
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--transport", default="bf16x2")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--qber", type=float, default=0.03)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--alphas", default="0.7")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qkd_ldpc_v_tpu.config import DecodingAlgorithm
    from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist
    from qkd_ldpc_v_tpu.ops.pallas_generic import (
        make_pallas_generic_montecarlo,
    )
    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    matrix = read_sparse_matrix_alist(args.matrix)
    n = matrix.num_bit_nodes
    num_errors = int(n * args.qber)

    mc = jax.jit(make_pallas_generic_montecarlo(
        matrix, DecodingAlgorithm.NMSA, args.iters, False,
        batch=args.batch, batch_tile=args.tile, transport=args.transport,
    ))

    alphas = [float(a) for a in args.alphas.split(",")]
    t0 = time.perf_counter()
    jax.block_until_ready(mc(
        jnp.int32(1), jnp.int32(num_errors), jnp.float32(args.qber),
        jnp.float32(alphas[0]),
    ))
    print(f"compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    for alpha in alphas:
        t0 = time.perf_counter()
        syn, keys, iters = mc(
            jnp.int32(2), jnp.int32(num_errors), jnp.float32(args.qber),
            jnp.float32(alpha),
        )
        jax.block_until_ready(keys)
        dt = time.perf_counter() - t0
        fer = 1.0 - float(jnp.mean(keys.astype(jnp.float32)))
        mit = float(jnp.mean(iters.astype(jnp.float32)))
        print(
            f"[{args.transport}] B={args.batch} tile={args.tile} "
            f"alpha={alpha}: {args.batch / dt:.0f} f/s FER={fer:.5f} "
            f"mean_it={mit:.1f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
