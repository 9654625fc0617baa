"""Probe streaming-decoder block/tile sizes on the real TPU (N=102400).

The streaming kernel's cost is dominated by per-grid-step overhead, not
HBM bandwidth (BASELINE.md): larger cap_rows means fewer blocks per side
(fewer grid steps, bigger DMA slabs), larger batch_tile amortizes table
traffic and fixed costs. Each (cap_rows, tile) point is a fresh Mosaic
compile — expect minutes through the tunnel on first run.

Usage: python scripts/probe_stream.py [--points 256x8,512x8,512x12]
                                      [--batch 64] [--alpha 0.8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MATRIX = Path(
    "/root/reference/sparse_matrices/matrices_alist_100k_all/"
    "(N=102400,M=32001,R=0.69,CW=3,SEED=777).mtrx"
)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--points", default="256x8,512x8,512x12")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--alpha", type=float, default=0.8)
    p.add_argument("--qber", type=float, default=0.03)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--transport", default="f32")
    p.add_argument("--alg", default="NMSA")
    p.add_argument("--alpha2", type=float, default=1.0)
    p.add_argument("--matrix", default=str(MATRIX))
    args = p.parse_args()

    import jax

    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from qkd_ldpc_v_tpu.config import DecodingAlgorithm
    from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist
    from qkd_ldpc_v_tpu.ops.channel import generate_keys, inject_errors
    from qkd_ldpc_v_tpu.ops.pallas_stream import make_pallas_stream_trial
    from qkd_ldpc_v_tpu.ops.stream_plan import build_stream_plan

    print(f"device: {jax.devices()[0]} batch={args.batch}", file=sys.stderr)
    matrix = read_sparse_matrix_alist(args.matrix)
    n = matrix.num_bit_nodes
    errs = int(n * args.qber)

    key = jax.random.PRNGKey(11)
    ka, ke = jax.random.split(key)
    alice = generate_keys(ka, args.batch, n)
    bob = inject_errors(ke, alice, jnp.int32(errs))
    alice.block_until_ready()

    for point in args.points.split(","):
        cap_s, tile_s = point.strip().split("x")
        cap, tile = int(cap_s), int(tile_s)
        t0 = time.time()
        try:
            plan = build_stream_plan(matrix, cap_rows=cap)
            plan_s = time.time() - t0
            trial = make_pallas_stream_trial(
                matrix, DecodingAlgorithm[args.alg], 100, False,
                batch_tile=tile, cap_rows=cap, transport=args.transport,
            )
            t0 = time.time()
            conv, keys, iters = trial(
                alice, bob, args.qber, args.alpha, args.alpha2
            )
            jax.block_until_ready((conv, keys, iters))
            first = time.time() - t0
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                conv, keys, iters = trial(
                    alice, bob, args.qber, args.alpha, args.alpha2
                )
                jax.block_until_ready((conv, keys, iters))
                best = min(best, time.time() - t0)
            fps = args.batch / best
            print(
                f"cap={cap} tile={tile} {args.alg} {args.transport} "
                f"(kb_b={plan.bits.kb} "
                f"kb_c={plan.checks.kb}): {fps:.0f} frames/s "
                f"(best of {args.reps}; plan {plan_s:.0f}s, "
                f"compile+first {first:.1f}s) "
                f"FER={1 - float(np.mean(np.asarray(conv))):.4f} "
                f"mean_iters={float(np.mean(np.asarray(iters))):.1f}"
            )
        except Exception as e:  # noqa: BLE001 — probe records and moves on
            print(f"cap={cap} tile={tile}: FAILED "
                  f"{type(e).__name__}: {str(e)[:220]}")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
