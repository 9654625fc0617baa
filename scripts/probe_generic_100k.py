"""Can the fused generic kernel serve N=102400 under the 84 MiB budget?

The generic kernel's MAX_TILES=4 gate dates from the 16 MiB-scoped-VMEM
era; the round-5 measured envelope (BASELINE.md §tile-sweep) fits the
100k alist edge space (~19 tiles of 128x128 rows, ~41 MB resident at
TB=8 bf16x2) with room to spare. The open question is the Clos permute's
tile-select stage, whose unrolled where-chain is O(Tn^2) = 342 selects —
both a compile-size and a runtime risk. This probe raises MAX_TILES,
checks the offline-lowered module size, then (on TPU) compiles and times
the raw trial kernel on the reference's 100k alist matrix.

Usage: python scripts/probe_generic_100k.py [--max-tiles 20] [--batch 64]
         [--tile 8] [--reps 3] [--lower-only]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-tiles", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--qber", type=float, default=0.03)
    ap.add_argument("--alpha", type=float, default=0.8)
    ap.add_argument("--matrix", default=str(MATRIX))
    ap.add_argument("--lower-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from qkd_ldpc_v_tpu.config import DecodingAlgorithm
    from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist
    from qkd_ldpc_v_tpu.ops import pallas_generic as pg

    pg.MAX_TILES = args.max_tiles
    matrix = read_sparse_matrix_alist(args.matrix)
    n = matrix.num_bit_nodes
    print(f"device={jax.devices()[0]}  N={n}", flush=True)

    t0 = time.perf_counter()
    trial = pg.make_pallas_generic_trial(
        matrix, DecodingAlgorithm.NMSA, 100, False, batch_tile=args.tile,
    )
    print(f"plan+build {time.perf_counter()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(1)
    alice = rng.integers(0, 2, (args.batch, n)).astype(np.int8)
    bob = alice.copy()
    k = int(n * args.qber)
    for b in range(args.batch):
        bob[b, rng.permutation(n)[:k]] ^= 1
    q = k / n

    if args.lower_only:
        t0 = time.perf_counter()
        exp = jax.export.export(
            jax.jit(lambda a, b: trial(a, b, q, args.alpha, 1.0, 0.0)),
            platforms=["tpu"],
        )(jnp.asarray(alice), jnp.asarray(bob))
        print(
            f"lowered: {len(exp.mlir_module_serialized)/1e6:.2f} MB module "
            f"({time.perf_counter()-t0:.0f}s)", flush=True,
        )
        return 0

    t0 = time.perf_counter()
    out = trial(jnp.asarray(alice), jnp.asarray(bob), q, args.alpha, 1.0,
                0.0)
    jax.block_until_ready(out)
    conv = float(np.asarray(out[0]).mean())
    print(f"warmup {time.perf_counter()-t0:.0f}s conv={conv:.2f}", flush=True)
    samples = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        out = trial(jnp.asarray(alice), jnp.asarray(bob), q, args.alpha,
                    1.0, 0.0)
        jax.block_until_ready(out)
        samples.append(args.batch / (time.perf_counter() - t0))
    print(
        f"tiles<={args.max_tiles} tile={args.tile} batch={args.batch}: "
        f"best {max(samples):.0f} f/s {sorted(round(s) for s in samples)}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
