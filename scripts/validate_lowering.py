"""Offline TPU-lowering validation for the Pallas engines.

`jax.export` cross-platform lowering produces the Mosaic kernel modules
without a TPU attached, so unsupported-op and shape errors surface here in
seconds instead of inside the tunnel's remote compiler minutes later. Runs
every (engine, algorithm, schedule, mode) combination the driver can pick
on representative committed codes and reports module sizes.

Usage: python scripts/validate_lowering.py  (CPU-only; no TPU needed)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from qkd_ldpc_v_tpu.config import DecodingAlgorithm, MatrixFormat  # noqa: E402
from qkd_ldpc_v_tpu.models.hmatrix import (  # noqa: E402
    read_matrix,
    read_sparse_matrix_alist,
)
from qkd_ldpc_v_tpu.models.qc import generate_qc_peg  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent
ALGS = list(DecodingAlgorithm)
MINSUM = [a for a in ALGS if a not in (
    DecodingAlgorithm.SPA, DecodingAlgorithm.SPA_APPROX)]


def check(label, fn, *args) -> bool:
    try:
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        print(f"ok   {label}  ({len(exp.mlir_module_serialized) / 1e6:.2f} MB)")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {label}: {str(e)[:200]}")
        return False


def main() -> int:
    ok = True

    # Fused QC kernel (headline 10k code) — mc + trial, both schedules.
    from qkd_ldpc_v_tpu.ops import pallas_qc as pk

    qc10k = generate_qc_peg(20, 6, 512, 4, seed=9)
    for alg in ALGS:
        scheds = ["flooding"] + (["layered"] if alg in MINSUM else [])
        for sched in scheds:
            mc = pk.make_pallas_qc_montecarlo(
                qc10k, alg, 100, False, batch=96, schedule=sched)
            ok &= check(
                f"qc/mc/{alg.name}/{sched}",
                lambda s, n, q, mc=mc: mc(s, n, q, 0.8, 0.5, 0.0),
                jnp.int32(0), jnp.int32(307), jnp.float32(0.03))

    # Streamed QC engine (committed 100k flagship) — all modes.
    from qkd_ldpc_v_tpu.ops import pallas_qc_stream as qs

    m = read_matrix(
        ROOT / "sparse_matrices/matrices_qc"
        / "(N=102400,M=30720,R=0.70,CW=3,Z=2048,SEED=56).mtrx",
        MatrixFormat.QC)
    n, mm = m.num_bit_nodes, m.num_check_nodes
    for alg in ALGS:
        scheds = ["flooding"] + (["layered"] if alg in MINSUM else [])
        for sched in scheds:
            mc = qs.make_pallas_qc_stream_montecarlo(
                m.qc, alg, 100, False, batch=64, schedule=sched)
            ok &= check(
                f"qc_stream/mc/{alg.name}/{sched}",
                lambda s, ne, q, mc=mc: mc(s, ne, q, 0.8, 0.5, 0.0),
                jnp.int32(0), jnp.int32(3072), jnp.float32(0.03))
    tr = qs.make_pallas_qc_stream_trial(m.qc, DecodingAlgorithm.NMSA,
                                        100, False)
    a8 = jnp.zeros((8, n), jnp.int8)
    ok &= check("qc_stream/trial/NMSA/flooding",
                lambda x, y, tr=tr: tr(x, y, 0.03, 0.8, 0.0, 0.0), a8, a8)
    dec = qs.make_pallas_qc_stream_decoder(m.qc, DecodingAlgorithm.AOMSA,
                                           100, False)
    ok &= check("qc_stream/decode/AOMSA/flooding",
                lambda l, s, dec=dec: dec(l, s, 0.5, 1.0, 0.0),
                jnp.ones((8, n), jnp.float32), jnp.zeros((8, mm), jnp.int8))

    # The Z=1024 CW=4 committed ladder (400 block edges — the compile-size
    # guard's far end).
    m2 = read_matrix(
        ROOT / "sparse_matrices/matrices_qc"
        / "(N=102400,M=30720,R=0.70,CW=4,Z=1024,SEED=53).mtrx",
        MatrixFormat.QC)
    mc2 = qs.make_pallas_qc_stream_montecarlo(
        m2.qc, DecodingAlgorithm.NMSA, 100, False, batch=64,
        schedule="layered")
    ok &= check("qc_stream/mc/NMSA/layered (Z=1024 CW=4)",
                lambda s, ne, q: mc2(s, ne, q, 0.8, 0.0, 0.0),
                jnp.int32(0), jnp.int32(3072), jnp.float32(0.03))

    # Generic fused kernel (reference-shape alist 10k) + streaming engine
    # (committed alist 100k) — mc / trial.
    from qkd_ldpc_v_tpu.ops import pallas_generic as pg

    alist = read_sparse_matrix_alist(
        ROOT / "sparse_matrices/matrices_alist"
        / "(N=10240,M=2841,R=0.72,CW=4,SEED=66).mtrx")
    gmc = pg.make_pallas_generic_montecarlo(
        alist, DecodingAlgorithm.NMSA, 100, False, batch=64)
    ok &= check("generic/mc/NMSA",
                lambda s, ne, q: gmc(s, ne, q, 0.7, 0.0, 0.0),
                jnp.int32(0), jnp.int32(307), jnp.float32(0.03))

    from qkd_ldpc_v_tpu.ops import pallas_stream as ps

    big = read_sparse_matrix_alist(
        ROOT / "sparse_matrices/matrices_alist"
        / "(N=102400,M=31744,R=0.69,CW=3,SEED=67).mtrx")
    st = ps.make_pallas_stream_trial(big, DecodingAlgorithm.NMSA, 100,
                                     False)
    ab = jnp.zeros((8, big.num_bit_nodes), jnp.int8)
    ok &= check("stream/trial/NMSA",
                lambda x, y: st(x, y, 0.03, 0.8, 0.0, 0.0), ab, ab)

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
