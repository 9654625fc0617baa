"""Probe the physically workable scoped-VMEM ceiling on this chip.

Both streaming engines request ``vmem_limit_bytes = 32 MiB`` (measured to
work on the v5e through the tunnel); if substantially more is available,
the *fused* QC kernel — zero HBM traffic mid-decode — becomes feasible for
the N=102400 flagship at a small batch tile, which would beat any
streaming design. This probe compiles and runs a trivial kernel with an
increasing VMEM scratch footprint and reports the largest size that
compiles and executes.

Usage: python scripts/probe_vmem.py [--sizes 24,32,40,48,64,80,96,112,120]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def try_size(mib: int) -> bool:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes = (mib * 1024 * 1024) // (8 * 2048 * 4)  # [8, 2048] f32 planes

    def kernel(x_ref, o_ref, scratch):
        # Touch every plane so the allocation is real, then reduce.
        scratch[0] = x_ref[:]
        for p in range(1, planes):
            scratch[p] = scratch[p - 1] + 1.0
        o_ref[:] = scratch[planes - 1]

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 2048), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((planes, 8, 2048), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(mib + 2) * 1024 * 1024,
        ),
    )
    x = jnp.zeros((8, 2048), jnp.float32)
    y = jax.block_until_ready(f(x))
    expect = float(planes - 1)
    assert float(y[0, 0]) == expect, (float(y[0, 0]), expect)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="24,32,40,48,64,80,96,112,120")
    args = ap.parse_args()
    import jax

    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind}", flush=True)
    best = 0
    for mib in [int(s) for s in args.sizes.split(",")]:
        try:
            try_size(mib)
            print(f"  {mib} MiB scratch: OK", flush=True)
            best = mib
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"  {mib} MiB scratch: FAIL ({msg})", flush=True)
            break
    print(f"max workable scratch: {best} MiB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
