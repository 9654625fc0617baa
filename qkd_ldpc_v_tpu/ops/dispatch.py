"""Single-dispatch plumbing for kernel entry points.

The fused kernels' wrappers take a handful of host scalars (seed,
num_errors, qber, scaling factors, threshold) per call. Inside the sweep
driver these wrappers run under the driver's ``jax.jit`` and the scalars
are tracers — materializing them with ``jnp.full`` is free. Called
standalone (library users, probe scripts, parity harnesses), each
``jnp.full`` is its own device round trip; through a remote-TPU transport
(this box's ``axon`` tunnel) six of those cost ~0.8 s per call — an order
of magnitude more than the decode itself. These helpers bundle every
scalar into ONE int32 host vector (floats bitcast to int32 lanes) and run
the whole wrapper body as ONE jitted program: one upload, one execute,
regardless of transport latency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_traced(*vals) -> bool:
    """True when any value is a JAX tracer (i.e. the caller is already
    inside a jit/vmap trace and host bundling is impossible and needless)."""
    return any(isinstance(v, jax.core.Tracer) for v in vals)


def scalar_bundle(ints, floats) -> np.ndarray:
    """Pack int and float host scalars into one int32 vector (floats are
    bitcast — exact round trip through unbundle)."""
    iv = np.asarray(list(ints), dtype=np.int32)
    if not floats:
        return iv
    fv = np.asarray(list(floats), dtype=np.float32).view(np.int32)
    return np.concatenate([iv, fv])


def unbundle(vec: jax.Array, n_ints: int, n_floats: int):
    """Split a bundled vector back into [1, 1]-shaped device scalars
    (the shape the kernels' SMEM block specs expect)."""
    ints = [vec[i : i + 1].reshape(1, 1) for i in range(n_ints)]
    if not n_floats:
        return ints, []
    fl = jax.lax.bitcast_convert_type(
        vec[n_ints : n_ints + n_floats], jnp.float32
    )
    floats = [fl[i : i + 1].reshape(1, 1) for i in range(n_floats)]
    return ints, floats
