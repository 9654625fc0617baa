"""Batched QKD LDPC reconciliation rounds.

The reference runs one (Alice, Bob) round per thread-pool task
(reference: src/qkd_ldpc_algorithm.cpp:1031-1258); here a whole batch of
Monte-Carlo trials is one device program:

  fixed rate  (QKD_LDPC, :1031-1119):  LLR init -> Alice syndrome -> batched
      decoder -> per-frame key match -> optional privacy-maintenance gather.
  rate adaptive (QKD_LDPC_RATE_ADAPT, :1121-1258): extend n-bit keys to the
      N-bit frame (punctured positions get per-frame random bits and
      LLR=ALMOST_ZERO; shortened get 0 and +max LLR; payload gets channel
      LLRs), then decode as fixed rate and always compact out the
      punctured+shortened (+privacy) positions.

All index vectors (payload/punctured/shortened positions, keep positions)
are static per combination — computed host-side, consumed as device gathers.
Alice -> Bob "communication" is the syndrome array passed into the decoder,
exactly as in-process as the reference keeps it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.hmatrix import HMatrix
from qkd_ldpc_v_tpu.models.layout import EdgeLayout, layout_for
from qkd_ldpc_v_tpu.ops.channel import calculate_syndrome, llr_from_bits
from qkd_ldpc_v_tpu.ops.decoders import get_decoder
from qkd_ldpc_v_tpu.privacy import keep_positions
from qkd_ldpc_v_tpu.rate_adapt import ALMOST_ZERO, HMatrixParams


class ProtocolResult(NamedTuple):
    """Batched analogue of the reference's ``LDPC_result``
    (src/qkd_ldpc_algorithm.hpp:16-26) plus the output keys."""

    syndromes_match: jax.Array  # [B] bool
    keys_match: jax.Array  # [B] bool
    iterations: jax.Array  # [B] int32
    alice_out: jax.Array  # [B, n_out] int8 (after bit removal, if any)
    bob_out: jax.Array  # [B, n_out] int8


@dataclass(frozen=True, eq=False)
class ProtocolSpec:
    """Static per-combination protocol description (eq/hash by identity —
    fields hold arrays, so value equality is neither cheap nor needed).

    ``payload_positions``/``punctured_positions``/``shortened_positions``
    are None for fixed-rate operation.
    """

    matrix: HMatrix
    algorithm: DecodingAlgorithm
    max_iterations: int
    use_threshold: bool
    privacy_maintenance: bool
    rate_adaptive: bool
    dtype: str = "float32"
    bits_to_remove: Optional[np.ndarray] = None
    payload_positions: Optional[np.ndarray] = None
    punctured_positions: Optional[np.ndarray] = None
    shortened_positions: Optional[np.ndarray] = None

    @property
    def layout(self) -> EdgeLayout:
        return layout_for(self.matrix)

    @property
    def num_frame_bits(self) -> int:
        """Frame length N seen by the decoder."""
        return self.matrix.num_bit_nodes

    @property
    def num_key_bits(self) -> int:
        """Input key length n (N minus punctured/shortened for rate adapt)."""
        if self.rate_adaptive:
            return len(self.payload_positions)
        return self.matrix.num_bit_nodes

    @property
    def keep(self) -> np.ndarray:
        remove = self.bits_to_remove
        if not self.rate_adaptive and not self.privacy_maintenance:
            remove = None
        return keep_positions(self.num_frame_bits, remove)

    @property
    def output_key_bits(self) -> int:
        return len(self.keep)


def make_protocol_spec(
    matrix: HMatrix,
    algorithm: DecodingAlgorithm,
    max_iterations: int,
    use_threshold: bool,
    privacy_maintenance: bool,
    params: Optional[HMatrixParams] = None,
    dtype: str = "float32",
) -> ProtocolSpec:
    """Build a spec for one sweep combination."""
    from qkd_ldpc_v_tpu.privacy import bits_positions_to_remove
    from qkd_ldpc_v_tpu.rate_adapt import finalize_bits_to_remove

    rate_adaptive = params is not None and not params.is_empty
    if rate_adaptive:
        if len(params.bits_to_remove) == 0:
            # The reference removes punctured+shortened (plus privacy bits)
            # unconditionally (src/qkd_ldpc_algorithm.cpp:1218-1220); derive
            # the removal set when the caller hasn't.
            finalize_bits_to_remove(matrix, params, privacy_maintenance)
        n = matrix.num_bit_nodes
        in_frame = np.zeros(n, dtype=bool)
        in_frame[params.punctured_bits] = True
        in_frame[params.shortened_bits] = True
        payload = np.flatnonzero(~in_frame).astype(np.int32)
        return ProtocolSpec(
            matrix=matrix,
            algorithm=algorithm,
            max_iterations=max_iterations,
            use_threshold=use_threshold,
            privacy_maintenance=privacy_maintenance,
            rate_adaptive=True,
            dtype=dtype,
            bits_to_remove=params.bits_to_remove,
            payload_positions=payload,
            punctured_positions=np.asarray(params.punctured_bits, np.int32),
            shortened_positions=np.asarray(params.shortened_bits, np.int32),
        )
    bits_to_remove = params.bits_to_remove if params is not None else None
    if privacy_maintenance and (bits_to_remove is None or len(bits_to_remove) == 0):
        bits_to_remove = bits_positions_to_remove(matrix)
    return ProtocolSpec(
        matrix=matrix,
        algorithm=algorithm,
        max_iterations=max_iterations,
        use_threshold=use_threshold,
        privacy_maintenance=privacy_maintenance,
        rate_adaptive=False,
        dtype=dtype,
        bits_to_remove=bits_to_remove,
    )


def _run_decode(spec, layout, llr_ext, alice_frame, primary, secondary, threshold):
    """Shared tail: Alice syndrome -> decode -> key match."""
    dtype = jnp.dtype(spec.dtype)
    syndrome_ext = calculate_syndrome(layout, alice_frame)
    decode = get_decoder(
        layout,
        spec.algorithm,
        spec.max_iterations,
        spec.use_threshold,
        dtype=dtype,
    )
    res = decode(llr_ext, syndrome_ext, primary, secondary, threshold)
    keys_match = jnp.all(res.decision == alice_frame, axis=1)
    return res, keys_match


def qkd_ldpc(
    spec: ProtocolSpec,
    alice: jax.Array,
    bob: jax.Array,
    qber,
    primary=1.0,
    secondary=1.0,
    threshold=0.0,
) -> ProtocolResult:
    """Fixed-rate round (reference: src/qkd_ldpc_algorithm.cpp:1031-1119).

    alice/bob: [B, N] int8 keys; qber: scalar (accurate QBER of the batch).
    """
    layout = spec.layout
    dtype = jnp.dtype(spec.dtype)
    llr = llr_from_bits(bob, qber, dtype)
    res, keys_match = _run_decode(
        spec, layout, llr, alice, primary, secondary, threshold
    )
    keep = jnp.asarray(spec.keep)
    alice_out = jnp.take(alice, keep, axis=1)
    bob_out = jnp.take(res.decision, keep, axis=1)
    return ProtocolResult(
        syndromes_match=res.syndromes_match,
        keys_match=keys_match,
        iterations=res.iterations,
        alice_out=alice_out,
        bob_out=bob_out,
    )


def qkd_ldpc_rate_adapt(
    spec: ProtocolSpec,
    alice_key: jax.Array,
    bob_key: jax.Array,
    qber,
    punct_key: jax.Array,
    primary=1.0,
    secondary=1.0,
    threshold=0.0,
) -> ProtocolResult:
    """Rate-adaptive round (reference: src/qkd_ldpc_algorithm.cpp:1121-1258).

    alice_key/bob_key: [B, n] payload keys; punct_key: PRNG key for the
    per-frame random punctured bits (independent on each side, as in the
    reference where both draws come from the trial PRNG, :1153-1154).
    """
    layout = spec.layout
    dtype = jnp.dtype(spec.dtype)
    batch = alice_key.shape[0]
    n_frame = spec.num_frame_bits
    payload = jnp.asarray(spec.payload_positions)
    punct = jnp.asarray(spec.punctured_positions)
    short = jnp.asarray(spec.shortened_positions)

    # Only Alice's punctured draw matters: the decoder reads the constant
    # ALMOST_ZERO LLR at punctured positions and keys are compared against
    # Alice's extended frame; the reference consumes Bob's draw solely for
    # trace printing (src/qkd_ldpc_algorithm.cpp:1153-1154, 1230-1231).
    ka, _ = jax.random.split(punct_key)
    num_punct = len(spec.punctured_positions)
    alice_punct = jax.random.bernoulli(ka, 0.5, (batch, num_punct)).astype(jnp.int8)

    zeros = jnp.zeros((batch, n_frame), jnp.int8)
    alice_ext = zeros.at[:, payload].set(alice_key).at[:, punct].set(alice_punct)
    # shortened positions stay 0 on both sides (reference: :1158-1165)

    llr = jnp.zeros((batch, n_frame), dtype)
    llr = llr.at[:, payload].set(llr_from_bits(bob_key, qber, dtype))
    llr = llr.at[:, punct].set(jnp.asarray(ALMOST_ZERO, dtype))
    llr = llr.at[:, short].set(jnp.finfo(dtype).max)

    res, keys_match = _run_decode(
        spec, layout, llr, alice_ext, primary, secondary, threshold
    )
    keep = jnp.asarray(spec.keep)  # always removes p+s (+privacy), :1218-1220
    alice_out = jnp.take(alice_ext, keep, axis=1)
    bob_out = jnp.take(res.decision, keep, axis=1)
    return ProtocolResult(
        syndromes_match=res.syndromes_match,
        keys_match=keys_match,
        iterations=res.iterations,
        alice_out=alice_out,
        bob_out=bob_out,
    )
