"""Streaming (HBM-resident) Pallas decoder vs the XLA decoder.

The streaming decoder serves frames whose edge state exceeds VMEM (the
reference's N=102400 suite, sparse_matrices/matrices_alist_100k_all). Tests
run small matrices with tiny ``cap_rows`` so the multi-block exchange paths
(several blocks per side, cross-block chunk staging) are exercised on CPU
interpret mode.

Exactness contract mirrors the fused generic kernel's: NMSA/OMSA/AOMSA
reproduce the XLA decoder's decisions, convergence flags, and iteration
counts; the decision bit rides the message mantissa LSB, whose 1-ulp
feedback can shift the adaptive pair's convergence by a few iterations
(documented in ops/pallas_generic.py; same +-4 tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import Config, DecodingAlgorithm, RQBERRange
from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.models.hmatrix import from_dense
from qkd_ldpc_v_tpu.models.layout import layout_for
from qkd_ldpc_v_tpu.ops.channel import calculate_syndrome
from qkd_ldpc_v_tpu.ops.decoders import make_decoder
from qkd_ldpc_v_tpu.ops.pallas_stream import (
    make_pallas_stream_decoder,
    make_pallas_stream_trial,
    stream_feasible,
)
from qkd_ldpc_v_tpu.ops.stream_plan import build_stream_plan

CAP_ROWS = 8  # tiny blocks: several blocks per side even at N=288


@pytest.fixture(scope="module")
def irregular():
    """Small irregular code: mixed column weights 2..5, mixed row weights."""
    rng = np.random.default_rng(11)
    n, m = 288, 144
    dense = np.zeros((m, n), dtype=np.int8)
    for col in range(n):
        w = 2 + (col % 4)
        rows = rng.choice(m, size=w, replace=False)
        dense[rows, col] = 1
    for row in range(m):
        if dense[row].sum() == 0:
            dense[row, rng.integers(0, n)] = 1
    return from_dense(dense)


def channel_case(matrix, batch, qber, seed):
    rng = np.random.default_rng(seed)
    n = matrix.num_bit_nodes
    alice = jnp.asarray(rng.integers(0, 2, (batch, n)), jnp.int8)
    bob = alice ^ jnp.asarray(rng.random((batch, n)) < qber, jnp.int8)
    log_p = float(np.log((1 - qber) / qber))
    llr = jnp.where(bob == 1, -log_p, log_p).astype(jnp.float32)
    syn = calculate_syndrome(layout_for(matrix), alice)
    return alice, bob, llr, syn


def test_plan_is_multiblock(irregular):
    plan = build_stream_plan(irregular, cap_rows=CAP_ROWS)
    assert plan.bits.kb >= 3 and plan.checks.kb >= 2


@pytest.mark.parametrize("algorithm,primary,secondary", [
    (DecodingAlgorithm.SPA, 1.0, 1.0),
    (DecodingAlgorithm.SPA_APPROX, 1.0, 1.0),
    (DecodingAlgorithm.NMSA, 0.8, 1.0),
    (DecodingAlgorithm.OMSA, 0.3, 1.0),
    (DecodingAlgorithm.ANMSA, 0.88, 0.5),
    (DecodingAlgorithm.AOMSA, 0.3, 0.6),
])
@pytest.mark.parametrize("use_threshold", [False, True])
def test_matches_xla_decoder(irregular, algorithm, primary, secondary,
                             use_threshold):
    alice, bob, llr, syn = channel_case(irregular, 8, 0.02, 3)
    layout = layout_for(irregular)
    thr = 6.0
    generic = jax.jit(
        make_decoder(layout, algorithm, 40, use_threshold, jnp.float32)
    )
    stream = jax.jit(
        make_pallas_stream_decoder(
            irregular, algorithm, 40, use_threshold,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
            transport="f32",
        )
    )
    rg = generic(llr, syn, primary, secondary, thr)
    rk = stream(llr, syn, primary, secondary, thr)
    conv = np.asarray(rk.syndromes_match)
    np.testing.assert_array_equal(conv, np.asarray(rg.syndromes_match))
    if not algorithm.is_adaptive:
        np.testing.assert_array_equal(
            np.asarray(rk.iterations), np.asarray(rg.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(rk.decision)[conv], np.asarray(rg.decision)[conv]
        )
    else:
        assert np.abs(
            np.asarray(rk.iterations) - np.asarray(rg.iterations)
        ).max() <= 4
        both = conv & np.asarray(rg.syndromes_match)
        same_it = both & (
            np.asarray(rk.iterations) == np.asarray(rg.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(rk.decision)[same_it], np.asarray(rg.decision)[same_it]
        )


def test_unconverged_frames_hit_cap(irregular):
    alice, bob, llr, syn = channel_case(irregular, 8, 0.09, 37)
    layout = layout_for(irregular)
    generic = jax.jit(
        make_decoder(layout, DecodingAlgorithm.NMSA, 6, False, jnp.float32)
    )
    stream = jax.jit(
        make_pallas_stream_decoder(
            irregular, DecodingAlgorithm.NMSA, 6, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
            transport="f32",
        )
    )
    rg = generic(llr, syn, 0.8, 1.0, 0.0)
    rk = stream(llr, syn, 0.8, 1.0, 0.0)
    np.testing.assert_array_equal(
        np.asarray(rk.syndromes_match), np.asarray(rg.syndromes_match)
    )
    np.testing.assert_array_equal(
        np.asarray(rk.iterations), np.asarray(rg.iterations)
    )
    # Unconverged frames too: the non-adaptive loop must report the
    # decisions of iteration ``cap`` exactly (it skips the extra bit pass
    # at cap+1 — the round-2 advisor finding), so the whole decision
    # matrix equals the XLA decoder's, converged or not.
    assert not np.asarray(rg.syndromes_match).all()
    np.testing.assert_array_equal(
        np.asarray(rk.decision), np.asarray(rg.decision)
    )


def test_trial_kernel_matches_decode(irregular):
    alice, bob, llr, syn = channel_case(irregular, 8, 0.02, 43)
    dec = jax.jit(
        make_pallas_stream_decoder(
            irregular, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
            transport="f32",
        )
    )
    trial = jax.jit(
        make_pallas_stream_trial(
            irregular, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
            transport="f32",
        )
    )
    rd = dec(llr, syn, 0.8, 1.0, 0.0)
    conv, keys, iters = trial(alice, bob, 0.02, 0.8, 1.0, 0.0)
    np.testing.assert_array_equal(
        np.asarray(conv), np.asarray(rd.syndromes_match)
    )
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(rd.iterations))
    expect_keys = np.all(
        np.asarray(rd.decision) == np.asarray(alice), axis=1
    ) & np.asarray(conv)
    np.testing.assert_array_equal(
        np.asarray(keys)[np.asarray(conv)], expect_keys[np.asarray(conv)]
    )


def test_batch_padding(irregular):
    """Batch not divisible by the tile: padding frames must not leak."""
    alice, bob, llr, syn = channel_case(irregular, 5, 0.02, 41)
    dec = jax.jit(
        make_pallas_stream_decoder(
            irregular, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
            transport="f32",
        )
    )
    r = dec(llr, syn, 0.8, 1.0, 0.0)
    assert r.decision.shape == (5, irregular.num_bit_nodes)
    assert np.asarray(r.syndromes_match).all()


def test_multi_tile_code_matches():
    """Permute spaces spanning several 128x128 tiles exercise the B-select
    and cross-tile stages of the per-block plans."""
    matrix = generate_regular_ldpc(
        num_bits=1024, num_checks=512, column_weight=4, seed=21
    )
    layout = layout_for(matrix)
    alice, bob, llr, syn = channel_case(matrix, 8, 0.02, 47)
    generic = jax.jit(
        make_decoder(layout, DecodingAlgorithm.NMSA, 15, False, jnp.float32)
    )
    stream = jax.jit(
        make_pallas_stream_decoder(
            matrix, DecodingAlgorithm.NMSA, 15, False,
            batch_tile=4, interpret=True, cap_rows=64,
            transport="f32",
        )
    )
    rg = generic(llr, syn, 0.8, 1.0, 0.0)
    rk = stream(llr, syn, 0.8, 1.0, 0.0)
    conv = np.asarray(rk.syndromes_match)
    np.testing.assert_array_equal(conv, np.asarray(rg.syndromes_match))
    np.testing.assert_array_equal(
        np.asarray(rk.iterations), np.asarray(rg.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(rk.decision)[conv], np.asarray(rg.decision)[conv]
    )


@pytest.mark.parametrize("algorithm,primary,secondary", [
    (DecodingAlgorithm.NMSA, 0.8, 1.0),
    (DecodingAlgorithm.AOMSA, 0.3, 0.6),
])
def test_bf16x2_transport_decodes(irregular, algorithm, primary, secondary):
    """Packed transport (two frames per f32 word through the exchange, the
    production default) must decode correctly: on this easy operating point
    every frame converges to Alice's key, and iteration counts stay within
    a small window of the f32-transport path (messages are bf16-rounded in
    flight — same contract as the generic kernel's bf16x2)."""
    alice, bob, llr, syn = channel_case(irregular, 8, 0.02, 23)
    exact = jax.jit(
        make_pallas_stream_decoder(
            irregular, algorithm, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
            transport="f32",
        )
    )
    fast = jax.jit(
        make_pallas_stream_decoder(
            irregular, algorithm, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
            transport="bf16x2",
        )
    )
    re_ = exact(llr, syn, primary, secondary, 0.0)
    rf = fast(llr, syn, primary, secondary, 0.0)
    assert np.asarray(rf.syndromes_match).all()
    np.testing.assert_array_equal(np.asarray(rf.decision), np.asarray(alice))
    assert np.abs(
        np.asarray(rf.iterations) - np.asarray(re_.iterations)
    ).max() <= 4


def test_bf16x2_trial_matches_decode(irregular):
    alice, bob, llr, syn = channel_case(irregular, 8, 0.02, 29)
    dec = jax.jit(
        make_pallas_stream_decoder(
            irregular, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
        )
    )
    trial = jax.jit(
        make_pallas_stream_trial(
            irregular, DecodingAlgorithm.NMSA, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
        )
    )
    rd = dec(llr, syn, 0.8, 1.0, 0.0)
    conv, keys, iters = trial(alice, bob, 0.02, 0.8, 1.0, 0.0)
    np.testing.assert_array_equal(
        np.asarray(conv), np.asarray(rd.syndromes_match)
    )
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(rd.iterations))
    expect_keys = np.all(
        np.asarray(rd.decision) == np.asarray(alice), axis=1
    ) & np.asarray(conv)
    np.testing.assert_array_equal(
        np.asarray(keys)[np.asarray(conv)], expect_keys[np.asarray(conv)]
    )


def test_spa_trial_matches_decode(irregular):
    """SPA's decisions ride a separate staged exchange; the trial kernel
    must still agree with the decode kernel frame for frame."""
    alice, bob, llr, syn = channel_case(irregular, 8, 0.02, 53)
    dec = jax.jit(
        make_pallas_stream_decoder(
            irregular, DecodingAlgorithm.SPA, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
        )
    )
    trial = jax.jit(
        make_pallas_stream_trial(
            irregular, DecodingAlgorithm.SPA, 30, False,
            batch_tile=4, interpret=True, cap_rows=CAP_ROWS,
        )
    )
    rd = dec(llr, syn, 1.0, 1.0, 0.0)
    conv, keys, iters = trial(alice, bob, 0.02, 1.0, 1.0, 0.0)
    np.testing.assert_array_equal(
        np.asarray(conv), np.asarray(rd.syndromes_match)
    )
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(rd.iterations))


def test_feasibility_gate(irregular):
    # Small codes gain nothing from streaming.
    assert not stream_feasible(irregular)


def test_driver_rate_adaptive_stream(monkeypatch, irregular):
    """Rate adaptation under the streaming engine: frames are built in XLA
    and decoded through the streaming library decoder (decode_tail); on f32
    transport the NMSA statistics must equal the XLA path's exactly."""
    from qkd_ldpc_v_tpu import rate_adapt as ra
    from qkd_ldpc_v_tpu import simulation
    from qkd_ldpc_v_tpu.ops import pallas_generic, pallas_stream

    monkeypatch.setattr(
        pallas_generic, "generic_plan_feasible", lambda m: False
    )
    monkeypatch.setattr(pallas_stream, "stream_feasible", lambda m: True)
    orig = pallas_stream.make_pallas_stream_decoder
    called = []
    monkeypatch.setattr(
        pallas_stream, "make_pallas_stream_decoder",
        lambda *a, **k: called.append(1) or orig(
            *a, cap_rows=CAP_ROWS, transport="f32", **k
        ),
    )

    rng = np.random.default_rng(7)
    params = ra.adapt_code_rate(
        rng, irregular, qber=0.05, delta=0.15, efficiency=1.2
    )

    def cfg(use_pallas):
        return Config(
            trials_number=8,
            simulation_seed=5,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=30,
            enable_code_rate_adaptation=True,
            r_qber_ranges=(RQBERRange(0.99, 0.05, 0.05, 0.01),),
            batch_size=8,
            use_pallas=use_pallas,
        )

    comb = simulation.SimCombination(
        0.05, params, simulation.ScalingFactors(primary=0.8)
    )
    r_stream = simulation.run_combination(
        irregular, comb, cfg(True), sim_number=0
    )
    assert called, "streaming decoder was not selected"
    r_xla = simulation.run_combination(
        irregular, comb, cfg(False), sim_number=0
    )
    assert r_stream.ratio_trials_success_ldpc == r_xla.ratio_trials_success_ldpc
    assert r_stream.iter_success_mean == r_xla.iter_success_mean


def test_mesh_factory_selects_stream(monkeypatch, irregular):
    """The data-mesh step factory builds through the same _build_step, so
    the streaming engine must work sharded: mesh results == single-device
    results on identical chunk PRNG keys (f32 transport is exact)."""
    from qkd_ldpc_v_tpu import simulation
    from qkd_ldpc_v_tpu.ops import pallas_generic, pallas_stream
    from qkd_ldpc_v_tpu.parallel import make_data_mesh, mesh_step_factory
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams

    monkeypatch.setattr(
        pallas_generic, "generic_plan_feasible", lambda m: False
    )
    monkeypatch.setattr(pallas_stream, "stream_feasible", lambda m: True)
    orig = pallas_stream.make_pallas_stream_trial
    called = []
    monkeypatch.setattr(
        pallas_stream, "make_pallas_stream_trial",
        lambda *a, **k: called.append(1) or orig(
            *a, cap_rows=CAP_ROWS, transport="f32", **k
        ),
    )

    cfg = Config(
        trials_number=16,
        simulation_seed=5,
        decoding_algorithm=DecodingAlgorithm.NMSA,
        decoding_alg_max_iterations=30,
        r_qber_ranges=(RQBERRange(0.99, 0.05, 0.05, 0.01),),
        batch_size=16,
        use_pallas=True,
    )
    comb = simulation.SimCombination(
        0.05, HMatrixParams(), simulation.ScalingFactors(primary=0.8)
    )
    mesh = make_data_mesh()
    r_mesh = simulation.run_combination(
        irregular, comb, cfg, sim_number=0,
        step_factory=mesh_step_factory(mesh),
    )
    assert called, "mesh factory did not select the streaming kernel"
    r_single = simulation.run_combination(
        irregular, comb, cfg, sim_number=0
    )
    assert (
        r_mesh.ratio_trials_success_ldpc == r_single.ratio_trials_success_ldpc
    )
    assert r_mesh.iter_success_mean == r_single.iter_success_mean


def test_driver_stream_two_phase(monkeypatch, irregular):
    """Explicit tpu.phase1_iterations under the streaming engine: phase-1
    clip + straggler re-decode must reproduce the single-phase results
    exactly (BP from the same init is deterministic)."""
    from qkd_ldpc_v_tpu import simulation
    from qkd_ldpc_v_tpu.ops import pallas_generic, pallas_stream
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams

    monkeypatch.setattr(
        pallas_generic, "generic_plan_feasible", lambda m: False
    )
    monkeypatch.setattr(pallas_stream, "stream_feasible", lambda m: True)
    orig = pallas_stream.make_pallas_stream_trial
    monkeypatch.setattr(
        pallas_stream, "make_pallas_stream_trial",
        lambda *a, **k: orig(*a, cap_rows=CAP_ROWS, transport="f32", **k),
    )

    def cfg(phase1):
        return Config(
            trials_number=16,
            simulation_seed=5,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=30,
            r_qber_ranges=(RQBERRange(0.99, 0.05, 0.05, 0.01),),
            batch_size=16,
            use_pallas=True,
            phase1_iterations=phase1,
        )

    comb = simulation.SimCombination(
        0.05, HMatrixParams(), simulation.ScalingFactors(primary=0.8)
    )
    r1 = simulation.run_combination(irregular, comb, cfg(0), sim_number=0)
    r2 = simulation.run_combination(irregular, comb, cfg(3), sim_number=0)
    assert r1.ratio_trials_success_ldpc == r2.ratio_trials_success_ldpc
    assert r1.iter_success_mean == r2.iter_success_mean
    assert r1.iter_success_max == r2.iter_success_max


def test_driver_selects_stream(monkeypatch, irregular):
    """With the generic kernel gated out, the driver's use_pallas path picks
    the streaming trial kernel; on identical host-generated keys it must
    reproduce the XLA path's statistics exactly (NMSA is bit-exact)."""
    from qkd_ldpc_v_tpu import simulation
    from qkd_ldpc_v_tpu.ops import pallas_generic, pallas_stream
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams

    monkeypatch.setattr(
        pallas_generic, "generic_plan_feasible", lambda m: False
    )
    monkeypatch.setattr(pallas_stream, "stream_feasible", lambda m: True)
    orig = pallas_stream.make_pallas_stream_trial
    called = []
    monkeypatch.setattr(
        pallas_stream, "make_pallas_stream_trial",
        lambda *a, **k: called.append(1) or orig(
            *a, cap_rows=CAP_ROWS, transport="f32", **k
        ),
    )

    def cfg(use_pallas):
        return Config(
            trials_number=8,
            simulation_seed=5,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=30,
            r_qber_ranges=(RQBERRange(0.99, 0.02, 0.02, 0.01),),
            batch_size=8,
            use_pallas=use_pallas,
        )

    comb = simulation.SimCombination(
        0.02, HMatrixParams(), simulation.ScalingFactors(primary=0.8)
    )
    r_stream = simulation.run_combination(
        irregular, comb, cfg(True), sim_number=0
    )
    assert called, "streaming trial kernel was not selected"
    r_xla = simulation.run_combination(
        irregular, comb, cfg(False), sim_number=0
    )
    assert r_stream.ratio_trials_success_ldpc == r_xla.ratio_trials_success_ldpc
    assert r_stream.iter_success_mean == r_xla.iter_success_mean
