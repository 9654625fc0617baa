"""Tracing subsystem tests: trace capture, console dumps, traced driver."""

import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import Config, DecodingAlgorithm, RQBERRange
from qkd_ldpc_v_tpu.oracle import TraceIteration, calculate_syndrome, decode_oracle
from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams
from qkd_ldpc_v_tpu.simulation import (
    ScalingFactors,
    SimCombination,
    run_combination,
)
from qkd_ldpc_v_tpu.tracing import traced_decode, traced_protocol_round


def _cfg(**kw):
    defaults = dict(
        trials_number=4,
        simulation_seed=11,
        decoding_algorithm=DecodingAlgorithm.SPA,
        decoding_alg_max_iterations=30,
        r_qber_ranges=(RQBERRange(0.99, 0.03, 0.03, 0.01),),
    )
    defaults.update(kw)
    return Config(**defaults)


def test_oracle_trace_records(johnson_matrix):
    rng = np.random.default_rng(0)
    alice = rng.integers(0, 2, 6)
    bob = alice.copy()
    bob[2] ^= 1
    log_p = np.log(0.8 / 0.2)
    llr = np.where(bob == 1, -log_p, log_p).astype(np.float64)
    syndrome = calculate_syndrome(johnson_matrix.check_nodes, alice)
    trace = []
    decision, ok, iters = decode_oracle(
        johnson_matrix, llr, syndrome, 0, 30, trace=trace
    )
    assert len(trace) == iters
    last = trace[-1]
    assert isinstance(last, TraceIteration)
    np.testing.assert_array_equal(last.decision, decision)
    if ok:
        np.testing.assert_array_equal(last.decision_syndrome, syndrome)
    assert last.max_abs_total_llr > 0


def test_traced_decode_emits(johnson_matrix, capsys):
    cfg = _cfg(trace_decoding_alg=True, trace_decoding_alg_llr=True)
    alice = np.array([1, 0, 1, 0, 1, 0])
    bob = alice.copy()
    bob[1] ^= 1
    log_p = np.log(0.9 / 0.1)
    llr = np.where(bob == 1, -log_p, log_p).astype(np.float64)
    syndrome = calculate_syndrome(johnson_matrix.check_nodes, alice)
    decision, ok, iters, trace = traced_decode(johnson_matrix, llr, syndrome, cfg)
    out = capsys.readouterr().out
    assert "iteration 1" in out
    assert "L (total LLRs)" in out
    assert "max|msg LLR|" in out
    assert len(trace) == iters


def test_traced_protocol_round(johnson_matrix, capsys):
    cfg = _cfg(trace_qkd_ldpc=True)
    alice = np.array([0, 0, 1, 0, 1, 1])
    bob = alice.copy()
    bob[4] ^= 1
    decision, ok, keys_match, iters = traced_protocol_round(
        johnson_matrix, alice, bob, 1 / 6, cfg
    )
    out = capsys.readouterr().out
    assert "Alice bit array" in out
    assert "Syndromes matched" in out
    if ok:
        assert keys_match == bool(np.array_equal(decision, alice))


def test_traced_driver_matches_untraced_f64(medium_matrix, capsys):
    """The traced (oracle) driver path and the device f64 path must agree on
    every statistic — they implement the same math."""
    comb = SimCombination(0.02, HMatrixParams(), ScalingFactors())
    traced = run_combination(
        medium_matrix, comb,
        _cfg(trials_number=8, trace_qkd_ldpc=True, dtype="float64"),
        sim_number=0,
    )
    capsys.readouterr()  # swallow dumps
    untraced = run_combination(
        medium_matrix, comb,
        _cfg(trials_number=8, dtype="float64"),
        sim_number=0,
    )
    assert traced.ratio_trials_success_decoding == untraced.ratio_trials_success_decoding
    assert traced.ratio_trials_success_ldpc == untraced.ratio_trials_success_ldpc
    assert traced.iter_success_mean == untraced.iter_success_mean
    assert traced.iter_success_min == untraced.iter_success_min
    assert traced.iter_success_max == untraced.iter_success_max


def test_traced_rate_adapt_matches_device_f64(matrix_file=None):
    """Traced (oracle) rate-adaptive trials equal the device f64 path —
    extends the PRNG-parity check through frame extension."""
    import numpy as np

    from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
    import qkd_ldpc_v_tpu.rate_adapt as ra

    matrix = generate_regular_ldpc(256, 128, 3, seed=13)
    rng = np.random.default_rng(2)
    params = ra.adapt_code_rate(rng, matrix, qber=0.08, delta=0.2, efficiency=1.3)
    assert not params.is_empty
    ra.finalize_bits_to_remove(matrix, params, False)

    base = dict(
        trials_number=8,
        simulation_seed=6,
        decoding_algorithm=DecodingAlgorithm.SPA,
        decoding_alg_max_iterations=40,
        enable_code_rate_adaptation=True,
        r_qber_ranges=(RQBERRange(0.99, 0.08, 0.08, 0.01),),
        dtype="float64",
    )
    comb = SimCombination(0.08, params, ScalingFactors())
    traced = run_combination(
        matrix, comb, Config(**base, trace_qkd_ldpc=True), sim_number=0
    )
    device = run_combination(matrix, comb, Config(**base), sim_number=0)
    assert traced.ratio_trials_success_decoding == device.ratio_trials_success_decoding
    assert traced.ratio_trials_success_ldpc == device.ratio_trials_success_ldpc
    assert traced.iter_success_mean == device.iter_success_mean
