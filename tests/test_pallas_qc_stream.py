"""Streamed QC engine (ops/pallas_qc_stream.py) correctness.

Parity bar mirrors the fused QC kernel's (tests/test_pallas_qc.py): exact
equality with the XLA float32 decoder for the non-adaptive algorithms and
SPA pair; converged-behavior equality for the adaptive pair (whose
per-check factor amplifies f32 accumulation-order ulps mid-decode — the
same documented property the fused kernel has). The layered schedule must
be bit-identical to the fused layered kernel (same arithmetic, same NumPy
oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.layout import layout_for
from qkd_ldpc_v_tpu.models.qc import QCMatrix, generate_qc_peg
from qkd_ldpc_v_tpu.ops import pallas_qc as pk
from qkd_ldpc_v_tpu.ops import pallas_qc_stream as qs
from qkd_ldpc_v_tpu.ops.channel import syndrome_internal
from qkd_ldpc_v_tpu.ops.decoders import get_decoder


@pytest.fixture(scope="module")
def qc():
    return generate_qc_peg(8, 4, 128, column_weight=3, seed=7)


@pytest.fixture(scope="module")
def channel(qc):
    matrix = qc.to_hmatrix()
    layout = layout_for(matrix)
    n = matrix.num_bit_nodes
    rng = np.random.default_rng(3)
    b = 11
    alice = rng.integers(0, 2, (b, n)).astype(np.int8)
    bob = alice.copy()
    for i in range(b):
        errs = rng.choice(n, size=30, replace=False)
        bob[i, errs] ^= 1
    qber = 30 / n
    log_p = np.log((1 - qber) / qber)
    llr = np.where(bob == 1, -log_p, log_p).astype(np.float32)
    bit_order = np.asarray(layout.bit_order)
    syn_int = np.asarray(
        syndrome_internal(layout, jnp.asarray(alice[:, bit_order]))
    )
    syn_ext = syn_int[:, np.asarray(layout.check_inv)]
    return dict(
        matrix=matrix, layout=layout, alice=alice, bob=bob, qber=qber,
        llr=llr, syn=syn_ext,
    )


@pytest.mark.parametrize("algorithm,primary,secondary", [
    (DecodingAlgorithm.SPA, 1.0, 1.0),
    (DecodingAlgorithm.SPA_APPROX, 1.0, 1.0),
    (DecodingAlgorithm.NMSA, 0.8, 0.0),
    (DecodingAlgorithm.OMSA, 0.3, 0.0),
])
def test_decode_exact_vs_xla(qc, channel, algorithm, primary, secondary):
    """Flooding decode is bit-exact vs the XLA f32 decoder: decisions
    (converged and unconverged), convergence flags, iteration counts."""
    ref = get_decoder(
        channel["layout"], algorithm, 30, False, dtype=jnp.float32,
        jit=False,
    )
    rres = ref(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        primary, secondary, 0.0,
    )
    dec = qs.make_pallas_qc_stream_decoder(
        qc, algorithm, 30, False, interpret=True
    )
    sres = dec(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        primary, secondary, 0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(rres.syndromes_match), np.asarray(sres.syndromes_match)
    )
    np.testing.assert_array_equal(
        np.asarray(rres.iterations), np.asarray(sres.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(rres.decision), np.asarray(sres.decision)
    )


def test_decode_exact_with_threshold(qc, channel):
    """The message clamp stays at the reference program points (the clamp
    commutes with the roll — see the module doc)."""
    ref = get_decoder(
        channel["layout"], DecodingAlgorithm.NMSA, 30, True,
        dtype=jnp.float32, jit=False,
    )
    rres = ref(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        0.8, 0.0, 15.0,
    )
    dec = qs.make_pallas_qc_stream_decoder(
        qc, DecodingAlgorithm.NMSA, 30, True, interpret=True
    )
    sres = dec(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        0.8, 0.0, 15.0,
    )
    np.testing.assert_array_equal(
        np.asarray(rres.iterations), np.asarray(sres.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(rres.decision), np.asarray(sres.decision)
    )


@pytest.mark.parametrize("algorithm,primary,secondary", [
    (DecodingAlgorithm.ANMSA, 0.8, 0.5),
    (DecodingAlgorithm.AOMSA, 0.3, 0.6),
])
def test_decode_adaptive_converged_equal(qc, channel, algorithm, primary,
                                         secondary):
    """Adaptive pair: converged frames must agree with the XLA decoder on
    convergence and decisions (iteration counts may differ by f32
    accumulation-order feedback through the factor — same tolerance class
    as the fused kernel's)."""
    ref = get_decoder(
        channel["layout"], algorithm, 30, False, dtype=jnp.float32,
        jit=False,
    )
    rres = ref(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        primary, secondary, 0.0,
    )
    dec = qs.make_pallas_qc_stream_decoder(
        qc, algorithm, 30, False, interpret=True
    )
    sres = dec(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        primary, secondary, 0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(rres.syndromes_match), np.asarray(sres.syndromes_match)
    )
    conv = np.asarray(rres.syndromes_match)
    np.testing.assert_array_equal(
        np.asarray(rres.decision)[conv], np.asarray(sres.decision)[conv]
    )
    assert np.abs(
        np.asarray(rres.iterations) - np.asarray(sres.iterations)
    ).max() <= 3


@pytest.mark.parametrize("algorithm,primary,secondary", [
    (DecodingAlgorithm.NMSA, 0.8, 0.0),
    (DecodingAlgorithm.OMSA, 0.3, 0.0),
    (DecodingAlgorithm.ANMSA, 0.88, 0.5),
    (DecodingAlgorithm.AOMSA, 0.3, 0.6),
])
def test_layered_matches_fused(qc, channel, algorithm, primary, secondary):
    """The layered schedule is the fused layered kernel's arithmetic row
    for row — bit-identical results, adaptive pair included (both engines
    implement the same NumPy oracle,
    tests/test_pallas_qc.py::_layered_oracle)."""
    fd = pk.make_pallas_qc_decoder(
        qc, algorithm, 30, False, interpret=True, schedule="layered"
    )
    fres = fd(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        primary, secondary, 0.0,
    )
    sd = qs.make_pallas_qc_stream_decoder(
        qc, algorithm, 30, False, interpret=True, schedule="layered"
    )
    sres = sd(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        primary, secondary, 0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(fres.syndromes_match), np.asarray(sres.syndromes_match)
    )
    np.testing.assert_array_equal(
        np.asarray(fres.iterations), np.asarray(sres.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(fres.decision), np.asarray(sres.decision)
    )


@pytest.mark.parametrize("schedule", ["flooding", "layered"])
def test_trial_matches_fused(qc, channel, schedule):
    """Trial mode (raw keys in, statistics out) agrees with the fused
    trial kernel."""
    alg = DecodingAlgorithm.NMSA
    ft = pk.make_pallas_qc_trial(
        qc, alg, 30, False, interpret=True, schedule=schedule
    )
    st = qs.make_pallas_qc_stream_trial(
        qc, alg, 30, False, interpret=True, schedule=schedule
    )
    args = (
        jnp.asarray(channel["alice"]), jnp.asarray(channel["bob"]),
        channel["qber"], 0.8, 0.0, 0.0,
    )
    for f, s in zip(ft(*args), st(*args)):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(s))


def test_batch_padding(qc, channel):
    """Batches that don't divide the tile pad internally; padding frames
    never leak into results."""
    alg = DecodingAlgorithm.NMSA
    dec = qs.make_pallas_qc_stream_decoder(qc, alg, 30, False,
                                           interpret=True)
    full = dec(
        jnp.asarray(channel["llr"]), jnp.asarray(channel["syn"]),
        0.8, 0.0, 0.0,
    )
    part = dec(
        jnp.asarray(channel["llr"][:5]), jnp.asarray(channel["syn"][:5]),
        0.8, 0.0, 0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(full.decision)[:5], np.asarray(part.decision)
    )
    np.testing.assert_array_equal(
        np.asarray(full.iterations)[:5], np.asarray(part.iterations)
    )


def test_layered_rejects_spa(qc):
    with pytest.raises(ValueError, match="min-sum"):
        qs.make_pallas_qc_stream_decoder(
            qc, DecodingAlgorithm.SPA, 10, False, interpret=True,
            schedule="layered",
        )


def test_feasibility_gate():
    """The streamed engine takes over exactly where the fused kernel's
    VMEM gate gives up, and itself refuses codes beyond its compile-size
    or VMEM budgets. Round 4 moved the handover point: the measured
    100 MiB VMEM budget (scripts/probe_vmem.py) fits the fused kernel's
    full message state for every committed frame size, so the streamed
    tier now starts past N ~ 400k-equivalent live sets."""
    rng = np.random.default_rng(0)

    def fake_qc(nb, mb, z, cw):
        shifts = np.full((mb, nb), -1, np.int64)
        for c in range(nb):
            rows = rng.choice(mb, size=cw, replace=False)
            shifts[rows, c] = rng.integers(0, z, cw)
        return QCMatrix(shifts=shifts, lifting=z)

    # The committed 100k shape: fused kernel feasible, but its 930-plane
    # set lands at tile 16, not 24 — the round-5 hardware measurement
    # showed 91.4 MiB of declared planes OOMs Mosaic's VMEM allocator
    # while 83.5 MiB runs, so the budget holds declared planes <= 84 MiB
    # (BASELINE.md §fused-100k). The streamed engine stays feasible.
    big = fake_qc(100, 30, 1024, 4)
    assert pk.feasible_batch_tile(big) == 16
    assert qs.qc_stream_feasible(big)
    # Wider-Z variant of the 100k ladder (fewer, larger planes): 415
    # planes keep tile 24 (83.5 MiB — the measured-working flagship set).
    assert pk.feasible_batch_tile(fake_qc(50, 15, 2048, 3)) == 24
    assert qs.qc_stream_feasible(fake_qc(50, 15, 2048, 3))
    # N=409600-class code: per-edge message planes overflow the fused
    # budget at every tile; the streamed engine's resident totals fit.
    huge = fake_qc(100, 30, 4096, 4)
    assert pk.feasible_batch_tile(huge) == 0
    assert qs.qc_stream_feasible(huge)
    # Non-lane-multiple lifting: no Pallas QC engine at all.
    assert not qs.qc_stream_feasible(fake_qc(8, 4, 100, 3))
    # Beyond the compile-size guard (block-edge unroll): both engines out.
    assert pk.feasible_batch_tile(fake_qc(200, 60, 512, 4)) == 0
    assert not qs.qc_stream_feasible(fake_qc(200, 60, 512, 4))
    # An all-absent base row: no check update to stream — gated out (and
    # the builder raises rather than crashing mid-trace).
    empty_row = fake_qc(8, 4, 128, 3)
    empty_row.shifts[2, :] = -1
    assert not qs.qc_stream_feasible(empty_row)
    with pytest.raises(ValueError, match="non-empty"):
        qs.make_pallas_qc_stream_decoder(
            empty_row, DecodingAlgorithm.NMSA, 10, False, interpret=True
        )


def test_engine_selection_prefers_qc_stream():
    """pallas_engine routes fused-VMEM-infeasible QC codes to the streamed
    QC engine (not the structure-blind generic/stream paths). Post round 4
    that tier starts where the per-edge message planes overflow the fused
    budget — an N=409600 shape here."""
    from qkd_ldpc_v_tpu.config import Config
    from qkd_ldpc_v_tpu.models.hmatrix import HMatrix
    from qkd_ldpc_v_tpu.simulation import pallas_engine

    rng = np.random.default_rng(1)
    nb, mb, z, cw = 100, 30, 4096, 4
    shifts = np.full((mb, nb), -1, np.int64)
    for c in range(nb):
        rows = rng.choice(mb, size=cw, replace=False)
        shifts[rows, c] = rng.integers(0, z, cw)
    qcm = QCMatrix(shifts=shifts, lifting=z)
    assert pk.feasible_batch_tile(qcm) == 0
    # A skeleton HMatrix is enough for the gate (the gates consult only
    # matrix.qc for QC codes).
    matrix = HMatrix.__new__(HMatrix)
    matrix.qc = qcm
    cfg = Config(use_pallas=True)
    assert pallas_engine(matrix, cfg) == "qc_stream"


def test_committed_100k_assets_engine_routing():
    """Round-5 measured routing for the committed N=102400 QC assets
    (BASELINE.md §fused-100k / §tile-sweep): both route to the fused
    kernel under both schedules, with a schedule-aware batch tile. The
    layered sweep is VMEM-pressure bound — the flagship measured 28.1k
    f/s at tile 8 vs 8.3k at tile 24 — so layered takes the small-tile
    branch; flooding keeps the largest measured-best tile (24 for the
    flagship's 415 planes = 83.5 MiB; the Z=1024 CW=4 asset's 930 planes
    take 16, because 91.4 MiB at tile 24 OOMs Mosaic on hardware). The
    streamed engine stays feasible as the next capacity tier and remains
    reachable via tpu.force_engine."""
    from pathlib import Path

    from qkd_ldpc_v_tpu.config import Config, MatrixFormat
    from qkd_ldpc_v_tpu.models.hmatrix import read_matrix
    from qkd_ldpc_v_tpu.simulation import pallas_engine

    root = Path(__file__).resolve().parent.parent
    for name, num_be, tile_flood in (
        ("(N=102400,M=30720,R=0.70,CW=3,Z=2048,SEED=56).mtrx", 150, 24),
        ("(N=102400,M=30720,R=0.70,CW=4,Z=1024,SEED=53).mtrx", 400, 16),
    ):
        matrix = read_matrix(
            root / "sparse_matrices" / "matrices_qc" / name, MatrixFormat.QC
        )
        assert int((matrix.qc.shifts >= 0).sum()) == num_be
        assert pk.feasible_batch_tile(matrix.qc) == tile_flood
        assert pk.feasible_batch_tile(matrix.qc, schedule="layered") == 8
        assert qs.qc_stream_feasible(matrix.qc)
        assert pallas_engine(matrix, Config(use_pallas=True)) == "qc"
        assert pallas_engine(
            matrix, Config(use_pallas=True, schedule="layered",
                           decoding_algorithm=DecodingAlgorithm.NMSA)
        ) == "qc"
        assert pallas_engine(
            matrix, Config(use_pallas=True, force_engine="qc_stream")
        ) == "qc_stream"


def test_driver_end_to_end_matches_fused(qc, monkeypatch):
    """Force the fused kernel's gate shut: the driver must route through
    the streamed QC engine and produce identical sweep statistics."""
    from qkd_ldpc_v_tpu import simulation as sim
    from qkd_ldpc_v_tpu.config import Config
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams

    matrix = qc.to_hmatrix()
    cfg = Config(
        trials_number=16,
        simulation_seed=5,
        decoding_algorithm=DecodingAlgorithm.NMSA,
        decoding_alg_max_iterations=50,
        batch_size=16,
        use_pallas=True,
    )
    comb = sim.SimCombination(
        0.02, HMatrixParams(), sim.ScalingFactors(primary=0.8)
    )

    assert sim.pallas_engine(matrix, cfg) == "qc"
    ref = sim.run_combination(matrix, comb, cfg, sim_number=0)

    import qkd_ldpc_v_tpu.ops.pallas_qc as _pk
    monkeypatch.setattr(sim, "_STEP_CACHE", type(sim._STEP_CACHE)())
    monkeypatch.setattr(_pk, "feasible_batch_tile", lambda *_a, **_k: 0)
    assert sim.pallas_engine(matrix, cfg) == "qc_stream"
    got = sim.run_combination(matrix, comb, cfg, sim_number=0)

    assert got.ratio_trials_success_decoding == ref.ratio_trials_success_decoding
    assert got.ratio_trials_success_ldpc == ref.ratio_trials_success_ldpc
    assert got.iter_success_mean == ref.iter_success_mean
    assert got.iter_success_max == ref.iter_success_max


def test_force_engine_pins_and_validates(qc):
    """tpu.force_engine pins one engine for A/B measurement; an infeasible
    force raises instead of silently falling back. The forced qc_stream
    driver run reproduces the fused engine's sweep statistics exactly."""
    from qkd_ldpc_v_tpu import simulation as sim
    from qkd_ldpc_v_tpu.config import Config
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams

    matrix = qc.to_hmatrix()

    def cfg_with(force):
        return Config(
            trials_number=16,
            simulation_seed=5,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=50,
            batch_size=16,
            use_pallas=True,
            force_engine=force,
        )

    assert sim.pallas_engine(matrix, cfg_with("")) == "qc"
    assert sim.pallas_engine(matrix, cfg_with("qc_stream")) == "qc_stream"
    assert sim.pallas_engine(matrix, cfg_with("generic")) == "generic"
    assert sim.pallas_engine(matrix, cfg_with("xla")) == "xla"
    # This fixture's edge space is far too small for the streaming engine.
    with pytest.raises(ValueError, match="force_engine"):
        sim.pallas_engine(matrix, cfg_with("stream"))

    comb = sim.SimCombination(
        0.02, HMatrixParams(), sim.ScalingFactors(primary=0.8)
    )
    ref = sim.run_combination(matrix, comb, cfg_with(""), sim_number=0)
    got = sim.run_combination(
        matrix, comb, cfg_with("qc_stream"), sim_number=0
    )
    assert got.ratio_trials_success_ldpc == ref.ratio_trials_success_ldpc
    assert got.iter_success_mean == ref.iter_success_mean
    assert got.iter_success_min == ref.iter_success_min


@pytest.mark.parametrize("nb,mb,z,cw,seed", [
    (4, 2, 128, 2, 11),    # mb=2: exercises the two-slot DMA tail waits
    (6, 1, 128, 1, 12),    # mb=1: single block-row, degenerate pipeline
    (10, 5, 256, 3, 13),   # Z=256: multi-vreg rolls
])
def test_decode_exact_small_shapes(nb, mb, z, cw, seed):
    """Streamed-engine DMA choreography at degenerate block-row counts and
    wider liftings stays bit-exact vs the XLA decoder."""
    from qkd_ldpc_v_tpu.models.qc import generate_qc_ldpc

    qcm = generate_qc_ldpc(nb, mb, z, column_weight=cw, seed=seed)
    matrix = qcm.to_hmatrix()
    layout = layout_for(matrix)
    n = matrix.num_bit_nodes
    rng = np.random.default_rng(seed)
    b = 9
    alice = rng.integers(0, 2, (b, n)).astype(np.int8)
    bob = alice.copy()
    ne = max(4, n // 40)
    for i in range(b):
        bob[i, rng.choice(n, size=ne, replace=False)] ^= 1
    qber = ne / n
    log_p = np.log((1 - qber) / qber)
    llr = np.where(bob == 1, -log_p, log_p).astype(np.float32)
    bit_order = np.asarray(layout.bit_order)
    syn_int = np.asarray(
        syndrome_internal(layout, jnp.asarray(alice[:, bit_order]))
    )
    syn_ext = syn_int[:, np.asarray(layout.check_inv)]

    ref = get_decoder(layout, DecodingAlgorithm.NMSA, 25, False,
                      dtype=jnp.float32, jit=False)
    rres = ref(jnp.asarray(llr), jnp.asarray(syn_ext), 0.8, 0.0, 0.0)
    dec = qs.make_pallas_qc_stream_decoder(
        qcm, DecodingAlgorithm.NMSA, 25, False, interpret=True
    )
    sres = dec(jnp.asarray(llr), jnp.asarray(syn_ext), 0.8, 0.0, 0.0)
    np.testing.assert_array_equal(
        np.asarray(rres.syndromes_match), np.asarray(sres.syndromes_match)
    )
    np.testing.assert_array_equal(
        np.asarray(rres.iterations), np.asarray(sres.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(rres.decision), np.asarray(sres.decision)
    )


def test_mc_mode_full_plumbing_with_stubbed_prng(qc, monkeypatch):
    """mc mode is TPU-only in production (hardware PRNG), so its plumbing —
    Alice generation + HBM spill, error-key selection, flip/readback, LLR
    build, decode, key comparison — is exercised here by stubbing the PRNG
    with a deterministic mixable stream and mirroring it on the host: the
    kernel's (conv, keys_match, iters) must equal the XLA decoder run on
    the mirrored channel exactly (flooding NMSA is bit-exact)."""
    calls = {"n": 0}

    def mix(x):
        x = (x ^ (x >> 13)) * jnp.uint32(2654435761)
        return x ^ (x >> 16)

    def fake_seed(*_seeds):
        calls["n"] = 0

    def fake_bits(shape):
        k = calls["n"]
        calls["n"] += 1
        a = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(7919)
        b = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) * jnp.uint32(104729)
        return mix(a ^ b ^ jnp.uint32(k * 97531))

    monkeypatch.setattr(qs.pltpu, "prng_seed", fake_seed)
    monkeypatch.setattr(qs.pltpu, "prng_random_bits", fake_bits)

    z = qc.lifting
    nb = qc.base_bits
    n = qc.num_bit_nodes
    tb = 8
    ne = 25
    qber = ne / n

    mc = qs.make_pallas_qc_stream_montecarlo(
        qc, DecodingAlgorithm.NMSA, 30, False, batch=tb, batch_tile=tb,
        interpret=True,
    )
    conv, keys, iters = mc(3, ne, qber, 0.8, 0.0, 0.0)

    # Host mirror of the stubbed stream (same mixing, numpy uint32 wrap).
    def np_mix(x):
        x = ((x ^ (x >> np.uint32(13)))
             * np.uint32(2654435761)).astype(np.uint32)
        return (x ^ (x >> np.uint32(16))).astype(np.uint32)

    def np_bits(k):
        a = (np.arange(tb, dtype=np.uint32)[:, None]
             * np.uint32(7919))
        b = (np.arange(z, dtype=np.uint32)[None, :]
             * np.uint32(104729))
        with np.errstate(over="ignore"):
            return np_mix((a ^ b ^ np.uint32(k * 97531)).astype(np.uint32))

    idx_bits = max(1, (n - 1).bit_length())
    alice = np.zeros((tb, n), np.int8)
    ekeys = np.zeros((tb, n), np.uint32)
    for c in range(nb):
        alice[:, c * z:(c + 1) * z] = (np_bits(c) & 1).astype(np.int8)
    for c in range(nb):
        eb = np_bits(nb + c)
        pos = (np.arange(z, dtype=np.uint32) + np.uint32(c * z))[None, :]
        ekeys[:, c * z:(c + 1) * z] = (
            (eb >> np.uint32(idx_bits)) << np.uint32(idx_bits)
        ) | pos
    # exactly-ne smallest keys flip
    thr = np.sort(ekeys, axis=1)[:, ne - 1:ne]
    flip = (ekeys <= thr).astype(np.int8)
    assert (flip.sum(axis=1) == ne).all()
    bob = alice ^ flip

    # Mirror the kernel's f32 LLR through the same XLA backend.
    qf = jnp.float32(qber)
    log_p = jnp.log((1.0 - qf) / qf)
    llr = np.where(np.asarray(bob) == 1,
                   -np.float32(log_p), np.float32(log_p)).astype(np.float32)
    matrix = qc.to_hmatrix()
    layout = layout_for(matrix)
    bit_order = np.asarray(layout.bit_order)
    syn_int = np.asarray(
        syndrome_internal(layout, jnp.asarray(alice[:, bit_order]))
    )
    syn_ext = syn_int[:, np.asarray(layout.check_inv)]
    ref = get_decoder(layout, DecodingAlgorithm.NMSA, 30, False,
                      dtype=jnp.float32, jit=False)
    rres = ref(jnp.asarray(llr), jnp.asarray(syn_ext), 0.8, 0.0, 0.0)
    exp_keys = (np.asarray(rres.decision) == alice).all(axis=1) & np.asarray(
        rres.syndromes_match
    )

    np.testing.assert_array_equal(
        np.asarray(conv), np.asarray(rres.syndromes_match)
    )
    np.testing.assert_array_equal(
        np.asarray(iters), np.asarray(rres.iterations)
    )
    np.testing.assert_array_equal(np.asarray(keys), exp_keys)


def test_rate_adaptive_driver_matches_xla(qc, monkeypatch):
    """Rate adaptation through the streamed QC engine: frames are built in
    XLA (host-chosen puncture/shorten) and decoded by the engine's library
    decoder — whose flooding is bit-exact vs the XLA decoder, so the sweep
    statistics must equal the pure-XLA run exactly."""
    from qkd_ldpc_v_tpu import simulation as sim
    from qkd_ldpc_v_tpu.config import Config
    from qkd_ldpc_v_tpu.rate_adapt import adapt_code_rate
    import qkd_ldpc_v_tpu.ops.pallas_qc as _pk

    matrix = qc.to_hmatrix()
    qber = 0.03
    params = adapt_code_rate(
        np.random.default_rng(4), matrix, qber, delta=0.1, efficiency=1.3,
    )

    def cfg_for(use_pallas):
        return Config(
            trials_number=16,
            simulation_seed=11,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=50,
            batch_size=16,
            enable_code_rate_adaptation=True,
            use_pallas=use_pallas,
        )

    comb = sim.SimCombination(
        qber, params, sim.ScalingFactors(primary=0.8)
    )
    ref = sim.run_combination(matrix, comb, cfg_for(False), sim_number=0)

    monkeypatch.setattr(sim, "_STEP_CACHE", type(sim._STEP_CACHE)())
    monkeypatch.setattr(_pk, "feasible_batch_tile", lambda *_a, **_k: 0)
    assert sim.pallas_engine(matrix, cfg_for(True)) == "qc_stream"
    got = sim.run_combination(matrix, comb, cfg_for(True), sim_number=0)

    assert got.ratio_trials_success_decoding == ref.ratio_trials_success_decoding
    assert got.ratio_trials_success_ldpc == ref.ratio_trials_success_ldpc
    assert got.iter_success_mean == ref.iter_success_mean
    assert got.iter_success_min == ref.iter_success_min
    assert got.iter_success_max == ref.iter_success_max
