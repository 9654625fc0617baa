"""QC-LDPC generator and roll-based decoder tests.

The QC decoder must agree with the generic gather-based decoder on the
expanded HMatrix of the same code — same algorithms, same convergence
bookkeeping (ops/qc_decoder.py vs ops/decoders.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_v_tpu.config import DecodingAlgorithm
from qkd_ldpc_v_tpu.models.layout import layout_for
from qkd_ldpc_v_tpu.models.qc import QCMatrix, generate_qc_ldpc
from qkd_ldpc_v_tpu.ops.channel import calculate_syndrome
from qkd_ldpc_v_tpu.ops.decoders import make_decoder
from qkd_ldpc_v_tpu.ops.qc_decoder import make_qc_decoder


@pytest.fixture(scope="module")
def qc():
    return generate_qc_ldpc(base_bits=12, base_checks=6, lifting=16,
                            column_weight=3, seed=7)


class TestGenerator:
    def test_shapes_and_rate(self, qc):
        assert qc.num_bit_nodes == 12 * 16
        assert qc.num_check_nodes == 6 * 16
        assert qc.code_rate == pytest.approx(0.5)

    def test_column_weight(self, qc):
        assert ((qc.shifts >= 0).sum(axis=0) == 3).all()

    def test_expansion_consistent(self, qc):
        h = qc.to_hmatrix()
        h.validate_consistency()
        assert h.num_bit_nodes == qc.num_bit_nodes
        assert h.num_edges == 3 * qc.num_bit_nodes
        # every check row weight equals base row degree
        base_deg = (qc.shifts >= 0).sum(axis=1)
        for r in range(qc.base_checks):
            for i in range(qc.lifting):
                assert len(h.check_nodes[r * qc.lifting + i]) == base_deg[r]

    def test_no_four_cycles(self, qc):
        """The shift-resampling pass should leave no lifted 4-cycles."""
        dense = qc.to_hmatrix().to_dense().astype(np.int64)
        overlap = dense @ dense.T
        np.fill_diagonal(overlap, 0)
        assert overlap.max() <= 1, "two checks share >= 2 bits (4-cycle)"


def _channel(qc, batch, qber, seed):
    rng = np.random.default_rng(seed)
    n = qc.num_bit_nodes
    alice = jnp.asarray(rng.integers(0, 2, (batch, n)), jnp.int8)
    flips = jnp.asarray(rng.random((batch, n)) < qber, jnp.int8)
    bob = alice ^ flips
    log_p = float(np.log((1 - qber) / qber))
    llr = jnp.where(bob == 1, -log_p, log_p).astype(jnp.float32)
    return alice, llr


class TestQCDecoder:
    @pytest.mark.parametrize(
        "algorithm,primary,secondary",
        [
            (DecodingAlgorithm.SPA, 1.0, 1.0),
            (DecodingAlgorithm.SPA_APPROX, 1.0, 1.0),
            (DecodingAlgorithm.NMSA, 0.8, 1.0),
            (DecodingAlgorithm.OMSA, 0.3, 1.0),
            (DecodingAlgorithm.ANMSA, 0.9, 0.5),
            (DecodingAlgorithm.AOMSA, 0.3, 0.6),
        ],
    )
    def test_matches_generic_decoder(self, qc, algorithm, primary, secondary):
        h = qc.to_hmatrix()
        layout = layout_for(h)
        alice, llr = _channel(qc, batch=8, qber=0.04, seed=11)
        syndrome = calculate_syndrome(layout, alice)

        generic = jax.jit(make_decoder(layout, algorithm, 30, False, jnp.float32))
        qc_dec = jax.jit(make_qc_decoder(qc, algorithm, 30, False, jnp.float32))

        rg = generic(llr, syndrome, primary, secondary, 0.0)
        rq = qc_dec(llr, syndrome, primary, secondary, 0.0)

        np.testing.assert_array_equal(
            np.asarray(rq.syndromes_match), np.asarray(rg.syndromes_match)
        )
        np.testing.assert_array_equal(
            np.asarray(rq.iterations), np.asarray(rg.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(rq.decision), np.asarray(rg.decision)
        )

    def test_decodes_at_low_qber(self, qc):
        alice, llr = _channel(qc, batch=16, qber=0.02, seed=3)
        layout = layout_for(qc.to_hmatrix())
        syndrome = calculate_syndrome(layout, alice)
        dec = jax.jit(make_qc_decoder(qc, DecodingAlgorithm.SPA, 50, False, jnp.float32))
        r = dec(llr, syndrome, 1.0, 1.0, 0.0)
        ok = np.asarray(r.syndromes_match)
        assert ok.mean() > 0.8
        match = np.asarray(r.decision)[ok] == np.asarray(alice)[ok]
        assert match.all()

    def test_threshold_clamp_path(self, qc):
        alice, llr = _channel(qc, batch=4, qber=0.04, seed=5)
        layout = layout_for(qc.to_hmatrix())
        syndrome = calculate_syndrome(layout, alice)
        g = jax.jit(make_decoder(layout, DecodingAlgorithm.NMSA, 20, True, jnp.float32))
        q = jax.jit(make_qc_decoder(qc, DecodingAlgorithm.NMSA, 20, True, jnp.float32))
        rg = g(llr, syndrome, 0.8, 1.0, 15.0)
        rq = q(llr, syndrome, 0.8, 1.0, 15.0)
        np.testing.assert_array_equal(
            np.asarray(rq.iterations), np.asarray(rg.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(rq.decision), np.asarray(rg.decision)
        )


class TestQCFileFormat:
    def test_roundtrip(self, qc, tmp_path):
        from qkd_ldpc_v_tpu.models.qc import read_qc_matrix, write_qc_matrix

        path = tmp_path / "code.mtrx"
        write_qc_matrix(qc, path)
        back = read_qc_matrix(path)
        np.testing.assert_array_equal(back.shifts, qc.shifts)
        assert back.lifting == qc.lifting

    def test_read_via_matrix_format(self, qc, tmp_path):
        from qkd_ldpc_v_tpu.config import MatrixFormat
        from qkd_ldpc_v_tpu.models.hmatrix import read_matrix
        from qkd_ldpc_v_tpu.models.qc import write_qc_matrix

        path = tmp_path / "code.mtrx"
        write_qc_matrix(qc, path)
        m = read_matrix(path, MatrixFormat.QC)
        assert m.qc is not None
        assert m.num_bit_nodes == qc.num_bit_nodes
        assert m.source_path == path

    def test_validation_errors(self, tmp_path):
        from qkd_ldpc_v_tpu.models.hmatrix import MatrixFormatError
        from qkd_ldpc_v_tpu.models.qc import read_qc_matrix

        bad = tmp_path / "bad.mtrx"
        bad.write_text("2 2 128\n0 5\n")
        with pytest.raises(MatrixFormatError, match="Insufficient"):
            read_qc_matrix(bad)
        bad.write_text("1 2 128\n0 migrate\n")
        with pytest.raises(ValueError):
            read_qc_matrix(bad)
        bad.write_text("1 2 128\n0 128\n")
        with pytest.raises(MatrixFormatError, match="out of range"):
            read_qc_matrix(bad)


class TestQCPEG:
    def test_peg_structure(self):
        from qkd_ldpc_v_tpu.models.qc import generate_qc_peg

        qc = generate_qc_peg(12, 6, 64, 3, seed=1)
        h = qc.to_hmatrix()
        h.validate_consistency()
        assert all(len(r) == 3 for r in h.bit_nodes)
        # 4-cycle-free
        d = h.to_dense().astype(np.int64)
        ov = d @ d.T
        np.fill_diagonal(ov, 0)
        assert ov.max() <= 1
