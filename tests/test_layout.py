"""Degree-grouped edge-layout tests: the two flat enumerations must be exact
inverse permutations of each other, groups must tile the node/edge sets, and
the permutations must round-trip."""

import numpy as np

from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.models.layout import compile_layout


def _check_layout(matrix):
    lay = compile_layout(matrix)
    n, m, e = lay.num_bits, lay.num_checks, lay.num_edges
    assert e == matrix.num_edges

    # Permutations round-trip.
    np.testing.assert_array_equal(lay.bit_order[lay.bit_inv], np.arange(n))
    np.testing.assert_array_equal(lay.check_order[lay.check_inv], np.arange(m))

    # Groups tile nodes and edges exactly, degrees ascending.
    for groups, total_nodes in ((lay.check_groups, m), (lay.bit_groups, n)):
        assert sum(g.count for g in groups) == total_nodes
        assert sum(g.count * g.degree for g in groups) == e
        degs = [g.degree for g in groups]
        assert degs == sorted(degs)
        node_cursor = 0
        edge_cursor = 0
        for g in groups:
            assert g.node_start == node_cursor
            assert g.edge_offset == edge_cursor
            node_cursor += g.count
            edge_cursor += g.count * g.degree

    # cross_flat round trip: unique values per side, inverse of each other.
    def flatten_cross(groups):
        out = np.empty(e, dtype=np.int64)
        for g in groups:
            out[g.edge_offset : g.edge_offset + g.count * g.degree] = (
                g.cross_flat.reshape(-1)
            )
        return out

    c2b = flatten_cross(lay.check_groups)  # check-major pos -> bit-major pos
    b2c = flatten_cross(lay.bit_groups)  # bit-major pos -> check-major pos
    assert len(set(c2b.tolist())) == e
    assert len(set(b2c.tolist())) == e
    np.testing.assert_array_equal(b2c[c2b], np.arange(e))
    np.testing.assert_array_equal(c2b[b2c], np.arange(e))

    # Edge identity: check-major slot (group, row, s) references internal bit
    # `neighbor`; the bit-major table at cross_flat must reference back.
    bit_neighbor_flat = np.empty(e, dtype=np.int64)  # bit-major pos -> check
    bit_owner_flat = np.empty(e, dtype=np.int64)  # bit-major pos -> bit
    for g in lay.bit_groups:
        span = slice(g.edge_offset, g.edge_offset + g.count * g.degree)
        bit_neighbor_flat[span] = g.neighbor.reshape(-1)
        owners = np.repeat(
            np.arange(g.node_start, g.node_start + g.count), g.degree
        )
        bit_owner_flat[span] = owners
    for g in lay.check_groups:
        for local in range(g.count):
            j_int = g.node_start + local
            for s in range(g.degree):
                i_int = g.neighbor[local, s]
                pos_b = g.cross_flat[local, s]
                assert bit_owner_flat[pos_b] == i_int
                assert bit_neighbor_flat[pos_b] == j_int

    # Edge set equals the matrix's edge set (external indices).
    edges_layout = set()
    for g in lay.check_groups:
        for local in range(g.count):
            j_ext = int(lay.check_order[g.node_start + local])
            for s in range(g.degree):
                i_ext = int(lay.bit_order[g.neighbor[local, s]])
                edges_layout.add((j_ext, i_ext))
    edges_matrix = {
        (j, int(b)) for j, bits in enumerate(matrix.check_nodes) for b in bits
    }
    assert edges_layout == edges_matrix


def test_layout_small(small_matrix):
    _check_layout(small_matrix)


def test_layout_johnson(johnson_matrix):
    lay = compile_layout(johnson_matrix)
    # Regular matrix -> exactly one group per side.
    assert len(lay.check_groups) == 1
    assert len(lay.bit_groups) == 1
    assert lay.check_groups[0].degree == 3
    assert lay.bit_groups[0].degree == 2
    _check_layout(johnson_matrix)


def test_layout_irregular():
    from qkd_ldpc_v_tpu.models.hmatrix import from_dense

    dense = np.array(
        [
            [1, 1, 1, 1, 0, 0],
            [0, 1, 0, 0, 1, 0],
            [1, 0, 1, 0, 1, 1],
        ],
        dtype=np.int8,
    )
    m = from_dense(dense)
    assert not m.is_regular
    lay = compile_layout(m)
    assert [g.degree for g in lay.check_groups] == [2, 4, 4] or [
        g.degree for g in lay.check_groups
    ] == [2, 4]
    _check_layout(m)


def test_generator_properties():
    m = generate_regular_ldpc(num_bits=128, num_checks=64, column_weight=3, seed=1)
    assert m.num_bit_nodes == 128
    assert m.num_check_nodes == 64
    assert all(len(r) == 3 for r in m.bit_nodes)
    assert m.num_edges == 128 * 3
    m.validate_consistency()
    for r in m.check_nodes:
        assert len(set(r.tolist())) == len(r)
    lay = compile_layout(m)
    assert len(lay.bit_groups) == 1
    _check_layout(m)
