"""Quasi-cyclic (QC) LDPC codes: generation and block structure.

The reference decodes arbitrary sparse matrices from files; its production
suites are PEG-style random codes (sparse_matrices/*). On TPU the expensive
operation in belief propagation is the edge permutation between check-major
and bit-major message order — an arbitrary gather for random codes. QC-LDPC
codes (the industry-standard structure: 5G NR, 802.11, DVB-S2) replace that
gather with **per-block cyclic rolls**: H is an (mb x nb) grid of Z x Z
circulants, so regrouping messages is a static block permutation (tiny)
plus a static cyclic shift per block — which XLA executes as two contiguous
slices at full HBM bandwidth and a Pallas kernel executes for free as offset
indexing.

Convention: base entry (r, c) with shift s >= 0 contributes edges
check (r*Z + i) <-> bit (c*Z + j) with j = (i + s) mod Z. Entry -1 = no
block. One circulant per base cell (weight-1 circulants only, like 5G NR).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from qkd_ldpc_v_tpu.models.hmatrix import HMatrix


@dataclass(frozen=True)
class QCMatrix:
    """A lifted QC-LDPC parity-check matrix.

    ``shifts``: [mb, nb] int array, -1 for absent blocks, else the circulant
    shift in [0, Z).
    """

    shifts: np.ndarray
    lifting: int  # Z

    @property
    def base_checks(self) -> int:
        return self.shifts.shape[0]

    @property
    def base_bits(self) -> int:
        return self.shifts.shape[1]

    @property
    def num_check_nodes(self) -> int:
        return self.base_checks * self.lifting

    @property
    def num_bit_nodes(self) -> int:
        return self.base_bits * self.lifting

    @property
    def code_rate(self) -> float:
        return 1.0 - self.num_check_nodes / self.num_bit_nodes

    @property
    def block_edges(self) -> List[Tuple[int, int, int]]:
        """[(base_check r, base_bit c, shift s)] in check-major base order."""
        out = []
        for r in range(self.base_checks):
            for c in range(self.base_bits):
                s = int(self.shifts[r, c])
                if s >= 0:
                    out.append((r, c, s))
        return out

    def to_hmatrix(self) -> HMatrix:
        """Expand to the generic adjacency-list form (host-side components —
        rate adaptation, privacy maintenance, oracle decoding — all operate
        on this; only the device decoder exploits the QC structure)."""
        z = self.lifting
        m = self.num_check_nodes
        n = self.num_bit_nodes
        check_rows: List[List[int]] = [[] for _ in range(m)]
        bit_rows: List[List[int]] = [[] for _ in range(n)]
        for r, c, s in self.block_edges:
            i = np.arange(z)
            j = (i + s) % z
            checks = r * z + i
            bits = c * z + j
            for ch, b in zip(checks, bits):
                check_rows[ch].append(int(b))
                bit_rows[b].append(int(ch))
        check_nodes = [np.array(sorted(row), dtype=np.int32) for row in check_rows]
        bit_nodes = [np.array(sorted(row), dtype=np.int32) for row in bit_rows]
        row_w = {len(r) for r in check_nodes}
        col_w = {len(r) for r in bit_nodes}
        return HMatrix(
            bit_nodes=bit_nodes,
            check_nodes=check_nodes,
            is_regular=len(row_w) == 1 and len(col_w) == 1,
        )


def generate_qc_ldpc(
    base_bits: int,
    base_checks: int,
    lifting: int,
    column_weight: int = 3,
    seed: int = 0,
    girth_tries: int = 50,
) -> QCMatrix:
    """Random regular QC-LDPC construction with 4-cycle avoidance.

    Base graph: every base column gets exactly ``column_weight`` blocks at
    distinct base rows, spread to keep base row weights balanced. Shifts are
    drawn uniformly and re-drawn (up to ``girth_tries``) when they would
    close a length-4 cycle in the lifted graph — the standard
    Fossorier condition: for base cycles r1-c1-r2-c2, a lifted 4-cycle exists
    iff s(r1,c1) - s(r2,c1) + s(r2,c2) - s(r1,c2) == 0 (mod Z).
    """
    rng = np.random.default_rng(seed)
    shifts = np.full((base_checks, base_bits), -1, dtype=np.int64)
    row_load = np.zeros(base_checks, dtype=np.int64)

    for c in range(base_bits):
        # Least-loaded base rows first, random tie-break.
        order = rng.permutation(base_checks)
        rows = order[np.argsort(row_load[order], kind="stable")][:column_weight]
        for r in rows:
            row_load[r] += 1
            shifts[r, c] = rng.integers(lifting)

    # 4-cycle removal: resample the shift of one cell of each violating
    # quadruple until clean or out of tries.
    def violations():
        viol = []
        for c1 in range(base_bits):
            rows1 = np.flatnonzero(shifts[:, c1] >= 0)
            for c2 in range(c1 + 1, base_bits):
                rows2 = np.flatnonzero(shifts[:, c2] >= 0)
                common = np.intersect1d(rows1, rows2)
                for a in range(len(common)):
                    for b in range(a + 1, len(common)):
                        r1, r2 = int(common[a]), int(common[b])
                        d = (
                            shifts[r1, c1] - shifts[r2, c1]
                            + shifts[r2, c2] - shifts[r1, c2]
                        ) % lifting
                        if d == 0:
                            viol.append((r1, c1))
        return viol

    for _ in range(girth_tries):
        viol = violations()
        if not viol:
            break
        for r, c in viol:
            shifts[r, c] = rng.integers(lifting)

    return QCMatrix(shifts=shifts, lifting=lifting)
