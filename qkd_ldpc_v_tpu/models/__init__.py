"""Code models: parity-check matrix representation, file readers, layout
compiler, and LDPC code generators."""

from qkd_ldpc_v_tpu.models.hmatrix import (  # noqa: F401
    HMatrix,
    MatrixFormatError,
    read_matrix,
    read_sparse_matrix_1,
    read_sparse_matrix_2,
    read_sparse_matrix_alist,
    read_sparse_uncompressed_matrix,
    write_alist,
)
from qkd_ldpc_v_tpu.models.layout import EdgeLayout, compile_layout  # noqa: F401
from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc  # noqa: F401
