"""Generate the repo's starter asset library (deterministic).

The reference ships matrix suites and example configs
(sparse_matrices/*, configs/*); this script generates our equivalents:
QC-PEG base-graph matrices (the TPU-native format), small alist codes for
the generic path, and example sweep configs in the reference JSON schema.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
from qkd_ldpc_v_tpu.models.hmatrix import write_alist
from qkd_ldpc_v_tpu.models.qc import generate_qc_peg, write_qc_matrix

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    qc_dir = ROOT / "sparse_matrices" / "matrices_qc"
    alist_dir = ROOT / "sparse_matrices" / "matrices_alist"
    cfg_dir = ROOT / "configs"
    qc_dir.mkdir(parents=True, exist_ok=True)
    alist_dir.mkdir(parents=True, exist_ok=True)
    cfg_dir.mkdir(parents=True, exist_ok=True)

    # QC-PEG suite: the bench code plus a rate ladder.
    for nb, mb, z, cw, seed in (
        (20, 6, 512, 4, 9),     # N=10240, R=0.70 (the headline bench code)
        (40, 11, 256, 4, 9),    # N=10240, R=0.725 (tight-efficiency point)
        (40, 8, 256, 4, 10),    # N=10240, R=0.80
        (40, 14, 256, 4, 11),   # N=10240, R=0.65
        (8, 4, 128, 3, 12),     # N=1024,  R=0.5 (small/test)
    ):
        qc = generate_qc_peg(nb, mb, z, cw, seed=seed)
        name = (
            f"(N={qc.num_bit_nodes},M={qc.num_check_nodes},"
            f"R={qc.code_rate:.2f},CW={cw},Z={z},SEED={seed}).mtrx"
        )
        write_qc_matrix(qc, qc_dir / name)
        print("wrote", qc_dir / name)

    # Small alist codes for the generic decoder path.
    for n, m, cw, seed in ((1024, 512, 3, 5), (1024, 283, 4, 6)):
        mat = generate_regular_ldpc(n, m, cw, seed=seed)
        name = f"(N={n},M={m},R={1 - m / n:.2f},CW={cw},SEED={seed}).mtrx"
        write_alist(mat, alist_dir / name)
        print("wrote", alist_dir / name)

    sweep = {
        "threads_number": 1,
        "trials_number": 1024,
        "use_config_simulation_seed": True,
        "simulation_seed": 42,
        "enable_privacy_maintenance": False,
        "enable_throughput_measurement": True,
        "throughput_measurement_parameters": {"consider_RTT": True, "RTT": 0.4},
        "decoding_algorithm": 2,
        "min_sum_normalized_parameters": {
            "use_alpha_range": False,
            "alpha_range": {"begin": 0.7, "end": 0.9, "step": 0.05},
            "code_rate_alpha_maps": [
                {"code_rate": 0.55, "alpha": 0.75},
                {"code_rate": 0.99, "alpha": 0.70},
            ],
        },
        "decoding_algorithm_max_iterations": 100,
        "matrix_format": 4,
        "trace_qkd_ldpc": False,
        "trace_decoding_algorithm": False,
        "trace_decoding_algorithm_llr": False,
        "enable_decoding_algorithm_msg_llr_threshold": False,
        "code_rate_QBER_ranges": [
            {"code_rate": 0.55, "QBER": {"begin": 0.05, "end": 0.07, "step": 0.01}},
            {"code_rate": 0.65, "QBER": {"begin": 0.035, "end": 0.045, "step": 0.005}},
            {"code_rate": 0.70, "QBER": {"begin": 0.025, "end": 0.035, "step": 0.005}},
            {"code_rate": 0.75, "QBER": {"begin": 0.02, "end": 0.03, "step": 0.005}},
            {"code_rate": 0.85, "QBER": {"begin": 0.01, "end": 0.02, "step": 0.005}},
        ],
        "enable_code_rate_adaptation": False,
        "tpu": {"batch_size": 1024, "use_pallas": True},
    }
    (cfg_dir / "example_qc_sweep.json").write_text(json.dumps(sweep, indent=2))
    print("wrote", cfg_dir / "example_qc_sweep.json")

    adapt = {
        "threads_number": 1,
        "trials_number": 256,
        "use_config_simulation_seed": True,
        "simulation_seed": 7,
        "enable_privacy_maintenance": True,
        "enable_throughput_measurement": True,
        "throughput_measurement_parameters": {"consider_RTT": True, "RTT": 0.4},
        "decoding_algorithm": 5,
        "adaptive_min_sum_offset_parameters": {
            "use_beta_range": False,
            "beta_range": {"begin": 0.3, "end": 0.9, "step": 0.1},
            "code_rate_beta_maps": [{"code_rate": 0.99, "beta": 0.6}],
            "use_sigma_range": False,
            "sigma_range": {"begin": 0.3, "end": 0.9, "step": 0.1},
            "code_rate_sigma_maps": [{"code_rate": 0.99, "sigma": 0.8}],
        },
        "decoding_algorithm_max_iterations": 100,
        "matrix_format": 1,
        "trace_qkd_ldpc": False,
        "trace_decoding_algorithm": False,
        "trace_decoding_algorithm_llr": False,
        "enable_decoding_algorithm_msg_llr_threshold": False,
        "code_rate_QBER_ranges": [
            {"code_rate": 0.99, "QBER": {"begin": 0.05, "end": 0.05, "step": 0.01}}
        ],
        "enable_code_rate_adaptation": True,
        "code_rate_adaptation_parameters": {
            "enable_untainted_puncturing": True,
            "use_adaptation_parameters_ranges": True,
            "code_rate_adaptation_parameters_ranges": [
                {
                    "code_rate": 0.99,
                    "delta": {"begin": 0.1, "end": 0.1, "step": 0.05},
                    "efficiency": {"begin": 1.2, "end": 1.4, "step": 0.1},
                }
            ],
        },
    }
    (cfg_dir / "example_rate_adapt.json").write_text(json.dumps(adapt, indent=2))
    print("wrote", cfg_dir / "example_rate_adapt.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
