// A/B parity harness: drives the REFERENCE decoder/protocol core
// (compiled directly from /root/reference/src with dependency stubs; see
// Makefile) on explicit keys so this framework's decoders can be verified
// bit-for-bit against the actual C++ implementation (SURVEY.md §7 step 9).
//
// Usage:
//   ref_harness <matrix_path> <format 0|1|2|3> <alg 0..5> <max_iters>
//               <primary> <secondary> <threshold (0 = off)>
// stdin:
//   B qber
//   B lines of alice bits (e.g. "0 1 1 0 ...")
//   B lines of bob bits
// stdout per frame:
//   iterations syndromes_match keys_match <decision bits>

#include <cstdio>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "config.hpp"
#include "qkd_ldpc_algorithm.hpp"

config_data CFG;  // the reference reads its knobs from this global

static std::vector<int> read_bits(std::istream &in, size_t n) {
  std::vector<int> bits(n);
  for (size_t i = 0; i < n; ++i) in >> bits[i];
  return bits;
}

int main(int argc, char **argv) {
  if (argc != 8) {
    std::fprintf(stderr,
                 "usage: %s matrix format alg max_iters primary secondary "
                 "threshold\n",
                 argv[0]);
    return 2;
  }
  const std::string matrix_path = argv[1];
  const int format = std::stoi(argv[2]);
  const int alg = std::stoi(argv[3]);
  const size_t max_iters = std::stoul(argv[4]);
  const double primary = std::stod(argv[5]);
  const double secondary = std::stod(argv[6]);
  const double threshold = std::stod(argv[7]);

  CFG.DECODING_ALGORITHM = static_cast<size_t>(alg);
  CFG.DECODING_ALG_MAX_ITERATIONS = max_iters;
  CFG.ENABLE_DECODING_ALG_MSG_LLR_THRESHOLD = threshold > 0.0;
  CFG.DECODING_ALG_MSG_LLR_THRESHOLD = threshold;
  CFG.TRACE_QKD_LDPC = false;
  CFG.TRACE_DECODING_ALG = false;
  CFG.TRACE_DECODING_ALG_LLR = false;
  CFG.ENABLE_PRIVACY_MAINTENANCE = false;
  CFG.ENABLE_CODE_RATE_ADAPTATION = false;

  try {
    H_matrix matrix;
    switch (format) {
      case 0: matrix = read_sparse_uncompressed_matrix(matrix_path); break;
      case 1: matrix = read_sparse_matrix_alist(matrix_path); break;
      case 2: matrix = read_sparse_matrix_1(matrix_path); break;
      case 3: matrix = read_sparse_matrix_2(matrix_path); break;
      default:
        std::fprintf(stderr, "bad format %d\n", format);
        return 2;
    }
    const size_t n = matrix.bit_nodes.size();

    size_t batch = 0;
    double qber = 0.0;
    std::cin >> batch >> qber;
    std::vector<std::vector<int>> alice(batch), bob(batch);
    for (size_t b = 0; b < batch; ++b) alice[b] = read_bits(std::cin, n);
    for (size_t b = 0; b < batch; ++b) bob[b] = read_bits(std::cin, n);

    decoding_scaling_factors sf;
    sf.primary = primary;
    sf.secondary = secondary;

    for (size_t b = 0; b < batch; ++b) {
      LDPC_result res = QKD_LDPC(matrix, alice[b], bob[b], qber, sf);
      std::ostringstream line;
      line << res.decoding_res.iterations_num << ' '
           << (res.decoding_res.syndromes_match ? 1 : 0) << ' '
           << (res.keys_match ? 1 : 0);
      // QKD_LDPC does not return the corrected key directly; keys_match and
      // the iteration trajectory are the comparison signals.
      std::cout << line.str() << '\n';
    }
  } catch (const std::exception &e) {
    std::fprintf(stderr, "ERROR: %s\n", e.what());
    return 1;
  }
  return 0;
}
