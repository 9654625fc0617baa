// Sweep-level A/B harness: drives the REFERENCE simulation layer — the
// actual prepare_sim_inputs / QKD_LDPC_batch_simulation / run_trial /
// process_trials_results / write_file compiled straight out of
// /root/reference/src (simulation.cpp:371-768, 4-176) — so this framework's
// combination builder, statistics aggregator, and CSV writer can be
// verified against the real C++ end to end.
//
// Usage:
//   ref_sweep sweep <matrix_dir> <results_dir>   config on stdin
//   ref_sweep stats <results_dir>                config + synthetic trial
//                                                outcomes on stdin
//
// Config lines (whitespace-separated; order free; unknown keys rejected):
//   threads N | trials N | seed N | algorithm 0..5 | max_iters N
//   matrix_format 0..3 | privacy 0|1 | throughput 0|1 | consider_rtt 0|1
//   rtt MS | threshold T (0 = off) | rate_adapt 0|1 | untainted 0|1
//   use_adapt_ranges 0|1
//   rqber R qb qe qs
//   primary_range b e s | primary_map R v
//   secondary_range b e s | secondary_map R v
//   adapt_range R db de ds eb ee es
//   adapt_map R qber delta eff
//   end
//
// stats mode, after "end": per combination
//   result <sim_number> <matrix_filename> <is_regular> <num_bits>
//          <num_checks> <delta> <efficiency> <punct_frac> <short_frac>
//          <adapted_R> <config_qber> <accurate_qber> <primary> <secondary>
//          <bits_to_remove_count> <num_trials>
//   then num_trials lines: <iters> <syn_match> <keys_match> <runtime_us>
//   terminated by "done"
//
// Output (both modes): first line is the result CSV path, then the CSV
// content verbatim.

#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "config.hpp"
#include "simulation.hpp"

config_data CFG;  // the reference reads its knobs from this global

static int fail(const std::string& msg) {
  std::cerr << "ref_sweep: " << msg << "\n";
  return 2;
}

static bool read_config(std::istream& in) {
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream ls(line);
    std::string key;
    if (!(ls >> key) || key.empty() || key[0] == '#') continue;
    if (key == "end") return true;
    if (key == "threads") ls >> CFG.THREADS_NUMBER;
    else if (key == "trials") ls >> CFG.TRIALS_NUMBER;
    else if (key == "seed") ls >> CFG.SIMULATION_SEED;
    else if (key == "algorithm") ls >> CFG.DECODING_ALGORITHM;
    else if (key == "max_iters") ls >> CFG.DECODING_ALG_MAX_ITERATIONS;
    else if (key == "matrix_format") ls >> CFG.MATRIX_FORMAT;
    else if (key == "privacy") ls >> CFG.ENABLE_PRIVACY_MAINTENANCE;
    else if (key == "throughput") ls >> CFG.ENABLE_THROUGHPUT_MEASUREMENT;
    else if (key == "consider_rtt") ls >> CFG.CONSIDER_RTT;
    else if (key == "rtt") ls >> CFG.RTT;
    else if (key == "threshold") {
      ls >> CFG.DECODING_ALG_MSG_LLR_THRESHOLD;
      CFG.ENABLE_DECODING_ALG_MSG_LLR_THRESHOLD =
          CFG.DECODING_ALG_MSG_LLR_THRESHOLD > 0.0;
    } else if (key == "rate_adapt") ls >> CFG.ENABLE_CODE_RATE_ADAPTATION;
    else if (key == "untainted") ls >> CFG.ENABLE_UNTAINTED_PUNCTURING;
    else if (key == "use_adapt_ranges")
      ls >> CFG.USE_ADAPTATION_PARAMETERS_RANGES;
    else if (key == "rqber") {
      R_QBER_range r{};
      ls >> r.code_rate >> r.QBER_begin >> r.QBER_end >> r.QBER_step;
      CFG.R_QBER_RANGES.push_back(r);
    } else if (key == "primary_range") {
      CFG.DECODING_ALG_PARAMS.primary.use_range = true;
      auto& rg = CFG.DECODING_ALG_PARAMS.primary.range;
      ls >> rg.begin >> rg.end >> rg.step;
    } else if (key == "primary_map") {
      R_scaling_factor_map m{};
      ls >> m.code_rate >> m.scaling_factor;
      CFG.DECODING_ALG_PARAMS.primary.maps.push_back(m);
    } else if (key == "secondary_range") {
      CFG.DECODING_ALG_PARAMS.secondary.use_range = true;
      auto& rg = CFG.DECODING_ALG_PARAMS.secondary.range;
      ls >> rg.begin >> rg.end >> rg.step;
    } else if (key == "secondary_map") {
      R_scaling_factor_map m{};
      ls >> m.code_rate >> m.scaling_factor;
      CFG.DECODING_ALG_PARAMS.secondary.maps.push_back(m);
    } else if (key == "adapt_range") {
      R_adaptation_parameters_range r{};
      ls >> r.code_rate >> r.delta_begin >> r.delta_end >> r.delta_step >>
          r.efficiency_begin >> r.efficiency_end >> r.efficiency_step;
      CFG.R_ADAPT_PARAMS_RANGES.push_back(r);
    } else if (key == "adapt_map") {
      R_QBER_adaptation_parameters_map m{};
      ls >> m.code_rate >> m.QBER_adapt_params.QBER >>
          m.QBER_adapt_params.delta >> m.QBER_adapt_params.efficiency;
      CFG.R_QBER_ADAPT_PARAMS_MAPS.push_back(m);
    } else {
      std::cerr << "ref_sweep: unknown config key '" << key << "'\n";
      return false;
    }
  }
  return false;  // no "end" terminator
}

static void emit(const fs::path& csv_path) {
  std::cout << csv_path.string() << "\n";
  std::ifstream fin(csv_path);
  std::cout << fin.rdbuf();
}

static int run_sweep(const fs::path& matrix_dir, const fs::path& results_dir) {
  // Mirrors main.cpp:173-185 (matrix listing by extension, sweep prep,
  // batch simulation, CSV write).
  std::vector<fs::path> matrix_paths =
      get_file_paths_in_directory(matrix_dir, ".mtrx");
  std::vector<sim_input> sim_inputs = prepare_sim_inputs(matrix_paths);
  std::vector<sim_result> results = QKD_LDPC_batch_simulation(sim_inputs);
  fs::path csv = write_file(results, "0s", results_dir);
  emit(csv);
  return 0;
}

static int run_stats(std::istream& in, const fs::path& results_dir) {
  std::vector<sim_result> results;
  H_matrix matrix;  // only bit_nodes.size() is read by the statistics layer
  H_matrix_params params;
  std::string key;
  while (in >> key) {
    if (key == "done") break;
    if (key != "result") return fail("expected 'result' or 'done'");
    sim_result r{};
    int is_regular = 0;
    size_t num_bits = 0, num_checks = 0, n_remove = 0, n_trials = 0;
    in >> r.sim_number >> r.matrix_filename >> is_regular >> num_bits >>
        num_checks >> r.delta >> r.efficiency >> r.punctured_fraction >>
        r.shortened_fraction >> r.adapted_code_rate >> r.config_QBER >>
        r.accurate_QBER >> r.scaling_factors.primary >>
        r.scaling_factors.secondary >> n_remove >> n_trials;
    r.is_regular = is_regular != 0;
    r.num_bit_nodes = num_bits;
    r.num_check_nodes = num_checks;

    matrix.bit_nodes.assign(num_bits, {});
    matrix.check_nodes.assign(num_checks, {});
    params.bits_to_remove.assign(n_remove, 0);

    std::vector<trial_result> trials(n_trials);
    for (size_t i = 0; i < n_trials; ++i) {
      long long iters = 0, runtime_us = 0;
      int syn = 0, keys = 0;
      in >> iters >> syn >> keys >> runtime_us;
      trials[i].ldpc_res.decoding_res.iterations_num =
          static_cast<size_t>(iters);
      trials[i].ldpc_res.decoding_res.syndromes_match = syn != 0;
      trials[i].ldpc_res.keys_match = keys != 0;
      trials[i].runtime = std::chrono::microseconds(runtime_us);
    }
    process_trials_results(trials, matrix, params, r);
    results.push_back(r);
  }
  fs::path csv = write_file(results, "0s", results_dir);
  emit(csv);
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 3) return fail("usage: ref_sweep sweep <matrix_dir> <results_dir> | ref_sweep stats <results_dir>");
  const std::string mode = argv[1];
  try {
    if (!read_config(std::cin)) return fail("bad config (no 'end'?)");
    if (mode == "sweep") {
      if (argc != 4) return fail("sweep needs <matrix_dir> <results_dir>");
      return run_sweep(argv[2], argv[3]);
    }
    if (mode == "stats") {
      return run_stats(std::cin, argv[2]);
    }
    return fail("unknown mode '" + mode + "'");
  } catch (const std::exception& e) {
    std::cerr << "ref_sweep error: " << e.what() << "\n";
    return 1;
  }
}
