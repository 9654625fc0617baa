// Native host-side kernels for qkd_ldpc_v_tpu.
//
// The untainted-puncturing greedy (reference:
// src/array_and_matrix_operations.cpp:1002-1068) is the one host-side
// preprocessing step whose naive form is quadratic: every round rescans
// |N2(i) ∩ X| for all nodes. This implementation keeps those counts
// incrementally — second-order neighborhoods are symmetric, so when a node
// leaves X it decrements exactly its own N2 row — making total update work
// O(|N2 flat|) plus an O(n) min-scan per selection round.
//
// The selection RNG is SplitMix64 with modulo reduction, mirrored exactly by
// the pure-Python fallback (qkd_ldpc_v_tpu/rate_adapt.py), so both paths
// produce identical .untp caches for a given seed.
//
// C ABI only; loaded via ctypes (no pybind11 in this environment).

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

inline uint64_t splitmix64(uint64_t &state) {
  uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

}  // namespace

extern "C" {

// Greedy maximum set of pairwise-untainted puncturable bits.
//   n         : number of bit nodes
//   n2_flat   : concatenated second-order neighbor lists (symmetric)
//   offsets   : n+1 CSR offsets into n2_flat
//   seed      : SplitMix64 seed for tie-breaking among minimum-count nodes
//   out       : caller-allocated buffer of at least n int32
// Returns the number of selected positions written to `out`.
int64_t qkdldpc_untainted_select(int64_t n, const int32_t *n2_flat,
                                 const int64_t *offsets, uint64_t seed,
                                 int32_t *out) {
  std::vector<uint8_t> in_x(static_cast<size_t>(n), 1);
  std::vector<int64_t> counts(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) counts[i] = offsets[i + 1] - offsets[i];

  int64_t n_active = n;
  int64_t out_len = 0;
  uint64_t rng = seed;

  while (n_active > 0) {
    int64_t mn = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (in_x[i] && counts[i] < mn) mn = counts[i];

    int64_t k = 0;
    for (int64_t i = 0; i < n; ++i)
      if (in_x[i] && counts[i] == mn) ++k;

    int64_t pick = static_cast<int64_t>(splitmix64(rng) % static_cast<uint64_t>(k));
    int64_t chosen = -1;
    for (int64_t i = 0; i < n; ++i) {
      if (in_x[i] && counts[i] == mn && pick-- == 0) {
        chosen = i;
        break;
      }
    }
    out[out_len++] = static_cast<int32_t>(chosen);

    // Remove `chosen` and N2(chosen) ∩ X from X. Leaving X decrements the
    // counts of the leaver's own N2 row (symmetry).
    const auto remove_node = [&](int64_t r) {
      in_x[r] = 0;
      --n_active;
      for (int64_t t = offsets[r]; t < offsets[r + 1]; ++t) --counts[n2_flat[t]];
    };
    remove_node(chosen);
    for (int64_t t = offsets[chosen]; t < offsets[chosen + 1]; ++t) {
      int32_t v = n2_flat[t];
      if (in_x[v]) remove_node(v);
    }
  }
  return out_len;
}

}  // extern "C"

extern "C" {

// Fast integer tokenizer for matrix files: parses whitespace/newline-
// separated decimal integers (the alist / format-1 / format-2 / dense and
// .untp grammars are all "lines of ints"). Two-phase protocol:
//   pass 1: out == nullptr -> returns token count, fills n_lines.
//   pass 2: out/line_starts allocated by caller -> fills values and the
//           index of each line's first token (line_starts has n_lines+1
//           entries, CSR-style).
// Returns -1 on malformed input (non-integer token, int32 overflow, or a
// line separator the Python fallback's str.splitlines() would treat
// differently: lone \r, \v, \f) -- the caller then re-parses in Python.
int64_t qkdldpc_parse_ints(const char *text, int64_t len, int32_t *out,
                           int64_t *line_starts, int64_t *n_lines) {
  int64_t count = 0;
  int64_t line = 0;
  int64_t i = 0;
  const bool fill = out != nullptr;
  if (fill && line_starts) line_starts[0] = 0;
  while (i < len) {
    const char ch = text[i];
    if (ch == '\n') {
      ++line;
      if (fill && line_starts) line_starts[line] = count;
      ++i;
      continue;
    }
    if (ch == '\r') {
      // \r\n is one line break (handled by the \n branch); a lone \r is a
      // line break to str.splitlines() but not to us -> fall back.
      if (i + 1 >= len || text[i + 1] != '\n') return -1;
      ++i;
      continue;
    }
    if (ch == '\f' || ch == '\v') return -1;  // splitlines() line breaks
    if (ch == ' ' || ch == '\t') {
      ++i;
      continue;
    }
    bool neg = false;
    if (ch == '-') {
      neg = true;
      ++i;
      if (i >= len || text[i] < '0' || text[i] > '9') return -1;
    } else if (ch < '0' || ch > '9') {
      return -1;
    }
    int64_t v = 0;
    while (i < len && text[i] >= '0' && text[i] <= '9') {
      v = v * 10 + (text[i] - '0');
      if (v > INT32_MAX) return -1;  // would truncate in the int32 output
      ++i;
    }
    if (i < len) {
      const char t = text[i];
      if (t != ' ' && t != '\t' && t != '\r' && t != '\n' && t != '\f' &&
          t != '\v')
        return -1;
    }
    if (fill) out[count] = static_cast<int32_t>(neg ? -v : v);
    ++count;
  }
  // Trailing line without newline still counts as a line.
  ++line;
  if (fill && line_starts) line_starts[line] = count;
  if (n_lines) *n_lines = line;
  return count;
}

}  // extern "C"
