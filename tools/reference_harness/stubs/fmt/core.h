// Minimal fmt stub for building the reference decoder core without the real
// fmt library (only tracing/error-message call sites reach it; traces are
// disabled in harness runs and error messages lose argument interpolation).
#pragma once
#include <string>
#include <iterator>
#include <cstdio>
namespace fmt {
template <typename... T>
inline std::string format(const std::string &f, T &&...) { return f; }
template <typename... T>
inline void print(T &&...) {}
}  // namespace fmt
