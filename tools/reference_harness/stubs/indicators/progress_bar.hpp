// No-op progress bar matching the indicators API surface the reference's
// simulation.cpp uses (construction with option structs, set_option, tick).
#pragma once
#include <cstddef>
#include <string>
#include <vector>

namespace indicators {

enum class Color { grey, red, green, yellow, blue, magenta, cyan, white };
enum class FontStyle { bold, dark, italic, underline, blink, reverse,
                       concealed, crossed };

namespace option {
struct BarWidth { std::size_t v; };
struct Start { std::string v; };
struct Fill { std::string v; };
struct Lead { std::string v; };
struct Remainder { std::string v; };
struct End { std::string v; };
struct PrefixText { std::string v; };
struct PostfixText { std::string v; };
struct ForegroundColor { Color v; };
struct ShowElapsedTime { bool v; };
struct ShowRemainingTime { bool v; };
struct FontStyles { std::vector<FontStyle> v; };
struct MaxProgress { std::size_t v; };
}  // namespace option

class ProgressBar {
 public:
  template <typename... Opts>
  explicit ProgressBar(Opts&&...) {}
  template <typename Opt>
  void set_option(Opt&&) {}
  void tick() {}
  bool is_completed() const { return false; }
};

}  // namespace indicators
