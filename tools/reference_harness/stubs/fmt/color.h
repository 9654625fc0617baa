#pragma once
namespace fmt {
enum class color {
  blue, red, green, purple, cyan, crimson, lawn_green, yellow, orange, white,
};
struct text_style {};
inline text_style fg(color) { return {}; }
template <typename T>
inline T styled(T v, text_style) { return v; }
}  // namespace fmt
