// Mini-fmt: a small, faithful subset of libfmt for building the reference
// core without the real dependency. Implements the format specs the
// reference actually uses — "{}", "{:L}", "{:.N}", "{:.Nf}", "{:.NLf}" —
// including locale-aware formatting (fmt::format(std::locale, ...) with the
// reference's comma-decimal numpunct), so the compiled reference
// simulation/CSV layer produces its real output for A/B tests. Default
// double formatting is shortest-round-trip via std::to_chars, matching
// fmt's behaviour on the value ranges the reference emits.
#pragma once
#include <charconv>
#include <cstdio>
#include <cstdint>
#include <iterator>  // the reference sources rely on fmt pulling this in
#include <locale>
#include <string>
#include <type_traits>
#include <vector>

namespace fmt {
namespace detail {

struct field {
  enum kind_t { k_int, k_uint, k_dbl, k_str } kind;
  long long i{};
  unsigned long long u{};
  double d{};
  std::string s{};
};

inline void push_fields(std::vector<field>&) {}

template <typename T, typename... Rest>
inline void push_fields(std::vector<field>& out, T&& v, Rest&&... rest) {
  using U = std::decay_t<T>;
  field f;
  if constexpr (std::is_same_v<U, bool>) {
    f.kind = field::k_str;
    f.s = v ? "true" : "false";
  } else if constexpr (std::is_floating_point_v<U>) {
    f.kind = field::k_dbl;
    f.d = static_cast<double>(v);
  } else if constexpr (std::is_integral_v<U> && std::is_signed_v<U>) {
    f.kind = field::k_int;
    f.i = static_cast<long long>(v);
  } else if constexpr (std::is_integral_v<U>) {
    f.kind = field::k_uint;
    f.u = static_cast<unsigned long long>(v);
  } else if constexpr (std::is_convertible_v<U, std::string>) {
    f.kind = field::k_str;
    f.s = std::string(v);
  } else {
    f.kind = field::k_str;
    f.s = "?";
  }
  out.push_back(std::move(f));
  push_fields(out, static_cast<Rest&&>(rest)...);
}

inline std::string shortest_double(double v) {
  char buf[64];
  auto res = std::to_chars(buf, buf + sizeof(buf), v);
  return std::string(buf, res.ptr);
}

inline std::string render(const field& f, int prec, char type, bool localized,
                          const std::locale* loc) {
  std::string out;
  switch (f.kind) {
    case field::k_int:
      out = std::to_string(f.i);
      break;
    case field::k_uint:
      out = std::to_string(f.u);
      break;
    case field::k_str:
      out = f.s;
      break;
    case field::k_dbl: {
      char buf[512];
      if (type == 'f' || type == 'e' || type == 'g') {
        char spec[16];
        std::snprintf(spec, sizeof(spec), "%%.%d%c", prec < 0 ? 6 : prec,
                      type);
        std::snprintf(buf, sizeof(buf), spec, f.d);
        out = buf;
      } else if (prec >= 0) {  // "{:.4}" — general with max significance
        char spec[16];
        std::snprintf(spec, sizeof(spec), "%%.%dg", prec);
        std::snprintf(buf, sizeof(buf), spec, f.d);
        out = buf;
      } else {
        out = shortest_double(f.d);
      }
      break;
    }
  }
  if (localized && loc != nullptr) {
    const char point = std::use_facet<std::numpunct<char>>(*loc).decimal_point();
    for (char& c : out)
      if (c == '.') c = point;
  }
  return out;
}

inline std::string vformat(const std::locale* loc, const std::string& f,
                           const std::vector<field>& args) {
  std::string out;
  out.reserve(f.size() + args.size() * 8);
  size_t next = 0;
  for (size_t i = 0; i < f.size(); ++i) {
    const char c = f[i];
    if (c == '{' && i + 1 < f.size() && f[i + 1] == '{') {
      out += '{';
      ++i;
      continue;
    }
    if (c == '}' && i + 1 < f.size() && f[i + 1] == '}') {
      out += '}';
      ++i;
      continue;
    }
    if (c != '{') {
      out += c;
      continue;
    }
    // Parse a replacement field up to '}'.
    int prec = -1;
    char type = 0;
    bool localized = false;
    ++i;
    for (; i < f.size() && f[i] != '}'; ++i) {
      const char s = f[i];
      if (s == '.') {
        prec = 0;
        while (i + 1 < f.size() && f[i + 1] >= '0' && f[i + 1] <= '9') {
          prec = prec * 10 + (f[++i] - '0');
        }
      } else if (s == 'L') {
        localized = true;
      } else if (s == 'f' || s == 'e' || s == 'g') {
        type = s;
      }
      // ':' and anything else (fill/align/width — unused) are skipped.
    }
    if (next < args.size())
      out += render(args[next++], prec, type, localized, loc);
  }
  return out;
}

}  // namespace detail

template <typename... T>
inline std::string format(const std::string& f, T&&... args) {
  std::vector<detail::field> fields;
  detail::push_fields(fields, static_cast<T&&>(args)...);
  return detail::vformat(nullptr, f, fields);
}

template <typename... T>
inline std::string format(const std::locale& loc, const std::string& f,
                          T&&... args) {
  std::vector<detail::field> fields;
  detail::push_fields(fields, static_cast<T&&>(args)...);
  return detail::vformat(&loc, f, fields);
}

template <typename... T>
inline void print(const char* f, T&&... args) {
  std::fputs(format(std::string(f), static_cast<T&&>(args)...).c_str(),
             stdout);
}

template <typename... T>
inline void print(const std::string& f, T&&... args) {
  std::fputs(format(f, static_cast<T&&>(args)...).c_str(), stdout);
}

// Styled variants (style comes from the color.h stub; rendering drops it).
template <typename Style, typename... T>
inline void print(Style, const char* f, T&&... args) {
  std::fputs(format(std::string(f), static_cast<T&&>(args)...).c_str(),
             stdout);
}

template <typename Style, typename... T>
inline void print(std::FILE* fp, Style, const char* f, T&&... args) {
  std::fputs(format(std::string(f), static_cast<T&&>(args)...).c_str(), fp);
}

}  // namespace fmt
