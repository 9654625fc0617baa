// Alias-only stub: the reference's config.hpp declares `using json =
// nlohmann::json;` but the harness never compiles config.cpp.
#pragma once
namespace nlohmann { class json {}; }
