// g++ 12's libstdc++ has no <format>; the reference uses std::format only to
// build debug-log file paths (hnswalg_slim.h:2250,2337). Naive substitute:
// replace "{}" placeholders in order.
#pragma once
#include <sstream>
#include <string>

#if !defined(__cpp_lib_format)
namespace std {
inline void _fmt_one(string&) {}
template <typename T, typename... Rest>
inline void _fmt_one(string& s, T&& v, Rest&&... rest) {
  ostringstream os;
  os << v;
  const auto pos = s.find("{}");
  if (pos != string::npos) s.replace(pos, 2, os.str());
  _fmt_one(s, static_cast<Rest&&>(rest)...);
}
template <typename... Args>
inline string format(const string& fmt, Args&&... args) {
  string s = fmt;
  _fmt_one(s, static_cast<Args&&>(args)...);
  return s;
}
}  // namespace std
#endif
