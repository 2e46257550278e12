#pragma once
#include <chrono>

namespace ros {
struct Time {
  double t = 0.0;
  static Time now() {
    using clock = std::chrono::steady_clock;
    return Time{std::chrono::duration<double>(
                    clock::now().time_since_epoch())
                    .count()};
  }
  double toSec() const { return t; }
};
}  // namespace ros
