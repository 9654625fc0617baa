// Serial stand-in for BS::thread_pool (the reference's only dependency used
// for parallelism, simulation.cpp:721/740-746). detach_loop runs the loop
// body inline; trial_results indexing and statistics are order-independent
// in the reference, so serial execution is behaviourally identical and
// deterministic.
#pragma once
#include <cstddef>

namespace BS {

class thread_pool {
 public:
  explicit thread_pool(std::size_t = 0) {}

  template <typename T1, typename T2, typename F>
  void detach_loop(T1 first, T2 after_last, F&& body,
                   std::size_t /*num_blocks*/ = 0) {
    for (T1 i = first; static_cast<T2>(i) < after_last; ++i) body(i);
  }

  void wait() {}
};

}  // namespace BS
