// Shim: maps the subset of <boost/thread.hpp> used by the reference's
// open_karto (boost::shared_mutex / shared_lock / unique_lock,
// reference Karto.h:37,5195,5245-5343) onto C++17 std primitives, so the
// reference library can be compiled for golden-parity testing on a machine
// without Boost. Semantics are identical: a reader-writer lock.
#pragma once
#include <shared_mutex>
#include <mutex>

namespace boost
{
using shared_mutex = std::shared_mutex;
template <class M> using shared_lock = std::shared_lock<M>;
template <class M> using unique_lock = std::unique_lock<M>;
} // namespace boost
