#pragma once
#include <cstdint>
#include <memory>
#include <vector>

#include "pcl/point_types.h"

namespace pcl {

template <typename PointT>
struct PointCloud {
  using Ptr = std::shared_ptr<PointCloud<PointT>>;
  std::vector<PointT> points;
  std::uint32_t width = 0, height = 1;

  std::size_t size() const { return points.size(); }
  void push_back(const PointT& p) { points.push_back(p); }
  void clear() { points.clear(); }
  void reserve(std::size_t n) { points.reserve(n); }
  void resize(std::size_t n) { points.resize(n); }
  void swap(PointCloud& o) { points.swap(o.points); }
  PointCloud& operator+=(const PointCloud& o) {
    points.insert(points.end(), o.points.begin(), o.points.end());
    return *this;
  }
  typename std::vector<PointT>::iterator begin() { return points.begin(); }
  typename std::vector<PointT>::iterator end() { return points.end(); }
  const PointT& operator[](std::size_t i) const { return points[i]; }
  PointT& operator[](std::size_t i) { return points[i]; }
};

}  // namespace pcl
