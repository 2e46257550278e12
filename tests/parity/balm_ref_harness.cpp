// Parity oracle: runs the REFERENCE BALM2 solver on inputs produced by
// balm_tpu, so trajectories and residual traces can be compared directly.
//
// The reference code is #included from its read-only mount
// (/root/reference) at build time — nothing is copied into this repo.
// Minimal PCL/ROS stand-ins live in ./stubs (see headers there).
//
// Input (binary, little-endian):
//   int64 W, double voxel_size, int64 layer_limit,
//   double eigen_ratio[3], int64 min_ps, int64 max_iters
//   W x { double R[9] (row-major), double t[3] }
//   W x { int64 n_i, n_i x double xyz[3] }   (body-frame points)
// Output: refined poses W x { double R[9], double t[3] } to argv[2];
// the reference's per-iteration printf trace goes to stdout.
//
// Build (see test_reference_parity.py):
//   g++ -O2 -std=c++14 -pthread -I stubs -I <eigen> \
//       -I /root/reference/include -I /root/reference/src/benchmark \
//       balm_ref_harness.cpp -o balm_ref_harness

#include <ros/ros.h>

#include <Eigen/Dense>  // PCL would normally pull this in for tools.hpp

#include <cstdint>
#include <cstdio>
#include <fstream>
#include <vector>

#include "bavoxel.hpp"  // from /root/reference/src/benchmark (read-only)

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s input.bin output.bin\n", argv[0]);
    return 1;
  }
  std::ifstream in(argv[1], std::ios::binary);
  if (!in) {
    fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }
  auto rd_i64 = [&]() {
    int64_t v;
    in.read(reinterpret_cast<char*>(&v), 8);
    return v;
  };
  auto rd_f64 = [&]() {
    double v;
    in.read(reinterpret_cast<char*>(&v), 8);
    return v;
  };

  int64_t W = rd_i64();
  voxel_size = rd_f64();
  layer_limit = static_cast<int>(rd_i64());
  for (int k = 0; k < 3; ++k) eigen_value_array[k] = rd_f64();
  min_ps = static_cast<int>(rd_i64());
  int64_t max_iters = rd_i64();
  (void)max_iters;  // the reference loop is fixed at 10 (bavoxel.hpp:1104)
  win_size = static_cast<int>(W);

  std::vector<IMUST> x_buf(W);
  for (int64_t i = 0; i < W; ++i) {
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) x_buf[i].R(r, c) = rd_f64();
    for (int r = 0; r < 3; ++r) x_buf[i].p(r) = rd_f64();
  }

  auto t0 = ros::Time::now().toSec();
  std::unordered_map<VOXEL_LOC, OCTO_TREE_ROOT*> surf_map;
  for (int64_t i = 0; i < W; ++i) {
    int64_t n = rd_i64();
    pcl::PointCloud<PointType> pl;
    pl.reserve(n);
    for (int64_t k = 0; k < n; ++k) {
      PointType p;
      p.x = static_cast<float>(rd_f64());
      p.y = static_cast<float>(rd_f64());
      p.z = static_cast<float>(rd_f64());
      pl.push_back(p);
    }
    cut_voxel(surf_map, pl, x_buf[i], static_cast<int>(i));
  }

  VOX_HESS voxhess;
  for (auto it = surf_map.begin(); it != surf_map.end(); ++it) {
    it->second->recut(win_size);
    it->second->tras_opt(voxhess, win_size);
  }
  fprintf(stderr, "planes: %zu\n", voxhess.plvec_voxels.size());
  auto t1 = ros::Time::now().toSec();
  fprintf(stderr, "t_assoc: %.4f\n", t1 - t0);

  BALM2 opt;
  opt.damping_iter(x_buf, voxhess);
  auto t2 = ros::Time::now().toSec();
  fprintf(stderr, "t_solve: %.4f\n", t2 - t1);

  std::ofstream out(argv[2], std::ios::binary);
  for (int64_t i = 0; i < W; ++i) {
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double v = x_buf[i].R(r, c);
        out.write(reinterpret_cast<const char*>(&v), 8);
      }
    for (int r = 0; r < 3; ++r) {
      double v = x_buf[i].p(r);
      out.write(reinterpret_cast<const char*>(&v), 8);
    }
  }
  return 0;
}
