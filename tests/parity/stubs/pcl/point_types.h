// Minimal PCL stand-in so the REFERENCE headers (mounted read-only at
// /root/reference) compile for the parity oracle.  Only the surface the
// reference actually touches is provided; no PCL code is reproduced.
#pragma once
#include <cstddef>

namespace pcl {

struct PointXYZINormal {
  union {
    struct {
      float x, y, z, _pad;
    };
    float data[4];
  };
  float intensity = 0.f;
  float normal_x = 0.f, normal_y = 0.f, normal_z = 0.f;
  float curvature = 0.f;
  PointXYZINormal() : x(0.f), y(0.f), z(0.f), _pad(1.f) {}
};

struct PointXYZI {
  union {
    struct {
      float x, y, z, _pad;
    };
    float data[4];
  };
  float intensity = 0.f;
  PointXYZI() : x(0.f), y(0.f), z(0.f), _pad(1.f) {}
};

struct PointXYZ {
  union {
    struct {
      float x, y, z, _pad;
    };
    float data[4];
  };
  PointXYZ() : x(0.f), y(0.f), z(0.f), _pad(1.f) {}
};

}  // namespace pcl
