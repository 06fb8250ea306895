// Native host-side IO/preprocessing for patchwork_tpu.
//
// TPU-native equivalent of the reference's C++ runtime layer: the compute
// path lives on the TPU (JAX/XLA), but ingest hot loops — point-record
// extraction from serialized messages, KITTI bin loading with validity
// masking, and the host-side voxel-grid downsample (reference
// PointCloudProcessor::voxelGridFilter, point_cloud_processor.cpp:150-196,
// re-done with an open-addressing hash instead of std::string keys) — run
// natively and hand SoA float32 buffers straight to the device.
//
// Exposed as a plain C ABI consumed via ctypes (patchwork_tpu/io/native.py).
// Build: native/build.sh (g++ -O3 -march=native -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Strided xyz extraction from a packed point-record blob (PointCloud2
// data payload): out is (n, 3) float32 row-major.  Returns points written.
int64_t pw_extract_xyz(const uint8_t* data, int64_t n, int32_t point_step,
                       int32_t off_x, int32_t off_y, int32_t off_z,
                       float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* rec = data + i * point_step;
    float x, y, z;
    std::memcpy(&x, rec + off_x, 4);
    std::memcpy(&y, rec + off_y, 4);
    std::memcpy(&z, rec + off_z, 4);
    out[i * 3 + 0] = x;
    out[i * 3 + 1] = y;
    out[i * 3 + 2] = z;
  }
  return n;
}

// KITTI velodyne .bin loader: float32 (x,y,z,intensity) records.  Fills a
// fixed-capacity (cap, 3) buffer + validity mask (finite rows only) in one
// pass.  Returns the number of records read, or -1 on IO error.
int64_t pw_load_kitti_bin(const char* path, float* out_xyz, uint8_t* out_valid,
                          int64_t cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<float> rec(4096 * 4);
  int64_t count = 0;
  size_t got;
  while ((got = std::fread(rec.data(), sizeof(float), rec.size(), f)) > 0) {
    int64_t recs = static_cast<int64_t>(got) / 4;
    for (int64_t i = 0; i < recs && count < cap; ++i, ++count) {
      float x = rec[i * 4], y = rec[i * 4 + 1], z = rec[i * 4 + 2];
      out_xyz[count * 3 + 0] = x;
      out_xyz[count * 3 + 1] = y;
      out_xyz[count * 3 + 2] = z;
      out_valid[count] = std::isfinite(x) && std::isfinite(y) && std::isfinite(z);
    }
    if (count >= cap) break;
  }
  std::fclose(f);
  return count;
}

// Open-addressing voxel hash map for the host-side centroid downsample.
struct VoxelSlot {
  int64_t key;   // packed voxel coord, -1 = empty
  float sx, sy, sz;
  int32_t cnt;
};

static inline int64_t pack_voxel(int32_t vx, int32_t vy, int32_t vz) {
  // 21 bits per axis, offset to non-negative
  const int64_t off = 1 << 20;
  return (((int64_t)(vx + off)) << 42) | (((int64_t)(vy + off)) << 21) |
         ((int64_t)(vz + off));
}

// Voxel-grid centroid filter.  out_xyz must hold n rows.  Returns the
// number of occupied voxels (centroids written).
int64_t pw_voxel_downsample(const float* xyz, int64_t n, float voxel_size,
                            float* out_xyz) {
  if (n <= 0 || voxel_size <= 0) return 0;
  size_t slots = 1;
  while (slots < static_cast<size_t>(n) * 2) slots <<= 1;
  std::vector<VoxelSlot> table(slots);
  for (auto& s : table) s.key = -1;
  const float inv = 1.0f / voxel_size;
  const size_t mask = slots - 1;

  for (int64_t i = 0; i < n; ++i) {
    float x = xyz[i * 3], y = xyz[i * 3 + 1], z = xyz[i * 3 + 2];
    int32_t vx = (int32_t)std::floor(x * inv);
    int32_t vy = (int32_t)std::floor(y * inv);
    int32_t vz = (int32_t)std::floor(z * inv);
    int64_t key = pack_voxel(vx, vy, vz);
    size_t h = (size_t)(key * 0x9E3779B97F4A7C15ULL) & mask;
    while (true) {
      VoxelSlot& s = table[h];
      if (s.key == key) {
        s.sx += x; s.sy += y; s.sz += z; s.cnt += 1;
        break;
      }
      if (s.key == -1) {
        s.key = key; s.sx = x; s.sy = y; s.sz = z; s.cnt = 1;
        break;
      }
      h = (h + 1) & mask;
    }
  }
  int64_t out = 0;
  for (const auto& s : table) {
    if (s.key != -1) {
      out_xyz[out * 3 + 0] = s.sx / s.cnt;
      out_xyz[out * 3 + 1] = s.sy / s.cnt;
      out_xyz[out * 3 + 2] = s.sz / s.cnt;
      ++out;
    }
  }
  return out;
}

}  // extern "C"
