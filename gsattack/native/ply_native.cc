// Native PLY vertex-table codec for gsattack.
//
// The reference stack leans on native code for its data plane (CUDA
// rasterizer, simple_knn C++, plyfile's C-backed numpy); here the
// TPU-native framework keeps its hot host-side IO native too: production
// 3DGS scenes are millions of points x 62 float attributes, and the
// row-major on-disk table must be transposed into column arrays on load
// and back on save. This module does mmap'd, OpenMP-parallel
// (de)interleaving, exposed through ctypes (gsattack/native/__init__.py)
// with a pure-numpy fallback when the shared library is absent.
//
// Layout contract (matches gsattack/io/ply.py): binary_little_endian 1.0,
// a single all-float32 "vertex" element. The Python side parses the
// header and passes (data_offset, n_rows, n_cols).

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Transpose the row-major float32 table at `path` (starting at
// data_offset) into `out` as column-major (n_cols arrays of n_rows).
// Returns 0 on success, negative errno-style codes on failure.
int gsattack_ply_read_columns(const char *path, int64_t data_offset,
                              int64_t n_rows, int64_t n_cols, float *out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -2;
  }
  int64_t need = data_offset + n_rows * n_cols * (int64_t)sizeof(float);
  if (st.st_size < need) {
    close(fd);
    return -3;
  }
  void *map = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return -4;
  const float *rows =
      reinterpret_cast<const float *>(static_cast<const char *>(map) + data_offset);

#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < n_cols; ++c) {
    float *dst = out + c * n_rows;
    const float *src = rows + c;
    for (int64_t r = 0; r < n_rows; ++r) {
      dst[r] = src[r * n_cols];
    }
  }
  munmap(map, (size_t)st.st_size);
  return 0;
}

// Interleave n_cols column arrays (each n_rows float32) into the
// row-major buffer `out` (n_rows * n_cols floats).
int gsattack_ply_interleave(const float *const *cols, int64_t n_rows,
                            int64_t n_cols, float *out) {
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < n_cols; ++c) {
    const float *src = cols[c];
    float *dst = out + c;
    for (int64_t r = 0; r < n_rows; ++r) {
      dst[r * n_cols] = src[r];
    }
  }
  return 0;
}

int gsattack_native_version() { return 1; }

}  // extern "C"
