// Native data-loading runtime for DiffMa-TPU.
//
// Replaces the reference's torch DataLoader worker pool (train.py:186-195,
// num_workers) with a C++ loader: .npy parsing, PIL-compatible separable
// triangle (bilinear) / nearest resampling, and a threaded prefetch pool,
// exposed through a C ABI consumed via ctypes (diffma_tpu/data/native.py).
//
// Build:  make -C native   (produces libdiffma_loader.so)
//
// The .npy format handled here is the v1/v2 subset numpy.save emits for
// contiguous little-endian f4/f8/u1 2-D arrays -- exactly what the SynthRAD
// 2-D slices are.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyArray {
  std::vector<float> data;
  int64_t h = 0, w = 0;
  bool ok = false;
};

// Minimal .npy reader (v1.0/v2.0 headers, C-order, little-endian).
NpyArray read_npy(const std::string& path) {
  NpyArray out;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return out;
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(f);
    return out;
  }
  uint32_t header_len = 0;
  if (magic[6] == 1) {
    uint16_t len16;
    if (std::fread(&len16, 2, 1, f) != 1) { std::fclose(f); return out; }
    header_len = len16;
  } else {
    if (std::fread(&header_len, 4, 1, f) != 1) { std::fclose(f); return out; }
  }
  std::string header(header_len, '\0');
  if (std::fread(header.data(), 1, header_len, f) != header_len) {
    std::fclose(f);
    return out;
  }
  auto find_val = [&](const char* key) -> std::string {
    auto pos = header.find(key);
    if (pos == std::string::npos) return "";
    pos = header.find(':', pos);
    auto end = header.find_first_of(",}", pos);
    return header.substr(pos + 1, end - pos - 1);
  };
  std::string descr = find_val("'descr'");
  bool fortran = find_val("'fortran_order'").find("True") != std::string::npos;
  auto spos = header.find("'shape'");
  auto p1 = header.find('(', spos), p2 = header.find(')', spos);
  std::string shape = header.substr(p1 + 1, p2 - p1 - 1);
  long dims[4] = {0, 0, 0, 0};
  int ndim = 0;
  {
    const char* s = shape.c_str();
    char* endp;
    while (ndim < 4) {
      long v = std::strtol(s, &endp, 10);
      if (endp == s) break;
      dims[ndim++] = v;
      s = endp;
      while (*s == ',' || *s == ' ') ++s;
    }
  }
  if (fortran || ndim < 1 || ndim > 2) { std::fclose(f); return out; }
  int64_t h = dims[0], w = ndim == 2 ? dims[1] : 1;
  int64_t n = h * w;
  out.data.resize(n);
  bool ok = false;
  if (descr.find("<f4") != std::string::npos) {
    ok = std::fread(out.data.data(), 4, n, f) == size_t(n);
  } else if (descr.find("<f8") != std::string::npos) {
    std::vector<double> tmp(n);
    ok = std::fread(tmp.data(), 8, n, f) == size_t(n);
    for (int64_t i = 0; i < n; ++i) out.data[i] = float(tmp[i]);
  } else if (descr.find("|u1") != std::string::npos) {
    std::vector<uint8_t> tmp(n);
    ok = std::fread(tmp.data(), 1, n, f) == size_t(n);
    for (int64_t i = 0; i < n; ++i) out.data[i] = float(tmp[i]);
  } else if (descr.find("<i4") != std::string::npos) {
    std::vector<int32_t> tmp(n);
    ok = std::fread(tmp.data(), 4, n, f) == size_t(n);
    for (int64_t i = 0; i < n; ++i) out.data[i] = float(tmp[i]);
  }
  std::fclose(f);
  out.h = h;
  out.w = w;
  out.ok = ok;
  return out;
}

// PIL-compatible separable resampling.  PIL's BILINEAR uses a triangle
// filter whose support scales with the downscale factor (area-correct);
// NEAREST maps destination centre -> floor of source coordinate.
void resize_triangle_1d(const float* src, float* dst, int64_t in_len,
                        int64_t out_len, int64_t stride_in, int64_t stride_out,
                        int64_t lines, int64_t line_stride_in,
                        int64_t line_stride_out) {
  const double scale = double(in_len) / double(out_len);
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle filter support
  const int ksize = int(std::ceil(support)) * 2 + 1;
  std::vector<double> weights(ksize);
  for (int64_t xx = 0; xx < out_len; ++xx) {
    const double center = (xx + 0.5) * scale;
    int64_t xmin = int64_t(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int64_t xmax = int64_t(center + support + 0.5);
    if (xmax > in_len) xmax = in_len;
    const int64_t n = xmax - xmin;
    double wsum = 0.0;
    for (int64_t i = 0; i < n; ++i) {
      double x = (xmin + i - center + 0.5) / filterscale;
      double wgt = x < 0 ? 1.0 + x : 1.0 - x;  // triangle
      if (wgt < 0) wgt = 0;
      weights[i] = wgt;
      wsum += wgt;
    }
    if (wsum != 0)
      for (int64_t i = 0; i < n; ++i) weights[i] /= wsum;
    for (int64_t line = 0; line < lines; ++line) {
      const float* s = src + line * line_stride_in;
      double acc = 0.0;
      for (int64_t i = 0; i < n; ++i)
        acc += double(s[(xmin + i) * stride_in]) * weights[i];
      dst[line * line_stride_out + xx * stride_out] = float(acc);
    }
  }
}

void resize_bilinear(const float* src, int64_t h, int64_t w, float* dst,
                     int64_t oh, int64_t ow) {
  // horizontal pass then vertical pass (PIL does the same two-pass scheme)
  std::vector<float> tmp(h * ow);
  resize_triangle_1d(src, tmp.data(), w, ow, 1, 1, h, w, ow);
  resize_triangle_1d(tmp.data(), dst, h, oh, ow, ow, ow, 1, 1);
}

void resize_nearest(const float* src, int64_t h, int64_t w, float* dst,
                    int64_t oh, int64_t ow) {
  // PIL NEAREST: destination pixel centres map into the source grid.
  for (int64_t y = 0; y < oh; ++y) {
    int64_t sy = int64_t((double(y) + 0.5) * h / oh);
    if (sy >= h) sy = h - 1;
    for (int64_t x = 0; x < ow; ++x) {
      int64_t sx = int64_t((double(x) + 0.5) * w / ow);
      if (sx >= w) sx = w - 1;
      dst[y * ow + x] = src[sy * w + sx];
    }
  }
}

struct Task {
  std::string ct, mask, mri;
  float* out_ct;
  float* out_mask;
  float* out_mri;
};

}  // namespace

extern "C" {

// Load one (ct, mask, mri) triplet, resized to (size x size):
// ct bilinear, mask/mri nearest, mask remapped (m+1)/2 (load_data.py:37).
// Returns 0 on success.
int diffma_load_triplet(const char* ct_path, const char* mask_path,
                        const char* mri_path, int64_t size, float* out_ct,
                        float* out_mask, float* out_mri) {
  NpyArray ct = read_npy(ct_path);
  NpyArray mask = read_npy(mask_path);
  NpyArray mri = read_npy(mri_path);
  if (!ct.ok || !mask.ok || !mri.ok) return 1;
  resize_bilinear(ct.data.data(), ct.h, ct.w, out_ct, size, size);
  resize_nearest(mask.data.data(), mask.h, mask.w, out_mask, size, size);
  resize_nearest(mri.data.data(), mri.h, mri.w, out_mri, size, size);
  for (int64_t i = 0; i < size * size; ++i) out_mask[i] = (out_mask[i] + 1.f) / 2.f;
  return 0;
}

// Threaded batch load: paths are '\n'-joined triplet lists of equal length B.
// Outputs are (B, size, size) row-major buffers.  Returns count of failures.
int diffma_load_batch(const char* ct_paths, const char* mask_paths,
                      const char* mri_paths, int64_t batch, int64_t size,
                      int threads, float* out_ct, float* out_mask,
                      float* out_mri) {
  std::vector<std::string> cts, masks, mris;
  auto split = [](const char* s, std::vector<std::string>& v) {
    const char* p = s;
    while (*p) {
      const char* e = std::strchr(p, '\n');
      if (!e) { v.emplace_back(p); break; }
      v.emplace_back(p, e - p);
      p = e + 1;
    }
  };
  split(ct_paths, cts);
  split(mask_paths, masks);
  split(mri_paths, mris);
  if (int64_t(cts.size()) < batch || int64_t(masks.size()) < batch ||
      int64_t(mris.size()) < batch)
    return int(batch);

  std::atomic<int64_t> next{0};
  std::atomic<int> failures{0};
  const int64_t plane = size * size;
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= batch) return;
      int rc = diffma_load_triplet(
          cts[i].c_str(), masks[i].c_str(), mris[i].c_str(), size,
          out_ct + i * plane, out_mask + i * plane, out_mri + i * plane);
      if (rc) failures.fetch_add(1);
    }
  };
  int nt = threads > 0 ? threads : int(std::thread::hardware_concurrency());
  if (nt > batch) nt = int(batch);
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

int diffma_loader_version() { return 1; }

}  // extern "C"
