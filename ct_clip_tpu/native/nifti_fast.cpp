// Fast NIfTI-1 reader: file -> gunzip -> header parse -> dtype decode ->
// f32 (+ header scl scaling), with a threaded batch API.
//
// This is the native data-loader backing ct_clip_tpu.data.nifti.read_volume:
// the reference spends seconds/volume in Python (nibabel + interpolation,
// SURVEY.md §3.1); host-side decode is the only part that must stay on CPU
// in the TPU design, so it is C++ with one thread per volume.
//
// Exposed C ABI (ctypes):
//   nifti_probe(path, shape_out[8], meta_out[8]) -> voxel count or -errno
//   nifti_read(path, out, capacity, shape_out[8], meta_out[8]) -> count
//   nifti_read_batch(paths, n, outs, capacities, shapes, metas, results,
//                    num_threads)
// meta_out: [pixdim_x, pixdim_y, pixdim_z, scl_slope, scl_inter, dtype_code]
//
// Build: make -C ct_clip_tpu/native   (produces libnifti_fast.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr int kHeaderSize = 348;

struct Header {
  int ndim;
  int64_t shape[7];
  int datatype;
  float pixdim[3];
  float scl_slope, scl_inter;
  int64_t vox_offset;
  bool swap;  // byte-swapped (big endian file on little endian host)
};

uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }

template <typename T>
T read_le(const uint8_t* p, bool swap);

template <>
int16_t read_le<int16_t>(const uint8_t* p, bool swap) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  if (swap) v = bswap16(v);
  int16_t out;
  std::memcpy(&out, &v, 2);
  return out;
}

template <>
int32_t read_le<int32_t>(const uint8_t* p, bool swap) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  if (swap) v = bswap32(v);
  int32_t out;
  std::memcpy(&out, &v, 4);
  return out;
}

template <>
float read_le<float>(const uint8_t* p, bool swap) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  if (swap) v = bswap32(v);
  float out;
  std::memcpy(&out, &v, 4);
  return out;
}

bool parse_header(const uint8_t* buf, size_t len, Header* h) {
  if (len < kHeaderSize) return false;
  int32_t sizeof_hdr = read_le<int32_t>(buf, false);
  bool swap = false;
  if (sizeof_hdr != kHeaderSize) {
    sizeof_hdr = read_le<int32_t>(buf, true);
    if (sizeof_hdr != kHeaderSize) return false;
    swap = true;
  }
  const uint8_t* magic = buf + 344;
  if (!((magic[0] == 'n' && (magic[1] == '+' || magic[1] == 'i')))) return false;

  h->swap = swap;
  h->ndim = read_le<int16_t>(buf + 40, swap);
  if (h->ndim < 1 || h->ndim > 7) return false;
  for (int i = 0; i < 7; i++)
    h->shape[i] = (i < h->ndim) ? read_le<int16_t>(buf + 42 + 2 * i, swap) : 1;
  h->datatype = read_le<int16_t>(buf + 70, swap);
  for (int i = 0; i < 3; i++)
    h->pixdim[i] = read_le<float>(buf + 80 + 4 * i, swap);  // pixdim[1..3]
  float vox = read_le<float>(buf + 108, swap);
  h->vox_offset = vox > 0 ? (int64_t)vox : kHeaderSize + 4;
  h->scl_slope = read_le<float>(buf + 112, swap);
  h->scl_inter = read_le<float>(buf + 116, swap);
  return true;
}

// Inflate a gzip stream (or pass through raw bytes).
bool maybe_gunzip(std::vector<uint8_t>& data) {
  if (data.size() < 2 || data[0] != 0x1f || data[1] != 0x8b) return true;
  std::vector<uint8_t> out;
  out.reserve(data.size() * 4);
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
  zs.next_in = data.data();
  zs.avail_in = (uInt)data.size();
  uint8_t chunk[1 << 18];
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = chunk;
    zs.avail_out = sizeof(chunk);
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), chunk, chunk + (sizeof(chunk) - zs.avail_out));
  }
  inflateEnd(&zs);
  data = std::move(out);
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>& data) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return false;
  }
  data.resize((size_t)size);
  size_t got = std::fread(data.data(), 1, (size_t)size, f);
  std::fclose(f);
  return got == (size_t)size;
}

template <typename T>
void decode_loop(const uint8_t* src, float* dst, int64_t n, bool swap,
                 float slope, float inter) {
  for (int64_t i = 0; i < n; i++) {
    T v = read_le<T>(src + i * sizeof(T), swap);
    dst[i] = (float)v * slope + inter;
  }
}

template <>
void decode_loop<uint8_t>(const uint8_t* src, float* dst, int64_t n, bool,
                          float slope, float inter) {
  for (int64_t i = 0; i < n; i++) dst[i] = (float)src[i] * slope + inter;
}

template <>
void decode_loop<int8_t>(const uint8_t* src, float* dst, int64_t n, bool,
                         float slope, float inter) {
  for (int64_t i = 0; i < n; i++) dst[i] = (float)(int8_t)src[i] * slope + inter;
}

void decode_u16(const uint8_t* src, float* dst, int64_t n, bool swap,
                float slope, float inter) {
  for (int64_t i = 0; i < n; i++) {
    uint16_t v;
    std::memcpy(&v, src + 2 * i, 2);
    if (swap) v = bswap16(v);
    dst[i] = (float)v * slope + inter;
  }
}

void decode_f64(const uint8_t* src, float* dst, int64_t n, bool swap,
                float slope, float inter) {
  for (int64_t i = 0; i < n; i++) {
    uint64_t v;
    std::memcpy(&v, src + 8 * i, 8);
    if (swap) v = __builtin_bswap64(v);
    double d;
    std::memcpy(&d, &v, 8);
    dst[i] = (float)d * slope + inter;
  }
}

int64_t read_impl(const char* path, float* out, int64_t capacity,
                  int32_t* shape_out, float* meta_out, bool decode) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return -1;
  if (!maybe_gunzip(data)) return -2;
  Header h;
  if (!parse_header(data.data(), data.size(), &h)) return -3;

  int64_t count = 1;
  for (int i = 0; i < h.ndim; i++) count *= h.shape[i];
  if (shape_out) {
    shape_out[0] = h.ndim;
    for (int i = 0; i < 7; i++) shape_out[1 + i] = (int32_t)h.shape[i];
  }
  float slope = (h.scl_slope != 0.0f && h.scl_slope == h.scl_slope)
                    ? h.scl_slope : 1.0f;
  float inter = (slope != 1.0f || h.scl_inter != 0.0f) ? h.scl_inter : 0.0f;
  if (h.scl_slope == 0.0f || h.scl_slope != h.scl_slope) inter = 0.0f;
  if (meta_out) {
    meta_out[0] = h.pixdim[0];
    meta_out[1] = h.pixdim[1];
    meta_out[2] = h.pixdim[2];
    meta_out[3] = slope;
    meta_out[4] = inter;
    meta_out[5] = (float)h.datatype;
  }
  if (!decode) return count;
  if (capacity < count) return -4;

  size_t elem = 0;
  switch (h.datatype) {
    case 2: elem = 1; break;    // uint8
    case 256: elem = 1; break;  // int8
    case 4: elem = 2; break;    // int16
    case 512: elem = 2; break;  // uint16
    case 8: elem = 4; break;    // int32
    case 16: elem = 4; break;   // float32
    case 64: elem = 8; break;   // float64
    default: return -5;
  }
  if (data.size() < (size_t)h.vox_offset + elem * (size_t)count) return -6;
  const uint8_t* src = data.data() + h.vox_offset;

  switch (h.datatype) {
    case 2: decode_loop<uint8_t>(src, out, count, h.swap, slope, inter); break;
    case 256: decode_loop<int8_t>(src, out, count, h.swap, slope, inter); break;
    case 4: decode_loop<int16_t>(src, out, count, h.swap, slope, inter); break;
    case 512: decode_u16(src, out, count, h.swap, slope, inter); break;
    case 8: decode_loop<int32_t>(src, out, count, h.swap, slope, inter); break;
    case 16: decode_loop<float>(src, out, count, h.swap, slope, inter); break;
    case 64: decode_f64(src, out, count, h.swap, slope, inter); break;
  }
  return count;
}

}  // namespace

extern "C" {

int64_t nifti_probe(const char* path, int32_t* shape_out, float* meta_out) {
  return read_impl(path, nullptr, 0, shape_out, meta_out, false);
}

int64_t nifti_read(const char* path, float* out, int64_t capacity,
                   int32_t* shape_out, float* meta_out) {
  return read_impl(path, out, capacity, shape_out, meta_out, true);
}

void nifti_read_batch(const char** paths, int32_t n, float** outs,
                      const int64_t* capacities, int32_t* shapes,
                      float* metas, int64_t* results, int32_t num_threads) {
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      results[i] = nifti_read(paths[i], outs[i], capacities[i],
                              shapes + 8 * i, metas + 8 * i);
    }
  };
  if (num_threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < num_threads; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
