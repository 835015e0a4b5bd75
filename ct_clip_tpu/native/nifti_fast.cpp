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

// ---------------------------------------------------------------------------
// Indexed multi-member gzip ("CT" FEXTRA subfield).
//
// A single-member gzip stream cannot be inflated in parallel (each deflate
// block depends on the 32 KB window before it; even pigz decompresses
// serially).  For corpora prepared with `nifti_recompress`, the file is
// written as concatenated gzip members of `chunk` uncompressed bytes, each
// carrying an FEXTRA subfield SI1='C' SI2='T' LEN=4 with the member's TOTAL
// compressed byte count — so a reader can hop header-to-header without
// inflating, build the member table from the headers + per-member ISIZE
// trailers, and inflate all members concurrently.  (Same design as htslib's
// BGZF "BC" subfield, generalised to MB-scale chunks.)
// ---------------------------------------------------------------------------

struct GzMember {
  size_t offset;   // byte offset of the member in the file
  size_t csize;    // total compressed bytes (header + deflate + trailer)
  size_t usize;    // uncompressed bytes (ISIZE; exact for members < 4 GB)
};

bool read_file(const char* path, std::vector<uint8_t>& data);

// Parse one member header at data+off; if it carries the CT subfield,
// fill *m (usize from the trailer) and return true.
bool parse_ct_member(const uint8_t* data, size_t len, size_t off,
                     GzMember* m) {
  if (off + 20 > len) return false;
  const uint8_t* p = data + off;
  if (p[0] != 0x1f || p[1] != 0x8b || p[2] != 8) return false;
  if (!(p[3] & 4)) return false;  // no FEXTRA
  uint16_t xlen;
  std::memcpy(&xlen, p + 10, 2);
  size_t xend = off + 12 + xlen;
  if (xend > len) return false;
  size_t q = off + 12;
  while (q + 4 <= xend) {
    uint16_t sublen;
    std::memcpy(&sublen, data + q + 2, 2);
    if (data[q] == 'C' && data[q + 1] == 'T' && sublen == 4) {
      uint32_t csize;
      std::memcpy(&csize, data + q + 4, 4);
      if (csize < 20 || off + csize > len) return false;
      uint32_t isize;
      std::memcpy(&isize, data + off + csize - 4, 4);
      m->offset = off;
      m->csize = csize;
      m->usize = isize;
      return true;
    }
    q += 4 + sublen;
  }
  return false;
}

// Build the member table; empty result means "not an indexed file".
std::vector<GzMember> index_members(const uint8_t* data, size_t len) {
  std::vector<GzMember> members;
  size_t off = 0;
  while (off < len) {
    GzMember m;
    if (!parse_ct_member(data, len, off, &m)) return {};
    members.push_back(m);
    off += m.csize;
  }
  return members;
}

bool inflate_span(const uint8_t* src, size_t csize, uint8_t* dst,
                  size_t usize) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = (uInt)csize;
  zs.next_out = dst;
  zs.avail_out = (uInt)usize;
  int ret = inflate(&zs, Z_FINISH);
  bool ok = (ret == Z_STREAM_END && zs.avail_out == 0);
  inflateEnd(&zs);
  return ok;
}

// Parallel inflate of an indexed file into out (size = sum of usize).
bool gunzip_indexed(const uint8_t* data, size_t len,
                    const std::vector<GzMember>& members, uint8_t* out,
                    int threads) {
  std::vector<size_t> out_off(members.size());
  size_t total = 0;
  for (size_t i = 0; i < members.size(); i++) {
    out_off[i] = total;
    total += members[i].usize;
  }
  std::atomic<int32_t> next(0);
  std::atomic<bool> ok(true);
  auto worker = [&]() {
    while (ok.load(std::memory_order_relaxed)) {
      int32_t i = next.fetch_add(1);
      if ((size_t)i >= members.size()) break;
      const GzMember& m = members[i];
      if (!inflate_span(data + m.offset, m.csize, out + out_off[i], m.usize))
        ok.store(false);
    }
  };
  int nt = threads > 1 ? threads : 1;
  if ((size_t)nt > members.size()) nt = (int)members.size();
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; t++) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return ok.load();
}

size_t members_total_usize(const std::vector<GzMember>& members) {
  size_t total = 0;
  for (const auto& m : members) total += m.usize;
  return total;
}

// Inflate a gzip stream (or pass through raw bytes).  `threads` bounds the
// intra-file parallelism — only indexed multi-member files can use >1.
// `max_bytes >= 0` stops once that many decompressed bytes are available
// (header probes need 352 bytes, not the whole 150 MB volume).
bool maybe_gunzip(std::vector<uint8_t>& data, int threads,
                  int64_t max_bytes = -1) {
  if (data.size() < 2 || data[0] != 0x1f || data[1] != 0x8b) return true;
  {  // indexed multi-member file: exact output size known up front
    auto members = index_members(data.data(), data.size());
    if (!members.empty()) {
      if (max_bytes >= 0) {  // prefix read: inflate only the needed members
        size_t need = (size_t)max_bytes, have = 0;
        std::vector<GzMember> prefix;
        for (const auto& m : members) {
          prefix.push_back(m);
          have += m.usize;
          if (have >= need) break;
        }
        std::vector<uint8_t> out(have);
        if (!gunzip_indexed(data.data(), data.size(), prefix, out.data(),
                            threads))
          return false;
        data = std::move(out);
        return true;
      }
      std::vector<uint8_t> out(members_total_usize(members));
      if (!gunzip_indexed(data.data(), data.size(), members, out.data(),
                          threads))
        return false;
      data = std::move(out);
      return true;
    }
  }
  if (max_bytes < 0 && data.size() >= 20) {
    // single-member gzip sized by its ISIZE trailer: one Z_FINISH inflate
    // straight into the output (zlib's single-shot path skips sliding-window
    // maintenance — measured ~3x the chunked Z_NO_FLUSH loop below)
    uint32_t isize;
    std::memcpy(&isize, data.data() + data.size() - 4, 4);
    // a corrupt trailer must not drive a multi-GB alloc: DEFLATE expands at
    // most ~1032x, so anything past that is garbage -> chunked loop below
    if (isize > 0 && (uint64_t)isize <= 1100ull * data.size() + 4096) {
      std::vector<uint8_t> out(isize);
      z_stream zs;
      std::memset(&zs, 0, sizeof(zs));
      if (inflateInit2(&zs, 16 + MAX_WBITS) == Z_OK) {
        zs.next_in = data.data();
        zs.avail_in = (uInt)data.size();
        zs.next_out = out.data();
        zs.avail_out = (uInt)isize;
        int ret = inflate(&zs, Z_FINISH);
        bool done = (ret == Z_STREAM_END && zs.avail_in == 0 &&
                     zs.avail_out == 0);
        inflateEnd(&zs);
        if (done) {
          data = std::move(out);
          return true;
        }
        // wrong ISIZE or concatenated members: chunked loop below
      }
    }
  }
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
    if (max_bytes >= 0 && (int64_t)out.size() >= max_bytes) break;
  }
  inflateEnd(&zs);
  data = std::move(out);
  return true;
}

// ---------------------------------------------------------------------------
// Recompression: plain .nii/.nii.gz -> indexed multi-member gzip.
// Members are compressed concurrently (raw deflate + hand-built gzip
// framing), so both directions of the format are parallel.
// ---------------------------------------------------------------------------

constexpr size_t kMemberHeader = 20;  // 10 fixed + XLEN(2) + "CT" subfield(8)
constexpr size_t kMemberTrailer = 8;  // CRC32 + ISIZE

// Compress one chunk into a self-describing gzip member.
bool deflate_member(const uint8_t* src, size_t usize, int level,
                    std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  // raw deflate: we write the gzip framing ourselves (header needs csize)
  if (deflateInit2(&zs, level, Z_DEFLATED, -MAX_WBITS, 8,
                   Z_DEFAULT_STRATEGY) != Z_OK)
    return false;
  size_t bound = deflateBound(&zs, (uLong)usize);
  out.resize(kMemberHeader + bound + kMemberTrailer);
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = (uInt)usize;
  zs.next_out = out.data() + kMemberHeader;
  zs.avail_out = (uInt)bound;
  int ret = deflate(&zs, Z_FINISH);
  size_t dsize = zs.total_out;
  deflateEnd(&zs);
  if (ret != Z_STREAM_END) return false;

  size_t csize = kMemberHeader + dsize + kMemberTrailer;
  if (csize > 0xffffffffu) return false;  // FEXTRA field is u32
  uint8_t* h = out.data();
  const uint8_t fixed[12] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff, 8, 0};
  std::memcpy(h, fixed, 12);  // FLG=FEXTRA, mtime 0, OS unknown, XLEN=8
  h[12] = 'C'; h[13] = 'T'; h[14] = 4; h[15] = 0;
  uint32_t c32 = (uint32_t)csize;
  std::memcpy(h + 16, &c32, 4);
  uint32_t crc = crc32(0, src, (uInt)usize);
  uint32_t is32 = (uint32_t)usize;
  std::memcpy(out.data() + kMemberHeader + dsize, &crc, 4);
  std::memcpy(out.data() + kMemberHeader + dsize + 4, &is32, 4);
  out.resize(csize);
  return true;
}

int64_t recompress_impl(const char* src_path, const char* dst_path,
                        int64_t chunk, int level, int threads) {
  std::vector<uint8_t> data;
  if (!read_file(src_path, data)) return -1;
  if (!maybe_gunzip(data, threads)) return -2;
  if (chunk <= 0) chunk = 4 << 20;
  size_t n = (data.size() + chunk - 1) / chunk;
  if (n == 0) n = 1;
  std::vector<std::vector<uint8_t>> members(n);
  std::atomic<int32_t> next(0);
  std::atomic<bool> ok(true);
  auto worker = [&]() {
    while (ok.load(std::memory_order_relaxed)) {
      int32_t i = next.fetch_add(1);
      if ((size_t)i >= n) break;
      size_t off = (size_t)i * chunk;
      size_t usize = std::min((size_t)chunk, data.size() - off);
      if (!deflate_member(data.data() + off, usize, level, members[i]))
        ok.store(false);
    }
  };
  int nt = threads > 1 ? threads : 1;
  if ((size_t)nt > n) nt = (int)n;
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; t++) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  if (!ok.load()) return -3;
  FILE* f = std::fopen(dst_path, "wb");
  if (!f) return -4;
  for (const auto& m : members) {
    if (std::fwrite(m.data(), 1, m.size(), f) != m.size()) {
      std::fclose(f);
      return -5;
    }
  }
  std::fclose(f);
  return (int64_t)data.size();
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
                  int32_t* shape_out, float* meta_out, bool decode,
                  int threads) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return -1;
  // Probes only need the 348-byte header (+4 ext flag): on indexed files the
  // prefix read inflates one member instead of the whole 150 MB volume.
  int64_t max_bytes = decode ? -1 : (int64_t)(kHeaderSize + 4);
  if (!maybe_gunzip(data, threads, max_bytes)) return -2;
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

// ---------------------------------------------------------------------------
// Raw-bytes API: gunzip (or pass through) a whole file without NIfTI decode.
// Backs the zero-copy int16/zyx loader path (data/nifti._read_bytes), which
// ships stored voxel ints to the TPU and never materialises f32 on host.
// ---------------------------------------------------------------------------

int64_t gunzip_probe_impl(const char* path) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return -1;
  if (data.size() < 20 || data[0] != 0x1f || data[1] != 0x8b)
    return (int64_t)data.size();  // not gzip: raw byte count
  auto members = index_members(data.data(), data.size());
  if (!members.empty()) return (int64_t)members_total_usize(members);
  // single-member gzip: ISIZE trailer is exact below 4 GB (CT volumes are
  // well under); multi-member non-indexed files are not produced by any
  // writer we read — the caller falls back on a short-capacity error.
  // Bound against corrupt trailers (DEFLATE expands at most ~1032x) so the
  // caller never allocates a multi-GB buffer for garbage.
  uint32_t isize;
  std::memcpy(&isize, data.data() + data.size() - 4, 4);
  if ((uint64_t)isize > 1100ull * data.size() + 4096) return -3;
  return (int64_t)isize;
}

int64_t gunzip_read_impl(const char* path, uint8_t* out, int64_t capacity,
                         int threads) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return -1;
  if (data.size() < 20 || data[0] != 0x1f || data[1] != 0x8b) {
    if ((int64_t)data.size() > capacity) return -4;
    std::memcpy(out, data.data(), data.size());
    return (int64_t)data.size();
  }
  auto members = index_members(data.data(), data.size());
  if (!members.empty()) {  // parallel inflate straight into the caller buffer
    int64_t total = (int64_t)members_total_usize(members);
    if (total > capacity) return -4;
    if (!gunzip_indexed(data.data(), data.size(), members, out, threads))
      return -2;
    return total;
  }
  z_stream zs;  // serial inflate straight into the caller buffer
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return -2;
  zs.next_in = data.data();
  zs.avail_in = (uInt)data.size();
  zs.next_out = out;
  zs.avail_out = (uInt)capacity;
  // Z_FINISH with the whole output available: zlib's single-shot fast path
  // skips sliding-window maintenance — measured ~3x the Z_NO_FLUSH loop
  int ret = Z_OK;
  while (true) {
    ret = inflate(&zs, Z_FINISH);
    if (ret == Z_STREAM_END && zs.avail_in > 0) {
      // concatenated plain-gzip members: keep inflating the next one
      if (inflateReset2(&zs, 16 + MAX_WBITS) != Z_OK) break;
      continue;
    }
    if (ret != Z_OK) break;
  }
  int64_t got = (int64_t)zs.total_out;
  bool full = (ret == Z_STREAM_END);
  bool short_buf = (ret == Z_BUF_ERROR && zs.avail_out == 0);
  inflateEnd(&zs);
  if (short_buf) return -4;
  if (!full) return -2;
  return got;
}

}  // namespace

extern "C" {

// Decompressed byte count of a (possibly gzipped) file: member-table sum for
// indexed files (no inflate), ISIZE trailer for plain gzip, file size for
// uncompressed.  Negative = IO error.
int64_t gunzip_probe(const char* path) { return gunzip_probe_impl(path); }

// Gunzip the file into out (capacity bytes).  Indexed multi-member files
// inflate with up to `threads` workers; plain gzip is serial.  Returns bytes
// written, or negative error (-4 = capacity too small).
int64_t gunzip_read(const char* path, uint8_t* out, int64_t capacity,
                    int32_t threads) {
  return gunzip_read_impl(path, out, capacity, threads > 0 ? threads : 1);
}

int64_t nifti_probe(const char* path, int32_t* shape_out, float* meta_out) {
  return read_impl(path, nullptr, 0, shape_out, meta_out, false, 1);
}

int64_t nifti_read(const char* path, float* out, int64_t capacity,
                   int32_t* shape_out, float* meta_out) {
  return read_impl(path, out, capacity, shape_out, meta_out, true, 1);
}

// Like nifti_read, but inflates indexed multi-member files with up to
// `threads` concurrent workers (plain .gz stays serial — see maybe_gunzip).
int64_t nifti_read_par(const char* path, float* out, int64_t capacity,
                       int32_t* shape_out, float* meta_out, int32_t threads) {
  return read_impl(path, out, capacity, shape_out, meta_out, true,
                   threads > 0 ? threads : 1);
}

void nifti_read_batch(const char** paths, int32_t n, float** outs,
                      const int64_t* capacities, int32_t* shapes,
                      float* metas, int64_t* results, int32_t num_threads) {
  // Threads parallelise ACROSS volumes; when there are more threads than
  // volumes, the surplus goes INTO each volume's inflate (indexed files).
  int32_t outer = num_threads > 1 ? std::min(num_threads, n) : 1;
  int32_t inner = outer > 0 ? std::max(1, num_threads / outer) : 1;
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      results[i] = read_impl(paths[i], outs[i], capacities[i], shapes + 8 * i,
                             metas + 8 * i, true, inner);
    }
  };
  if (outer <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < outer; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Rewrite src (.nii or .nii.gz) as an indexed multi-member gzip at dst.
// Returns the uncompressed byte count, or a negative error code.
int64_t nifti_recompress(const char* src_path, const char* dst_path,
                         int64_t chunk, int32_t level, int32_t threads) {
  return recompress_impl(src_path, dst_path, chunk, level,
                         threads > 0 ? threads : 1);
}

}  // extern "C"
