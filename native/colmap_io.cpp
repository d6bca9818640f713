// Native COLMAP binary-format parsers.
//
// The points3D.bin record layout is variable-length (each point carries a
// track list), which forces a per-record walk — a Python struct loop costs
// seconds-to-minutes on million-point reconstructions (the reference's
// colmap_loader.py:128-170 pays exactly this). This walker streams the
// buffer once at memory speed. Exposed through a tiny C ABI and loaded via
// ctypes (instascene_tpu/data/native.py); the Python fallback remains for
// environments without a compiler.
//
// Record: u64 id | 3*f64 xyz | 3*u8 rgb | f64 error
//         | u64 track_len | track_len * (i32 image_id, i32 point2d_idx)
//
// Build: g++ -O2 -shared -fPIC -o libcolmap_io.so colmap_io.cpp

#include <cstdint>
#include <cstring>

namespace {

template <typename T>
inline bool read_at(const unsigned char* buf, long long len, long long off,
                    T* out) {
  if (off < 0 || off + (long long)sizeof(T) > len) return false;
  std::memcpy(out, buf + off, sizeof(T));
  return true;
}

}  // namespace

extern "C" {

// Parse points3D.bin. xyz must hold n*3 doubles, rgb n*3 bytes, err n
// doubles, where n is the u64 count at the head of the buffer. Returns the
// number of points parsed, or -1 if the buffer is truncated/malformed.
long long points3d_parse(const unsigned char* buf, long long len,
                         double* xyz, unsigned char* rgb, double* err) {
  uint64_t n = 0;
  if (!read_at(buf, len, 0, &n)) return -1;
  long long off = 8;
  for (uint64_t i = 0; i < n; ++i) {
    // fixed part: id(8) xyz(24) rgb(3) error(8) = 43 bytes
    if (off + 43 > len) return -1;
    std::memcpy(&xyz[i * 3], buf + off + 8, 24);
    std::memcpy(&rgb[i * 3], buf + off + 32, 3);
    std::memcpy(&err[i], buf + off + 35, 8);
    uint64_t track_len = 0;
    if (!read_at(buf, len, off + 43, &track_len)) return -1;
    // a corrupt/hostile track_len can overflow the offset arithmetic to a
    // negative value that passes the next bounds check — reject anything
    // larger than the bytes actually remaining
    if (track_len > (uint64_t)(len - off - 51) / 8) return -1;
    off += 51 + (long long)track_len * 8;
    if (off < 0 || off > len) return -1;
  }
  return (long long)n;
}

// Parse the fixed-size prefix of every images.bin record into flat arrays
// (the name strings and 2D point lists are skipped — callers that need them
// use the Python path). Returns the image count or -1.
long long images_meta_parse(const unsigned char* buf, long long len,
                            int32_t* image_ids, double* qvecs, double* tvecs,
                            int32_t* camera_ids) {
  uint64_t n = 0;
  if (!read_at(buf, len, 0, &n)) return -1;
  long long off = 8;
  for (uint64_t i = 0; i < n; ++i) {
    if (off + 64 > len) return -1;
    std::memcpy(&image_ids[i], buf + off, 4);
    std::memcpy(&qvecs[i * 4], buf + off + 4, 32);
    std::memcpy(&tvecs[i * 3], buf + off + 36, 24);
    std::memcpy(&camera_ids[i], buf + off + 60, 4);
    off += 64;
    // skip name (NUL-terminated)
    while (off < len && buf[off] != 0) ++off;
    if (off >= len) return -1;
    ++off;
    uint64_t npts = 0;
    if (!read_at(buf, len, off, &npts)) return -1;
    // same overflow guard as points3d_parse
    if (npts > (uint64_t)(len - off - 8) / 24) return -1;
    off += 8 + (long long)npts * 24;
    if (off < 0 || off > len) return -1;
  }
  return (long long)n;
}

}  // extern "C"
