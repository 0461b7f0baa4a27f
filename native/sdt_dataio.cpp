// sdt_dataio — native data-loader core for speechdrivestemplates_tpu.
//
// The reference's per-item dataset pipeline (gesture_dataset.py:85-121) is pure
// Python/numpy: npz unzip + npy parse + a chain of keypoint-space transforms.  This
// library performs the whole item pipeline in C++ — zip/npy parsing (STORED and
// DEFLATE entries), 137->122->121 keypoint selection, root-centering, hierarchical
// re-rooting, per-speaker z-scoring, and audio crop/pad — exposed through a C ABI
// consumed via ctypes.  Calls release the GIL (ctypes does this for us), so loader
// threads overlap host preprocessing with TPU steps.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC sdt_dataio.cpp -lz).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

struct Blob {
  std::vector<uint8_t> data;
};

bool read_file(const char* path, Blob* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->data.resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data.data(), 1, out->data.size(), f);
  std::fclose(f);
  return got == out->data.size();
}

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint64_t rd64(const uint8_t* p) {
  return uint64_t(rd32(p)) | (uint64_t(rd32(p + 4)) << 32);
}

// Minimal npy payload description.
struct Npy {
  char dtype;            // 'f' float32, 'd' float64, 'S' bytes (ignored)
  std::vector<long> shape;
  const uint8_t* data;
  size_t nbytes;
  std::vector<uint8_t> owned;  // set when the zip entry was DEFLATE'd
};

bool parse_npy(const uint8_t* p, size_t n, Npy* out) {
  if (n < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) return false;
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) { hlen = rd16(p + 8); hoff = 10; }
  else { hlen = rd32(p + 8); hoff = 12; }
  if (hoff + hlen > n) return false;
  std::string hdr(reinterpret_cast<const char*>(p + hoff), hlen);

  auto find_val = [&](const std::string& key) -> std::string {
    size_t k = hdr.find(key);
    if (k == std::string::npos) return "";
    size_t c = hdr.find(':', k);
    return hdr.substr(c + 1, 64);
  };
  std::string descr = find_val("'descr'");
  if (descr.find("<f4") != std::string::npos) out->dtype = 'f';
  else if (descr.find("<f8") != std::string::npos) out->dtype = 'd';
  else out->dtype = 'S';

  size_t sh = hdr.find("'shape'");
  size_t l = hdr.find('(', sh), r = hdr.find(')', sh);
  out->shape.clear();
  std::string dims = hdr.substr(l + 1, r - l - 1);
  long cur = -1;
  for (char c : dims) {
    if (c >= '0' && c <= '9') cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    else if (cur >= 0) { out->shape.push_back(cur); cur = -1; }
  }
  if (cur >= 0) out->shape.push_back(cur);

  out->data = p + hoff + hlen;
  out->nbytes = n - hoff - hlen;
  return true;
}

// Find a zip entry by name; handles STORED and DEFLATE.
bool zip_find(const Blob& zip, const std::string& name, Npy* out) {
  const uint8_t* p = zip.data.data();
  size_t n = zip.data.size();
  size_t off = 0;
  while (off + 30 <= n) {
    if (rd32(p + off) != 0x04034b50) break;
    uint16_t method = rd16(p + off + 8);
    uint64_t csize = rd32(p + off + 18);
    uint64_t usize = rd32(p + off + 22);
    uint16_t nlen = rd16(p + off + 26);
    uint16_t elen = rd16(p + off + 28);
    std::string ename(reinterpret_cast<const char*>(p + off + 30), nlen);
    // ZIP64 (numpy savez uses it unconditionally): real sizes in extra 0x0001
    if (csize == 0xFFFFFFFFu || usize == 0xFFFFFFFFu) {
      const uint8_t* e = p + off + 30 + nlen;
      size_t eoff = 0;
      while (eoff + 4 <= elen) {
        uint16_t tag = rd16(e + eoff);
        uint16_t sz = rd16(e + eoff + 2);
        if (tag == 0x0001) {
          size_t f = eoff + 4;
          if (usize == 0xFFFFFFFFu && sz >= 8) { usize = rd64(e + f); f += 8; }
          if (csize == 0xFFFFFFFFu && sz >= 16) { csize = rd64(e + f); }
          break;
        }
        eoff += 4 + sz;
      }
    }
    size_t data_off = off + 30 + nlen + elen;
    if (data_off + csize > n) return false;
    if (ename == name) {
      if (method == 0) {
        return parse_npy(p + data_off, csize, out);
      } else if (method == 8) {
        out->owned.resize(usize);
        z_stream zs{};
        inflateInit2(&zs, -MAX_WBITS);
        zs.next_in = const_cast<uint8_t*>(p + data_off);
        zs.avail_in = csize;
        zs.next_out = out->owned.data();
        zs.avail_out = usize;
        int rc = inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
        if (rc != Z_STREAM_END) return false;
        return parse_npy(out->owned.data(), usize, out);
      }
      return false;
    }
    off = data_off + csize;
  }
  return false;
}

inline float npy_at(const Npy& a, size_t idx) {
  if (a.dtype == 'f')
    return reinterpret_cast<const float*>(a.data)[idx];
  return static_cast<float>(reinterpret_cast<const double*>(a.data)[idx]);
}

// keypoint-121 re-rooting anchors (must match ops/pose.py)
constexpr int kHandRootL = 6, kHandRootR = 3, kHeadRoot = 39;

}  // namespace

extern "C" {

// Load one clip npz and run the full train-item pipeline.
//   poses_out  : float[num_frames*2*121]  normalized relative poses
//   scores_out : float[num_frames*2*121]  detection scores (repeated over x/y)
//   audio_out  : float[audio_len]         cropped/zero-padded waveform
//   mean/std   : float[242]               speaker stats (x.. then y.. per kp)
// Returns 0 on success, negative error codes otherwise.
int sdt_load_clip(const char* path, int num_frames, int hierarchical,
                  const float* mean, const float* stddev,
                  float* poses_out, float* scores_out,
                  float* audio_out, long audio_len) {
  Blob zip;
  if (!read_file(path, &zip)) return -1;

  Npy pose, audio;
  if (!zip_find(zip, "pose.npy", &pose)) return -2;
  if (!zip_find(zip, "audio.npy", &audio)) return -3;
  if (pose.shape.size() != 3 || pose.shape[1] != 3 || pose.shape[2] != 137)
    return -4;
  long t_avail = pose.shape[0];
  if (t_avail < num_frames) return -5;

  // audio crop/pad
  long a_avail = 1;
  for (long d : audio.shape) a_avail *= d;
  for (long i = 0; i < audio_len; ++i)
    audio_out[i] = (i < a_avail) ? npy_at(audio, i) : 0.0f;

  // 137 -> 122 selection (drop lower body): indices into pose-137
  static int sel122[122];
  static bool init = false;
  if (!init) {
    int k = 0;
    for (int i = 0; i < 8; ++i) sel122[k++] = i;
    sel122[k++] = 15; sel122[k++] = 16;
    for (int i = 25; i < 137; ++i) sel122[k++] = i;
    init = true;
  }

  for (int t = 0; t < num_frames; ++t) {
    float x122[122], y122[122], s122[122];
    const size_t base = static_cast<size_t>(t) * 3 * 137;
    for (int k = 0; k < 122; ++k) {
      int src = sel122[k];
      x122[k] = npy_at(pose, base + 0 * 137 + src);
      y122[k] = npy_at(pose, base + 1 * 137 + src);
      s122[k] = npy_at(pose, base + 2 * 137 + src);
    }
    // root-center at kp 1 of the 122 layout, then drop it -> 121
    const float rx = x122[1], ry = y122[1];
    float x[121], y[121], s[121];
    for (int k = 0, j = 0; k < 122; ++k) {
      if (k == 1) continue;
      x[j] = x122[k] - rx;
      y[j] = y122[k] - ry;
      s[j] = s122[k];
      ++j;
    }
    if (hierarchical) {
      const float hx = x[kHeadRoot], hy = y[kHeadRoot];
      for (int k = 9; k < 79; ++k) {
        if (k == kHeadRoot) continue;
        x[k] -= hx; y[k] -= hy;
      }
      const float lx = x[kHandRootL], ly = y[kHandRootL];
      for (int k = 79; k < 100; ++k) { x[k] -= lx; y[k] -= ly; }
      const float rx2 = x[kHandRootR], ry2 = y[kHandRootR];
      for (int k = 100; k < 121; ++k) { x[k] -= rx2; y[k] -= ry2; }
    }
    float* po = poses_out + static_cast<size_t>(t) * 2 * 121;
    float* so = scores_out + static_cast<size_t>(t) * 2 * 121;
    for (int k = 0; k < 121; ++k) {
      po[k] = (x[k] - mean[k]) / stddev[k];
      po[121 + k] = (y[k] - mean[121 + k]) / stddev[121 + k];
      so[k] = s[k];
      so[121 + k] = s[k];
    }
  }
  return 0;
}

// Lightweight self-description for version checks from Python.
int sdt_dataio_abi_version() { return 1; }

}  // extern "C"
