// Native data-IO runtime: PNG decode + threaded sequence prefetcher.
//
// TPU-native equivalent of the reference's C++ data layer
// (reference: src/DataLoader.{h,cpp} — DataLoaderNOCS/Ycbineoat::next() reads
// rgb/depth/mask PNGs with OpenCV and constructs Frames synchronously on the
// tracking thread).  Here decoding runs on a worker-thread pool that stays a
// configurable number of frames ahead of the consumer, so image IO fully
// overlaps the accelerator step; the Python side (bundletrack_tpu/data/
// native_io.py) binds this via ctypes.
//
// Decoder scope: non-interlaced PNG, bit depth 8 (gray / gray+alpha / RGB /
// RGBA, palette) and 16 (gray — depth maps), which covers the NOCS and
// YCBInEOAT data formats (8-bit RGB color, 16-bit gray depth in mm, 8-bit
// masks).  zlib provides inflate.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Image {
  uint32_t width = 0;
  uint32_t height = 0;
  uint32_t channels = 0;   // after palette expansion
  uint32_t bit_depth = 0;  // 8 or 16
  std::vector<uint8_t> data;  // row-major, 16-bit stays big-endian-decoded to host u16
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  const size_t CHUNK = 1 << 18;
  std::vector<uint8_t> buf(CHUNK);
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(CHUNK);
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf.data(), buf.data() + (CHUNK - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a PNG file into `img`. Returns true on success.
bool decode_png(const char* path, Image& img) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> file(size);
  if (std::fread(file.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);

  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || std::memcmp(file.data(), sig, 8) != 0) return false;

  uint32_t width = 0, height = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triplets
  std::vector<uint8_t> trns;

  size_t pos = 8;
  while (pos + 8 <= file.size()) {
    uint32_t len = be32(&file[pos]);
    const char* type = reinterpret_cast<const char*>(&file[pos + 4]);
    const uint8_t* payload = &file[pos + 8];
    if (pos + 12 + len > file.size()) return false;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      width = be32(payload);
      height = be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
      if (interlace != 0) return false;  // interlaced not supported
      if (bit_depth != 8 && bit_depth != 16) return false;
    } else if (std::memcmp(type, "PLTE", 4) == 0) {
      palette.assign(payload, payload + len);
    } else if (std::memcmp(type, "tRNS", 4) == 0) {
      trns.assign(payload, payload + len);
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (width == 0 || height == 0 || idat.empty()) return false;

  uint32_t src_channels;
  switch (color_type) {
    case 0: src_channels = 1; break;  // gray
    case 2: src_channels = 3; break;  // rgb
    case 3: src_channels = 1; break;  // palette index
    case 4: src_channels = 2; break;  // gray+alpha
    case 6: src_channels = 4; break;  // rgba
    default: return false;
  }
  if (color_type == 3 && bit_depth != 8) return false;

  std::vector<uint8_t> raw;
  if (!inflate_all(idat, raw)) return false;

  const uint32_t bytes_per_px = src_channels * (bit_depth / 8);
  const size_t stride = size_t(width) * bytes_per_px;
  if (raw.size() < height * (stride + 1)) return false;

  // un-filter in place into `recon`
  std::vector<uint8_t> recon(height * stride);
  const uint32_t bpp = bytes_per_px;
  for (uint32_t y = 0; y < height; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &recon[y * stride];
    const uint8_t* up = y > 0 ? &recon[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= bpp ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= bpp) ? up[x - bpp] : 0;
      int val = src[x];
      switch (filter) {
        case 0: break;
        case 1: val += a; break;
        case 2: val += b; break;
        case 3: val += (a + b) / 2; break;
        case 4: val += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = static_cast<uint8_t>(val);
    }
  }

  // expand palette / convert 16-bit big-endian to host u16
  if (color_type == 3) {
    img.width = width;
    img.height = height;
    img.channels = 3;
    img.bit_depth = 8;
    img.data.resize(size_t(width) * height * 3);
    for (size_t i = 0; i < size_t(width) * height; ++i) {
      uint8_t idx = recon[i];
      if (size_t(idx) * 3 + 2 < palette.size()) {
        img.data[i * 3 + 0] = palette[idx * 3 + 0];
        img.data[i * 3 + 1] = palette[idx * 3 + 1];
        img.data[i * 3 + 2] = palette[idx * 3 + 2];
      }
    }
    return true;
  }

  img.width = width;
  img.height = height;
  img.channels = src_channels;
  img.bit_depth = bit_depth;
  if (bit_depth == 16) {
    // big-endian -> host-endian u16
    img.data.resize(recon.size());
    for (size_t i = 0; i + 1 < recon.size(); i += 2) {
      uint16_t v = (uint16_t(recon[i]) << 8) | recon[i + 1];
      std::memcpy(&img.data[i], &v, 2);
    }
  } else {
    img.data = std::move(recon);
  }
  return true;
}

// ---------------------------------------------------------------------------
// Threaded sequence prefetcher
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::vector<std::string> paths;
  uint32_t ahead;
  std::vector<std::unique_ptr<Image>> slots;
  std::vector<std::atomic<int>> ready;  // 0 = pending, 1 = ok, -1 = failed
  std::deque<size_t> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<size_t> cursor{0};

  Prefetcher(std::vector<std::string> p, uint32_t threads, uint32_t ahead_)
      : paths(std::move(p)), ahead(ahead_), slots(paths.size()),
        ready(paths.size()) {
    for (auto& r : ready) r.store(0);
    size_t init = std::min<size_t>(ahead, paths.size());
    for (size_t i = 0; i < init; ++i) queue.push_back(i);
    for (uint32_t t = 0; t < threads; ++t) {
      workers.emplace_back([this] { worker(); });
    }
  }

  ~Prefetcher() {
    stop.store(true);
    cv.notify_all();
    for (auto& w : workers) w.join();
  }

  void worker() {
    while (true) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop.load() || !queue.empty(); });
        if (stop.load()) return;
        idx = queue.front();
        queue.pop_front();
      }
      auto img = std::make_unique<Image>();
      bool ok = decode_png(paths[idx].c_str(), *img);
      {
        std::lock_guard<std::mutex> lk(mu);
        slots[idx] = std::move(img);
        ready[idx].store(ok ? 1 : -1);
      }
      cv.notify_all();
    }
  }

  // Block until frame idx is decoded; also schedule the window after it.
  Image* get(size_t idx) {
    if (idx >= paths.size()) return nullptr;
    {
      std::lock_guard<std::mutex> lk(mu);
      size_t hi = std::min(paths.size(), idx + ahead + 1);
      for (size_t i = idx; i < hi; ++i) {
        if (ready[i].load() == 0 &&
            std::find(queue.begin(), queue.end(), i) == queue.end() &&
            !slots[i]) {
          queue.push_back(i);
        }
      }
    }
    cv.notify_all();
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [this, idx] { return ready[idx].load() != 0; });
    return ready[idx].load() == 1 ? slots[idx].get() : nullptr;
  }

  void release(size_t idx) {
    std::lock_guard<std::mutex> lk(mu);
    if (idx < slots.size()) slots[idx].reset();
  }
};

}  // namespace

extern "C" {

// ---- single-image API ------------------------------------------------------

// Query image header: returns 0 on success, fills w/h/channels/bit_depth.
int btio_png_info(const char* path, uint32_t* w, uint32_t* h, uint32_t* c,
                  uint32_t* bits) {
  Image img;
  if (!decode_png(path, img)) return -1;
  *w = img.width;
  *h = img.height;
  *c = img.channels;
  *bits = img.bit_depth;
  return 0;
}

// Decode into caller buffer of byte size `cap`; returns bytes written or -1.
long btio_png_read(const char* path, uint8_t* out, long cap) {
  Image img;
  if (!decode_png(path, img)) return -1;
  if (static_cast<long>(img.data.size()) > cap) return -1;
  std::memcpy(out, img.data.data(), img.data.size());
  return static_cast<long>(img.data.size());
}

// ---- prefetcher API --------------------------------------------------------

void* btio_prefetcher_new(const char** paths, long n, uint32_t threads,
                          uint32_t ahead) {
  std::vector<std::string> p(paths, paths + n);
  return new Prefetcher(std::move(p), threads ? threads : 4, ahead ? ahead : 8);
}

void btio_prefetcher_free(void* h) { delete static_cast<Prefetcher*>(h); }

// Blocks until frame idx decoded. Returns bytes written or -1.
long btio_prefetcher_get(void* h, long idx, uint8_t* out, long cap,
                         uint32_t* w, uint32_t* hgt, uint32_t* c,
                         uint32_t* bits) {
  auto* pf = static_cast<Prefetcher*>(h);
  Image* img = pf->get(idx);
  if (!img) return -1;
  if (static_cast<long>(img->data.size()) > cap) return -1;
  std::memcpy(out, img->data.data(), img->data.size());
  *w = img->width;
  *hgt = img->height;
  *c = img->channels;
  *bits = img->bit_depth;
  long nbytes = static_cast<long>(img->data.size());
  pf->release(idx);
  return nbytes;
}

}  // extern "C"
