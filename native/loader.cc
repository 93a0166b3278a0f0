// Native threaded image loader for burn_depth_tpu.
//
// Role of the reference's native ingest lane: the camera/file frame sources
// feeding the realtime pipeline (`crates/bevy_burn_depth/src/platform.rs`)
// and, beyond parity, the training data path — where Python-side PIL decode
// becomes the host bottleneck at TPU feeding rates.
//
// Design: N decode workers pull file indices from an atomic cursor, decode
// (JPEG via libjpeg, PNG via libpng's simplified API, PPM P6 inline), run
// the SAME CatmullRom resize/crop/normalize kernels as preprocess.cc
// (bit-identical to the numpy oracle), and publish results into an
// order-preserving bounded window.  The consumer (`bd_loader_next`) always
// receives items in path order — lock-step with training-step consumption —
// while decodes proceed out of order underneath.
//
// Build: `make -C native` links this into libburn_depth_host.so
// (ctypes-loaded by burn_depth_tpu/api/native.py; Python/PIL fallback when
// the library is absent).

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <jpeglib.h>
#include <png.h>

// Shared kernels from preprocess.cc (same translation .so).
extern "C" {
void bd_resize_bicubic_u8(const uint8_t* src, int sh, int sw, int c,
                          uint8_t* dst, int dh, int dw, double a);
void bd_prepare_image_nchw(const uint8_t* rgb, int h, int w, int target,
                           double a, float* out, const float* mean,
                           const float* stddev);
}

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // HWC u8
};

// Read-only view of a file: mmap'd when possible (zero-copy into the page
// cache — matters for >4K inputs where the compressed stream alone is tens
// of MB), vector fallback otherwise.  Decoders only need (data, size).
struct FileData {
  const uint8_t* data = nullptr;
  size_t size = 0;
  void* map = nullptr;
  std::vector<uint8_t> buf;

  ~FileData() {
    if (map != nullptr) munmap(map, size);
  }
  FileData() = default;
  FileData(const FileData&) = delete;
  FileData& operator=(const FileData&) = delete;
};

bool read_file(const std::string& path, FileData& out, std::string& err) {
  int fd = ::open(path.c_str(), O_RDONLY);
  if (fd >= 0) {
    struct stat st {};
    const bool stat_ok = fstat(fd, &st) == 0;
    if (stat_ok && st.st_size > 0) {
      void* m = mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ, MAP_PRIVATE, fd, 0);
      ::close(fd);
      if (m != MAP_FAILED) {
        out.map = m;
        out.size = static_cast<size_t>(st.st_size);
        out.data = static_cast<const uint8_t*>(m);
        // the decoders stream through the file once, front to back
        madvise(m, out.size, MADV_SEQUENTIAL);
        return true;
      }
    } else {
      ::close(fd);
      if (stat_ok && st.st_size == 0) {
        err = "empty file " + path;
        return false;
      }
      // fstat failed: fall through to the stdio path rather than guessing
    }
  }
  // fallback: plain buffered read (e.g. mmap-hostile filesystems)
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    err = "cannot open " + path;
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    err = "empty file " + path;
    return false;
  }
  out.buf.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.buf.data(), 1, out.buf.size(), f);
  std::fclose(f);
  if (got != out.buf.size()) {
    err = "short read " + path;
    return false;
  }
  out.data = out.buf.data();
  out.size = out.buf.size();
  return true;
}

// ---- JPEG (libjpeg, longjmp error recovery) -------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jb;
  char msg[JMSG_LENGTH_MAX] = {0};
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, e->msg);
  std::longjmp(e->jb, 1);
}

// min_dim > 0 enables DCT-domain downscaled decode (libjpeg scale_denom in
// {2,4,8}): the largest denominator is picked such that the decoded shortest
// side stays >= min_dim, so the subsequent CatmullRom resize only ever
// downscales.  For a 4K JPEG feeding a 518 target this decodes 1/16 of the
// pixels (denom 4) — the PIL ``draft()`` trick, done in the worker.  Output
// is NOT bit-identical to a full decode + resize (opt-in fast path).
bool decode_jpeg(const uint8_t* data, size_t size, Image& img, std::string& err,
                 int min_dim = 0) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    err = std::string("jpeg: ") + jerr.msg;
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (min_dim > 0) {
    const int shortest = static_cast<int>(std::min(cinfo.image_width, cinfo.image_height));
    int denom = 1;
    for (int d = 8; d >= 2; d /= 2) {
      if (shortest >= min_dim * d) {
        denom = d;
        break;
      }
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = static_cast<unsigned int>(denom);
  }
  jpeg_start_decompress(&cinfo);
  img.w = static_cast<int>(cinfo.output_width);
  img.h = static_cast<int>(cinfo.output_height);
  img.rgb.resize(static_cast<size_t>(img.h) * img.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.rgb.data() + static_cast<size_t>(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---- PNG (libpng simplified API) ------------------------------------------

bool decode_png(const uint8_t* data, size_t size, Image& img, std::string& err) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, size)) {
    err = std::string("png: ") + image.message;
    return false;
  }
  image.format = PNG_FORMAT_RGB;
  img.w = static_cast<int>(image.width);
  img.h = static_cast<int>(image.height);
  img.rgb.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, img.rgb.data(), 0, nullptr)) {
    err = std::string("png: ") + image.message;
    png_image_free(&image);
    return false;
  }
  return true;
}

// ---- PPM P6 (maxval 255) ---------------------------------------------------

bool decode_ppm(const uint8_t* data, size_t size, Image& img, std::string& err) {
  // header: "P6" ws width ws height ws maxval single-ws raster
  size_t pos = 2;
  auto next_int = [&](int& v) -> bool {
    while (pos < size && (std::isspace(data[pos]) || data[pos] == '#')) {
      if (data[pos] == '#')
        while (pos < size && data[pos] != '\n') ++pos;
      else
        ++pos;
    }
    v = 0;
    bool any = false;
    while (pos < size && data[pos] >= '0' && data[pos] <= '9') {
      v = v * 10 + (data[pos++] - '0');
      any = true;
    }
    return any;
  };
  int w, h, maxval;
  if (!next_int(w) || !next_int(h) || !next_int(maxval) || maxval != 255) {
    err = "ppm: bad header";
    return false;
  }
  ++pos;  // single whitespace before raster
  size_t need = static_cast<size_t>(w) * h * 3;
  // pos may equal/exceed size when the header ends at EOF — guard BEFORE
  // the subtraction (size - pos would wrap and pass the check, and with the
  // mmap backing the over-read is a hard SIGBUS, not just garbage).
  if (pos >= size || size - pos < need) {
    err = "ppm: truncated";
    return false;
  }
  img.w = w;
  img.h = h;
  img.rgb.assign(data + pos, data + pos + need);
  return true;
}

// ---- EXIF orientation (JPEG APP1) ------------------------------------------

// Returns the EXIF orientation tag (1..8) or 1 when absent/malformed.
// Walks the JPEG marker stream for APP1 "Exif\0\0", then the TIFF IFD0 for
// tag 0x0112.  Every read is bounds-checked; anything unexpected -> 1.
int exif_orientation(const uint8_t* d, size_t n) {
  auto u16 = [&](size_t off, bool be) -> unsigned {
    return be ? (d[off] << 8) | d[off + 1] : (d[off + 1] << 8) | d[off];
  };
  auto u32 = [&](size_t off, bool be) -> unsigned long {
    return be ? ((unsigned long)d[off] << 24) | (d[off + 1] << 16) | (d[off + 2] << 8) | d[off + 3]
              : ((unsigned long)d[off + 3] << 24) | (d[off + 2] << 16) | (d[off + 1] << 8) | d[off];
  };
  size_t pos = 2;  // past SOI
  while (pos + 4 <= n && d[pos] == 0xFF) {
    const uint8_t marker = d[pos + 1];
    if (marker == 0xD8 || marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
      pos += 2;  // standalone markers, no length
      continue;
    }
    if (marker == 0xDA) break;  // start of scan — no EXIF past here
    const size_t seg_len = u16(pos + 2, true);
    if (seg_len < 2 || pos + 2 + seg_len > n) break;
    if (marker == 0xE1 && seg_len >= 2 + 6 + 8 &&
        std::memcmp(d + pos + 4, "Exif\0\0", 6) == 0) {
      const size_t tiff = pos + 4 + 6;  // TIFF header base
      if (tiff + 8 > n) break;
      bool be;
      if (d[tiff] == 'M' && d[tiff + 1] == 'M') be = true;
      else if (d[tiff] == 'I' && d[tiff + 1] == 'I') be = false;
      else break;
      if (u16(tiff + 2, be) != 42) break;
      const unsigned long ifd_off = u32(tiff + 4, be);
      const size_t seg_end = pos + 2 + seg_len;
      size_t ifd = tiff + ifd_off;
      if (ifd + 2 > seg_end || ifd + 2 > n) break;
      const unsigned count = u16(ifd, be);
      for (unsigned i = 0; i < count; ++i) {
        const size_t e = ifd + 2 + 12ul * i;
        if (e + 12 > seg_end || e + 12 > n) break;
        if (u16(e, be) == 0x0112 && u16(e + 2, be) == 3) {  // Orientation, SHORT
          const unsigned v = u16(e + 8, be);  // value inline (count 1)
          return (v >= 1 && v <= 8) ? (int)v : 1;
        }
      }
      break;  // APP1 parsed, tag absent
    }
    pos += 2 + seg_len;
  }
  return 1;
}

// Apply an EXIF orientation (2..8) to an RGB image in place: a transpose
// and/or y/x flips composed per the EXIF 2.x table.
void apply_orientation(Image& img, int o) {
  if (o <= 1 || o > 8) return;
  const bool swap = o >= 5;                       // 5..8 transpose axes
  const bool fy = (o == 3 || o == 4 || o == 7 || o == 8);
  const bool fx = (o == 2 || o == 3 || o == 6 || o == 7);
  const int sh = img.h, sw = img.w;
  const int dh = swap ? sw : sh, dw = swap ? sh : sw;
  std::vector<uint8_t> out(static_cast<size_t>(dh) * dw * 3);
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      int yy = fy ? dh - 1 - y : y;
      int xx = fx ? dw - 1 - x : x;
      const int sy = swap ? xx : yy;
      const int sx = swap ? yy : xx;
      std::memcpy(&out[(static_cast<size_t>(y) * dw + x) * 3],
                  &img.rgb[(static_cast<size_t>(sy) * sw + sx) * 3], 3);
    }
  }
  img.h = dh;
  img.w = dw;
  img.rgb = std::move(out);
}

bool decode_any(const uint8_t* data, size_t size, Image& img, std::string& err,
                int jpeg_min_dim = 0) {
  if (size >= 2 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, size, img, err, jpeg_min_dim);
  if (size >= 4 && data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' && data[3] == 'G')
    return decode_png(data, size, img, err);
  if (size >= 2 && data[0] == 'P' && data[1] == '6') return decode_ppm(data, size, img, err);
  err = "unknown image format";
  return false;
}

// shortest-side resize + center crop to target x target, u8 HWC
// (api/native.py resize_and_crop_u8 semantics).
void resize_and_crop(const Image& in, int target, double a, uint8_t* out) {
  if (in.h == target && in.w == target) {
    std::memcpy(out, in.rgb.data(), static_cast<size_t>(target) * target * 3);
    return;
  }
  const int shortest = std::max(std::min(in.h, in.w), 1);
  const double scale = static_cast<double>(target) / shortest;
  const int sw = std::max(static_cast<int>(std::lround(in.w * scale)), target);
  const int sh = std::max(static_cast<int>(std::lround(in.h * scale)), target);
  std::vector<uint8_t> resized(static_cast<size_t>(sh) * sw * 3);
  bd_resize_bicubic_u8(in.rgb.data(), in.h, in.w, 3, resized.data(), sh, sw, a);
  const int cx = (sw - target) / 2, cy = (sh - target) / 2;
  for (int y = 0; y < target; ++y)
    std::memcpy(out + static_cast<size_t>(y) * target * 3,
                &resized[(static_cast<size_t>(y + cy) * sw + cx) * 3],
                static_cast<size_t>(target) * 3);
}

struct Item {
  std::vector<uint8_t> u8;
  std::vector<float> f32;
  std::string err;
};

struct Loader {
  std::vector<std::string> paths;
  int target = 0;
  int mode = 0;  // 0 = u8 HWC, 1 = f32 NCHW normalized
  int crop = 1;  // 1 = shortest-side resize + center crop; 0 = squash resize
  double a = -0.5;
  float mean[3] = {0, 0, 0}, stddev[3] = {1, 1, 1};
  int window = 8;
  bool loop = false;
  // DCT-scaled JPEG decode: decode at the largest 1/{2,4,8} scale whose
  // shortest side still covers `target` (opt-in — not bit-identical).
  bool fast_jpeg = false;
  // Honor the EXIF orientation tag (camera JPEGs are stored sensor-native
  // and marked for rotation; ignoring it feeds the model sideways frames).
  bool exif_rotate = true;

  std::mutex mu;
  std::condition_variable cv_worker, cv_consumer;
  std::map<long, Item> ready;
  long next_claim = 0;
  long next_out = 0;
  bool stopping = false;
  std::vector<std::thread> workers;

  size_t item_elems() const {
    return static_cast<size_t>(target) * target * 3;
  }

  void work() {
    for (;;) {
      long idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_worker.wait(lk, [&] {
          return stopping || (next_claim - next_out < window &&
                              (loop || next_claim < static_cast<long>(paths.size())));
        });
        if (stopping) return;
        if (!loop && next_claim >= static_cast<long>(paths.size())) return;
        idx = next_claim++;
      }
      Item item = process(idx);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(idx, std::move(item));
        cv_consumer.notify_all();
      }
    }
  }

  Item process(long idx) {
    Item item;
    const std::string& path = paths[static_cast<size_t>(idx % static_cast<long>(paths.size()))];
    FileData mem;
    Image img;
    if (!read_file(path, mem, item.err) ||
        !decode_any(mem.data, mem.size, img, item.err, fast_jpeg ? target : 0))
      return item;
    if (exif_rotate && mem.size >= 4 && mem.data[0] == 0xFF && mem.data[1] == 0xD8)
      apply_orientation(img, exif_orientation(mem.data, mem.size));
    if (!crop && (img.h != target || img.w != target)) {
      // squash resize (no FOV loss) — the Depth Pro ingest semantics: the
      // canonical path squash-resizes the FULL frame to the net size.
      Image sq;
      sq.h = sq.w = target;
      sq.rgb.resize(item_elems());
      bd_resize_bicubic_u8(img.rgb.data(), img.h, img.w, 3, sq.rgb.data(), target, target, a);
      img = std::move(sq);
    }
    if (mode == 0) {
      item.u8.resize(item_elems());
      resize_and_crop(img, target, a, item.u8.data());
    } else {
      item.f32.resize(item_elems());
      bd_prepare_image_nchw(img.rgb.data(), img.h, img.w, target, a, item.f32.data(), mean, stddev);
    }
    return item;
  }
};

}  // namespace

extern "C" {

void* bd_loader_create(const char* const* paths, int n, int target, int mode,
                       double a, const float* mean, const float* stddev,
                       int threads, int window, int loop, int crop,
                       int fast_jpeg, int exif_rotate) {
  if (n <= 0 || target <= 0 || window <= 0) return nullptr;
  auto* ld = new Loader();
  ld->paths.assign(paths, paths + n);
  ld->target = target;
  ld->mode = mode;
  ld->crop = crop;
  ld->fast_jpeg = fast_jpeg != 0;
  ld->exif_rotate = exif_rotate != 0;
  ld->a = a;
  if (mean) std::memcpy(ld->mean, mean, 3 * sizeof(float));
  if (stddev) std::memcpy(ld->stddev, stddev, 3 * sizeof(float));
  ld->window = window;
  ld->loop = loop != 0;
  const int nt = std::max(1, std::min(threads, 64));
  ld->workers.reserve(static_cast<size_t>(nt));
  for (int i = 0; i < nt; ++i) ld->workers.emplace_back([ld] { ld->work(); });
  return ld;
}

// Fills `out` with the next item IN PATH ORDER.  Returns the item's
// monotone 64-bit index (`index % n_paths` is the path; never truncates,
// loop mode can stream past 2^31), -1 at end of stream (loop=0), -2 on
// decode failure for that item (message in errbuf; the stream continues —
// call again for the following item).
long long bd_loader_next(void* handle, void* out, char* errbuf, int errbuf_len) {
  auto* ld = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(ld->mu);
  if (!ld->loop && ld->next_out >= static_cast<long>(ld->paths.size())) return -1;
  ld->cv_consumer.wait(lk, [&] { return ld->ready.count(ld->next_out) != 0; });
  auto node = ld->ready.extract(ld->next_out);
  const long long idx = ld->next_out++;
  ld->cv_worker.notify_all();
  lk.unlock();
  Item& item = node.mapped();
  if (!item.err.empty()) {
    if (errbuf && errbuf_len > 0) {
      std::snprintf(errbuf, static_cast<size_t>(errbuf_len), "%s", item.err.c_str());
    }
    return -2;
  }
  if (ld->mode == 0)
    std::memcpy(out, item.u8.data(), item.u8.size());
  else
    std::memcpy(out, item.f32.data(), item.f32.size() * sizeof(float));
  return idx;
}

void bd_loader_destroy(void* handle) {
  auto* ld = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->stopping = true;
    ld->cv_worker.notify_all();
  }
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
