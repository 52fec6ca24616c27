// Native ImageNet training data loader — the TPU-host equivalent of the
// reference's NVIDIA DALI input pipeline (SURVEY.md sec 2.2: C++ JPEG decode
// + fused augmentation). Multi-threaded libjpeg decode with DCT-domain
// downscaling, torchvision-semantics random-resized-crop, horizontal flip,
// assembled into uint8 NHWC batches handed to JAX via ctypes
// (atomnas_tpu/data/native_loader.py). Normalization/mixup happen on device
// (train/step.py), so the host ships compact uint8.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 dataloader.cc -ljpeg -lpthread
//        -o libatomdata.so

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg classic API, error-resilient)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
  bool ok = false;
};

// Decode with libjpeg 1/denom DCT scaling (denom in {1,2,4,8}).
Image decode_jpeg(const uint8_t* data, size_t len, int denom) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.dct_method = JDCT_IFAST;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.rgb.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.rgb.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

bool read_jpeg_dims(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  bool ok = jpeg_read_header(&cinfo, TRUE) == JPEG_HEADER_OK;
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return ok;
}

// ---------------------------------------------------------------------------
// Augmentation: random-resized-crop (torchvision semantics) + hflip
// ---------------------------------------------------------------------------

struct CropRect {
  int x, y, w, h;
};

CropRect sample_rrc(std::mt19937& rng, int w, int h) {
  std::uniform_real_distribution<double> u01(0.0, 1.0);
  const double area = double(w) * h;
  for (int attempt = 0; attempt < 10; ++attempt) {
    double target_area = area * (0.08 + u01(rng) * (1.0 - 0.08));
    double log_ratio =
        std::log(3.0 / 4.0) + u01(rng) * (std::log(4.0 / 3.0) - std::log(3.0 / 4.0));
    double ratio = std::exp(log_ratio);
    int cw = int(std::lround(std::sqrt(target_area * ratio)));
    int ch = int(std::lround(std::sqrt(target_area / ratio)));
    if (cw > 0 && ch > 0 && cw <= w && ch <= h) {
      std::uniform_int_distribution<int> dx(0, w - cw), dy(0, h - ch);
      return {dx(rng), dy(rng), cw, ch};
    }
  }
  // fallback: center crop of the largest in-ratio square
  int s = std::min(w, h);
  return {(w - s) / 2, (h - s) / 2, s, s};
}

// Bilinear crop-resize from src(rect) to dst (size x size), optional hflip.
// Fixed-point (8-bit fractional) with precomputed per-column coefficient
// tables — the per-sample hot loop, SIMD-friendly.
void crop_resize(const Image& src, CropRect r, int size, bool flip,
                 uint8_t* dst) {
  const double sx = double(r.w) / size;
  const double sy = double(r.h) / size;
  // per-output-column source indices and weights
  std::vector<int> xi0(size), xi1(size);
  std::vector<int> xw(size);  // weight of x1, 0..256
  for (int ox = 0; ox < size; ++ox) {
    double fx = (ox + 0.5) * sx - 0.5 + r.x;
    int x0 = int(std::floor(fx));
    int w = int((fx - x0) * 256.0 + 0.5);
    xi0[ox] = std::min(std::max(x0, 0), src.w - 1) * 3;
    xi1[ox] = std::min(std::max(x0 + 1, 0), src.w - 1) * 3;
    xw[ox] = std::min(std::max(w, 0), 256);
  }
  std::vector<uint16_t> row0(size * 3), row1(size * 3);
  for (int oy = 0; oy < size; ++oy) {
    double fy = (oy + 0.5) * sy - 0.5 + r.y;
    int y0 = int(std::floor(fy));
    int wy = std::min(std::max(int((fy - y0) * 256.0 + 0.5), 0), 256);
    int y1 = std::min(std::max(y0 + 1, 0), src.h - 1);
    y0 = std::min(std::max(y0, 0), src.h - 1);
    const uint8_t* s0 = &src.rgb[size_t(y0) * src.w * 3];
    const uint8_t* s1 = &src.rgb[size_t(y1) * src.w * 3];
    // horizontal pass for both source rows (8.8 fixed point)
    for (int ox = 0; ox < size; ++ox) {
      int a = xi0[ox], b = xi1[ox], w = xw[ox], iw = 256 - w;
      for (int c = 0; c < 3; ++c) {
        row0[ox * 3 + c] = uint16_t((iw * s0[a + c] + w * s0[b + c]) >> 2);
        row1[ox * 3 + c] = uint16_t((iw * s1[a + c] + w * s1[b + c]) >> 2);
      }
    }
    // vertical blend + write (optionally flipped)
    uint8_t* orow = dst + size_t(oy) * size * 3;
    int iwy = 256 - wy;
    for (int ox = 0; ox < size; ++ox) {
      int out_x = flip ? (size - 1 - ox) : ox;
      uint8_t* o = orow + out_x * 3;
      for (int c = 0; c < 3; ++c) {
        // row values are 14-bit; blend back to 8-bit with rounding
        uint32_t v = uint32_t(iwy) * row0[ox * 3 + c] +
                     uint32_t(wy) * row1[ox * 3 + c];
        o[c] = uint8_t((v + (1u << 13)) >> 14);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Loader: thread pool filling a ring of batch buffers
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  std::vector<int32_t> labels;
  int batch = 0, size = 0, ring = 4;
  bool train = true;
  uint64_t seed = 0;

  struct Buffer {
    std::vector<uint8_t> images;
    std::vector<int32_t> labels;
    std::atomic<int> filled{0};
    int64_t batch_id = -1;
  };
  std::vector<Buffer> buffers;

  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  int64_t next_consumed = 0;  // next batch_id the consumer will take
  std::atomic<int64_t> next_sample{0};
  std::vector<int64_t> completed;  // per ring slot: highest complete batch_id+1
  std::atomic<bool> stop{false};
  std::atomic<int64_t> decode_failures{0};
  std::vector<std::thread> workers;

  // per-epoch shuffled order
  std::mutex perm_mu;
  int64_t perm_epoch = -1;
  std::vector<int32_t> perm;

  int32_t sample_index(int64_t s) {
    int64_t epoch = s / int64_t(paths.size());
    int64_t off = s % int64_t(paths.size());
    std::lock_guard<std::mutex> lk(perm_mu);
    if (epoch != perm_epoch) {
      // Pure function of (seed, epoch): reset to identity before shuffling,
      // so a resumed loader lands on the same order without replaying
      // earlier epochs' shuffles.
      perm.resize(paths.size());
      for (size_t i = 0; i < perm.size(); ++i) perm[i] = int32_t(i);
      std::mt19937_64 rng(seed * 2654435761ULL + uint64_t(epoch));
      if (train) std::shuffle(perm.begin(), perm.end(), rng);
      perm_epoch = epoch;
    }
    return perm[size_t(off)];
  }

  void worker_loop(int wid) {
    (void)wid;
    std::vector<uint8_t> filebuf;
    while (!stop.load()) {
      int64_t s = next_sample.fetch_add(1);
      int64_t batch_id = s / batch;
      int slot = int(s % batch);
      int ring_idx = int(batch_id % ring);
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() || batch_id < next_consumed + ring;
        });
        if (stop.load()) return;
        Buffer& buf = buffers[ring_idx];
        if (buf.batch_id != batch_id) {
          buf.batch_id = batch_id;
          buf.filled.store(0);
        }
      }
      Buffer& buf = buffers[ring_idx];
      int32_t idx = sample_index(s);
      // Per-sample RNG keyed by the global sample ordinal: augmentation is
      // deterministic regardless of worker assignment, so a resumed run
      // (start_sample) reproduces the uninterrupted stream bit-for-bit.
      std::mt19937 rng(uint32_t(seed * 0x9E3779B9ULL + uint64_t(s) * 2654435761ULL));
      fill_sample(rng, idx, filebuf,
                  buf.images.data() + size_t(slot) * size * size * 3,
                  &buf.labels[slot]);
      if (buf.filled.fetch_add(1) + 1 == batch) {
        std::lock_guard<std::mutex> lk(mu);
        completed[ring_idx] = batch_id + 1;
        cv_ready.notify_all();
      }
    }
  }

  void fill_sample(std::mt19937& rng, int32_t idx, std::vector<uint8_t>& filebuf,
                   uint8_t* out, int32_t* out_label) {
    *out_label = labels[idx];
    std::ifstream f(paths[idx], std::ios::binary | std::ios::ate);
    bool ok = false;
    if (f) {
      std::streamsize len = f.tellg();
      f.seekg(0);
      filebuf.resize(size_t(len));
      if (f.read(reinterpret_cast<char*>(filebuf.data()), len)) {
        int w = 0, h = 0;
        if (read_jpeg_dims(filebuf.data(), filebuf.size(), &w, &h)) {
          CropRect r = train ? sample_rrc(rng, w, h)
                             : CropRect{0, 0, w, h};
          // DCT-domain downscale: largest denom keeping crop >= target size
          int denom = 1;
          while (denom < 8 && r.w / (denom * 2) >= size &&
                 r.h / (denom * 2) >= size) {
            denom *= 2;
          }
          Image img = decode_jpeg(filebuf.data(), filebuf.size(), denom);
          if (img.ok) {
            CropRect rs{r.x / denom, r.y / denom,
                        std::max(r.w / denom, 1), std::max(r.h / denom, 1)};
            rs.x = std::min(rs.x, img.w - rs.w);
            rs.y = std::min(rs.y, img.h - rs.h);
            bool flip = train && (rng() & 1u);
            crop_resize(img, rs, size, flip, out);
            ok = true;
          }
        }
      }
    }
    if (!ok) {
      decode_failures.fetch_add(1);
      std::memset(out, 0, size_t(size) * size * 3);  // corrupt file
    }
  }
};

}  // namespace

extern "C" {

void* dl_create(const char** paths, const int32_t* labels, int64_t n,
                int32_t batch, int32_t size, int32_t threads, int64_t seed,
                int32_t train, int32_t ring, int64_t start_sample) {
  if (n <= 0 || batch <= 0 || size <= 0 || start_sample < 0 ||
      start_sample % batch != 0) {
    return nullptr;
  }
  auto* ld = new Loader();
  ld->paths.reserve(size_t(n));
  ld->labels.assign(labels, labels + n);
  for (int64_t i = 0; i < n; ++i) ld->paths.emplace_back(paths[i]);
  ld->batch = batch;
  ld->size = size;
  ld->train = train != 0;
  ld->seed = uint64_t(seed);
  ld->ring = std::max(ring, 2);
  ld->buffers = std::vector<Loader::Buffer>(ld->ring);
  for (auto& b : ld->buffers) {
    b.images.resize(size_t(batch) * size * size * 3);
    b.labels.resize(size_t(batch));
  }
  ld->completed.assign(ld->ring, 0);
  // resume: skip straight to the sample ordinal (per-epoch permutations and
  // per-sample RNG are both derived from ordinals, so this is exact)
  ld->next_sample.store(start_sample);
  ld->next_consumed = start_sample / batch;
  int nthreads = std::max(threads, 1);
  for (int t = 0; t < nthreads; ++t) {
    ld->workers.emplace_back(&Loader::worker_loop, ld, t);
  }
  return ld;
}

// Blocks until the next batch (in order) is complete; copies into out buffers.
int32_t dl_next(void* handle, uint8_t* out_images, int32_t* out_labels) {
  auto* ld = static_cast<Loader*>(handle);
  int64_t want = ld->next_consumed;
  int ring_idx = int(want % ld->ring);
  {
    std::unique_lock<std::mutex> lk(ld->mu);
    ld->cv_ready.wait(lk, [&] {
      return ld->stop.load() || ld->completed[ring_idx] >= want + 1;
    });
    if (ld->stop.load()) return -1;
  }
  Loader::Buffer& buf = ld->buffers[ring_idx];
  std::memcpy(out_images, buf.images.data(), buf.images.size());
  std::memcpy(out_labels, buf.labels.data(),
              buf.labels.size() * sizeof(int32_t));
  {
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->next_consumed = want + 1;
    ld->cv_space.notify_all();
  }
  return 0;
}

int64_t dl_failures(void* handle) {
  return static_cast<Loader*>(handle)->decode_failures.load();
}

void dl_destroy(void* handle) {
  auto* ld = static_cast<Loader*>(handle);
  ld->stop.store(true);
  {
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->cv_space.notify_all();
    ld->cv_ready.notify_all();
  }
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
