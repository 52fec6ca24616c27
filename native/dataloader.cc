// Native ImageNet data loader — the TPU-host equivalent of the reference's
// NVIDIA DALI input pipeline (SURVEY.md sec 2.2: C++ JPEG decode + fused
// augmentation; sec 3.5 HybridTrainPipe/HybridValPipe). Multi-threaded
// libjpeg decode with DCT-domain downscaling, torchvision-semantics
// random-resized-crop + flip + color jitter + PCA lighting for train,
// shorter-side resize + center crop for eval, assembled into uint8 NHWC
// batches handed to JAX via ctypes (atomnas_tpu/data/native_loader.py).
// Normalization/mixup happen on device (train/step.py), so the host ships
// compact uint8.
//
// Determinism contract: every random decision for sample ordinal `s` comes
// from an RNG seeded by (seed, s, attempt) — independent of worker
// scheduling — and the per-epoch shuffle is a pure function of (seed,
// epoch). A loader created with start_sample = k*batch therefore reproduces
// the uninterrupted stream bit-for-bit (checkpoint/resume parity).
//
// Corrupt files: train mode RESAMPLES a different index (deterministically)
// instead of training on (black image, true label); eval mode zero-fills
// and counts the failure.
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

// Eval crop: the source rect equivalent of torchvision
// Resize(shorter-side=resize) + CenterCrop(size): a centered square of side
// round(size * short / resize).
CropRect center_eval_crop(int w, int h, int size, int resize) {
  int shorter = std::min(w, h);
  int side = std::max(1, int(std::lround(double(size) * shorter / resize)));
  side = std::min(side, shorter);
  return {(w - side) / 2, (h - side) / 2, side, side};
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
// Color jitter + PCA lighting (torchvision / reference transforms semantics,
// matching data/pipeline.py::_color_jitter_tf: fixed op order, factors
// uniform in [max(0, 1-x), 1+x], lighting alpha ~ N(0, std)).
// ---------------------------------------------------------------------------

struct JitterParams {
  bool enabled = false;
  float brightness = 0.f, contrast = 0.f, saturation = 0.f, hue = 0.f;
  float lighting_std = 0.f;
};

// ImageNet RGB PCA (AlexNet lighting), rows = eigvecs (see pipeline.py)
constexpr float kEigval[3] = {0.2175f, 0.0188f, 0.0045f};
constexpr float kEigvec[3][3] = {{-0.5675f, 0.7192f, 0.4009f},
                                 {-0.5808f, -0.0045f, -0.8140f},
                                 {-0.5836f, -0.6948f, 0.4203f}};

inline float clamp255(float v) {
  return v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
}

void rgb_to_hsv(float r, float g, float b, float* h, float* s, float* v) {
  float mx = std::max({r, g, b}), mn = std::min({r, g, b});
  *v = mx;
  float d = mx - mn;
  *s = mx <= 0.f ? 0.f : d / mx;
  if (d <= 0.f) {
    *h = 0.f;
    return;
  }
  float hh;
  if (mx == r) {
    hh = (g - b) / d;
    if (hh < 0) hh += 6.f;
  } else if (mx == g) {
    hh = (b - r) / d + 2.f;
  } else {
    hh = (r - g) / d + 4.f;
  }
  *h = hh / 6.f;
}

void hsv_to_rgb(float h, float s, float v, float* r, float* g, float* b) {
  h = h - std::floor(h);
  float hh = h * 6.f;
  int i = int(hh) % 6;
  float f = hh - std::floor(hh);
  float p = v * (1.f - s), q = v * (1.f - s * f), t = v * (1.f - s * (1.f - f));
  switch (i) {
    case 0: *r = v; *g = t; *b = p; break;
    case 1: *r = q; *g = v; *b = p; break;
    case 2: *r = p; *g = v; *b = t; break;
    case 3: *r = p; *g = q; *b = v; break;
    case 4: *r = t; *g = p; *b = v; break;
    default: *r = v; *g = p; *b = q; break;
  }
}

void apply_jitter(std::mt19937& rng, const JitterParams& jp, int size,
                  uint8_t* img) {
  const size_t n = size_t(size) * size;
  auto factor = [&](float x) {
    std::uniform_real_distribution<float> u(std::max(0.f, 1.f - x), 1.f + x);
    return u(rng);
  };
  std::vector<float> buf(n * 3);
  for (size_t i = 0; i < n * 3; ++i) buf[i] = float(img[i]);

  if (jp.brightness > 0.f) {
    float f = factor(jp.brightness);
    for (size_t i = 0; i < n * 3; ++i) buf[i] = clamp255(buf[i] * f);
  }
  if (jp.contrast > 0.f) {
    float f = factor(jp.contrast);
    double mean = 0.0;
    for (size_t i = 0; i < n; ++i) {
      mean += 0.299 * buf[i * 3] + 0.587 * buf[i * 3 + 1] +
              0.114 * buf[i * 3 + 2];
    }
    float m = float(mean / double(n));
    for (size_t i = 0; i < n * 3; ++i) {
      buf[i] = clamp255(buf[i] * f + m * (1.f - f));
    }
  }
  if (jp.saturation > 0.f) {
    float f = factor(jp.saturation);
    for (size_t i = 0; i < n; ++i) {
      float gray = 0.299f * buf[i * 3] + 0.587f * buf[i * 3 + 1] +
                   0.114f * buf[i * 3 + 2];
      for (int c = 0; c < 3; ++c) {
        buf[i * 3 + c] = clamp255(buf[i * 3 + c] * f + gray * (1.f - f));
      }
    }
  }
  if (jp.hue > 0.f) {
    std::uniform_real_distribution<float> u(-jp.hue, jp.hue);
    float delta = u(rng);
    for (size_t i = 0; i < n; ++i) {
      float h, s, v;
      rgb_to_hsv(buf[i * 3] / 255.f, buf[i * 3 + 1] / 255.f,
                 buf[i * 3 + 2] / 255.f, &h, &s, &v);
      float r, g, b;
      hsv_to_rgb(h + delta, s, v, &r, &g, &b);
      buf[i * 3] = clamp255(r * 255.f);
      buf[i * 3 + 1] = clamp255(g * 255.f);
      buf[i * 3 + 2] = clamp255(b * 255.f);
    }
  }
  if (jp.lighting_std > 0.f) {
    std::normal_distribution<float> nd(0.f, jp.lighting_std);
    float alpha[3] = {nd(rng), nd(rng), nd(rng)};
    float shift[3];
    for (int c = 0; c < 3; ++c) {
      shift[c] = 255.f * (kEigvec[c][0] * alpha[0] * kEigval[0] +
                          kEigvec[c][1] * alpha[1] * kEigval[1] +
                          kEigvec[c][2] * alpha[2] * kEigval[2]);
    }
    for (size_t i = 0; i < n; ++i) {
      for (int c = 0; c < 3; ++c) {
        buf[i * 3 + c] = clamp255(buf[i * 3 + c] + shift[c]);
      }
    }
  }
  for (size_t i = 0; i < n * 3; ++i) {
    img[i] = uint8_t(std::lround(buf[i]));
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
  int eval_resize = 0;  // shorter-side resize target (eval mode)
  uint64_t seed = 0;
  JitterParams jitter;
  int64_t padded_total = -1;  // eval: total slots incl. padding; -1 infinite

  struct Buffer {
    std::vector<uint8_t> images;
    std::vector<int32_t> labels;
    std::vector<float> valid;
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

  std::mt19937 sample_rng(int64_t s, int attempt) {
    return std::mt19937(
        uint32_t(seed * 0x9E3779B9ULL + uint64_t(s) * 2654435761ULL +
                 uint64_t(attempt) * 40503ULL));
  }

  void worker_loop(int wid) {
    (void)wid;
    std::vector<uint8_t> filebuf;
    while (!stop.load()) {
      int64_t s = next_sample.fetch_add(1);
      if (padded_total >= 0 && s >= padded_total) return;  // eval: done
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
      uint8_t* out = buf.images.data() + size_t(slot) * size * size * 3;
      if (padded_total >= 0 && s >= int64_t(paths.size())) {
        // eval padding slot past the end of the shard
        std::memset(out, 0, size_t(size) * size * 3);
        buf.labels[slot] = 0;
        buf.valid[slot] = 0.f;
      } else {
        fill_sample(s, filebuf, out, &buf.labels[slot]);
        buf.valid[slot] = 1.f;
      }
      if (buf.filled.fetch_add(1) + 1 == batch) {
        std::lock_guard<std::mutex> lk(mu);
        completed[ring_idx] = batch_id + 1;
        cv_ready.notify_all();
      }
    }
  }

  // Decode + augment one sample. On decode failure in TRAIN mode, resample
  // a different (deterministic) index instead of emitting a black image
  // with the original label; zero-fill only as a last resort.
  void fill_sample(int64_t s, std::vector<uint8_t>& filebuf, uint8_t* out,
                   int32_t* out_label) {
    const int max_attempts = train ? 10 : 1;
    int32_t idx = sample_index(s);
    for (int attempt = 0; attempt < max_attempts; ++attempt) {
      std::mt19937 rng = sample_rng(s, attempt);
      if (attempt > 0) {
        std::uniform_int_distribution<int64_t> alt(0, int64_t(paths.size()) - 1);
        idx = int32_t(alt(rng));
      }
      if (try_fill(rng, idx, filebuf, out)) {
        *out_label = labels[idx];
        return;
      }
      decode_failures.fetch_add(1);
    }
    std::memset(out, 0, size_t(size) * size * 3);  // every attempt corrupt
    *out_label = labels[idx];
  }

  bool try_fill(std::mt19937& rng, int32_t idx, std::vector<uint8_t>& filebuf,
                uint8_t* out) {
    std::ifstream f(paths[idx], std::ios::binary | std::ios::ate);
    if (!f) return false;
    std::streamsize len = f.tellg();
    f.seekg(0);
    filebuf.resize(size_t(len));
    if (!f.read(reinterpret_cast<char*>(filebuf.data()), len)) return false;
    int w = 0, h = 0;
    if (!read_jpeg_dims(filebuf.data(), filebuf.size(), &w, &h) || w <= 0 ||
        h <= 0) {
      return false;
    }
    CropRect r = train ? sample_rrc(rng, w, h)
                       : center_eval_crop(w, h, size, eval_resize);
    // DCT-domain downscale: largest denom keeping crop >= target size
    int denom = 1;
    while (denom < 8 && r.w / (denom * 2) >= size && r.h / (denom * 2) >= size) {
      denom *= 2;
    }
    Image img = decode_jpeg(filebuf.data(), filebuf.size(), denom);
    if (!img.ok) return false;
    CropRect rs{r.x / denom, r.y / denom, std::max(r.w / denom, 1),
                std::max(r.h / denom, 1)};
    rs.x = std::min(rs.x, img.w - rs.w);
    rs.y = std::min(rs.y, img.h - rs.h);
    bool flip = train && (rng() & 1u);
    crop_resize(img, rs, size, flip, out);
    if (train && jitter.enabled) apply_jitter(rng, jitter, size, out);
    return true;
  }
};

}  // namespace

extern "C" {

// jitter: nullptr or float[6] {enabled, brightness, contrast, saturation,
// hue, lighting_std}. train=0 gives the eval pipeline: no shuffle, no
// augmentation, shorter-side(eval_resize)+center-crop, finite (one pass,
// last batch zero-padded with valid=0), dl_next returns 1 at end-of-data.
void* dl_create(const char** paths, const int32_t* labels, int64_t n,
                int32_t batch, int32_t size, int32_t threads, int64_t seed,
                int32_t train, int32_t ring, int64_t start_sample,
                int32_t eval_resize, const float* jitter) {
  if (n <= 0 || batch <= 0 || size <= 0 || start_sample < 0 ||
      start_sample % batch != 0) {
    return nullptr;
  }
  if (!train && eval_resize < size) return nullptr;
  auto* ld = new Loader();
  ld->paths.reserve(size_t(n));
  ld->labels.assign(labels, labels + n);
  for (int64_t i = 0; i < n; ++i) ld->paths.emplace_back(paths[i]);
  ld->batch = batch;
  ld->size = size;
  ld->train = train != 0;
  ld->eval_resize = eval_resize;
  ld->seed = uint64_t(seed);
  ld->ring = std::max(ring, 2);
  if (jitter != nullptr && jitter[0] != 0.f) {
    ld->jitter = {true, jitter[1], jitter[2], jitter[3], jitter[4], jitter[5]};
  }
  if (!ld->train) {
    ld->padded_total = ((n + batch - 1) / batch) * batch;  // one padded pass
  }
  ld->buffers = std::vector<Loader::Buffer>(ld->ring);
  for (auto& b : ld->buffers) {
    b.images.resize(size_t(batch) * size * size * 3);
    b.labels.resize(size_t(batch));
    b.valid.resize(size_t(batch));
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

// Blocks until the next batch (in order) is complete; copies into out
// buffers. Returns 0 = ok, 1 = end of (finite) data, -1 = loader stopped.
// out_valid may be nullptr (train mode: everything valid).
int32_t dl_next(void* handle, uint8_t* out_images, int32_t* out_labels,
                float* out_valid) {
  auto* ld = static_cast<Loader*>(handle);
  int64_t want = ld->next_consumed;
  if (ld->padded_total >= 0 && want * ld->batch >= ld->padded_total) return 1;
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
  if (out_valid != nullptr) {
    std::memcpy(out_valid, buf.valid.data(), buf.valid.size() * sizeof(float));
  }
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
