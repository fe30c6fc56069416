// retr_tpu native preprocessing core.
//
// The reference's per-sample image work runs inside PIL/torchvision C code
// (data_utils/refcoco.py:147-171). This is the equivalent native component for the
// retr_tpu host pipeline: pad-to-square + PIL-BILINEAR-exact fixed-point resize for
// uint8 images, and the reference's mask path (floor/ceil True-padding +
// torch-bilinear 2-tap resize + nonzero cast), with a multithreaded batch API.
//
// Bit-exactness contract: identical output to retr_tpu.ops.image.pil_resize_uint8 /
// pad_uint8_to_square / pad_mask_to_square + resize_mask_torch_semantics (the numpy
// implementations are the executable spec; tests/test_native.py enforces equality).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libretr_preprocess.so preprocess.cc -lpthread

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow Resample.c

// round-half-to-even (Python round / PIL ImageOps.pad centering)
inline long round_half_even(double x) {
  double r = std::nearbyint(x);  // default FE_TONEAREST = half-to-even
  return static_cast<long>(r);
}

struct Coeffs {
  // sparse per-output-pixel support windows (PIL-style): bounds[o] = {xmin, count},
  // k packed at o*kmax. Only ~2*scale taps per output pixel are nonzero.
  std::vector<int64_t> k;
  std::vector<int> xmin;
  std::vector<int> count;
  int kmax = 0;
  int in_size = 0;
  int out_size = 0;
};

// PIL precompute_coeffs for BILINEAR (support=1), quantized like Pillow 8bpc.
Coeffs pil_coeffs(int in_size, int out_size) {
  Coeffs c;
  c.in_size = in_size;
  c.out_size = out_size;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;
  const double inv = 1.0 / filterscale;
  c.kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.k.assign(static_cast<size_t>(out_size) * c.kmax, 0);
  c.xmin.resize(out_size);
  c.count.resize(out_size);
  std::vector<double> w(c.kmax);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = std::max(static_cast<int>(center - support + 0.5), 0);
    int xmax = std::min(static_cast<int>(center + support + 0.5), in_size);
    int n = xmax - xmin;
    double ssum = 0.0;
    for (int i = 0; i < n; ++i) {
      double v = 1.0 - std::fabs((xmin + i - center + 0.5) * inv);
      if (v < 0.0) v = 0.0;
      w[i] = v;
      ssum += v;
    }
    int64_t* krow = c.k.data() + static_cast<size_t>(xx) * c.kmax;
    for (int i = 0; i < n; ++i) {
      double kk = (ssum != 0.0) ? (w[i] / ssum) : 0.0;
      double scaled = kk * (1 << kPrecisionBits);
      krow[i] = static_cast<int64_t>(scaled < 0 ? scaled - 0.5 : scaled + 0.5);
    }
    c.xmin[xx] = xmin;
    c.count[xx] = n;
  }
  return c;
}

inline uint8_t clip8(int64_t acc) {
  int64_t v = acc >> kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<uint8_t>(v);
}

// Resize a uint8 HWC image (already square, side m) to out x out, PIL-exact:
// horizontal pass then vertical pass with per-pass rounding, support-window loops.
void pil_resize_square(const uint8_t* img, int m, int channels, int out,
                       uint8_t* dst) {
  Coeffs cw = pil_coeffs(m, out);
  const int64_t half = 1LL << (kPrecisionBits - 1);
  // horizontal: [m, out, C]
  std::vector<uint8_t> tmp(static_cast<size_t>(m) * out * channels);
  for (int y = 0; y < m; ++y) {
    const uint8_t* row = img + static_cast<size_t>(y) * m * channels;
    for (int ox = 0; ox < out; ++ox) {
      const int64_t* krow = cw.k.data() + static_cast<size_t>(ox) * cw.kmax;
      const uint8_t* src = row + static_cast<size_t>(cw.xmin[ox]) * channels;
      const int n = cw.count[ox];
      for (int ch = 0; ch < channels; ++ch) {
        int64_t acc = half;
        for (int i = 0; i < n; ++i)
          acc += krow[i] * src[static_cast<size_t>(i) * channels + ch];
        tmp[(static_cast<size_t>(y) * out + ox) * channels + ch] = clip8(acc);
      }
    }
  }
  // vertical: [out, out, C]
  const size_t row_stride = static_cast<size_t>(out) * channels;
  for (int oy = 0; oy < out; ++oy) {
    const int64_t* krow = cw.k.data() + static_cast<size_t>(oy) * cw.kmax;
    const uint8_t* base = tmp.data() + static_cast<size_t>(cw.xmin[oy]) * row_stride;
    const int n = cw.count[oy];
    for (int ox = 0; ox < out; ++ox) {
      for (int ch = 0; ch < channels; ++ch) {
        int64_t acc = half;
        const size_t off = static_cast<size_t>(ox) * channels + ch;
        for (int i = 0; i < n; ++i)
          acc += krow[i] * base[static_cast<size_t>(i) * row_stride + off];
        dst[static_cast<size_t>(oy) * row_stride + off] = clip8(acc);
      }
    }
  }
}

// pad to square (black fill, ImageOps.pad banker's-round centering) into buf.
void pad_square_image(const uint8_t* img, int h, int w, int channels,
                      std::vector<uint8_t>* buf, int* m_out) {
  int m = std::max(h, w);
  *m_out = m;
  buf->assign(static_cast<size_t>(m) * m * channels, 0);
  long y0 = 0, x0 = 0;
  if (w < m) x0 = round_half_even((m - w) * 0.5);
  else if (h < m) y0 = round_half_even((m - h) * 0.5);
  for (int y = 0; y < h; ++y) {
    std::memcpy(buf->data() + ((y0 + y) * static_cast<size_t>(m) + x0) * channels,
                img + static_cast<size_t>(y) * w * channels,
                static_cast<size_t>(w) * channels);
  }
}

// mask: pad True (1) with floor/ceil centering (utils.py:242-256), then
// torch-bilinear (align_corners=false, antialias=false) resize; out = any
// positive-weight tap hits a True pixel.
void pad_resize_mask(const uint8_t* mask, int h, int w, int out, uint8_t* dst) {
  int m = std::max(h, w);
  std::vector<uint8_t> sq(static_cast<size_t>(m) * m, 1);
  long y0 = 0, x0 = 0;
  if (w < m) x0 = (m - w) / 2;        // floor leading
  else if (h < m) y0 = (m - h) / 2;
  for (int y = 0; y < h; ++y)
    std::memcpy(sq.data() + (y0 + y) * static_cast<size_t>(m) + x0,
                mask + static_cast<size_t>(y) * w, w);

  const double scale = static_cast<double>(m) / out;
  std::vector<int> t0(out), t1(out);
  std::vector<double> f1(out);
  for (int o = 0; o < out; ++o) {
    double src = std::max((o + 0.5) * scale - 0.5, 0.0);
    int a = std::min(static_cast<int>(std::floor(src)), m - 1);
    int b = std::min(a + 1, m - 1);
    t0[o] = a;
    t1[o] = b;
    f1[o] = src - a;
  }
  // nonzero-sum semantics: True iff any tap with weight > 0 is True.
  for (int oy = 0; oy < out; ++oy) {
    for (int ox = 0; ox < out; ++ox) {
      double w00 = (1.0 - f1[oy]) * (1.0 - f1[ox]);
      double w01 = (1.0 - f1[oy]) * f1[ox];
      double w10 = f1[oy] * (1.0 - f1[ox]);
      double w11 = f1[oy] * f1[ox];
      bool v = false;
      if (w00 > 0.0 && sq[static_cast<size_t>(t0[oy]) * m + t0[ox]]) v = true;
      if (!v && w01 > 0.0 && sq[static_cast<size_t>(t0[oy]) * m + t1[ox]]) v = true;
      if (!v && w10 > 0.0 && sq[static_cast<size_t>(t1[oy]) * m + t0[ox]]) v = true;
      if (!v && w11 > 0.0 && sq[static_cast<size_t>(t1[oy]) * m + t1[ox]]) v = true;
      dst[static_cast<size_t>(oy) * out + ox] = v ? 1 : 0;
    }
  }
}

}  // namespace

extern "C" {

// Single image: pad-to-square + PIL-exact resize. dst is out*out*channels.
int retr_pad_resize_image(const uint8_t* img, int h, int w, int channels,
                          int out, uint8_t* dst) {
  if (h <= 0 || w <= 0 || out <= 0 || channels <= 0) return -1;
  std::vector<uint8_t> sq;
  int m = 0;
  pad_square_image(img, h, w, channels, &sq, &m);
  pil_resize_square(sq.data(), m, channels, out, dst);
  return 0;
}

int retr_pad_resize_mask(const uint8_t* mask, int h, int w, int out, uint8_t* dst) {
  if (h <= 0 || w <= 0 || out <= 0) return -1;
  pad_resize_mask(mask, h, w, out, dst);
  return 0;
}

// Batched, multithreaded: images given as a packed array of per-sample (h, w)
// variable-size buffers via offsets.
int retr_pad_resize_batch(const uint8_t* data, const int64_t* offsets,
                          const int32_t* heights, const int32_t* widths, int n,
                          int channels, int out, uint8_t* dst, int n_threads) {
  if (n <= 0) return -1;
  n_threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  auto work = [&](int t) {
    for (int i = t; i < n; i += n_threads) {
      retr_pad_resize_image(data + offsets[i], heights[i], widths[i], channels,
                            out, dst + static_cast<size_t>(i) * out * out * channels);
    }
  };
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
