// Single-core CPU baseline for the ALICE-Codec reference pipeline.
//
// The reference publishes throughput TARGETS only (README.md:516-521) and
// no measured numbers (BASELINE.md), and this rig has no Rust toolchain to
// compile the reference itself.  This file is a faithful single-threaded
// C++ re-implementation of the reference's chunk pipeline — the SAME
// algorithms with the SAME integer arithmetic, compiled -O3 on the bench
// host — so the `vs_baseline` ratio can divide by a MEASURED number on the
// IDENTICAL bench content instead of a stated target.
//
// Pipeline mirrored (behavior, not code):
//   - RGB -> YCoCg-R planar i16            (src/color.rs:75-112)
//   - pad to even dims, edge replicate     (src/pipeline.rs:77-115)
//   - 3-D lifting wavelet, i32 coeffs      (src/wavelet.rs:133-217,392-484)
//   - dead-zone quantizer, dead_zone=step  (src/quant.rs:70-97)
//   - zigzag i32 -> u8 symbols (u8 wrap)   (src/quant.rs:547-563)
//   - histogram + 12-bit freq table        (src/rans.rs:102-150)
//   - byte rANS, serial per channel        (src/rans.rs:246-381)
//   - optional 4-lane interleaved rANS     (src/rans.rs:441-618, the
//     README's AVX2 SimdRansDecoder claim) as the generous fast variant
//
// The chunk path of the reference uses the SERIAL coder both ways
// (src/pipeline.rs:482-486, 585); `--ilv4` measures the interleaved
// variant as an upper bound for the reference's stated 500 fps decode.
//
// Usage:
//   baseline_ref <raw_u8_file> <w> <h> <t> <quality> <wavelet 0|1|2>
//                <iters> <mode 0|1>
// Prints one JSON line with encode/decode seconds per chunk and PSNR.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <cmath>
#include <string>
#include <vector>

namespace {

constexpr int kProbBits = 12;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint32_t kRansL = 1u << 23;

// ── color (src/color.rs:75-112) ─────────────────────────────────

void rgb_to_ycocg(const uint8_t* rgb, int64_t n, int16_t* y, int16_t* co,
                  int16_t* cg) {
  for (int64_t i = 0; i < n; ++i) {
    int16_t r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    int16_t co_v = static_cast<int16_t>(r - b);
    int16_t t = static_cast<int16_t>(b + (co_v >> 1));
    int16_t cg_v = static_cast<int16_t>(g - t);
    y[i] = static_cast<int16_t>(t + (cg_v >> 1));
    co[i] = co_v;
    cg[i] = cg_v;
  }
}

inline uint8_t clamp_u8(int v) { return v < 0 ? 0 : (v > 255 ? 255 : v); }

void ycocg_to_rgb(const int16_t* y, const int16_t* co, const int16_t* cg,
                  int64_t n, uint8_t* rgb) {
  for (int64_t i = 0; i < n; ++i) {
    int16_t t = static_cast<int16_t>(y[i] - (cg[i] >> 1));
    int16_t g = static_cast<int16_t>(cg[i] + t);
    int16_t b = static_cast<int16_t>(t - (co[i] >> 1));
    int16_t r = static_cast<int16_t>(co[i] + b);
    rgb[3 * i] = clamp_u8(r);
    rgb[3 * i + 1] = clamp_u8(g);
    rgb[3 * i + 2] = clamp_u8(b);
  }
}

// ── wavelet (src/wavelet.rs) ────────────────────────────────────

struct LiftStep {
  int32_t coeff;
  bool predict;
};

// Fixed-point lifting coefficients, scale 2^13 (src/wavelet.rs:96-129).
const LiftStep kCdf97[] = {
    {-6497, true}, {-217, false}, {3616, true}, {1817, false}};
const LiftStep kHaar[] = {{-4096, true}, {2048, false}};
const LiftStep kCdf53[] = {{-4096, true}, {1024, false}};

struct Wavelet {
  const LiftStep* steps;
  int n_steps;
};

Wavelet wavelet_for(int type) {
  switch (type) {
    case 1:
      return {kCdf97, 4};
    case 2:
      return {kHaar, 2};
    default:
      return {kCdf53, 2};
  }
}

// One lifting pass over a contiguous line, in place (src/wavelet.rs:180-217).
void lift_line(int32_t* s, int n, int32_t coeff, bool predict, bool inverse) {
  int64_t c = inverse ? -static_cast<int64_t>(coeff) : coeff;
  int half = n / 2;
  if (predict) {
    for (int i = 0; i < half; ++i) {
      int32_t el = s[2 * i];
      int32_t er = (2 * i + 2 < n) ? s[2 * i + 2] : s[2 * i];
      int64_t delta = ((static_cast<int64_t>(el) + er) * c + 4096) >> 13;
      s[2 * i + 1] += static_cast<int32_t>(delta);
    }
  } else {
    for (int i = 0; i < half; ++i) {
      int32_t ol = (i > 0) ? s[2 * i - 1] : s[1];
      int32_t orr = s[2 * i + 1];
      int64_t delta = ((static_cast<int64_t>(ol) + orr) * c + 4096) >> 13;
      s[2 * i] += static_cast<int32_t>(delta);
    }
  }
}

void forward_1d(int32_t* line, int32_t* tmp, int n, const Wavelet& w) {
  if (n < 2) return;
  for (int k = 0; k < w.n_steps; ++k)
    lift_line(line, n, w.steps[k].coeff, w.steps[k].predict, false);
  int half = n / 2;
  for (int i = 0; i < half; ++i) {
    tmp[i] = line[2 * i];
    tmp[half + i] = line[2 * i + 1];
  }
  std::memcpy(line, tmp, sizeof(int32_t) * n);
}

void inverse_1d(int32_t* line, int32_t* tmp, int n, const Wavelet& w) {
  if (n < 2) return;
  int half = n / 2;
  for (int i = 0; i < half; ++i) {
    tmp[2 * i] = line[i];
    tmp[2 * i + 1] = line[half + i];
  }
  std::memcpy(line, tmp, sizeof(int32_t) * n);
  for (int k = w.n_steps - 1; k >= 0; --k)
    lift_line(line, n, w.steps[k].coeff, w.steps[k].predict, true);
}

// 3-D transform: per-frame rows then columns, then temporal
// (src/wavelet.rs:392-438).  Columns/temporal lines are gathered into a
// contiguous scratch line (cache-friendly single-core form).
void forward_3d(int32_t* vol, int w, int h, int f, const Wavelet& wv) {
  std::vector<int32_t> line(std::max(std::max(w, h), f));
  std::vector<int32_t> tmp(line.size());
  for (int t = 0; t < f; ++t) {
    int32_t* frame = vol + static_cast<int64_t>(t) * w * h;
    for (int y = 0; y < h; ++y) forward_1d(frame + y * w, tmp.data(), w, wv);
    for (int x = 0; x < w; ++x) {
      for (int y = 0; y < h; ++y) line[y] = frame[y * w + x];
      forward_1d(line.data(), tmp.data(), h, wv);
      for (int y = 0; y < h; ++y) frame[y * w + x] = line[y];
    }
  }
  int64_t fs = static_cast<int64_t>(w) * h;
  for (int64_t i = 0; i < fs; ++i) {
    for (int t = 0; t < f; ++t) line[t] = vol[t * fs + i];
    forward_1d(line.data(), tmp.data(), f, wv);
    for (int t = 0; t < f; ++t) vol[t * fs + i] = line[t];
  }
}

void inverse_3d(int32_t* vol, int w, int h, int f, const Wavelet& wv) {
  std::vector<int32_t> line(std::max(std::max(w, h), f));
  std::vector<int32_t> tmp(line.size());
  int64_t fs = static_cast<int64_t>(w) * h;
  for (int64_t i = 0; i < fs; ++i) {
    for (int t = 0; t < f; ++t) line[t] = vol[t * fs + i];
    inverse_1d(line.data(), tmp.data(), f, wv);
    for (int t = 0; t < f; ++t) vol[t * fs + i] = line[t];
  }
  for (int t = 0; t < f; ++t) {
    int32_t* frame = vol + static_cast<int64_t>(t) * fs;
    for (int x = 0; x < w; ++x) {
      for (int y = 0; y < h; ++y) line[y] = frame[y * w + x];
      inverse_1d(line.data(), tmp.data(), h, wv);
      for (int y = 0; y < h; ++y) frame[y * w + x] = line[y];
    }
    for (int y = 0; y < h; ++y) inverse_1d(frame + y * w, tmp.data(), w, wv);
  }
}

// ── quantizer + symbols (src/quant.rs) ──────────────────────────

void quantize_buffer(const int32_t* in, int64_t n, int32_t step,
                     int32_t dead_zone, int32_t* out) {
  int32_t off = dead_zone / 2;
  for (int64_t i = 0; i < n; ++i) {
    int32_t v = in[i];
    int32_t a = v < 0 ? -v : v;
    // truncating division toward zero, as Rust `/` (src/quant.rs:89-97)
    out[i] = (a < dead_zone) ? 0 : (v >= 0 ? (v - off) / step : (v + off) / step);
  }
}

void to_symbols(const int32_t* q, int64_t n, uint8_t* sym) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t c = q[i];
    sym[i] = c == 0 ? 0
             : c > 0 ? static_cast<uint8_t>(c * 2 - 1)
                     : static_cast<uint8_t>(-c * 2);
  }
}

void from_symbols(const uint8_t* sym, int64_t n, int32_t* q) {
  for (int64_t i = 0; i < n; ++i) {
    uint8_t s = sym[i];
    q[i] = s == 0 ? 0 : (s & 1) ? (s + 1) / 2 : -(s / 2);
  }
}

// ── rANS (src/rans.rs) ──────────────────────────────────────────

struct FreqTable {
  uint16_t freqs[256];
  uint16_t cums[256];
  std::vector<uint8_t> cum_to_sym;  // kProbScale entries
};

void freq_table_from_histogram(const uint32_t* hist, FreqTable* ft) {
  // Normalization per src/rans.rs:102-141, with one fix: the reference's
  // last-symbol adjustment wraps `as u16` when the +1-per-zero-count
  // minimums over-subscribe PROB_SCALE, which corrupts rare symbols on
  // any peaked real-content histogram (a latent reference defect; the
  // TPU codec documents it and encodes with a sanitized retry —
  // ops/rans.py:87-120).  The baseline steals the excess from the
  // largest frequencies instead so the measured roundtrip is valid;
  // table-build time is unchanged (it is off the per-symbol hot path).
  uint64_t total = 0;
  for (int i = 0; i < 256; ++i) total += hist[i];
  uint64_t f32[256];
  uint64_t norm = 0;
  for (int i = 0; i < 256; ++i) {
    uint64_t freq;
    if (total == 0) {
      freq = kProbScale / 256;  // uniform fallback (src/rans.rs:158-189)
    } else if (hist[i] == 0) {
      freq = 1;
    } else {
      uint64_t f = (static_cast<uint64_t>(hist[i]) * kProbScale) / total;
      freq = f < 1 ? 1 : f;
    }
    f32[i] = freq;
    norm += freq;
  }
  while (norm > kProbScale) {
    int imax = 0;
    for (int i = 1; i < 256; ++i)
      if (f32[i] > f32[imax]) imax = i;
    uint64_t take = std::min<uint64_t>(norm - kProbScale, f32[imax] - 1);
    if (take == 0) break;
    f32[imax] -= take;
    norm -= take;
  }
  uint32_t cum = 0;
  for (int i = 0; i < 256; ++i) {
    ft->cums[i] = static_cast<uint16_t>(cum);
    ft->freqs[i] = static_cast<uint16_t>(f32[i]);
    cum += f32[i];
  }
  if (total != 0 && cum != kProbScale)
    ft->freqs[255] =
        static_cast<uint16_t>(ft->freqs[255] + (kProbScale - cum));
  ft->cum_to_sym.assign(kProbScale, 0);
  for (int s = 0; s < 256; ++s) {
    uint32_t start = ft->cums[s];
    uint32_t end = start + ft->freqs[s];
    if (end > kProbScale) end = kProbScale;
    for (uint32_t j = start; j < end; ++j) ft->cum_to_sym[j] = s;
  }
}

// Serial coder (src/rans.rs:246-381): encode in reverse, byte renorm.
void rans_encode(const uint8_t* sym, int64_t n, const FreqTable& ft,
                 std::vector<uint8_t>* out) {
  out->clear();
  uint32_t state = kRansL;
  for (int64_t i = n - 1; i >= 0; --i) {
    uint32_t f = ft.freqs[sym[i]], c = ft.cums[sym[i]];
    uint32_t x_max = ((kRansL >> kProbBits) << 8) * f;
    while (state >= x_max) {
      out->push_back(state & 0xFF);
      state >>= 8;
    }
    state = ((state / f) << kProbBits) + (state % f) + c;
  }
  for (int s = 0; s < 32; s += 8) out->push_back((state >> s) & 0xFF);
  // stream is built backwards; reverse once
  for (size_t i = 0, j = out->size() - 1; i < j; ++i, --j)
    std::swap((*out)[i], (*out)[j]);
}

void rans_decode(const uint8_t* data, int64_t len, int64_t n,
                 const FreqTable& ft, uint8_t* out) {
  uint32_t state = 0;
  int64_t pos = 0;
  if (len >= 4) {
    state = (uint32_t(data[0]) << 24) | (uint32_t(data[1]) << 16) |
            (uint32_t(data[2]) << 8) | data[3];
    pos = 4;
  }
  for (int64_t i = 0; i < n; ++i) {
    uint32_t slot = state & (kProbScale - 1);
    uint8_t s = ft.cum_to_sym[slot];
    state = ft.freqs[s] * (state >> kProbBits) + slot - ft.cums[s];
    while (state < kRansL && pos < len) state = (state << 8) | data[pos++];
    out[i] = s;
  }
}

// 4-lane interleaved coder (src/rans.rs:441-618): symbols round-robin
// across 4 independent states; per-lane streams are concatenated with a
// 4×u32 length prefix.  This is the upper-bound variant for the README's
// "4-stream AVX2 SimdRansDecoder" 500 fps decode claim.
void rans_encode4(const uint8_t* sym, int64_t n, const FreqTable& ft,
                  std::vector<uint8_t>* out) {
  std::vector<uint8_t> lanes[4];
  uint32_t states[4] = {kRansL, kRansL, kRansL, kRansL};
  for (int64_t i = n - 1; i >= 0; --i) {
    int k = static_cast<int>(i & 3);
    uint32_t f = ft.freqs[sym[i]], c = ft.cums[sym[i]];
    uint32_t x_max = ((kRansL >> kProbBits) << 8) * f;
    uint32_t st = states[k];
    while (st >= x_max) {
      lanes[k].push_back(st & 0xFF);
      st >>= 8;
    }
    states[k] = ((st / f) << kProbBits) + (st % f) + c;
  }
  out->clear();
  for (int k = 0; k < 4; ++k) {
    for (int s = 0; s < 32; s += 8) lanes[k].push_back((states[k] >> s) & 0xFF);
    for (size_t i = 0, j = lanes[k].size() - 1; i < j; ++i, --j)
      std::swap(lanes[k][i], lanes[k][j]);
  }
  for (int k = 0; k < 4; ++k) {
    uint32_t l = lanes[k].size();
    for (int s = 0; s < 32; s += 8) out->push_back((l >> s) & 0xFF);
  }
  for (int k = 0; k < 4; ++k)
    out->insert(out->end(), lanes[k].begin(), lanes[k].end());
}

void rans_decode4(const uint8_t* data, int64_t len, int64_t n,
                  const FreqTable& ft, uint8_t* out) {
  if (len < 16) return;
  const uint8_t* p = data;
  int64_t lane_len[4];
  for (int k = 0; k < 4; ++k) {
    lane_len[k] = p[0] | (p[1] << 8) | (p[2] << 16) |
                  (static_cast<int64_t>(p[3]) << 24);
    p += 4;
  }
  const uint8_t* lp[4];
  const uint8_t* le[4];
  uint32_t states[4];
  for (int k = 0; k < 4; ++k) {
    lp[k] = p;
    le[k] = p + lane_len[k];
    p += lane_len[k];
    states[k] = 0;
    if (lane_len[k] >= 4) {
      states[k] = (uint32_t(lp[k][0]) << 24) | (uint32_t(lp[k][1]) << 16) |
                  (uint32_t(lp[k][2]) << 8) | lp[k][3];
      lp[k] += 4;
    }
  }
  for (int64_t i = 0; i < n; ++i) {
    int k = static_cast<int>(i & 3);
    uint32_t slot = states[k] & (kProbScale - 1);
    uint8_t s = ft.cum_to_sym[slot];
    uint32_t st = ft.freqs[s] * (states[k] >> kProbBits) + slot - ft.cums[s];
    while (st < kRansL && lp[k] < le[k]) st = (st << 8) | *lp[k]++;
    states[k] = st;
    out[i] = s;
  }
}

// ── chunk pipeline (src/pipeline.rs:377-506, 537-618) ───────────

struct Encoded {
  int64_t padded_pixels;
  int32_t step;
  std::vector<uint8_t> streams[3];
  FreqTable tables[3];
};

struct Dims {
  int w, h, f, pw, ph, pf;
};

Dims padded_dims(int w, int h, int f) {
  Dims d;
  d.w = w;
  d.h = h;
  d.f = f;
  d.pw = w + (w & 1);
  d.ph = h + (h & 1);
  d.pf = (f == 1) ? 2 : f + (f & 1);
  return d;
}

void pad_channel(const int16_t* ch, const Dims& d, int32_t* buf) {
  int64_t pfs = static_cast<int64_t>(d.pw) * d.ph;
  std::memset(buf, 0, sizeof(int32_t) * pfs * d.pf);
  for (int t = 0; t < d.f; ++t) {
    for (int y = 0; y < d.h; ++y) {
      const int16_t* src = ch + (static_cast<int64_t>(t) * d.h + y) * d.w;
      int32_t* dst = buf + t * pfs + static_cast<int64_t>(y) * d.pw;
      for (int x = 0; x < d.w; ++x) dst[x] = src[x];
      if (d.pw > d.w) dst[d.w] = src[d.w - 1];
    }
    if (d.ph > d.h) {
      int32_t* row = buf + t * pfs + static_cast<int64_t>(d.h - 1) * d.pw;
      std::memcpy(row + d.pw, row, sizeof(int32_t) * d.pw);
    }
  }
  for (int t = d.f; t < d.pf; ++t)
    std::memcpy(buf + t * pfs, buf + (d.f - 1) * pfs, sizeof(int32_t) * pfs);
}

void crop_channel(const int32_t* buf, const Dims& d, int16_t* ch) {
  int64_t pfs = static_cast<int64_t>(d.pw) * d.ph;
  for (int t = 0; t < d.f; ++t)
    for (int y = 0; y < d.h; ++y) {
      const int32_t* src = buf + t * pfs + static_cast<int64_t>(y) * d.pw;
      int16_t* dst = ch + (static_cast<int64_t>(t) * d.h + y) * d.w;
      for (int x = 0; x < d.w; ++x) dst[x] = static_cast<int16_t>(src[x]);
    }
}

void encode_chunk(const int16_t* const chans[3], const Dims& d, int quality,
                  const Wavelet& wv, bool ilv4, Encoded* enc,
                  std::vector<int32_t>* scratch, std::vector<int32_t>* qbuf,
                  std::vector<uint8_t>* sym) {
  int64_t pp = static_cast<int64_t>(d.pw) * d.ph * d.pf;
  enc->padded_pixels = pp;
  int q = quality > 100 ? 100 : quality;
  enc->step = std::max(64 - (q * 63) / 100, 1);  // src/pipeline.rs:456-459
  scratch->resize(pp);
  qbuf->resize(pp);
  sym->resize(pp);
  for (int c = 0; c < 3; ++c) {
    pad_channel(chans[c], d, scratch->data());
    forward_3d(scratch->data(), d.pw, d.ph, d.pf, wv);
    quantize_buffer(scratch->data(), pp, enc->step, enc->step, qbuf->data());
    to_symbols(qbuf->data(), pp, sym->data());
    uint32_t hist[256] = {0};
    for (int64_t i = 0; i < pp; ++i) ++hist[(*sym)[i]];
    freq_table_from_histogram(hist, &enc->tables[c]);
    if (ilv4)
      rans_encode4(sym->data(), pp, enc->tables[c], &enc->streams[c]);
    else
      rans_encode(sym->data(), pp, enc->tables[c], &enc->streams[c]);
  }
}

void decode_chunk(const Encoded& enc, const Dims& d, const Wavelet& wv,
                  bool ilv4, uint8_t* rgb_out, std::vector<int32_t>* scratch,
                  std::vector<uint8_t>* sym, std::vector<int16_t>* planes) {
  int64_t pp = enc.padded_pixels;
  int64_t n = static_cast<int64_t>(d.w) * d.h * d.f;
  scratch->resize(pp);
  sym->resize(pp);
  planes->resize(3 * n);
  int16_t* chans[3] = {planes->data(), planes->data() + n,
                       planes->data() + 2 * n};
  for (int c = 0; c < 3; ++c) {
    if (ilv4)
      rans_decode4(enc.streams[c].data(), enc.streams[c].size(), pp,
                   enc.tables[c], sym->data());
    else
      rans_decode(enc.streams[c].data(), enc.streams[c].size(), pp,
                  enc.tables[c], sym->data());
    from_symbols(sym->data(), pp, scratch->data());
    for (int64_t i = 0; i < pp; ++i) (*scratch)[i] *= enc.step;
    inverse_3d(scratch->data(), d.pw, d.ph, d.pf, wv);
    crop_channel(scratch->data(), d, chans[c]);
  }
  ycocg_to_rgb(chans[0], chans[1], chans[2], n, rgb_out);
}

}  // namespace

static int self_test() {
  // wavelet 3D roundtrip (compat: |err| <= 1 for cdf53/haar on small values)
  srand(7);
  for (int wt = 0; wt < 3; ++wt) {
    Wavelet wv = wavelet_for(wt);
    int w = 16, h = 12, f = 4;
    std::vector<int32_t> a(w * h * f), b;
    for (auto& v : a) v = rand() % 256;
    b = a;
    forward_3d(b.data(), w, h, f, wv);
    inverse_3d(b.data(), w, h, f, wv);
    int maxe = 0;
    for (size_t i = 0; i < a.size(); ++i)
      maxe = std::max(maxe, std::abs(a[i] - b[i]));
    std::printf("wavelet %d roundtrip max err: %d\n", wt, maxe);
  }
  // rANS roundtrip
  std::vector<uint8_t> sym(10000);
  for (auto& s : sym) s = rand() % 8 ? 0 : rand() % 256;
  uint32_t hist[256] = {0};
  for (auto s : sym) ++hist[s];
  FreqTable ft;
  freq_table_from_histogram(hist, &ft);
  std::vector<uint8_t> stream, back(sym.size());
  rans_encode(sym.data(), sym.size(), ft, &stream);
  rans_decode(stream.data(), stream.size(), sym.size(), ft, back.data());
  std::printf("rans serial match: %d\n", sym == back);
  rans_encode4(sym.data(), sym.size(), ft, &stream);
  rans_decode4(stream.data(), stream.size(), sym.size(), ft, back.data());
  std::printf("rans ilv4 match: %d\n", sym == back);
  // zigzag + quant sanity
  for (int v = -300; v <= 300; ++v) {
    int32_t q[1], v2[1];
    uint8_t s[1];
    int32_t in[1] = {v};
    quantize_buffer(in, 1, 1, 1, q);
    to_symbols(q, 1, s);
    from_symbols(s, 1, v2);
    if (std::abs(v) < 128 && v2[0] != q[0])
      std::printf("zigzag mismatch at %d: %d != %d\n", v, v2[0], q[0]);
  }
  std::printf("zigzag ok\n");
  // color roundtrip
  std::vector<uint8_t> rgb(3 * 1000), rgb2(3 * 1000);
  for (auto& v : rgb) v = rand() & 0xFF;
  std::vector<int16_t> y(1000), co(1000), cg(1000);
  rgb_to_ycocg(rgb.data(), 1000, y.data(), co.data(), cg.data());
  ycocg_to_rgb(y.data(), co.data(), cg.data(), 1000, rgb2.data());
  std::printf("color match: %d\n", rgb == rgb2);
  return 0;
}

static int debug_dump(const char* path, int w, int h, int f, int q, int wt) {
  int64_t n = static_cast<int64_t>(w) * h * f;
  std::vector<uint8_t> rgb(n * 3);
  FILE* fp = std::fopen(path, "rb");
  if (!fp || std::fread(rgb.data(), 1, rgb.size(), fp) != rgb.size()) return 1;
  std::fclose(fp);
  Dims d = padded_dims(w, h, f);
  Wavelet wv = wavelet_for(wt);
  std::vector<int16_t> y(n), co(n), cg(n);
  rgb_to_ycocg(rgb.data(), n, y.data(), co.data(), cg.data());
  int64_t pp = static_cast<int64_t>(d.pw) * d.ph * d.pf;
  int32_t step = std::max(64 - (std::min(q, 100) * 63) / 100, 1);
  std::vector<int32_t> buf(pp), qb(pp);
  std::vector<uint8_t> sym(pp);
  pad_channel(y.data(), d, buf.data());
  forward_3d(buf.data(), d.pw, d.ph, d.pf, wv);
  int32_t mn = buf[0], mx = buf[0];
  for (auto v : buf) { mn = std::min(mn, v); mx = std::max(mx, v); }
  std::printf("fwd coeff range: %d %d\n", mn, mx);
  quantize_buffer(buf.data(), pp, step, step, qb.data());
  to_symbols(qb.data(), pp, sym.data());
  FILE* o = std::fopen("/tmp/dbg_fwd.bin", "wb");
  std::fwrite(buf.data(), 4, pp, o);
  std::fclose(o);
  o = std::fopen("/tmp/dbg_sym.bin", "wb");
  std::fwrite(sym.data(), 1, pp, o);
  std::fclose(o);
  // decode half
  uint32_t hist[256] = {0};
  for (int64_t i = 0; i < pp; ++i) ++hist[sym[i]];
  FreqTable ft;
  freq_table_from_histogram(hist, &ft);
  std::vector<uint8_t> stream, back(pp);
  rans_encode(sym.data(), pp, ft, &stream);
  rans_decode(stream.data(), stream.size(), pp, ft, back.data());
  std::printf("entropy roundtrip match: %d\n", sym == back);
  from_symbols(back.data(), pp, qb.data());
  for (int64_t i = 0; i < pp; ++i) qb[i] *= step;
  inverse_3d(qb.data(), d.pw, d.ph, d.pf, wv);
  o = std::fopen("/tmp/dbg_inv.bin", "wb");
  std::fwrite(qb.data(), 4, pp, o);
  std::fclose(o);
  std::printf("dumped fwd/sym/inv for channel Y, pp=%lld pw=%d ph=%d pf=%d\n",
              static_cast<long long>(pp), d.pw, d.ph, d.pf);
  return 0;
}

// ── golden `.alc` fixture emitter (cross-implementation interop) ──
//
// Emits real `.alc` containers (src/pipeline.rs:200-226 layout) from the
// deterministic golden input (alice_codec_tpu/utils/golden.py formula) so
// the committed fixtures in tests/golden/cpp/ are produced by THIS
// independent C++ implementation and cross-checked byte-for-byte against
// the JAX package's encoder/decoder (tests/test_golden.py).
//
// Table selection mirrors the package pipeline (pipeline.py encode /
// _decode_channel): encode with the REFERENCE-EXACT normalization first
// (incl. its u16-wrap last-symbol defect, src/rans.rs:116-150); if a slot
// crosses PROB_SCALE during encoding (the overflow regime where a
// reference decoder corrupts the stream), re-encode with the sanitized
// table.  The decoder picks the table via the rANS final-state invariant.

static void golden_fill(int w, int h, int f, uint8_t* out) {
  // v(x,y,t,c) = (3x + 5y + 7t + 11c + ((x+1)(y+2)(t+3) mod 251)) mod 256
  int64_t i = 0;
  for (int64_t t = 0; t < f; ++t)
    for (int64_t y = 0; y < h; ++y)
      for (int64_t x = 0; x < w; ++x) {
        uint64_t mix = ((x + 1) * (y + 2) * (t + 3)) % 251;
        for (uint64_t c = 0; c < 3; ++c)
          out[i++] = static_cast<uint8_t>(
              (3 * uint64_t(x) + 5 * uint64_t(y) + 7 * uint64_t(t) +
               11 * c + mix) % 256);
      }
}

static void freq_table_reference(const uint32_t* hist, FreqTable* ft) {
  // Reference-exact normalization (src/rans.rs:102-150): min freq 1,
  // last-symbol diff adjustment with u16 wrap, LUT overwrite-in-order
  // with end clamp.  May produce an over-subscribed (defective) table.
  uint64_t total = 0;
  for (int i = 0; i < 256; ++i) total += hist[i];
  uint64_t f64[256];
  if (total == 0) {
    for (int i = 0; i < 256; ++i) f64[i] = kProbScale / 256;
    uint32_t cum = 0;
    for (int i = 0; i < 256; ++i) {
      ft->cums[i] = static_cast<uint16_t>(cum);
      ft->freqs[i] = static_cast<uint16_t>(f64[i]);
      cum += f64[i];
    }
    ft->freqs[255] = static_cast<uint16_t>(kProbScale - ft->cums[255]);
  } else {
    for (int i = 0; i < 256; ++i) {
      uint64_t f = (static_cast<uint64_t>(hist[i]) * kProbScale) / total;
      f64[i] = f < 1 ? 1 : f;
    }
    uint64_t s = 0;
    for (int i = 0; i < 256; ++i) s += f64[i];
    uint32_t cum = 0;
    for (int i = 0; i < 256; ++i) {
      ft->cums[i] = static_cast<uint16_t>(cum);
      ft->freqs[i] = static_cast<uint16_t>(f64[i]);
      cum += f64[i];
    }
    if (s != kProbScale)
      ft->freqs[255] = static_cast<uint16_t>(
          ft->freqs[255] + (kProbScale - s));  // u16 wrap, as the reference
  }
  ft->cum_to_sym.assign(kProbScale, 0);
  for (int sym = 0; sym < 256; ++sym) {
    uint32_t start = ft->cums[sym];
    uint32_t end = start + ft->freqs[sym];
    if (end > kProbScale) end = kProbScale;
    for (uint32_t j = start; j < end; ++j) ft->cum_to_sym[j] = sym;
  }
}

static bool rans_encode_ovf(const uint8_t* sym, int64_t n, const FreqTable& ft,
                            std::vector<uint8_t>* out) {
  // rans_encode + overflow detection (slot >= PROB_SCALE ⇒ the
  // reference-exact table cannot represent this stream).
  out->clear();
  bool overflowed = false;
  uint32_t state = kRansL;
  for (int64_t i = n - 1; i >= 0; --i) {
    uint32_t f = ft.freqs[sym[i]], c = ft.cums[sym[i]];
    uint32_t x_max = ((kRansL >> kProbBits) << 8) * f;
    while (state >= x_max) {
      out->push_back(state & 0xFF);
      state >>= 8;
    }
    uint32_t slot = (state % f) + c;
    if (slot >= kProbScale) overflowed = true;
    state = ((state / f) << kProbBits) + slot;
  }
  for (int s = 0; s < 32; s += 8) out->push_back((state >> s) & 0xFF);
  for (size_t i = 0, j = out->size() - 1; i < j; ++i, --j)
    std::swap((*out)[i], (*out)[j]);
  return overflowed;
}

static bool rans_decode_check(const uint8_t* data, int64_t len, int64_t n,
                              const FreqTable& ft, uint8_t* out) {
  // rans_decode + the final-state invariant (state back at RANS32_L and
  // every byte consumed) — how the decoder detects the table variant.
  uint32_t state = 0;
  int64_t pos = 0;
  if (len >= 4) {
    state = (uint32_t(data[0]) << 24) | (uint32_t(data[1]) << 16) |
            (uint32_t(data[2]) << 8) | data[3];
    pos = 4;
  }
  for (int64_t i = 0; i < n; ++i) {
    uint32_t slot = state & (kProbScale - 1);
    uint8_t s = ft.cum_to_sym[slot];
    state = ft.freqs[s] * (state >> kProbBits) + slot - ft.cums[s];
    while (state < kRansL && pos < len) state = (state << 8) | data[pos++];
    out[i] = s;
  }
  return state == kRansL && pos == len;
}

static void put_u32(std::vector<uint8_t>* b, uint32_t v) {
  for (int s = 0; s < 32; s += 8) b->push_back((v >> s) & 0xFF);
}

static int emit_alc(const char* outdir, int w, int h, int f, int q, int wt) {
  static const char* kNames[3] = {"cdf53", "cdf97", "haar"};
  int64_t n = static_cast<int64_t>(w) * h * f;
  std::vector<uint8_t> rgb(n * 3);
  golden_fill(w, h, f, rgb.data());
  Dims d = padded_dims(w, h, f);
  Wavelet wv = wavelet_for(wt);
  int64_t pp = static_cast<int64_t>(d.pw) * d.ph * d.pf;
  int32_t step = std::max(64 - (std::min(q, 100) * 63) / 100, 1);

  std::vector<int16_t> planes(3 * n);
  int16_t* chans[3] = {planes.data(), planes.data() + n, planes.data() + 2 * n};
  rgb_to_ycocg(rgb.data(), n, chans[0], chans[1], chans[2]);

  std::vector<int32_t> buf(pp), qb(pp);
  std::vector<uint8_t> sym(pp);
  std::vector<uint8_t> streams[3];
  uint32_t hists[3][256];
  for (int c = 0; c < 3; ++c) {
    pad_channel(chans[c], d, buf.data());
    forward_3d(buf.data(), d.pw, d.ph, d.pf, wv);
    quantize_buffer(buf.data(), pp, step, step, qb.data());
    to_symbols(qb.data(), pp, sym.data());
    std::memset(hists[c], 0, sizeof(hists[c]));
    for (int64_t i = 0; i < pp; ++i) ++hists[c][sym[i]];
    FreqTable ft;
    freq_table_reference(hists[c], &ft);
    if (rans_encode_ovf(sym.data(), pp, ft, &streams[c])) {
      freq_table_from_histogram(hists[c], &ft);  // sanitized retry
      rans_encode(sym.data(), pp, ft, &streams[c]);
    }
  }

  // container: "ALCC" | version 1 | wavelet u8 | w,h,f u32 LE |
  // 3×{len u32, step i32, dead_zone i32, num_symbols u32, hist[256] u32} |
  // payloads (src/pipeline.rs:200-226; 18 B + 3×1040 B headers)
  std::vector<uint8_t> alc;
  alc.push_back('A'); alc.push_back('L'); alc.push_back('C'); alc.push_back('C');
  alc.push_back(1);
  alc.push_back(static_cast<uint8_t>(wt));
  put_u32(&alc, w); put_u32(&alc, h); put_u32(&alc, f);
  for (int c = 0; c < 3; ++c) {
    put_u32(&alc, streams[c].size());
    put_u32(&alc, static_cast<uint32_t>(step));
    put_u32(&alc, static_cast<uint32_t>(step));  // dead_zone = step
    put_u32(&alc, static_cast<uint32_t>(pp));
    for (int i = 0; i < 256; ++i) put_u32(&alc, hists[c][i]);
  }
  for (int c = 0; c < 3; ++c)
    alc.insert(alc.end(), streams[c].begin(), streams[c].end());

  // independent decode of the emitted container bytes → .rgb fixture
  std::vector<uint8_t> out_rgb(n * 3);
  {
    const uint8_t* p = alc.data() + 6;
    auto rd_u32 = [&p]() {
      uint32_t v = p[0] | (p[1] << 8) | (p[2] << 16) |
                   (static_cast<uint32_t>(p[3]) << 24);
      p += 4;
      return v;
    };
    rd_u32(); rd_u32(); rd_u32();  // w, h, f (known)
    uint32_t lens[3], steps[3], nsyms[3];
    uint32_t dh[3][256];
    for (int c = 0; c < 3; ++c) {
      lens[c] = rd_u32();
      steps[c] = rd_u32();
      rd_u32();  // dead zone (decode-side unused: dequant is q*step)
      nsyms[c] = rd_u32();
      for (int i = 0; i < 256; ++i) dh[c][i] = rd_u32();
    }
    const uint8_t* payload = p;
    for (int c = 0; c < 3; ++c) {
      FreqTable ft;
      freq_table_reference(dh[c], &ft);
      if (!rans_decode_check(payload, lens[c], nsyms[c], ft, sym.data())) {
        freq_table_from_histogram(dh[c], &ft);
        rans_decode_check(payload, lens[c], nsyms[c], ft, sym.data());
      }
      payload += lens[c];
      from_symbols(sym.data(), nsyms[c], buf.data());
      for (int64_t i = 0; i < nsyms[c]; ++i)
        buf[i] *= static_cast<int32_t>(steps[c]);
      inverse_3d(buf.data(), d.pw, d.ph, d.pf, wv);
      crop_channel(buf.data(), d, chans[c]);
    }
    ycocg_to_rgb(chans[0], chans[1], chans[2], n, out_rgb.data());
  }

  char name[128];
  std::snprintf(name, sizeof(name), "%s_q%03d_%dx%dx%d", kNames[wt % 3], q, w,
                h, f);
  char path[512];
  std::snprintf(path, sizeof(path), "%s/%s.alc", outdir, name);
  FILE* o = std::fopen(path, "wb");
  if (!o) return 1;
  std::fwrite(alc.data(), 1, alc.size(), o);
  std::fclose(o);
  std::snprintf(path, sizeof(path), "%s/%s.rgb", outdir, name);
  o = std::fopen(path, "wb");
  if (!o) return 1;
  std::fwrite(out_rgb.data(), 1, out_rgb.size(), o);
  std::fclose(o);
  std::printf(
      "{\"name\": \"%s\", \"w\": %d, \"h\": %d, \"f\": %d, \"quality\": %d, "
      "\"wavelet\": \"%s\", \"alc_bytes\": %zu}\n",
      name, w, h, f, q, kNames[wt % 3], alc.size());
  return 0;
}

int main(int argc, char** argv) {
  if (argc == 2 && std::string(argv[1]) == "--selftest") return self_test();
  if (argc == 8 && std::string(argv[1]) == "--emit-alc")
    return emit_alc(argv[2], std::atoi(argv[3]), std::atoi(argv[4]),
                    std::atoi(argv[5]), std::atoi(argv[6]),
                    std::atoi(argv[7]));
  if (argc == 8 && std::string(argv[1]) == "--debug")
    return debug_dump(argv[2], std::atoi(argv[3]), std::atoi(argv[4]),
                      std::atoi(argv[5]), std::atoi(argv[6]),
                      std::atoi(argv[7]));
  if (argc < 9) {
    std::fprintf(stderr,
                 "usage: %s <raw_u8> <w> <h> <t> <q> <wavelet> <iters> "
                 "<mode 0=serial|1=ilv4>\n",
                 argv[0]);
    return 2;
  }
  const char* path = argv[1];
  int w = std::atoi(argv[2]), h = std::atoi(argv[3]), f = std::atoi(argv[4]);
  int q = std::atoi(argv[5]), wt = std::atoi(argv[6]);
  int iters = std::atoi(argv[7]);
  bool ilv4 = std::atoi(argv[8]) != 0;
  int64_t n = static_cast<int64_t>(w) * h * f;

  std::vector<uint8_t> rgb(n * 3);
  FILE* fp = std::fopen(path, "rb");
  if (!fp || std::fread(rgb.data(), 1, rgb.size(), fp) != rgb.size()) {
    std::fprintf(stderr, "cannot read %s\n", path);
    return 1;
  }
  std::fclose(fp);

  Dims d = padded_dims(w, h, f);
  Wavelet wv = wavelet_for(wt);
  std::vector<int16_t> y(n), co(n), cg(n);
  std::vector<int32_t> scratch, qbuf;
  std::vector<uint8_t> sym;
  std::vector<int16_t> planes;
  std::vector<uint8_t> out(n * 3);

  using clock = std::chrono::steady_clock;
  Encoded enc;

  // one warm run (page-in, allocator steady state)
  rgb_to_ycocg(rgb.data(), n, y.data(), co.data(), cg.data());
  const int16_t* chans[3] = {y.data(), co.data(), cg.data()};
  encode_chunk(chans, d, q, wv, ilv4, &enc, &scratch, &qbuf, &sym);
  decode_chunk(enc, d, wv, ilv4, out.data(), &scratch, &sym, &planes);

  auto t0 = clock::now();
  for (int it = 0; it < iters; ++it) {
    rgb_to_ycocg(rgb.data(), n, y.data(), co.data(), cg.data());
    encode_chunk(chans, d, q, wv, ilv4, &enc, &scratch, &qbuf, &sym);
  }
  double enc_s =
      std::chrono::duration<double>(clock::now() - t0).count() / iters;

  t0 = clock::now();
  for (int it = 0; it < iters; ++it)
    decode_chunk(enc, d, wv, ilv4, out.data(), &scratch, &sym, &planes);
  double dec_s =
      std::chrono::duration<double>(clock::now() - t0).count() / iters;

  double mse = 0;
  for (int64_t i = 0; i < n * 3; ++i) {
    double e = static_cast<double>(rgb[i]) - out[i];
    mse += e * e;
  }
  mse /= static_cast<double>(n * 3);
  double psnr = mse > 0 ? 10.0 * std::log10(255.0 * 255.0 / mse) : 999.0;
  int64_t comp = 0;
  for (int c = 0; c < 3; ++c) comp += enc.streams[c].size();
  std::printf(
      "{\"encode_s\": %.4f, \"decode_s\": %.4f, \"chunks_per_sec\": %.4f, "
      "\"encode_fps\": %.2f, \"decode_fps\": %.2f, \"compressed_bytes\": "
      "%lld, \"compression_ratio\": %.2f, \"psnr_db\": %.2f, \"mode\": "
      "\"%s\", \"threads\": 1}\n",
      enc_s, dec_s, 1.0 / (enc_s + dec_s), f / enc_s, f / dec_s,
      static_cast<long long>(comp), static_cast<double>(n) * 3 / comp, psnr,
      ilv4 ? "ilv4" : "serial");
  return 0;
}
