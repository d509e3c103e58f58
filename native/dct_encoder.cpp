// Native sensor-side DCT encoder for lvio_fusion_tpu.
//
// The DCT-compressed image upload (ops/dct.py) is the framework's
// bandwidth-limited-link transport: the host performs a JPEG-style 8x8
// DCT + quantization keeping the first K zigzag coefficients, and the
// device inverse-transforms inside the frame programs. This file is the
// production encoder for that path: a single-pass C++ implementation of
// exactly the math in ops/dct.py `encode` (f32 DCT, round-half-even
// quantization, per-block AC scale, optional int4 nibble packing),
// callable per camera frame from the buffering path. It replaces the
// jitted XLA:CPU encode program on hosts where the library builds —
// same payload bytes modulo rare one-quantization-step flips on FMA
// builds (the AVX2 first pass fuses mul+add, so ties can round the
// other way vs the XLA mul-then-add; test_native_dct tolerates <=0.5%
// byte disagreement), no XLA dispatch, GIL released for the whole call
// (ctypes), so frame encodes overlap the device flush even on a
// single-core host.
//
// Build: make -C native   (part of libdataloader.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#if defined(__SSE4_1__) || (defined(__AVX2__) && defined(__FMA__))
#include <immintrin.h>
#endif

namespace {

// type-II orthonormal DCT matrix, computed in f64 then cast to f32
// (matches ops/dct.py _D8)
struct DctTables {
  float D[8][8];
  int zigzag[64];
  DctTables() {
    for (int k = 0; k < 8; ++k)
      for (int n = 0; n < 8; ++n) {
        double v = std::cos(M_PI * (2 * n + 1) * k / 16.0) *
                   std::sqrt(2.0 / 8.0);
        if (k == 0) v *= std::sqrt(0.5);
        D[k][n] = (float)v;
      }
    static const int zz[64] = {
        0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};
    std::memcpy(zigzag, zz, sizeof(zz));
  }
};
const DctTables kTab;

#if defined(__SSE4_1__)
// round-half-even in one instruction: std::nearbyintf is an outlined
// libm call (it must honor the dynamic rounding mode), and the ~117k
// calls per KITTI frame dominated the encode profile
inline float rint_f(float x) {
  return _mm_cvtss_f32(_mm_round_ss(
      _mm_set_ss(x), _mm_set_ss(x),
      _MM_FROUND_TO_NEAREST_INT | _MM_FROUND_NO_EXC));
}
#else
inline float rint_f(float x) { return std::nearbyintf(x); }  // half-even
#endif

}  // namespace

extern "C" {

// Encode a padded (Hp, Wp) uint8 image (Hp, Wp multiples of 8) into the
// (nb, 2 + ac_bytes + 1) int8 payload of ops/dct.py:
//   [dc int16 LE | K-1 AC coeffs (int8, or nibble-packed pairs when
//    bits == 4) | per-block AC scale]
// qvec: the K zigzag-ordered quantization steps. Returns nb, or -1 on
// bad arguments.
int lvio_dct_encode(const unsigned char *img, int Hp, int Wp,
                    const float *qvec, int K, int bits,
                    signed char *out) {
  if (Hp % 8 || Wp % 8 || K < 1 || K > 64 || (bits != 8 && bits != 4))
    return -1;
  const int bw = Wp / 8;
  const int nac = (bits == 8) ? (K - 1) : (K - 1 + 1) / 2;
  const int row_bytes = 2 + nac + 1;
  const float lim = (bits == 8) ? 127.0f : 7.0f;

  // only the first K zigzag coefficients survive quantization, and they
  // live in the top-left corner of the 8x8 spectrum: bound both DCT
  // passes to the rows/cols actually referenced (K=16 -> 5 rows x 6
  // cols, ~45% fewer mul-adds than the full transform)
  int R = 0, Cc = 0;
  for (int i = 0; i < K; ++i) {
    int z = kTab.zigzag[i];
    if (z / 8 + 1 > R) R = z / 8 + 1;
    if (z % 8 + 1 > Cc) Cc = z % 8 + 1;
  }

  for (int by = 0; by < Hp / 8; ++by) {
    for (int bx = 0; bx < bw; ++bx) {
      const unsigned char *src = img + (by * 8) * Wp + bx * 8;
      float t[8][8], c[8][8];
#if defined(__AVX2__) && defined(__FMA__)
      // one block row = one 8-lane ymm: u8 load -> f32 convert -> the
      // R output rows are straight-line FMA chains over 8 registers
      // (the portable loop below measured ~8x slower: gcc keeps the
      // accumulator array in memory instead of a register)
      __m256 brow[8];
      const __m256 off = _mm256_set1_ps(128.0f);
      for (int k = 0; k < 8; ++k)
        brow[k] = _mm256_sub_ps(
            _mm256_cvtepi32_ps(_mm256_cvtepu8_epi32(
                _mm_loadl_epi64((const __m128i *)(src + k * Wp)))),
            off);
      for (int i = 0; i < R; ++i) {
        __m256 acc = _mm256_mul_ps(_mm256_set1_ps(kTab.D[i][0]), brow[0]);
        for (int k = 1; k < 8; ++k)
          acc = _mm256_fmadd_ps(_mm256_set1_ps(kTab.D[i][k]), brow[k],
                                acc);
        _mm256_storeu_ps(t[i], acc);
      }
#else
      float b[8][8];
      for (int i = 0; i < 8; ++i)
        for (int j = 0; j < 8; ++j)
          b[i][j] = (float)src[i * Wp + j] - 128.0f;
      for (int i = 0; i < R; ++i) {
        float s[8] = {0, 0, 0, 0, 0, 0, 0, 0};
        for (int k = 0; k < 8; ++k) {
          const float d = kTab.D[i][k];
          for (int j = 0; j < 8; ++j) s[j] += d * b[k][j];
        }
        for (int j = 0; j < 8; ++j) t[i][j] = s[j];
      }
#endif
      for (int i = 0; i < R; ++i)
        for (int j = 0; j < Cc; ++j) {
          float s = 0.0f;
          for (int k = 0; k < 8; ++k) s += t[i][k] * kTab.D[j][k];
          c[i][j] = s;
        }

      float qz[64];
      for (int i = 0; i < K; ++i) {
        int z = kTab.zigzag[i];
        qz[i] = c[z / 8][z % 8] / qvec[i];
      }
      signed char *row = out + (by * bw + bx) * row_bytes;
      float dcf = rint_f(qz[0]);
      if (dcf > 32767.0f) dcf = 32767.0f;
      if (dcf < -32768.0f) dcf = -32768.0f;
      int16_t dc = (int16_t)dcf;
      row[0] = (signed char)(dc & 0xFF);          // little-endian halves
      row[1] = (signed char)((dc >> 8) & 0xFF);

      float peak = 0.0f;
      for (int i = 1; i < K; ++i) {
        float a = std::fabs(qz[i]);
        if (a > peak) peak = a;
      }
      float scf = std::ceil(peak / lim);
      if (scf < 1.0f) scf = 1.0f;
      if (scf > 255.0f) scf = 255.0f;
      const float sc = scf;

      signed char ac[64];
      for (int i = 1; i < K; ++i) {
        float v = rint_f(qz[i] / sc);
        if (v > lim) v = lim;
        if (v < -lim) v = -lim;
        ac[i - 1] = (signed char)v;
      }
      if (bits == 8) {
        for (int i = 0; i < K - 1; ++i) row[2 + i] = ac[i];
      } else {
        for (int i = K - 1; i < 2 * nac; ++i) ac[i] = 0;  // odd-count pad
        for (int i = 0; i < nac; ++i) {
          unsigned lo = (unsigned)ac[2 * i] & 0xF;
          unsigned hi = (unsigned)ac[2 * i + 1] & 0xF;
          row[2 + i] = (signed char)((hi << 4) | lo);
        }
      }
      row[2 + nac] = (signed char)(unsigned char)sc;
    }
  }
  return (Hp / 8) * bw;
}

}  // extern "C"
