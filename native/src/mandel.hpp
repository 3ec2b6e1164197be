// Mandel-notation tensor algebra for the native kernel library.
// Parity with /root/reference/comfe-rs/src/consts.rs + mandel.rs (projectors,
// invariants, isotropic elastic tangent and its closed-form inverse), written
// as constexpr-friendly C++ on fixed-size arrays.

#pragma once

#include <array>
#include <cmath>

namespace comfe {

using Vec6 = std::array<double, 6>;
using Mat6 = std::array<double, 36>;  // row-major [6][6]

inline constexpr double SQRT2_INV = 0.7071067811865475244;

inline double trace(const Vec6& v) { return v[0] + v[1] + v[2]; }

inline Vec6 deviatoric(const Vec6& v) {
  const double p = trace(v) / 3.0;
  return {v[0] - p, v[1] - p, v[2] - p, v[3], v[4], v[5]};
}

inline double dot(const Vec6& a, const Vec6& b) {
  double s = 0.0;
  for (int i = 0; i < 6; ++i) s += a[i] * b[i];
  return s;
}

inline double j2(const Vec6& v) {
  const Vec6 d = deviatoric(v);
  return 0.5 * dot(d, d);
}

inline double mises_norm(const Vec6& v) { return std::sqrt(3.0 * j2(v)); }

// 2 mu P_dev + 3 kappa P_vol (mandel.rs:126-128)
inline Mat6 isotropic_elastic_tangent(double mu, double kappa) {
  Mat6 c{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      c[i * 6 + j] = kappa - 2.0 * mu / 3.0 + (i == j ? 2.0 * mu : 0.0);
  for (int i = 3; i < 6; ++i) c[i * 6 + i] = 2.0 * mu;
  return c;
}

// closed-form inverse via (1/(4 mu), 1/(9 kappa)) (mandel.rs:137-141)
inline Mat6 isotropic_elastic_tangent_inv(double mu, double kappa) {
  return isotropic_elastic_tangent(1.0 / (4.0 * mu), 1.0 / (9.0 * kappa));
}

inline Vec6 matvec6(const Mat6& m, const Vec6& v) {
  Vec6 out{};
  for (int i = 0; i < 6; ++i) {
    double s = 0.0;
    for (int j = 0; j < 6; ++j) s += m[i * 6 + j] * v[j];
    out[i] = s;
  }
  return out;
}

// flat 3x3 nabla_grad (row-major, grad[i*3+j] = d u_j / d x_i) -> Mandel
// strain (mandel.rs:143-171 / utils.py:187-204)
inline Vec6 strain_from_grad(const double* g) {
  return {g[0], g[4], g[8],
          SQRT2_INV * (g[1] + g[3]),
          SQRT2_INV * (g[2] + g[6]),
          SQRT2_INV * (g[5] + g[7])};
}

// Solve a dense n x n system in place (partial-pivot LU); returns false if
// singular. Small n (8) only.
template <int N>
inline bool solve_lu(std::array<double, N * N>& a, std::array<double, N>& b) {
  std::array<int, N> piv;
  for (int i = 0; i < N; ++i) piv[i] = i;
  for (int k = 0; k < N; ++k) {
    int p = k;
    double best = std::fabs(a[k * N + k]);
    for (int i = k + 1; i < N; ++i) {
      const double v = std::fabs(a[i * N + k]);
      if (v > best) { best = v; p = i; }
    }
    if (best < 1e-300) return false;
    if (p != k) {
      for (int j = 0; j < N; ++j) std::swap(a[k * N + j], a[p * N + j]);
      std::swap(b[k], b[p]);
    }
    const double inv = 1.0 / a[k * N + k];
    for (int i = k + 1; i < N; ++i) {
      const double f = a[i * N + k] * inv;
      if (f == 0.0) continue;
      for (int j = k; j < N; ++j) a[i * N + j] -= f * a[k * N + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = N - 1; i >= 0; --i) {
    double s = b[i];
    for (int j = i + 1; j < N; ++j) s -= a[i * N + j] * b[j];
    b[i] = s / a[i * N + i];
  }
  return true;
}

}  // namespace comfe
