// Native constitutive kernels + OpenMP batch driver.
//
// Parity map to the reference Rust core:
//   linear_elasticity3d          <- comfe-rs/src/linear_elasticity.rs:33-75
//   mises_linear_hardening3d     <- comfe-rs/src/mises_plasticity.rs:53-127
//   implicit return-map driver   <- comfe-rs/src/plasticity/general.rs:95-263
//   drucker_prager3d             <- comfe-rs/src/plasticity/drucker_prager_classic.rs
//   drucker_prager_hyperbolic3d  <- comfe-rs/src/plasticity/drucker_prager_hyperbolic.rs
//
// Differences by design: the batch loop is OpenMP-parallel (the reference's
// evaluate_model is serial, interfaces.rs:441-455); local-Newton divergence is
// COUNTED and reported instead of panicking (general.rs:235-247) so a host
// callback can surface it; the Newton Jacobian is finite-difference (the
// residual is cheap and this keeps the driver yield-surface-generic); and the
// hardening residual uses kappa1 - kappa0 - del_lambda * k (see the note in
// fenics_constitutive_tpu/models/plasticity_general.py about the reference's
// res_kappa quirk — f is kappa-independent for both Drucker-Pragers, so
// stress paths are identical).

#include <cmath>
#include <cstring>
#include <functional>
#include <string>

#include "../include/comfe.h"
#include "mandel.hpp"

namespace comfe {
namespace {

constexpr double SQ23 = 0.81649658092772603273;  // sqrt(2/3)

struct ModelOut {
  Vec6 stress;
  Mat6 tangent;
};

// ---------------------------------------------------------------- elasticity
void linear_elasticity(const double* p, const double* grad, double* stress,
                       double* tangent) {
  const double mu = p[0], kappa = p[1];
  const Mat6 C = isotropic_elastic_tangent(mu, kappa);
  const Vec6 eps = strain_from_grad(grad);
  const Vec6 ds = matvec6(C, eps);
  for (int i = 0; i < 6; ++i) stress[i] += ds[i];
  if (tangent) std::memcpy(tangent, C.data(), sizeof(C));
}

// ------------------------------------------------- Mises, linear hardening
// closed-form radial return (mises_plasticity.rs:57-126)
void mises_linear(const double* p, const double* grad, double* stress,
                  double* tangent, double* hist) {
  const double mu = p[0], kappa = p[1], y0 = p[2], h = p[3];
  const Vec6 eps = strain_from_grad(grad);
  Vec6 sig{stress[0], stress[1], stress[2], stress[3], stress[4], stress[5]};

  const double p0 = trace(sig) / 3.0;
  const Vec6 s0 = deviatoric(sig);
  const double tr_e = trace(eps);
  const Vec6 e_dev = deviatoric(eps);
  const double p1 = p0 + kappa * tr_e;

  Vec6 s_tr;
  for (int i = 0; i < 6; ++i) s_tr[i] = s0[i] + 2.0 * mu * e_dev[i];
  const double s_eq = mises_norm(s_tr);
  const double sigma_y = y0 + h * hist[0];

  if (s_eq < sigma_y) {
    for (int i = 0; i < 3; ++i) stress[i] = p1 + s_tr[i];
    for (int i = 3; i < 6; ++i) stress[i] = s_tr[i];
    if (tangent) {
      const Mat6 C = isotropic_elastic_tangent(mu, kappa);
      std::memcpy(tangent, C.data(), sizeof(C));
    }
    return;
  }
  const double del_alpha = (s_eq - sigma_y) / (3.0 * mu + h);
  const double theta = 1.0 - (3.0 * mu * del_alpha) / s_eq;
  Vec6 n;
  for (int i = 0; i < 6; ++i) n[i] = s_tr[i] / s_eq;
  // flow rule: del_eps_p = 1.5 del_alpha n (exact elastic-plastic split;
  // the reference records sqrt(3/2) del_alpha n, mises_plasticity.rs:113)
  for (int i = 0; i < 6; ++i) hist[1 + i] += 1.5 * del_alpha * n[i];
  hist[0] += del_alpha;
  for (int i = 0; i < 3; ++i) stress[i] = p1 + theta * s_tr[i];
  for (int i = 3; i < 6; ++i) stress[i] = theta * s_tr[i];
  if (tangent) {
    // consistent tangent: -3 mu theta_bar n(x)n for n = s_tr/q_eq (the
    // reference's +2 mu theta_bar, mises_plasticity.rs:119-122, is wrong —
    // see models/mises.py derivation note)
    const double theta_bar = 1.0 / (1.0 + h / (3.0 * mu)) - (1.0 - theta);
    for (int i = 0; i < 6; ++i)
      for (int j = 0; j < 6; ++j) {
        double v = -3.0 * mu * theta_bar * n[i] * n[j];
        if (i < 3 && j < 3) v += kappa;
        v += 2.0 * mu * theta *
             ((i == j ? 1.0 : 0.0) - (i < 3 && j < 3 ? 1.0 / 3.0 : 0.0));
        tangent[i * 6 + j] = v;
      }
  }
}

// ------------------------------------------- generic implicit return map
// sol = [sigma(6), del_lambda, alpha]; FD Jacobian + LU (general.rs redesign).
struct Surface {
  // f(sigma, alpha), g(sigma, alpha) -> flow direction
  std::function<double(const Vec6&, double)> f;
  std::function<Vec6(const Vec6&, double)> g;
};

// Deliberate per-QP divergence signal: poison this QP's stress with NaN so
// the Python side (and the solver's diverged_mask) detects failure even when
// the unconverged values are finite (ADVICE r1: finite-but-unconverged
// stresses must not pass silently).
static int poison_qp(double* stress) {
  for (int i = 0; i < 6; ++i) stress[i] = std::nan("");
  return 1;
}

int return_map(const Surface& srf, double mu, double kappa,
               const double* grad, double* stress, double* tangent,
               double* hist) {
  const Mat6 C = isotropic_elastic_tangent(mu, kappa);
  const Mat6 Cinv = isotropic_elastic_tangent_inv(mu, kappa);
  const Vec6 eps = strain_from_grad(grad);
  Vec6 sig0{stress[0], stress[1], stress[2], stress[3], stress[4], stress[5]};
  Vec6 sig_tr;
  {
    const Vec6 ce = matvec6(C, eps);
    for (int i = 0; i < 6; ++i) sig_tr[i] = sig0[i] + ce[i];
  }
  const double alpha0 = hist[0];

  if (srf.f(sig_tr, alpha0) <= 0.0) {
    std::memcpy(stress, sig_tr.data(), sizeof(sig_tr));
    if (tangent) std::memcpy(tangent, C.data(), sizeof(C));
    return 0;
  }

  constexpr int N = 8;
  auto residual = [&](const std::array<double, N>& sol,
                      std::array<double, N>& res) {
    Vec6 sig;
    std::memcpy(sig.data(), sol.data(), sizeof(sig));
    const double lam = sol[6], alpha = sol[7];
    const Vec6 g = srf.g(sig, alpha);
    const Vec6 cg = matvec6(C, g);
    for (int i = 0; i < 6; ++i) res[i] = sig[i] - sig_tr[i] + lam * cg[i];
    res[6] = srf.f(sig, alpha);
    res[7] = alpha - alpha0 - lam * SQ23 * std::sqrt(dot(g, g));
  };

  std::array<double, N> sol;
  std::memcpy(sol.data(), sig_tr.data(), sizeof(sig_tr));
  sol[6] = 0.0;
  sol[7] = alpha0;

  const double atol = 1e-10, rtol = 1e-10;
  const int maxit = 50;
  std::array<double, N> res;
  std::array<double, N * N> J;

  auto fd_jacobian = [&](const std::array<double, N>& s0,
                         const std::array<double, N>& r0) {
    std::array<double, N> sp, rp;
    for (int j = 0; j < N; ++j) {
      const double hstep = 1e-7 * (1.0 + std::fabs(s0[j]));
      sp = s0;
      sp[j] += hstep;
      residual(sp, rp);
      for (int i = 0; i < N; ++i) J[i * N + j] = (rp[i] - r0[i]) / hstep;
    }
  };

  bool converged = false;
  for (int it = 0; it < maxit; ++it) {
    residual(sol, res);
    double rn = 0.0;
    for (double v : res) rn += v * v;
    if (std::sqrt(rn) < atol) { converged = true; break; }
    fd_jacobian(sol, res);
    std::array<double, N * N> Jcopy = J;
    std::array<double, N> step = res;
    if (!solve_lu<N>(Jcopy, step)) return poison_qp(stress);
    double dn = 0.0, sn = 0.0;
    for (int i = 0; i < N; ++i) {
      sol[i] -= step[i];
      dn += step[i] * step[i];
      sn += sol[i] * sol[i];
    }
    if (std::sqrt(dn) < atol + rtol * std::sqrt(sn)) { converged = true; break; }
  }

  std::memcpy(stress, sol.data(), 6 * sizeof(double));
  hist[0] = sol[7];
  // del plastic strain = eps - C^-1 (sigma1 - sigma0) (general.rs:110)
  {
    Vec6 dsig;
    for (int i = 0; i < 6; ++i) dsig[i] = sol[i] - sig0[i];
    const Vec6 ce = matvec6(Cinv, dsig);
    for (int i = 0; i < 6; ++i) hist[1 + i] += eps[i] - ce[i];
  }
  if (tangent) {
    // consistent tangent: solve J X = [C; 0; 0], sigma block
    residual(sol, res);
    fd_jacobian(sol, res);
    for (int col = 0; col < 6; ++col) {
      std::array<double, N * N> Jcopy = J;
      std::array<double, N> rhs{};
      for (int i = 0; i < 6; ++i) rhs[i] = C[i * 6 + col];
      if (!solve_lu<N>(Jcopy, rhs)) return poison_qp(stress);
      for (int i = 0; i < 6; ++i) tangent[i * 6 + col] = rhs[i];
    }
  }
  return converged ? 0 : poison_qp(stress);
}

Surface drucker_prager_classic(const double* p) {
  const double a = p[2], b = p[3], b_flow = p[4];
  Surface s;
  s.f = [a, b](const Vec6& sig, double) {
    const double i1 = trace(sig);
    return std::sqrt(std::max(j2(sig), 1e-30)) + b * i1 - a;
  };
  s.g = [b_flow](const Vec6& sig, double) {
    const Vec6 dev = deviatoric(sig);
    const double dfj2 = 0.5 / std::sqrt(std::max(j2(sig), 1e-30));
    Vec6 g;
    for (int i = 0; i < 6; ++i) g[i] = dfj2 * dev[i] + (i < 3 ? b_flow : 0.0);
    return g;
  };
  return s;
}

Surface drucker_prager_hyperbolic(const double* p) {
  const double a = p[2], b = p[3], d = p[4], b_flow = p[5];
  Surface s;
  s.f = [a, b, d](const Vec6& sig, double) {
    return std::sqrt(j2(sig) + d * d) + b * trace(sig) - a;
  };
  s.g = [b_flow, d](const Vec6& sig, double) {
    const Vec6 dev = deviatoric(sig);
    const double dfj2 = 0.5 / std::sqrt(j2(sig) + d * d);
    Vec6 g;
    for (int i = 0; i < 6; ++i) g[i] = dfj2 * dev[i] + (i < 3 ? b_flow : 0.0);
    return g;
  };
  return s;
}

enum class ModelId { kLinear, kMisesLinear, kDpClassic, kDpHyperbolic, kUnknown };

ModelId model_id(const char* name) {
  const std::string n(name);
  if (n == "linear_elasticity3d") return ModelId::kLinear;
  if (n == "mises_linear_hardening3d") return ModelId::kMisesLinear;
  if (n == "drucker_prager3d") return ModelId::kDpClassic;
  if (n == "drucker_prager_hyperbolic3d") return ModelId::kDpHyperbolic;
  return ModelId::kUnknown;
}

}  // namespace
}  // namespace comfe

extern "C" {

int comfe_history_size(const char* model_name) {
  switch (comfe::model_id(model_name)) {
    case comfe::ModelId::kLinear: return 0;
    case comfe::ModelId::kMisesLinear:
    case comfe::ModelId::kDpClassic:
    case comfe::ModelId::kDpHyperbolic: return 7;
    default: return -1;
  }
}

int comfe_n_params(const char* model_name) {
  switch (comfe::model_id(model_name)) {
    case comfe::ModelId::kLinear: return 2;
    case comfe::ModelId::kMisesLinear: return 4;
    case comfe::ModelId::kDpClassic: return 5;
    case comfe::ModelId::kDpHyperbolic: return 6;
    default: return -1;
  }
}

long comfe_evaluate(const char* model_name, const double* params, int n_params,
                    double /*t*/, double /*del_t*/, const double* grad_du,
                    double* stress, double* tangent, double* history,
                    long n_qp) {
  using namespace comfe;
  const ModelId id = model_id(model_name);
  if (id == ModelId::kUnknown || n_params != comfe_n_params(model_name))
    return -1;
  const int h = comfe_history_size(model_name);
  long failures = 0;

#pragma omp parallel for reduction(+ : failures) schedule(static)
  for (long q = 0; q < n_qp; ++q) {
    const double* g = grad_du + 9 * q;
    double* s = stress + 6 * q;
    double* tg = tangent ? tangent + 36 * q : nullptr;
    double* hi = history ? history + h * q : nullptr;
    switch (id) {
      case ModelId::kLinear:
        linear_elasticity(params, g, s, tg);
        break;
      case ModelId::kMisesLinear:
        mises_linear(params, g, s, tg, hi);
        break;
      case ModelId::kDpClassic:
        failures += return_map(drucker_prager_classic(params), params[0],
                               params[1], g, s, tg, hi);
        break;
      case ModelId::kDpHyperbolic:
        failures += return_map(drucker_prager_hyperbolic(params), params[0],
                               params[1], g, s, tg, hi);
        break;
      default:
        break;
    }
  }
  return failures;
}

}  // extern "C"
