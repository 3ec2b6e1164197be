// UMAT harness: dlopen an Abaqus-ABI user material and drive it over QP
// batches with Mandel<->Voigt conversion.
//
// Parity with the reference's examples/umat (umat.h:13-60 LibHandle + the
// 40-argument t_Eval typedef; main.cpp:60-194 Umat3D template maintaining
// STATEV and total-strain history and converting stress x 1/sqrt2 in /
// x sqrt2 out plus the column-major tangent transpose). Re-designed as a C
// API driven from Python via ctypes instead of pybind11.

#include <dlfcn.h>

#include <array>
#include <cmath>
#include <cstring>

#include "../include/comfe.h"
#include "mandel.hpp"

namespace {

// Abaqus UMAT signature (all Fortran by-reference; reference umat.h:13-18).
// The trailing size_t is gfortran's HIDDEN length argument for the
// CHARACTER*(*) CMNAME parameter: Fortran compilers append one length per
// character argument after the positional list. Passing it is required for
// gfortran-compiled UMATs and harmless for C payloads (SysV x86-64 callees
// ignore extra trailing arguments).
typedef void (*umat_fn)(
    double* stress, double* statev, double* ddsdde, double* sse, double* spd,
    double* scd, double* rpl, double* ddsddt, double* drplde, double* drpldt,
    double* stran, double* dstran, double* time, double* dtime, double* temp,
    double* dtemp, double* predef, double* dpred, char* cmname, int* ndi,
    int* nshr, int* ntens, int* nstatv, double* props, int* nprops,
    double* coords, double* drot, double* pnewdt, double* celent,
    double* dfgrd0, double* dfgrd1, int* noel, int* npt, int* layer, int* kspt,
    int* kstep, int* kinc, size_t cmname_len);

struct UmatHandle {
  void* lib;
  umat_fn fn;
};

constexpr double SQRT2 = 1.4142135623730950488;

}  // namespace

extern "C" {

void* comfe_umat_open(const char* so_path, const char* symbol) {
  void* lib = dlopen(so_path, RTLD_NOW);
  if (!lib) return nullptr;
  void* sym = dlsym(lib, symbol);
  if (!sym) {
    dlclose(lib);
    return nullptr;
  }
  auto* h = new UmatHandle{lib, reinterpret_cast<umat_fn>(sym)};
  return h;
}

void comfe_umat_close(void* handle) {
  auto* h = static_cast<UmatHandle*>(handle);
  if (!h) return;
  if (h->lib) dlclose(h->lib);
  delete h;
}

int comfe_umat_evaluate(void* handle, double t, double del_t,
                        const double* grad_du, double* stress, double* tangent,
                        double* statev, int n_statev, double* strain_n,
                        const double* props, int n_props, long n_qp) {
  auto* h = static_cast<UmatHandle*>(handle);
  if (!h || !h->fn) return -1;

  int ndi = 3, nshr = 3, ntens = 6;
  double time[2] = {t, t};
  double dtime = del_t;
  char cmname[80] = "comfe_umat";

  for (long q = 0; q < n_qp; ++q) {
    const double* g = grad_du + 9 * q;
    double* sig_m = stress + 6 * q;
    double* sv = statev + static_cast<long>(n_statev) * q;
    double* eps_n_m = strain_n + 6 * q;

    const comfe::Vec6 deps_m = comfe::strain_from_grad(g);

    // Mandel -> Voigt: stress shear / sqrt2; strain shear (engineering) * sqrt2
    // (reference main.cpp:125-147)
    double sig_v[6], stran_v[6], dstran_v[6];
    for (int i = 0; i < 3; ++i) {
      sig_v[i] = sig_m[i];
      stran_v[i] = eps_n_m[i];
      dstran_v[i] = deps_m[i];
    }
    for (int i = 3; i < 6; ++i) {
      sig_v[i] = sig_m[i] / SQRT2;
      stran_v[i] = eps_n_m[i] * SQRT2;
      dstran_v[i] = deps_m[i] * SQRT2;
    }

    double ddsdde[36] = {0.0};
    double sse = 0, spd = 0, scd = 0, rpl = 0, drpldt = 0, pnewdt = 1,
           celent = 1, temp = 0, dtemp = 0;
    double ddsddt[6] = {0}, drplde[6] = {0}, predef[1] = {0}, dpred[1] = {0};
    double coords[3] = {0, 0, 0};
    double drot[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    double dfgrd0[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    double dfgrd1[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    int noel = 1, npt = static_cast<int>(q) + 1, layer = 1, kspt = 1,
        kstep = 1, kinc = 1;
    int nstatv = n_statev, nprops = n_props;

    h->fn(sig_v, sv, ddsdde, &sse, &spd, &scd, &rpl, ddsddt, drplde, &drpldt,
          stran_v, dstran_v, time, &dtime, &temp, &dtemp, predef, dpred,
          cmname, &ndi, &nshr, &ntens, &nstatv,
          const_cast<double*>(props), &nprops, coords, drot, &pnewdt, &celent,
          dfgrd0, dfgrd1, &noel, &npt, &layer, &kspt, &kstep, &kinc,
          sizeof(cmname));

    // Voigt -> Mandel: stress shear * sqrt2 (main.cpp:149-160)
    for (int i = 0; i < 3; ++i) sig_m[i] = sig_v[i];
    for (int i = 3; i < 6; ++i) sig_m[i] = sig_v[i] * SQRT2;

    // maintain total strain history (main.cpp:120-123)
    for (int i = 0; i < 6; ++i) eps_n_m[i] += deps_m[i];

    if (tangent) {
      double* tg = tangent + 36 * q;
      // UMAT DDSDDE is Voigt (engineering shear), Fortran column-major.
      // C_mandel[i][j] = dsig_m[i]/deps_m[j]: shear stress rows scale by
      // sqrt2 (sig_m = sqrt2 tau) and shear strain cols by sqrt2
      // (gamma = sqrt2 eps_m), i.e. the shear-shear block doubles — the
      // block scaling + transpose of reference main.cpp:162-194.
      for (int i = 0; i < 6; ++i)
        for (int j = 0; j < 6; ++j) {
          double v = ddsdde[j * 6 + i];  // column-major -> [i][j]
          if (i >= 3) v *= SQRT2;
          if (j >= 3) v *= SQRT2;
          tg[i * 6 + j] = v;
        }
    }
  }
  return 0;
}

}  // extern "C"
