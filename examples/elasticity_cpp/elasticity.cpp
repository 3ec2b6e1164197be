// Standalone C++ constitutive model plug-in: linear elasticity.
//
// The analog of the reference's examples/elasticity_cpp/src/main.cpp (pybind11
// + Eigen): demonstrates writing a material OUTSIDE the framework in C++ and
// plugging it in. Here the contract is one exported C function over flat
// arrays (same data contract as the framework's model protocol: Mandel
// notation, nabla_grad layout) loaded via ctypes — see run_example.py.
//
// Build: g++ -O2 -shared -fPIC -o libelasticity_example.so elasticity.cpp

#include <cmath>

extern "C" {

// history size per QP for this model (none)
int example_history_dim() { return 0; }

void example_evaluate(double /*t*/, double /*del_t*/,
                      const double* grad_du,  // [n_qp * 9], nabla_grad
                      double* stress,         // [n_qp * 6] Mandel, in/out
                      double* tangent,        // [n_qp * 36] row-major, out
                      double* /*history*/,    // unused
                      long n_qp,
                      const double* params)   // [E, nu]
{
  const double E = params[0], nu = params[1];
  const double lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu));
  const double mu = E / (2.0 * (1.0 + nu));
  const double isq2 = 1.0 / std::sqrt(2.0);

  // Mandel elastic tangent (same matrix as the framework's get_elastic_tangent)
  double C[36] = {0.0};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) C[i * 6 + j] = lam + (i == j ? 2.0 * mu : 0.0);
  for (int i = 3; i < 6; ++i) C[i * 6 + i] = 2.0 * mu;

  for (long q = 0; q < n_qp; ++q) {
    const double* g = grad_du + 9 * q;
    // strain_from_grad_u with the 1/sqrt2 Mandel shear factor
    const double eps[6] = {
        g[0], g[4], g[8],
        isq2 * (g[1] + g[3]), isq2 * (g[2] + g[6]), isq2 * (g[5] + g[7])};
    double* s = stress + 6 * q;
    for (int i = 0; i < 6; ++i) {
      double ds = 0.0;
      for (int j = 0; j < 6; ++j) ds += C[i * 6 + j] * eps[j];
      s[i] += ds;
    }
    if (tangent)
      for (int i = 0; i < 36; ++i) tangent[36 * q + i] = C[i];
  }
}

}  // extern "C"
