/* comfe: native QP-batch constitutive kernel library (C API).
 *
 * Capability parity with the reference's Rust core + pyo3 bindings
 * (/root/reference/comfe-rs/src: consts.rs, mandel.rs, interfaces.rs,
 * linear_elasticity.rs, mises_plasticity.rs, plasticity/*.rs and
 * bindings/src/lib.rs), re-implemented in C++ with an OpenMP-parallel batch
 * driver (the reference's evaluate_model loop is serial, SURVEY §6).
 *
 * Conventions match the Python/JAX layer exactly: Mandel notation (shear x
 * sqrt2), grad_du is the flat [n_qp x 9] displacement-increment gradient in
 * nabla_grad row-major layout, stress [n_qp x 6] is updated in place, tangent
 * [n_qp x 36] is written row-major, history is model-specific per QP.
 */

#ifndef COMFE_H
#define COMFE_H

#ifdef __cplusplus
extern "C" {
#endif

/* Returns the per-QP history size for a model name, or -1 if unknown.
 * Names: "linear_elasticity3d" (params: mu, kappa; history 0),
 *        "mises_linear_hardening3d" (mu, kappa, y_0, h; history 7 =
 *            [alpha, plastic_strain x6], matching bindings/src/lib.rs:130-136),
 *        "drucker_prager3d" (mu, kappa, a, b, b_flow; history 7),
 *        "drucker_prager_hyperbolic3d" (mu, kappa, a, b, d, b_flow; history 7).
 */
int comfe_history_size(const char* model_name);

/* Number of parameters the model expects, or -1 if unknown. */
int comfe_n_params(const char* model_name);

/* Batch-evaluate a model over n_qp quadrature points.
 * Returns 0 on success, -1 unknown model, >0 = number of QPs whose local
 * Newton failed to converge (state at those QPs is left at the last iterate).
 */
long comfe_evaluate(const char* model_name,
                    const double* params, int n_params,
                    double t, double del_t,
                    const double* grad_du, /* [n_qp*9] */
                    double* stress,        /* [n_qp*6] in/out */
                    double* tangent,       /* [n_qp*36] out (may be NULL) */
                    double* history,       /* [n_qp*h] in/out (may be NULL) */
                    long n_qp);

/* ---- UMAT harness (reference examples/umat, re-designed without pybind11) */

/* dlopen a UMAT shared library; returns an opaque handle or NULL. */
void* comfe_umat_open(const char* so_path, const char* symbol);
void comfe_umat_close(void* handle);

/* Batch-evaluate an Abaqus UMAT over n_qp points (FULL 3D constraint).
 * statev: [n_qp * n_statev] solution-dependent state (STATEV),
 * strain_n: [n_qp * 6] total Mandel strain at t_n (maintained by the caller,
 *           mirroring the reference's umat_stran field, examples/umat/src/main.cpp:120-123).
 * Mandel<->Voigt conversion and the Fortran column-major tangent transpose
 * happen inside (main.cpp:125-194 semantics). Returns 0 on success.
 */
int comfe_umat_evaluate(void* handle,
                        double t, double del_t,
                        const double* grad_du,
                        double* stress,
                        double* tangent,
                        double* statev, int n_statev,
                        double* strain_n,
                        const double* props, int n_props,
                        long n_qp);

#ifdef __cplusplus
}
#endif

#endif /* COMFE_H */
