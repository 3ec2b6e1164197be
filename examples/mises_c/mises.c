/* Standalone C constitutive model plug-in: von Mises plasticity with linear
 * isotropic hardening, including per-QP history (plastic strain + alpha).
 *
 * The analog of the reference's SECOND standalone foreign-language plug-in
 * (examples/elasticity_rs/src/lib.rs: a crate independent of the comfe
 * framework). This file is plain C99, built with gcc, independent of the
 * native/ C++ kernel library — it demonstrates that any language able to
 * export one flat-array C function can provide materials, including
 * history-bearing ones.
 *
 * Radial return with linear hardening (closed form, no iteration):
 *   f = ||s_tr|| - sqrt(2/3) (y0 + H alpha)
 *   del_gamma = f / (2 mu + 2/3 H)
 *
 * Build: gcc -std=c99 -O2 -shared -fPIC -o libmises_c.so mises.c -lm
 */

#include <math.h>
#include <string.h>

/* history layout per QP: [eps_p(6 Mandel), alpha] */
int mises_c_history_dim(void) { return 7; }

void mises_c_evaluate(double t, double del_t,
                      const double* grad_du, /* [n*9] nabla_grad of del_u */
                      double* stress,        /* [n*6] Mandel, in/out */
                      double* tangent,       /* [n*36] row-major, out */
                      double* history,       /* [n*7], in/out */
                      long n_qp,
                      const double* params)  /* [mu, kappa, y0, H] */
{
  (void)t; (void)del_t;
  const double mu = params[0], kappa = params[1];
  const double y0 = params[2], H = params[3];
  const double isq2 = 1.0 / sqrt(2.0);
  const double sq23 = sqrt(2.0 / 3.0);

  for (long q = 0; q < n_qp; ++q) {
    const double* g = grad_du + 9 * q;
    double* sig = stress + 6 * q;
    double* hist = history + 7 * q;
    double* C = tangent ? tangent + 36 * q : 0;

    /* strain increment in Mandel notation (shear x sqrt2 of engineering) */
    const double deps[6] = {
        g[0], g[4], g[8],
        isq2 * (g[1] + g[3]), isq2 * (g[2] + g[6]), isq2 * (g[5] + g[7])};

    /* elastic trial: sig_tr = sig + 2 mu dev(deps) + kappa tr(deps) I */
    const double tr = deps[0] + deps[1] + deps[2];
    double sig_tr[6];
    for (int i = 0; i < 6; ++i) {
      const double dev = deps[i] - (i < 3 ? tr / 3.0 : 0.0);
      sig_tr[i] = sig[i] + 2.0 * mu * dev + (i < 3 ? kappa * tr : 0.0);
    }

    /* deviatoric part and its norm */
    const double p = (sig_tr[0] + sig_tr[1] + sig_tr[2]) / 3.0;
    double s_dev[6];
    for (int i = 0; i < 6; ++i) s_dev[i] = sig_tr[i] - (i < 3 ? p : 0.0);
    double snorm = 0.0;
    for (int i = 0; i < 6; ++i) snorm += s_dev[i] * s_dev[i];
    snorm = sqrt(snorm);

    const double alpha = hist[6];
    const double f = snorm - sq23 * (y0 + H * alpha);

    if (f <= 0.0 || snorm == 0.0) { /* elastic */
      memcpy(sig, sig_tr, sizeof sig_tr);
      if (C) {
        memset(C, 0, 36 * sizeof(double));
        for (int i = 0; i < 3; ++i)
          for (int j = 0; j < 3; ++j)
            C[i * 6 + j] = kappa + (i == j ? 4.0 * mu / 3.0 : -2.0 * mu / 3.0);
        for (int i = 3; i < 6; ++i) C[i * 6 + i] = 2.0 * mu;
      }
      continue;
    }

    /* plastic corrector */
    const double dgamma = f / (2.0 * mu + (2.0 / 3.0) * H);
    double nvec[6];
    for (int i = 0; i < 6; ++i) nvec[i] = s_dev[i] / snorm;
    for (int i = 0; i < 6; ++i) {
      sig[i] = sig_tr[i] - 2.0 * mu * dgamma * nvec[i];
      hist[i] += dgamma * nvec[i]; /* plastic strain increment */
    }
    hist[6] = alpha + sq23 * dgamma;

    if (C) {
      /* consistent tangent: kappa P_vol*3 + 2 mu theta P_dev
       *                     - 2 mu theta_bar n (x) n  */
      const double theta = 1.0 - 2.0 * mu * dgamma / snorm;
      const double theta_bar =
          1.0 / (1.0 + H / (3.0 * mu)) - (1.0 - theta);
      for (int i = 0; i < 6; ++i)
        for (int j = 0; j < 6; ++j) {
          double pdev = (i == j ? 1.0 : 0.0) -
                        (i < 3 && j < 3 ? 1.0 / 3.0 : 0.0);
          double pvol = (i < 3 && j < 3 ? 1.0 : 0.0);
          C[i * 6 + j] = kappa * pvol + 2.0 * mu * theta * pdev -
                         2.0 * mu * theta_bar * nvec[i] * nvec[j];
        }
    }
  }
}
