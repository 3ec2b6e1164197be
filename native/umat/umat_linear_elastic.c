/* Reference linear-elastic UMAT with the Fortran calling convention.
 *
 * Parity with the reference's Fortran demo UMAT
 * (/root/reference/examples/umat/umat_linear_elastic.f:1-44): isotropic Hooke
 * in Voigt notation with engineering shear, PROPS = (E, nu), incremental
 * stress update sigma += DDSDDE . dstran. Written in C (this image ships no
 * Fortran compiler) — the point of the dlopen harness is exactly that the
 * implementation language is invisible behind the ABI. The exported symbol
 * `umat_` matches gfortran's default name mangling.
 */

void umat_(double* stress, double* statev, double* ddsdde, double* sse,
           double* spd, double* scd, double* rpl, double* ddsddt,
           double* drplde, double* drpldt, double* stran, double* dstran,
           double* time, double* dtime, double* temp, double* dtemp,
           double* predef, double* dpred, char* cmname, int* ndi, int* nshr,
           int* ntens, int* nstatv, double* props, int* nprops,
           double* coords, double* drot, double* pnewdt, double* celent,
           double* dfgrd0, double* dfgrd1, int* noel, int* npt, int* layer,
           int* kspt, int* kstep, int* kinc) {
  (void)statev; (void)sse; (void)spd; (void)scd; (void)rpl; (void)ddsddt;
  (void)drplde; (void)drpldt; (void)stran; (void)time; (void)dtime;
  (void)temp; (void)dtemp; (void)predef; (void)dpred; (void)cmname;
  (void)nstatv; (void)coords; (void)drot; (void)pnewdt; (void)celent;
  (void)dfgrd0; (void)dfgrd1; (void)noel; (void)npt; (void)layer;
  (void)kspt; (void)kstep; (void)kinc; (void)nprops;

  const double E = props[0];
  const double nu = props[1];
  const double lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu));
  const double mu = E / (2.0 * (1.0 + nu));
  const int n = *ntens;
  const int ndi_ = *ndi;
  (void)nshr;

  /* DDSDDE column-major [ntens][ntens] */
  for (int i = 0; i < n * n; ++i) ddsdde[i] = 0.0;
  for (int i = 0; i < ndi_; ++i)
    for (int j = 0; j < ndi_; ++j)
      ddsdde[j * n + i] = lam + (i == j ? 2.0 * mu : 0.0);
  for (int i = ndi_; i < n; ++i) ddsdde[i * n + i] = mu;

  for (int i = 0; i < n; ++i) {
    double ds = 0.0;
    for (int j = 0; j < n; ++j) ds += ddsdde[j * n + i] * dstran[j];
    stress[i] += ds;
  }
}
