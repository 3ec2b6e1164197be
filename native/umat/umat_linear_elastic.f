C     Linear-elastic UMAT (isotropic Hooke) behind the real Fortran ABI.
C
C     The Fortran twin of umat_linear_elastic.c, matching the capability of
C     the reference's Fortran demo UMAT
C     (/root/reference/examples/umat/umat_linear_elastic.f:1-44):
C     PROPS = (E, nu), Voigt engineering shear, incremental update
C     STRESS := STRESS + DDSDDE . DSTRAN.  Built only when a Fortran
C     compiler is available (see native/CMakeLists.txt); the pytest suite
C     pins UmatModel against it and skips otherwise.  Compiling this with
C     gfortran exercises the ABI details a C stand-in cannot: actual
C     gfortran codegen, column-major DDSDDE writes from Fortran, and the
C     hidden CHARACTER length argument appended after the positional
C     arguments (which the harness passes, native/src/umat_harness.cpp).
      SUBROUTINE UMAT(STRESS, STATEV, DDSDDE, SSE, SPD, SCD, RPL,
     1     DDSDDT, DRPLDE, DRPLDT, STRAN, DSTRAN, TIME, DTIME, TEMP,
     2     DTEMP, PREDEF, DPRED, CMNAME, NDI, NSHR, NTENS, NSTATV,
     3     PROPS, NPROPS, COORDS, DROT, PNEWDT, CELENT, DFGRD0,
     4     DFGRD1, NOEL, NPT, LAYER, KSPT, KSTEP, KINC)
      IMPLICIT NONE
      CHARACTER*80 CMNAME
      INTEGER NDI, NSHR, NTENS, NSTATV, NPROPS, NOEL, NPT, LAYER,
     1     KSPT, KSTEP, KINC
      DOUBLE PRECISION STRESS(NTENS), STATEV(NSTATV),
     1     DDSDDE(NTENS,NTENS), SSE, SPD, SCD, RPL, DDSDDT(NTENS),
     2     DRPLDE(NTENS), DRPLDT, STRAN(NTENS), DSTRAN(NTENS),
     3     TIME(2), DTIME, TEMP, DTEMP, PREDEF(1), DPRED(1),
     4     PROPS(NPROPS), COORDS(3), DROT(3,3), PNEWDT, CELENT,
     5     DFGRD0(3,3), DFGRD1(3,3)
      DOUBLE PRECISION E, NU, LAM, MU
      INTEGER I, J
      E = PROPS(1)
      NU = PROPS(2)
      LAM = E*NU/((1.D0+NU)*(1.D0-2.D0*NU))
      MU = E/(2.D0*(1.D0+NU))
      DO I = 1, NTENS
         DO J = 1, NTENS
            DDSDDE(I,J) = 0.D0
         END DO
      END DO
      DO I = 1, NDI
         DO J = 1, NDI
            DDSDDE(I,J) = LAM
         END DO
         DDSDDE(I,I) = LAM + 2.D0*MU
      END DO
      DO I = NDI+1, NTENS
         DDSDDE(I,I) = MU
      END DO
      DO I = 1, NTENS
         DO J = 1, NTENS
            STRESS(I) = STRESS(I) + DDSDDE(I,J)*DSTRAN(J)
         END DO
      END DO
C     track the update count in STATEV(1) so the test can see real
C     Fortran code ran (the C demo leaves STATEV untouched)
      IF (NSTATV .GE. 1) THEN
         STATEV(1) = STATEV(1) + 1.D0
      END IF
      RETURN
      END
