// Tokamak field-line integrator — native host-side data generator.
//
// C++ counterpart of the reference's gfortran/f2py unit
// (/root/reference/python/05_tokamak/SympGPR/fieldlines.f90): perturbed
// vector potential on circular flux surfaces, implicit minor radius via a
// fixed 20-iteration Newton, and a semi-implicit midpoint step.  Where the
// reference drives the midpoint residual through vendored MINPACK hybrd1
// (6k lines of Fortran), this uses a damped 2-D Newton with a
// finite-difference Jacobian to the same 1e-13 tolerance.  Exposed via a
// plain C ABI for ctypes (no f2py, no pybind11).

#include <cmath>
#include <cstring>

namespace {

constexpr double B0 = 1.0;
constexpr double IOTA0 = 1.0;
constexpr double A_MINOR = 0.5;
constexpr double R0 = 1.0;

struct Field {
  double eps;
  double m;
  double n;
  double phase;
};

inline double Ath(double r, double th) {
  return B0 * (r * r / 2.0 - r * r * r / (3.0 * R0) * std::cos(th));
}
inline double dAthdr(double r, double th) {
  return B0 * (r - r * r / R0 * std::cos(th));
}
inline double dAthdth(double r, double th) {
  return B0 * r * r * r * std::sin(th) / (3.0 * R0);
}
inline double dAphdr(const Field& f, double r, double th, double ph) {
  double pert = 1.0 + f.eps * std::cos(f.m * th + f.n * ph + f.phase);
  return -B0 * IOTA0 * (r - r * r * r / (A_MINOR * A_MINOR)) * pert;
}
inline double dAphdth(const Field& f, double r, double th, double ph) {
  return B0 * IOTA0 *
         (r * r / 2.0 - r * r * r * r / (4.0 * A_MINOR * A_MINOR)) * f.m *
         f.eps * std::sin(f.m * th + f.n * ph + f.phase);
}

double compute_r(double pth, double th, double rstart) {
  double r = rstart;
  for (int k = 0; k < 20; ++k) {
    double y = pth - Ath(r, th);
    double dy = -dAthdr(r, th);
    r -= y / dy;
  }
  return r;
}

// Midpoint residual (fieldlines.f90 F_tstep)
void residual(const Field& f, double dph, const double znew[2],
              const double zold[3], double* rlast, double out[2]) {
  double mid0 = 0.5 * (zold[0] + znew[0]);
  double mid1 = 0.5 * (zold[1] + znew[1]);
  double ph = zold[2] + 0.5 * dph;
  double r = compute_r(mid0, mid1, *rlast);
  *rlast = r;
  double dApdr = dAphdr(f, r, mid1, ph);
  double dApdt = dAphdth(f, r, mid1, ph);
  double dAtdr = dAthdr(r, mid1);
  double dAtdt = dAthdth(r, mid1);
  out[0] = zold[0] - znew[0] + dph * (dApdt - dApdr * dAtdt / dAtdr);
  out[1] = zold[1] - znew[1] - dph * dApdr / dAtdr;
}

void timestep(const Field& f, double dph, double z[3], double* rlast) {
  double zold[3] = {z[0], z[1], z[2]};
  double znew[2] = {z[0], z[1]};
  double fv[2];
  residual(f, dph, znew, zold, rlast, fv);
  for (int it = 0; it < 50; ++it) {
    // finite-difference Jacobian (hybrd-style)
    double J[2][2];
    for (int j = 0; j < 2; ++j) {
      double h = 1e-8 * (std::fabs(znew[j]) + 1e-8);
      double zp[2] = {znew[0], znew[1]};
      zp[j] += h;
      double fp[2];
      residual(f, dph, zp, zold, rlast, fp);
      J[0][j] = (fp[0] - fv[0]) / h;
      J[1][j] = (fp[1] - fv[1]) / h;
    }
    double det = J[0][0] * J[1][1] - J[0][1] * J[1][0];
    double dx0 = (fv[0] * J[1][1] - fv[1] * J[0][1]) / det;
    double dx1 = (fv[1] * J[0][0] - fv[0] * J[1][0]) / det;
    znew[0] -= dx0;
    znew[1] -= dx1;
    residual(f, dph, znew, zold, rlast, fv);
    if (std::fabs(fv[0]) + std::fabs(fv[1]) < 1e-13) break;
  }
  z[0] = znew[0];
  z[1] = znew[1];
  z[2] = zold[2] + dph;
}

}  // namespace

extern "C" {

double sympgpr_ath(double r, double th) { return Ath(r, th); }

double sympgpr_compute_r(double pth, double th, double rstart) {
  return compute_r(pth, th, rstart);
}

// Integrate npart field lines for nsteps steps of dph = 2 pi / nph.
// z0: (npart, 3) [pth, th, ph]; out: (nsteps+1, npart, 3); r0: (npart,)
void sympgpr_fieldlines_integrate(double eps, int m, int n, double phase,
                                  int nph, int nsteps, int npart,
                                  const double* z0, const double* r0,
                                  double* out) {
  Field f{eps, static_cast<double>(m), static_cast<double>(n), phase};
  double dph = 2.0 * M_PI / nph;
  for (int p = 0; p < npart; ++p) {
    double z[3] = {z0[3 * p], z0[3 * p + 1], z0[3 * p + 2]};
    double rlast = r0[p];
    std::memcpy(out + 3 * p, z, 3 * sizeof(double));
    for (int s = 1; s <= nsteps; ++s) {
      timestep(f, dph, z, &rlast);
      std::memcpy(out + 3 * (static_cast<long>(s) * npart + p), z,
                  3 * sizeof(double));
    }
  }
}

}  // extern "C"
