// Henon-Heiles Poincare-section integrator — native host-side data
// generator.
//
// C++ counterpart of the reference's henon.f90 + vendored DVODE (19k lines
// of Fortran with event detection,
// /root/reference/python/03_henon_heiles/henon.f90): fixed-step RK4 with
// rising zero-crossing detection of q1 and Newton localization of the
// crossing on the fractional RK4 step — the same algorithm as the JAX
// generator (sympgpr_tpu/systems/henon_heiles.py), cross-checked in tests.

#include <cmath>
#include <cstring>

namespace {

struct Params {
  double lam, w1, w2;
};

inline void rhs(const Params& pr, const double z[4], double out[4]) {
  out[0] = pr.w1 * z[2];
  out[1] = pr.w2 * z[3];
  out[2] = -pr.w1 * z[0] - 2.0 * pr.lam * z[0] * z[1];
  out[3] = -pr.w2 * z[1] - pr.lam * (z[0] * z[0] - z[1] * z[1]);
}

void rk4(const Params& pr, const double z[4], double dt, double out[4]) {
  double k1[4], k2[4], k3[4], k4[4], t[4];
  rhs(pr, z, k1);
  for (int i = 0; i < 4; ++i) t[i] = z[i] + 0.5 * dt * k1[i];
  rhs(pr, t, k2);
  for (int i = 0; i < 4; ++i) t[i] = z[i] + 0.5 * dt * k2[i];
  rhs(pr, t, k3);
  for (int i = 0; i < 4; ++i) t[i] = z[i] + dt * k3[i];
  rhs(pr, t, k4);
  for (int i = 0; i < 4; ++i)
    out[i] = z[i] + dt / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
}

}  // namespace

extern "C" {

// Collect up to max_cuts rising q1=0 crossings per particle.
// z0: (npart, 4); cuts: (max_cuts, npart, 4); tcuts: (max_cuts, npart);
// counts: (npart,)
void sympgpr_henon_sections(double lam, double w1, double w2, double dt,
                            int max_steps, int max_cuts, int npart,
                            const double* z0, double* cuts, double* tcuts,
                            int* counts) {
  Params pr{lam, w1, w2};
  for (long i = 0; i < static_cast<long>(max_cuts) * npart * 4; ++i)
    cuts[i] = NAN;
  for (long i = 0; i < static_cast<long>(max_cuts) * npart; ++i)
    tcuts[i] = NAN;
  for (int p = 0; p < npart; ++p) {
    double z[4];
    std::memcpy(z, z0 + 4 * p, 4 * sizeof(double));
    int count = 0;
    for (int s = 0; s < max_steps && count < max_cuts; ++s) {
      double zn[4];
      rk4(pr, z, dt, zn);
      if (z[0] < 0.0 && zn[0] >= 0.0) {
        // Newton on the fractional step theta: q1(rk4(z, theta)) = 0
        double theta = dt * z[0] / (z[0] - zn[0]);
        double zc[4];
        for (int it = 0; it < 8; ++it) {
          rk4(pr, z, theta, zc);
          double fp = w1 * zc[2];
          if (std::fabs(fp) < 1e-30) break;
          double step = zc[0] / fp;
          theta -= step;
          if (theta < 0.0) theta = 0.0;
          if (theta > dt) theta = dt;
        }
        rk4(pr, z, theta, zc);
        long idx = (static_cast<long>(count) * npart + p);
        std::memcpy(cuts + 4 * idx, zc, 4 * sizeof(double));
        tcuts[idx] = s * dt + theta;
        ++count;
      }
      std::memcpy(z, zn, 4 * sizeof(double));
    }
    counts[p] = count;
  }
}

}  // extern "C"
