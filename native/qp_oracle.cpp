// Dense OSQP-style ADMM QP solver — native oracle.
//
// Self-contained C++ implementation of the same algorithm family as
// libmpc_tpu/ops/admm.py: ADMM with rho-scaling, over-relaxation, adaptive
// rho and an active-set polish, for
//
//     min 1/2 x'Px + q'x   s.t.   l <= Ax <= u
//
// Role in the framework (SURVEY §4 "cross-tool validation"): the reference
// cross-checks its NLMPC against MATLAB's nlmpc toolbox; here a fully
// independent native implementation cross-checks the JAX/XLA kernel — same
// mathematics, zero shared code, different language and arithmetic order.
// It also serves as a host-side fallback for tiny one-off problems where
// device dispatch overhead dominates.
//
// Dense row-major storage throughout; double precision; no external
// dependencies (hand-rolled Cholesky — problem sizes here are O(10^2)).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();
constexpr double kRhoEqScale = 1e3;
constexpr double kRhoMin = 1e-6;
constexpr double kRhoMax = 1e6;
constexpr double kAdaptTol = 5.0;

// Cholesky factorization in place (lower). Returns false if not SPD.
bool cholesky(std::vector<double>& M, int n) {
  for (int j = 0; j < n; ++j) {
    double d = M[j * n + j];
    for (int k = 0; k < j; ++k) d -= M[j * n + k] * M[j * n + k];
    if (d <= 0.0) return false;
    const double lj = std::sqrt(d);
    M[j * n + j] = lj;
    for (int i = j + 1; i < n; ++i) {
      double s = M[i * n + j];
      for (int k = 0; k < j; ++k) s -= M[i * n + k] * M[j * n + k];
      M[i * n + j] = s / lj;
    }
  }
  return true;
}

void chol_solve(const std::vector<double>& L, int n, double* b) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
    b[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * b[k];
    b[i] = s / L[i * n + i];
  }
}

// M = P + sigma I + A' diag(rho) A, then factorize.
bool build_kkt(const double* P, const double* A, const double* rho_vec,
               double sigma, int n, int m, std::vector<double>& L) {
  L.assign(static_cast<size_t>(n) * n, 0.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) L[i * n + j] = P[i * n + j];
  for (int i = 0; i < n; ++i) L[i * n + i] += sigma;
  for (int r = 0; r < m; ++r) {
    const double* a = A + static_cast<size_t>(r) * n;
    const double w = rho_vec[r];
    if (w == 0.0) continue;
    for (int i = 0; i < n; ++i) {
      if (a[i] == 0.0) continue;
      const double wai = w * a[i];
      for (int j = 0; j < n; ++j) L[i * n + j] += wai * a[j];
    }
  }
  return cholesky(L, n);
}

double inf_norm(const double* v, int n) {
  double r = 0.0;
  for (int i = 0; i < n; ++i) r = std::max(r, std::fabs(v[i]));
  return r;
}

}  // namespace

extern "C" {

// Returns: 1 solved, 2 solved-inaccurate, -2 max-iter, -7 setup failure.
int qp_solve_dense(int n, int m, const double* P, const double* A,
                   const double* q, const double* l, const double* u,
                   double rho0, double sigma, double alpha, int max_iter,
                   double eps_abs, double eps_rel, int check_every,
                   int do_polish, double* x_out, double* y_out,
                   int* iters_out) {
  std::vector<double> rho_vec(m);
  for (int r = 0; r < m; ++r) {
    const bool eq = std::isfinite(l[r]) && l[r] == u[r];
    const bool loose = l[r] == -kInf && u[r] == kInf;
    rho_vec[r] = loose ? kRhoMin : (eq ? kRhoEqScale * rho0 : rho0);
  }
  double rho = rho0;

  std::vector<double> L;
  if (!build_kkt(P, A, rho_vec.data(), sigma, n, m, L)) return -7;

  std::vector<double> x(n, 0.0), z(m, 0.0), y(m, 0.0);
  std::vector<double> rhs(n), xt(n), zt(m), ax(m), px(n), aty(n);

  int it = 0;
  int status = -2;
  for (; it < max_iter; ++it) {
    // rhs = sigma x - q + A'(rho z - y)
    for (int i = 0; i < n; ++i) rhs[i] = sigma * x[i] - q[i];
    for (int r = 0; r < m; ++r) {
      const double w = rho_vec[r] * z[r] - y[r];
      if (w == 0.0) continue;
      const double* a = A + static_cast<size_t>(r) * n;
      for (int i = 0; i < n; ++i) rhs[i] += w * a[i];
    }
    xt = rhs;
    chol_solve(L, n, xt.data());
    // zt = A xt
    for (int r = 0; r < m; ++r) {
      const double* a = A + static_cast<size_t>(r) * n;
      double s = 0.0;
      for (int i = 0; i < n; ++i) s += a[i] * xt[i];
      zt[r] = s;
    }
    for (int i = 0; i < n; ++i) x[i] = alpha * xt[i] + (1.0 - alpha) * x[i];
    for (int r = 0; r < m; ++r) {
      const double zr = alpha * zt[r] + (1.0 - alpha) * z[r];
      const double z_unc = zr + y[r] / rho_vec[r];
      const double zn = std::min(std::max(z_unc, l[r]), u[r]);
      y[r] = (z_unc < l[r] || z_unc > u[r]) ? y[r] + rho_vec[r] * (zr - zn) : 0.0;
      z[r] = zn;
    }

    if ((it + 1) % check_every != 0) continue;

    // unscaled residuals
    for (int r = 0; r < m; ++r) {
      const double* a = A + static_cast<size_t>(r) * n;
      double s = 0.0;
      for (int i = 0; i < n; ++i) s += a[i] * x[i];
      ax[r] = s;
    }
    for (int i = 0; i < n; ++i) {
      double s = 0.0;
      for (int j = 0; j < n; ++j) s += P[i * n + j] * x[j];
      px[i] = s;
    }
    for (int i = 0; i < n; ++i) aty[i] = 0.0;
    for (int r = 0; r < m; ++r) {
      if (y[r] == 0.0) continue;
      const double* a = A + static_cast<size_t>(r) * n;
      for (int i = 0; i < n; ++i) aty[i] += a[i] * y[r];
    }
    double pri = 0.0, dua = 0.0;
    for (int r = 0; r < m; ++r) pri = std::max(pri, std::fabs(ax[r] - z[r]));
    for (int i = 0; i < n; ++i)
      dua = std::max(dua, std::fabs(px[i] + q[i] + aty[i]));
    const double pri_rel = std::max(inf_norm(ax.data(), m), inf_norm(z.data(), m));
    const double dua_rel = std::max(
        std::max(inf_norm(px.data(), n), inf_norm(aty.data(), n)),
        inf_norm(q, n));
    if (pri <= eps_abs + eps_rel * pri_rel &&
        dua <= eps_abs + eps_rel * dua_rel) {
      status = 1;
      ++it;
      break;
    }

    // adaptive rho
    const double ratio = std::sqrt((pri / std::max(pri_rel, 1e-12)) /
                                   std::max(dua / std::max(dua_rel, 1e-12), 1e-12));
    const double rho_est =
        std::min(std::max(rho * ratio, kRhoMin), kRhoMax);
    if (rho_est > rho * kAdaptTol || rho_est < rho / kAdaptTol) {
      rho = rho_est;
      for (int r = 0; r < m; ++r) {
        const bool eq = std::isfinite(l[r]) && l[r] == u[r];
        const bool loose = l[r] == -kInf && u[r] == kInf;
        rho_vec[r] = loose ? kRhoMin : (eq ? kRhoEqScale * rho : rho);
      }
      if (!build_kkt(P, A, rho_vec.data(), sigma, n, m, L)) return -7;
    }
  }

  if (do_polish && status == 1) {
    // active set from dual signs; stabilized Schur-complement solve with
    // KKT-targeted iterative refinement
    const double delta = 1e-7;
    std::vector<double> w(m, 0.0), b(m, 0.0);
    for (int r = 0; r < m; ++r) {
      const bool eq = std::isfinite(l[r]) && l[r] == u[r];
      if (y[r] < 0.0 || (eq && y[r] <= 0.0)) {
        w[r] = 1.0 / delta;
        b[r] = l[r];
      } else if (y[r] > 0.0) {
        w[r] = 1.0 / delta;
        b[r] = u[r];
      }
    }
    std::vector<double> Lp;
    std::vector<double> Mp(static_cast<size_t>(n) * n, 0.0);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) Mp[i * n + j] = P[i * n + j];
    for (int i = 0; i < n; ++i) Mp[i * n + i] += delta;
    for (int r = 0; r < m; ++r) {
      if (w[r] == 0.0) continue;
      const double* a = A + static_cast<size_t>(r) * n;
      for (int i = 0; i < n; ++i) {
        const double wai = w[r] * a[i];
        if (wai == 0.0) continue;
        for (int j = 0; j < n; ++j) Mp[i * n + j] += wai * a[j];
      }
    }
    Lp = Mp;
    if (cholesky(Lp, n)) {
      std::vector<double> xp(n), nu(m, 0.0), r1(n), r2(m);
      for (int i = 0; i < n; ++i) {
        double s = -q[i];
        for (int r = 0; r < m; ++r)
          if (w[r] != 0.0) s += w[r] * b[r] * A[static_cast<size_t>(r) * n + i];
        xp[i] = s;
      }
      chol_solve(Lp, n, xp.data());
      for (int r = 0; r < m; ++r) {
        if (w[r] == 0.0) continue;
        const double* a = A + static_cast<size_t>(r) * n;
        double s = 0.0;
        for (int i = 0; i < n; ++i) s += a[i] * xp[i];
        nu[r] = w[r] * (s - b[r]);
      }
      for (int pass = 0; pass < 3; ++pass) {
        for (int i = 0; i < n; ++i) {
          double s = -q[i];
          for (int j = 0; j < n; ++j) s -= P[i * n + j] * xp[j];
          for (int r = 0; r < m; ++r)
            if (w[r] != 0.0) s -= nu[r] * A[static_cast<size_t>(r) * n + i];
          r1[i] = s;
        }
        for (int r = 0; r < m; ++r) {
          if (w[r] == 0.0) {
            r2[r] = 0.0;
            continue;
          }
          const double* a = A + static_cast<size_t>(r) * n;
          double s = b[r];
          for (int i = 0; i < n; ++i) s -= a[i] * xp[i];
          r2[r] = s;
        }
        std::vector<double> dx(n);
        for (int i = 0; i < n; ++i) {
          double s = r1[i];
          for (int r = 0; r < m; ++r)
            if (w[r] != 0.0)
              s += w[r] * r2[r] * A[static_cast<size_t>(r) * n + i];
          dx[i] = s;
        }
        chol_solve(Lp, n, dx.data());
        for (int i = 0; i < n; ++i) xp[i] += dx[i];
        for (int r = 0; r < m; ++r) {
          if (w[r] == 0.0) continue;
          const double* a = A + static_cast<size_t>(r) * n;
          double s = 0.0;
          for (int i = 0; i < n; ++i) s += a[i] * dx[i];
          nu[r] += w[r] * (s - r2[r]);
        }
      }
      // accept if residuals improved
      double pri0 = 0.0, dua0 = 0.0, pri1 = 0.0, dua1 = 0.0;
      for (int r = 0; r < m; ++r) {
        const double* a = A + static_cast<size_t>(r) * n;
        double s0 = 0.0, s1 = 0.0;
        for (int i = 0; i < n; ++i) {
          s0 += a[i] * x[i];
          s1 += a[i] * xp[i];
        }
        pri0 = std::max(pri0, std::max(s0 - u[r], l[r] - s0));
        pri1 = std::max(pri1, std::max(s1 - u[r], l[r] - s1));
      }
      for (int i = 0; i < n; ++i) {
        double s0 = q[i], s1 = q[i];
        for (int j = 0; j < n; ++j) {
          s0 += P[i * n + j] * x[j];
          s1 += P[i * n + j] * xp[j];
        }
        for (int r = 0; r < m; ++r) {
          const double ari = A[static_cast<size_t>(r) * n + i];
          s0 += ari * y[r];
          s1 += ari * nu[r];
        }
        dua0 = std::max(dua0, std::fabs(s0));
        dua1 = std::max(dua1, std::fabs(s1));
      }
      if (pri1 <= pri0 && dua1 <= dua0) {
        x = xp;
        y = nu;
      }
    }
  }

  std::memcpy(x_out, x.data(), sizeof(double) * n);
  std::memcpy(y_out, y.data(), sizeof(double) * m);
  *iters_out = it;
  return status;
}

}  // extern "C"
