// Embedded dense ADMM QP solver (C ABI).
//
// Native runtime counterpart of smooth_feedback_tpu.qp.solver: the same
// operator-splitting algorithm [Stellato et al., OSQP, Math. Prog. Comp. 12,
// 2020] with the same parameter semantics, written as a dependency-free C++
// implementation for host/embedded deployment and as a cross-language parity
// oracle for the JAX kernels.  No Eigen, no allocations after setup.
//
// Problem:  min 0.5 x'Px + q'x   s.t.  l <= Ax <= u   (dense row-major).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Work {
  int n = 0, m = 0;
  std::vector<double> Ps, As, qs, ls, us;  // scaled data
  std::vector<double> sx, sy, rho;
  double c = 1.0;
  std::vector<double> Mred, Lfac;          // reduced KKT and its Cholesky
  std::vector<double> x, z, y, xt, zt, rhs, tmp_n, tmp_m;
  std::vector<double> x_old, y_old;
};

double norm_inf(const double* v, int n) {
  double r = 0;
  for (int i = 0; i < n; ++i) r = std::fmax(r, std::fabs(v[i]));
  return r;
}

// y = alpha * M x (row-major M: r x c)
void matvec(const double* M, const double* x, double* y, int r, int c) {
  for (int i = 0; i < r; ++i) {
    double acc = 0;
    const double* row = M + (std::size_t)i * c;
    for (int j = 0; j < c; ++j) acc += row[j] * x[j];
    y[i] = acc;
  }
}

// y = M' x  (M: r x c, y has size c)
void matvec_t(const double* M, const double* x, double* y, int r, int c) {
  for (int j = 0; j < c; ++j) y[j] = 0;
  for (int i = 0; i < r; ++i) {
    const double* row = M + (std::size_t)i * c;
    const double xi = x[i];
    for (int j = 0; j < c; ++j) y[j] += row[j] * xi;
  }
}

// In-place lower Cholesky of SPD matrix (row-major n x n). Returns false on
// non-positive pivot.
bool cholesky(double* M, int n) {
  for (int j = 0; j < n; ++j) {
    double d = M[(std::size_t)j * n + j];
    for (int k = 0; k < j; ++k) d -= M[(std::size_t)j * n + k] * M[(std::size_t)j * n + k];
    if (!(d > 0) || !std::isfinite(d)) return false;
    const double Ljj = std::sqrt(d);
    M[(std::size_t)j * n + j] = Ljj;
    for (int i = j + 1; i < n; ++i) {
      double s = M[(std::size_t)i * n + j];
      for (int k = 0; k < j; ++k) s -= M[(std::size_t)i * n + k] * M[(std::size_t)j * n + k];
      M[(std::size_t)i * n + j] = s / Ljj;
    }
  }
  return true;
}

// Solve L L' x = b in place (L lower, row-major).
void chol_solve(const double* L, double* b, int n) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[(std::size_t)i * n + k] * b[k];
    b[i] = s / L[(std::size_t)i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L[(std::size_t)k * n + i] * b[k];
    b[i] = s / L[(std::size_t)i * n + i];
  }
}

}  // namespace

extern "C" {

struct SfQpOptions {
  double alpha;           // 1.6
  double rho;             // 0.1
  double sigma;           // 1e-6
  int scaling;            // 1
  double eps_abs;         // 1e-3
  double eps_rel;         // 1e-3
  double eps_primal_inf;  // 1e-4
  double eps_dual_inf;    // 1e-4
  int max_iter;           // 4000
  int stop_check_iter;    // 25
  int polish;             // 1   (active-set polish of Optimal solutions)
  int polish_iter;        // 5   (iterative-refinement sweeps)
  double delta;           // 1e-6 (polish regularization)
  double rho_eq_scale;    // 1e3 (equality rows use rho_eq_scale * rho)
  int adaptive_rho;       // 0   (OSQP-style residual-balancing rho updates)
  double adaptive_rho_tol;  // 5.0 (imbalance band before adapting)
};

struct SfQpResult {
  int status;  // QPSolutionStatus values (0 optimal, 2/3 infeasible, 4 maxiter, 6 unknown)
  int iters;
  double objective;
  double primal_res;
  double dual_res;
};

void sf_qp_default_options(SfQpOptions* o) {
  o->alpha = 1.6;
  o->rho = 0.1;
  o->sigma = 1e-6;
  o->scaling = 1;
  o->eps_abs = 1e-3;
  o->eps_rel = 1e-3;
  o->eps_primal_inf = 1e-4;
  o->eps_dual_inf = 1e-4;
  o->max_iter = 4000;
  o->stop_check_iter = 25;
  o->polish = 1;
  o->polish_iter = 5;
  o->delta = 1e-6;
  o->rho_eq_scale = 1e3;
  o->adaptive_rho = 0;
  o->adaptive_rho_tol = 5.0;
}

int sf_qp_solve(int n, int m, const double* P, const double* q, const double* A,
                const double* l, const double* u, const SfQpOptions* opts,
                double* primal, double* dual, SfQpResult* res) {
  SfQpOptions o;
  if (opts) o = *opts; else sf_qp_default_options(&o);

  Work w;
  w.n = n; w.m = m;
  w.Ps.assign(P, P + (std::size_t)n * n);
  w.As.assign(A, A + (std::size_t)m * n);
  w.qs.assign(q, q + n);
  w.ls.assign(l, l + m);
  w.us.assign(u, u + m);
  w.sx.assign(n, 1.0);
  w.sy.assign(m, 1.0);
  w.c = 1.0;

  // ------------------------------------------------------ Ruiz equilibration
  if (o.scaling) {
    std::vector<double> colP(n, 0.0);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        colP[j] = std::fmax(colP[j], std::fabs(P[(std::size_t)i * n + j]));
    double meanP = 0;
    for (int j = 0; j < n; ++j) meanP += (colP[j] == 0 ? 1.0 : colP[j]);
    meanP /= n;
    w.c = 1.0 / std::fmax(1e-6, std::fmax(meanP, norm_inf(q, n)));

    for (int sweep = 0; sweep <= 10; ++sweep) {
      std::vector<double> sxi(n, 0.0), syi(m, 0.0);
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) {
          const double v = std::fabs(w.c * w.sx[i] * w.sx[j] * P[(std::size_t)i * n + j]);
          sxi[j] = std::fmax(sxi[j], v);
        }
      for (int i = 0; i < m; ++i)
        for (int j = 0; j < n; ++j) {
          const double v = std::fabs(w.sy[i] * w.sx[j] * A[(std::size_t)i * n + j]);
          sxi[j] = std::fmax(sxi[j], v);
          syi[i] = std::fmax(syi[i], v);
        }
      double err = 0;
      for (int j = 0; j < n; ++j) {
        if (sxi[j] == 0) sxi[j] = 1;
        err = std::fmax(err, std::fabs(sxi[j] - 1));
        w.sx[j] /= std::sqrt(std::fmax(sxi[j], 1e-8));
      }
      for (int i = 0; i < m; ++i) {
        if (syi[i] == 0) syi[i] = 1;
        err = std::fmax(err, std::fabs(syi[i] - 1));
        w.sy[i] /= std::sqrt(std::fmax(syi[i], 1e-8));
      }
      // do-while semantics: stop right after the sweep whose measured
      // column norms were already within 10% of 1
      if (err <= 0.1) break;
    }
  }

  // scaled data
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      w.Ps[(std::size_t)i * n + j] = w.c * w.sx[i] * w.sx[j] * P[(std::size_t)i * n + j];
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j)
      w.As[(std::size_t)i * n + j] = w.sy[i] * w.sx[j] * A[(std::size_t)i * n + j];
  for (int j = 0; j < n; ++j) w.qs[j] = w.c * w.sx[j] * q[j];
  for (int i = 0; i < m; ++i) { w.ls[i] = w.sy[i] * l[i]; w.us[i] = w.sy[i] * u[i]; }

  // ------------------------------------------------- rho + trivial checks
  w.rho.assign(m, o.rho);
  int status = -1;
  std::vector<char> rho_pinned(m, 0);
  for (int i = 0; i < m; ++i) {
    if (l[i] == kInf || u[i] == -kInf || u[i] - l[i] < 0) status = 2;  // primal infeasible
    if (l[i] == -kInf && u[i] == kInf) { w.rho[i] = 1e-6; rho_pinned[i] = 1; }
    else if (w.sy[i] * std::fabs(l[i] - u[i]) < 1e-5) w.rho[i] = o.rho_eq_scale * o.rho;
  }

  // ---------------------------------------------- reduced KKT factorization
  const auto build_mred = [&](const std::vector<double>& rho, std::vector<double>& out) {
    out.assign((std::size_t)n * n, 0.0);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double v = w.Ps[(std::size_t)i * n + j] + (i == j ? o.sigma : 0.0);
        for (int k = 0; k < m; ++k)
          v += w.As[(std::size_t)k * n + i] * rho[k] * w.As[(std::size_t)k * n + j];
        out[(std::size_t)i * n + j] = v;
      }
  };
  build_mred(w.rho, w.Mred);
  w.Lfac = w.Mred;
  if (status < 0 && !cholesky(w.Lfac.data(), n)) status = 6;  // unknown

  // --------------------------------------------------------------- iterate
  w.x.assign(n, 0.0); w.y.assign(m, 0.0); w.z.assign(m, 0.0);
  if (primal && dual) {
    bool ws = false;
    for (int j = 0; j < n && !ws; ++j) ws = primal[j] != 0;
    for (int i = 0; i < m && !ws; ++i) ws = dual[i] != 0;
    if (ws) {
      for (int j = 0; j < n; ++j) w.x[j] = primal[j] / w.sx[j];
      for (int i = 0; i < m; ++i) w.y[i] = w.c * dual[i] / w.sy[i];
      std::vector<double> Axw(m);
      matvec(A, primal, Axw.data(), m, n);
      for (int i = 0; i < m; ++i) w.z[i] = w.sy[i] * Axw[i];
    }
  }

  w.rhs.resize(n); w.zt.resize(m); w.tmp_n.resize(n); w.tmp_m.resize(m);
  w.x_old.resize(n); w.y_old.resize(m);
  std::vector<double> x_us(n), y_us(m), z_us(m), dx_us(n), dy_us(m);
  double pres = kInf, dres = kInf;

  int iter = 0;
  for (; iter < o.max_iter && status < 0; ++iter) {
    w.x_old = w.x; w.y_old = w.y;

    // KKT solve in reduced form
    for (int i = 0; i < m; ++i) w.tmp_m[i] = w.rho[i] * w.z[i] - w.y[i];
    matvec_t(w.As.data(), w.tmp_m.data(), w.rhs.data(), m, n);
    for (int j = 0; j < n; ++j) w.rhs[j] += o.sigma * w.x[j] - w.qs[j];
    chol_solve(w.Lfac.data(), w.rhs.data(), n);           // xt
    matvec(w.As.data(), w.rhs.data(), w.zt.data(), m, n);  // zt = As xt

    for (int j = 0; j < n; ++j) w.x[j] = o.alpha * w.rhs[j] + (1 - o.alpha) * w.x[j];
    for (int i = 0; i < m; ++i) {
      const double znew = std::fmin(
          std::fmax(o.alpha * w.zt[i] + (1 - o.alpha) * w.z[i] + w.y[i] / w.rho[i], w.ls[i]),
          w.us[i]);
      w.y[i] += w.rho[i] * (o.alpha * w.zt[i] + (1 - o.alpha) * w.z[i] - znew);
      w.z[i] = znew;
    }

    if (iter % o.stop_check_iter == 1 % o.stop_check_iter) {
      for (int j = 0; j < n; ++j) {
        x_us[j] = w.sx[j] * w.x[j];
        dx_us[j] = w.sx[j] * (w.x[j] - w.x_old[j]);
      }
      for (int i = 0; i < m; ++i) {
        y_us[i] = w.sy[i] * w.y[i] / w.c;
        dy_us[i] = w.sy[i] * (w.y[i] - w.y_old[i]) / w.c;
        z_us[i] = w.z[i] / w.sy[i];
      }

      // optimality
      std::vector<double> Ax(m), Px(n), Aty(n);
      matvec(A, x_us.data(), Ax.data(), m, n);
      const double Axn = norm_inf(Ax.data(), m);
      for (int i = 0; i < m; ++i) Ax[i] -= z_us[i];
      pres = norm_inf(Ax.data(), m);
      matvec(P, x_us.data(), Px.data(), n, n);
      matvec_t(A, y_us.data(), Aty.data(), m, n);
      const double dscale = std::fmax(norm_inf(Px.data(), n),
                                      std::fmax(norm_inf(q, n), norm_inf(Aty.data(), n)));
      for (int j = 0; j < n; ++j) Px[j] += q[j] + Aty[j];
      dres = norm_inf(Px.data(), n);
      const bool p_ok = pres <= o.eps_abs + o.eps_rel * std::fmax(Axn, norm_inf(z_us.data(), m));
      const bool d_ok = dres <= o.eps_abs + o.eps_rel * dscale;
      if (p_ok && d_ok) { status = 0; ++iter; break; }

      // primal infeasibility certificate
      const double E = norm_inf(dy_us.data(), m);
      if (E > 0) {
        std::vector<double> Atdy(n);
        matvec_t(A, dy_us.data(), Atdy.data(), m, n);
        double sum = 0;
        bool viol = false;
        for (int i = 0; i < m; ++i) {
          if (u[i] != kInf) sum += u[i] * std::fmax(0.0, dy_us[i]);
          else if (dy_us[i] > o.eps_primal_inf * E) { viol = true; break; }
          if (l[i] != -kInf) sum += l[i] * std::fmin(0.0, dy_us[i]);
          else if (dy_us[i] < -o.eps_primal_inf * E) { viol = true; break; }
        }
        if (!viol && std::fmax(norm_inf(Atdy.data(), n), sum) < o.eps_primal_inf * E) {
          status = 2; ++iter; break;
        }
      }

      // dual infeasibility certificate
      const double dxn = norm_inf(dx_us.data(), n);
      if (dxn > 0) {
        std::vector<double> Pdx(n), Adx(m);
        matvec(P, dx_us.data(), Pdx.data(), n, n);
        matvec(A, dx_us.data(), Adx.data(), m, n);
        double qdx = 0;
        for (int j = 0; j < n; ++j) qdx += q[j] * dx_us[j];
        bool di = norm_inf(Pdx.data(), n) <= o.eps_dual_inf * dxn && qdx <= o.eps_dual_inf * dxn;
        for (int i = 0; i < m && di; ++i) {
          if (u[i] == kInf) di = Adx[i] >= -o.eps_dual_inf * dxn;
          else if (l[i] == -kInf) di = Adx[i] <= o.eps_dual_inf * dxn;
          else di = std::fabs(Adx[i]) < o.eps_dual_inf * dxn;
        }
        if (di) { status = 3; ++iter; break; }
      }

      // residual-balancing rho adaptation (OSQP sec. 5.2); mirrors the JAX
      // solver's lane/xla adaptive_rho exactly (same ratio, band, clipping,
      // and keep-old-factors-on-failure semantics) so iteration counts stay
      // cross-language comparable
      if (o.adaptive_rho) {
        const double tiny = std::numeric_limits<double>::min();
        const double pscale = std::fmax(Axn, norm_inf(z_us.data(), m));
        const double pn = pres / std::fmax(pscale, tiny);
        const double dn = dres / std::fmax(dscale, tiny);
        const double ratio = (pn > 0 && dn > 0) ? pn / std::fmax(dn, tiny) : 1.0;
        const double mult = std::sqrt(ratio);
        if (mult > o.adaptive_rho_tol || mult < 1.0 / o.adaptive_rho_tol) {
          std::vector<double> rho_new(m);
          for (int i = 0; i < m; ++i) {
            double r = std::fmin(std::fmax(w.rho[i] * mult, 1e-6), 1e6);
            rho_new[i] = rho_pinned[i] ? 1e-6 : r;
          }
          std::vector<double> Mred_new, Lnew;
          build_mred(rho_new, Mred_new);
          Lnew = Mred_new;
          if (cholesky(Lnew.data(), n)) {
            w.rho = std::move(rho_new);
            w.Mred = std::move(Mred_new);
            w.Lfac = std::move(Lnew);
          }  // else: keep the previous rho/factors
        }
      }
    }
  }

  if (status < 0) status = 4;  // max iterations

  // ------------------------------------------------------------------ polish
  // Mirrors the JAX f64 path (qp/solver.py::_polish Schur branch): active-set
  // detection on the scaled dual, reduced system embedded in the Schur
  // complement S = Ps + delta I + (1/delta) sum_active a a', polish_iter
  // refinement sweeps against the unperturbed system.
  if (o.polish && status == 0) {
    const double eps100 = 100.0 * std::numeric_limits<double>::epsilon();
    const double delta = o.delta;
    std::vector<char> low_act(m), up_act(m), act(m);
    for (int i = 0; i < m; ++i) {
      low_act[i] = (w.y[i] < -eps100) && std::isfinite(l[i]);
      // equality rows (l == u) are active at every solution regardless of
      // the multiplier's size/sign (mirrors qp/solver.py::_polish)
      const bool eq_row = std::isfinite(l[i]) && (u[i] - l[i]) <= 0.0;
      up_act[i] = (((w.y[i] > eps100) && std::isfinite(u[i])) || eq_row) &&
                  !low_act[i];
      act[i] = low_act[i] || up_act[i];
    }
    std::vector<double> S((std::size_t)n * n);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        S[(std::size_t)i * n + j] = w.Ps[(std::size_t)i * n + j] + (i == j ? delta : 0.0);
    for (int k = 0; k < m; ++k) {
      if (!act[k]) continue;
      const double* ak = w.As.data() + (std::size_t)k * n;
      for (int i = 0; i < n; ++i) {
        const double aki = ak[i] / delta;
        for (int j = 0; j < n; ++j) S[(std::size_t)i * n + j] += aki * ak[j];
      }
    }
    std::vector<double> Lp = S;
    bool pol_ok = cholesky(Lp.data(), n);
    if (pol_ok) {
      std::vector<double> x_t(n, 0.0), nu_t(m, 0.0), r_x(n), r_nu(m), rhs2(n);
      for (int sweep = 0; sweep < o.polish_iter; ++sweep) {
        // residual of the unperturbed system H = [[Ps, Aa'], [Aa, 0]]
        matvec(w.Ps.data(), x_t.data(), r_x.data(), n, n);
        for (int j = 0; j < n; ++j) r_x[j] = -w.qs[j] - r_x[j];
        for (int k = 0; k < m; ++k) {
          if (!act[k]) { r_nu[k] = 0.0; continue; }
          const double* ak = w.As.data() + (std::size_t)k * n;
          const double nk = nu_t[k];
          double ax = 0;
          for (int j = 0; j < n; ++j) { r_x[j] -= ak[j] * nk; ax += ak[j] * x_t[j]; }
          r_nu[k] = (low_act[k] ? w.ls[k] : w.us[k]) - ax;
        }
        // Schur solve: rhs = r_x + Aa' (r_nu / delta); dnu = (Aa xs - r_nu)/delta
        for (int j = 0; j < n; ++j) rhs2[j] = r_x[j];
        for (int k = 0; k < m; ++k) {
          if (!act[k]) continue;
          const double* ak = w.As.data() + (std::size_t)k * n;
          const double rk = r_nu[k] / delta;
          for (int j = 0; j < n; ++j) rhs2[j] += ak[j] * rk;
        }
        chol_solve(Lp.data(), rhs2.data(), n);
        for (int k = 0; k < m; ++k) {
          if (!act[k]) continue;
          const double* ak = w.As.data() + (std::size_t)k * n;
          double axs = 0;
          for (int j = 0; j < n; ++j) axs += ak[j] * rhs2[j];
          nu_t[k] += (axs - r_nu[k]) / delta;
        }
        for (int j = 0; j < n; ++j) x_t[j] += rhs2[j];
      }
      bool fin = true;
      for (int j = 0; j < n && fin; ++j) fin = std::isfinite(x_t[j]);
      for (int k = 0; k < m && fin; ++k) fin = std::isfinite(nu_t[k]);
      if (fin) {
        w.x = x_t;
        for (int k = 0; k < m; ++k)
          if (act[k]) w.y[k] = nu_t[k];
      } else {
        pol_ok = false;
      }
    }
    if (!pol_ok) status = 1;  // PolishFailed
  }

  // unscale + outputs
  double obj = 0;
  if (primal) {
    for (int j = 0; j < n; ++j) primal[j] = w.sx[j] * w.x[j];
    std::vector<double> Px(n);
    matvec(P, primal, Px.data(), n, n);
    for (int j = 0; j < n; ++j) obj += primal[j] * (0.5 * Px[j] + q[j]);
  }
  if (dual)
    for (int i = 0; i < m; ++i) dual[i] = w.sy[i] * w.y[i] / w.c;

  if (res) {
    res->status = status;
    res->iters = iter;
    res->objective = obj;
    res->primal_res = pres;
    res->dual_res = dres;
  }
  return status;
}

}  // extern "C"
