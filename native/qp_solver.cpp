// Active-set solver for lower-bounded quadratic programs:
//     min 1/2 x^T P x + q^T x   s.t.  x >= lb
//
// A Lawson-Hanson-style primal active-set method (the NNLS algorithm
// generalized to an arbitrary SPD quadratic form and nonzero lower bounds).
// Serves as an independent numerical oracle for the JAX interior-point
// solver (hybdrt_tpu/ops/qp.py) — the role cvxopt's C solver plays for the
// reference implementation — and as a fast host-side fallback for small QPs.
//
// No external dependencies: dense Cholesky factorization implemented inline
// (problem sizes here are ~100-1000 variables).
//
// C ABI: see solve_qp_box() at the bottom.

#include <cmath>
#include <cstring>
#include <vector>
#include <limits>

namespace {

// Cholesky factorization A = L L^T in place (lower triangle).
// Returns false if the matrix is not positive definite.
bool cholesky(std::vector<double>& a, int n) {
    for (int j = 0; j < n; ++j) {
        double d = a[j * n + j];
        for (int k = 0; k < j; ++k) d -= a[j * n + k] * a[j * n + k];
        if (d <= 0.0) return false;
        const double ljj = std::sqrt(d);
        a[j * n + j] = ljj;
        for (int i = j + 1; i < n; ++i) {
            double s = a[i * n + j];
            for (int k = 0; k < j; ++k) s -= a[i * n + k] * a[j * n + k];
            a[i * n + j] = s / ljj;
        }
    }
    return true;
}

// Solve L L^T x = b given the Cholesky factor L (lower triangle of a).
void cho_solve(const std::vector<double>& a, int n, std::vector<double>& b) {
    for (int i = 0; i < n; ++i) {
        double s = b[i];
        for (int k = 0; k < i; ++k) s -= a[i * n + k] * b[k];
        b[i] = s / a[i * n + i];
    }
    for (int i = n - 1; i >= 0; --i) {
        double s = b[i];
        for (int k = i + 1; k < n; ++k) s -= a[k * n + i] * b[k];
        b[i] = s / a[i * n + i];
    }
}

}  // namespace

extern "C" {

// Solve min 1/2 x'Px + q'x s.t. x >= lb.
//   p:   n*n row-major symmetric positive definite matrix
//   q:   n vector
//   lb:  n vector of lower bounds
//   x:   output, n vector
// Returns the number of outer iterations used, or -1 on failure
// (non-PD reduced system).
int solve_qp_box(int n, const double* p, const double* q, const double* lb,
                 double* x, int max_iter, double tol) {
    std::vector<char> free_set(n, 0);
    std::vector<double> xv(lb, lb + n);  // start with every variable at its bound
    std::vector<double> grad(n);

    // Gradient scale for the optimality tolerance
    double qmax = 1.0;
    for (int i = 0; i < n; ++i) qmax = std::max(qmax, std::fabs(q[i]));
    const double gtol = tol * qmax;

    if (max_iter <= 0) max_iter = 3 * n + 50;

    std::vector<int> idx;          // indices of free variables
    std::vector<double> pff, rhs;  // reduced system storage

    int outer = 0;
    for (; outer < max_iter; ++outer) {
        // Gradient g = P x + q
        for (int i = 0; i < n; ++i) {
            double s = q[i];
            const double* prow = p + (size_t)i * n;
            for (int j = 0; j < n; ++j) s += prow[j] * xv[j];
            grad[i] = s;
        }

        // Most negative gradient among active (bound) variables
        int i_star = -1;
        double g_min = -gtol;
        for (int i = 0; i < n; ++i) {
            if (!free_set[i] && grad[i] < g_min) {
                g_min = grad[i];
                i_star = i;
            }
        }
        if (i_star < 0) break;  // KKT satisfied
        free_set[i_star] = 1;

        // Inner loop: solve the equality-constrained subproblem on the free
        // set; if infeasible, step to the first blocking bound and shrink.
        for (int inner = 0; inner < max_iter; ++inner) {
            idx.clear();
            for (int i = 0; i < n; ++i)
                if (free_set[i]) idx.push_back(i);
            const int m = (int)idx.size();
            if (m == 0) break;

            pff.assign((size_t)m * m, 0.0);
            rhs.assign(m, 0.0);
            for (int a = 0; a < m; ++a) {
                const double* prow = p + (size_t)idx[a] * n;
                double r = -q[idx[a]];
                for (int j = 0; j < n; ++j)
                    if (!free_set[j]) r -= prow[j] * lb[j];
                rhs[a] = r;
                for (int b = 0; b < m; ++b) pff[(size_t)a * m + b] = prow[idx[b]];
            }
            // Tiny diagonal lift for numerical safety on near-singular systems
            double dmean = 0.0;
            for (int a = 0; a < m; ++a) dmean += pff[(size_t)a * m + a];
            dmean /= m;
            for (int a = 0; a < m; ++a) pff[(size_t)a * m + a] += 1e-13 * dmean;

            if (!cholesky(pff, m)) return -1;
            cho_solve(pff, m, rhs);  // rhs now holds the candidate x_F

            // Feasibility check on the free set
            bool feasible = true;
            double alpha = 1.0;
            int blocker = -1;
            for (int a = 0; a < m; ++a) {
                const int i = idx[a];
                if (rhs[a] < lb[i]) {
                    feasible = false;
                    const double denom = xv[i] - rhs[a];
                    if (denom > 0) {
                        const double step = (xv[i] - lb[i]) / denom;
                        if (step < alpha) {
                            alpha = step;
                            blocker = i;
                        }
                    }
                }
            }
            if (feasible) {
                for (int a = 0; a < m; ++a) xv[idx[a]] = rhs[a];
                break;
            }
            // Move toward the candidate until the first bound blocks
            for (int a = 0; a < m; ++a) {
                const int i = idx[a];
                xv[i] += alpha * (rhs[a] - xv[i]);
                if (xv[i] < lb[i]) xv[i] = lb[i];
            }
            if (blocker >= 0) {
                xv[blocker] = lb[blocker];
                free_set[blocker] = 0;
            } else {
                break;  // no identifiable blocker: accept clipped iterate
            }
        }
    }

    std::memcpy(x, xv.data(), sizeof(double) * n);
    return outer;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched entry point: solve B independent box-constrained QPs, parallelized
// over host threads with OpenMP when available. This is the native runtime
// analog of the vmapped device path (hybdrt_tpu/parallel/batch.py): same
// problem layout, CPU execution for environments without an accelerator.
// ---------------------------------------------------------------------------
extern "C" {

int solve_qp_box_batch(int batch, int n, const double* p, const double* q,
                       const double* lb, double* x, int max_iter, double tol) {
    int worst = 0;
    int failed = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic) reduction(max : worst) \
    reduction(| : failed)
#endif
    for (int b = 0; b < batch; ++b) {
        double* xb = x + (size_t)b * n;
        const int iters = solve_qp_box(n, p + (size_t)b * n * n, q + (size_t)b * n,
                                       lb, xb, max_iter, tol);
        if (iters < 0) {
            // Mark the failed element so the caller cannot mistake the
            // untouched (zero) output for a solution
            for (int i = 0; i < n; ++i) xb[i] = std::nan("");
            failed = 1;
        } else if (iters > worst) {
            worst = iters;
        }
    }
    return failed ? -1 : worst;
}

}  // extern "C"
