// Native host-side runtime components for phdslam_tpu.
//
// C++ equivalents of the reference's host support libraries:
//  - greedy Gaussian-mixture reduction (src/gm_reduce.cpp:57-134, Eigen)
//    used by the EAP expected-map path — here with hand-rolled 2x2/NxN
//    Cholesky instead of Eigen (not available in this image)
//  - Jonker-Volgenant-style Hungarian assignment for OSPA scoring (the
//    reference ships three Munkres implementations: python/munkres_step4.pyx,
//    src/munkres.cu, src/fastslam.cu)
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image). Build: `make -C native`.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Greedy moment-matched GM reduction, d-dimensional.
//
// Semantics of reduceGaussianMixture (src/gm_reduce.cpp:57-134): sort by
// weight descending; repeatedly take the strongest unmerged component, pull
// in every unmerged component within `min_distance` squared-Mahalanobis
// (averaged covariance, Cholesky solve), moment-match.
//
// w[n], mean[n*d], cov[n*d*d] row-major. Outputs written in place into
// out_* buffers sized like the inputs; returns the number of merged
// components.
// ---------------------------------------------------------------------------

static bool cholesky(const double* a, double* l, int d) {
    // lower-triangular Cholesky; returns false if not PD
    for (int i = 0; i < d; i++) {
        for (int j = 0; j <= i; j++) {
            double s = a[i * d + j];
            for (int k = 0; k < j; k++) s -= l[i * d + k] * l[j * d + k];
            if (i == j) {
                if (s <= 0.0) return false;
                l[i * d + i] = std::sqrt(s);
            } else {
                l[i * d + j] = s / l[j * d + j];
            }
        }
        for (int j = i + 1; j < d; j++) l[i * d + j] = 0.0;
    }
    return true;
}

static double mahal_sq(const double* ma, const double* ca, const double* mb,
                       const double* cb, int d, std::vector<double>& scratch) {
    // distance with averaged covariance: x = L^-1 (ma - mb); return |x|^2
    double* sigma = scratch.data();
    double* l = sigma + d * d;
    double* y = l + d * d;
    for (int i = 0; i < d * d; i++) sigma[i] = 0.5 * (ca[i] + cb[i]);
    if (!cholesky(sigma, l, d)) return std::numeric_limits<double>::infinity();
    for (int i = 0; i < d; i++) {
        double s = ma[i] - mb[i];
        for (int k = 0; k < i; k++) s -= l[i * d + k] * y[k];
        y[i] = s / l[i * d + i];
    }
    double out = 0.0;
    for (int i = 0; i < d; i++) out += y[i] * y[i];
    return out;
}

int gm_reduce(const double* w, const double* mean, const double* cov,
              int n, int d, double min_distance,
              double* out_w, double* out_mean, double* out_cov) {
    std::vector<int> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return w[a] > w[b]; });
    std::vector<char> used(n, 0);
    std::vector<double> scratch(3 * d * d + d);
    std::vector<int> members;
    int n_out = 0;
    for (int oi = 0; oi < n; oi++) {
        int head = order[oi];
        if (used[head] || w[head] <= 0.0) continue;
        used[head] = 1;
        members.clear();
        members.push_back(head);
        for (int oj = oi + 1; oj < n; oj++) {
            int cand = order[oj];
            if (used[cand] || w[cand] <= 0.0) continue;
            double dist = mahal_sq(mean + head * d, cov + head * d * d,
                                   mean + cand * d, cov + cand * d * d, d,
                                   scratch);
            if (dist < min_distance) {
                used[cand] = 1;
                members.push_back(cand);
            }
        }
        // moment match
        double wsum = 0.0;
        std::vector<double> mu(d, 0.0);
        for (int idx : members) {
            wsum += w[idx];
            for (int k = 0; k < d; k++) mu[k] += w[idx] * mean[idx * d + k];
        }
        for (int k = 0; k < d; k++) mu[k] /= wsum;
        std::vector<double> sig(d * d, 0.0);
        for (int idx : members) {
            for (int i = 0; i < d; i++) {
                double di = mu[i] - mean[idx * d + i];
                for (int j = 0; j < d; j++) {
                    double dj = mu[j] - mean[idx * d + j];
                    sig[i * d + j] += w[idx] * (cov[idx * d * d + i * d + j]
                                                + di * dj);
                }
            }
        }
        out_w[n_out] = wsum;
        for (int k = 0; k < d; k++) out_mean[n_out * d + k] = mu[k];
        for (int k = 0; k < d * d; k++)
            out_cov[n_out * d * d + k] = sig[k] / wsum;
        n_out++;
    }
    return n_out;
}

// ---------------------------------------------------------------------------
// Hungarian assignment (Jonker-Volgenant shortest augmenting path),
// O(n^3), rectangular n_rows <= n_cols. cost[n_rows * n_cols] row-major.
// Writes row -> col assignment into `assignment` (length n_rows).
// Returns total assigned cost.
// ---------------------------------------------------------------------------

double hungarian(const double* cost, int n_rows, int n_cols,
                 int32_t* assignment) {
    const double INF = std::numeric_limits<double>::infinity();
    std::vector<double> u(n_rows + 1, 0.0), v(n_cols + 1, 0.0);
    std::vector<int> p(n_cols + 1, 0), way(n_cols + 1, 0);
    for (int i = 1; i <= n_rows; i++) {
        p[0] = i;
        int j0 = 0;
        std::vector<double> minv(n_cols + 1, INF);
        std::vector<char> used(n_cols + 1, 0);
        do {
            used[j0] = 1;
            int i0 = p[j0], j1 = 0;
            double delta = INF;
            for (int j = 1; j <= n_cols; j++) {
                if (used[j]) continue;
                double cur = cost[(i0 - 1) * n_cols + (j - 1)] - u[i0] - v[j];
                if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
                if (minv[j] < delta) { delta = minv[j]; j1 = j; }
            }
            for (int j = 0; j <= n_cols; j++) {
                if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
                else minv[j] -= delta;
            }
            j0 = j1;
        } while (p[j0] != 0);
        do { int j1 = way[j0]; p[j0] = p[j1]; j0 = j1; } while (j0);
    }
    double total = 0.0;
    for (int j = 1; j <= n_cols; j++) {
        if (p[j] > 0) {
            assignment[p[j] - 1] = j - 1;
            total += cost[(p[j] - 1) * n_cols + (j - 1)];
        }
    }
    return total;
}

}  // extern "C"
