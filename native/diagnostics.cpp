// Host-side chain diagnostics: batched ESS and split-R-hat.
//
// Role in the framework (SURVEY.md section 2.2): the reference delegated all
// heavy host numerics to compiled libraries (LAPACK/Cephes via scipy); this
// TPU-native rebuild keeps device compute in XLA/Pallas but gives the HOST
// side of the runtime a compiled core too. Post-processing checkpointed
// chain archives (thousands of chains x long runs x many params) through
// numpy/JAX round-trips is allocation-bound; this library computes the
// Geyer-truncated effective sample size and split-R-hat in one pass with a
// thread pool, bit-identical in algorithm to
// gptools_tpu/utils/diagnostics.py (tested against it).
//
// Build: `make -C native` (plain C ABI, loaded via ctypes — no pybind11).
//
// Algorithm (matches diagnostics.ess):
//   acov_j  = (1/n) sum_t xc_t xc_{t+j}                (biased autocov)
//   w       = mean over chains of var(chain, ddof=1)
//   varplus = w (n-1)/n + B/n,  B = n var(chain means, ddof=1)  [m > 1]
//   rho_j   = 1 - (w - mean_c acov_j) / varplus
//   pairs P_k = rho_{2k} + rho_{2k+1}; running-min monotonization;
//   truncate at first non-positive pair; tau = -1 + 2 sum P;
//   ESS = m n / max(tau, 1/n).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// ESS for one parameter: chains is (m, n) row-major with row stride `stride`.
double ess_one(const double* chains, int64_t m, int64_t n, int64_t stride) {
    std::vector<double> mean_acov(n, 0.0);
    std::vector<double> xc(n);
    double w = 0.0;
    std::vector<double> chain_means(m);

    for (int64_t c = 0; c < m; ++c) {
        const double* x = chains + c * stride;
        double mu = 0.0;
        for (int64_t t = 0; t < n; ++t) mu += x[t];
        mu /= (double)n;
        chain_means[c] = mu;
        for (int64_t t = 0; t < n; ++t) xc[t] = x[t] - mu;
        // biased autocovariances, accumulated across chains
        for (int64_t j = 0; j < n; ++j) {
            double s = 0.0;
            for (int64_t t = 0; t + j < n; ++t) s += xc[t] * xc[t + j];
            mean_acov[j] += s / (double)n;
        }
        // ddof=1 variance
        double v = mean_acov[0];  // careful: accumulated; recompute per chain
        (void)v;
        double ss = 0.0;
        for (int64_t t = 0; t < n; ++t) ss += xc[t] * xc[t];
        w += ss / (double)(n - 1);
    }
    for (int64_t j = 0; j < n; ++j) mean_acov[j] /= (double)m;
    w /= (double)m;

    double varplus = w * (double)(n - 1) / (double)n;
    if (m > 1) {
        double gm = 0.0;
        for (int64_t c = 0; c < m; ++c) gm += chain_means[c];
        gm /= (double)m;
        double b = 0.0;
        for (int64_t c = 0; c < m; ++c) {
            double d = chain_means[c] - gm;
            b += d * d;
        }
        b = (double)n * b / (double)(m - 1);
        varplus += b / (double)n;
    }
    if (varplus <= 0.0) return (double)(m * n);

    const int64_t n_pairs = n / 2;
    double tau = -1.0;
    double running_min = INFINITY;
    for (int64_t k = 0; k < n_pairs; ++k) {
        double rho0 = 1.0 - (w - mean_acov[2 * k]) / varplus;
        double rho1 = 1.0 - (w - mean_acov[2 * k + 1]) / varplus;
        double pair = rho0 + rho1;
        running_min = std::min(running_min, pair);
        if (running_min <= 0.0) break;
        tau += 2.0 * running_min;
    }
    tau = std::max(tau, 1.0 / (double)n);
    return (double)(m * n) / tau;
}

// split-R-hat for one parameter on (m, n) with stride.
double rhat_one(const double* chains, int64_t m, int64_t n, int64_t stride) {
    const int64_t half = n / 2;
    if (half < 2) return NAN;
    const int64_t m2 = 2 * m;
    std::vector<double> means(m2), vars(m2);
    for (int64_t c = 0; c < m2; ++c) {
        const double* x = chains + (c % m) * stride + (c / m) * half;
        double mu = 0.0;
        for (int64_t t = 0; t < half; ++t) mu += x[t];
        mu /= (double)half;
        double ss = 0.0;
        for (int64_t t = 0; t < half; ++t) {
            double d = x[t] - mu;
            ss += d * d;
        }
        means[c] = mu;
        vars[c] = ss / (double)(half - 1);
    }
    double wv = 0.0, gm = 0.0;
    for (int64_t c = 0; c < m2; ++c) {
        wv += vars[c];
        gm += means[c];
    }
    wv /= (double)m2;
    gm /= (double)m2;
    double b = 0.0;
    for (int64_t c = 0; c < m2; ++c) {
        double d = means[c] - gm;
        b += d * d;
    }
    b = (double)half * b / (double)(m2 - 1);
    double varplus = (double)(half - 1) / (double)half * wv + b / (double)half;
    return std::sqrt(varplus / wv);
}

template <typename F>
void parallel_over(int64_t count, F&& fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int64_t n_threads = std::min<int64_t>(count, hw ? hw : 4);
    if (n_threads <= 1) {
        for (int64_t i = 0; i < count; ++i) fn(i);
        return;
    }
    std::atomic<int64_t> next(0);
    std::vector<std::thread> pool;
    for (int64_t t = 0; t < n_threads; ++t) {
        pool.emplace_back([&]() {
            for (;;) {
                int64_t i = next.fetch_add(1);
                if (i >= count) return;
                fn(i);
            }
        });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// chains: (m, n, d) C-contiguous float64. out: (d,) per-parameter values.
void gpt_ess_batch(const double* chains, int64_t m, int64_t n, int64_t d,
                   double* out) {
    parallel_over(d, [&](int64_t k) {
        // gather parameter k into a contiguous (m, n) scratch
        std::vector<double> buf((size_t)(m * n));
        for (int64_t c = 0; c < m; ++c)
            for (int64_t t = 0; t < n; ++t)
                buf[(size_t)(c * n + t)] = chains[(c * n + t) * d + k];
        out[k] = ess_one(buf.data(), m, n, n);
    });
}

void gpt_split_rhat_batch(const double* chains, int64_t m, int64_t n,
                          int64_t d, double* out) {
    parallel_over(d, [&](int64_t k) {
        std::vector<double> buf((size_t)(m * n));
        for (int64_t c = 0; c < m; ++c)
            for (int64_t t = 0; t < n; ++t)
                buf[(size_t)(c * n + t)] = chains[(c * n + t) * d + k];
        out[k] = rhat_one(buf.data(), m, n, n);
    });
}

int gpt_abi_version() { return 1; }

}  // extern "C"
