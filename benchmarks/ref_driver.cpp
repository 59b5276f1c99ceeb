// ref_driver.cpp — single-core reference-solver benchmark driver.
//
// Loads a batch of dense QPs from a flat binary file (written by
// benchmarks/make_batch.py), solves each one with the reference PIQP
// DenseSolver (header-only, /root/reference/include), then performs a warm
// update(c')+solve pass over the whole batch, and prints one JSON line with
// cold and warm aggregate solves/sec.  This is the honest "single-core PIQP"
// baseline for BASELINE config 2 (1024 vmapped dense QPs with warm
// re-solves); mirrors the shape of the reference's own harness
// (benchmarks/src/dense_sparse_solver_benchmark.cpp:17-56) without
// google-benchmark.
//
// Build (Eigen vendored by tensorflow wheels):
//   g++ -O3 -march=native -DNDEBUG -I/root/reference/include \
//       -I/opt/venv/lib/python3.12/site-packages/tensorflow/include \
//       benchmarks/ref_driver.cpp -o /tmp/ref_driver
//
// File format (all little-endian): int64 count, then per QP:
//   int64 n, p, m; double P[n*n] (row-major), c[n], A[p*n], b[p],
//   G[m*n], h_l[m], h_u[m], x_l[n], x_u[n]   (inf encoded as +/-1e30)
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "piqp/piqp.hpp"

using Clock = std::chrono::steady_clock;
using Mat = Eigen::Matrix<double, Eigen::Dynamic, Eigen::Dynamic, Eigen::RowMajor>;
using Vec = Eigen::VectorXd;

struct QP {
    Mat P, A, G;
    Vec c, b, h_l, h_u, x_l, x_u;
};

static void read_exact(FILE* f, void* dst, size_t bytes) {
    if (fread(dst, 1, bytes, f) != bytes) {
        fprintf(stderr, "short read\n");
        exit(1);
    }
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s batch.bin [warm_rounds]\n", argv[0]);
        return 1;
    }
    int warm_rounds = argc > 2 ? atoi(argv[2]) : 1;
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }

    int64_t count;
    read_exact(f, &count, 8);
    std::vector<QP> qps((size_t)count);
    for (auto& qp : qps) {
        int64_t n, p, m;
        read_exact(f, &n, 8); read_exact(f, &p, 8); read_exact(f, &m, 8);
        qp.P.resize(n, n); qp.c.resize(n);
        qp.A.resize(p, n); qp.b.resize(p);
        qp.G.resize(m, n); qp.h_l.resize(m); qp.h_u.resize(m);
        qp.x_l.resize(n); qp.x_u.resize(n);
        read_exact(f, qp.P.data(), 8 * n * n);
        read_exact(f, qp.c.data(), 8 * n);
        read_exact(f, qp.A.data(), 8 * p * n);
        read_exact(f, qp.b.data(), 8 * p);
        read_exact(f, qp.G.data(), 8 * m * n);
        read_exact(f, qp.h_l.data(), 8 * m);
        read_exact(f, qp.h_u.data(), 8 * m);
        read_exact(f, qp.x_l.data(), 8 * n);
        read_exact(f, qp.x_u.data(), 8 * n);
    }
    fclose(f);

    std::vector<piqp::DenseSolver<double>*> solvers;
    solvers.reserve(qps.size());
    int solved = 0;

    // cold pass: setup + solve each QP once
    auto t0 = Clock::now();
    for (auto& qp : qps) {
        auto* s = new piqp::DenseSolver<double>();
        s->settings().verbose = false;
        s->settings().compute_timings = false;
        s->setup(qp.P, qp.c, qp.A, qp.b, qp.G, qp.h_l, qp.h_u, qp.x_l, qp.x_u);
        piqp::Status st = s->solve();
        if (st == piqp::Status::PIQP_SOLVED) solved++;
        solvers.push_back(s);
    }
    double cold_s = std::chrono::duration<double>(Clock::now() - t0).count();

    // warm pass(es): perturb c, update, re-solve (the SQP/MPC pattern,
    // solver.hpp:218-308 allocation-free update path)
    int warm_solved = 0;
    auto t1 = Clock::now();
    for (int r = 0; r < warm_rounds; ++r) {
        for (size_t i = 0; i < qps.size(); ++i) {
            Vec c2 = qps[i].c * (1.0 + 0.01 * (r + 1));
            solvers[i]->update(piqp::nullopt, c2);
            piqp::Status st = solvers[i]->solve();
            if (st == piqp::Status::PIQP_SOLVED) warm_solved++;
        }
    }
    double warm_s = std::chrono::duration<double>(Clock::now() - t1).count();

    double nq = (double)qps.size();
    printf("{\"count\": %lld, \"solved\": %d, \"warm_solved\": %d, "
           "\"cold_s\": %.6f, \"warm_s\": %.6f, "
           "\"cold_qps_per_s\": %.2f, \"warm_qps_per_s\": %.2f}\n",
           (long long)count, solved, warm_solved, cold_s, warm_s,
           nq / cold_s, nq * warm_rounds / warm_s);
    for (auto* s : solvers) delete s;
    return 0;
}
