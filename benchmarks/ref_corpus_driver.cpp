// ref_corpus_driver.cpp — single-core reference SparseSolver corpus driver.
//
// The honest baseline for BASELINE config 3 (Maros-Meszaros small/medium
// sparse subset): loads a batch of sparse QPs from a flat binary file
// (written by benchmarks/corpus_bench.py), solves each with the REAL
// reference piqp::SparseSolver<double,int> (header-only,
// /root/reference/include — the backend its own corpus tests use,
// tests/src/sparse/maros_meszaros_tests.cpp:22-36), and prints one JSON
// line with per-instance status + wall time (setup+solve, i.e. cold).
//
// Build (Eigen vendored by the tensorflow wheel):
//   g++ -O3 -march=native -DNDEBUG -I/root/reference/include \
//       -I/opt/venv/lib/python3.12/site-packages/tensorflow/include \
//       benchmarks/ref_corpus_driver.cpp -o /tmp/ref_corpus_driver
//
// File format (little-endian): int64 count, then per QP:
//   int64 n, p, m
//   CSC P (n x n, full symmetric): int64 nnz, int32 outer[n+1],
//     int32 inner[nnz], double vals[nnz]
//   CSC A (p x n), CSC G (m x n): same layout
//   double c[n], b[p], h_l[m], h_u[m], x_l[n], x_u[n]  (+-inf allowed)
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "piqp/piqp.hpp"

using Clock = std::chrono::steady_clock;
using SpMat = Eigen::SparseMatrix<double, Eigen::ColMajor, int>;
using Vec = Eigen::VectorXd;

static void read_exact(FILE* f, void* dst, size_t bytes) {
    if (bytes && fread(dst, 1, bytes, f) != bytes) {
        fprintf(stderr, "short read\n");
        exit(1);
    }
}

static SpMat read_csc(FILE* f, int64_t rows, int64_t cols) {
    int64_t nnz;
    read_exact(f, &nnz, 8);
    std::vector<int32_t> outer((size_t)cols + 1), inner((size_t)nnz);
    std::vector<double> vals((size_t)nnz);
    read_exact(f, outer.data(), 4 * outer.size());
    read_exact(f, inner.data(), 4 * inner.size());
    read_exact(f, vals.data(), 8 * vals.size());
    SpMat M(rows, cols);
    M.reserve(nnz);
    for (int64_t j = 0; j < cols; j++) {
        M.startVec(j);
        for (int32_t k = outer[j]; k < outer[j + 1]; k++) {
            M.insertBack(inner[k], j) = vals[k];
        }
    }
    M.finalize();
    return M;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s batch.bin\n", argv[0]);
        return 1;
    }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }

    int64_t count;
    read_exact(f, &count, 8);

    printf("{\"driver\": \"ref_corpus\", \"count\": %lld, \"results\": [",
           (long long)count);
    int solved = 0;
    double total_s = 0.0;
    for (int64_t i = 0; i < count; i++) {
        int64_t n, p, m;
        read_exact(f, &n, 8); read_exact(f, &p, 8); read_exact(f, &m, 8);
        SpMat P = read_csc(f, n, n);
        SpMat A = read_csc(f, p, n);
        SpMat G = read_csc(f, m, n);
        Vec c(n), b(p), h_l(m), h_u(m), x_l(n), x_u(n);
        read_exact(f, c.data(), 8 * n);
        read_exact(f, b.data(), 8 * p);
        read_exact(f, h_l.data(), 8 * m);
        read_exact(f, h_u.data(), 8 * m);
        read_exact(f, x_l.data(), 8 * n);
        read_exact(f, x_u.data(), 8 * n);

        auto t0 = Clock::now();
        piqp::SparseSolver<double, int> solver;
        solver.setup(P, c, A, b, G, h_l, h_u, x_l, x_u);
        piqp::Status st = solver.solve();
        double dt = std::chrono::duration<double>(Clock::now() - t0).count();
        total_s += dt;
        bool ok = st == piqp::Status::PIQP_SOLVED;
        if (ok) solved++;
        printf("%s{\"i\": %lld, \"status\": %d, \"s\": %.6f, "
               "\"iter\": %lld}",
               i ? ", " : "", (long long)i, (int)st, dt,
               (long long)solver.result().info.iter);
    }
    fclose(f);
    printf("], \"solved\": %d, \"total_s\": %.6f}\n", solved, total_s);
    return 0;
}
