"""BASELINE config 3: Maros-Meszaros small/medium sparse subset, solved
head-to-head against the REAL reference solver.

Reference side: benchmarks/ref_corpus_driver.cpp builds the actual PIQP
C++ (header-only, /root/reference/include, Eigen vendored by the
tensorflow wheel) and runs piqp::SparseSolver<double,int> — the exact
backend the reference's own corpus gate uses
(/root/reference/tests/src/sparse/maros_meszaros_tests.cpp:22-36) —
single-core on the byte-identical instances.

Our side: the host sparse backend (hostsparse.py, the routing target for
large unstructured sparse problems per docs/backends.md) at the same
default tolerances (eps_abs 1e-8, eps_rel 1e-9).

Prints ONE JSON line:
  {"metric": "corpus_m3_solves", "value": <our solves/sec>,
   "unit": "qp/s", "vs_baseline": <ours / reference>, "extra": {...}}

Usage: python benchmarks/corpus_bench.py [max_n] [--ours-only]
"""

from __future__ import annotations

import glob
import json
import os
import struct
import subprocess
import sys
import time

import numpy as np
import scipy.io as sio
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAROS_DIR = "/root/reference/tests/data/maros_meszaros"
DRIVER_SRC = os.path.join(REPO, "benchmarks", "ref_corpus_driver.cpp")
DRIVER_BIN = "/tmp/ref_corpus_driver"
TF_INCLUDE = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"


def select_instances(max_n):
    """All Maros-Meszaros instances with n <= max_n, sorted by name."""
    out = []
    for path in sorted(glob.glob(MAROS_DIR + "/*.mat")):
        raw = sio.loadmat(path)
        n = int(raw["P"].shape[0])
        if n <= max_n:
            out.append((os.path.basename(path)[:-4], path))
    return out


def _write_csc(fh, M, rows, cols):
    if M is None:
        M = sp.csc_matrix((rows, cols))
    M = sp.csc_matrix(M)
    M.sort_indices()
    fh.write(struct.pack("<q", M.nnz))
    fh.write(np.asarray(M.indptr, dtype="<i4").tobytes())
    fh.write(np.asarray(M.indices, dtype="<i4").tobytes())
    fh.write(np.asarray(M.data, dtype="<f8").tobytes())


def dump_batch(instances, path):
    from piqp_tpu.utils.io import load_mat

    probs = []
    with open(path, "wb") as fh:
        fh.write(struct.pack("<q", len(instances)))
        for _, mat_path in instances:
            d = load_mat(mat_path, sparse=True)
            probs.append(d)
            n = d["P"].shape[0]
            p = 0 if d["A"] is None else d["A"].shape[0]
            m = 0 if d["G"] is None else d["G"].shape[0]
            fh.write(struct.pack("<qqq", n, p, m))
            _write_csc(fh, d["P"], n, n)
            _write_csc(fh, d["A"], p, n)
            _write_csc(fh, d["G"], m, n)
            inf = np.inf

            def vec(v, size, fill):
                if v is None:
                    v = np.full(size, fill)
                return np.asarray(v, dtype="<f8")

            fh.write(vec(d["c"], n, 0.0).tobytes())
            fh.write(vec(d["b"], p, 0.0).tobytes())
            fh.write(vec(d["h_l"], m, -inf).tobytes())
            fh.write(vec(d["h_u"], m, inf).tobytes())
            fh.write(vec(d["x_l"], n, -inf).tobytes())
            fh.write(vec(d["x_u"], n, inf).tobytes())
    return probs


def build_driver():
    if os.path.exists(DRIVER_BIN) and os.path.getmtime(
        DRIVER_BIN
    ) >= os.path.getmtime(DRIVER_SRC):
        return None
    cmd = [
        "g++", "-O3", "-march=native", "-mno-avx512fp16", "-DNDEBUG",
        "-DEIGEN_NOEXCEPT=noexcept", "-include", "cassert",
        "-I/root/reference/include", "-I" + TF_INCLUDE,
        DRIVER_SRC, "-o", DRIVER_BIN,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True)
    if out.returncode != 0:
        return out.stderr[-800:]
    return None


def run_reference(batch_path):
    out = subprocess.run(
        [DRIVER_BIN, batch_path], capture_output=True, text=True,
        timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError("ref driver failed: " + out.stderr[-400:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_ours(probs):
    from piqp_tpu import Settings
    from piqp_tpu.hostsparse import solve_sparse_host
    from piqp_tpu.types import Status

    settings = Settings()
    results = []
    total = 0.0
    solved = 0
    for d in probs:
        t0 = time.perf_counter()
        res = solve_sparse_host(**d, settings=settings)
        dt = time.perf_counter() - t0
        total += dt
        ok = int(res.info.status) == int(Status.SOLVED)
        solved += ok
        results.append({"status": int(res.info.status), "s": round(dt, 6),
                        "iter": int(res.info.iter)})
    return results, solved, total


def main():
    max_n = 512
    ours_only = "--ours-only" in sys.argv
    for a in sys.argv[1:]:
        if a.isdigit():
            max_n = int(a)

    instances = select_instances(max_n)
    batch_path = "/tmp/corpus_m3.bin"
    probs = dump_batch(instances, batch_path)

    ref = None
    ref_err = None
    if not ours_only:
        ref_err = build_driver()
        if ref_err is None:
            try:
                ref = run_reference(batch_path)
            except Exception as e:  # noqa: BLE001
                ref_err = str(e)[-400:]

    ours, solved, total = run_ours(probs)

    count = len(instances)
    value = round(count / total, 2)
    extra = {
        "instances": count,
        "max_n": max_n,
        "ours_solved": solved,
        "ours_total_s": round(total, 3),
        "names": [nm for nm, _ in instances],
        "ours": ours,
    }
    vs = None
    if ref is not None:
        extra["ref_solved"] = ref["solved"]
        extra["ref_total_s"] = round(ref["total_s"], 3)
        extra["ref"] = ref["results"]
        vs = round(ref["total_s"] / total, 3) if total else None
        # per-instance geomean of ref_time / our_time (robust to one
        # instance dominating the totals)
        ratios = [
            r["s"] / o["s"]
            for r, o in zip(ref["results"], ours)
            if o["s"] > 0
        ]
        extra["geomean_speedup_vs_ref"] = round(
            float(np.exp(np.mean(np.log(ratios)))), 3
        )
    elif ref_err:
        extra["ref_error"] = ref_err

    print(json.dumps({
        "metric": "corpus_m3_host_solves",
        "value": value,
        "unit": "qp/s",
        "vs_baseline": vs,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
