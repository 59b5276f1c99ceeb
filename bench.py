"""Benchmark driver.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE config 2, the north star): aggregate warm
QP-solves/sec for a vmapped fleet of dense strongly-convex QPs
(n_eq = n_ineq = n/2), solved with the batched condensed-Cholesky device
backend under two-phase mixed precision (f32 MXU factors while the barrier
is loose, f64 endgame; identical eps_abs = 1e-8 accuracy, docs/backends.md).
Attempts sweep n (the ratio vs one CPU core grows with n — see ATTEMPTS)
and the best vs_baseline is reported, with every measured config in
extra.all_attempts.

vs_baseline divides by the REAL reference solver: benchmarks/ref_driver.cpp
builds the actual PIQP C++ (header-only, /root/reference/include, Eigen from
the tensorflow wheel) and solves the byte-identical problems single-core
with warm update+solve rounds — measured numbers and full provenance in
benchmarks/ref_baseline.json.  The ">=10x aggregate QP-solves/sec vs
single-core PIQP" target from BASELINE.json is scored against those
numbers; round 5 measures 1.32x at n=512 THROUGH the tunnel (whose
~100x bandwidth ceiling is documented in docs/performance.md).

Each device config runs in a FRESH subprocess (benchmarks/northstar_bench.py)
because the tunneled axon TPU runtime degrades per-process as compiled
executables accumulate (~100x dispatch inflation).  Timing rules for this
runtime (docs/performance.md): all uploads before the first dispatch, every
timed region ends in a device->host readback (block_until_ready can return
early), dispatches chunked to stay inside the per-dispatch envelope.

Robustness (round-2 postmortem: the driver's `timeout` killed bench.py
with NOTHING printed, BENCH_r02.json rc=124):
  - a global wall-clock budget (BENCH_BUDGET_S, default 1380 s) enforced
    with SIGALRM; per-attempt subprocess timeouts are carved out of the
    remaining budget so the total can never exceed it;
  - SIGTERM/SIGALRM handlers print the best result gathered so far (or an
    error record) as the final JSON line before exiting, so even a driver
    timeout leaves a parseable line in the output tail;
  - device probes are short (90 s / 45 s) and a dead tunnel falls back to
    XLA-CPU, clearly labeled in `extra`.

"extra" carries the effective-GFLOP/s + per-iteration device time derived
from an analytic flop model so the runtime ceiling is quantified: this
tunnel executes large executables at ~20-40 GFLOP/s regardless of precision
or shape (measured n=64..2048 f32/f64), orders of magnitude below v5e
silicon; absolute numbers reflect the tunnel, not the architecture.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
REF_BASELINE = os.path.join(REPO, "benchmarks", "ref_baseline.json")

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1380"))
_T0 = time.monotonic()

# (dim, B, chunk, mixed, pallas, static_passes) attempts, run in order
# while budget lasts; a SUCCESS replaces the reported payload only when
# its warm solves/s is HIGHER (so a later attempt can never lose the
# result in hand).  static_passes is the phase-A refinement policy knob
# (types.Settings.refine_static_passes; "d" = library default):
# round-5 measurements (docs/performance.md) — B=256 adaptive (-1) is the
# best dispatch-per-round config (1117.2 warm solves/s, cold clean at
# B=256); the static-1 library default is the robust-cold choice at
# B=1024 (1024/1024 cold in 31 iters vs 2 stragglers burning the 250
# budget under adaptive).
# Attempt order = measured vs_baseline descending (docs/performance.md
# round-5 dim sweep): the ratio GROWS with n as the MXU absorbs the n^3
# while the single-core reference pays it — n=1024 is the headline
# (B=128: 3.3 vs 2.08 warm solves/s = 1.59x, cold 2.6 vs 1.16 = 2.24x,
# eff_gflops 9.77 — identical numbers on idle and contended hosts: the
# timed regions are device-bound), n=512 also beats the
# reference (18.7 vs 14.18 = 1.32x, cold 2.1x) even through this tunnel's
# ~100x bandwidth ceiling; n=128 is the mid sweet spot (0.78); n=64 B=256
# is the absolute-throughput peak (1117.2 solves/s = 0.379) and a fast
# reliable early result.
# Final field = per-attempt timeout cap in seconds (None = remaining
# budget): the n=1024 attempt uploads ~2 GB through the tunnel and runs
# ~90 s of timed work — capped so a hang can never consume the budget
# that the fast, reliable smaller dims need.
ATTEMPTS = [
    (1024, 128, 4, 1, 1, "-1", 760),
    (512, 256, 16, 1, 1, "-1", None),
    (128, 256, 128, 1, 1, "-1", None),
    (256, 256, 64, 1, 1, "-1", None),
    (64, 256, 128, 1, 1, "-1", None),
    (64, 1024, 256, 1, 1, "d", None),
    (64, 256, 128, 0, 0, "d", None),
]

# Fused K-rounds-per-dispatch SQP attempt (batch.solve_batch_sqp): K warm
# update+re-solve rounds ride ONE executable, amortizing the dispatch
# floor — the natural TPU expression of the reference's warm SQP loop
# (sqp_benchmarks.cpp:16-120), and the same work the warm_qps baseline
# counts.  Runs after a northstar result is in; upgrades the headline when
# its warm solves/s is higher.  (dim, B, rounds, mixed)
#
# B is capped at 256: a fused (B=1024, K=16) single dispatch exceeds this
# tunnel's per-dispatch envelope and CRASHES the TPU worker (kernel fault,
# measured 2026-08-20); a chunked fused sweep is semantically the B=256
# config dispatched 4x, so nothing is lost by the cap.
FUSED_ATTEMPTS = [
    (64, 256, 16, 1),
]

METRIC = "aggregate warm QP-solves/sec (config 2: vmapped dense QPs; n and B in extra)"

# Best payload gathered so far; the signal handlers print this.
_payload = {
    "metric": METRIC,
    "value": 0.0,
    "unit": "solves/sec",
    "vs_baseline": 0.0,
    "error": "bench interrupted before any config completed",
}
_printed = False
_child = None  # active benchmark subprocess, killed by the signal handler
_attempts_log = []  # every successful config, for extra.all_attempts


def _remaining():
    return BUDGET_S - (time.monotonic() - _T0)


def _emit_and_exit(signum=None, frame=None):
    """Print the best-so-far JSON line exactly once and exit."""
    global _printed
    if not _printed:
        _printed = True
        extra = _payload.get("extra")
        if extra is not None and not extra.get("attempt_errors"):
            extra["attempt_errors"] = None
        print(json.dumps(_payload), flush=True)
    if _child is not None and _child.poll() is None:
        try:
            _child.kill()
        except OSError:
            pass
    # exit(0) so a SIGTERM from the driver's `timeout` still leaves a clean
    # parseable tail rather than a traceback
    os._exit(0)


def _cpu_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon PJRT registration
    env["JAX_PLATFORMS"] = "cpu"
    return env


def run_config(dim, B, chunk, mixed, pallas, timeout, env=None, sp="d"):
    global _child
    cmd = [
        sys.executable,
        os.path.join(REPO, "benchmarks", "northstar_bench.py"),
        str(dim), str(B), str(chunk), str(mixed), str(pallas),
    ]
    cenv = dict(env if env is not None else os.environ)
    cenv["PIQP_NS_STATIC_PASSES"] = sp
    _child = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=cenv,
    )
    try:
        stdout, stderr = _child.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        _child.kill()
        _child.communicate()
        return None, "timeout(%ds)" % timeout
    if _child.returncode != 0:
        return None, (stderr or stdout)[-500:]
    for line in reversed(stdout.strip().splitlines()):
        try:
            return json.loads(line), None
        except json.JSONDecodeError:
            continue
    return None, "no JSON in output"


def run_fused(dim, B, rounds, mixed, timeout, env=None):
    global _child
    cmd = [
        sys.executable,
        os.path.join(REPO, "benchmarks", "sqp_fused_bench.py"),
        str(dim), str(B), str(rounds), str(mixed),
    ]
    cenv = dict(env if env is not None else os.environ)
    # adaptive refinement: measured 1019.7 vs 826.3 fused solves/s
    # (cold-stall robustness is irrelevant to the warm fused loop)
    cenv["PIQP_FUSED_STATIC_PASSES"] = "-1"
    _child = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=cenv,
    )
    try:
        stdout, stderr = _child.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        _child.kill()
        _child.communicate()
        return None, "timeout(%ds)" % timeout
    if _child.returncode != 0:
        return None, (stderr or stdout)[-500:]
    for line in reversed(stdout.strip().splitlines()):
        try:
            return json.loads(line), None
        except json.JSONDecodeError:
            continue
    return None, "no JSON in output"


def device_alive(timeout):
    """Probe the accelerator in a subprocess (a dead tunnel hangs import)."""
    code = (
        "import jax, numpy as np\n"
        "x = jax.numpy.ones((256, 256)) @ jax.numpy.ones((256, 256))\n"
        "print(np.asarray(x)[0, 0], jax.devices()[0])\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout,
        )
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGALRM, _emit_and_exit)
    # hard backstop 20 s before the budget so the final line always lands
    # (clamped so a tiny BENCH_BUDGET_S can never push the alarm past it)
    signal.alarm(int(min(max(10, BUDGET_S - 20), BUDGET_S)))

    with open(REF_BASELINE) as f:
        ref = json.load(f)

    errors = []
    env = None
    if not device_alive(timeout=min(90, max(10, _remaining() - 120))):
        if not device_alive(timeout=min(45, max(10, _remaining() - 90))):
            errors.append(
                "accelerator probe failed twice; falling back to XLA-CPU")
            env = _cpu_env()

    got_any = False
    for dim, B, chunk, mixed, pallas, sp, cap in ATTEMPTS:
        slice_s = _remaining() - 30  # leave room to print
        if slice_s < 60 or (got_any and slice_s < 420):
            # never risk the recorded result for an upgrade with too
            # little budget left
            errors.append("budget exhausted before B=%d attempt" % B)
            break
        if cap is not None:
            slice_s = min(slice_s, cap)
        if env is not None and dim > 512:
            # XLA-CPU fallback: the n=1024 fleet is a many-minute run on
            # one host core for a number that cannot beat the baseline —
            # don't burn the budget the smaller dims can still use
            errors.append("skipped n=%d on XLA-CPU fallback" % dim)
            continue
        res, err = run_config(dim, B, chunk, mixed, pallas,
                              timeout=int(slice_s), env=env, sp=sp)
        if res is not None:
            # score by vs_baseline (the BASELINE.json target is a RATIO
            # to the single-core reference; dims differ across attempts)
            refc = ref["configs"][str(res["dim"])]
            vs = res["warm_qps_per_s"] / refc["warm_qps_per_s"]
            _attempts_log.append(dict(
                n=res["dim"], B=res["B"], static_passes=sp,
                warm_qps_per_s=res["warm_qps_per_s"], vs=round(vs, 3),
            ))
            if vs > _payload["vs_baseline"]:
                _record(res, ref, errors, sp)
            got_any = True
            continue
        errors.append(f"B={B},chunk={chunk},mixed={mixed},pallas={pallas}: {err}")
        # A large dispatch can CRASH the TPU worker (kernel fault), which
        # poisons the tunnel for every later attempt.  Re-probe after a
        # failure; if the device is gone, run the remaining attempts on
        # XLA-CPU instead of burning the budget on a dead tunnel.
        if env is None and _remaining() > 120:
            if not device_alive(timeout=min(90, max(10, _remaining() - 90))):
                errors.append(
                    "device probe failed after attempt crash; "
                    "remaining attempts on XLA-CPU")
                env = _cpu_env()

    # Fused upgrade pass: only after a northstar result is recorded (the
    # fused number replaces the value only when it is strictly better, so
    # this can never lose the result already in hand).
    if got_any:
        for dim, B, rounds, mixed in FUSED_ATTEMPTS:
            slice_s = _remaining() - 30
            if slice_s < 300:
                errors.append("budget exhausted before fused B=%d" % B)
                break
            res, err = run_fused(dim, B, rounds, mixed,
                                 timeout=int(slice_s), env=env)
            if res is None:
                errors.append(f"fused B={B},K={rounds}: {err}")
                continue
            refc = ref["configs"][str(res["dim"])]
            if res["fused_qps_per_s"] / refc["warm_qps_per_s"] > _payload["vs_baseline"]:
                _record_fused(res, ref)
                break  # first win is the headline

    if not got_any:
        _payload["error"] = "; ".join(errors)[-1200:]
    elif _payload.get("extra") is not None:
        _payload["extra"]["all_attempts"] = _attempts_log
    _emit_and_exit()


def _record_fused(res, ref):
    """Upgrade the headline to the fused K-rounds-per-dispatch number.
    Same work the baseline's warm pass counts (K update+re-solve rounds,
    sqp_benchmarks.cpp:16-120), executed as ONE executable per K rounds."""
    refc = ref["configs"][str(res["dim"])]
    value = res["fused_qps_per_s"]
    extra = _payload.get("extra") or {}
    extra.update({
        "fused": {
            "B": res["B"], "rounds": res["rounds"],
            "mixed_precision": bool(res["mixed"]),
            "solved": res["solved"], "total": res["total"],
            "mean_round_iters": res["mean_round_iters"],
            "us_per_problem_iter": res["us_per_problem_iter"],
            "eff_gflops": res["eff_gflops"],
            "note": "K warm update+re-solve rounds per dispatch "
                    "(batch.solve_batch_sqp); dispatch-per-round "
                    "figure in plain_warm_qps_per_s",
        },
        "plain_warm_qps_per_s": _payload["value"],
        "eff_gflops": res["eff_gflops"],
        "iter_us_per_problem": res["us_per_problem_iter"],
    })
    _payload.update({
        "value": round(value, 1),
        "vs_baseline": round(value / refc["warm_qps_per_s"], 3),
        "extra": extra,
    })


def _record(res, ref, errors, sp="d"):
    """Fold a successful config into the reported payload (the signal
    handlers print whatever is recorded here if the driver times out)."""
    refc = ref["configs"][str(res["dim"])]
    value = res["warm_qps_per_s"]
    vs = value / refc["warm_qps_per_s"]
    _payload.pop("error", None)
    _payload.update({
        "value": round(value, 1),
        "vs_baseline": round(vs, 3),
        "extra": {
            "device": res["device"],
            "B": res["B"], "chunk": res["chunk"],
            "mixed_precision": bool(res["mixed"]),
            "pallas_kernels": bool(res.get("pallas")),
            "refine_static_passes": sp,
            "plain_warm_qps_per_s": res.get("plain_warm_qps_per_s"),
            "cold_qps_per_s": res["cold_qps_per_s"],
            "solved": res["solved"], "warm_solved": res["warm_solved"],
            "max_iters": res["max_iters"],
            "warm_max_iters": res.get("warm_max_iters"),
            "compaction": res.get("compaction"),
            "stragglers": res.get("stragglers"),
            "phase1": res.get("phase1"),
            "eff_gflops": res.get("eff_gflops"),
            "iter_us_per_problem": res.get("iter_us_per_problem"),
            "baseline": {
                "what": "real reference PIQP C++, single-core, warm update+solve, identical problems",
                "warm_qps_per_s": refc["warm_qps_per_s"],
                "cold_qps_per_s": refc["cold_qps_per_s"],
                "provenance": "benchmarks/ref_baseline.json",
            },
            # keep the LIVE list so errors appended after this record (e.g.
            # "budget exhausted") still land in the emitted payload
            "attempt_errors": errors,
        },
    })


if __name__ == "__main__":
    main()
