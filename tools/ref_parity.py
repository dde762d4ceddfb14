"""C-reference parity harness: build, run, and compare mechanically.

Builds the unmodified reference engine (/root/reference, Makefile flags:
gcc -O2 -std=c99 -lm) out-of-tree, runs tools/ref_parity_driver.c, and
checks the TPU framework against it where the C engine is *correct*:

* the circular-orbit velocity table v = sqrt(M/r) (main.c:131-167,
  blackhole_api.c:41-48) to 1e-9,
* two-point time dilation (blackhole_api.c:432-459) to 1e-9,
* and it re-derives the C engine's forward-only single-thread rays/s on
  *this* host — the number bench.py's vs_baseline divides by — writing
  everything to tools/ref_baseline.json (recorded, not hardcoded).

For the no-disk Schwarzschild b-sweep the C engine turns out to be
*unusable as an oracle*: its photon integrator never reaches capture or
escape under ANY configuration — measured here with step sizes
0.1/0.5/1.0 and budgets up to 20000 steps, every ray returns
RAY_MAX_STEPS with the path length stalled near 48M (the near-horizon
step tiering at raytracer.c:555-571 shrinks steps geometrically while
the capture test at :650-656 is never met, and max distance 100M is
never reached).  The harness therefore:

* asserts OUR sweep classification against the analytic oracle —
  capture iff impact parameter b < b_crit = 3*sqrt(3) M — excluding a
  +-B_EXCLUDE window around b_crit where classification is decided by
  exponentially amplified integration error,
* records the C engine's per-ray outcomes verbatim in the baseline
  JSON, and asserts they are indeed all MAX_STEPS — if a future
  reference copy fixes the stall, this trips and real classification
  parity can be enabled.

Run:  python tools/ref_parity.py [--n-sweep 40] [--n-bench 4096]
Exits nonzero on any parity violation.  Used by tests/test_ref_parity.py
(skipped when /root/reference or a C compiler is unavailable).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import tempfile

REF = os.environ.get("BH_REFERENCE_DIR", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Reference sources needed by the driver (exclude main.c: it defines
# main; exclude gl.c: the GL loader needs no parity).
SOURCES = [
    "blackhole_api.c",
    "raytracer.c",
    "spacetime.c",
    "particle_sim.c",
    "math_util.c",
]

B_EXCLUDE = 0.35  # exclusion half-width around b_crit, in M


def build_driver(tmp: str) -> str:
    """Compile reference sources + driver out-of-tree; returns exe path."""
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        raise RuntimeError("no C compiler")
    srcs = [os.path.join(REF, "src", s) for s in SOURCES]
    for s in srcs:
        if not os.path.exists(s):
            raise RuntimeError(f"missing reference source {s}")
    exe = os.path.join(tmp, "ref_parity_driver")
    cmd = [
        cc, "-O2", "-std=c99", "-I", os.path.join(REF, "include"),
        os.path.join(HERE, "ref_parity_driver.c"), *srcs,
        "-o", exe, "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return exe


def run_driver(exe: str, n_sweep: int, n_bench: int) -> dict:
    out = subprocess.run(
        [exe, str(n_sweep), str(n_bench)],
        check=True, capture_output=True, text=True,
    ).stdout
    rec = {"bsweep": [], "dsweep": [], "orbit": {}, "tdil": None,
           "rays_per_s": None, "version": None}
    for line in out.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] in ("BSWEEP", "DSWEEP"):
            rec[parts[0].lower()].append(
                {"bx": float(parts[2]), "result": int(parts[3]),
                 "distance": float(parts[4]), "steps": int(parts[5])}
            )
        elif parts[0] == "ORBIT":
            rec["orbit"][int(parts[1])] = float(parts[2])
        elif parts[0] == "TDIL":
            rec["tdil"] = float(parts[1])
        elif parts[0] == "RAYS_PER_S":
            rec["rays_per_s"] = float(parts[1])
        elif parts[0] == "VERSION":
            rec["version"] = parts[1]
    return rec


def classify(result: int) -> str:
    """Map result codes to capture/escape/disk classes.

    The C integrator reports escapes as RAY_MAX_DISTANCE (its loop has
    no explicit background state on this path, raytracer.c:658-662)
    while the TPU tracer distinguishes BACKGROUND (radially outgoing at
    the boundary) from MAX_DISTANCE (path-length budget); both are
    'escape' for classification parity.
    """
    return {0: "capture", 1: "disk", 2: "escape", 3: "escape",
            4: "max_steps", 5: "error"}[result]


def impact_parameter(bx: float, z0: float = 30.0) -> float:
    """|origin x dir| for origin (0,0,z0), dir (bx,0,-1)/norm."""
    return z0 * bx / math.sqrt(1.0 + bx * bx)


def _pin_cpu_f64():
    """Pin jax to float64 host CPU BEFORE any computation initializes a
    backend (the container pins jax_platforms to a remote TPU; parity
    must run hermetically in double precision)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def tpu_results(n_sweep: int, disk: bool):
    """Same sweep through the TPU framework (float64 CPU for parity)."""
    import numpy as np

    from blackhole_tpu import api

    ctx = api.bh_initialize(dtype="float64")
    assert api.bh_configure_black_hole(ctx, 1.0, 0.0, 0.0) == 0
    assert api.bh_configure_simulation(ctx, 0.1, 100.0, 1000, 1e-6) == 0
    if disk:
        assert api.bh_configure_accretion_disk(ctx, 6.0, 20.0, 1.0, 1.0) == 0
    bxs = [0.5 * i / n_sweep for i in range(n_sweep + 1)]
    origins = np.array([[0.0, 0.0, 30.0]] * len(bxs))
    dirs = np.array([[bx, 0.0, -1.0] for bx in bxs])
    hits = api.bh_trace_rays_batch(ctx, origins, dirs)
    return bxs, np.asarray(hits.result)


def orbit_table_tpu():
    from blackhole_tpu import api

    ctx = api.bh_initialize(dtype="float64")
    return {r: float(api.bh_calculate_orbital_velocity(ctx, float(r)))
            for r in range(20, 61, 10)}


def tdil_tpu():
    from blackhole_tpu import api

    ctx = api.bh_initialize(dtype="float64")
    return float(api.bh_calculate_time_dilation(
        ctx, (10.0, 0.0, 0.0), (50.0, 0.0, 0.0)
    ))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sweep", type=int, default=40)
    ap.add_argument("--n-bench", type=int, default=4096)
    ap.add_argument(
        "--out", default=os.path.join(HERE, "ref_baseline.json")
    )
    args = ap.parse_args(argv)
    _pin_cpu_f64()

    with tempfile.TemporaryDirectory() as tmp:
        exe = build_driver(tmp)
        ref = run_driver(exe, args.n_sweep, args.n_bench)
    print(f"reference built+run: version {ref['version']}, "
          f"{ref['rays_per_s']:.1f} rays/s forward single-thread")

    failures = []

    # --- orbit table: exact formula parity to 1e-9 ---
    ours_orbit = orbit_table_tpu()
    for r, v_ref in ref["orbit"].items():
        v = ours_orbit[r]
        if abs(v - v_ref) > 1e-9:
            failures.append(f"orbit r={r}: ref {v_ref} vs tpu {v}")
    print(f"orbit table: {len(ref['orbit'])} radii compared")

    # --- time dilation ---
    td = tdil_tpu()
    if abs(td - ref["tdil"]) > 1e-9:
        failures.append(f"time dilation: ref {ref['tdil']} vs tpu {td}")
    print(f"time dilation ratio: ref {ref['tdil']:.9f} tpu {td:.9f}")

    # --- no-disk classification sweep vs the ANALYTIC oracle ---
    # (the C engine cannot classify; see the module docstring)
    bxs, results = tpu_results(args.n_sweep, disk=False)
    b_crit = 3.0 * math.sqrt(3.0)
    n_cmp = n_skip = 0
    for entry, bx, res in zip(ref["bsweep"], bxs, results):
        assert abs(entry["bx"] - bx) < 1e-9
        if classify(entry["result"]) != "max_steps":
            failures.append(
                f"reference no longer stalls at bx={bx:.4f} "
                f"(result {entry['result']}): enable real classification "
                f"parity in tools/ref_parity.py"
            )
        b = impact_parameter(bx)
        tpu_cls = classify(int(res))
        if abs(b - b_crit) < B_EXCLUDE:
            n_skip += 1
            continue
        n_cmp += 1
        oracle = "capture" if b < b_crit else "escape"
        if tpu_cls != oracle:
            failures.append(
                f"bsweep bx={bx:.4f} (b={b:.3f}M): analytic {oracle} "
                f"vs tpu {tpu_cls}"
            )
    print(f"no-disk sweep vs analytic b_crit: {n_cmp} rays compared, "
          f"{n_skip} near-critical excluded "
          f"(|b-{b_crit:.3f}M| < {B_EXCLUDE}M)")

    baseline = {
        "host": os.uname().nodename,
        "c_rays_per_s_fwd_single_thread": ref["rays_per_s"],
        "n_bench_rays": args.n_bench,
        "orbit_table": ref["orbit"],
        "time_dilation_10_50": ref["tdil"],
        "bsweep": ref["bsweep"],
        "dsweep": ref["dsweep"],
        "parity_failures": failures,
    }
    with open(args.out, "w") as f:
        json.dump(baseline, f, indent=1)
    print(f"baseline written to {args.out}")

    if failures:
        print("PARITY FAILURES:")
        for f_ in failures:
            print("  " + f_)
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
