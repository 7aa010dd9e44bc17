"""Measured T-scaling curve + v5e-16 north-star projection.

Measures settled-capacity FB-Gibbs sweep throughput at several T on the
current backend (run on the real TPU chip), fits the per-sweep cost model
t(T) = a + b*T, and projects the BASELINE north star — 3 Gbp x 100 sweeps
on a v5e-16 — from the measured per-chip numbers instead of hope:

  per-chip work at 3 Gbp / 16 chips is T_local = 187.5M positions; a
  sharded sweep costs ~ a + b*T_local + c_coll, where the cross-shard
  traffic is O(P*K^2) scalars/sweep (first-boundary exchange, shard-total
  matrices/maps, psum'd conjugate stats — parallel/sharded.py) so c_coll
  is bounded by a few ICI round-trips; the projection reports both the
  pure-compute bound (c_coll = 0) and a conservative +1 ms/sweep variant.

Usage:  timeout 3600 python benchmarks/northstar.py
Env:    HAMMLET_NS_TS  comma-separated T list (default 1,4,16,64 millions)
        HAMMLET_NS_SWEEPS  measured sweeps per point (default 96)

Prints one JSON line per measured point plus a final {"projection": ...}
line; also writes BENCH_northstar.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NORTH_T = 3_000_000_000
NORTH_CHIPS = 16
NORTH_SWEEPS = 100
HBM_PER_CHIP = 16e9  # v5e


def measure(T: int, sweeps: int, burnin: int, thin: int = 4) -> dict:
    from bench import SEGLEN, log, synth
    from hammlet_tpu.runner import enable_compilation_cache, make_engine

    enable_compilation_cache()
    log(f"[northstar] T={T}: generating data")
    data = synth(T)
    log(f"[northstar] T={T}: building engine")
    eng = make_engine(data, nr_params=3, seed=0)
    eng.run("M", burnin, 0)
    # two warm rounds OF THE MEASURED LENGTH: the block capacity settles,
    # and the compiled chunk shapes depend on the phase length
    # (runner._chunk_for_capacity + tail chunks) — warming with any other
    # length leaves a cold compile inside the measured window
    eng.run("F", sweeps, thin)
    eng.run("F", sweeps, thin)
    best = 0.0
    for _ in range(2):
        eng.total_sweeps = 0.0
        eng.sample_time = 0.0
        eng.run("F", sweeps, thin)
        best = max(best, eng.sweeps_per_second)
    m = eng.metrics()
    return {
        "T": T,
        "sweeps_per_second": round(best, 3),
        "positions_per_second": round(best * T, 0),
        "sweep_ms": round(1e3 / best, 4),
        "capacity": int(m["block_capacity"]) if "block_capacity" in m else eng.capacity,
        "seglen": SEGLEN,
    }


def hbm_budget(T_local: int, K: int = 3, dim: int = 1) -> dict:
    """Persistent per-chip device buffers of the sharded engine (bytes)."""
    return {
        "counts_int32": K * T_local * 4,
        "prefix_r_f32": (T_local + 1) * dim * 2 * 4,
        "negw_f32": T_local * 4,
        "rank_int32": T_local * 4,
        "everb_bool": T_local,
        "cell_q2_f32": 2 * ((T_local >> 16) + 1) * dim * 2 * 4,
    }


def main() -> int:
    ts = [
        int(float(x) * 1e6)
        for x in os.environ.get("HAMMLET_NS_TS", "1,4,16,64").split(",")
    ]
    sweeps = int(os.environ.get("HAMMLET_NS_SWEEPS", 512))
    points = []
    for T in ts:
        p = measure(T, sweeps=sweeps, burnin=48)
        print(json.dumps(p), flush=True)
        points.append(p)

    # least-squares fit of per-sweep seconds = a + b*T over the measured Ts
    Ts = np.array([p["T"] for p in points], dtype=float)
    secs = np.array([1.0 / p["sweeps_per_second"] for p in points])
    A = np.stack([np.ones_like(Ts), Ts], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, secs, rcond=None)

    T_local = NORTH_T // NORTH_CHIPS
    budget = hbm_budget(T_local)
    t_sweep = a + b * T_local
    proj = {
        "fit": {"a_s": round(float(a), 6), "b_s_per_pos": float(b)},
        "north_star": {
            "T": NORTH_T,
            "chips": NORTH_CHIPS,
            "T_local": T_local,
            "hbm_budget_bytes": budget,
            "hbm_budget_total_gb": round(sum(budget.values()) / 1e9, 2),
            "hbm_fraction": round(sum(budget.values()) / HBM_PER_CHIP, 3),
            "sweep_s_compute": round(float(t_sweep), 4),
            "sweep_s_with_1ms_collectives": round(float(t_sweep) + 1e-3, 4),
            "time_100_sweeps_s": round(float(NORTH_SWEEPS * t_sweep), 2),
            "time_100_sweeps_s_conservative": round(
                float(NORTH_SWEEPS * (t_sweep + 1e-3)), 2
            ),
            "meets_1min_target": bool(NORTH_SWEEPS * (t_sweep + 1e-3) < 60),
        },
        "points": points,
    }
    print(json.dumps({"projection": proj}), flush=True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_northstar.json",
    )
    json.dump(proj, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
