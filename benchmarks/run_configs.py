"""Benchmark harness for the five BASELINE.json configs.

Each config prints one JSON line:
  {"config": N, "desc": ..., "sweeps_per_second": ..., "positions_per_second": ...,
   "compression_ratio": ..., "T": ..., "states": ...}

Sizes scale to the available hardware/time budget via HAMMLET_BENCH_SCALE
(default 1.0 keeps every config tunnel-friendly; the full-size figures in
BASELINE.json configs 3/5 need a real pod + local runtime). Config 5 (the
multi-host shard) runs on whatever devices exist — a v5e slice in
production, N virtual CPU devices in CI (set JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Usage: python benchmarks/run_configs.py [config-numbers...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = float(os.environ.get("HAMMLET_BENCH_SCALE", "1.0"))


def _engine_metrics(eng, desc, cfg, burnin=64, sweeps=128, thin=4):
    eng.run("M", burnin, 0)
    # warm 2 chunks: the first may shrink the block capacity, the second
    # compiles the measured program at the settled capacity
    eng.run("F", 64, thin)
    eng.total_sweeps = 0.0
    eng.sample_time = 0.0
    eng.run("F", sweeps, thin)
    m = eng.metrics()
    out = {
        "config": cfg,
        "desc": desc,
        "T": int(getattr(eng, "T", getattr(getattr(eng, "ing", None), "T", 0))),
        "states": int(eng.spec.nr_states),
        "sweeps_per_second": round(m["sweeps_per_second"], 3),
        "positions_per_second": round(m["positions_per_second"], 1),
    }
    if m.get("compression_ratio"):
        out["compression_ratio"] = round(m["compression_ratio"], 1)
    if "n_devices" in m:
        out["n_devices"] = m["n_devices"]
    print(json.dumps(out), flush=True)


def _steps(means, seglen, T, noise, seed, dim=1):
    rng = np.random.default_rng(seed)
    n_seg = max(1, T // seglen)
    state = rng.integers(0, len(means), size=n_seg)
    reps = np.full(n_seg, seglen)
    reps[-1] = T - seglen * (n_seg - 1)
    mu = np.repeat(np.asarray(means)[state], reps, axis=0)
    return (mu + rng.normal(0, noise, size=mu.shape)).astype(np.float32)


def config1():
    """Synthetic array-CGH, ~100k points, 3 states, auto priors."""
    from hammlet_tpu.runner import make_engine

    T = int(100_000 * max(SCALE, 0.01))
    data = _steps([0.0, 1.0, -1.0], 2000, T, 0.35, seed=1)
    eng = make_engine(data, nr_params=3, seed=0)
    _engine_metrics(eng, "synthetic array-CGH ~100k, 3 states", 1)


def config2():
    """Coriell-like array-CGH: sparse CNVs on a diploid baseline, 5 states.

    (The Coriell GM05296/GM13330 arrays are ~2k-probe log2-ratio tracks; the
    synthetic stand-in reproduces their structure: long 0-baseline, short
    +-gain/loss segments, probe noise ~0.15.)"""
    from hammlet_tpu.runner import make_engine

    T = int(2_300 * max(SCALE, 0.5))
    rng = np.random.default_rng(7)
    data = np.zeros(T, np.float32)
    for lo, hi, lvl in [(300, 380, 0.58), (1100, 1240, -0.7), (1900, 1960, 1.0)]:
        lo = min(lo, T - 2); hi = min(hi, T - 1)
        data[lo:hi] = lvl
    data += rng.normal(0, 0.15, T).astype(np.float32)
    eng = make_engine(data, nr_params=5, seed=0)
    _engine_metrics(eng, "Coriell-like array-CGH, 5 states, auto priors", 2)


def config3():
    """WGS depth-of-coverage, single chromosome. Full size is ~250M
    positions; default scale keeps it tunnel-friendly (8M)."""
    from hammlet_tpu.runner import make_engine

    T = int(8_000_000 * SCALE)
    data = _steps([0.0, 2.0, -2.0], 500, T, 1.0, seed=3)
    eng = make_engine(data, nr_params=3, seed=0)
    _engine_metrics(eng, f"WGS depth-of-coverage chromosome ({T/1e6:.0f}M)", 3)


def config4():
    """Multi-track multivariate emissions: 2 tracks x 3 params = 9 states."""
    from hammlet_tpu.runner import make_engine

    T = int(400_000 * max(SCALE, 0.01))
    means = [[0.0, 0.0], [0.0, 3.0], [3.0, 0.0], [3.0, 3.0], [-3.0, 0.0],
             [0.0, -3.0], [-3.0, -3.0], [3.0, -3.0], [-3.0, 3.0]]
    data = _steps(means, 800, T, 1.0, seed=4, dim=2)
    eng = make_engine(data, nr_params=3, nr_data_dim=2, seed=0)
    _engine_metrics(eng, "multivariate 2-track, 9 states", 4)


def config5():
    """Position-sharded multi-device run (the 3 Gbp/multi-host config,
    scaled to the devices present)."""
    import jax

    from hammlet_tpu.parallel import make_sharded_engine, position_mesh

    n_dev = len(jax.devices())
    T = int(2_000_000 * SCALE) * max(n_dev, 1)
    data = _steps([0.0, 2.0, -2.0], 500, T, 1.0, seed=5)
    eng = make_sharded_engine(
        data, mesh=position_mesh(n_dev), nr_params=3, seed=0
    )
    _engine_metrics(
        eng, f"position-sharded over {n_dev} device(s) ({T/1e6:.0f}M)", 5,
        burnin=32, sweeps=64,
    )


def main(argv):
    from hammlet_tpu.runner import enable_compilation_cache

    enable_compilation_cache()
    wanted = [int(a) for a in argv] or [1, 2, 3, 4, 5]
    fns = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}
    for c in wanted:
        t0 = time.time()
        fns[c]()
        print(f"# config {c} wall {time.time()-t0:.1f}s", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
