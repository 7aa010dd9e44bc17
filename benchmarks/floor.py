"""Small-T dispatch-floor decomposition (VERDICT r4 'what's weak' #1).

At T<=1M the per-sweep cost was pinned at ~1 ms and read as a per-op floor
inside lax.scan. The round-3 micro data says otherwise: EVERY single-op
32-iteration scan body measured ~0.8-1.3 ms/sweep — the signature of a
fixed per-DISPATCH cost divided by 32, not of op cost. This harness times
the REAL full-sweep scanned program (gibbs_phase, the production program)
at several scan lengths and fits  t(n) = dispatch + n * per_iter  to
separate the two, at the settled capacity of a given T.

The decision it feeds: if per_iter << 1 ms, the fix for small-T throughput
is longer compiled chunks (amortizing dispatch), not op surgery.

Usage:  timeout 2400 python -u benchmarks/floor.py
Env:    HAMMLET_FLOOR_T (default 1_000_000)
"""

import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, synth  # noqa: E402
from hammlet_tpu.runner import enable_compilation_cache, make_engine  # noqa: E402
from hammlet_tpu.samplers.sweep import gibbs_phase  # noqa: E402

T = int(os.environ.get("HAMMLET_FLOOR_T", 1_000_000))
LENGTHS = [32, 128, 512, 1024]
REPS = 3


def main():
    enable_compilation_cache()
    data = synth(T)
    log(f"data ready: {T}; building engine")
    eng = make_engine(data, nr_params=3, seed=0)
    eng.run("M", 64, 0)
    eng.run("F", 256, 0)
    eng.run("F", 256, 0)
    cap = eng.capacity
    log(f"settled capacity {cap}")

    cand_pos, cand_rank = eng._candidates()
    common = dict(
        method="F",
        capacity=cap,
        spec_nr_params=eng.spec.nr_params,
        mapping_tuple=eng._mapping_tuple,
        use_self_transitions=eng.spec.use_self_transitions,
        thinning=0,
        cell_bits=eng.ing.cell_bits,
        record=False,
        want_blocks=False,
        debug=False,
    )

    bufs = eng.buffers  # gibbs_phase DONATES buffers: thread the returned
    # (aliased, record=False) array through every call

    def run_n(n, counter, bufs):
        return gibbs_phase(
            eng._key, eng.model, eng.priors, eng.ing.ranked,
            cand_pos, cand_rank, eng.ing.prefix, bufs,
            np.int32(counter), np.bool_(True), np.float32(0.0),
            n_iters=n, **common,
        )

    # compile all lengths first (cached across runs)
    for n in LENGTHS:
        log(f"compiling n={n}")
        out = run_n(n, 10_000, bufs)
        bufs = out[1]
        jax.block_until_ready(out[3])

    best = {n: float("inf") for n in LENGTHS}
    for rep in range(REPS):
        for n in LENGTHS:
            t0 = time.time()
            out = run_n(n, 10_000 + rep, bufs)
            bufs = out[1]
            jax.block_until_ready(out[3])
            best[n] = min(best[n], time.time() - t0)
    for n in LENGTHS:
        log(f"n={n:5d}: {best[n]*1e3:8.1f} ms total, "
            f"{best[n]/n*1e3:6.3f} ms/sweep incl. dispatch")

    # least-squares fit t(n) = dispatch + n * per_iter over the best times
    ns = np.array(LENGTHS, dtype=np.float64)
    ts = np.array([best[n] for n in LENGTHS])
    per_iter, dispatch = np.polyfit(ns, ts, 1)
    out = {
        "metric": "full F-sweep scanned program: per-dispatch vs "
        "per-iteration cost split (fit t(n) = dispatch + n*per_iter over "
        f"scan lengths {LENGTHS}, best of {REPS})",
        "T": T,
        "settled_capacity": int(cap),
        "totals_ms": {str(n): round(best[n] * 1e3, 1) for n in LENGTHS},
        "per_iter_ms": round(per_iter * 1e3, 4),
        "dispatch_ms": round(dispatch * 1e3, 1),
        "ms_per_sweep_at_chunk_128": round(
            (dispatch / 128 + per_iter) * 1e3, 4
        ),
        "ms_per_sweep_at_chunk_1024": round(
            (dispatch / 1024 + per_iter) * 1e3, 4
        ),
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"FLOOR_T{T // 1_000_000}M.json",
    )
    json.dump(out, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
