"""Per-sweep cost breakdown at settled capacity (run on the real TPU).

Times scanned sub-programs of the Gibbs sweep at TWO scan lengths (32 and
256 iterations) and derives each stage's TRUE per-iteration cost from the
slope (t_256 - t_32) / 224: a single dispatch of a scanned program over
the remote TPU tunnel costs a fixed ~20-30 ms round trip, which at 32
iterations masquerades as ~0.8 ms/sweep of phantom per-op cost — the
round-4 ablation divided it into every stage and produced non-monotone
cumulative numbers. The intercept (t_32 - 32*slope) is reported separately
as the per-dispatch overhead. Each (stage, length) point is the best of 3
measurements taken in interleaved A/B/C...A/B/C order so tunnel drift hits
every stage equally. Every stage's inputs are perturbed from the
per-iteration RNG key so XLA cannot hoist loop-invariant work out of the
scan (which would silently zero a stage's cost).

Usage:  timeout 3600 python -u benchmarks/ablate.py [micro] [save]
Env:    HAMMLET_BENCH_T (default 4_000_000)
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_data, log  # noqa: E402
from hammlet_tpu.models.hmm import HMMState, resample_model  # noqa: E402
from hammlet_tpu.ops.blocks import (  # noqa: E402
    block_sufficient_stats_t,
    make_blocks_bucketed,
)
from hammlet_tpu.runner import enable_compilation_cache, make_engine  # noqa: E402
from hammlet_tpu.samplers.forward_backward import (  # noqa: E402
    backward_sample_t,
    forward_columns_t,
)
from hammlet_tpu.models.distributions import emission_log_weights_t  # noqa: E402
from hammlet_tpu.samplers.mixture import mixture_sample_states  # noqa: E402
from hammlet_tpu.samplers.sweep import (  # noqa: E402
    RecordBuffers,
    accumulate_sweep_stats,
    record_sweep,
)

N_ITERS = 32  # short scan length (micro mode still uses this alone)
N_LONG = 256  # long scan length for the dispatch/per-iteration split
N_REPS = 3

RESULTS: list[tuple] = []  # (name, per_iter_ms, dispatch_ms, spread_ms)


def timed(name, fn, *args):
    """Single-length timing (micro mode): raw ms per scan iteration at
    N_ITERS, tunnel dispatch included."""
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    per_sweep = best / N_ITERS * 1e3
    print(f"{name:34s} {per_sweep:8.3f} ms/sweep (incl. dispatch)",
          flush=True)
    return per_sweep


def timed_pair(stages_compiled):
    """Interleaved best-of-N_REPS at both scan lengths for every stage;
    returns {name: (per_iter_ms, dispatch_ms, spread_ms)}."""
    best = {}
    samples = {}
    for rep in range(N_REPS):
        for name, n, fn, args in stages_compiled:
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            dt = time.time() - t0
            key = (name, n)
            best[key] = min(best.get(key, float("inf")), dt)
            samples.setdefault(key, []).append(dt)
    out = {}
    for name in {n for n, _, _, _ in stages_compiled}:
        t_short, t_long = best[(name, N_ITERS)], best[(name, N_LONG)]
        per_iter = (t_long - t_short) / (N_LONG - N_ITERS) * 1e3
        dispatch = (t_short - N_ITERS * per_iter / 1e3) * 1e3
        spread = (
            max(samples[(name, N_LONG)]) - min(samples[(name, N_LONG)])
        ) / N_LONG * 1e3
        out[name] = (per_iter, dispatch, spread)
    return out


def main():
    enable_compilation_cache()
    data = ensure_data()
    log(f"data ready: {len(data)}")
    eng = make_engine(data, nr_params=3, seed=0)
    eng.run("M", 64, 0)
    eng.run("F", 64, 0)
    eng.run("F", 64, 0)
    cap = eng.capacity
    log(f"settled capacity {cap}")

    model0, priors = eng.model, eng.priors
    ranked, prefix = eng.ing.ranked, eng.ing.prefix
    cand_pos, cand_rank = eng._candidates()
    mapping = jnp.asarray(np.asarray(eng._mapping_tuple, dtype=np.int32))
    nr_params = eng.spec.nr_params
    T = eng.ing.T
    K = eng.spec.nr_states
    buffers = RecordBuffers.create(T, K)
    cell_bits = eng.ing.cell_bits
    key0 = jax.random.PRNGKey(123)

    def scan_harness(step, n_iters=N_ITERS):
        @jax.jit
        def run(model, buffers):
            def body(carry, i):
                model, buffers, acc = carry
                k = jax.random.fold_in(key0, i)
                model, buffers, acc2 = step(k, model, buffers)
                return (model, buffers, acc + acc2), ()

            (model, buffers, acc), _ = jax.lax.scan(
                body, (model, buffers, jnp.float32(0)), jnp.arange(n_iters)
            )
            return model, buffers, acc

        return run

    def perturb(k, model):
        """Tiny key-dependent jitter on the model so every downstream value
        is iteration-dependent (anti-hoisting)."""
        eps = jax.random.uniform(k, (), minval=0.0, maxval=1e-12)
        return HMMState(
            model.theta_mean + eps, model.theta_var + eps,
            model.A, model.pi,
        )

    def pre(k, model):
        model = perturb(k, model)
        thr = model.threshold(T)
        blocks = make_blocks_bucketed(cand_pos, cand_rank, ranked, thr)
        return model, blocks

    def stage_blocks_only(k, model, buffers):
        model, blocks = pre(k, model)
        return model, buffers, jnp.sum(blocks.starts).astype(jnp.float32)

    def stage_blocks(k, model, buffers):
        model, blocks = pre(k, model)
        bstats = block_sufficient_stats_t(prefix, blocks, cell_bits)
        return model, buffers, jnp.sum(bstats) + blocks.n_blocks

    def stage_emission(k, model, buffers):
        model, blocks = pre(k, model)
        bstats = block_sufficient_stats_t(prefix, blocks, cell_bits)
        log_e_t = emission_log_weights_t(
            bstats, blocks.sizes, model.theta_mean, model.theta_var, mapping
        )
        return model, buffers, jnp.sum(log_e_t)

    def stage_forward(k, model, buffers):
        model, blocks = pre(k, model)
        bstats = block_sufficient_stats_t(prefix, blocks, cell_bits)
        log_e_t = emission_log_weights_t(
            bstats, blocks.sizes, model.theta_mean, model.theta_var, mapping
        )
        cols_t, last = forward_columns_t(
            log_e_t, blocks.sizes, blocks.n_blocks, model.A, model.pi, True
        )
        return model, buffers, jnp.sum(cols_t) + jnp.sum(last)

    def stage_backward(k, model, buffers):
        model, blocks = pre(k, model)
        bstats = block_sufficient_stats_t(prefix, blocks, cell_bits)
        log_e_t = emission_log_weights_t(
            bstats, blocks.sizes, model.theta_mean, model.theta_var, mapping
        )
        cols_t, last = forward_columns_t(
            log_e_t, blocks.sizes, blocks.n_blocks, model.A, model.pi, True
        )
        z = backward_sample_t(k, cols_t, last, blocks.n_blocks, model.A)
        return model, buffers, jnp.sum(z).astype(jnp.float32)

    def stage_accum(k, model, buffers):
        model, blocks = pre(k, model)
        bstats = block_sufficient_stats_t(prefix, blocks, cell_bits)
        log_e_t = emission_log_weights_t(
            bstats, blocks.sizes, model.theta_mean, model.theta_var, mapping
        )
        cols_t, last = forward_columns_t(
            log_e_t, blocks.sizes, blocks.n_blocks, model.A, model.pi, True
        )
        z = backward_sample_t(k, cols_t, last, blocks.n_blocks, model.A)
        stats = accumulate_sweep_stats(
            z, blocks.sizes, blocks.n_blocks, bstats, mapping, nr_params
        )
        return model, buffers, jnp.sum(stats.trans_counts)

    def stage_resample(k, model, buffers):
        model, blocks = pre(k, model)
        bstats = block_sufficient_stats_t(prefix, blocks, cell_bits)
        log_e_t = emission_log_weights_t(
            bstats, blocks.sizes, model.theta_mean, model.theta_var, mapping
        )
        cols_t, last = forward_columns_t(
            log_e_t, blocks.sizes, blocks.n_blocks, model.A, model.pi, True
        )
        z = backward_sample_t(k, cols_t, last, blocks.n_blocks, model.A)
        stats = accumulate_sweep_stats(
            z, blocks.sizes, blocks.n_blocks, bstats, mapping, nr_params
        )
        new_model = resample_model(k, priors, stats)
        return new_model, buffers, jnp.float32(0)

    def stage_record(k, model, buffers):
        model, blocks = pre(k, model)
        bstats = block_sufficient_stats_t(prefix, blocks, cell_bits)
        log_e_t = emission_log_weights_t(
            bstats, blocks.sizes, model.theta_mean, model.theta_var, mapping
        )
        cols_t, last = forward_columns_t(
            log_e_t, blocks.sizes, blocks.n_blocks, model.A, model.pi, True
        )
        z = backward_sample_t(k, cols_t, last, blocks.n_blocks, model.A)
        stats = accumulate_sweep_stats(
            z, blocks.sizes, blocks.n_blocks, bstats, mapping, nr_params
        )
        new_model = resample_model(k, priors, stats)
        buffers = record_sweep(buffers, z, blocks.starts, blocks.n_blocks)
        return new_model, buffers, jnp.float32(0)

    def stage_mixture(k, model, buffers):
        model, blocks = pre(k, model)
        bstats = block_sufficient_stats_t(prefix, blocks, cell_bits)
        z = mixture_sample_states(
            k, bstats, blocks.sizes, blocks.n_blocks,
            model.theta_mean, model.theta_var, mapping,
        )
        return model, buffers, jnp.sum(z).astype(jnp.float32)

    stages = [
        ("threshold+blocks", stage_blocks_only),
        ("+block stats", stage_blocks),
        ("+emission", stage_emission),
        ("+forward scan", stage_forward),
        ("+backward scan", stage_backward),
        ("+accumulate", stage_accum),
        ("+resample (full, no rec)", stage_resample),
        ("+record (full F sweep)", stage_record),
        ("mixture sweep (no rec)", stage_mixture),
    ]
    # compile every (stage, length) program up front (compiles are cached;
    # measurement then runs interleaved so tunnel drift is shared)
    compiled = []
    for name, step in stages:
        for n in (N_ITERS, N_LONG):
            log(f"compiling {name} @ {n}")
            fn = scan_harness(step, n)
            jax.block_until_ready(fn(model0, buffers))
            compiled.append((name, n, fn, (model0, buffers)))
    log("measuring (interleaved)")
    split = timed_pair(compiled)
    for name, _ in stages:
        per_iter, dispatch, spread = split[name]
        print(
            f"{name:34s} {per_iter:8.3f} ms/sweep "
            f"(+{dispatch:5.1f} ms/dispatch, spread {spread:.3f})",
            flush=True,
        )
        RESULTS.append(
            (name, round(per_iter, 4), round(dispatch, 2), round(spread, 4))
        )

    if "micro" in sys.argv:
        micro(eng, cap, key0)

    if "save" in sys.argv:
        import json

        out = {
            "T": int(T),
            "settled_capacity": int(cap),
            "scan_lengths": [N_ITERS, N_LONG],
            "reps_per_point": N_REPS,
            "stages": {
                name: {
                    "per_iter_ms": p,
                    "dispatch_ms": d,
                    "long_scan_spread_ms_per_iter": s,
                }
                for name, p, d, s in RESULTS
            },
            "note": (
                "stages are cumulative prefixes of the F sweep. per_iter_ms "
                "is the slope between 32- and 256-iteration scans of the "
                "same body — the true on-device cost of one sweep at this "
                "stage, with the per-dispatch tunnel round trip (reported "
                "as dispatch_ms) removed; the round-4 ablation's "
                "non-monotone cumulative stages were that round trip "
                "divided by 32 drowning the per-stage deltas"
            ),
        }
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ABLATE_r05.json",
        )
        json.dump(out, open(path, "w"), indent=1)
        print(f"wrote {path}", flush=True)


def micro(eng, cap, key0):
    """Micro-op timings at the sweep's shapes."""
    T = eng.ing.T
    prefix = eng.ing.prefix
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.sort(rng.integers(0, T, cap)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=cap).astype(np.float32))

    def harness(step):
        @jax.jit
        def run():
            def body(acc, i):
                k = jax.random.fold_in(key0, i)
                return acc + step(k), ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_ITERS))
            return acc

        return run

    r_t = jnp.asarray(
        np.ascontiguousarray(np.asarray(prefix.r).transpose(1, 2, 0))
    )  # (dim, 2, T+1)

    def jidx(k):
        return jnp.minimum(
            idx + jax.random.randint(k, (), 0, 2, dtype=jnp.int32), T - 1
        )

    csum_base = jnp.cumsum(
        jnp.ones((cap,), jnp.int32)
    )  # stand-in monotone csum

    def compact_scatter(k):
        valid = jax.random.uniform(k, (cap,)) < 0.8
        csum = jnp.cumsum(valid.astype(jnp.int32))
        sel = jnp.full((cap,), cap, jnp.int32)
        sel = sel.at[jnp.where(valid, csum - 1, cap)].set(
            jnp.arange(cap, dtype=jnp.int32), mode="drop"
        )
        return jnp.sum(sel).astype(jnp.float32)

    def compact_searchsorted(k):
        valid = jax.random.uniform(k, (cap,)) < 0.8
        csum = jnp.cumsum(valid.astype(jnp.int32))
        sel = jnp.searchsorted(
            csum, jnp.arange(1, cap + 1, dtype=jnp.int32), side="left"
        )
        return jnp.sum(sel).astype(jnp.float32)

    def scatter_unique(k):
        i = jidx(k)
        # force-unique indices + hint
        u = i * 0 + jnp.arange(cap, dtype=jnp.int32) * 7
        return jnp.sum(
            jnp.zeros(3 * T, jnp.int32).at[u].add(
                1, mode="drop", unique_indices=True
            )
        ).astype(jnp.float32)

    ops = [
        ("compact: scatter (current)", compact_scatter),
        ("compact: searchsorted", compact_searchsorted),
        ("scatter add flat unique hint", scatter_unique),
        ("gather r[s] (T,1,2)", lambda k: jnp.sum(prefix.r[jidx(k)])),
        ("gather r_t[:,:,s] (1,2,T)", lambda k: jnp.sum(r_t[:, :, jidx(k)])),
        ("gather 1d r_t[0,0][s]", lambda k: jnp.sum(r_t[0, 0][jidx(k)])),
        ("scatter set (cap,)", lambda k: jnp.sum(
            jnp.zeros(cap, jnp.float32).at[jidx(k) % cap].set(vals))),
        ("scatter add flat (K*T,)", lambda k: jnp.sum(
            jnp.zeros(3 * T, jnp.int32).at[jidx(k)].add(1, mode="drop")
        ).astype(jnp.float32)),
        ("cumsum (cap,) i32", lambda k: jnp.sum(
            jnp.cumsum(jidx(k) % 3)).astype(jnp.float32)),
        ("searchsorted in (T,)", lambda k: jnp.sum(
            jnp.searchsorted(
                eng.ing.ranked.neg_w_sorted,
                -jax.random.uniform(k, ()) * 3.0,
            )
        ).astype(jnp.float32)),
        ("gumbel (K,K,cap)", lambda k: jnp.sum(
            jax.random.gumbel(k, (3, 3, cap), dtype=jnp.float32))),
        ("gumbel (K,cap)+argmax", lambda k: jnp.sum(
            jnp.argmax(jax.random.gumbel(k, (3, cap), jnp.float32), axis=0)
        ).astype(jnp.float32)),
        ("onehot einsum (K,cap)@(cap,)", lambda k: jnp.sum(
            ((jidx(k)[None, :] % 3 == jnp.arange(3)[:, None]).astype(
                jnp.float32
            ) @ vals)
        )),
    ]
    for name, step in ops:
        timed(name, harness(step))


if __name__ == "__main__":
    main()
