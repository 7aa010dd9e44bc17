"""Capacity-ceiling behavior (runner._MAX_CAPACITY).

The first post-prior burn-in sweeps genuinely have ~T blocks; at genome
scale a sweep at capacity ~T OOMs HBM. The engines therefore cap the
compiled capacity and accept truncated burn-in (non-recording) chunks at
the ceiling — the device program reduces to the top-capacity ranked
weights (make_blocks_bucketed) — while recording chunks at the ceiling
fail loudly instead of silently truncating the posterior record.
"""

import numpy as np
import pytest

import hammlet_tpu.runner as runner_mod
from hammlet_tpu.io.records import Records
from hammlet_tpu.runner import Engine, make_engine


def noise(T=4096, seed=0):
    return np.random.default_rng(seed).normal(0, 1.0, size=T).astype(
        np.float32
    )


def segments(T=4096, seed=0):
    """Well-separated segments: ~T boundary candidates at the prior draw's
    near-zero threshold, but only ~T/250 blocks once the threshold settles."""
    rng = np.random.default_rng(seed)
    means = [0.0, 5.0, -5.0]
    out = []
    t = 0
    while t < T:
        n = min(int(rng.integers(150, 400)), T - t)
        out.append(rng.normal(means[int(rng.integers(0, 3))], 1.0, size=n))
        t += n
    return np.concatenate(out).astype(np.float32)


def test_burnin_truncated_at_ceiling_then_records(tmp_path):
    data = segments()
    rec = Records(
        len(data), str(tmp_path / "cap-"), ".csv", 3,
        outputs={"marginals", "compression"}, overwrite=True,
    )
    eng = make_engine(data, nr_params=3, seed=1, records=rec)
    eng.max_capacity = 256  # force the ceiling to bind during burn-in
    eng.capacity = min(eng.capacity, 256)
    # pure-noise prior draw => ~T boundary candidates: every burn-in chunk
    # overflows the ceiling and must be accepted truncated, not replayed
    # into an unbounded capacity ladder
    eng.run("M", 16, 0)
    assert eng.capacity <= 256
    # the dynamic threshold settles after burn-in (pure noise compresses to
    # very few blocks at the universal threshold) and recording works
    eng.run("F", 8, 1)
    assert eng.capacity <= 256
    eng.finalize()  # runs the marginal-sum invariant (HAMMLET_DEBUG=1)
    m = eng.metrics()
    assert m["recorded_sweeps"] == 8


def test_recording_overflow_at_ceiling_raises():
    data = noise(seed=3)
    eng = make_engine(data, nr_params=3, seed=2)
    eng.max_capacity = 8
    eng.capacity = 8
    # recording right after the prior draw needs ~T blocks: the ceiling
    # cannot be honored without truncating recorded sweeps => hard error
    with pytest.raises(RuntimeError, match="capacity ceiling"):
        eng.run("F", 4, 1)


def test_default_ceiling_resolution():
    data = noise(T=512, seed=4)
    eng = make_engine(data, nr_params=3, seed=0)
    # small T: the ceiling resolves to T (no behavior change at CI scale)
    assert eng.max_capacity == 512
    # an explicit capacity above the default ceiling is honored
    e2 = Engine(
        ing=eng.ing, spec=eng.spec, priors=eng.priors, seed=0,
        capacity=1024, max_capacity=256,
    )
    assert e2.max_capacity == 1024


def test_sharded_burnin_truncated_at_ceiling(monkeypatch, tmp_path):
    import jax

    from hammlet_tpu.parallel.mesh import position_mesh
    from hammlet_tpu.parallel.sharded import make_sharded_engine

    assert len(jax.devices()) >= 8
    monkeypatch.setattr(runner_mod, "_MAX_CAPACITY", 64)
    data = segments(T=8192, seed=5)
    rec = Records(
        len(data), str(tmp_path / "scap-"), ".csv", 3,
        outputs={"marginals"}, overwrite=True,
    )
    eng = make_sharded_engine(
        data, mesh=position_mesh(8), nr_params=3, seed=1, records=rec
    )
    assert eng.max_cap_local == 64
    eng.run("M", 16, 0)
    assert eng.cap_local <= 64
    eng.run("F", 8, 1)
    assert eng.cap_local <= 64
    eng.finalize()
