"""Checkpoint/resume: a resumed run continues the exact chain."""

import numpy as np

from hammlet_tpu.checkpoint import restore_checkpoint, save_checkpoint
from hammlet_tpu.runner import make_engine


def _data(T=1500, seed=3):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [rng.normal(0, 1, T // 3), rng.normal(5, 1, T // 3),
         rng.normal(0, 1, T - 2 * (T // 3))]
    ).astype(np.float32)


def test_checkpoint_resume_bit_identical(tmp_path):
    data = _data()
    ck = tmp_path / "state.npz"

    # uninterrupted run: M 32 then F 64 (thin 4)
    e1 = make_engine(data, nr_params=3, seed=9)
    e1.run("M", 32, 0)
    e1.run("F", 64, 4)

    # interrupted run: checkpoint after the M phase, rebuild, restore, finish
    e2 = make_engine(data, nr_params=3, seed=9)
    e2.run("M", 32, 0)
    save_checkpoint(e2, str(ck))
    e3 = make_engine(data, nr_params=3, seed=9)
    restore_checkpoint(e3, str(ck))
    e3.run("F", 64, 4)

    np.testing.assert_array_equal(
        np.asarray(e1.buffers.counts), np.asarray(e3.buffers.counts)
    )
    np.testing.assert_array_equal(
        np.asarray(e1.model.theta_mean), np.asarray(e3.model.theta_mean)
    )
    assert int(e3.buffers.n_records) == 16


def test_checkpoint_rejects_mismatch(tmp_path):
    data = _data()
    e = make_engine(data, nr_params=3, seed=1)
    save_checkpoint(e, str(tmp_path / "c.npz"))
    other = make_engine(data, nr_params=3, seed=2)
    import pytest

    with pytest.raises(ValueError):
        restore_checkpoint(other, str(tmp_path / "c.npz"))


def test_periodic_checkpoint(tmp_path):
    data = _data()
    e = make_engine(data, nr_params=3, seed=4)
    e.checkpoint_path = str(tmp_path / "auto.npz")
    e.checkpoint_every = 32
    e.run("M", 64, 0)
    assert (tmp_path / "auto.npz").exists()


def test_scheme_resume_skips_completed_ops(tmp_path):
    """A checkpoint taken mid-scheme resumes at the scheme cursor: no op is
    replayed, the marginal counts match the uninterrupted run bit-exactly."""
    tokens = ["M", "8", "0", "F", "16", "2"]
    data = _data()
    ck = str(tmp_path / "mid.npz")

    e1 = make_engine(data, nr_params=3, seed=11)
    e1.run_scheme(tokens)

    # simulate an interruption right after the M phase: execute the scheme
    # prefix exactly as run_scheme would, then checkpoint with the cursor
    # pointing at the F op (ops: [prior, M-run, F-run] -> index 2)
    e2 = make_engine(data, nr_params=3, seed=11)
    e2.sample_prior()
    e2.run("M", 8, 0)
    e2.scheme_op_index, e2.scheme_op_done = 2, 0
    save_checkpoint(e2, ck)

    e3 = make_engine(data, nr_params=3, seed=11)
    restore_checkpoint(e3, ck)
    e3.run_scheme(tokens)

    np.testing.assert_array_equal(
        np.asarray(e1.buffers.counts), np.asarray(e3.buffers.counts)
    )
    assert int(e3.buffers.n_records) == int(e1.buffers.n_records) == 8
    # cursor resets after a completed scheme so a second run_scheme is fresh
    assert (e3.scheme_op_index, e3.scheme_op_done) == (0, 0)


def test_resume_rejects_different_scheme(tmp_path):
    """A checkpoint taken mid-scheme records the -i tokens; resuming with a
    different scheme must fail loudly instead of silently misapplying the
    cursor (ADVICE r1)."""
    import pytest

    data = _data()
    ck = str(tmp_path / "mid.npz")

    e1 = make_engine(data, nr_params=3, seed=21)
    e1.checkpoint_path = ck
    e1.checkpoint_every = 8
    e1.run_scheme(["M", "8", "0", "F", "16", "2"])
    assert e1.ckpt_scheme_tokens == ["M", "8", "0", "F", "16", "2"]

    # craft a mid-scheme cursor (the final checkpoint of a finished scheme
    # has a reset cursor, which resumes any scheme)
    e1.scheme_op_index, e1.scheme_op_done = 2, 4
    save_checkpoint(e1, ck)
    e2 = make_engine(data, nr_params=3, seed=21)
    restore_checkpoint(e2, ck)
    with pytest.raises(ValueError, match="scheme"):
        e2.run_scheme(["F", "32", "4"])


def test_run_then_scheme_starts_fresh():
    """run_scheme after direct run() calls must not inherit the stale
    scheme_op_done left by run() (ADVICE r1: previously held together only by
    parse_scheme's implicit prior op)."""
    data = _data()
    e = make_engine(data, nr_params=3, seed=22)
    e.run("M", 8, 0)
    assert e.scheme_op_done == 8
    e.run_scheme(["F", "4", "2"])  # must run all 4 sweeps, record 2
    assert int(e.buffers.n_records) == 2


def test_marginal_index_overflow_guard():
    """K*T >= 2^31 would wrap the flat int32 marginal index; creation must
    fail loudly (ADVICE r1)."""
    import pytest

    from hammlet_tpu.samplers.sweep import RecordBuffers

    with pytest.raises(ValueError, match="int32"):
        RecordBuffers.create(T=2**29, K=4)


def test_sharded_checkpoint_resume(tmp_path):
    from hammlet_tpu.checkpoint import (
        restore_sharded_checkpoint,
        save_sharded_checkpoint,
    )
    from hammlet_tpu.parallel import make_sharded_engine, position_mesh

    data = _data(4096, seed=6)
    ck = str(tmp_path / "sharded.npz")

    def build():
        return make_sharded_engine(
            data, mesh=position_mesh(4), nr_params=3, seed=5
        )

    e1 = build()
    e1.run("M", 32, 0)
    e1.run("F", 32, 4)

    e2 = build()
    e2.run("M", 32, 0)
    save_sharded_checkpoint(e2, ck)
    e3 = build()
    restore_sharded_checkpoint(e3, ck)
    e3.run("F", 32, 4)

    np.testing.assert_array_equal(np.asarray(e1.counts), np.asarray(e3.counts))
    np.testing.assert_array_equal(
        np.asarray(e1.model.theta_mean), np.asarray(e3.model.theta_mean)
    )
    assert int(np.asarray(e3.n_rec)) == 8

    # mesh-size mismatch is rejected
    import pytest

    e8 = make_sharded_engine(data, mesh=position_mesh(8), nr_params=3, seed=5)
    with pytest.raises(ValueError):
        restore_sharded_checkpoint(e8, ck)
