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
