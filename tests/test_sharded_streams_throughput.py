"""Sharded all-streams recording must not collapse sweep throughput.

Mirror of tests/test_streams_throughput.py on the 8-virtual-device CPU
mesh: the sharded drain reassembles global block rows from per-shard
stacks (parallel/sharded.py:_reassemble_block_rows + the native batch
formatter), and nothing else would catch a per-sweep host-sync creeping
back into that path — the exact regression the single-device engine hit
in round 1. Reference behavior being guarded: all six streams per
recorded sweep, /root/reference/src/Records.hpp:155-235."""

import numpy as np
import jax
import pytest

from hammlet_tpu.io.records import Records
from hammlet_tpu.parallel.mesh import position_mesh
from hammlet_tpu.parallel.sharded import make_sharded_engine


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return position_mesh(8)


def _measure(tmp_path, mesh, outputs, tag, data):
    rec = Records(
        len(data), str(tmp_path / f"{tag}-"), ".csv", 3,
        outputs=outputs, overwrite=True,
    )
    eng = make_sharded_engine(data, mesh=mesh, nr_params=3, seed=0,
                              records=rec)
    eng.run("M", 32, 0)
    eng.run("F", 128, 2)  # settle capacity + compile the measured program
    eng.total_sweeps = 0.0
    eng.sample_time = 0.0
    eng.run("F", 128, 2)
    sps = eng.total_sweeps / max(eng.sample_time, 1e-9)
    eng.finalize()
    return sps


def test_sharded_all_streams_throughput_ratio(mesh8, tmp_path):
    rng = np.random.default_rng(0)
    T = 200_000
    means = np.array([0.0, 2.0, -2.0])
    seg = rng.integers(0, 3, T // 400)
    data = (
        np.repeat(means[seg], 400) + rng.normal(0, 1, T)
    ).astype(np.float32)

    marg = _measure(tmp_path, mesh8, {"marginals"}, "m", data)
    full = _measure(tmp_path, mesh8, set(Records.STREAMS), "all", data)
    # same slack rationale as the single-device guard: an O(sweeps)
    # host-sync regression costs 3-10x, CI noise costs <1.7x
    assert full >= 0.6 * marg, (full, marg)
    for s in Records.STREAMS:
        assert (tmp_path / f"all-{s}.csv").stat().st_size > 0, s
