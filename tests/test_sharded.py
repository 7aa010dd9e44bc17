"""Sharded (8 virtual CPU devices) vs single-device equivalence.

Deterministic parts — block boundaries, sizes, counts — must match the
single-device engine exactly; posterior marginals must agree within
Monte-Carlo error (SURVEY.md §4c)."""

import numpy as np
import jax
import pytest

from hammlet_tpu.io.records import Records
from hammlet_tpu.parallel.mesh import position_mesh
from hammlet_tpu.parallel.sharded import make_sharded_engine
from hammlet_tpu.runner import make_engine


def synth(T=3000, seed=0):
    rng = np.random.default_rng(seed)
    means = [0.0, 5.0, -5.0]
    out, states = [], []
    t = 0
    while t < T:
        n = min(int(rng.integers(120, 400)), T - t)
        s = int(rng.integers(0, 3))
        out.append(rng.normal(means[s], 1.0, size=n))
        states.extend([s] * n)
        t += n
    return np.concatenate(out).astype(np.float32), np.array(states)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return position_mesh(8)


def test_block_structure_matches_single_device(mesh8, tmp_path):
    data, _ = synth(T=2777, seed=3)
    e1 = make_engine(data, nr_params=3, seed=11)
    e2 = make_sharded_engine(data, mesh=mesh8, nr_params=3, seed=11)

    # same seed => identical initial model => identical thresholds
    np.testing.assert_allclose(
        np.asarray(e1.model.theta_var), np.asarray(e2.model.theta_var), rtol=1e-6
    )

    e1.run("F", 1, 0)
    e2._one_sweep("F", do_record=False)

    # run one more sweep on both under identical models (hence identical
    # thresholds) and compare the emitted block partitions
    rec1 = Records(
        len(data), str(tmp_path / "a-"), ".csv", 3,
        outputs={"blocks", "sequences", "compression", "marginals"},
        overwrite=True,
    )
    rec2 = Records(
        len(data), str(tmp_path / "b-"), ".csv", 3,
        outputs={"blocks", "sequences", "compression", "marginals"},
        overwrite=True,
    )
    e1.records = rec1
    e2.records = rec2
    # force identical models (and thus thresholds) before the recorded sweep
    e2.model = jax.device_put(e1.model)
    e1.run("F", 1, 1)
    e2._one_sweep("F", do_record=True)
    rec1.close()
    rec2.close()

    b1 = (tmp_path / "a-blocks.csv").read_text().split("\t")
    b2 = (tmp_path / "b-blocks.csv").read_text().split("\t")
    assert [int(x) for x in b1] == [int(x) for x in b2]


def test_sharded_marginals_match_unsharded(mesh8, tmp_path):
    data, true_states = synth(T=3000, seed=7)
    T = len(data)

    rec1 = Records(T, str(tmp_path / "u-"), ".csv", 3, overwrite=True)
    e1 = make_engine(data, nr_params=3, seed=5, records=rec1)
    e1.run_scheme("M 40 0 F 40 0 F 60 3".split())
    e1.finalize()

    rec2 = Records(T, str(tmp_path / "s-"), ".csv", 3, overwrite=True)
    e2 = make_sharded_engine(data, mesh=mesh8, nr_params=3, seed=5, records=rec2)
    e2.run_scheme("M 40 0 F 40 0 F 60 3".split())
    e2.finalize()

    def marg(path):
        rows = [
            list(map(int, l.split("\t"))) for l in open(path).read().splitlines()
        ]
        pos = np.zeros((T, 3))
        t = 0
        for r in rows:
            pos[t : t + r[0], : len(r) - 1] = r[1:]
            t += r[0]
        assert t == T
        return pos / pos.sum(axis=1, keepdims=True)

    m1 = marg(tmp_path / "u-marginals.csv")
    m2 = marg(tmp_path / "s-marginals.csv")
    from itertools import permutations

    best = min(
        np.abs(m1 - m2[:, list(p)]).mean() for p in permutations(range(3))
    )
    assert best < 0.06, best


def test_sharded_scanned_streams(mesh8, tmp_path):
    """All six record streams drain correctly from the scanned sharded
    phase (states/sizes/n_boundaries are stacked inside the scan and written
    once per chunk)."""
    data, _ = synth(T=2500, seed=4)
    T = len(data)
    rec = Records(
        T, str(tmp_path / "sc-"), ".csv", 3,
        outputs={"marginals", "sequences", "blocks", "compression",
                 "parameters", "segments"},
        overwrite=True,
    )
    e = make_sharded_engine(data, mesh=mesh8, nr_params=3, seed=8, records=rec)
    e.run_scheme("M 20 0 F 40 4".split())
    e.finalize()

    seq_lines = (tmp_path / "sc-sequences.csv").read_text().splitlines()
    assert len(seq_lines) == 10
    for line in seq_lines:
        toks = [tok.split(":") for tok in line.split("\t")]
        assert sum(int(n) for n, _ in toks) == T
    blk_lines = (tmp_path / "sc-blocks.csv").read_text().splitlines()
    assert len(blk_lines) == 10
    for line in blk_lines:
        assert sum(map(int, line.split("\t"))) == T
    seg_lines = (tmp_path / "sc-segments.csv").read_text().splitlines()
    nsegs = [int(line.split("\t")[0]) for line in seg_lines]
    assert len(nsegs) == 10 and all(a <= b for a, b in zip(nsegs, nsegs[1:]))
    comp = (tmp_path / "sc-compression.csv").read_text().splitlines()
    par = (tmp_path / "sc-parameters.csv").read_text().splitlines()
    assert len(comp) == 10 and len(par) == 10
    # marginal rows sum to the recorded sweep count; final segment count
    # matches the marginals partition
    rows = [
        list(map(int, line.split("\t")))
        for line in (tmp_path / "sc-marginals.csv").read_text().splitlines()
    ]
    assert sum(r[0] for r in rows) == T
    assert all(sum(r[1:]) == 10 for r in rows)
    assert nsegs[-1] == len(rows)


def test_device_side_rle_matches_full_download(mesh8, tmp_path):
    """compact_sharded_marginals (device-side RLE, downloads only segment
    rows) writes a byte-identical marginals CSV to the full counts-buffer
    download path."""
    from hammlet_tpu.parallel.sharded import compact_sharded_marginals

    data, _ = synth(T=3333, seed=9)
    T = len(data)
    e = make_sharded_engine(data, mesh=mesh8, nr_params=3, seed=3)
    e.run_scheme("M 16 0 F 24 2".split())

    # full-download oracle
    rec1 = Records(T, str(tmp_path / "full-"), ".csv", 3, overwrite=True)
    rec1.save_marginals(e.marginal_counts.T, np.asarray(e.everb)[:T])
    rec1.close()

    rec2 = Records(T, str(tmp_path / "rle-"), ".csv", 3, overwrite=True)
    starts, seg_counts = compact_sharded_marginals(e)
    rec2.save_marginals_from_segments(starts, seg_counts)
    rec2.close()

    assert (tmp_path / "rle-marginals.csv").read_bytes() == (
        tmp_path / "full-marginals.csv"
    ).read_bytes()


def test_low_compression_stress(mesh8, tmp_path):
    """Degenerate compression (near-white noise, ratio -> 1): the block
    capacity grows to ~T_local via overflow replay, the RLE store
    approaches one segment per position, and the segment-proportional
    finalize still matches the full-download oracle byte for byte (the
    reference flags exactly this regime as its memory-pressure point,
    doc/hammlet-manpage.md:178)."""
    from hammlet_tpu.parallel.sharded import compact_sharded_marginals

    rng = np.random.default_rng(4)
    # amplitude >> within-state noise at alternating positions: almost every
    # position is a real breakpoint under any plausible noise estimate
    data = (rng.normal(0, 1, 2048) + np.tile([0.0, 30.0], 1024)).astype(
        np.float32
    )
    T = len(data)
    e = make_sharded_engine(data, mesh=mesh8, nr_params=3, seed=6)
    e.run_scheme("M 6 0 F 8 2".split())
    # compression genuinely degenerated (most positions are block starts)
    assert e.cap_local >= 0.5 * e.T_local, (e.cap_local, e.T_local)
    counts = e.marginal_counts
    assert (counts.sum(axis=0) == 4).all()

    rec1 = Records(T, str(tmp_path / "full-"), ".csv", 3, overwrite=True)
    rec1.save_marginals(counts.T, np.asarray(e.everb)[:T])
    rec1.close()
    rec2 = Records(T, str(tmp_path / "rle-"), ".csv", 3, overwrite=True)
    starts, seg_counts = compact_sharded_marginals(e)
    rec2.save_marginals_from_segments(starts, seg_counts)
    rec2.close()
    assert (tmp_path / "rle-marginals.csv").read_bytes() == (
        tmp_path / "full-marginals.csv"
    ).read_bytes()
    # the marginal store really is ~per-position in this regime
    assert len(starts) > 0.25 * T


def test_low_compression_single_device(tmp_path):
    """Same degenerate regime on the single-device engine: overflow replay
    at capacity ~T, marginals still exact."""
    rng = np.random.default_rng(5)
    data = (rng.normal(0, 1, 2000) + np.tile([0.0, 30.0], 1000)).astype(
        np.float32
    )
    rec = Records(
        len(data), str(tmp_path / "lc-"), ".csv", 3,
        outputs={"marginals", "compression"}, overwrite=True,
    )
    e = make_engine(data, nr_params=3, seed=6, records=rec)
    e.run_scheme("M 6 0 F 8 2".split())
    e.finalize()
    rows = [
        list(map(int, l.split("\t")))
        for l in (tmp_path / "lc-marginals.csv").read_text().splitlines()
    ]
    assert sum(r[0] for r in rows) == len(data)
    assert all(sum(r[1:]) == 4 for r in rows)
    comp = [
        float(x)
        for x in (tmp_path / "lc-compression.csv").read_text().split()
    ]
    assert min(comp) < 3.0, comp  # ratio genuinely degenerated toward 1


def test_sharded_count_invariants(mesh8):
    data, _ = synth(T=2048, seed=1)
    e = make_sharded_engine(data, mesh=mesh8, nr_params=3, seed=2)
    e.run_scheme("M 10 0 F 10 1".split())
    counts = e.marginal_counts
    assert (counts.sum(axis=0) == 10).all()
    assert int(np.asarray(e.n_rec)) == 10
    # raw diff invariant: one unterminated block (ending at T) per recorded
    # sweep, so the accumulator sums to n_rec
    assert int(np.asarray(e.counts).sum()) == 10
