"""Streaming input provider: exactness vs full parse, plain + gz, multi-
file, multivariate, and the sharded ingest's peek-then-read access pattern.

The reference's defining ingest property is one-pass istream streaming
(wavelet.hpp:98-188); ValueStream is the equivalent bounded-memory front
door for the sharded engine (native TokenStream when the C++ library is
built, pure-Python fallback otherwise — both covered here)."""

import gzip

import numpy as np
import pytest

from hammlet_tpu.io.input import ValueStream, _PyTokenStream, _count_tokens_py


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vs")
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 10001).astype(np.float32)
    b = rng.normal(5, 1, 4321).astype(np.float32)
    fa, fb = str(d / "a.csv"), str(d / "b.csv.gz")
    np.savetxt(fa, a, fmt="%.6g")
    with gzip.open(fb, "wt") as fh:
        fh.write("\n".join(f"{v:.6g}" for v in b))
    full = np.concatenate(
        [np.loadtxt(fa, dtype=np.float32),
         np.array([float(f"{v:.6g}") for v in b], np.float32)]
    )
    return fa, fb, full


def test_value_stream_ranges(files):
    fa, fb, full = files
    vs = ValueStream([fa, fb], nr_dim=1)
    assert vs.T == len(full)
    # ascending + small-peek-then-reread (the sharded ingest's pattern),
    # cross-file ranges, and a full rewind
    for s, e in [(0, 3000), (3000, 3100), (3000, 6000), (6000, 6064),
                 (6000, 14322), (9990, 10050), (0, 14322)]:
        np.testing.assert_array_equal(vs(s, e)[:, 0], full[s:e])
    vs.close()


def test_value_stream_multivariate(files):
    fa, fb, full = files
    vs = ValueStream([fa, fb], nr_dim=2)
    assert vs.T == len(full) // 2
    np.testing.assert_array_equal(vs(100, 200), full[200:400].reshape(-1, 2))
    vs.close()


def test_value_stream_dim_mismatch(files):
    fa, _, _ = files
    with pytest.raises(ValueError, match="fill all"):
        ValueStream([fa], nr_dim=2)  # 10001 values % 2 != 0


def test_py_token_stream_and_count(files):
    fa, fb, full = files
    ps = _PyTokenStream(fb)
    np.testing.assert_array_equal(ps.read(10, 50), full[10011:10061])
    np.testing.assert_array_equal(ps.read(0, 5), full[10001:10006])  # rewind
    assert len(ps.read(4300, 100)) == 21  # EOF-limited
    ps.close()
    assert _count_tokens_py(fa) == 10001
    assert _count_tokens_py(fb) == 4321
