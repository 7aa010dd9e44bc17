"""Native ingest library vs golden NumPy model (bit-exact)."""

import numpy as np
import pytest

from hammlet_tpu import native
from hammlet_tpu.golden import reference as gold
from hammlet_tpu.ops.blocks import build_prefix_stats

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.mark.parametrize("T,dim", [(100, 1), (1000, 1), (4097, 2), (65536 + 77, 1)])
def test_native_maxlet_and_weights(T, dim):
    rng = np.random.default_rng(T + dim)
    data = rng.normal(1, 2, size=(T, dim)).astype(np.float32)
    want_c = gold.maxlet_transform(data)
    got_c = native.maxlet(data)
    np.testing.assert_array_equal(got_c, want_c)
    want_w = gold.breakpoint_weights(want_c)
    got_w = native.breakpoint_weights(got_c)
    np.testing.assert_array_equal(got_w, want_w)


def test_native_noise_std():
    rng = np.random.default_rng(0)
    data = rng.normal(0, 3, size=(5000, 1)).astype(np.float32)
    c = gold.maxlet_transform(data)
    want = gold.noise_std_estimate(c)
    got = native.noise_std(c)
    assert abs(got - want) < 1e-9 * abs(want)


def test_native_parse_file(tmp_path):
    rng = np.random.default_rng(1)
    vals = rng.normal(0, 10, size=5000).astype(np.float32)
    fn = tmp_path / "v.csv"
    np.savetxt(fn, vals, fmt="%.6f")
    got = native.parse_file(str(fn))
    np.testing.assert_allclose(got, np.loadtxt(fn, dtype=np.float32), rtol=1e-6)

    import gzip

    fngz = tmp_path / "v.csv.gz"
    with gzip.open(fngz, "wt") as fh:
        np.savetxt(fh, vals, fmt="%.6f")
    got2 = native.parse_file(str(fngz))
    np.testing.assert_array_equal(got, got2)


def test_native_prefix_stats_match_python():
    rng = np.random.default_rng(3)
    data = rng.normal(2, 1, size=(3000, 1)).astype(np.float32)
    r_n, q2_n = native.prefix_stats(data, cell_bits=8)
    ps = build_prefix_stats(data, cell_bits=8)
    np.testing.assert_allclose(np.asarray(ps.r), r_n, rtol=1e-6, atol=1e-3)
    q2_hi = q2_n.astype(np.float32)
    np.testing.assert_allclose(np.asarray(ps.q2_hi), q2_hi, rtol=1e-6)
