"""Bit-exactness of the JAX wavelet kernels against the golden NumPy model."""

import numpy as np
import jax.numpy as jnp
import pytest

from hammlet_tpu.golden import reference as gold
from hammlet_tpu.ops.wavelet import breakpoint_weights, maxlet_transform

SIZES = [2, 3, 4, 5, 7, 8, 15, 16, 17, 100, 255, 256, 1000, 4096, 10000]


@pytest.mark.parametrize("T", SIZES)
def test_maxlet_bitexact_univariate(T):
    rng = np.random.default_rng(T)
    data = rng.normal(0, 1, size=(T, 1)).astype(np.float32) * 10
    want = gold.maxlet_transform(data)
    got = np.asarray(maxlet_transform(jnp.asarray(data)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("T", [4, 7, 64, 100, 1000])
@pytest.mark.parametrize("dim", [2, 3])
def test_maxlet_bitexact_multivariate(T, dim):
    rng = np.random.default_rng(T * 31 + dim)
    data = rng.normal(2, 3, size=(T, dim)).astype(np.float32)
    want = gold.maxlet_transform(data)
    got = np.asarray(maxlet_transform(jnp.asarray(data)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("T", SIZES)
def test_breakpoint_weights_bitexact(T):
    rng = np.random.default_rng(T + 999)
    data = rng.normal(0, 1, size=(T, 1)).astype(np.float32)
    coeffs = gold.maxlet_transform(data)
    want = gold.breakpoint_weights(coeffs)
    got = np.asarray(breakpoint_weights(jnp.asarray(coeffs)))
    np.testing.assert_array_equal(got, want)


def test_maxlet_structure():
    """coeffs[t] lives at the wavelet centered at t; incomplete supports and
    position 0 are +inf."""
    T = 12
    data = np.arange(T, dtype=np.float32)[:, None]
    c = np.asarray(maxlet_transform(jnp.asarray(data)))
    assert np.isinf(c[0])
    assert np.isinf(c[8])  # level-4 wavelet [0,16) incomplete for T=12
    finite = np.isfinite(c)
    # all level-1 odd positions are complete
    assert finite[1::2].all()


def test_weights_monotone_threshold_blocks():
    """Higher thresholds produce coarser partitions (nested boundaries)."""
    rng = np.random.default_rng(7)
    data = rng.normal(0, 1, size=(512, 1)).astype(np.float32)
    w = gold.breakpoint_weights(gold.maxlet_transform(data))
    starts_lo = set(gold.block_starts(w, 0.5).tolist())
    starts_hi = set(gold.block_starts(w, 3.0).tolist())
    assert starts_hi <= starts_lo
