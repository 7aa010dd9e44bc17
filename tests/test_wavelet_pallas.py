"""Pallas maxlet kernel: bit-exact vs the golden model (interpreter mode on
CPU; the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hammlet_tpu.golden import reference as gold
from hammlet_tpu.ops.wavelet_pallas import maxlet_transform_pallas


@pytest.mark.parametrize("T", [100, 8192, 8193, 20000, 65536, 100000])
def test_pallas_maxlet_bitexact(T):
    rng = np.random.default_rng(T)
    data = rng.normal(1, 2, size=(T, 1)).astype(np.float32)
    want = gold.maxlet_transform(data)
    got = np.asarray(maxlet_transform_pallas(jnp.asarray(data), interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_maxlet_multivariate(dim):
    rng = np.random.default_rng(dim)
    data = rng.normal(0, 1, size=(30000, dim)).astype(np.float32)
    want = gold.maxlet_transform(data)
    got = np.asarray(maxlet_transform_pallas(jnp.asarray(data), interpret=True))
    np.testing.assert_array_equal(got, want)
