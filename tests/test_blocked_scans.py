"""The production transposed-layout scans equal plain associative scans
and a sequential NumPy oracle (the untransposed twins were removed; these
are the scans the engines actually run)."""

import numpy as np
import jax
import jax.numpy as jnp

from hammlet_tpu.samplers.forward_backward import (
    _compose_maps_rev,
    _scaled_matmul,
    prefix_matmul_scan_t,
    suffix_compose_scan_t,
)


def test_prefix_matmul_transposed_matches_plain():
    rng = np.random.default_rng(3)
    for B in (96, 512):  # non-pow2 and pow2
        K = 3
        M = jnp.asarray(
            rng.uniform(0.1, 1.0, size=(B, K, K)).astype(np.float32)
        )
        t = prefix_matmul_scan_t(jnp.transpose(M, (1, 2, 0)))
        plain = jax.lax.associative_scan(_scaled_matmul, M, axis=0)
        pi = jnp.asarray(rng.dirichlet(np.ones(K)).astype(np.float32))
        a1 = jnp.einsum("i,ijb->bj", pi, t)
        a2 = jnp.einsum("i,bij->bj", pi, plain)
        a1 = a1 / a1.sum(axis=1, keepdims=True)
        a2 = a2 / a2.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a2), rtol=5e-4, atol=1e-6
        )


def test_prefix_matmul_transposed_sequential_oracle():
    """Scale-invariant agreement with a float64 sequential left-product."""
    rng = np.random.default_rng(7)
    B, K = 200, 4
    M = rng.uniform(0.1, 1.0, size=(B, K, K)).astype(np.float32)
    t = np.asarray(prefix_matmul_scan_t(jnp.transpose(jnp.asarray(M), (1, 2, 0))))
    acc = np.eye(K)
    for b in range(B):
        acc = acc @ M[b].astype(np.float64)
        acc /= acc.max()
        got = t[:, :, b] / t[:, :, b].max()
        np.testing.assert_allclose(got, acc / acc.max(), rtol=2e-3, atol=1e-6)


def test_suffix_compose_transposed_matches_plain():
    rng = np.random.default_rng(4)
    for B in (100, 640):
        K = 4
        maps = jnp.asarray(rng.integers(0, K, size=(B, K)).astype(np.int32))
        t = suffix_compose_scan_t(maps.T)
        plain = jax.lax.associative_scan(
            _compose_maps_rev, maps, axis=0, reverse=True
        )
        np.testing.assert_array_equal(np.asarray(t).T, np.asarray(plain))


def test_suffix_compose_transposed_sequential_oracle():
    rng = np.random.default_rng(2)
    B, K = 384, 3
    maps_np = rng.integers(0, K, size=(B, K)).astype(np.int32)
    r = suffix_compose_scan_t(jnp.asarray(maps_np).T)
    want = np.empty_like(maps_np)
    acc = np.arange(K)
    for b in range(B - 1, -1, -1):
        acc = maps_np[b][acc]
        want[b] = acc
    np.testing.assert_array_equal(np.asarray(r).T, want)
