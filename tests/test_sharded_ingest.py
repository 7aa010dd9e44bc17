"""Bounded-memory sharded ingest: bit-exactness vs the monolithic kernels.

The sharded decomposition of the maxlet transform / breakpoint weights /
prefix cells must reproduce the single-array results EXACTLY (the block
partition depends on float32 weight comparisons), while never touching more
than one shard of data at a time."""

import numpy as np
import jax
import pytest

from hammlet_tpu.golden import reference as gold
from hammlet_tpu.ops.blocks import build_prefix_stats
from hammlet_tpu.parallel.ingest import sharded_ingest
from hammlet_tpu.parallel.mesh import position_mesh
from hammlet_tpu.parallel.sharded import _local_r_with_edges


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return position_mesh(8)


def _blocky(T, dim=1, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, 4, size=(7, dim))
    out = []
    t = 0
    while t < T:
        n = min(int(rng.integers(30, 200)), T - t)
        out.append(rng.normal(means[rng.integers(0, 7)], 1.0, size=(n, dim)))
        t += n
    return np.concatenate(out).astype(np.float32)


@pytest.mark.parametrize(
    "T,dim,cell_bits,T_local,mult",
    [
        (2777, 1, 5, 384, 1.0),  # odd T, partial last shard
        (3000, 1, 4, 384, 1.0),
        (4096, 1, 6, 512, 1.0),  # exact power of two, full shards
        (2048, 2, 5, 256, 1.0),  # multivariate
        (911, 1, 4, 128, 2.5),  # prime T + weight multiplier
        (130, 1, 4, 512, 1.0),  # single active shard, tiny T
    ],
)
def test_weights_and_prefix_bitexact(mesh8, T, dim, cell_bits, T_local, mult):
    data = _blocky(T, dim=dim, seed=T)
    n_shards = 8
    cell = 1 << cell_bits

    max_slice = 0

    def provider(start, stop):
        nonlocal max_slice
        max_slice = max(max_slice, stop - start)
        return data[start:stop]

    ing = sharded_ingest(
        mesh8, provider, T, dim,
        T_local=T_local, cell_bits=cell_bits, weight_multiplier=mult,
    )
    assert max_slice <= T_local  # bounded host memory: one shard at a time

    # oracle: monolithic golden weights, padded, per-shard stable argsort
    w = gold.breakpoint_weights(gold.maxlet_transform(data))
    if mult != 1.0:
        w = w * np.float32(mult)
    T_pad = n_shards * T_local
    w_pad = np.full(T_pad, -np.inf, dtype=np.float32)
    w_pad[:T] = w
    w2 = w_pad.reshape(n_shards, T_local)
    order = np.argsort(-w2, axis=1, kind="stable")
    negw_ref = (-np.take_along_axis(w2, order, axis=1)).reshape(-1)

    np.testing.assert_array_equal(np.asarray(ing.negw), negw_ref)
    np.testing.assert_array_equal(
        np.asarray(ing.rank), order.astype(np.int32).reshape(-1)
    )

    # prefix pieces: bit-equal to the monolithic float64 build
    data_pad = np.zeros((T_pad, dim), dtype=np.float32)
    data_pad[:T] = data
    prefix = build_prefix_stats(data_pad, cell_bits)
    r_ref = _local_r_with_edges(
        np.asarray(prefix.r)[:T_pad], n_shards, T_local, cell
    )
    np.testing.assert_array_equal(np.asarray(ing.r), r_ref)
    np.testing.assert_array_equal(np.asarray(ing.q2_hi), np.asarray(prefix.q2_hi))
    np.testing.assert_array_equal(np.asarray(ing.q2_lo), np.asarray(prefix.q2_lo))

    # noise: same estimator up to f64 partial-sum association
    noise_ref = gold.noise_std_estimate(gold.maxlet_transform(data))
    assert abs(ing.noise_std - noise_ref) <= 1e-12 * max(abs(noise_ref), 1.0)


def test_autoprior_block_means_match_host(mesh8):
    from hammlet_tpu.models.autopriors import nig_autoprior, autoprior_host

    T, dim = 3000, 1
    data = _blocky(T, dim=dim, seed=42)
    ing = sharded_ingest(mesh8, data, T_local=384, cell_bits=5)
    S, S2, n = ing.block_means
    mean = S / n
    var = S2 / n - mean * mean
    got = nig_autoprior(0.2, 0.9, float(mean), float(var))

    w = gold.breakpoint_weights(gold.maxlet_transform(data))
    want = autoprior_host(0.2, 0.9, data, w, ing.noise_std)
    np.testing.assert_allclose(got, want, rtol=1e-6)
