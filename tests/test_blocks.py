"""Block extraction and O(1) block sufficient statistics."""

import numpy as np
import jax.numpy as jnp
import pytest

from hammlet_tpu.golden import reference as gold
from hammlet_tpu.ops.blocks import (
    CELL,
    block_sufficient_stats,
    build_prefix_stats,
    make_blocks,
)


def _setup(T, dim=1, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(0, 2, size=(T, dim)).astype(np.float32)
    w = gold.breakpoint_weights(gold.maxlet_transform(data))
    return data, w


@pytest.mark.parametrize("T", [10, 100, 1000, 5000])
def test_block_boundaries_match_golden(T):
    data, w = _setup(T, seed=T)
    for thr in [0.1, 1.0, 2.5, 100.0]:
        want = gold.block_starts(w, thr)
        blocks = make_blocks(jnp.asarray(w), jnp.float32(thr), capacity=T)
        nb = int(blocks.n_blocks)
        got = np.asarray(blocks.starts)[:nb]
        np.testing.assert_array_equal(got, want)
        # padding
        assert (np.asarray(blocks.starts)[nb:] == T).all()
        assert (np.asarray(blocks.sizes)[nb:] == 0).all()
        assert np.asarray(blocks.sizes)[:nb].sum() == T


@pytest.mark.parametrize("T,dim", [(100, 1), (1000, 2), (5000, 1)])
def test_block_stats_accurate(T, dim):
    data, w = _setup(T, dim, seed=T + dim)
    prefix = build_prefix_stats(data)
    blocks = make_blocks(jnp.asarray(w), jnp.float32(1.5), capacity=T)
    nb = int(blocks.n_blocks)
    starts = np.asarray(blocks.starts)[:nb]
    want_sum, want_sumsq, want_n = gold.block_stats(data, starts)
    got = np.asarray(block_sufficient_stats(prefix, blocks))
    np.testing.assert_allclose(got[:nb, :, 0], want_sum, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(got[:nb, :, 1], want_sumsq, rtol=1e-5, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(blocks.sizes)[:nb], want_n)
    # padded blocks contribute exactly zero
    assert (got[nb:] == 0).all()


def test_block_stats_cross_cell():
    """Blocks spanning cell boundaries (the reference's CELLSIZE logic)."""
    T = CELL * 2 + 1234
    rng = np.random.default_rng(42)
    data = rng.normal(1, 1, size=(T, 1)).astype(np.float32)
    prefix = build_prefix_stats(data)
    # construct a weights vector with breakpoints straddling cells
    w = np.zeros(T, dtype=np.float32)
    starts_true = [0, 5, CELL - 3, CELL + 7, 2 * CELL - 1, 2 * CELL + 100, T - 2]
    w[starts_true] = np.inf
    blocks = make_blocks(jnp.asarray(w), jnp.float32(1.0), capacity=16)
    nb = int(blocks.n_blocks)
    assert nb == len(starts_true)
    want_sum, want_sumsq, want_n = gold.block_stats(
        data, np.array(starts_true)
    )
    got = np.asarray(block_sufficient_stats(prefix, blocks))
    np.testing.assert_allclose(got[:nb, :, 0], want_sum, rtol=1e-6, atol=2e-2)
    np.testing.assert_allclose(got[:nb, :, 1], want_sumsq, rtol=1e-6, atol=2e-1)


def test_capacity_overflow_detectable():
    T = 64
    w = np.full(T, np.inf, dtype=np.float32)  # every position is a boundary
    blocks = make_blocks(jnp.asarray(w), jnp.float32(1.0), capacity=16)
    assert int(blocks.n_blocks) == T  # count is correct even when truncated


def test_ranked_blocks_match_masked():
    from hammlet_tpu.ops.blocks import build_ranked_weights, make_blocks_ranked

    data, w = _setup(3000, seed=77)
    ranked = build_ranked_weights(w)
    for thr in [0.05, 0.7, 1.3, 2.9, 50.0, float(w[137])]:  # incl. exact tie
        a = make_blocks(jnp.asarray(w), jnp.float32(thr), capacity=3000)
        b = make_blocks_ranked(ranked, jnp.float32(thr), capacity=3000)
        assert int(a.n_blocks) == int(b.n_blocks)
        np.testing.assert_array_equal(np.asarray(a.starts), np.asarray(b.starts))
        np.testing.assert_array_equal(np.asarray(a.sizes), np.asarray(b.sizes))


def test_splittable_block_sizes():
    """split_block_sizes mirrors Blocks<Splittable>::split (the reference's
    unwired splittable structure): block i -> (size-s, s) in place."""
    import pytest

    from hammlet_tpu.ops.blocks import blocks_from_sizes, split_block_sizes

    sizes = [8, 16, 4]
    refined = split_block_sizes(sizes, 1, 6)
    assert refined == [8, 10, 6, 4]
    b = blocks_from_sizes(refined)
    assert int(b.n_blocks) == 4
    assert np.asarray(b.starts).tolist() == [0, 8, 18, 24]
    with pytest.raises(ValueError):
        split_block_sizes(sizes, 2, 4)
