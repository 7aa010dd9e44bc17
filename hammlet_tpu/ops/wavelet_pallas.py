"""Pallas TPU kernel for the Haar maxlet transform.

The batch JAX implementation (ops/wavelet.py) materializes log2(T) level
arrays in HBM. This kernel computes all levels up to the chunk size in one
pass over the data held in VMEM: the grid walks 2^CHUNK_BITS-position chunks;
each program produces every chunk-local detail coefficient (levels 1..c are
always support-aligned inside a chunk) plus the chunk's total sums. The few
cross-chunk levels (> CHUNK_BITS) finish on the chunk totals with the
ordinary JAX path — they touch only T / 2^CHUNK_BITS values.

Kernel layout: all per-chunk arrays are fixed (1, chunk) lane vectors; the
level recursion uses lane rolls and index-mask selects only (no reshapes —
Mosaic cannot re-tile growing lane shapes).

Bit-exactness: identical pairwise-dyadic float32 adds and the identical
(1/sqrt2)^level normalizer chain as the reference's streaming transform
(src/wavelet.hpp:98-188); verified against the golden model in
tests/test_wavelet_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hammlet_tpu.ops.wavelet import _level_normalizers

CHUNK_BITS = 13  # 8192 positions per chunk


def _roll_right(x: jax.Array, shift: int) -> jax.Array:
    """Circular lane roll: out[0, t] = x[0, t - shift]."""
    return pltpu.roll(x, shift, axis=1)


def _maxlet_chunk_kernel(data_ref, coeffs_ref, totals_ref, *, chunk: int, dim: int):
    """One chunk: all detail coefficients at levels 1..CHUNK_BITS, plus the
    chunk's per-dim total sum (the level-CHUNK_BITS node value — needed by
    the cross-chunk levels, and already present in the recursion's last
    sums, so emitting it here saves a second padded pass over the data).

    data_ref:   (dim, chunk) VMEM (position axis on lanes)
    coeffs_ref: (chunk,) VMEM out
    totals_ref: (1, 1, dim) VMEM out

    Invariant per level l: sums_d[0, t] for t ≡ 0 (mod 2^(l-1)) holds the
    subtree sum of the level-(l-1) node starting at t (other lanes hold
    garbage that is never selected).
    """
    norms = _level_normalizers(CHUNK_BITS + 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    coeffs = jnp.full((1, chunk), jnp.inf, dtype=jnp.float32)
    sums = [data_ref[d : d + 1, :] for d in range(dim)]

    for level in range(1, CHUNK_BITS + 1):
        half = 1 << (level - 1)
        stride = 1 << level
        # target lanes: t ≡ half (mod 2^level) — the node's discontinuity.
        # left subtree sum arrives by rolling right; valid targets have
        # t - half >= 0, so the circular wrap never reaches a selected lane.
        mask = (idx & (stride - 1)) == half
        detail = None
        new_sums = []
        for d in range(dim):
            s = sums[d]
            left = _roll_right(s, half)  # left[t] = s[t - half]
            dd = norms[level - 1] * jnp.abs(left - s)
            detail = dd if detail is None else jnp.maximum(detail, dd)
            # node sum at t ≡ 0 (mod 2^level): s[t] + s[t + half]
            # (left roll by half == right roll by chunk - half)
            new_sums.append(s + _roll_right(s, chunk - half))
        coeffs = jnp.where(mask, detail, coeffs)
        sums = new_sums

    coeffs_ref[:] = coeffs.reshape(chunk)
    # vector store (Mosaic rejects scalar VMEM stores): lane-0 slice of each
    # dim's final sums, concatenated on lanes
    totals_ref[:] = jnp.concatenate(
        [sums[d][:, 0:1] for d in range(dim)], axis=1
    ).reshape(1, 1, dim)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxlet_transform_pallas(data: jax.Array, interpret: bool = False) -> jax.Array:
    """data: (T,) or (T, dim) float32 -> maxlet coefficients (T,) float32.

    Bit-identical to ops.wavelet.maxlet_transform / the reference streaming
    transform.
    """
    if data.ndim == 1:
        data = data[:, None]
    T, dim = data.shape
    chunk = 1 << CHUNK_BITS
    n_chunks = -(-T // chunk)
    Tp = n_chunks * chunk
    # layout rule: keep the LONG axis minor. The previous implementation
    # recomputed the chunk totals from (n_chunks, h, 2, dim)-shaped level
    # arrays whose tiny trailing dims tile-pad ~64-512x on TPU — at T=64M
    # the compile wanted 30.5 GB of HBM. The kernel already holds each
    # chunk's total in its last-level sums, so it emits them directly.
    data_t = jnp.pad(
        jnp.transpose(data.astype(jnp.float32)), ((0, 0), (0, Tp - T))
    )  # (dim, Tp): position axis on lanes

    coeffs, totals3 = pl.pallas_call(
        functools.partial(_maxlet_chunk_kernel, chunk=chunk, dim=dim),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((dim, chunk), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp,), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 1, dim), jnp.float32),
        ],
        interpret=interpret,
    )(data_t)
    totals = totals3.reshape(n_chunks, dim)

    # cross-chunk levels: run the level-wise pass on the chunk totals; node a
    # at total-level m corresponds to data level m + CHUNK_BITS and writes at
    # a*2^(m+c) + 2^(m+c-1)
    sums = totals
    norms = _level_normalizers(CHUNK_BITS + max(1, n_chunks).bit_length() + 1)
    level = CHUNK_BITS + 1
    while sums.shape[0] >= 2:
        n_pairs = sums.shape[0] // 2
        left = sums[0 : 2 * n_pairs : 2]
        right = sums[1 : 2 * n_pairs : 2]
        detail = jnp.max(norms[level - 1] * jnp.abs(left - right), axis=1)
        idx = (np.arange(n_pairs) << level) + (1 << (level - 1))
        coeffs = coeffs.at[idx].set(detail, mode="drop")
        sums = left + right
        level += 1

    # invalidate wavelets whose support is incomplete: index t holds the
    # level-(ctz(t)+1) wavelet; it is complete iff t + lowbit(t) <= T
    t = jnp.arange(Tp, dtype=jnp.int64) if Tp > 2**31 else jnp.arange(Tp, dtype=jnp.int32)
    lowbit = t & (-t)
    valid = (t + lowbit <= T) & (t > 0)
    coeffs = jnp.where(valid, coeffs, jnp.inf)
    return coeffs[:T]
