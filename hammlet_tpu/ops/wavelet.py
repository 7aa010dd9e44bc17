"""Haar maxlet transform and breakpoint weights as batch JAX kernels.

The reference computes these with a streaming stack in one sequential pass
(reference: src/wavelet.hpp:98-188 and :68-93). On TPU the same quantities are
computed as log2(T) data-parallel levels of pairwise float32 ops, which
reproduces the streaming version's pairwise-dyadic summation order *exactly*
(bit-exact float32), because both perform the identical tree of adds.

Semantics:
- ``maxlet_transform(data)``: coeffs[t] = max over dims of
  (1/sqrt(2))^level * |sum_L - sum_R| for the unique Haar wavelet whose
  central discontinuity is at t (level = ctz(t)+1). Positions whose wavelet
  support is not fully contained in [0, T), and position 0, are +inf.
- ``breakpoint_weights(coeffs)``: w[t] = max |coeff| over all wavelets with
  any discontinuity (center or support edge) at t, via top-down dyadic
  max-propagation; trailing positions whose sibling lies beyond T are +inf.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_SQRT2HALF = np.float32(np.float32(np.sqrt(np.float64(2.0))) / np.float32(2.0))


def _level_normalizers(n_levels: int) -> list[np.float32]:
    """(1/sqrt2)^level computed by repeated float32 multiplication, matching
    the reference's running `normalizer *= sqrt2half` (wavelet.hpp:172)."""
    norms = []
    norm = _SQRT2HALF
    for _ in range(n_levels):
        norms.append(norm)
        norm = np.float32(norm * _SQRT2HALF)
    return norms


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxlet_transform(data: jax.Array, interpret: bool = False) -> jax.Array:
    """data: (T,) or (T, dim) float32 -> coeffs (T,) float32."""
    if data.ndim == 1:
        data = data[:, None]
    T = data.shape[0]
    coeffs = jnp.full((T,), jnp.inf, dtype=jnp.float32)
    n_levels = max(1, T.bit_length() - 1) if T > 0 else 0
    norms = _level_normalizers(n_levels + 1)
    sums = data.astype(jnp.float32)
    level = 1
    while sums.shape[0] >= 2:
        n_pairs = sums.shape[0] // 2
        left = sums[0 : 2 * n_pairs : 2]
        right = sums[1 : 2 * n_pairs : 2]
        detail = jnp.max(norms[level - 1] * jnp.abs(left - right), axis=1)
        # node a covers [a*2^l, (a+1)*2^l); after tail-dropping every kept
        # node is complete, and its coefficient index a*2^l + 2^(l-1) < T
        idx = (np.arange(n_pairs) << level) + (1 << (level - 1))
        coeffs = coeffs.at[idx].set(detail)
        sums = left + right  # pairwise-dyadic float32 adds (exact ref order)
        level += 1
    coeffs = coeffs.at[0].set(jnp.inf)
    return coeffs


@jax.jit
def breakpoint_weights(coeffs: jax.Array) -> jax.Array:
    """coeffs: (T,) float32 maxlet transform -> breakpoint weights (T,).

    Top-down propagation: at each dyadic level (interval I, node centers at
    odd multiples of I), the node's coefficient is max-propagated onto both
    support edges (even multiples of I). All ops are exact max/compares, so
    the result is bit-identical to the reference's in-place loop.
    """
    T = coeffs.shape[0]
    w = coeffs
    p = 1
    while p < T:
        p *= 2
    interval = p // 2
    while interval >= 1:
        I2 = 2 * interval
        m = w[interval::I2]  # node centers (odd multiples of I), length nm
        nm = m.shape[0]
        L = w[::I2]  # support edges (even multiples of I), length nL
        nL = L.shape[0]
        if nm == 0:
            interval //= 2
            continue
        # cond[k]: right support edge (2k+2)*I of node k lies inside [0, T)
        k = np.arange(nm)
        cond = ((2 * k + 2) * interval) < T
        condj = jnp.asarray(cond)
        # left-edge contribution: position 2k*I receives m[k]
        left_contrib = jnp.full((nL,), -jnp.inf, dtype=w.dtype).at[:nm].set(m)
        # right-edge contribution: position (2k+2)*I is L-index k+1 and
        # receives m[k] when cond[k] (cond guarantees k+1 < nL)
        right_vals = jnp.where(condj, m, -jnp.inf)
        nr = min(nm, nL - 1)
        right_contrib = (
            jnp.full((nL,), -jnp.inf, dtype=w.dtype).at[1 : 1 + nr].set(right_vals[:nr])
        )
        # nodes with no right edge force their left edge (and themselves) inf
        inf_contrib = (
            jnp.full((nL,), -jnp.inf, dtype=w.dtype)
            .at[:nm]
            .set(jnp.where(condj, -jnp.inf, jnp.inf))
        )
        newL = jnp.maximum(jnp.maximum(L, left_contrib), jnp.maximum(right_contrib, inf_contrib))
        new_m = jnp.where(condj, m, jnp.inf)
        w = w.at[::I2].set(newL).at[interval::I2].set(new_m)
        interval //= 2
    return w
