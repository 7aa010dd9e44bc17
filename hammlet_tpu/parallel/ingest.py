"""Bounded-memory sharded ingest for the position-sharded engine.

The reference streams its ingest in one pass with O(dim * log T) extra
memory (src/wavelet.hpp:98-188); the previous sharded path here materialized
float64 (T, dim, 2) monoliths on the host (~48 GB at 3 Gbp). This module
rebuilds the same arrays SHARD BY SHARD, so peak host memory is
O(T_local * dim) regardless of T, and each finished piece is placed directly
on its device. Nothing global ever exists on the host except O(T / 2^cell)
per-cell summaries.

The Haar maxlet transform and breakpoint weights decompose exactly across
cell-aligned shards (T_local is a multiple of the cell size 2^c):

- maxlet levels 1..c are shard-local (every merge span lies inside one
  shard); the level-c partial sums are exactly the per-cell dyadic totals,
  so levels > c run once on the tiny (n_cells, dim) array of gathered cell
  totals and write coefficients only at cell-start positions.
- breakpoint-weight propagation at intervals >= 2^c touches only cell-start
  positions, so it runs on the subsampled (n_cells,) array (the index/guard
  arithmetic is scale-invariant: ceilPow2(T)/2^c == ceilPow2(ceil(T/2^c))).
  Sub-cell intervals touch cell interiors plus one max-contribution per
  level into the NEXT shard's first position — a single scalar halo per
  shard, applied after the local pass (cell-start values never propagate
  further down, they only accumulate maxima).

Both facts make every per-position output bit-identical to the monolithic
kernels in ops/wavelet.py (tested in tests/test_sharded_ingest.py).

The prefix-sum cells (ops/blocks.py convention) are likewise built per
shard: float64 in-cell reverse cumsums rounded to float32 once, per-cell
float64 totals kept for the exact cross-cell prefix. The auto-prior block
means (AutoPriors.hpp:86-107) accumulate streaming across shards with a
(sum, count) carry for the block spanning a shard edge.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hammlet_tpu.parallel.mesh import POS_AXIS

F32 = np.float32
INF = np.float32(np.inf)
_SQRT2HALF = np.float32(np.float32(np.sqrt(np.float64(2.0))) / np.float32(2.0))


def _ceil_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _local_maxlet(data: np.ndarray, cell_bits: int):
    """Maxlet levels 1..cell_bits for one shard slice (bit-exact float32,
    reference pairwise-dyadic order, src/wavelet.hpp:131-173).

    Returns (coeffs, cell_sums): coeffs (L,) float32 with +inf at positions
    this pass does not own (cell starts and incomplete spans); cell_sums
    (floor(L / 2^cell_bits), dim) float32 level-c dyadic partial sums of the
    complete cells."""
    data = np.asarray(data, dtype=F32)
    if data.ndim == 1:
        data = data[:, None]
    L, dim = data.shape
    coeffs = np.full(L, INF, dtype=F32)
    sums = data.copy()
    level = 1
    normalizer = _SQRT2HALF
    while sums.shape[0] >= 2 and level <= cell_bits:
        n_pairs = sums.shape[0] // 2
        left = sums[0 : 2 * n_pairs : 2]
        right = sums[1 : 2 * n_pairs : 2]
        detail = np.max(
            np.float32(normalizer) * np.abs(left - right), axis=1
        ).astype(F32)
        idx = (np.arange(n_pairs) << level) + (1 << (level - 1))
        coeffs[idx] = detail
        sums = (left + right).astype(F32)
        level += 1
        normalizer = F32(normalizer * _SQRT2HALF)
    n_cells_full = L >> cell_bits
    if sums.shape[0] > n_cells_full:
        sums = sums[:n_cells_full]
    elif sums.shape[0] < n_cells_full:  # pragma: no cover - cannot happen
        raise AssertionError("lost complete cells in local maxlet")
    return coeffs, sums


def _top_maxlet(cell_sums: np.ndarray, n_cells: int, cell_bits: int) -> np.ndarray:
    """Maxlet levels > cell_bits on the complete-cell dyadic totals.

    Returns (n_cells,) float32: the coefficient value at each cell-START
    position (cell index k -> position k * 2^cell_bits); +inf where the
    global transform leaves +inf (cell 0, incomplete spans)."""
    cw = np.full(n_cells, INF, dtype=F32)
    # normalizer chain continues from the local passes: global level
    # cell_bits + l uses (1/sqrt2)^(cell_bits + l) via repeated f32 mult
    normalizer = _SQRT2HALF
    for _ in range(cell_bits):
        normalizer = F32(normalizer * _SQRT2HALF)
    sums = np.asarray(cell_sums, dtype=F32)
    level = 1  # in cell units
    while sums.shape[0] >= 2:
        n_pairs = sums.shape[0] // 2
        left = sums[0 : 2 * n_pairs : 2]
        right = sums[1 : 2 * n_pairs : 2]
        detail = np.max(
            np.float32(normalizer) * np.abs(left - right), axis=1
        ).astype(F32)
        idx = (np.arange(n_pairs) << level) + (1 << (level - 1))
        cw[idx] = detail
        sums = (left + right).astype(F32)
        level += 1
        normalizer = F32(normalizer * _SQRT2HALF)
    return cw


def _cell_weights(cell_coeffs: np.ndarray, T: int, cell_bits: int) -> np.ndarray:
    """Breakpoint-weight propagation at intervals >= 2^cell_bits, run on the
    subsampled cell-start array (wavelet.hpp:78-92 with T -> ceil(T/2^c);
    the in-range guard (2k+2)*I < T is invariant under the rescale because
    every compared index is a multiple of 2^c)."""
    w = np.asarray(cell_coeffs, dtype=F32).copy()
    size = len(w)
    interval = _ceil_pow2(size) // 2
    while interval >= 1:
        idx = np.arange(interval, size, 2 * interval)
        if idx.size:
            m = w[idx]
            Lp = idx - interval
            Rp = idx + interval
            ok = Rp < size
            tgt = Rp[ok]
            w[tgt] = np.maximum(w[tgt], m[ok])
            bad = ~ok
            w[Lp[bad]] = INF
            w[idx[bad]] = INF
            w[Lp] = np.maximum(w[Lp], w[idx])
        interval //= 2
    return w


def _local_weight_pass(
    w: np.ndarray, shard_start: int, T: int, cell_bits: int
) -> float:
    """Sub-cell breakpoint-weight propagation for one shard slice, in place.

    ``w`` holds the shard's local coefficients with its cell-start entries
    already replaced by the final cell-level weights. All max-accumulations
    commute (inf absorbs), so running levels vectorized matches the
    reference's in-place sequential order exactly. Returns the halo: the
    max contribution this shard propagates into the NEXT shard's first
    position (right-edge writes landing exactly at the shard end)."""
    L = len(w)
    halo = -np.inf
    interval = min(1 << max(cell_bits - 1, 0), _ceil_pow2(max(T, 1)) // 2)
    if cell_bits == 0:
        return halo
    while interval >= 1:
        idx = np.arange(interval, L, 2 * interval)
        if idx.size:
            m = w[idx]
            Lp = idx - interval
            Rp = idx + interval
            cond = (shard_start + Rp) < T
            in_arr = cond & (Rp < L)
            tgt = Rp[in_arr]
            w[tgt] = np.maximum(w[tgt], m[in_arr])
            to_halo = cond & (Rp == L)
            if to_halo.any():
                halo = max(halo, float(m[to_halo][0]))
            bad = ~cond
            w[Lp[bad]] = INF
            w[idx[bad]] = INF
            w[Lp] = np.maximum(w[Lp], w[idx])
        interval //= 2
    return halo


def _cell_prefix(data: np.ndarray, T_local: int, cell_bits: int):
    """Per-shard prefix pieces (ops/blocks.py cell convention): float32
    in-cell reverse cumsums of (x, x^2) accumulated in float64, plus the
    float64 per-cell totals for the exact cross-cell prefix.

    Returns (r_local (T_local, dim, 2) f32, cell_tot (cells, dim, 2) f64)
    for the slice padded with zeros to T_local."""
    cell = 1 << cell_bits
    data = np.asarray(data, dtype=np.float64)
    if data.ndim == 1:
        data = data[:, None]
    L, dim = data.shape
    n_cells = T_local >> cell_bits
    r = np.zeros((T_local, dim, 2), dtype=np.float32)
    cell_tot = np.zeros((n_cells, dim, 2), dtype=np.float64)
    for c in range(n_cells):
        lo = c * cell
        if lo >= L:
            break
        hi = min(lo + cell, L)
        seg = data[lo:hi]
        st = np.stack([seg, seg * seg], axis=-1)  # (n, dim, 2) float64
        rc = np.cumsum(st[::-1], axis=0)[::-1]
        r[lo:hi] = rc.astype(np.float32)
        cell_tot[c] = rc[0]
    return r, cell_tot


@dataclass
class ShardedIngest:
    """Device-resident sharded ingest products (bounded host memory)."""

    negw: jax.Array  # (T_pad,) sharded: per-shard ascending sort of -weights
    rank: jax.Array  # (T_pad,) sharded: per-shard weight-rank -> local pos
    r: jax.Array  # (P*(T_local+1), dim, 2) sharded local R with edge rows
    q2_hi: jax.Array  # (n_cells_pad + 1, dim, 2) replicated
    q2_lo: jax.Array
    noise_std: float
    nb0: int  # boundary count at the universal threshold
    block_means: np.ndarray  # (n_blocks0 * dim,) block means at thr0
    T: int
    dim: int
    T_local: int
    cell_bits: int


def sharded_ingest(
    mesh,
    data: np.ndarray | Callable[[int, int], np.ndarray],
    T: int | None = None,
    dim: int | None = None,
    *,
    T_local: int,
    cell_bits: int,
    weight_multiplier: float = 1.0,
) -> ShardedIngest:
    """Shard-by-shard ingest: maxlet + breakpoint weights + prefix cells +
    noise estimate + auto-prior block means, never holding more than one
    shard of intermediates on the host.

    ``data`` is either the full (T, dim) float32 array (sliced by view, no
    copy) or a provider ``f(start, stop) -> (stop-start, dim) array`` (pass
    T and dim explicitly) so multi-terabase inputs stream from disk.
    """
    if callable(data):
        if T is None or dim is None:
            raise ValueError("T and dim are required with a data provider")
        provider = data
    else:
        arr = np.asarray(data, dtype=np.float32)
        if arr.ndim == 1:
            arr = arr[:, None]
        T, dim = arr.shape

        def provider(start: int, stop: int) -> np.ndarray:
            return arr[start:stop]

    cell = 1 << cell_bits
    if T_local % cell:
        raise ValueError("T_local must be a multiple of the cell size")
    devices = mesh.devices.reshape(-1)
    n_shards = len(devices)
    if n_shards * T_local < T:
        raise ValueError("T_local * n_shards must cover T")
    n_cells_pad = (n_shards * T_local) >> cell_bits
    n_cells = -(-T // cell)
    cells_per_shard = T_local >> cell_bits

    # ---- pass 1: local maxlet + prefix cells, one shard at a time --------
    coeffs_parts: list[np.ndarray] = []  # trimmed local coeffs, freed pass 2
    dyadic_parts: list[np.ndarray] = []
    cell_tot = np.zeros((n_cells_pad, dim, 2), dtype=np.float64)
    r_pieces: list[jax.Array] = []
    odd_sum = 0.0
    odd_cnt = 0
    for j in range(n_shards):
        start = j * T_local
        stop = min(start + T_local, T)
        if start >= T:
            coeffs_parts.append(np.zeros(0, dtype=F32))
            dyadic_parts.append(np.zeros((0, dim), dtype=F32))
            piece = np.zeros((T_local + 1, dim, 2), dtype=np.float32)
            r_pieces.append(jax.device_put(piece, devices[j]))
            continue
        d = provider(start, stop)
        coeffs, csums = _local_maxlet(d, cell_bits)
        coeffs_parts.append(coeffs)
        dyadic_parts.append(csums)
        # noise partials: odd local == odd global (T_local is even);
        # every odd position < T has a finite level-1 coefficient
        odd = coeffs[1::2]
        odd_sum += float(odd.astype(np.float64).sum())
        odd_cnt += len(odd)
        r_loc, ct = _cell_prefix(d, T_local, cell_bits)
        cell_tot[j * cells_per_shard : (j + 1) * cells_per_shard] = ct
        piece = np.zeros((T_local + 1, dim, 2), dtype=np.float32)
        piece[:T_local] = r_loc
        # extra right-edge row: R[shard_end] = full total of the next
        # shard's first cell (0 past the data)
        nstart = (j + 1) * T_local
        if nstart < T:
            nd = np.asarray(
                provider(nstart, min(nstart + cell, T)), dtype=np.float64
            )
            if nd.ndim == 1:
                nd = nd[:, None]
            piece[T_local, :, 0] = nd.sum(axis=0).astype(np.float32)
            piece[T_local, :, 1] = (nd * nd).sum(axis=0).astype(np.float32)
        r_pieces.append(jax.device_put(piece, devices[j]))
        del d, r_loc

    noise = (odd_sum / max(odd_cnt, 1)) / float(
        0.797884560802865355879892119868763736951717262329869315331
    )

    # ---- global cell-level structures (O(T / 2^c), tiny) -----------------
    q2 = np.zeros((n_cells_pad + 1, dim, 2), dtype=np.float64)
    np.cumsum(cell_tot, axis=0, out=q2[:n_cells_pad])
    q2[n_cells_pad] = q2[n_cells_pad - 1]
    q2_hi_h = q2.astype(np.float32)
    q2_lo_h = (q2 - q2_hi_h.astype(np.float64)).astype(np.float32)

    dyadic = (
        np.concatenate(dyadic_parts, axis=0)
        if dyadic_parts
        else np.zeros((0, dim), dtype=F32)
    )
    cell_coeffs = _top_maxlet(dyadic, n_cells, cell_bits)
    cw = _cell_weights(cell_coeffs, T, cell_bits)

    # ---- pass 2: local weight propagation + ranking + autoprior ----------
    thr = np.float32(np.sqrt(2.0 * np.log(float(T))) * noise)
    halo_prev = -np.inf
    negw_pieces: list[jax.Array] = []
    rank_pieces: list[jax.Array] = []
    nb0 = 0
    block_sums: list[np.ndarray] = []  # completed per-block (dim,) means
    carry_sum = np.zeros(dim, dtype=np.float64)
    carry_cnt = 0
    for j in range(n_shards):
        start = j * T_local
        stop = min(start + T_local, T)
        w = coeffs_parts[j]
        L = len(w)
        if L:
            cws = cw[j * cells_per_shard : j * cells_per_shard + (-(-L // cell))]
            w[:: cell][: len(cws)] = cws
            halo_out = _local_weight_pass(w, start, T, cell_bits)
            w[0] = np.maximum(w[0], np.float32(halo_prev))
            halo_prev = halo_out
            if weight_multiplier != 1.0:
                w = w * np.float32(weight_multiplier)
            # streaming auto-prior block stats at the universal threshold
            starts_loc = np.flatnonzero(w >= thr)
            nb0 += len(starts_loc)
            d64 = np.asarray(provider(start, stop), dtype=np.float64)
            if d64.ndim == 1:
                d64 = d64[:, None]
            if len(starts_loc) == 0:
                carry_sum += d64.sum(axis=0)
                carry_cnt += L
            else:
                s0 = starts_loc[0]
                if s0 > 0:
                    carry_sum += d64[:s0].sum(axis=0)
                    carry_cnt += int(s0)
                if carry_cnt > 0:
                    block_sums.append(carry_sum / carry_cnt)
                sums = np.add.reduceat(d64, starts_loc, axis=0)
                sizes = np.diff(np.concatenate([starts_loc, [L]]))
                for b in range(len(starts_loc) - 1):
                    block_sums.append(sums[b] / sizes[b])
                carry_sum = sums[-1].copy()
                carry_cnt = int(sizes[-1])
            del d64
        wfull = np.full(T_local, -INF, dtype=F32)
        wfull[:L] = w
        order = np.argsort(-wfull, kind="stable")
        negw_pieces.append(
            jax.device_put((-wfull[order]).astype(np.float32), devices[j])
        )
        rank_pieces.append(
            jax.device_put(order.astype(np.int32), devices[j])
        )
        coeffs_parts[j] = None  # free
    if carry_cnt > 0:
        block_sums.append(carry_sum / carry_cnt)

    block_means = (
        np.stack(block_sums).ravel() if block_sums else np.zeros(0)
    )

    # ---- assemble global sharded arrays -----------------------------------
    T_pad = n_shards * T_local
    shard = NamedSharding(mesh, P(POS_AXIS))
    rep = NamedSharding(mesh, P())
    negw = jax.make_array_from_single_device_arrays(
        (T_pad,), shard, negw_pieces
    )
    rank = jax.make_array_from_single_device_arrays(
        (T_pad,), shard, rank_pieces
    )
    r = jax.make_array_from_single_device_arrays(
        (n_shards * (T_local + 1), dim, 2), shard, r_pieces
    )
    q2_hi = jax.device_put(jnp.asarray(q2_hi_h), rep)
    q2_lo = jax.device_put(jnp.asarray(q2_lo_h), rep)

    return ShardedIngest(
        negw=negw,
        rank=rank,
        r=r,
        q2_hi=q2_hi,
        q2_lo=q2_lo,
        noise_std=float(noise),
        nb0=int(nb0),
        block_means=block_means,
        T=T,
        dim=dim,
        T_local=T_local,
        cell_bits=cell_bits,
    )
