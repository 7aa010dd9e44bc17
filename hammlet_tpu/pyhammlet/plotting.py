"""Plotting helpers for HaMMLET output (pyhammlet.plotting equivalent).

Matplotlib-based panel plots of data, posterior marginals, sampled state
sequences and block sizes, mirroring the reference's bin/pyhammlet/plotting.py
API surface.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import colors  # noqa: E402

from hammlet_tpu.pyhammlet.rle import RunLengthArray


def scaledImshow(ax, matrix: np.ndarray, max_pixels: int = 2_000_000, **kwargs):
    """imshow with horizontal downsampling for very long sequences."""
    T = matrix.shape[1]
    step = max(1, T // max_pixels)
    ax.imshow(
        matrix[:, ::step],
        aspect="auto",
        interpolation="nearest",
        extent=(0, T, matrix.shape[0], 0),
        **kwargs,
    )


def plotData(ax, data: np.ndarray, states: np.ndarray | None = None, palette="tab10"):
    """Scatter the raw data, optionally colored by a per-position state."""
    T = len(data)
    x = np.arange(T)
    if states is None:
        ax.plot(x, data, ",", color="0.3")
    else:
        cmap = plt.get_cmap(palette)
        ax.scatter(x, data, s=1, c=[cmap(int(s) % 10) for s in states])
    ax.set_xlim(0, T)
    ax.set_ylabel("data")


def plotMarginals(ax, marginals: RunLengthArray, palette="tab10"):
    """Stacked posterior state probabilities per position."""
    counts = marginals.values()
    sizes = marginals.blocksizes()
    probs = counts / np.maximum(counts.sum(axis=1, keepdims=True), 1)
    T = len(marginals)
    cmap = plt.get_cmap(palette)
    x = np.repeat(probs, sizes, axis=0)
    bottom = np.zeros(T)
    xs = np.arange(T)
    for s in range(probs.shape[1]):
        ax.fill_between(
            xs, bottom, bottom + x[:, s], color=cmap(s % 10), linewidth=0
        )
        bottom += x[:, s]
    ax.set_xlim(0, T)
    ax.set_ylim(0, 1)
    ax.set_ylabel("marginals")


def plotSequences(ax, sequences: list[RunLengthArray], palette="tab10"):
    """Heat-map of sampled state sequences (sweeps x positions)."""
    if not sequences:
        return
    T = len(sequences[0])
    mat = np.stack([s.decompress() for s in sequences])
    cmap = plt.get_cmap(palette)
    norm = colors.NoNorm()
    scaledImshow(ax, mat, cmap=cmap, norm=norm)
    ax.set_ylabel("sweeps")


def plotBlockSizes(ax, blocks: RunLengthArray):
    """Heat-map of log block sizes (positions x sweeps)."""
    mat = np.log1p(blocks.decompress().T.astype(float))
    scaledImshow(ax, mat, cmap="viridis")
    ax.set_ylabel("log block size")
