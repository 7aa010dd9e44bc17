"""Input readers: whitespace-separated value streams, optionally gzipped.

Replaces the reference's istream ingest (wavelet.hpp:131, main.cpp:261-289):
values fill dimensions first, then positions. Multiple files are
concatenated. The native C++ fast reader (hammlet_tpu.native) is used when
built; this NumPy path is the portable fallback.
"""

from __future__ import annotations

import gzip
import io
import sys

import numpy as np


def _read_stream(fh) -> np.ndarray:
    return np.loadtxt(fh, dtype=np.float32).ravel()


def read_values(paths: list[str] | None, nr_dim: int = 1) -> np.ndarray:
    """Read values from files (or stdin if paths is falsy) -> (T, dim).

    Raises if the total value count is not a multiple of nr_dim
    (wavelet.hpp:179-181).
    """
    from hammlet_tpu import native

    chunks = []
    if paths:
        for p in paths:
            vals = native.parse_file(p) if native.available() else None
            if vals is not None:
                chunks.append(vals)
                continue
            opener = gzip.open if p.endswith(".gz") else open
            with opener(p, "rt") as fh:
                chunks.append(_read_stream(fh))
    else:
        chunks.append(_read_stream(io.StringIO(sys.stdin.read())))
    vals = np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.float32)
    if len(vals) % nr_dim != 0:
        raise ValueError(
            "Input stream did not contain enough values to fill all "
            "dimensions at last position!"
        )
    return vals.reshape(-1, nr_dim)
