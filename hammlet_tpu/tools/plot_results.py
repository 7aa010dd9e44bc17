"""Panel plots of HaMMLET results (reference: bin/plotResults).

Usage:
  hammlet-plot-results -f DATAFILE -o PREFIX [-s PANELS] [-O OUTPNG]

PANELS is a string of panel letters (default "DMS" of those available):
  D = data (colored by max-marginal state when marginals exist)
  M = posterior state marginals
  S = sampled state sequences heat map
  B = block sizes heat map
The record CSVs are looked up as PREFIX{marginals,sequences,blocks}.csv.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from hammlet_tpu.pyhammlet import (
    readBlockSizes,
    readCompressedStateSequences,
    readMarginals,
)
from hammlet_tpu.pyhammlet import plotting as plg


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    args = {}
    i = 0
    while i < len(argv):
        if argv[i].startswith("-") and i + 1 < len(argv):
            args[argv[i]] = argv[i + 1]
            i += 2
        else:
            i += 1
    if not args or "-h" in args:
        print(__doc__)
        return 0
    datafile = args.get("-f")
    prefix = args.get("-o", "hammlet-")
    out = args.get("-O", prefix + "plot.png")
    suffix = args.get("-x", ".csv")

    panels = []
    marg = seqs = blocks = data = None
    if datafile and os.path.exists(datafile):
        data = np.loadtxt(datafile, dtype=float)
    if os.path.exists(prefix + "marginals" + suffix):
        marg = readMarginals(prefix + "marginals" + suffix)
    if os.path.exists(prefix + "sequences" + suffix):
        seqs = readCompressedStateSequences(prefix + "sequences" + suffix)
    if os.path.exists(prefix + "blocks" + suffix):
        blocks = readBlockSizes(prefix + "blocks" + suffix)

    spec = args.get("-s")
    if spec is None:
        spec = ""
        spec += "D" if data is not None else ""
        spec += "M" if marg is not None else ""
        spec += "S" if seqs else ""
        spec += "B" if blocks is not None else ""
    panels = [p for p in spec if p in "DMSB"]
    if not panels:
        print("nothing to plot", file=sys.stderr)
        return 1

    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(
        len(panels), 1, figsize=(12, 2.4 * len(panels)), sharex=True
    )
    if len(panels) == 1:
        axes = [axes]
    for ax, p in zip(axes, panels):
        if p == "D" and data is not None:
            states = marg.argmax().decompress() if marg is not None else None
            plg.plotData(ax, data, states)
        elif p == "M" and marg is not None:
            plg.plotMarginals(ax, marg)
        elif p == "S" and seqs:
            plg.plotSequences(ax, seqs)
        elif p == "B" and blocks is not None:
            plg.plotBlockSizes(ax, blocks)
    axes[-1].set_xlabel("position")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
