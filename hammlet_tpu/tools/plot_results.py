"""Plot the results from a HaMMLET run (bin/plotResults parity).

Reproduces the reference tool's CLI grammar (bin/plotResults:12-119):

  -f/--data-file PATH         emissions processed by HaMMLET
  -i/--input-pattern P S      record files are P{marginals,sequences,
                              blocks}S (default derived from -f)
  -o/--output-pattern P S     output files P<start>-<end>S (default: -i
                              pattern with the extension replaced by .png)
  -R/--range START END        positions to plot, [START, END)
  -D/--dimensionality N       data dimensions
  -d/--dimensions W H         figure size in inches
  -r/--resolution DPI
  -s/--subfigures DESC...     subfigure descriptors, each with EXACTLY one
                              capital letter (default: Ym Msp):
                                Y  data  (+m: colored by max-marginal state)
                                M  marginals (+s state-sorted | +f by
                                   frequency; +p probabilities | +c counts)
                                S  sampled state sequences heat map
                                B  block-size heat map
  -S/--split N                one output file per N positions
  -x/--xlabel STR, -y/--ylabels STR...
  -p/--palette PATH           one #RRGGBB per line; missing states black
  -c/--chunksize N            x-axis stretch for pre-averaged input
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Plot the results from a HaMMLET run.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-f", "--data-file", dest="datafile", default="sample.csv")
    p.add_argument("-i", "--input-pattern", dest="inPattern", nargs=2,
                   metavar=("PREFIX", "SUFFIX"), default=None)
    p.add_argument("-o", "--output-pattern", dest="outPattern", nargs=2,
                   metavar=("PREFIX", "SUFFIX"), default=None)
    p.add_argument("-R", "--range", dest="range", nargs=2, type=int,
                   default=[0, None], metavar=("START", "END"))
    p.add_argument("-D", "--dimensionality", dest="dimensionality",
                   type=int, default=1)
    p.add_argument("-d", "--dimensions", dest="dimensions", nargs=2,
                   type=float, default=(10, 10), metavar=("WIDTH", "HEIGHT"))
    p.add_argument("-r", "--resolution", dest="resolution", type=int,
                   default=300)
    p.add_argument("-s", "--subfigures", dest="subfigures", nargs="+",
                   default=["Ym", "Msp"])
    p.add_argument("-S", "--split", dest="splitsize", type=int, default=None)
    p.add_argument("-x", "--xlabel", dest="xlabel", default="Position")
    p.add_argument("-y", "--ylabels", dest="ylabels", nargs="+",
                   default=["Data", "Marginal probabilities"])
    p.add_argument("-p", "--palette", dest="palette", default=None)
    p.add_argument("-c", "--chunksize", dest="chunksize", type=int, default=1)
    return p


def main(argv=None) -> int:
    from hammlet_tpu.pyhammlet import io as pio
    from hammlet_tpu.pyhammlet import plotting as plg
    import matplotlib.pyplot as plt
    from matplotlib.cm import Greys_r
    from matplotlib.colors import LogNorm
    from matplotlib.ticker import MaxNLocator

    args = build_parser().parse_args(sys.argv[1:] if argv is None else argv)
    width, height = args.dimensions
    nr_figures = len(args.subfigures)
    if args.inPattern is None:
        pref, suff = os.path.splitext(args.datafile)
        args.inPattern = (pref + "-", suff)
    if args.outPattern is None:
        dotsplit = args.inPattern[1].split(".")
        if len(dotsplit) > 1:
            dotsplit = dotsplit[:-1]
        args.outPattern = [args.inPattern[0], ".".join(dotsplit) + ".png"]

    NR_DIM = args.dimensionality
    data = marginals = blocks = sequences = None
    state = {"T": None, "K": None, "I": None}

    def set_dim(key, val, what):
        if state[key] is not None and state[key] != val:
            raise SystemExit(
                f"Conflicting {what} detected: {state[key]}, {val}!"
            )
        state[key] = val

    compute_max_margins = False
    for desc in args.subfigures:
        if sum(1 for c in desc if c.isupper()) != 1:
            raise SystemExit(
                f'Invalid subfigure descriptor "{desc}", must contain '
                "exactly one capital letter!"
            )
        if "Y" in desc:
            if data is None:
                data = np.loadtxt(args.datafile).reshape(-1, NR_DIM)
                set_dim("T", len(data), "data sizes")
                nr_figures += NR_DIM - 1
            if "m" in desc:
                compute_max_margins = True
        elif "B" in desc:
            if blocks is None:
                fn = "%sblocks%s" % tuple(args.inPattern)
                blocks = pio.readBlockSizes(fn)
                set_dim("T", len(blocks), "data sizes")
                set_dim("I", blocks.shape[1], "number of iterations")
        elif "M" in desc:
            if marginals is None:
                fn = "%smarginals%s" % tuple(args.inPattern)
                marginals = pio.readMarginals(fn)
                set_dim("T", len(marginals), "data sizes")
                set_dim("K", marginals.shape[1], "number of states")
                set_dim(
                    "I", int(marginals.values()[0].sum()),
                    "number of iterations",
                )
        elif "S" in desc:
            if sequences is None:
                fn = "%ssequences%s" % tuple(args.inPattern)
                sequences = pio.readCompressedStateSequences(fn)
                set_dim("I", len(sequences), "number of iterations")
                if state["K"] is None and sequences:
                    state["K"] = 1 + max(
                        int(np.max(s.values())) for s in sequences
                    )
        else:
            raise SystemExit(f"Invalid subfigure descriptor: {desc}")
    T = state["T"]
    if T is None:
        raise SystemExit("Could not determine data size, input is incomplete!")

    cmap, norm = plg.load_palette(args.palette)

    max_margins = None
    if compute_max_margins:
        if marginals is None and sequences is None:
            raise SystemExit(
                "Need at least one of marginals and sequences to determine "
                "most common states."
            )
        if marginals is not None:
            max_margins = marginals.argmax().decompress()
        else:
            mats = np.stack([s.decompress() for s in sequences])
            max_margins = np.apply_along_axis(
                lambda col: np.bincount(col).argmax(), 0, mats
            )

    splitsize = args.splitsize if args.splitsize is not None else T
    r0, r1 = args.range
    if r1 is None:
        r1 = T
    start = max(0, r0)
    end = min(r1, start + splitsize)
    written = []
    while start < end:
        fig, axes = plt.subplots(
            nr_figures, figsize=(width, height), dpi=args.resolution,
            sharex=True, sharey=False, squeeze=False,
        )
        figfile = "%s%d-%d%s" % (
            args.outPattern[0], start, end - 1, args.outPattern[1],
        )
        f = 0
        for i, desc in enumerate(args.subfigures):
            plt.sca(axes[f, 0])
            ylab = args.ylabels[i] if i < len(args.ylabels) else None
            if desc == "B":
                cm = Greys_r
                cm.set_bad("k")
                cm.set_under("k")
                cm.set_over("k")
                plg.plotBlockSizes(
                    blocks, start=start, end=end, chunkSize=args.chunksize,
                    ylabel=ylab, cmap=cm, norm=LogNorm(vmin=1),
                )
            elif "Y" in desc:
                states = max_margins if "m" in desc else None
                for d in range(NR_DIM):
                    plt.sca(axes[f + d, 0])
                    plg.plotData(
                        data[:, d], states=states, start=start, end=end,
                        cmap=cmap if states is not None else None,
                        norm=norm if states is not None else None,
                        ylabel=ylab,
                    )
                f += NR_DIM - 1
            elif "M" in desc:
                if "s" in desc:
                    sort_states = True
                elif "f" in desc:
                    sort_states = False
                else:
                    raise SystemExit(
                        f"Unknown plotting type for marginals: {desc}!"
                    )
                if "p" in desc:
                    normalize = True
                elif "c" in desc:
                    normalize = False
                else:
                    raise SystemExit(
                        f"Unknown y-scaling for marginals: {desc}!"
                    )
                plg.plotMarginals(
                    marginals, start=start, end=end, cmap=cmap, norm=norm,
                    normalize=normalize, sort_states=sort_states, ylabel=ylab,
                )
            elif "S" in desc:
                plg.plotSequences(
                    sequences, start=start, end=end, nrStates=state["K"],
                    cmap=cmap, norm=norm, ylabel=ylab,
                )
            f += 1
        plt.xlabel(args.xlabel)
        for ax in axes.reshape(-1):
            # modern matplotlib chokes on nbins=0 from hidden shared axes
            nbins = max(len(ax.get_xticklabels()), 3)
            ax.yaxis.set_major_locator(MaxNLocator(nbins=nbins, prune="both"))
        fig.subplots_adjust(hspace=0)
        plt.savefig(figfile, bbox_inches="tight", dpi=args.resolution)
        plt.close()
        written.append(figfile)
        start = end
        end = min(start + splitsize, T, r1)
    for f in written:
        print(f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
