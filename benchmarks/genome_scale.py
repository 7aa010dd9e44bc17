"""Genome-scale sharded run with bounded host memory.

Two modes:

- ``--mode provider`` (default): synthesizes chromosome-scale input through
  a chunk provider (the full data array NEVER exists in host memory),
  builds the position-sharded engine, runs a recorded sampling scheme,
  RLE-compacts the marginals on device.
- ``--mode cli --datafile F``: drives the REAL front door
  (``hammlet -f F -D N``) in-process — the ValueStream provider streams
  token ranges from disk, so the input file never materializes either.

Both report peak host RSS + throughput as one JSON line.

    JAX_PLATFORMS=cpu python benchmarks/genome_scale.py --T 250000000 \
        --devices 8 --scheme "M 10 0 F 20 2"

This is the workload the reference bounds with streaming ingest + an RLE
marginal store (wavelet.hpp:98-188, StateMarginals.hpp:20-21,
doc/hammlet-manpage.md:178 "100M points on a standard laptop").
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

MEANS = np.array([0.0, 5.0, -5.0], dtype=np.float64)
SEG = 1000  # positions per planted segment


def chunk(start: int, stop: int) -> np.ndarray:
    """Deterministic position-stable synthetic CNV-like data: piecewise
    constant segment means + bounded pseudo-noise (no RNG state, so any
    slice can be regenerated independently)."""
    pos = np.arange(start, stop, dtype=np.int64)
    seg = pos // SEG
    mean = MEANS[(seg * 2654435761) % 3]
    x = np.sin(pos * 12.9898 + 78.233) * 43758.5453
    noise = (x - np.floor(x)) - 0.5
    return (mean + noise).astype(np.float32)[:, None]


def write_datafile(path: str, T: int) -> None:
    """Write chunk(0, T) as a text value stream (gzipped iff path.gz)."""
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as fh:
        for lo in range(0, T, 1 << 20):
            vals = chunk(lo, min(lo + (1 << 20), T))[:, 0]
            fh.write("\n".join(f"{v:.5f}" for v in vals))
            fh.write("\n")


def _reset_peak_rss() -> bool:
    """Reset the process's RSS high-water mark (Linux clear_refs)."""
    try:
        with open("/proc/self/clear_refs", "w") as fh:
            fh.write("5")
        return True
    except OSError:  # pragma: no cover - non-Linux fallback
        return False


def _peak_rss_bytes() -> int:
    try:
        for line in open("/proc/self/status"):
            if line.startswith("VmHWM:"):
                return int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover - non-Linux fallback
        pass
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


def _run_workload(args, outdir: str) -> dict:
    t0 = time.time()
    if args.mode == "cli":
        import jax

        from hammlet_tpu.cli import main as cli_main

        n_dev = args.devices or jax.local_device_count()
        rc = cli_main(
            ["-f", args.datafile, "-s", "3", "-a", "-R", "0",
             "-D", str(n_dev), "-o", os.path.join(outdir, "g-"), ".csv",
             "-O", "marginals", "compression", "-w",
             "-i", *args.scheme.split()]
        )
        if rc != 0:
            raise SystemExit(rc)
        return {"devices": n_dev, "cli_s": round(time.time() - t0, 2)}

    from hammlet_tpu.io.records import Records
    from hammlet_tpu.parallel import make_sharded_engine, position_mesh

    rec = Records(
        args.T, os.path.join(outdir, "g-"), ".csv", 3,
        outputs={"marginals", "compression"}, overwrite=True,
    )
    eng = make_sharded_engine(
        chunk, mesh=position_mesh(args.devices), T=args.T, dim=1,
        nr_params=3, seed=0, records=rec,
    )
    t_ingest = time.time() - t0
    eng.run_scheme(args.scheme.split())
    t1 = time.time()
    eng.finalize()
    m = eng.metrics()
    return {
        "devices": eng.n_shards,
        "ingest_s": round(t_ingest, 2),
        "sweeps_per_second": round(m["sweeps_per_second"], 2),
        "positions_per_second": round(m["positions_per_second"], 0),
        "finalize_s": round(time.time() - t1, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=250_000_000)
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--scheme", default="M 6 0 F 10 2")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--mode", choices=["provider", "cli"], default="provider")
    ap.add_argument("--datafile", default=None,
                    help="cli mode: input value stream (use write_datafile)")
    ap.add_argument("--self-warm", action="store_true",
                    help="run the workload twice in-process and report the "
                    "RSS high-water mark of the SECOND pass only (reset via "
                    "/proc/self/clear_refs): first-pass compile arenas and "
                    "cold-cache noise cannot inflate the measurement")
    args = ap.parse_args()

    from hammlet_tpu.runner import enable_compilation_cache

    enable_compilation_cache()
    outdir = args.outdir or tempfile.mkdtemp(prefix="hammlet-genome-")

    warmed = False
    if args.self_warm:
        _run_workload(args, outdir)
        import gc

        gc.collect()
        warmed = _reset_peak_rss()
    metrics = _run_workload(args, outdir)

    n_seg = sum(1 for _ in open(os.path.join(outdir, "g-marginals.csv")))
    print(json.dumps({
        "T": args.T,
        "mode": args.mode,
        **metrics,
        "marginal_segments": n_seg,
        "peak_rss_bytes": _peak_rss_bytes(),
        "self_warmed": warmed,
        "outdir": outdir,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
