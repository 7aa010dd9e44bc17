"""Genome-scale bounded host memory, end to end and deterministic.

Drives benchmarks/genome_scale.py twice per leg: the first child run warms
the persistent compilation cache (/tmp/jax_cache), the second is the
measured run — so the RSS assertion sees a deterministic warm-cache
process instead of whatever compile arenas a cold cache happens to grow
(the round-2 flat budget flaked exactly that way).

Budget model, measured on this harness (8-device CPU mesh, warm cache):
peak RSS = 0.46 GB baseline + 49 B/position (counts 12 + prefix 8 + rank
structure 8 + boundary byte = 29 inherent device bytes/position, the rest
ingest/record transients; 16M -> 1.24 GB, 32M -> 2.02 GB). The guard uses
0.8 GB + 55 B/position: at the default T = 32M the headroom is ~0.54 GB,
so any sustained >= 17 B/position regression — e.g. one float64 monolith
plus a single copy — trips it; a single BARE 8 B/position monolith is
below the default headroom and is caught by the HAMMLET_BIG_T=250M
validation run (2 GB signal vs ~1.8 GB headroom there, since the per-
position slack is only 6 B).

The CLI leg drives the real front door (bin/hammlet semantics via
cli.main) on a gzipped value stream: ValueStream ranges stream from disk,
np.loadtxt-style full materialization (~10x the text size transient) would
blow the same budget.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUDGET_BASE = 0.8e9
BUDGET_PER_POS = 55


def _run(T, extra, timeout=3000):
    env = {
        **os.environ,
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "genome_scale.py"),
         "--T", str(T), "--devices", "8", "--scheme", "M 4 0 F 6 2", *extra],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def _check(m, T):
    budget = BUDGET_BASE + BUDGET_PER_POS * T
    assert m["peak_rss_bytes"] < budget, (m["peak_rss_bytes"], budget)
    # the planted segmentation (1000-position segments) was recovered and
    # compacted: the RLE store is ~T/1000 rows, not T
    assert 0.5 * T / 1000 <= m["marginal_segments"] <= 3 * T / 1000


def test_genome_scale_bounded_memory():
    T = int(os.environ.get("HAMMLET_BIG_T", 32_000_000))
    _run(T, [])  # warm the compilation cache; RSS not asserted
    _check(_run(T, []), T)


def test_genome_scale_bounded_memory_cli(tmp_path):
    """The same bound through the CLI front door on a gzipped stream."""
    T = int(os.environ.get("HAMMLET_BIG_T_CLI", 4_000_000))
    datafile = str(tmp_path / "genome.csv.gz")
    from benchmarks.genome_scale import write_datafile

    write_datafile(datafile, T)
    args = ["--mode", "cli", "--datafile", datafile]
    _run(T, args)  # warm
    _check(_run(T, args), T)
