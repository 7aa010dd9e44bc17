"""Genome-scale bounded host memory, end to end and deterministic.

Drives benchmarks/genome_scale.py twice per leg: the first child run warms
the persistent compilation cache (/tmp/jax_cache), the second is the
measured run — so the RSS assertion sees a deterministic warm-cache
process instead of whatever compile arenas a cold cache happens to grow
(the round-2 flat budget flaked exactly that way).

Budget model, measured on this harness (8-device CPU mesh, warm cache):
peak RSS = 0.46 GB baseline + 64 B/position (counts 12 + prefix 8 + rank
structure 8 + boundary byte = 29 inherent device bytes/position, the rest
ingest/record transients). The guard uses 0.6 GB + 70 B/position: ~15
B/position of slack, so any reintroduced O(T) float64 monolith with even
one copy (>= 16 B/position) trips it at the default T = 16M, and a single
bare 8 B/position monolith trips it at HAMMLET_BIG_T >= 64M (2 GB at the
250M validation scale vs the fixed ~0.2-1.6 GB headroom).

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

BUDGET_BASE = 0.6e9
BUDGET_PER_POS = 70


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
    T = int(os.environ.get("HAMMLET_BIG_T", 16_000_000))
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
