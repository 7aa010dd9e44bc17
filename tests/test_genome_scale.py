"""Genome-scale sharded run: bounded host memory end to end.

The previous ingest materialized float64 (T, dim, 2) monoliths (~48 GB at
3 Gbp). This drives benchmarks/genome_scale.py — data arrives through a
chunk provider, ingest is per-shard, marginals RLE-compact on device — and
asserts the peak RSS stays within a per-position budget that the monolithic
path could not meet. Scale T up with HAMMLET_BIG_T (250M validated)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_genome_scale_bounded_memory():
    T = int(os.environ.get("HAMMLET_BIG_T", 16_000_000))
    env = {
        **os.environ,
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "genome_scale.py"),
         "--T", str(T), "--devices", "8", "--scheme", "M 4 0 F 6 2"],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    # inherent device-buffer budget is ~29 B/position on a CPU mesh (counts
    # 12, prefix 8, rank structure 8, boundary byte); 70 B/position + a
    # fixed baseline leaves room for transients but not for any O(T)
    # float64 monolith (16 B/position each) plus their copies. The baseline
    # covers the interpreter + XLA compile arenas on a COLD compilation
    # cache (~1.5 GB observed when every program compiles in-process); the
    # per-position term is what detects monoliths at HAMMLET_BIG_T scale
    budget = 1.75e9 + 70 * T
    assert m["peak_rss_bytes"] < budget, (m["peak_rss_bytes"], budget)
    # the planted segmentation (1000-position segments) was recovered and
    # compacted: the RLE store is ~T/1000 rows, not T
    assert 0.5 * T / 1000 <= m["marginal_segments"] <= 3 * T / 1000
