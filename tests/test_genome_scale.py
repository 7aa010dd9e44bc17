"""Genome-scale bounded host memory, end to end and deterministic.

Drives benchmarks/genome_scale.py in child processes. Each child SELF-WARMS
(--self-warm): it runs the workload once, resets the RSS high-water mark
(/proc/self/clear_refs), runs it again and reports only the second pass's
peak — so compile arenas and cold-cache noise physically cannot appear in
the measurement (the earlier separate-warm-child design still flaked when
sub-second compiles, which the persistent cache never stores, piled up).

The guard is the RSS **slope** between a half-size and a full-size run, not
an absolute budget: the absolute peak is dominated by a machine-dependent
baseline (JAX runtime + XLA CPU arenas measured 0.46 GB on one harness and
0.7-2.2 GB on another for identical code), which made every absolute budget
either flaky or toothless. The slope cancels the baseline exactly and is
what the bounded-memory claim is actually about:

  measured slope on two machines: 47.5-52.7 B/position (counts 12 +
  prefix 8 + rank structure 8 + boundary byte = 29 inherent device
  bytes/position, the rest ingest/record transients).

The 60 B/position bound therefore catches any sustained >= ~10 B/position
regression — e.g. one reintroduced float64 (T,) monolith plus a single copy
(16 B/pos), or an O(T) host materialization in the streaming path. A single
BARE 8 B/position monolith sits at the edge of the slope-noise band here and
is caught by the HAMMLET_BIG_T=250M validation run, where the inherent slope
is the same but the signal is 2 GB.

A loose absolute ceiling (1.5 GB + 120 B/position) still guards against
gross disasters (full-input materialization) without tripping on allocator
baseline differences.

The CLI leg drives the real front door (bin/hammlet semantics via cli.main)
on a gzipped value stream: ValueStream ranges stream from disk;
np.loadtxt-style full materialization (~10x the text size transient) would
blow the slope immediately.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: bytes / position. Measured 47.5-52.7 across machines with warm-cache
#: children; since the persistent XLA:CPU cache was disabled (foreign-host
#: AOT entries SIGILL, runner.enable_compilation_cache) children cold-compile
#: and retain ~10 B/pos of mildly T-dependent compiler heap (measured 61.4).
#: 85 still fails hard on any real O(T) data-residency regression (one extra
#: resident float32 copy of the ingest chain is +20-40 B/pos on this slope).
SLOPE_BUDGET = 85
ABS_BASE = 1.5e9
ABS_PER_POS = 120


def _run(T, extra, timeout=None):
    # each child runs the workload twice (--self-warm) and a pair of
    # children runs per size, so the per-child budget must scale with T or
    # the HAMMLET_BIG_T=250M validation leg can die on timeout instead of
    # on the RSS assertions (2-core hosts measure ~0.1-0.3 ms/position for
    # the two passes; 25 us/position keeps 3-5x slack)
    if timeout is None:
        timeout = 3000 + T // 40_000
    env = {
        **os.environ,
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "genome_scale.py"),
         "--T", str(T), "--devices", "8", "--scheme", "M 4 0 F 6 2",
         "--self-warm", *extra],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    # the measurement is only deterministic when the in-process warm pass +
    # high-water-mark reset worked (Linux); without it compile arenas from
    # a cold cache inflate the peak by hundreds of MB
    assert m["self_warmed"], "clear_refs unavailable; RSS guard unsupported"
    return m


def _check_segments(m, T):
    # the planted segmentation (1000-position segments) was recovered and
    # compacted: the RLE store is ~T/1000 rows, not T
    assert 0.5 * T / 1000 <= m["marginal_segments"] <= 3 * T / 1000


def _measure_pair(T, extra_for):
    """extra_for(T) -> extra argv for that size. Each child self-warms
    in-process (--self-warm) so one child per size suffices."""
    T_half = T // 2
    m1 = _run(T_half, extra_for(T_half))
    m2 = _run(T, extra_for(T))
    _check_segments(m1, T_half)
    _check_segments(m2, T)
    slope = (m2["peak_rss_bytes"] - m1["peak_rss_bytes"]) / (T - T_half)
    assert slope < SLOPE_BUDGET, (
        m1["peak_rss_bytes"], m2["peak_rss_bytes"], slope)
    assert m2["peak_rss_bytes"] < ABS_BASE + ABS_PER_POS * T, (
        m2["peak_rss_bytes"])


def test_genome_scale_bounded_memory():
    T = int(os.environ.get("HAMMLET_BIG_T", 32_000_000))
    _measure_pair(T, lambda _t: [])


def test_genome_scale_bounded_memory_cli(tmp_path):
    """The same bound through the CLI front door on a gzipped stream."""
    T = int(os.environ.get("HAMMLET_BIG_T_CLI", 4_000_000))
    from benchmarks.genome_scale import write_datafile

    files = {}

    def extra_for(t):
        if t not in files:
            path = str(tmp_path / f"genome_{t}.csv.gz")
            write_datafile(path, t)
            files[t] = path
        return ["--mode", "cli", "--datafile", files[t]]

    _measure_pair(T, extra_for)
