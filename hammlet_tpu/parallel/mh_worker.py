"""One process of a multi-host sharded run (test/validation entry point).

Usage:
    python -m hammlet_tpu.parallel.mh_worker <process_id> <num_processes> \
        <port> <datafile> <outprefix> [local_devices] [scheme...]

Every process joins the jax.distributed coordination service and then runs
the REAL CLI front door (`hammlet_tpu.cli.main`) on the same input file
with the same SHARED output prefix: ingest streams only the process-local
shards' token ranges, and only the primary process opens/writes the output
files (Records write=is_primary()); tests/test_multihost.py compares the
shared outputs byte-for-byte against a single-process CLI run of the same
command."""

from __future__ import annotations

import os
import sys


def synth(T: int, seed: int = 7):
    import numpy as np

    rng = np.random.default_rng(seed)
    means = [0.0, 5.0, -5.0]
    out = []
    t = 0
    while t < T:
        n = min(int(rng.integers(120, 400)), T - t)
        s = int(rng.integers(0, 3))
        out.append(rng.normal(means[s], 1.0, size=n))
        t += n
    return np.concatenate(out).astype(np.float32)


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    datafile, outprefix = sys.argv[4], sys.argv[5]
    local = int(sys.argv[6]) if len(sys.argv) > 6 else 8 // nproc
    scheme = sys.argv[7:] or "M 10 0 F 10 0 F 20 2".split()

    os.environ["HAMMLET_COORDINATOR"] = f"localhost:{port}"
    os.environ["HAMMLET_NUM_PROCESSES"] = str(nproc)
    os.environ["HAMMLET_PROCESS_ID"] = str(pid)
    os.environ["HAMMLET_LOCAL_DEVICES"] = str(local)

    # extra CLI tokens (e.g. "-w -C {rank}-ck.npz 8" for the
    # kill-and-resume test); "{rank}" expands to this process id
    extra = os.environ.get("HAMMLET_MH_EXTRA", "").format(rank=pid).split()

    from hammlet_tpu.cli import main as cli_main

    rc = cli_main(
        ["-f", datafile, "-s", "3", "-a", "-R", "5", "-D", str(local * nproc),
         "-o", outprefix, ".csv",
         "-O", "marginals", "parameters", "compression", "-i", *scheme,
         *extra]
    )
    if rc != 0:
        raise SystemExit(rc)
    import jax

    print(
        f"rank {pid}: ok, primary={jax.process_index() == 0}", flush=True
    )


if __name__ == "__main__":
    main()
