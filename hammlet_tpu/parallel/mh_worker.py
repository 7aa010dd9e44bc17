"""One process of a multi-host sharded run (test/validation entry point).

Usage:
    python -m hammlet_tpu.parallel.mh_worker <process_id> <num_processes> \
        <port> <outdir> [T] [local_devices]

Every process generates the same deterministic synthetic data, builds the
position-sharded engine over the process-spanning mesh (each process
ingests only the shards on its own devices), runs the same scheme, and
writes its own copy of the record streams to <outdir>/rank<i>-*.csv —
identical output on every rank proves the global computation is
rank-invariant; tests/test_multihost.py additionally compares it against
the single-process mesh byte for byte."""

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
    outdir = sys.argv[4]
    T = int(sys.argv[5]) if len(sys.argv) > 5 else 3000
    local = int(sys.argv[6]) if len(sys.argv) > 6 else 8 // nproc

    os.environ["HAMMLET_COORDINATOR"] = f"localhost:{port}"
    os.environ["HAMMLET_NUM_PROCESSES"] = str(nproc)
    os.environ["HAMMLET_PROCESS_ID"] = str(pid)
    os.environ["HAMMLET_LOCAL_DEVICES"] = str(local)

    from hammlet_tpu.parallel.distributed import initialize_from_env

    assert initialize_from_env()
    import jax

    assert jax.process_count() == nproc

    import numpy as np

    from hammlet_tpu.io.records import Records
    from hammlet_tpu.parallel import make_sharded_engine, position_mesh

    data = synth(T)
    rec = Records(
        T, os.path.join(outdir, f"rank{pid}-"), ".csv", 3,
        outputs={"marginals", "parameters", "compression"},
        overwrite=True,
    )
    eng = make_sharded_engine(
        data, mesh=position_mesh(), nr_params=3, seed=5, records=rec
    )
    eng.run_scheme("M 10 0 F 10 0 F 20 2".split())
    eng.finalize()
    print(f"rank {pid}: ok, {eng.metrics()['sweeps']} sweeps", flush=True)


if __name__ == "__main__":
    main()
