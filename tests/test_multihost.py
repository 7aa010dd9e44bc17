"""Process-spanning mesh: a real 2-process jax.distributed run on CPU.

Two subprocesses each own 4 of 8 global devices; every record stream they
produce must be byte-identical across ranks AND byte-identical to the same
scheme run on a single-process 8-device mesh (the global SPMD computation
is the same program either way — only the transport differs)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",
    }
    T = 3000
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "hammlet_tpu.parallel.mh_worker",
             str(pid), "2", str(port), str(tmp_path), str(T), "4"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    # every rank wrote the complete, identical output
    for stream in ("marginals", "parameters", "compression"):
        f0 = (tmp_path / f"rank0-{stream}.csv").read_text()
        f1 = (tmp_path / f"rank1-{stream}.csv").read_text()
        assert f0 == f1, f"{stream} differs between ranks"

    # single-process 8-device mesh, same data/scheme/seed -> same bytes
    from hammlet_tpu.io.records import Records
    from hammlet_tpu.parallel import make_sharded_engine, position_mesh
    from hammlet_tpu.parallel.mh_worker import synth

    data = synth(T)
    rec = Records(
        T, str(tmp_path / "sp-"), ".csv", 3,
        outputs={"marginals", "parameters", "compression"},
        overwrite=True,
    )
    eng = make_sharded_engine(
        data, mesh=position_mesh(8), nr_params=3, seed=5, records=rec
    )
    eng.run_scheme("M 10 0 F 10 0 F 20 2".split())
    eng.finalize()

    for stream in ("marginals", "parameters", "compression"):
        sp = (tmp_path / f"sp-{stream}.csv").read_text()
        mp = (tmp_path / f"rank0-{stream}.csv").read_text()
        assert sp == mp, f"{stream}: multi-process differs from single-process"
