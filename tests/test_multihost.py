"""Process-spanning mesh: a real 2-process jax.distributed run on CPU,
driven through the REAL CLI front door with a SHARED output prefix.

Two subprocesses each own 4 of 8 global devices and run the same
`hammlet -f data.csv.gz -D 8 -o shared- .csv ...` command: ingest streams
only the process-local shards' token ranges, only the primary process
opens/writes files (there is no '-w' and the outputs do not pre-exist, so
a second writer racing on the same paths could not slip through silently),
and the shared outputs must be byte-identical to the same CLI command run
on a single-process 8-device mesh (the global SPMD computation is the same
program either way — only the transport differs)."""

import gzip
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCHEME = "M 10 0 F 10 0 F 20 2".split()
STREAMS = ("marginals", "parameters", "compression")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cli_shared_prefix_matches_single_process(tmp_path):
    from hammlet_tpu.parallel.mh_worker import synth

    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",
    }
    T = 3000
    data = synth(T)
    datafile = str(tmp_path / "data.csv.gz")
    with gzip.open(datafile, "wt") as fh:
        fh.write("\n".join(f"{v:.6f}" for v in data))

    shared = str(tmp_path / "mh-")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "hammlet_tpu.parallel.mh_worker",
             str(pid), "2", str(port), datafile, shared, "4", *SCHEME],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    assert any("primary=True" in log for log in logs)
    assert any("primary=False" in log for log in logs)

    # single-process 8-device CLI run of the same command -> same bytes
    sp_env = {**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    sp = str(tmp_path / "sp-")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "hammlet"),
         "-f", datafile, "-s", "3", "-a", "-R", "5", "-D", "8",
         "-o", sp, ".csv", "-O", *STREAMS, "-i", *SCHEME],
        env=sp_env, capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    for stream in STREAMS:
        mh = (tmp_path / f"mh-{stream}.csv").read_text()
        spf = (tmp_path / f"sp-{stream}.csv").read_text()
        assert mh == spf, f"{stream}: multi-process differs from single-process"


def test_non_primary_records_opens_no_files(tmp_path):
    """Records(write=False) is an inert participant: same enabled set (so
    every rank takes identical record-fetching code paths) but no files."""
    from hammlet_tpu.io.records import Records

    rec = Records(
        100, str(tmp_path / "np-"), ".csv", 3,
        outputs={"marginals", "sequences", "blocks", "parameters",
                 "compression", "segments"},
        write=False,
    )
    assert rec.wants_block_level()
    rec.record_sweep(np.zeros(4, np.int32), np.full(4, 25, np.int32), 4)
    rec.record_theta(np.zeros(3), np.ones(3))
    rec.save_marginals_from_segments(
        np.array([0, 50]), np.array([[5, 0, 0], [0, 5, 0]])
    )
    rec.close()
    assert list(tmp_path.iterdir()) == []


def test_two_process_kill_and_resume(tmp_path):
    """Cross-process checkpoint/resume: SIGKILL a 2-process run mid-phase
    after a checkpoint landed, rerun the identical command, and the final
    marginals must be byte-identical to an uninterrupted 2-process run.

    Both ranks checkpoint to the SAME path: the sharded checkpoint gathers
    globally-replicated content, both ranks reach the save at the same
    sweep (the gather is a collective), and the atomic os.replace leaves
    either generation complete — so both ranks always restore the same
    sweep cursor even if the kill lands between the two ranks' writes."""
    import time

    import numpy as np

    from hammlet_tpu.parallel.mh_worker import synth

    T = 3000
    data = synth(T)
    datafile = str(tmp_path / "data.csv.gz")
    with gzip.open(datafile, "wt") as fh:
        fh.write("\n".join(f"{v:.6f}" for v in data))

    scheme = "M 8 0 F 200 4".split()
    base_env = {
        **os.environ,
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",
        # small compiled chunks so checkpoints land mid-phase
        "HAMMLET_PHASE_CHUNK": "8",
    }

    def launch(prefix, extra, port):
        return [
            subprocess.Popen(
                [sys.executable, "-m", "hammlet_tpu.parallel.mh_worker",
                 str(pid), "2", str(port), datafile, prefix, "4", *scheme],
                env={**base_env, "HAMMLET_MH_EXTRA": extra},
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for pid in range(2)
        ]

    # uninterrupted baseline
    procs = launch(str(tmp_path / "base-"), "-w", _free_port())
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    baseline = (tmp_path / "base-marginals.csv").read_bytes()

    # run to kill: shared checkpoint every 8 sweeps
    ck = tmp_path / "shared.ckpt"
    extra = f"-w -C {ck} 8"
    procs = launch(str(tmp_path / "kr-"), extra, _free_port())
    deadline = time.time() + 480
    killed = False
    while time.time() < deadline:
        if all(p.poll() is not None for p in procs):
            break  # finished before we could kill (counts as a failure below)
        if ck.exists():
            try:
                sc = int(np.load(ck)["sweeps_completed"])
            except Exception:  # mid-replace read; retry
                sc = 0
            if 16 <= sc <= 150:  # mid-F-phase, well before completion
                for p in procs:
                    p.kill()
                killed = True
                break
        time.sleep(0.05)
    assert killed, "run finished before a mid-phase checkpoint was observed"
    for p in procs:
        p.wait(timeout=60)
        assert p.returncode != 0  # really died from the kill
    sc_at_kill = int(np.load(ck)["sweeps_completed"])

    # identical command again: both ranks restore the shared checkpoint
    procs = launch(str(tmp_path / "kr-"), extra, _free_port())
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    assert any(f"primary=True" in log for log in logs)

    resumed = (tmp_path / "kr-marginals.csv").read_bytes()
    assert resumed == baseline, (
        f"marginals diverged after kill at sweep {sc_at_kill} + resume"
    )
