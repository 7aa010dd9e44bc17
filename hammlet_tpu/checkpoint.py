"""Checkpoint / resume for sampling runs.

The reference has no recovery mechanism: a crash loses everything because
marginals flush only in the Records destructor (Records.hpp:99-120,
SURVEY.md §5). Here the complete sampler state — RNG counter, model iterate,
marginal count buffers, boundary union, capacity, scheme position — is a
small set of arrays, saved as a single .npz (portable, no framework
dependency) every k sweeps or on demand. Restoring reproduces the exact
continuation: per-sweep keys are fold_in(master, counter), so the resumed
chain is bit-identical to an uninterrupted run.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from hammlet_tpu.models.hmm import HMMState
from hammlet_tpu.samplers.sweep import RecordBuffers


def save_checkpoint(engine, path: str) -> None:
    """Serialize an Engine's resumable state atomically."""
    state = {
        "seed": np.int64(engine.seed),
        "sweep_counter": np.int64(engine.sweep_counter),
        "sweeps_completed": np.int64(engine.sweeps_completed),
        "capacity": np.int64(engine.capacity),
        "dynamic": np.bool_(engine._dynamic),
        "static_threshold": np.asarray(engine._static_threshold),
        "theta_mean": np.asarray(engine.model.theta_mean),
        "theta_var": np.asarray(engine.model.theta_var),
        "A": np.asarray(engine.model.A),
        "pi": np.asarray(engine.model.pi),
        "counts": np.asarray(engine.buffers.counts),
        "ever_boundary": np.asarray(engine.buffers.ever_boundary),
        "n_records": np.asarray(engine.buffers.n_records),
        "total_sweeps": np.float64(engine.total_sweeps),
    }
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, **state)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def restore_checkpoint(engine, path: str) -> None:
    """Load state saved by save_checkpoint into a freshly built Engine
    (same data/priors/spec/seed)."""
    z = np.load(path)
    if int(z["seed"]) != engine.seed:
        raise ValueError(
            f"checkpoint seed {int(z['seed'])} != engine seed {engine.seed}"
        )
    if z["counts"].shape != tuple(engine.buffers.counts.shape):
        raise ValueError("checkpoint shape mismatch (different data or model?)")
    engine.sweep_counter = int(z["sweep_counter"])
    engine.sweeps_completed = int(z.get("sweeps_completed", 0))
    engine.capacity = int(z["capacity"])
    engine._dynamic = bool(z["dynamic"])
    engine._static_threshold = jnp.float32(z["static_threshold"])
    engine.model = HMMState(
        jnp.asarray(z["theta_mean"]),
        jnp.asarray(z["theta_var"]),
        jnp.asarray(z["A"]),
        jnp.asarray(z["pi"]),
    )
    engine.buffers = RecordBuffers(
        jnp.asarray(z["counts"]),
        jnp.asarray(z["ever_boundary"]),
        jnp.asarray(z["n_records"]),
    )
    engine.total_sweeps = float(z["total_sweeps"])
