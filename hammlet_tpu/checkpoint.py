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
        "n_boundaries": np.asarray(engine.buffers.n_boundaries),
        "total_sweeps": np.float64(engine.total_sweeps),
        "scheme_op_index": np.int64(engine.scheme_op_index),
        "scheme_op_done": np.int64(engine.scheme_op_done),
        # the -i token list the scheme cursor indexes (resume rejects a
        # mismatch: the cursor would skip/truncate the wrong ops)
        "scheme_tokens": np.str_(
            " ".join(getattr(engine, "ckpt_scheme_tokens", None) or [])
        ),
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


def _restore_scheme_tokens(engine, z) -> None:
    if "scheme_tokens" in getattr(z, "files", []):
        s = str(z["scheme_tokens"])
        engine.ckpt_scheme_tokens = s.split(" ") if s else None


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
    engine._static_threshold = float(z["static_threshold"])
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
        jnp.asarray(z["n_boundaries"])
        if "n_boundaries" in z.files
        else jnp.int32(int(z["ever_boundary"].sum())),
    )
    # total_sweeps/sample_time are process-local throughput counters and are
    # intentionally NOT restored (a resumed process reports its own rate)
    engine.scheme_op_index = int(z["scheme_op_index"]) if "scheme_op_index" in z.files else 0
    engine.scheme_op_done = int(z["scheme_op_done"]) if "scheme_op_done" in z.files else 0
    _restore_scheme_tokens(engine, z)


def _fetch_global(engine, x) -> np.ndarray:
    """Host copy of a possibly process-spanning sharded array."""
    from hammlet_tpu.parallel.sharded import _replicated_fetch

    return _replicated_fetch(engine.mesh, x)


def save_sharded_checkpoint(engine, path: str) -> None:
    """Serialize a ShardedEngine's resumable state (marginal counts are
    gathered to host; restore re-shards them over the engine's mesh). The
    gather is a collective: in a multi-host run EVERY process must call this
    at the same point (configure the same checkpoint_every on all ranks,
    with a rank-local path — any rank's file can seed the resume)."""
    state = {
        "seed": np.int64(engine.seed),
        "n_shards": np.int64(engine.n_shards),
        "sweep_counter": np.int64(engine.sweep_counter),
        "sweeps_completed": np.int64(engine.sweeps_completed),
        "cap_local": np.int64(engine.cap_local),
        "dynamic": np.bool_(engine._dynamic),
        "static_threshold": np.asarray(engine._static_threshold),
        "theta_mean": np.asarray(engine.model.theta_mean),
        "theta_var": np.asarray(engine.model.theta_var),
        "A": np.asarray(engine.model.A),
        "pi": np.asarray(engine.model.pi),
        "counts": _fetch_global(engine, engine.counts),
        "everb": _fetch_global(engine, engine.everb),
        "n_rec": np.asarray(engine.n_rec),
        "n_bound": np.asarray(engine.n_bound),
        "total_sweeps": np.float64(engine.total_sweeps),
        "scheme_op_index": np.int64(engine.scheme_op_index),
        "scheme_op_done": np.int64(engine.scheme_op_done),
        "scheme_tokens": np.str_(
            " ".join(getattr(engine, "ckpt_scheme_tokens", None) or [])
        ),
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


def restore_sharded_checkpoint(engine, path: str) -> None:
    """Load state saved by save_sharded_checkpoint into a freshly built
    ShardedEngine (same data/priors/spec/seed/mesh size)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hammlet_tpu.parallel.mesh import POS_AXIS

    z = np.load(path)
    if int(z["seed"]) != engine.seed:
        raise ValueError(
            f"checkpoint seed {int(z['seed'])} != engine seed {engine.seed}"
        )
    if int(z["n_shards"]) != engine.n_shards:
        raise ValueError(
            f"checkpoint has {int(z['n_shards'])} shards, engine has "
            f"{engine.n_shards} (resume on the same mesh size)"
        )
    if z["counts"].shape != tuple(engine.counts.shape):
        raise ValueError("checkpoint shape mismatch (different data or model?)")
    shard = NamedSharding(engine.mesh, P(POS_AXIS))
    engine.sweep_counter = int(z["sweep_counter"])
    engine.sweeps_completed = int(z["sweeps_completed"])
    engine.cap_local = int(z["cap_local"])
    engine._dynamic = bool(z["dynamic"])
    engine._static_threshold = float(z["static_threshold"])
    engine.model = HMMState(
        jnp.asarray(z["theta_mean"]),
        jnp.asarray(z["theta_var"]),
        jnp.asarray(z["A"]),
        jnp.asarray(z["pi"]),
    )
    engine.counts = jax.device_put(jnp.asarray(z["counts"]), shard)
    engine.everb = jax.device_put(jnp.asarray(z["everb"]), shard)
    engine.n_rec = jnp.asarray(z["n_rec"])
    engine.n_bound = (
        jnp.asarray(z["n_bound"])
        if "n_bound" in z.files
        else jnp.int32(int(z["everb"].sum()))
    )
    engine.scheme_op_index = int(z["scheme_op_index"])
    engine.scheme_op_done = int(z["scheme_op_done"])
    _restore_scheme_tokens(engine, z)
