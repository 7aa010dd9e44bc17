"""Mixture (burn-in) state sampling: per-block independent categorical draws.

Replaces src/StateSequence/Mixture.hpp:31-144. Transitions and the initial
distribution are ignored; each block's state is drawn from the softmax of its
emission log-weights via the Gumbel-max trick — one fully parallel pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hammlet_tpu.models.distributions import emission_log_weights


def mixture_sample_states(
    key: jax.Array,
    block_stats: jax.Array,
    sizes: jax.Array,
    n_blocks: jax.Array,
    theta_mean: jax.Array,
    theta_var: jax.Array,
    mapping: jax.Array,
) -> jax.Array:
    """(B,) int32 per-block states (padded blocks get state 0; mask later)."""
    log_e = emission_log_weights(block_stats, sizes, theta_mean, theta_var, mapping)
    B, K = log_e.shape
    gumbel = jax.random.gumbel(key, (B, K), dtype=jnp.float32)
    states = jnp.argmax(log_e + gumbel, axis=1).astype(jnp.int32)
    return jnp.where(jnp.arange(B) < n_blocks, states, 0)
