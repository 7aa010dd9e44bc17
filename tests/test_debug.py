"""HAMMLET_DEBUG invariant checks: injected numerics bugs fail loudly.

The reference throws runtime_error on non-finite parameters
(Observation.hpp:374-392) and on the save-time marginal-sum invariant
(StateMarginals.hpp:306-308); inside jitted sweeps those guards become a
compiled error bitmask surfaced at the chunk sync (hammlet_tpu.debug)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hammlet_tpu.debug import check_marginal_sums
from hammlet_tpu.models.hmm import HMMState
from hammlet_tpu.parallel import make_sharded_engine, position_mesh
from hammlet_tpu.runner import make_engine


def synth(T=1500, seed=0):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [rng.normal(0, 1, T // 2), rng.normal(5, 1, T - T // 2)]
    ).astype(np.float32)


def _poison(model, field, value):
    d = {f: getattr(model, f) for f in model._fields}
    d[field] = d[field].at[0].set(value)
    return HMMState(**d)


def test_nan_theta_fails_loudly():
    eng = make_engine(synth(), nr_params=2, seed=1)
    eng.run("F", 2, 0)  # healthy sweeps pass
    eng.model = _poison(eng.model, "theta_mean", jnp.nan)
    with pytest.raises(FloatingPointError, match="emission mean"):
        eng.run("F", 2, 0)


def test_nonpositive_variance_fails_loudly():
    eng = make_engine(synth(), nr_params=2, seed=1)
    eng.model = _poison(eng.model, "theta_var", -1.0)
    # a negative variance makes the threshold NaN -> downstream non-finite
    with pytest.raises(FloatingPointError):
        eng.run("F", 2, 0)


def test_sharded_nan_fails_loudly():
    eng = make_sharded_engine(
        synth(), mesh=position_mesh(8), nr_params=2, seed=1
    )
    eng.run("F", 2, 0)
    eng.model = jax.device_put(_poison(eng.model, "theta_mean", jnp.nan))
    with pytest.raises(FloatingPointError, match="emission mean"):
        eng.run("F", 2, 0)


def test_marginal_sum_invariant():
    ok = np.full((5, 3), 4)  # rows sum to 12
    check_marginal_sums(ok, 12)
    bad = ok.copy()
    bad[2, 1] += 1
    with pytest.raises(RuntimeError, match="does not match number of iterations"):
        check_marginal_sums(bad, 12)
