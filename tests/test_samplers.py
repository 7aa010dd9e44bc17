"""Sampler correctness: deterministic parts exactly, stochastic parts
statistically against the golden sequential implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hammlet_tpu.golden import reference as gold
from hammlet_tpu.models.distributions import nig_sample, nig_update
from hammlet_tpu.models.mapping import combinations_mapping
from hammlet_tpu.samplers.forward_backward import (
    fb_sample_states,
    forward_columns_t,
)
from hammlet_tpu.samplers.mixture import mixture_sample_states
from hammlet_tpu.samplers.sweep import accumulate_sweep_stats
from hammlet_tpu.models.distributions import emission_log_weights


def _toy_problem(B=12, K=3, dim=1, seed=0, pad=5):
    """Random block stats + model for a small HMM; returns padded arrays."""
    rng = np.random.default_rng(seed)
    N = rng.integers(1, 20, size=B)
    means_true = rng.choice([0.0, 3.0, -2.0], size=B)
    sums = np.zeros((B, dim))
    sumsqs = np.zeros((B, dim))
    for b in range(B):
        x = rng.normal(means_true[b], 1.0, size=(N[b], dim))
        sums[b] = x.sum(axis=0)
        sumsqs[b] = (x * x).sum(axis=0)
    theta_mean = np.array([-2.0, 0.0, 3.0], dtype=np.float32)[:K]
    theta_var = np.array([1.1, 0.9, 1.3], dtype=np.float32)[:K]
    A = rng.dirichlet(np.ones(K) * 2, size=K).astype(np.float32)
    pi = rng.dirichlet(np.ones(K)).astype(np.float32)
    mapping = combinations_mapping(dim, K)[:, :dim]
    # pad to capacity
    Bcap = B + pad
    stats = np.zeros((Bcap, dim, 2), dtype=np.float32)
    stats[:B, :, 0] = sums
    stats[:B, :, 1] = sumsqs
    sizes = np.zeros(Bcap, dtype=np.int32)
    sizes[:B] = N
    return dict(
        B=B, Bcap=Bcap, K=K, dim=dim, N=N, sums=sums, sumsqs=sumsqs,
        stats=stats, sizes=sizes, theta_mean=theta_mean, theta_var=theta_var,
        A=A, pi=pi, mapping=mapping,
    )


def test_nig_update_matches_golden():
    rng = np.random.default_rng(3)
    prior = np.abs(rng.normal(2, 1, size=(4, 4))).astype(np.float32) + 0.5
    sums = rng.normal(0, 50, size=4).astype(np.float32)
    counts = np.array([0, 5, 100, 10000], dtype=np.float32)
    sumsqs = (sums**2 / np.maximum(counts, 1) + counts * 1.7).astype(np.float32)
    got = np.asarray(nig_update(jnp.asarray(prior), jnp.asarray(sums), jnp.asarray(sumsqs), jnp.asarray(counts)))
    for p in range(4):
        want = gold.nig_posterior(prior[p], sums[p], sumsqs[p], counts[p])
        np.testing.assert_allclose(got[p], want, rtol=2e-6)


def test_nig_sample_moments():
    key = jax.random.PRNGKey(0)
    n = 200_000
    params = jnp.tile(jnp.array([[5.0, 8.0, 1.5, 4.0]]), (n, 1))
    mean, var = nig_sample(key, params)
    # E[var] = beta/(alpha-1) = 2 ; Var(mean|var) = var/nu
    assert abs(float(jnp.mean(var)) - 2.0) < 0.05
    assert abs(float(jnp.mean(mean)) - 1.5) < 0.01
    assert abs(float(jnp.var(mean)) - 2.0 / 4.0) < 0.05


@pytest.mark.parametrize("use_self", [True, False])
def test_forward_columns_match_golden(use_self):
    """The production transposed-layout forward filter matches the golden
    sequential recursion (the untransposed twin was removed; golden tests
    target the (K, B) path the engines actually run)."""
    from hammlet_tpu.models.distributions import emission_log_weights_t

    p = _toy_problem(seed=11)
    log_e_t = emission_log_weights_t(
        jnp.transpose(jnp.asarray(p["stats"]), (1, 2, 0)),
        jnp.asarray(p["sizes"]),
        jnp.asarray(p["theta_mean"]), jnp.asarray(p["theta_var"]),
        jnp.asarray(p["mapping"]),
    )
    cols_t, last = forward_columns_t(
        log_e_t, jnp.asarray(p["sizes"]), jnp.int32(p["B"]),
        jnp.asarray(p["A"]), jnp.asarray(p["pi"]), use_self,
    )
    want_cols, want_last = gold.fb_forward_columns(
        p["sums"], p["sumsqs"], p["N"], p["theta_mean"], p["theta_var"],
        p["A"], p["pi"], p["mapping"], use_self,
    )
    got_cols = np.asarray(cols_t).T[: p["B"]]
    # golden columns are normalized pre-scaling; ours are too -> same scale
    np.testing.assert_allclose(got_cols, want_cols, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last), want_last, rtol=2e-4, atol=1e-6)


def test_fb_sampler_distribution_matches_golden():
    """Marginal per-block state frequencies of the parallel sampler match the
    sequential golden sampler within Monte-Carlo error."""
    p = _toy_problem(B=10, K=3, seed=5)
    n_draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(42), n_draws)
    sample = jax.jit(
        lambda k: fb_sample_states(
            k, jnp.transpose(jnp.asarray(p["stats"]), (1, 2, 0)),
            jnp.asarray(p["sizes"]),
            jnp.int32(p["B"]), jnp.asarray(p["theta_mean"]),
            jnp.asarray(p["theta_var"]), jnp.asarray(p["A"]),
            jnp.asarray(p["pi"]), jnp.asarray(p["mapping"]), True,
        )
    )
    ours = np.asarray(jax.vmap(sample)(keys))[:, : p["B"]]

    rng = np.random.default_rng(7)
    theirs = np.stack(
        [
            gold.fb_gibbs_sweep(
                p["sums"], p["sumsqs"], p["N"], p["theta_mean"],
                p["theta_var"], p["A"], p["pi"], p["mapping"], rng, True,
            )
            for _ in range(n_draws)
        ]
    )
    for b in range(p["B"]):
        f_ours = np.bincount(ours[:, b], minlength=3) / n_draws
        f_theirs = np.bincount(theirs[:, b], minlength=3) / n_draws
        se = np.sqrt(np.maximum(f_theirs * (1 - f_theirs), 1e-4) / n_draws)
        assert np.all(np.abs(f_ours - f_theirs) < 6 * se + 0.01), (
            b, f_ours, f_theirs)


def test_mixture_sampler_frequencies():
    p = _toy_problem(B=6, K=3, seed=9)
    log_e = np.asarray(
        emission_log_weights(
            jnp.asarray(p["stats"]), jnp.asarray(p["sizes"]),
            jnp.asarray(p["theta_mean"]), jnp.asarray(p["theta_var"]),
            jnp.asarray(p["mapping"]),
        )
    )[: p["B"]]
    probs = np.exp(log_e - log_e.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    n_draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), n_draws)
    sample = jax.jit(
        lambda k: mixture_sample_states(
            k, jnp.transpose(jnp.asarray(p["stats"]), (1, 2, 0)),
            jnp.asarray(p["sizes"]),
            jnp.int32(p["B"]), jnp.asarray(p["theta_mean"]),
            jnp.asarray(p["theta_var"]), jnp.asarray(p["mapping"]),
        )
    )
    draws = np.asarray(jax.vmap(sample)(keys))[:, : p["B"]]
    for b in range(p["B"]):
        f = np.bincount(draws[:, b], minlength=3) / n_draws
        se = np.sqrt(np.maximum(probs[b] * (1 - probs[b]), 1e-4) / n_draws)
        assert np.all(np.abs(f - probs[b]) < 6 * se + 0.01), (b, f, probs[b])


def test_accumulate_sweep_stats_matches_golden():
    p = _toy_problem(B=9, K=3, seed=13)
    rng = np.random.default_rng(0)
    states_real = rng.integers(0, 3, size=p["B"])
    states = np.zeros(p["Bcap"], dtype=np.int32)
    states[: p["B"]] = states_real
    states[p["B"]:] = 2  # garbage in padding must be ignored
    stats = accumulate_sweep_stats(
        jnp.asarray(states), jnp.asarray(p["sizes"]), jnp.int32(p["B"]),
        jnp.transpose(jnp.asarray(p["stats"]), (1, 2, 0)),
        jnp.asarray(p["mapping"]), 3,
    )
    want_counts, want_trans = gold.accumulate_counts(states_real, p["N"], 3)
    np.testing.assert_allclose(np.asarray(stats.state_counts), want_counts)
    np.testing.assert_allclose(np.asarray(stats.trans_counts), want_trans)
    # theta stats: dim=1 so param p gets sums of blocks with state s=p
    for s in range(3):
        mask = states_real == s
        np.testing.assert_allclose(
            float(stats.theta_sums[s]), p["sums"][mask].sum(), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(stats.theta_counts[s]), p["N"][mask].sum(), rtol=1e-6
        )


def test_gamma_fixed_tries_moments():
    """The fixed-depth Marsaglia-Tsang sampler matches Gamma(a, 1) moments
    across the alpha regimes the model update uses (Dirichlet pseudo-counts
    ~0.5, posterior counts in the thousands)."""
    import jax
    import jax.numpy as jnp

    from hammlet_tpu.models.distributions import gamma_fixed_tries

    n = 200_000
    # alphas up to ~1e7 cover posterior Dirichlet/InvGamma counts at WGS
    # scale, where the naive float32 acceptance statistic loses all
    # significance (the stable log1p expansion keeps it O(1))
    for i, a in enumerate([0.5, 1.0, 3.5, 120.0, 5e4, 1e7]):
        key = jax.random.PRNGKey(100 + i)
        g = np.asarray(
            gamma_fixed_tries(key, jnp.full((n,), a, jnp.float32))
        ).astype(np.float64)
        assert (g > 0).all()
        # mean = a, var = a; ~4 sigma tolerances
        se_mean = np.sqrt(a / n)
        assert abs(g.mean() - a) < 5 * se_mean, (a, g.mean())
        assert abs(g.var() - a) / a < 0.05, (a, g.var())


def test_beta_geometric_family():
    """Beta/Geometric conjugate family (capability parity with the
    reference's unwired Geometric emission layer)."""
    from hammlet_tpu.models.distributions import (
        beta_sample,
        beta_threshold_value,
        beta_update,
        geometric_log_weights,
    )

    prior = jnp.array([[2.0, 3.0], [1.0, 1.0]])
    post = beta_update(prior, jnp.array([10.0, 0.0]), jnp.array([4, 0]))
    np.testing.assert_allclose(np.asarray(post), [[6.0, 13.0], [1.0, 1.0]])

    key = jax.random.PRNGKey(0)
    draws = beta_sample(key, jnp.tile(jnp.array([[20.0, 10.0]]), (100000, 1)))
    assert abs(float(draws.mean()) - 2 / 3) < 0.01  # E[Beta(20,10)] = 2/3

    lw = geometric_log_weights(
        jnp.array([5.0, 0.0]), jnp.array([3, 1]), jnp.array([0.5])
    )
    np.testing.assert_allclose(
        np.asarray(lw[:, 0]), [5 * 0.5 - 3 * np.log(0.5), -np.log(0.5)],
        rtol=1e-6,
    )
    assert abs(float(beta_threshold_value(jnp.array([0.5, 0.25]))) - 2.0) < 1e-6


def test_threshold_host_matches_device():
    """threshold_host is the engines' capacity-sizing mirror of the device
    HMMState.threshold; the two formulas must stay in lockstep (they were
    previously duplicated inline in runner/sharded, ADVICE r3)."""
    from hammlet_tpu.models.hmm import HMMState, threshold_host

    for T, var in [(100, [0.3, 1.7, 0.9]), (4_000_000, [2.5]), (7, [1e-6, 4.0])]:
        m = HMMState(
            theta_mean=jnp.zeros(len(var)),
            theta_var=jnp.asarray(var, jnp.float32),
            A=jnp.eye(2),
            pi=jnp.ones(2) / 2,
        )
        dev = float(m.threshold(T))
        host = threshold_host(np.asarray(var, np.float32), T)
        assert abs(dev - host) <= 1e-6 * max(dev, 1.0), (T, var, dev, host)
