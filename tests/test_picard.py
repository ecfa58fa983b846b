"""Parallel-in-time (Picard) sampler: exactness vs the sequential sampler.

The Picard fixed point IS the sequential trajectory (the per-step noise is
pre-generated with the sequential sampler's exact key chain), so with
enough sweeps the two samplers must agree bit-close; with early stopping
they agree to the sweep tolerance."""
import numpy as np

import jax

from dynamicpdb_tpu.sampling.picard import picard_reverse_sample
from dynamicpdb_tpu.sampling.reverse import reverse_sample
from tests.test_sampler import setup  # noqa: F401  (module-scope fixture)


def test_picard_converges_to_sequential(setup):  # noqa: F811
    _, diffuser, model, feats, params = setup
    key = jax.random.PRNGKey(5)
    num_t = 6

    seq = jax.jit(lambda k, p, f: reverse_sample(
        k, model, p, diffuser, f, num_t=num_t, noise_scale=0.1,
    ))(key, params, feats)

    # full sweeps + tol=0 -> exact fixed point
    par = jax.jit(lambda k, p, f: picard_reverse_sample(
        k, model, p, diffuser, f, num_t=num_t, noise_scale=0.1, tol=0.0,
        max_sweeps=num_t - 1,
    ))(key, params, feats)

    assert int(par["n_sweeps"]) == num_t - 1
    for key_ in ("rigids", "atom37", "angles"):
        np.testing.assert_allclose(
            np.asarray(par[key_]), np.asarray(seq[key_]), atol=1e-5,
        )


def test_picard_tolerance_stopping_is_wavefront_limited(setup):  # noqa: F811
    """Documented negative result: the reverse EM map is not a strong
    contraction, so convergence is wavefront-limited (M ~= T-1 sweeps) —
    the loop must NOT stop early on this architecture at a tight tol, and
    the tol-stopped result still matches the sequential sampler."""
    _, diffuser, model, feats, params = setup
    key = jax.random.PRNGKey(6)
    num_t = 8

    seq = jax.jit(lambda k, p, f: reverse_sample(
        k, model, p, diffuser, f, num_t=num_t, noise_scale=0.1,
    ))(key, params, feats)
    par = jax.jit(lambda k, p, f: picard_reverse_sample(
        k, model, p, diffuser, f, num_t=num_t, noise_scale=0.1, tol=1e-4,
    ))(key, params, feats)

    assert int(par["n_sweeps"]) == num_t - 1  # wavefront reaches the tail
    np.testing.assert_allclose(
        np.asarray(par["rigids"]), np.asarray(seq["rigids"]), atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(par["atom37"]), np.asarray(seq["atom37"]), atol=5e-3,
    )
