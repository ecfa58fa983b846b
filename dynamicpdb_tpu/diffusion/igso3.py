"""IGSO(3) (isotropic Gaussian on SO(3)) numerics.

Table construction runs once in float64 numpy at startup (cached on disk),
after which all sampling / score evaluation happens on-device via jnp lookups
or the truncated series — no CPU round-trips inside jit.

Math follows the reference's formulas exactly
(/root/reference/src/data/so3_diffuser.py:9-117): the truncated character
expansion of the heat kernel on SO(3) (Leach et al. 2022, with eps =
sqrt(2)*eps_leach so that IGSO3(eps) == Brownian motion at time eps^2),
the marginal angle density pdf(w) = f(w) * (1 - cos w) / pi, and the
score scale d/dw log f(w) computed with the quotient rule.
"""
from __future__ import annotations

import dataclasses
import hashlib
import os

import jax.numpy as jnp
import numpy as np


def igso3_expansion(
    omega: np.ndarray, sigma: np.ndarray, L: int = 1000
) -> np.ndarray:
    """Truncated series f(omega; sigma) = sum_l (2l+1) e^{-l(l+1)sigma^2/2}
    sin(omega(l+1/2)) / sin(omega/2). Broadcasts omega/sigma."""
    ls = np.arange(L, dtype=np.float64)
    omega = np.asarray(omega, np.float64)[..., None]
    sigma = np.asarray(sigma, np.float64)[..., None]
    p = (
        (2 * ls + 1)
        * np.exp(-ls * (ls + 1) * sigma**2 / 2)
        * np.sin(omega * (ls + 0.5))
        / np.sin(omega / 2)
    )
    return p.sum(axis=-1)


def igso3_score_scale(
    expansion: np.ndarray, omega: np.ndarray, sigma: np.ndarray, L: int = 1000
) -> np.ndarray:
    """d/domega log f(omega; sigma) via the quotient rule (so3_diffuser.py:71-117).

    Returns the scalar multiplier applied along the rotation axis to get the
    score vector. Keeps the reference's +1e-4 regularizer in the denominator.
    """
    ls = np.arange(L, dtype=np.float64)
    omega = np.asarray(omega, np.float64)[..., None]
    sigma = np.asarray(sigma, np.float64)[..., None]
    hi = np.sin(omega * (ls + 0.5))
    dhi = (ls + 0.5) * np.cos(omega * (ls + 0.5))
    lo = np.sin(omega / 2)
    dlo = 0.5 * np.cos(omega / 2)
    dSigma = (
        (2 * ls + 1)
        * np.exp(-ls * (ls + 1) * sigma**2 / 2)
        * (lo * dhi - hi * dlo)
        / lo**2
    ).sum(axis=-1)
    return dSigma / (expansion + 1e-4)


@dataclasses.dataclass(frozen=True)
class IGSO3Tables:
    """Precomputed grids; all jnp device arrays (float32)."""

    discrete_sigma: jnp.ndarray  # [num_sigma]
    discrete_omega: jnp.ndarray  # [num_omega]
    pdf: jnp.ndarray  # [num_sigma, num_omega]
    cdf: jnp.ndarray  # [num_sigma, num_omega]
    score_norms: jnp.ndarray  # [num_sigma, num_omega]
    score_scaling: jnp.ndarray  # [num_sigma]


def sigma_schedule(
    t: np.ndarray, min_sigma: float, max_sigma: float, schedule: str = "logarithmic"
):
    """sigma(t); logarithmic matches so3_diffuser.py:192-199."""
    if schedule != "logarithmic":
        raise ValueError(f"Unrecognized schedule {schedule}")
    lib = jnp if isinstance(t, jnp.ndarray) else np
    return lib.log(t * lib.exp(max_sigma) + (1 - t) * lib.exp(min_sigma))


def build_tables(
    *,
    num_sigma: int = 1000,
    num_omega: int = 1000,
    min_sigma: float = 0.1,
    max_sigma: float = 1.5,
    schedule: str = "logarithmic",
    cache_dir: str | None = ".cache/igso3",
    L: int = 1000,
) -> IGSO3Tables:
    key = f"{num_sigma}_{num_omega}_{min_sigma}_{max_sigma}_{schedule}_{L}"
    cache_file = None
    if cache_dir is not None:
        digest = hashlib.sha1(key.encode()).hexdigest()[:12]
        cache_file = os.path.join(cache_dir, f"igso3_{digest}.npz")

    if cache_file is not None and os.path.exists(cache_file):
        with np.load(cache_file) as z:
            arrays = {k: z[k] for k in z.files}
    else:
        # omega grid skips 0 (density vanishes there): linspace(0, pi)[1:]
        omega = np.linspace(0, np.pi, num_omega + 1)[1:]
        sigma = np.asarray(
            sigma_schedule(np.linspace(0.0, 1.0, num_sigma), min_sigma, max_sigma, schedule)
        )
        # Row-wise over sigma to bound the [O, L] broadcast temporaries
        # (full [S, O, L] would be num_sigma * num_omega * L * 8B ~ 8 GB).
        exp_vals = np.stack([igso3_expansion(omega, s, L=L) for s in sigma])
        pdf = exp_vals * (1 - np.cos(omega)) / np.pi
        cdf = np.cumsum(pdf, axis=-1) / num_omega * np.pi
        score_norms = np.stack(
            [
                igso3_score_scale(exp_vals[i], omega, s, L=L)
                for i, s in enumerate(sigma)
            ]
        )
        score_scaling = np.sqrt(
            np.abs(np.sum(score_norms**2 * pdf, axis=-1) / np.sum(pdf, axis=-1))
        ) / np.sqrt(3)
        arrays = dict(
            discrete_sigma=sigma,
            discrete_omega=omega,
            pdf=pdf,
            cdf=cdf,
            score_norms=score_norms,
            score_scaling=score_scaling,
        )
        if cache_file is not None:
            os.makedirs(cache_dir, exist_ok=True)
            # atomic publish: concurrent processes (parallel test workers,
            # multi-host training sharing a cache dir) must never observe a
            # partially-written table file
            tmp = f"{cache_file}.{os.getpid()}.tmp.npz"  # np appends .npz otherwise
            np.savez_compressed(tmp, **arrays)
            os.replace(tmp, cache_file)

    return IGSO3Tables(
        **{k: jnp.asarray(v, jnp.float32) for k, v in arrays.items()}
    )
