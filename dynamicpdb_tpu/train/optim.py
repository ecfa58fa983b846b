"""AMSGrad with configurable optimizer-state dtype.

The reference trains with torch Adam(amsgrad=True) (train_DFOLD_dynamics.py
:412); this framework has always used optax's AMSGrad formulation, which
differs from torch's in one detail: torch takes the running max of the
UNCORRECTED second moment and bias-corrects that max, while optax (and
this module, which is bit-compatible with optax.amsgrad at f32 state —
tests/test_optim.py) maxes the bias-CORRECTED nu_hat. The denominators
differ slightly whenever the max was attained at an earlier step; both are
standard AMSGrad.

On TPU the optimizer pass is the single largest slice of a flagship train
step — pure HBM traffic over params + three f32 moments (docs/DESIGN.md:
40% of device time at B=1). Storing the moments in bfloat16 halves that
traffic (+16% steps/sec at B=1, measured); all arithmetic still happens in
f32 (moments are upcast, updated, then cast back), so the only difference
from f32 state is rounding of the stored accumulators.

Known bf16 quantization property: with b2=0.999 the per-step second-moment
update is 0.1% relative, below half a bf16 ULP (~0.2%), so the STORED nu
only moves once ``g**2`` departs from nu by more than ~2x — nu tracks
gradient-scale changes of >~sqrt(3) immediately but is quantization-frozen
under slower drift. For AMSGrad specifically the downward direction is
moot (nu_max is monotone by design); the residual risk is a slow UPWARD
drift in gradient scale being tracked late (transiently oversized steps).
Convergence on the single-protein proof is indistinguishable from f32
(docs/artifacts/train_proof_bf16state.json); for very long production runs
where gradient scale drifts slowly, prefer the default f32 state
(``opt_state_dtype: null``) or monitor grad_norm.

Enabled via ``experiment.opt_state_dtype: bfloat16``.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AmsgradState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def _cast(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def scale_by_amsgrad(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    state_dtype: Optional[jnp.dtype] = None,
    formulation: str = "optax",
) -> optax.GradientTransformation:
    """optax.scale_by_amsgrad with all three accumulators in state_dtype.

    formulation="torch" reproduces torch.optim.Adam(amsgrad=True) bit-for-
    bit (used by the reference, train_DFOLD_dynamics.py:412): nu_max tracks
    the UNCORRECTED second moment and the bias correction divides the max —
    ``update = (mu/c1) / (sqrt(nu_max)/sqrt(c2) + eps)``. The default
    "optax" formulation maxes the bias-CORRECTED nu_hat instead. Both are
    standard AMSGrad; "torch" is what the optimization-dynamics parity
    harness (tools/parity_training.py) runs."""
    if formulation not in ("optax", "torch"):
        raise ValueError(f"unknown amsgrad formulation: {formulation}")

    def init_fn(params):
        def zeros():
            # three INDEPENDENT trees: sharing one would alias buffers and
            # break donation ("attempt to donate the same buffer twice")
            return jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=state_dtype or p.dtype),
                params,
            )

        return AmsgradState(
            count=jnp.zeros([], jnp.int32),
            mu=zeros(), nu=zeros(), nu_max=zeros(),
        )

    def update_fn(updates, state, params=None):
        del params
        # upcast stored accumulators to the gradient dtype for the arithmetic
        mu_f = jax.tree_util.tree_map(
            lambda m, g: m.astype(g.dtype), state.mu, updates
        )
        nu_f = jax.tree_util.tree_map(
            lambda v, g: v.astype(g.dtype), state.nu, updates
        )
        nu_max_f = jax.tree_util.tree_map(
            lambda v, g: v.astype(g.dtype), state.nu_max, updates
        )
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m + (1.0 - b1) * g, updates, mu_f
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v + (1.0 - b2) * (g * g), updates, nu_f
        )
        count_inc = optax.safe_int32_increment(state.count)
        c1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
        c2 = 1.0 - b2 ** count_inc.astype(jnp.float32)
        if formulation == "torch":
            # torch: max of the raw nu; correction applied to the max's sqrt.
            # torch computes 1-b**step as a float64 Python scalar; the f32
            # expression 1-b2**t cancels catastrophically (b2**t ~= 1), so
            # use expm1 with the f64 log folded in at trace time.
            cnt = count_inc.astype(jnp.float32)
            c1t = -jnp.expm1(cnt * math.log(b1))
            c2t = -jnp.expm1(cnt * math.log(b2))
            mu_hat = jax.tree_util.tree_map(lambda m: m / c1t, mu)
            nu_max = jax.tree_util.tree_map(jnp.maximum, nu_max_f, nu)
            sqrt_c2 = jnp.sqrt(c2t)
            new_updates = jax.tree_util.tree_map(
                lambda m, v: m / (jnp.sqrt(v + eps_root) / sqrt_c2 + eps),
                mu_hat, nu_max,
            )
        else:
            mu_hat = jax.tree_util.tree_map(lambda m: m / c1, mu)
            nu_hat = jax.tree_util.tree_map(lambda v: v / c2, nu)
            nu_max = jax.tree_util.tree_map(jnp.maximum, nu_max_f, nu_hat)
            new_updates = jax.tree_util.tree_map(
                lambda m, v: m / (jnp.sqrt(v + eps_root) + eps), mu_hat, nu_max
            )
        return new_updates, AmsgradState(
            count=count_inc,
            mu=_cast(mu, state_dtype),
            nu=_cast(nu, state_dtype),
            nu_max=_cast(nu_max, state_dtype),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def amsgrad(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype: Optional[jnp.dtype] = None,
    formulation: str = "optax",
) -> optax.GradientTransformation:
    """Adam(amsgrad=True) equivalent; state_dtype=bfloat16 halves the
    optimizer's HBM traffic (moments stored bf16, math in f32).
    learning_rate may be a float (constant, the reference behavior) or an
    optax schedule (step -> lr)."""
    if callable(learning_rate):
        scale = optax.scale_by_schedule(lambda step: -learning_rate(step))
    else:
        scale = optax.scale(-learning_rate)
    return optax.chain(
        scale_by_amsgrad(b1=b1, b2=b2, eps=eps, state_dtype=state_dtype,
                         formulation=formulation),
        scale,
    )


class EmaState(NamedTuple):
    ema: optax.Params


def track_ema(decay: float) -> optax.GradientTransformation:
    """Exponential moving average of the PARAMETERS (not gradients) as the
    last link of the optimizer chain — standard practice for diffusion
    models (the reference has no equivalent; beyond-reference, opt-in via
    ``experiment.ema_decay``).

    Living inside opt_state means the EMA tree checkpoints, restores, and
    ZeRO-shards over 'data' exactly like the AMSGrad moments with zero new
    plumbing, and the default (``ema_decay: null``) leaves the optimizer —
    and therefore the compiled train step and its persistent-cache key —
    byte-identical. update_fn sees the final lr-scaled deltas, so
    ``new_params = params + updates`` is exact; the EMA starts at the
    initial parameters (no zero-debiasing needed). Read it back with
    :func:`ema_params`."""
    if not 0.0 <= decay < 1.0:
        raise ValueError(f"ema_decay must be in [0, 1), got {decay}")

    def init_fn(params):
        # independent buffers (donation would alias otherwise; see the
        # AmsgradState zeros note above)
        return EmaState(
            ema=jax.tree_util.tree_map(lambda p: p.copy(), params)
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("track_ema requires params in optimizer.update")
        ema = jax.tree_util.tree_map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates,
        )
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params(opt_state) -> optax.Params:
    """Extract the EMA parameter tree from an optimizer state built with
    ``experiment.ema_decay`` set (eval_cli --ema evaluates with it)."""
    states = [
        x
        for x in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, EmaState)
        )
        if isinstance(x, EmaState)
    ]
    if not states:
        raise ValueError(
            "optimizer state carries no EMA tree — train with "
            "experiment.ema_decay set"
        )
    return states[0].ema


def make_lr_schedule(experiment_cfg):
    """float (constant lr, the reference's exact behavior) or an optax
    schedule when warmup/cosine knobs are set."""
    lr = experiment_cfg.learning_rate
    warmup = getattr(experiment_cfg, "warmup_steps", 0)
    kind = getattr(experiment_cfg, "lr_schedule", "constant")
    if kind not in ("constant", "cosine"):
        raise ValueError(f"unknown lr_schedule: {kind}")
    if kind == "constant" and not warmup:
        return lr
    if kind == "cosine":
        decay = getattr(experiment_cfg, "lr_decay_steps", 1000000)
        # optax's decay_steps is the TOTAL schedule length INCLUDING
        # warmup (it raises from deep inside cosine_decay_schedule when
        # decay - warmup <= 0); validate here with a config-level error
        if decay <= warmup:
            raise ValueError(
                f"lr_decay_steps ({decay}) is the TOTAL schedule length "
                f"and must exceed warmup_steps ({warmup})"
            )
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else lr,
            peak_value=lr,
            warmup_steps=warmup,
            decay_steps=decay,
        )
    return optax.linear_schedule(0.0, lr, warmup)


def make_optimizer(experiment_cfg) -> optax.GradientTransformation:
    """Build the training optimizer from ExperimentConfig (config.py):
    plain AMSGrad as in the reference, optional global-norm clipping, and
    optional low-precision optimizer state."""
    state_dtype = None
    name = getattr(experiment_cfg, "opt_state_dtype", None)
    if name:
        state_dtype = jnp.dtype(name)
        if state_dtype == jnp.float32:
            state_dtype = None  # f32 path = exact optax.amsgrad sequence
    opt = amsgrad(
        make_lr_schedule(experiment_cfg), state_dtype=state_dtype,
        formulation=getattr(experiment_cfg, "amsgrad_formulation", "optax"),
    )
    if experiment_cfg.grad_clip_norm:
        opt = optax.chain(
            optax.clip_by_global_norm(experiment_cfg.grad_clip_norm), opt
        )
    ema_decay = getattr(experiment_cfg, "ema_decay", None)
    if ema_decay is not None:
        # appended last so update_fn sees the final lr-scaled deltas
        opt = optax.chain(opt, track_ema(ema_decay))
    return opt
