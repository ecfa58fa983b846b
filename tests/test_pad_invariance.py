"""Padding must not change losses or eval metrics (VERDICT r1 item 4).

The reference never pads (its loaders emit exact-length tensors), so its
unmasked means are only correct at pad_to == N. Our fixed-shape batching pads
the residue axis; these tests assert that the loss and the metrics of record
are invariant to pad_to in {N, 2N} even when the model emits junk at padded
positions.
"""
import numpy as np

import jax
import jax.numpy as jnp
import pytest

# compile/oracle-heavy on a 1-core host (measured, Makefile header):
# run via `make heavy`; excluded from the default `make test` tier
pytestmark = pytest.mark.heavy

from dynamicpdb_tpu.analysis.metrics import eval_window_metrics
from dynamicpdb_tpu.config import ExperimentConfig
from dynamicpdb_tpu.data.dataset import pad_window
from dynamicpdb_tpu.data.featurize import featurize_window
from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.train.losses import dfold_loss

N, F = 24, 3
JUNK = 13.0  # deliberately wild values at padded positions


def _feats_and_out(pad_to: int):
    """featurize a window padded to pad_to; fabricate deterministic
    diffusion fields and a model_out that is junk on padding."""
    rng = np.random.default_rng(7)
    raw = make_window(n_res=N, frame_time=F, seed=3)
    raw = pad_window(raw, pad_to)
    feats = {k: np.asarray(v) for k, v in jax.jit(featurize_window)(
        {k: jnp.asarray(v) for k, v in raw.items()}).items()}

    pad_mask = feats["res_mask"][..., None]  # [F, P, 1]

    def padded(shape_real, extra=()):
        x = rng.normal(size=(F, N) + extra).astype(np.float32)
        full = np.full((F, pad_to) + extra, JUNK, np.float32)
        full[:, :N] = x
        return full

    t = np.full((F,), 0.7, np.float32)
    feats["t"] = t
    feats["rot_score"] = padded((F, N), (3,)) * pad_mask
    feats["rot_score_scaling"] = np.full((F,), 1.3, np.float32)
    feats["trans_score_scaling"] = np.full((F,), 0.8, np.float32)

    # model_out: gt perturbed at real positions, junk on padding
    delta = rng.normal(size=(F, N, 7)).astype(np.float32) * 0.1
    rigids = np.array(feats["rigids_0"])
    rigids[:, :N] += delta
    rigids[:, N:] = JUNK
    angles = np.full((F, pad_to, 7, 2), JUNK, np.float32)
    angles[:, :N] = np.array(feats["torsion_angles_sin_cos"])[:, :N] + \
        rng.normal(size=(F, N, 7, 2)).astype(np.float32) * 0.05
    rot_sc = np.full((F, pad_to, 3), JUNK, np.float32)
    rot_sc[:, :N] = np.asarray(feats["rot_score"])[:, :N] + 0.2
    out = {
        "rigids": jnp.asarray(rigids),
        "angles": jnp.asarray(angles),
        "rot_score": jnp.asarray(rot_sc),
    }
    feats = {k: jnp.asarray(v) for k, v in feats.items()}
    # atom37 junk on padding for the metric side
    pred_atom37 = np.full((F, pad_to, 37, 3), JUNK, np.float32)
    pred_atom37[:, :N] = np.asarray(feats["atom37_pos"])[:, :N] + \
        rng.normal(size=(F, N, 37, 3)).astype(np.float32) * 0.4
    return feats, out, jnp.asarray(pred_atom37)


def test_loss_invariant_to_padding():
    conf = ExperimentConfig()
    feats_a, out_a, _ = _feats_and_out(N)
    feats_b, out_b, _ = _feats_and_out(2 * N)
    jloss = jax.jit(lambda o, f: dfold_loss(o, f, conf))
    total_a, aux_a = jloss(out_a, feats_a)
    total_b, aux_b = jloss(out_b, feats_b)
    for k in aux_a:
        np.testing.assert_allclose(
            float(aux_a[k]), float(aux_b[k]), rtol=1e-5, err_msg=k
        )
    np.testing.assert_allclose(float(total_a), float(total_b), rtol=1e-5)
    assert float(total_a) > 0


def test_eval_metrics_invariant_to_padding():
    results = {}
    for pad_to in (N, 2 * N):
        feats, out, pred_atom37 = _feats_and_out(pad_to)
        m = jax.jit(eval_window_metrics)(
            out["rigids"], pred_atom37, feats["rigids_0"],
            feats["atom37_pos"], feats["atom37_mask"],
            res_mask=feats["res_mask"],
        )
        results[pad_to] = {k: float(v) for k, v in m.items()}
    for k in results[N]:
        np.testing.assert_allclose(
            results[N][k], results[2 * N][k], rtol=2e-4, err_msg=k
        )


def test_model_forward_pad_invariant():
    """The MODEL FORWARD itself must be pad-invariant at real residues
    (round-3 review: GlobalStatNorm previously normalized over pad rows and
    the 5x5 conv read pad-row embedder biases, so predictions silently
    depended on pad_to / length-bucket size — unlike the reference, which
    never pads)."""
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Diffuser
    from dynamicpdb_tpu.models.score_network import (
        DFoldScoreNetwork, score_forward,
    )
    from tests.test_model import TINY_MODEL, TINY_SE3

    n = 10
    raw = make_window(n_res=n, frame_time=2, seed=5)
    diffuser = SE3Diffuser(TINY_SE3)
    model = DFoldScoreNetwork(TINY_MODEL)

    outs = {}
    params = None
    for pad_to in (n, 16, 24):
        feats = featurize_window(
            jax.tree_util.tree_map(jnp.asarray, pad_window(dict(raw), pad_to))
        )
        key = jax.random.PRNGKey(0)
        # deterministic t/rigids_t so only pad_to varies: real rows carry
        # identical values at every pad size
        feats["t"] = jnp.full((2,), 0.41)
        feats["rigids_t"] = feats["rigids_0"]
        feats["sc_ca_t"] = jnp.zeros_like(feats["rigids_0"][..., 4:])
        if params is None:
            params = model.init(key, feats)
        outs[pad_to] = jax.jit(
            lambda p, f: score_forward(model, p, diffuser, f)
        )(params, feats)

    base = outs[n]
    for pad_to in (16, 24):
        o = outs[pad_to]
        for k, tol in (("rigids", 2e-4), ("atom37", 1e-3), ("angles", 2e-4)):
            np.testing.assert_allclose(
                np.asarray(o[k])[:, :n], np.asarray(base[k])[:, :n],
                atol=tol, err_msg=f"pad_to={pad_to} key={k}",
            )
