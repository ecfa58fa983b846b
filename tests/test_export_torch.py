"""Flax -> reference-format checkpoint export (train/export_torch.py).

Roundtrip identity through the proven importer pins the exporter's weight
mapping: export o import == id means the exported file carries exactly the
function our model computes, because import's mapping is itself
forward-parity-proven against the live reference model
(tests/test_model_parity.py, <=3e-5; tests/test_import_torch.py). The live
strict-load + key-set check against the real reference FullScoreNetwork
runs inside tools/parity_model.py (same test)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import flax

from dynamicpdb_tpu.config import IPAConfig, ModelConfig
from dynamicpdb_tpu.data.featurize import diffuse_training_window, featurize_window
from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config, SE3Diffuser
from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork
from dynamicpdb_tpu.train.export_torch import (
    export_reference_checkpoint,
    reference_state_dict_from_flax,
)
from dynamicpdb_tpu.train.import_torch import import_reference_checkpoint

TINY_IPA = IPAConfig(
    c_s=16, c_z=8, c_hidden=8, no_heads=2, no_qk_points=2, no_v_points=3,
    num_blocks=2,
)
TINY_MODEL = ModelConfig(node_embed_size=16, edge_embed_size=8, ipa=TINY_IPA)


@pytest.fixture(scope="module")
def tiny_params():
    w = make_window(n_res=10, frame_time=2, seed=0)
    diffuser = SE3Diffuser(SE3Config(
        so3=SO3Config(num_omega=100, num_sigma=50, cache_dir=None,
                      series_L=100),
        r3=R3Config(coordinate_scaling=1.0),
    ))
    feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, w))
    feats = diffuse_training_window(
        jax.random.PRNGKey(1), feats, diffuser, min_t=0.01
    )
    model = DFoldScoreNetwork(TINY_MODEL)
    return jax.jit(model.init)(jax.random.PRNGKey(0), feats)


def _flat(params):
    return {
        "/".join(k): np.asarray(v)
        for k, v in flax.traverse_util.flatten_dict(
            params["params"] if "params" in params else params
        ).items()
    }


def test_export_import_roundtrip(tiny_params, tmp_path):
    path = str(tmp_path / "exported.pth")
    export_reference_checkpoint(
        path, tiny_params, TINY_MODEL, epoch=3, step=777
    )
    params2, extras = import_reference_checkpoint(path, TINY_MODEL)
    assert extras["step"] == 777 and extras["epoch"] == 3
    a, b = _flat(tiny_params), _flat(params2)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # the evaluator merges ckpt.conf.model over its live config
    # (eval_DFOLD_dynamics.py:121) — the attribute path must exist
    from dynamicpdb_tpu.train.import_torch import load_reference_checkpoint

    payload = load_reference_checkpoint(path)
    assert payload["conf"].model["ipa"]["num_blocks"] == 2


def test_export_covers_dead_reference_params(tiny_params):
    sd = reference_state_dict_from_flax(tiny_params, TINY_MODEL)
    # DFOLDv2_Embeder's dead modules (outputs overwritten at
    # ipa_pytorch_dynamic.py:833-835) must still be present for the
    # reference's strict load_state_dict (eval_DFOLD_dynamics.py:136)
    for key, shape in [
        ("embedding_layer.node_ln.weight", (16,)),
        ("embedding_layer.edge_ln.bias", (8,)),
        ("embedding_layer.node_timestep_proj.0.weight", (8, 16)),
        ("embedding_layer.edge_timestep_proj.2.weight", (8, 4)),
    ]:
        assert sd[key].shape == shape, key
    np.testing.assert_array_equal(
        sd["embedding_layer.node_ln.weight"], np.ones(16, np.float32)
    )


def test_export_rejects_unrepresentable_params(tiny_params):
    tree = flax.core.unfreeze(tiny_params)
    inner = tree["params"] if "params" in tree else tree
    inner["aatype_embedder"] = {"kernel": np.zeros((21, 16), np.float32)}
    with pytest.raises(ValueError, match="aatype_embedder"):
        reference_state_dict_from_flax(tree, TINY_MODEL)
    sd = reference_state_dict_from_flax(tree, TINY_MODEL, strict=False)
    assert not any("aatype" in k for k in sd)
