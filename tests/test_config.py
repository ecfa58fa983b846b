import dataclasses

import pytest

from dynamicpdb_tpu.config import Config, apply_overrides, load_yaml, to_dict


def test_defaults_match_reference_release_hyperparams():
    cfg = Config()
    # run_train.sh:15-24
    assert cfg.data.frame_time == 2
    assert cfg.experiment.trans_loss_weight == 100.0
    assert cfg.experiment.rot_loss_weight == 7.0
    assert cfg.experiment.torsion_loss_weight == 1.0
    assert cfg.experiment.rot_loss_t_threshold == 0.0
    assert cfg.diffuser.r3.coordinate_scaling == 1.0
    assert cfg.model.ipa.num_blocks == 4
    assert cfg.model.ipa.no_heads == 8


def test_dotted_overrides_types():
    cfg = apply_overrides(Config(), [
        "model.ipa.num_blocks=2",
        "experiment.learning_rate=3e-4",
        "data.keep_first=null",
        "model.ipa.use_pallas_attention=true",
        "experiment.name=sweep1",
    ])
    assert cfg.model.ipa.num_blocks == 2
    assert cfg.experiment.learning_rate == pytest.approx(3e-4)
    assert cfg.data.keep_first is None
    assert cfg.model.ipa.use_pallas_attention is True
    assert cfg.experiment.name == "sweep1"


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        apply_overrides(Config(), ["model.bogus=1"])


def test_yaml_roundtrip(tmp_path):
    import yaml

    cfg = apply_overrides(Config(), ["model.node_embed_size=64"])
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(to_dict(cfg)))
    cfg2 = load_yaml(str(p), ["experiment.batch_size=3"])
    assert cfg2.model.node_embed_size == 64
    assert cfg2.experiment.batch_size == 3
    assert cfg2.diffuser.so3.num_sigma == cfg.diffuser.so3.num_sigma


def test_config_is_frozen():
    cfg = Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.data = None


def test_auto_override_survives_bool_default():
    """'auto' must reach tri-state bool|str fields through CLI overrides even
    when the current value is a bool (it used to coerce to False silently)."""
    from dynamicpdb_tpu.config import Config, apply_overrides

    cfg = apply_overrides(Config(), ["model.ipa.use_pallas_attention=auto"])
    assert cfg.model.ipa.use_pallas_attention == "auto"
    cfg = apply_overrides(cfg, ["model.ipa.use_pallas_attention=true"])
    assert cfg.model.ipa.use_pallas_attention is True
    cfg = apply_overrides(cfg, ["model.ipa.use_pallas_attention=false"])
    assert cfg.model.ipa.use_pallas_attention is False


def test_auto_rejected_for_pure_bool_field():
    """bf16=auto is a typo, not a tri-state value: a truthy "auto" string
    stored into a pure-bool field would silently ENABLE the feature."""
    with pytest.raises(ValueError, match="auto"):
        apply_overrides(Config(), ["experiment.bf16=auto"])


def test_parity_debug_preset_wires_torch_formulation():
    """configs/parity_debug.yaml must reach the optimizer factory: the
    'torch' AMSGrad formulation was previously unreachable from config."""
    from dynamicpdb_tpu.config import load_yaml
    from dynamicpdb_tpu.train.optim import make_optimizer

    cfg = load_yaml("configs/parity_debug.yaml")
    assert cfg.experiment.amsgrad_formulation == "torch"
    assert cfg.experiment.batch_size == 1
    assert cfg.experiment.opt_state_dtype is None
    make_optimizer(cfg.experiment)  # constructs without error
