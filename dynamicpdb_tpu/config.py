"""Layered configuration system (dataclasses + YAML + dotted CLI overrides).

Replaces the reference's Hydra/OmegaConf tree (/root/reference/config/
train_DFOLDv2.yaml) with typed dataclasses: same knob names and defaults as
the reference's *effective* training configuration (yaml defaults overridden
by run_train.sh:1-24), so a reference user finds every switch in the same
place. ``apply_overrides`` supports the familiar ``a.b.c=value`` syntax.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config


@dataclass(frozen=True)
class FilteringConfig:
    max_len: int = 256


@dataclass(frozen=True)
class DataConfig:
    csv_path: str = ""
    val_csv_path: str = ""
    test_csv_path: str = ""
    frame_time: int = 2  # window length F (run_train.sh:16)
    frame_sample_step: int = 1  # stride k
    keep_first: int | None = 100000  # train uses frames [:keep_first]
    fix_sample_start: int | None = 100000  # eval starts here
    min_t: float = 0.01
    num_t: int = 10  # reverse steps
    dynamics: bool = True
    # batch layout (reference TrainSampler sample modes,
    # Dfold_data_loader_dynamic.py:418-445): time_batch | length_batch |
    # cluster_time_batch | cluster_length_batch. The reference's ACTIVE
    # dynamic path uses the plain DistributedSampler (train:548), whose
    # semantics = time_batch — hence the default (base.yaml:88 defaults
    # cluster_time_batch for the legacy static path).
    sample_mode: str = "time_batch"
    # cluster file for the cluster_* modes (base.yaml:87); format: one
    # cluster per line, space-separated chain ids like '1abc_A'
    cluster_path: str = ""
    filtering: FilteringConfig = field(default_factory=FilteringConfig)


@dataclass(frozen=True)
class EmbedConfig:
    index_embed_size: int = 32
    aatype_embed_size: int = 32
    # In the reference, self-conditioning only feeds the (dead) legacy
    # Embedder distogram; with the active DFOLDv2 embedder it burns a forward
    # pass without affecting outputs (Dfold_network_dynamic.py:450-515,
    # train_DFOLD_dynamics.py:1205-1207). Default off here; enabling it
    # reproduces the extra no-grad forward for strict behavioral parity.
    embed_self_conditioning: bool = False
    # add a learned aatype embedding to the node features — lets the model
    # train WITHOUT OmegaFold embeddings (the reference's only sequence
    # identity signal is the OmegaFold node/edge reprs)
    use_aatype_embedding: bool = False
    num_bins: int = 22
    min_bin: float = 1e-5
    max_bin: float = 20.0


@dataclass(frozen=True)
class IPAConfig:
    c_s: int = 256
    c_z: int = 128
    c_hidden: int = 256
    no_heads: int = 8
    no_qk_points: int = 8
    no_v_points: int = 12
    num_blocks: int = 4
    coordinate_scaling: float = 1.0  # run_train.sh:24 (yaml default 0.1)
    temporal: bool = False  # run_train.sh:23
    temporal_position_max_len: int = 40
    # fused Pallas flash-IPA (ops/pallas/ipa_attention.py) — MEMORY-ONLY
    # FALLBACK, not a performance path. Honest v5e measurements
    # (docs/DESIGN.md): the dense decomposed path is faster at every N
    # that fits HBM (incl. 4096), and a round-4 block-size sweep showed
    # the kernel's cost is tiling-independent (13.2 ms at both 64x128 and
    # 128x256 tiles, N=1024 fwd) — it is bound by the per-row pair-term
    # contraction Mosaic cannot place on the MXU, not by grid overhead.
    # The production long-N path is residue-axis sequence parallelism
    # (parallel/sp.py) over the DENSE formulation. "auto" enables the
    # kernel only beyond any measured dense-fits regime (O(blk) attention
    # memory where dense [F,H,N,N] tensors exceed HBM); True forces it.
    use_pallas_attention: bool | str = False
    pallas_min_n: int = 8192
    pallas_interpret: bool = False  # interpreter mode (CPU testing)


@dataclass(frozen=True)
class ModelConfig:
    node_embed_size: int = 256
    edge_embed_size: int = 128
    node_repr_dim: int = 256  # OmegaFold node_repr channel
    edge_repr_dim: int = 128  # OmegaFold edge_repr channel
    dropout: float = 0.0
    # "float32" | "bfloat16": computation dtype for the embedders/ConvNet/
    # angle head (params + geometry + IPA logits stay float32)
    compute_dtype: str = "float32"
    # rematerialize each trunk block on the backward pass (activation memory
    # O(1) in num_blocks; needed for long sequences, N >= ~512)
    remat: bool = False
    cfg_drop_rate: float = 0.0
    cfg_gamma: float = 2.0
    embed: EmbedConfig = field(default_factory=EmbedConfig)
    ipa: IPAConfig = field(default_factory=IPAConfig)


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "dfold_tpu"
    seed: int = 0
    # windows per device step (frames ride inside). 8 = the measured
    # throughput knee on v5e at 256 residues (docs/DESIGN.md) — the
    # production default; configs/parity_debug.yaml keeps the B=1
    # reference-parity point
    batch_size: int = 8
    # >1: split each batch into this many micro-batches inside the jit
    # step and average their gradients before ONE optimizer update —
    # identical updates to the full batch (gradients are linear; proven
    # in tests/test_train.py::test_grad_accum_matches_full_batch) at
    # 1/grad_accum the activation memory. batch_size must divide evenly.
    grad_accum: int = 1
    learning_rate: float = 1e-4
    # optional warmup/decay schedule (the reference imports
    # AlphaFoldLRScheduler but trains with CONSTANT lr —
    # train_DFOLD_dynamics.py:412; these default to that behavior)
    warmup_steps: int = 0
    lr_schedule: str = "constant"  # or "cosine"
    # TOTAL schedule length for lr_schedule=cosine (warmup INCLUDED, per
    # optax.warmup_cosine_decay_schedule); must exceed warmup_steps
    lr_decay_steps: int = 1000000
    grad_clip_norm: float | None = None  # reference has clip(1.0) commented out
    num_epoch: int = 500000
    log_freq: int = 32
    ckpt_freq: int = 400  # epochs between checkpoints (run_train.sh:10)
    ckpt_dir: str = "ckpt"
    eval_dir: str = "eval_outputs"
    warm_start: str | None = None
    # loss weights: run_train.sh:18-22
    trans_loss_weight: float = 100.0
    rot_loss_weight: float = 7.0
    torsion_loss_weight: float = 1.0
    rot_loss_t_threshold: float = 0.0
    separate_rot_loss: bool = False
    bb_atom_loss_weight: float = 1.0
    bb_atom_loss_t_filter: float = 0.25
    dist_mat_loss_weight: float = 1.0
    dist_mat_loss_t_filter: float = 0.25
    aux_loss_weight: float = 0.25
    # exposure-bias robustifier (beyond-reference, opt-in): std of the
    # random SE(3) error composed onto the CONDITIONING frames' rigids
    # during training (data/featurize.py:perturb_conditioning_rigids) so
    # the net tolerates its own rollout-fed windows. 0 = reference
    # semantics (clean windows only). Measured effect on 1000-frame drift:
    # docs/artifacts/rollout_quality_1000_robust.json / docs/DESIGN.md.
    cond_noise_trans: float = 0.0  # Angstrom
    cond_noise_rot_deg: float = 0.0  # degrees
    # scheduled-sampling / rollout-consistent training (beyond-reference,
    # opt-in): K>1 unrolls K denoising steps per window, feeding each
    # step's predicted rigid back into the next step's conditioning slot
    # (differentiable; train/experiment.py:_window_loss). Raw windows must
    # carry F+K-1 frames — raise data.frame_time by K-1. 1 = reference
    # one-step semantics.
    unroll_steps: int = 1
    noise_scale: float = 1.0  # 0.1 at eval (run_eval.sh:9)
    num_loader_workers: int = 2
    # parallelism
    mesh_shape: tuple = ()  # () = single device; e.g. (8,) data-parallel
    mesh_axes: tuple = ("data",)
    bf16: bool = False
    # "bfloat16" stores AMSGrad moments in bf16 (math stays f32): the
    # optimizer pass is the largest HBM-traffic slice of a train step
    # (docs/DESIGN.md); None/"float32" = exact optax.amsgrad sequence
    opt_state_dtype: str | None = None
    # parameter EMA (beyond-reference, opt-in): e.g. 0.999 tracks an
    # exponential moving average of the weights inside opt_state
    # (train/optim.py:track_ema); evaluate with `eval_cli --ema`.
    # None = reference behavior, optimizer/train step unchanged.
    ema_decay: float | None = None
    # "optax" (default, bit-compatible with optax.amsgrad) or "torch"
    # (reproduces torch.optim.Adam(amsgrad=True) step-for-step: uncorrected
    # nu_max + f64-accurate bias corrections — use for strict loss-curve
    # parity runs vs the reference; configs/parity_debug.yaml sets it)
    amsgrad_formulation: str = "optax"
    # ZeRO-1-style sharding of the AMSGrad moments over the 'data' mesh
    # axis: each device updates 1/D of the optimizer state and XLA
    # all-gathers params over ICI (parallel/sharding.py:zero_spec).
    # No-op on a single device.
    zero_opt_state: bool = True


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    diffuser: SE3Config = field(default_factory=SE3Config)
    model: ModelConfig = field(default_factory=ModelConfig)
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)


# ---------------------------------------------------------------------------
# overrides / YAML
# ---------------------------------------------------------------------------
def _coerce(value: str, current: Any, allows_str: bool = True) -> Any:
    if value.lower() in ("null", "none"):
        return None
    if value.lower() == "auto":
        # Only tri-state fields (declared `bool | str`, e.g.
        # use_pallas_attention) accept 'auto'. For a pure-bool field a truthy
        # "auto" string would silently ENABLE the feature — reject the typo
        # loudly instead.
        if isinstance(current, bool) and not allows_str:
            raise ValueError(
                "'auto' is not valid for a boolean-only field; use true/false"
            )
        return "auto"
    if isinstance(current, bool) or (
        isinstance(current, str) and current.lower() in (
            "auto", "true", "false", "1", "0", "yes", "no", "on", "off"
        )
    ):
        if value.lower() in ("1", "true", "yes", "on"):
            return True
        if value.lower() in ("0", "false", "no", "off"):
            return False
        return value
    if current is None:
        for cast in (int, float):
            try:
                return cast(value)
            except ValueError:
                pass
        return value
    if isinstance(current, int) and not isinstance(current, bool):
        return int(float(value))
    if isinstance(current, float):
        return float(value)
    if isinstance(current, tuple):
        if not value.strip("()[] "):
            return ()
        return tuple(
            _coerce(v.strip(), current[0] if current else "0")
            for v in value.strip("()[]").split(",")
        )
    return value


def _replace_path(obj: Any, path: list[str], value: Any) -> Any:
    name = path[0]
    if not hasattr(obj, name):
        raise KeyError(f"No config field '{name}' on {type(obj).__name__}")
    current = getattr(obj, name)
    if len(path) == 1:
        declared = ""
        if dataclasses.is_dataclass(obj):
            for f in dataclasses.fields(obj):
                if f.name == name:
                    declared = str(f.type)
                    break
        allows_str = "str" in declared
        new = (
            _coerce(value, current, allows_str=allows_str)
            if isinstance(value, str) else value
        )
        return dataclasses.replace(obj, **{name: new})
    return dataclasses.replace(obj, **{name: _replace_path(current, path[1:], value)})


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply ``section.field=value`` overrides (Hydra-style CLI syntax)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must look like a.b=c, got: {ov}")
        key, value = ov.split("=", 1)
        cfg = _replace_path(cfg, key.split("."), value)
    return cfg


def _from_dict(cls, d: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = _from_dict(f.type, v)
        elif isinstance(v, dict):
            # resolve nested dataclass types declared as strings
            default = (
                f.default_factory() if f.default_factory is not dataclasses.MISSING
                else f.default
            )
            kwargs[f.name] = _from_dict(type(default), v)
        else:
            kwargs[f.name] = tuple(v) if isinstance(v, list) else v
    return cls(**kwargs)


def load_yaml(path: str, overrides: list[str] | None = None) -> Config:
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = _from_dict(Config, raw)
    return apply_overrides(cfg, overrides or [])


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)
