"""Run configuration: dataclass tree + YAML + CLI dot-overrides.

Field names and defaults mirror the reference's pyrallis config surface
(/root/reference/training/config.py:11-293) so that reference YAML configs
and command lines decode unchanged. The decoding machinery itself
(`decode` / `encode` / `parse_cli`) is a small self-contained reimplementation
of the pyrallis subset the reference uses (pyrallis is not available in the
TPU image).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
import sys
import typing
from typing import Any, Dict, List, Optional, Union

import yaml

from view_neti_tpu.constants import VALIDATION_PROMPTS
from view_neti_tpu.utils.types import PESigmas

# Reusable pretrained view-mapper registry (reference
# training/pretrained_models.py:1-5). Keys map to checkpoint paths; users
# register their own trained mappers here or pass explicit paths.
lookup_pretrained_models: Dict[str, str] = {}


@dataclass
class LogConfig:
    """Logging / saving parameters (reference training/config.py:12-31)."""
    exp_name: str = ""
    overwrite_ok: bool = False
    exp_dir: Path = Path("./outputs")
    save_steps: int = 1000
    logging_dir: Path = Path("logs")
    report_to: str = "tensorboard"
    checkpoints_total_limit: Optional[int] = None
    save_dataset_images: bool = True
    # TPU addition: "msgpack" writes the reference-shaped interchange
    # artifacts; "orbax" additionally persists the FULL sharded train state
    # (params + optimizer) for multi-host save/restore (checkpoint_orbax.py)
    checkpoint_backend: str = "msgpack"
    # TPU addition: resume a run from an orbax train-state directory —
    # a state-<step> path, or "latest" to pick the newest under
    # <exp_dir>/orbax. Restores trainable params, optimizer state, PE
    # constants, and the global step. (The reference has no resume at all,
    # reference training/coach.py:500-506.)
    resume_from: Optional[str] = None


@dataclass
class DataConfig:
    """Data pipeline parameters (reference training/config.py:35-75)."""
    train_data_dir: Path = None
    train_data_subsets: Optional[List[Path]] = None
    placeholder_object_token: str = "<>"
    super_category_object_token: Optional[str] = "object"
    super_category_view_token: Optional[str] = "view"
    placeholder_object_tokens: Optional[List[str]] = None
    super_category_object_tokens: Optional[List[str]] = None
    fixed_object_token_or_path: Optional[str] = None
    dataloader_num_workers: int = 8
    repeats: int = 100
    resolution: int = 512
    # preprocessing for DTU: 0 = pad-to-square+resize-512, 1 = 512x384,
    # 2 = 768x576 (reference training/dataset.py:702-717)
    dtu_preprocess_key: int = 1
    center_crop: bool = False
    flip_p: float = 0.5
    caption_strategy: int = 0
    camera_representation: str = "spherical"
    dtu_lighting: str = "3"
    dtu_subset: int = -2
    augmentation_key: int = 0
    # filled at runtime (reference training/config.py:64)
    placeholder_view_tokens: Optional[List[str]] = None
    # TPU addition: path to a CLIP BPE vocab directory (vocab.json +
    # merges.txt). None -> deterministic fallback tokenizer.
    tokenizer_path: Optional[Path] = None
    # TPU addition: run the stochastic augmentation suffix (jitter/blur/
    # rotate/crop/flip) on device inside the jitted train step instead of
    # per-image on the host (ops/device_augment.py). Distribution-
    # equivalent to the host/PIL path; disable for bit-level host parity.
    device_augment: bool = True


@dataclass
class ModelConfig:
    """Model parameters (reference training/config.py:79-178)."""
    pretrained_model_name_or_path: str = "CompVis/stable-diffusion-v1-4"
    pretrained_view_mapper: Optional[Path] = None
    pretrained_view_mapper_key: Optional[int] = None
    word_embedding_dim: int = 768
    arch_mlp_hidden_dims: int = 128
    use_nested_dropout: bool = True
    nested_dropout_prob: float = 0.5
    normalize_object_mapper_output: bool = True
    normalize_view_mapper_output: bool = False
    target_norm_object: Optional[float] = None
    target_norm_view: Optional[float] = None
    use_positional_encoding_object: int = 1
    use_positional_encoding_view: int = 1
    pe_sigmas: Dict[str, float] = field(
        default_factory=lambda: {
            'sigma_t': 0.03,
            'sigma_l': 2.0,
            'sigma_theta': 1.0,
            'sigma_phi': 1.0,
            'sigma_r': 1.0,
            'sigma_dtu12': 2.0,
        })
    pe_sigma_exp_key: int = 0
    pe_t_exp_key: int = 0
    pe_l_exp_key: int = 0
    pe_sigmas_view: Dict[str, float] = field(
        default_factory=lambda: {'sigma_phi': 1.0})
    num_pe_time_anchors: int = 10
    output_bypass_object: bool = True
    output_bypass_view: bool = True
    revision: Optional[str] = None
    mapper_checkpoint_path: Optional[Path] = None
    arch_view_net: int = 0
    arch_view_mix_streams: int = 0
    arch_view_disable_tl: bool = True
    original_ti: bool = False
    bypass_unconstrained_object: bool = False
    bypass_unconstrained_view: bool = False
    output_bypass_alpha_view: float = 0.2
    output_bypass_alpha_object: float = 0.2

    def __post_init__(self):
        # Resolve experiment-key shorthands into concrete sigmas
        # (reference training/config.py:142-178).
        if self.pe_sigmas is not None and isinstance(self.pe_sigmas, dict):
            self.pe_sigmas = PESigmas(
                sigma_t=self.pe_sigmas['sigma_t'],
                sigma_l=self.pe_sigmas['sigma_l'],
                # NB: reference deliberately keys theta/r off sigma_phi
                # (training/config.py:147-149)
                sigma_theta=self.pe_sigmas.get('sigma_phi', 1.0),
                sigma_phi=self.pe_sigmas.get('sigma_phi', 1.0),
                sigma_r=self.pe_sigmas.get('sigma_phi', 1.0),
                sigma_dtu12=self.pe_sigmas.get('sigma_dtu12', 2.0))
        if isinstance(self.pe_sigmas, PESigmas):
            import dataclasses as _dc
            sigma_dtu12_by_key = {0: None, 1: 1.0, 2: 0.5, 3: 0.25, 4: 0.75,
                                  5: 0.1}
            if self.pe_sigma_exp_key not in sigma_dtu12_by_key:
                raise ValueError(
                    f"unknown pe_sigma_exp_key {self.pe_sigma_exp_key}")
            updates = {}
            v = sigma_dtu12_by_key[self.pe_sigma_exp_key]
            if v is not None:
                updates["sigma_dtu12"] = v

            sigma_t_by_key = {0: 0.03, 1: 0.06, 2: 0.2, 3: 0.5}
            if self.pe_t_exp_key not in sigma_t_by_key:
                raise ValueError(f"unknown pe_t_exp_key {self.pe_t_exp_key}")
            updates["sigma_t"] = sigma_t_by_key[self.pe_t_exp_key]

            sigma_l_by_key = {0: 2.0, 1: 4.0}
            if self.pe_l_exp_key not in sigma_l_by_key:
                raise ValueError(f"unknown pe_l_exp_key {self.pe_l_exp_key}")
            updates["sigma_l"] = sigma_l_by_key[self.pe_l_exp_key]
            self.pe_sigmas = _dc.replace(self.pe_sigmas, **updates)


@dataclass
class EvalConfig:
    """Validation parameters (reference training/config.py:182-207)."""
    validation_prompts: List[str] = field(
        default_factory=lambda: list(VALIDATION_PROMPTS))
    validation_view_tokens: Optional[List[str]] = None
    num_validation_images: int = 3
    validation_seeds: Optional[List[int]] = field(
        default_factory=lambda: [0, 1, 2])
    validation_steps: int = 250
    num_denoising_steps: int = 30
    dtu_upsample_key: int = 1
    eval_placeholder_object_tokens: Optional[List[str]] = None
    # T2I view-generalization sweep: render free-text objects
    # view-conditioned across all DTU cameras during mode-3 validation.
    # The reference gates this with a hardcoded
    # DO_T2I_GENERALIZATION = False (reference training/validate.py:268);
    # here it is a config flag with the same default.
    do_t2i_generalization: bool = False
    # Abort training after this many CONSECUTIVE validation failures
    # (skip-and-continue otherwise). TPU addition (ADVICE r3): the
    # reference retries only HF-hub ConnectionErrors
    # (reference training/validate.py:426-437); a blanket swallow would
    # let a systematic eval bug silently void a 50k-step run's record.
    max_validation_failures: int = 3

    def __post_init__(self):
        if self.validation_seeds is None:
            self.validation_seeds = list(range(self.num_validation_images))
        assert len(self.validation_seeds) == self.num_validation_images, \
            "Length of validation_seeds should equal num_validation_images"


@dataclass
class OptimConfig:
    """Optimization parameters (reference training/config.py:211-245)."""
    max_train_steps: Optional[int] = 1_000
    learning_rate: float = 1e-3
    scale_lr: bool = True
    train_batch_size: int = 3
    gradient_checkpointing: bool = False
    gradient_accumulation_steps: int = 3
    seed: Optional[int] = None
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-08
    # "no" keeps frozen weights fp32; "bf16" is the TPU-native default used
    # by shipped TPU configs (MXU-friendly).
    mixed_precision: str = "no"
    allow_tf32: bool = False
    # TPU optimization: run the accumulation window as ONE fused batch of
    # train_batch_size * gradient_accumulation_steps. Mathematically
    # identical to sequential microbatches (the mean of per-microbatch
    # mean-gradients equals the fused-batch mean). Mode 3 preserves the
    # reference's per-microbatch scene resampling INSIDE the fused batch:
    # the loader assembles k groups of train_batch_size samples, each
    # group a freshly sampled scene, and TrainBatch.object_idx carries the
    # (k,) per-group bank indices (r3; ~17% higher imgs/sec on v5e,
    # ~10% for mode 3). False = optax.MultiSteps true accumulation.
    fuse_accumulation: bool = True
    # TPU optimization: lax.scan this many optimizer steps inside one jit
    # dispatch (0 = auto). On a tunneled TPU each dispatch/fetch pays a
    # ~30 ms host round-trip; with the device-resident image/latent caches
    # a batch is index-only, so whole windows run device-side. Windows
    # shrink automatically at save/validation/end boundaries.
    steps_per_dispatch: int = 0
    # TPU optimization: run the frozen UNet/VAE conv sections through the
    # fused GroupNorm+SiLU+conv3x3 Pallas kernel (ops/fused_conv.py) on
    # the forward-only paths — the train step's stop_gradient VAE encode,
    # the denoise loop, VAE decode, validation sweeps. None = auto (on
    # when the backend is TPU; CPU keeps the unfused XLA path — the
    # interpreter would crawl). Per-site profitability is gated inside
    # ops.fused_conv (measured, tools/profile_fused_conv.py).
    fuse_conv: Optional[bool] = None


@dataclass
class ParallelConfig:
    """TPU addition: device-mesh parallelism (no reference counterpart —
    the reference's only multi-device path is accelerate DDP, reference
    training/coach.py:772-790). Training dp-shards the (fused) batch and
    optionally tp-shards frozen UNet/CLIP matmul kernels; inference
    dp-shards the camera-view denoise batch."""
    # None = auto: use a mesh whenever more than one device is visible
    use_mesh: Optional[bool] = None
    # 0 = auto (all devices / tp)
    dp: int = 0
    tp: int = 1
    # shard frozen attention/MLP kernels over tp (needs tp > 1)
    tensor_parallel: bool = False


@dataclass
class RunConfig:
    """Top-level trainer configuration (reference training/config.py:249-293).

    learnable_mode:
      0: object only               "A photo of a <object>"
      1: view only                 "<view_x>. A photo of a {object}"
      2: view + object jointly     "<view_x>. A photo of a <object>"
      3: shared view + per-scene objects (multi-scene pretraining)
      4: pretrained view (learnable) + new object
      5: pretrained view (frozen)  + new object
    """
    learnable_mode: int = 0
    debug: bool = False
    seed: int = 0
    log: LogConfig = field(default_factory=LogConfig)
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def __post_init__(self):
        if self.optim.train_batch_size > 3:
            raise ValueError(
                "batch size should be 3 and so should grad accumulation")
        if self.learnable_mode == 3:
            assert self.data.super_category_object_tokens is not None
            if self.eval.eval_placeholder_object_tokens is not None:
                assert all(
                    d in self.data.placeholder_object_tokens
                    for d in self.eval.eval_placeholder_object_tokens
                ), ("eval.eval_placeholder_tokens not in "
                    "data.placeholder_object_tokens")
        if self.data.placeholder_object_tokens is not None:
            assert len(self.data.placeholder_object_tokens) == len(
                set(self.data.placeholder_object_tokens)), \
                "cfg.data.placeholder_object_tokens must be unique strings"
        if self.learnable_mode in (4, 5):
            assert (self.model.pretrained_view_mapper
                    or self.model.pretrained_view_mapper_key)
            if self.model.pretrained_view_mapper_key:
                self.model.pretrained_view_mapper = Path(
                    lookup_pretrained_models[str(
                        self.model.pretrained_view_mapper_key)])


@dataclass
class InferenceConfig:
    """Offline-inference configuration (reference scripts/inference.py:36-57
    InferenceConfig) — drivable from a YAML file + dot-overrides exactly
    like training (input_configs/inference.yaml)."""
    # which checkpoint iteration to load
    iteration: Optional[int] = None
    # experiment directory holding the saved mappers/embeddings
    input_dir: Optional[Path] = None
    # where to save inference results (default: <input_dir>/inference)
    inference_dir: Optional[Path] = None
    seeds: List[int] = field(default_factory=lambda: [42])
    # mode-3 only: which scene tokens to evaluate (default: from the
    # pretrained model's config)
    eval_placeholder_object_tokens: List[str] = field(default_factory=list)
    # fp16/bf16 -> bf16 on TPU; fp32 keeps float32
    torch_dtype: str = "fp16"
    num_denoising_steps: int = 30
    debug: int = 0
    # TPU additions (no reference counterpart)
    calibration_dir: Optional[str] = None
    masks_root: Optional[str] = None
    lpips_weights: Optional[str] = None

    def __post_init__(self):
        if self.inference_dir is None and self.input_dir is not None:
            self.inference_dir = Path(self.input_dir) / "inference"


# ---------------------------------------------------------------------------
# Decoding / encoding machinery (pyrallis-equivalent subset)
# ---------------------------------------------------------------------------

def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    if origin is Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
        return tp, True
    return tp, False


def _decode_value(tp, value):
    if value is None:
        return None
    tp, _ = _unwrap_optional(tp)
    origin = typing.get_origin(tp)
    if is_dataclass(tp):
        return decode(tp, value)
    if origin in (list, List):
        (elem_tp,) = typing.get_args(tp) or (Any,)
        return [_decode_value(elem_tp, v) for v in value]
    if origin in (dict, Dict):
        args = typing.get_args(tp)
        if args:
            _, val_tp = args
            return {k: _decode_value(val_tp, v) for k, v in value.items()}
        return dict(value)
    if tp is Path:
        return Path(value)
    if tp is bool:
        if isinstance(value, str):
            return value.lower() in ('1', 'true', 'yes', 'on')
        return bool(value)
    if tp is int:
        return int(value)
    if tp is float:
        return float(value)
    if tp is str:
        return str(value)
    if origin is Union:  # e.g. Union[str, Path]
        return value
    return value


def decode(cls, data: Dict[str, Any]):
    """Build dataclass `cls` from a (possibly nested) plain dict."""
    if data is None:
        data = {}
    kwargs = {}
    field_map = {f.name: f for f in fields(cls)}
    unknown = set(data) - set(field_map)
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {unknown}")
    for name, f in field_map.items():
        if name in data:
            kwargs[name] = _decode_value(f.type if not isinstance(f.type, str)
                                         else typing.get_type_hints(cls)[name],
                                         data[name])
    return cls(**kwargs)


def encode(obj) -> Any:
    """Dataclass tree -> plain YAML-safe dict (pyrallis.encode parity)."""
    if is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: encode(getattr(obj, f.name)) for f in fields(obj)}
    if isinstance(obj, Path):
        return str(obj)
    if isinstance(obj, (list, tuple)):
        return [encode(v) for v in obj]
    if isinstance(obj, dict):
        return {k: encode(v) for k, v in obj.items()}
    return obj


def _parse_scalar(s: str):
    # YAML 1.1 boolifies yes/no/on/off — but "no" is a legal value for
    # optim.mixed_precision (reference surface). Keep those as strings;
    # bool fields still coerce them in _decode_value.
    if s.lower() in ("yes", "no", "on", "off"):
        return s
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def _set_dotted(d: Dict[str, Any], dotted: str, value: Any):
    keys = dotted.split('.')
    cur = d
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def parse_cli(argv: Optional[List[str]] = None, cls=RunConfig):
    """pyrallis-style CLI: --config_path file.yaml --section.key value."""
    if argv is None:
        argv = sys.argv[1:]
    data: Dict[str, Any] = {}
    i = 0
    config_path = None
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith('--'):
            raise ValueError(f"unexpected argument {arg!r}")
        key = arg[2:]
        if '=' in key:
            key, raw = key.split('=', 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise ValueError(f"missing value for --{key}")
            raw = argv[i + 1]
            i += 2
        if key == 'config_path':
            config_path = Path(raw)
        else:
            _set_dotted(data, key, _parse_scalar(raw))
    base: Dict[str, Any] = {}
    if config_path is not None:
        with open(config_path) as f:
            base = yaml.safe_load(f) or {}
    _deep_update(base, data)
    return decode(cls, base)


def _deep_update(base: Dict[str, Any], extra: Dict[str, Any]):
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v


def load_config(path: Union[str, Path]) -> RunConfig:
    with open(path) as f:
        return decode(RunConfig, yaml.safe_load(f) or {})


def dump_config(cfg: RunConfig, path: Union[str, Path]) -> None:
    with open(path, 'w') as f:
        yaml.safe_dump(encode(cfg), f, sort_keys=False)
