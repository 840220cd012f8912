"""HF checkpoint porting: torch/safetensors state dicts -> Flax params.

The reference pulls pretrained weights straight from the HF hub via diffusers
(`src/models.py:22,39,49`); this framework is TPU-native Flax, so checkpoints
are ported once (OIHW->HWIO conv transposes, Linear transposes, GroupNorm
scale/bias renames) and then loaded as Orbax-saveable pytrees.

Name translation handles both the legacy (`query/key/value/proj_attn`) and
current (`to_q/to_k/to_v/to_out.0`) diffusers attention namings.

Entry points:
  * `port_state_dict(state_dict, kind)` — translate a flat torch state dict
    (name -> np.ndarray) into a Flax params pytree for `kind` in
    {"unet2d", "unet2d_cond", "vae", "vq", "clip_text"}.
  * `load_checkpoint_dir(path)` — read a diffusers model directory
    (config.json + *.safetensors / *.bin), build the matching config, and
    return (config_kwargs, params).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_ATTN_QKV = {
    "query": "query", "key": "key", "value": "value", "proj_attn": "proj_attn",
    "to_q": "query", "to_k": "key", "to_v": "value", "to_out.0": "proj_attn",
}


def _translate_resnet(rest: str, prefix: str, w: np.ndarray, out: Dict) -> bool:
    """diffusers ResnetBlock2D param -> our ResnetBlock2D param."""
    m = re.match(r"(norm1|norm2)\.(weight|bias)$", rest)
    if m:
        kind = "scale" if m.group(2) == "weight" else "bias"
        _set(out, (prefix, f"{m.group(1)}_{kind}"), w)
        return True
    m = re.match(r"(conv1|conv2|conv_shortcut)\.(weight|bias)$", rest)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        _set(out, (prefix, m.group(1), name), _conv(w) if name == "kernel" else w)
        return True
    m = re.match(r"time_emb_proj\.(weight|bias)$", rest)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        _set(out, (prefix, "time_emb_proj", name), _linear(w) if name == "kernel" else w)
        return True
    return False


def _translate_attnblock(rest: str, prefix: str, w: np.ndarray, out: Dict) -> bool:
    """diffusers AttentionBlock / VAE Attention -> our AttentionBlock2D."""
    m = re.match(r"group_norm\.(weight|bias)$", rest)
    if m:
        kind = "scale" if m.group(1) == "weight" else "bias"
        _set(out, (prefix, f"group_norm_{kind}"), w)
        return True
    for src, dst in _ATTN_QKV.items():
        m = re.match(rf"{re.escape(src)}\.(weight|bias)$", rest)
        if m:
            name = "kernel" if m.group(1) == "weight" else "bias"
            val = _linear(w) if name == "kernel" else w
            _set(out, (prefix, dst, name), val)
            return True
    return False


def _translate_sampler(rest: str, prefix: str, w: np.ndarray, out: Dict) -> bool:
    m = re.match(r"conv\.(weight|bias)$", rest)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        _set(out, (prefix, "conv", name), _conv(w) if name == "kernel" else w)
        return True
    return False


def _translate_transformer2d(rest: str, prefix: str, w: np.ndarray, out: Dict) -> bool:
    """diffusers Transformer2DModel -> our Transformer2D."""
    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        kind = "scale" if m.group(1) == "weight" else "bias"
        _set(out, (prefix, "norm", kind), w)
        return True
    m = re.match(r"(proj_in|proj_out)\.(weight|bias)$", rest)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        val = w
        if name == "kernel":
            val = _conv(w) if w.ndim == 4 else _linear(w)[None, None]  # 1x1 conv
        _set(out, (prefix, m.group(1), name), val)
        return True
    m = re.match(r"transformer_blocks\.(\d+)\.(.*)$", rest)
    if m:
        block = f"block_{m.group(1)}"
        inner = m.group(2)
        mm = re.match(r"(norm1|norm2|norm3)\.(weight|bias)$", inner)
        if mm:
            kind = "scale" if mm.group(2) == "weight" else "bias"
            _set(out, (prefix, block, mm.group(1), kind), w)
            return True
        mm = re.match(r"(attn1|attn2)\.(to_q|to_k|to_v)\.(weight)$", inner)
        if mm:
            _set(out, (prefix, block, mm.group(1), mm.group(2), "kernel"), _linear(w))
            return True
        mm = re.match(r"(attn1|attn2)\.to_out\.0\.(weight|bias)$", inner)
        if mm:
            name = "kernel" if mm.group(2) == "weight" else "bias"
            _set(out, (prefix, block, mm.group(1), "to_out", name),
                 _linear(w) if name == "kernel" else w)
            return True
        mm = re.match(r"ff\.net\.0\.proj\.(weight|bias)$", inner)
        if mm:
            name = "kernel" if mm.group(1) == "weight" else "bias"
            _set(out, (prefix, block, "ff", "proj", name), _linear(w) if name == "kernel" else w)
            return True
        mm = re.match(r"ff\.net\.2\.(weight|bias)$", inner)
        if mm:
            name = "kernel" if mm.group(1) == "weight" else "bias"
            _set(out, (prefix, block, "ff", "out", name), _linear(w) if name == "kernel" else w)
            return True
    return False


def _translate_unet_key(key: str, w: np.ndarray, out: Dict, conditional: bool) -> bool:
    # conv_in / conv_out
    m = re.match(r"(conv_in|conv_out)\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        _set(out, (m.group(1), name), _conv(w) if name == "kernel" else w)
        return True
    m = re.match(r"conv_norm_out\.(weight|bias)$", key)
    if m:
        kind = "scale" if m.group(1) == "weight" else "bias"
        _set(out, ("conv_norm_out", kind), w)
        return True
    m = re.match(r"time_embedding\.(linear_1|linear_2)\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        _set(out, ("time_embedding", m.group(1), name), _linear(w) if name == "kernel" else w)
        return True
    # down / up blocks
    m = re.match(r"(down|up)_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", key)
    if m:
        prefix = f"{m.group(1)}_{m.group(2)}_resnet_{m.group(3)}"
        return _translate_resnet(m.group(4), prefix, w, out)
    m = re.match(r"(down|up)_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$", key)
    if m:
        prefix = f"{m.group(1)}_{m.group(2)}_attn_{m.group(3)}"
        if conditional:
            return _translate_transformer2d(m.group(4), prefix, w, out)
        return _translate_attnblock(m.group(4), prefix, w, out)
    m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.(.*)$", key)
    if m:
        return _translate_sampler(m.group(2), f"down_{m.group(1)}_downsample", w, out)
    m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.(.*)$", key)
    if m:
        return _translate_sampler(m.group(2), f"up_{m.group(1)}_upsample", w, out)
    # mid block
    m = re.match(r"mid_block\.resnets\.(\d+)\.(.*)$", key)
    if m:
        return _translate_resnet(m.group(2), f"mid_resnet_{m.group(1)}", w, out)
    m = re.match(r"mid_block\.attentions\.0\.(.*)$", key)
    if m:
        if conditional:
            return _translate_transformer2d(m.group(1), "mid_attn", w, out)
        return _translate_attnblock(m.group(1), "mid_attn", w, out)
    return False


def _translate_vae_key(key: str, w: np.ndarray, out: Dict) -> bool:
    m = re.match(r"(quant_conv|post_quant_conv)\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        _set(out, (m.group(1), name), _conv(w) if name == "kernel" else w)
        return True
    m = re.match(r"quantize\.embedding\.weight$", key)
    if m:
        _set(out, ("quantize", "embedding"), w)
        return True
    m = re.match(r"(encoder|decoder)\.(.*)$", key)
    if not m:
        return False
    side, rest = m.group(1), m.group(2)
    sub: Dict[str, Any] = out.setdefault(side, {})
    mm = re.match(r"(conv_in|conv_out)\.(weight|bias)$", rest)
    if mm:
        name = "kernel" if mm.group(2) == "weight" else "bias"
        _set(sub, (mm.group(1), name), _conv(w) if name == "kernel" else w)
        return True
    mm = re.match(r"conv_norm_out\.(weight|bias)$", rest)
    if mm:
        kind = "scale" if mm.group(1) == "weight" else "bias"
        _set(sub, ("conv_norm_out", kind), w)
        return True
    mm = re.match(r"(down|up)_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", rest)
    if mm:
        prefix = f"{mm.group(1)}_{mm.group(2)}_resnet_{mm.group(3)}"
        return _translate_resnet(mm.group(4), prefix, w, sub)
    mm = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.(.*)$", rest)
    if mm:
        return _translate_sampler(mm.group(2), f"down_{mm.group(1)}_downsample", w, sub)
    mm = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.(.*)$", rest)
    if mm:
        return _translate_sampler(mm.group(2), f"up_{mm.group(1)}_upsample", w, sub)
    mm = re.match(r"mid_block\.resnets\.(\d+)\.(.*)$", rest)
    if mm:
        return _translate_resnet(mm.group(2), f"mid_resnet_{mm.group(1)}", w, sub)
    mm = re.match(r"mid_block\.attentions\.0\.(.*)$", rest)
    if mm:
        return _translate_attnblock(mm.group(1), "mid_attn", w, sub)
    return False


def _translate_clip_key(key: str, w: np.ndarray, out: Dict) -> bool:
    key = re.sub(r"^text_model\.", "", key)
    if key == "embeddings.token_embedding.weight":
        _set(out, ("token_embedding", "embedding"), w)
        return True
    if key == "embeddings.position_embedding.weight":
        _set(out, ("position_embedding", "embedding"), w)
        return True
    if key == "embeddings.position_ids":
        return True  # buffer, not a parameter
    m = re.match(r"final_layer_norm\.(weight|bias)$", key)
    if m:
        kind = "scale" if m.group(1) == "weight" else "bias"
        _set(out, ("final_layer_norm", kind), w)
        return True
    m = re.match(r"encoder\.layers\.(\d+)\.(.*)$", key)
    if not m:
        return False
    prefix = f"layer_{m.group(1)}"
    rest = m.group(2)
    mm = re.match(r"self_attn\.(q_proj|k_proj|v_proj|out_proj)\.(weight|bias)$", rest)
    if mm:
        name = "kernel" if mm.group(2) == "weight" else "bias"
        _set(out, (prefix, "self_attn", mm.group(1), name),
             _linear(w) if name == "kernel" else w)
        return True
    mm = re.match(r"(layer_norm1|layer_norm2)\.(weight|bias)$", rest)
    if mm:
        kind = "scale" if mm.group(2) == "weight" else "bias"
        _set(out, (prefix, mm.group(1), kind), w)
        return True
    mm = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", rest)
    if mm:
        name = "kernel" if mm.group(2) == "weight" else "bias"
        _set(out, (prefix, mm.group(1), name), _linear(w) if name == "kernel" else w)
        return True
    return False


_TRANSLATORS = {
    "unet2d": lambda k, w, o: _translate_unet_key(k, w, o, conditional=False),
    "unet2d_cond": lambda k, w, o: _translate_unet_key(k, w, o, conditional=True),
    "vae": _translate_vae_key,
    "vq": _translate_vae_key,
    "clip_text": _translate_clip_key,
}


def port_state_dict(
    state_dict: Dict[str, np.ndarray], kind: str, strict: bool = True
) -> Dict[str, Any]:
    """Translate a flat torch state dict into a {'params': ...} pytree."""
    translate = _TRANSLATORS[kind]
    out: Dict[str, Any] = {}
    unused = []
    for key, value in state_dict.items():
        w = np.asarray(value)
        if not translate(key, w, out):
            unused.append(key)
    if strict and unused:
        raise ValueError(f"Unmapped checkpoint keys ({kind}): {unused[:10]}"
                         f"{'...' if len(unused) > 10 else ''}")
    return {"params": out}


# ---------------------------------------------------------------------------
# Checkpoint-directory loading (HF layout: config.json + weights)
# ---------------------------------------------------------------------------


def _load_weights(model_dir: str) -> Dict[str, np.ndarray]:
    names = sorted(os.listdir(model_dir))
    st_files = [n for n in names if n.endswith(".safetensors")]
    if st_files:
        from safetensors.numpy import load_file

        # Sharded checkpoints ship an index json listing every shard; honor it
        # (otherwise merge every .safetensors file found) so a
        # model-0000X-of-0000N layout loads completely, not one shard.
        index = [n for n in names if n.endswith(".safetensors.index.json")]
        if index:
            with open(os.path.join(model_dir, index[0])) as f:
                st_files = sorted(set(json.load(f)["weight_map"].values()))
        merged: Dict[str, np.ndarray] = {}
        for n in st_files:
            merged.update(load_file(os.path.join(model_dir, n)))
        return merged
    for name in names:
        if name.endswith(".bin") or name.endswith(".pt") or name.endswith(".pth"):
            import torch

            sd = torch.load(os.path.join(model_dir, name), map_location="cpu",
                            weights_only=True)
            if "state_dict" in sd:
                sd = sd["state_dict"]
            return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No weights found in {model_dir}")


def unet2d_config_from_json(cfg: Dict[str, Any]):
    from .unet2d import UNet2DConfig

    return UNet2DConfig(
        sample_size=cfg["sample_size"],
        in_channels=cfg["in_channels"],
        out_channels=cfg["out_channels"],
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        attention_head_dim=cfg.get("attention_head_dim"),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        norm_eps=cfg.get("norm_eps", 1e-6),
        downsample_padding=cfg.get("downsample_padding", 1),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", False),
        freq_shift=cfg.get("freq_shift", 1),
        add_mid_attention=cfg.get("add_attention", True),
    )


def unet2d_cond_config_from_json(cfg: Dict[str, Any]):
    from .unet2d_cond import UNet2DConditionConfig

    return UNet2DConditionConfig(
        sample_size=cfg["sample_size"],
        in_channels=cfg["in_channels"],
        out_channels=cfg["out_channels"],
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        attention_head_dim=cfg.get("attention_head_dim", 8),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        norm_eps=cfg.get("norm_eps", 1e-5),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
    )


def vae_config_from_json(cfg: Dict[str, Any], vq: bool = False):
    from .vae import AutoencoderConfig

    return AutoencoderConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        sample_size=cfg.get("sample_size", 512),
        scaling_factor=cfg.get("scaling_factor", 0.18215 if not vq else 1.0),
        double_z=not vq,
        num_vq_embeddings=cfg.get("num_vq_embeddings", 8192),
        vq_embed_dim=cfg.get("vq_embed_dim") or cfg.get("latent_channels", 3),
    )


def load_checkpoint_dir(model_dir: str, kind: str):
    """Load one diffusers/transformers component directory. Returns
    (config_dataclass, {'params': ...})."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    weights = _load_weights(model_dir)
    params = port_state_dict(weights, kind)
    if kind == "unet2d":
        return unet2d_config_from_json(cfg), params
    if kind == "unet2d_cond":
        return unet2d_cond_config_from_json(cfg), params
    if kind in ("vae", "vq"):
        return vae_config_from_json(cfg, vq=(kind == "vq")), params
    if kind == "clip_text":
        from .clip_text import CLIPTextConfig

        return (
            CLIPTextConfig(
                vocab_size=cfg.get("vocab_size", 49408),
                hidden_size=cfg.get("hidden_size", 768),
                num_layers=cfg.get("num_hidden_layers", 12),
                num_heads=cfg.get("num_attention_heads", 12),
                intermediate_size=cfg.get("intermediate_size", 3072),
                max_position_embeddings=cfg.get("max_position_embeddings", 77),
                hidden_act=cfg.get("hidden_act", "quick_gelu"),
            ),
            params,
        )
    raise ValueError(f"Unknown kind {kind!r}")


# ---------------------------------------------------------------------------
# torchvision-style checkpoints: BiSeNet face-parsing + anyGAN ResNet-50
# (`src/models.py:57-118` loads these with torch.load)
# ---------------------------------------------------------------------------


def _tv_path_to_flax(parts):
    """Map torch module-path components to our flax module names:
    layer1.0 -> layer1_0, downsample.0/1 -> downsample_conv/downsample_bn,
    BatchNorm wrappers live under NormAct name='bnX' -> bnX/bn."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if re.match(r"layer\d+$", p) and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif p == "downsample" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append("downsample_conv" if parts[i + 1] == "0" else "downsample_bn")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def port_torchvision_state_dict(
    state_dict: Dict[str, np.ndarray],
    strict: bool = True,
    skip_prefixes: Tuple[str, ...] = (),
) -> Dict[str, Any]:
    """Generic torch->flax port for conv/bn/linear module trees (covers the
    BiSeNet face-parsing checkpoint and torchvision ResNet-50). Returns
    {'params': ..., 'batch_stats': ...}; BatchNorm modules land under a 'bn'
    subtree (our NormAct wrapper)."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    unused = []
    bn_suffix = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                 "running_mean": ("batch_stats", "mean"),
                 "running_var": ("batch_stats", "var")}
    # group keys by module path to detect BatchNorm modules (have running_mean)
    modules: Dict[str, Dict[str, np.ndarray]] = {}
    for key, w in state_dict.items():
        if any(key.startswith(p) for p in skip_prefixes):
            continue
        if key.endswith("num_batches_tracked"):
            continue
        mod, leaf = key.rsplit(".", 1)
        modules.setdefault(mod, {})[leaf] = np.asarray(w)

    for mod, leaves in modules.items():
        path = _tv_path_to_flax(mod.split("."))
        if "running_mean" in leaves:  # BatchNorm module -> NormAct('...')/bn
            for leaf, w in leaves.items():
                coll, name = bn_suffix[leaf]
                tree = params if coll == "params" else batch_stats
                _set(tree, tuple(path) + ("bn", name), w)
        elif "weight" in leaves and leaves["weight"].ndim == 4:  # Conv
            _set(params, tuple(path) + ("kernel",), _conv(leaves["weight"]))
            if "bias" in leaves:
                _set(params, tuple(path) + ("bias",), leaves["bias"])
        elif "weight" in leaves and leaves["weight"].ndim == 2:  # Linear
            _set(params, tuple(path) + ("kernel",), _linear(leaves["weight"]))
            if "bias" in leaves:
                _set(params, tuple(path) + ("bias",), leaves["bias"])
        elif "weight" in leaves and leaves["weight"].ndim == 1:
            # affine-only norm (no running stats in this checkpoint)
            _set(params, tuple(path) + ("scale",), leaves["weight"])
            if "bias" in leaves:
                _set(params, tuple(path) + ("bias",), leaves["bias"])
        else:
            unused.append(mod)
    if strict and unused:
        raise ValueError(f"Unmapped torch modules: {unused[:10]}")
    return {"params": params, "batch_stats": batch_stats}


def load_bisenet_checkpoint(path: str) -> Dict[str, Any]:
    """Port the face-parsing BiSeNet checkpoint (`79999_iter.pth`,
    src/models.py:83) into our BiSeNet(norm='bn') variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v.numpy()
          for k, v in sd.items()}
    return port_torchvision_state_dict(sd)


def load_anygan_checkpoint(path: str) -> Dict[str, Any]:
    """Port the MIT anycost-gan attribute predictor (torchvision ResNet-50
    with fc->80, `src/models.py:57-77`) into our ResNet50 variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    # torchvision top-level bn1 is a bare module (not inside NormAct naming);
    # our ResNet50 names it bn1/bn via NormAct, which the generic port handles.
    return port_torchvision_state_dict(sd)
