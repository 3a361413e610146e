"""Torch checkpoint -> Flax param-pytree bridge for the pretrained zoo.

Converts the reference's pretrained weights into this framework's layouts
(SURVEY §7.2 step 1 — "hard part #1: exact key mapping"):

* ``sd-v1-4-full-ema.ckpt`` — keys prefixed ``model.diffusion_model.*``
  (UNet), ``first_stage_model.*`` (VAE), ``cond_stage_model.transformer.*``
  (HF CLIP text), see reference ``ddpm.py:195-217`` / ``main_id_embed.py:25-44``
  (strict=False load);
* ``glint360k_cosface_r100_fp16_0.1/backbone.pth`` — IResNet-100
  (meta_net.py:348-355);

Layout transforms (torch -> TPU-native):
  conv OIHW -> HWIO; linear (out,in) -> (in,out); GroupNorm/LayerNorm/BN
  weight/bias -> scale/bias (+ running stats -> mean/var params for the
  frozen-BN face nets); PReLU weight -> alpha.

Loading uses the torch-free ``pt_io`` reader, so the runtime never imports
torch. Missing keys raise with a precise diff so partial checkpoints surface
immediately instead of silently random-initializing.
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Dict, Iterable, List, Tuple

import numpy as np

from celebbasis_tpu.models.unet import UNetConfig


def _conv(w):   # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):    # (out,in) -> (in,out)
    return np.transpose(w, (1, 0))


class KeyMap:
    """Accumulates src->dst assignments and reports missing/unused keys."""

    _tracked: "List[KeyMap] | None" = None   # see KeyMap.tracking()

    def __init__(self, src: Dict[str, np.ndarray]):
        self.src = src
        self.used = set()
        self.out: Dict[str, np.ndarray] = {}
        if KeyMap._tracked is not None:
            KeyMap._tracked.append(self)

    @classmethod
    @contextmanager
    def tracking(cls):
        """Collect every KeyMap created in the block (scripts/verify_weights.py
        uses this to compute which checkpoint keys a converter consumed)."""
        prev, cls._tracked = cls._tracked, []
        try:
            yield cls._tracked
        finally:
            cls._tracked = prev

    def take(self, key: str) -> np.ndarray:
        if key not in self.src:
            raise KeyError(f"checkpoint missing key: {key}")
        self.used.add(key)
        return np.asarray(self.src[key], np.float32)

    def has(self, key: str, flax_key: str | None = None) -> bool:
        """``flax_key`` is the same leaf's flax-side path — unused here, but
        lets :class:`ExportMap` (which replays the same ``_map_*`` functions
        in reverse) answer existence questions from the flax pytree."""
        del flax_key
        return key in self.src

    def put(self, dst: str, value: np.ndarray):
        self.out[dst] = value

    def conv(self, dst: str, src: str):
        self.put(f"{dst}/kernel", _conv(self.take(f"{src}.weight")))
        if self.has(f"{src}.bias"):
            self.put(f"{dst}/bias", self.take(f"{src}.bias"))

    def linear(self, dst: str, src: str, bias=True):
        self.put(f"{dst}/kernel", _lin(self.take(f"{src}.weight")))
        if bias and self.has(f"{src}.bias"):
            self.put(f"{dst}/bias", self.take(f"{src}.bias"))

    def norm(self, dst: str, src: str):
        self.put(f"{dst}/scale", self.take(f"{src}.weight"))
        self.put(f"{dst}/bias", self.take(f"{src}.bias"))

    def conv1d_lin(self, dst: str, src: str):
        """torch 1x1 conv1d <-> Dense over tokens (AttentionBlock qkv)."""
        self.put(f"{dst}/kernel", _conv1d_lin(self.take(f"{src}.weight")))
        self.put(f"{dst}/bias", self.take(f"{src}.bias"))

    def bn(self, dst: str, src: str):
        self.norm(dst, src)
        self.put(f"{dst}/mean", self.take(f"{src}.running_mean"))
        self.put(f"{dst}/var", self.take(f"{src}.running_var"))

    def unused(self, prefix: str = "") -> List[str]:
        return sorted(k for k in self.src
                      if k.startswith(prefix) and k not in self.used)


def unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    """'a/b/c' keys -> nested dict {'a': {'b': {'c': ...}}}."""
    out: Dict[str, Any] = {}
    for key, val in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of :func:`unflatten`: nested dict -> 'a/b/c' keys."""
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _conv_inv(w):   # HWIO -> OIHW
    return np.transpose(w, (3, 2, 0, 1))


class ExportMap:
    """Inverse :class:`KeyMap`: replays the SAME ``_map_*`` mapping functions
    but reads a Flax param pytree and writes a torch state_dict — so every
    import mapping doubles as an export mapping with zero duplication.
    Argument order matches KeyMap (``dst`` = flax path, ``src`` = torch key).

    Enables the migration path back: first stages trained here
    (``cli/train_ae.py``) load into the reference's torch modules
    (autoencoder.py init_from_ckpt, strict)."""

    def __init__(self, params: Dict):
        if "params" in params and isinstance(params["params"], dict):
            params = params["params"]
        self.src = flatten(params)
        self.used: set = set()
        self.out: Dict[str, np.ndarray] = {}

    def take(self, flax_key: str) -> np.ndarray:
        if flax_key not in self.src:
            raise KeyError(f"flax params missing key: {flax_key}")
        self.used.add(flax_key)
        return np.asarray(self.src[flax_key], np.float32)

    def has(self, torch_key: str, flax_key: str | None = None) -> bool:
        assert flax_key is not None, (
            "export-mode existence checks need the flax key "
            f"(asked about {torch_key!r})")
        return flax_key in self.src

    def conv(self, dst: str, src: str):
        self.out[f"{src}.weight"] = _conv_inv(self.take(f"{dst}/kernel"))
        if f"{dst}/bias" in self.src:
            self.out[f"{src}.bias"] = self.take(f"{dst}/bias")

    def linear(self, dst: str, src: str, bias: bool = True):
        self.out[f"{src}.weight"] = _lin(self.take(f"{dst}/kernel"))
        if bias and f"{dst}/bias" in self.src:
            self.out[f"{src}.bias"] = self.take(f"{dst}/bias")

    def norm(self, dst: str, src: str):
        self.out[f"{src}.weight"] = self.take(f"{dst}/scale")
        self.out[f"{src}.bias"] = self.take(f"{dst}/bias")

    def conv1d_lin(self, dst: str, src: str):
        w = self.take(f"{dst}/kernel")           # (in, out)
        self.out[f"{src}.weight"] = np.transpose(w, (1, 0))[:, :, None]
        self.out[f"{src}.bias"] = self.take(f"{dst}/bias")

    def unused(self, prefix: str = "") -> List[str]:
        return sorted(k for k in self.src
                      if k.startswith(prefix) and k not in self.used)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _map_resblock(km: KeyMap, dst: str, src: str):
    km.norm(f"{dst}/norm1/GroupNorm_0", f"{src}.in_layers.0")
    km.conv(f"{dst}/conv1", f"{src}.in_layers.2")
    km.linear(f"{dst}/emb_proj", f"{src}.emb_layers.1")
    km.norm(f"{dst}/norm2/GroupNorm_0", f"{src}.out_layers.0")
    km.conv(f"{dst}/conv2/Conv_0", f"{src}.out_layers.3")
    if km.has(f"{src}.skip_connection.weight", f"{dst}/skip/kernel"):
        km.conv(f"{dst}/skip", f"{src}.skip_connection")


def _conv1d_lin(w):   # torch conv1d (out,in,1) -> dense kernel (in,out)
    return np.transpose(w[:, :, 0], (1, 0))


def _map_attnblock(km: KeyMap, dst: str, src: str):
    """Legacy AttentionBlock (openaimodel.py:278-324): 1x1-conv1d qkv and
    proj_out become Dense kernels over the token dim."""
    km.norm(f"{dst}/norm/GroupNorm_0", f"{src}.norm")
    km.conv1d_lin(f"{dst}/qkv", f"{src}.qkv")
    km.conv1d_lin(f"{dst}/proj_out", f"{src}.proj_out")


def _map_spatial(km: KeyMap, dst: str, src: str, depth: int):
    km.norm(f"{dst}/norm/GroupNorm_0", f"{src}.norm")
    km.conv(f"{dst}/proj_in", f"{src}.proj_in")
    for d in range(depth):
        b_src = f"{src}.transformer_blocks.{d}"
        b_dst = f"{dst}/block_{d}"
        for n in (1, 2, 3):
            km.norm(f"{b_dst}/norm{n}/LayerNorm_0", f"{b_src}.norm{n}")
        for a in ("attn1", "attn2"):
            km.linear(f"{b_dst}/{a}/to_q", f"{b_src}.{a}.to_q", bias=False)
            km.linear(f"{b_dst}/{a}/to_k", f"{b_src}.{a}.to_k", bias=False)
            km.linear(f"{b_dst}/{a}/to_v", f"{b_src}.{a}.to_v", bias=False)
            km.linear(f"{b_dst}/{a}/to_out", f"{b_src}.{a}.to_out.0")
        km.linear(f"{b_dst}/ff/proj_in", f"{b_src}.ff.net.0.proj")
        km.linear(f"{b_dst}/ff/proj_out", f"{b_src}.ff.net.2")
    km.conv(f"{dst}/proj_out", f"{src}.proj_out")


def convert_unet(state: Dict[str, np.ndarray],
                 cfg: UNetConfig = UNetConfig.sd_v1(),
                 prefix: str = "model.diffusion_model.") -> Dict:
    src = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    km = KeyMap(src)
    _map_unet(km, cfg)
    return {"params": unflatten(km.out)}


def export_unet(params: Dict, cfg: UNetConfig = UNetConfig.sd_v1(),
                prefix: str = "model.diffusion_model."
                ) -> Dict[str, np.ndarray]:
    """UNetModel Flax params -> reference torch state_dict (openaimodel.py
    layout) — the exact inverse of :func:`convert_unet` via ExportMap."""
    em = ExportMap(params)
    _map_unet(em, cfg)
    return {f"{prefix}{k}": v for k, v in em.out.items()}


def _map_unet(km, cfg: UNetConfig):
    km.linear("time_fc1", "time_embed.0")
    km.linear("time_fc2", "time_embed.2")
    km.conv("conv_in", "input_blocks.0.0")

    def map_attn(dst, src_block):
        if cfg.use_spatial_transformer:
            _map_spatial(km, dst, src_block, cfg.transformer_depth)
        else:
            _map_attnblock(km, dst, src_block)

    idx = 1
    ds = 1
    for level in range(len(cfg.channel_mult)):
        for j in range(cfg.num_res_blocks):
            _map_resblock(km, f"down_{level}_res_{j}", f"input_blocks.{idx}.0")
            if ds in cfg.attention_resolutions:
                map_attn(f"down_{level}_attn_{j}", f"input_blocks.{idx}.1")
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                _map_resblock(km, f"down_{level}_downsample",
                              f"input_blocks.{idx}.0")
            else:
                km.conv(f"down_{level}_downsample", f"input_blocks.{idx}.0.op")
            idx += 1
            ds *= 2

    _map_resblock(km, "mid_res_0", "middle_block.0")
    map_attn("mid_attn", "middle_block.1")
    _map_resblock(km, "mid_res_1", "middle_block.2")

    idx = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for j in range(cfg.num_res_blocks + 1):
            _map_resblock(km, f"up_{level}_res_{j}", f"output_blocks.{idx}.0")
            sub = 1
            if ds in cfg.attention_resolutions:
                map_attn(f"up_{level}_attn_{j}", f"output_blocks.{idx}.{sub}")
                sub += 1
            if j == cfg.num_res_blocks and level != 0:
                if cfg.resblock_updown:
                    _map_resblock(km, f"up_{level}_upsample",
                                  f"output_blocks.{idx}.{sub}")
                else:
                    km.conv(f"up_{level}_upsample",
                            f"output_blocks.{idx}.{sub}.conv")
                ds //= 2
            idx += 1

    km.norm("norm_out/GroupNorm_0", "out.0")
    km.conv("conv_out/Conv_0", "out.2")


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _map_vae_res(km: KeyMap, dst: str, src: str):
    km.norm(f"{dst}/norm1/GroupNorm_0", f"{src}.norm1")
    km.conv(f"{dst}/conv1", f"{src}.conv1")
    km.norm(f"{dst}/norm2/GroupNorm_0", f"{src}.norm2")
    km.conv(f"{dst}/conv2", f"{src}.conv2")
    if km.has(f"{src}.nin_shortcut.weight", f"{dst}/nin_shortcut/kernel"):
        km.conv(f"{dst}/nin_shortcut", f"{src}.nin_shortcut")


def _map_vae_attn(km: KeyMap, dst: str, src: str):
    km.norm(f"{dst}/norm/GroupNorm_0", f"{src}.norm")
    km.conv(f"{dst}/q", f"{src}.q")
    km.conv(f"{dst}/k", f"{src}.k")
    km.conv(f"{dst}/v", f"{src}.v")
    km.conv(f"{dst}/proj_out", f"{src}.proj_out")


def _map_ldm_backbone(km: KeyMap, ch_mult: Tuple[int, ...],
                      num_res_blocks: int,
                      attn_resolutions: Tuple[int, ...] = (),
                      resolution: int = 256,
                      attn_type: str = "vanilla"):
    """Shared ldm Encoder/Decoder mapping (model.py:368-545), including the
    legacy in-level attention at `attn_resolutions` (resolution at level l
    is resolution >> l, for encoder and decoder alike).  ``attn_type='none'``
    skips every attention block (reference make_attn -> nn.Identity:
    vq-f4-noattn, inpainting_big)."""
    n_levels = len(ch_mult)
    no_attn = attn_type == "none"
    # encoder
    km.conv("encoder/conv_in", "encoder.conv_in")
    for l in range(n_levels):
        has_attn = (resolution >> l) in attn_resolutions and not no_attn
        for j in range(num_res_blocks):
            _map_vae_res(km, f"encoder/down_{l}_res_{j}",
                         f"encoder.down.{l}.block.{j}")
            if has_attn:
                _map_vae_attn(km, f"encoder/down_{l}_attn_{j}",
                              f"encoder.down.{l}.attn.{j}")
        if l != n_levels - 1:
            km.conv(f"encoder/down_{l}_downsample",
                    f"encoder.down.{l}.downsample.conv")
    _map_vae_res(km, "encoder/mid_res_0", "encoder.mid.block_1")
    if not no_attn:
        _map_vae_attn(km, "encoder/mid_attn", "encoder.mid.attn_1")
    _map_vae_res(km, "encoder/mid_res_1", "encoder.mid.block_2")
    km.norm("encoder/norm_out/GroupNorm_0", "encoder.norm_out")
    km.conv("encoder/conv_out", "encoder.conv_out")
    # decoder (torch 'up' is indexed by level, iterated in reverse)
    km.conv("decoder/conv_in", "decoder.conv_in")
    _map_vae_res(km, "decoder/mid_res_0", "decoder.mid.block_1")
    if not no_attn:
        _map_vae_attn(km, "decoder/mid_attn", "decoder.mid.attn_1")
    _map_vae_res(km, "decoder/mid_res_1", "decoder.mid.block_2")
    for l in range(n_levels):
        has_attn = (resolution >> l) in attn_resolutions and not no_attn
        for j in range(num_res_blocks + 1):
            _map_vae_res(km, f"decoder/up_{l}_res_{j}",
                         f"decoder.up.{l}.block.{j}")
            if has_attn:
                _map_vae_attn(km, f"decoder/up_{l}_attn_{j}",
                              f"decoder.up.{l}.attn.{j}")
        if l != 0:
            km.conv(f"decoder/up_{l}_upsample",
                    f"decoder.up.{l}.upsample.conv")
    km.norm("decoder/norm_out/GroupNorm_0", "decoder.norm_out")
    km.conv("decoder/conv_out", "decoder.conv_out")


def convert_vae(state: Dict[str, np.ndarray],
                ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
                num_res_blocks: int = 2,
                prefix: str = "first_stage_model.",
                attn_resolutions: Tuple[int, ...] = (),
                resolution: int = 256,
                attn_type: str = "vanilla") -> Dict:
    src = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    km = KeyMap(src)
    _map_ldm_backbone(km, ch_mult, num_res_blocks, attn_resolutions,
                      resolution, attn_type)
    km.conv("quant_conv", "quant_conv")
    km.conv("post_quant_conv", "post_quant_conv")
    return {"params": unflatten(km.out)}


def convert_vq(state: Dict[str, np.ndarray],
               ch_mult: Tuple[int, ...],
               num_res_blocks: int,
               prefix: str = "first_stage_model.",
               attn_resolutions: Tuple[int, ...] = (),
               resolution: int = 256,
               attn_type: str = "vanilla") -> Dict:
    """VQModel(Interface) checkpoint (autoencoder.py:14-120) -> Flax pytree.

    Same backbone mapping as the KL VAE plus the codebook
    (``quantize.embedding.weight`` — taming VectorQuantizer2)."""
    src = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    km = KeyMap(src)
    _map_ldm_backbone(km, ch_mult, num_res_blocks, attn_resolutions,
                      resolution, attn_type)
    km.conv("quant_conv", "quant_conv")
    km.conv("post_quant_conv", "post_quant_conv")
    km.put("quantize/embedding", km.take("quantize.embedding.weight"))
    return {"params": unflatten(km.out)}


# ---------------------------------------------------------------------------
# BERT-path text encoder (x_transformer TransformerWrapper layout)
# ---------------------------------------------------------------------------

def export_vae(params: Dict,
               ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
               num_res_blocks: int = 2,
               attn_resolutions: Tuple[int, ...] = (),
               resolution: int = 256,
               attn_type: str = "vanilla") -> Dict[str, np.ndarray]:
    """AutoencoderKL Flax params -> reference torch state_dict
    (autoencoder.py:284-330 layout; loads with strict=True)."""
    em = ExportMap(params)
    _map_ldm_backbone(em, ch_mult, num_res_blocks, attn_resolutions,
                      resolution, attn_type)
    em.conv("quant_conv", "quant_conv")
    em.conv("post_quant_conv", "post_quant_conv")
    return em.out


def export_vq(params: Dict,
              ch_mult: Tuple[int, ...],
              num_res_blocks: int,
              attn_resolutions: Tuple[int, ...] = (),
              resolution: int = 256,
              attn_type: str = "vanilla") -> Dict[str, np.ndarray]:
    """VQModel(Interface) Flax params -> reference torch state_dict
    (autoencoder.py:14-120 + taming codebook)."""
    em = ExportMap(params)
    _map_ldm_backbone(em, ch_mult, num_res_blocks, attn_resolutions,
                      resolution, attn_type)
    em.conv("quant_conv", "quant_conv")
    em.conv("post_quant_conv", "post_quant_conv")
    em.out["quantize.embedding.weight"] = em.take("quantize/embedding")
    return em.out


def convert_bert_text(state: Dict[str, np.ndarray], depth: int,
                      prefix: str = "cond_stage_model.transformer.") -> Dict:
    """x_transformer TransformerWrapper (x_transformer.py:549-650) -> Flax.

    Layer list alternates attention/feedforward entries, each stored as
    ModuleList([norm, block, residual]); ``to_logits`` is skipped — the
    embedder runs with return_embeddings=True."""
    src = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    km = KeyMap(src)
    km.put("token_emb", km.take("token_emb.weight"))
    km.put("pos_emb", km.take("pos_emb.emb.weight"))
    for i in range(depth):
        a, f = f"attn_layers.layers.{2 * i}", f"attn_layers.layers.{2 * i + 1}"
        km.norm(f"attn_ln_{i}/LayerNorm_0", f"{a}.0")
        for p in ("to_q", "to_k", "to_v"):
            km.linear(f"attn_{i}/{p}", f"{a}.1.{p}", bias=False)
        km.linear(f"attn_{i}/to_out", f"{a}.1.to_out")
        km.norm(f"ff_ln_{i}/LayerNorm_0", f"{f}.0")
        km.linear(f"ff_{i}/fc1", f"{f}.1.net.0.0")
        km.linear(f"ff_{i}/fc2", f"{f}.1.net.2")
    km.norm("norm_out/LayerNorm_0", "norm")
    return {"params": unflatten(km.out)}


def export_bert_text(params: Dict, depth: int,
                     prefix: str = "cond_stage_model.transformer."
                     ) -> Dict[str, np.ndarray]:
    """BERTTextEncoder Flax params -> x_transformer TransformerWrapper
    state_dict — inverse of :func:`convert_bert_text`."""
    em = ExportMap(params)
    em.out["token_emb.weight"] = em.take("token_emb")
    em.out["pos_emb.emb.weight"] = em.take("pos_emb")
    for i in range(depth):
        a, f = f"attn_layers.layers.{2 * i}", f"attn_layers.layers.{2 * i + 1}"
        em.norm(f"attn_ln_{i}/LayerNorm_0", f"{a}.0")
        for p in ("to_q", "to_k", "to_v"):
            em.linear(f"attn_{i}/{p}", f"{a}.1.{p}", bias=False)
        em.linear(f"attn_{i}/to_out", f"{a}.1.to_out")
        em.norm(f"ff_ln_{i}/LayerNorm_0", f"{f}.0")
        em.linear(f"ff_{i}/fc1", f"{f}.1.net.0.0")
        em.linear(f"ff_{i}/fc2", f"{f}.1.net.2")
    em.norm("norm_out/LayerNorm_0", "norm")
    return {f"{prefix}{k}": v for k, v in em.out.items()}


def convert_encoder_unet(state: Dict[str, np.ndarray],
                         cfg: "UNetConfig", pool: str = "adaptive",
                         prefix: str = "model.") -> Dict:
    """EncoderUNetModel checkpoint (openaimodel.py:745-958) -> Flax pytree.
    The encoder half of convert_unet plus the pooling head."""
    src = {k[len(prefix):]: v for k, v in state.items()
           if k.startswith(prefix)}
    km = KeyMap(src)
    km.linear("time_fc1", "time_embed.0")
    km.linear("time_fc2", "time_embed.2")
    km.conv("conv_in", "input_blocks.0.0")
    idx, ds = 1, 1
    for level in range(len(cfg.channel_mult)):
        for j in range(cfg.num_res_blocks):
            _map_resblock(km, f"down_{level}_res_{j}", f"input_blocks.{idx}.0")
            if ds in cfg.attention_resolutions:
                _map_attnblock(km, f"down_{level}_attn_{j}",
                               f"input_blocks.{idx}.1")
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                _map_resblock(km, f"down_{level}_downsample",
                              f"input_blocks.{idx}.0")
            else:
                km.conv(f"down_{level}_downsample", f"input_blocks.{idx}.0.op")
            idx += 1
            ds *= 2
    _map_resblock(km, "mid_res_0", "middle_block.0")
    _map_attnblock(km, "mid_attn", "middle_block.1")
    _map_resblock(km, "mid_res_1", "middle_block.2")
    if pool == "adaptive":
        km.norm("norm_out/GroupNorm_0", "out.0")
        km.conv("conv_out/Conv_0", "out.3")
    elif pool == "attention":
        km.norm("norm_out/GroupNorm_0", "out.0")
        km.put("attn_pool/pos_emb",
               np.transpose(km.take("out.2.positional_embedding"), (1, 0)))
        km.put("attn_pool/qkv/kernel",
               _conv1d_lin(km.take("out.2.qkv_proj.weight")))
        km.put("attn_pool/qkv/bias", km.take("out.2.qkv_proj.bias"))
        km.put("attn_pool/c_proj/kernel",
               _conv1d_lin(km.take("out.2.c_proj.weight")))
        km.put("attn_pool/c_proj/bias", km.take("out.2.c_proj.bias"))
    elif pool == "spatial":
        km.linear("fc1", "out.0")
        km.linear("fc2", "out.2")
    elif pool == "spatial_v2":
        km.linear("fc1", "out.0")
        km.norm("fc_norm/GroupNorm_0", "out.1")
        km.linear("fc2", "out.3")
    return {"params": unflatten(km.out)}


# ---------------------------------------------------------------------------
# VGG16 / LPIPS (torchvision + taming layouts)
# ---------------------------------------------------------------------------

# conv indices inside torchvision vgg16.features (pools/relus interleave)
_VGG16_FEATURE_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_vgg16(state: Dict[str, np.ndarray],
                  prefix: str = "") -> Dict:
    """torchvision ``vgg16().features`` state_dict -> ``VGG16Features``
    params (models/lpips.py).  Only the conv trunk — the classifier head is
    ignored, as LPIPS never uses it."""
    src = {k[len(prefix):]: v for k, v in state.items()
           if k.startswith(prefix)}
    km = KeyMap(src)
    for j, i in enumerate(_VGG16_FEATURE_IDX):
        km.conv(f"conv_{j}", f"features.{i}")
    return {"params": unflatten(km.out)}


def convert_lpips(state: Dict[str, np.ndarray],
                  vgg_state: Dict[str, np.ndarray],
                  prefix: str = "") -> Dict:
    """taming/official LPIPS checkpoint (lin heads ``lin{i}.model.1.weight``,
    a 1x1 no-bias conv (1, C, 1, 1)) + a torchvision VGG16 state_dict ->
    ``LPIPS`` variables.  The heads collapse to per-channel weight vectors —
    the same contraction (models/lpips.py:75-81)."""
    src = {k[len(prefix):]: v for k, v in state.items()
           if k.startswith(prefix)}
    km = KeyMap(src)
    out: Dict[str, Any] = {}
    for i in range(5):
        w = km.take(f"lin{i}.model.1.weight")   # (1, C, 1, 1)
        out[f"lin_{i}"] = w[0, :, 0, 0]
    out["vgg"] = convert_vgg16(vgg_state)["params"]
    return {"params": out}


# ---------------------------------------------------------------------------
# CLIP text encoder (HF layout)
# ---------------------------------------------------------------------------

def convert_clip_text(state: Dict[str, np.ndarray], layers: int = 12,
                      prefix: str = "cond_stage_model.transformer.") -> Dict:
    src = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    # accept both with and without the leading 'text_model.'
    if any(k.startswith("text_model.") for k in src):
        src = {k[len("text_model."):]: v for k, v in src.items()
               if k.startswith("text_model.")}
    km = KeyMap(src)
    km.put("token_embedding/embedding",
           km.take("embeddings.token_embedding.weight"))
    km.put("position_embedding",
           km.take("embeddings.position_embedding.weight"))
    for i in range(layers):
        s = f"encoder.layers.{i}"
        d = f"layer_{i}"
        km.norm(f"{d}/ln1/LayerNorm_0", f"{s}.layer_norm1")
        km.norm(f"{d}/ln2/LayerNorm_0", f"{s}.layer_norm2")
        km.linear(f"{d}/q_proj", f"{s}.self_attn.q_proj")
        km.linear(f"{d}/k_proj", f"{s}.self_attn.k_proj")
        km.linear(f"{d}/v_proj", f"{s}.self_attn.v_proj")
        km.linear(f"{d}/out_proj", f"{s}.self_attn.out_proj")
        km.linear(f"{d}/fc1", f"{s}.mlp.fc1")
        km.linear(f"{d}/fc2", f"{s}.mlp.fc2")
    km.norm("final_ln/LayerNorm_0", "final_layer_norm")
    return {"params": unflatten(km.out)}


# ---------------------------------------------------------------------------
# IResNet (insightface layout)
# ---------------------------------------------------------------------------

def convert_iresnet(state: Dict[str, np.ndarray],
                    layers: Tuple[int, ...] = (3, 13, 30, 3)) -> Dict:
    km = KeyMap(dict(state))
    km.conv("stem_conv", "conv1")
    km.bn("stem_bn", "bn1")
    km.put("stem_prelu/alpha", km.take("prelu.weight"))
    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            s = f"layer{li + 1}.{bi}"
            d = f"layer{li + 1}_block{bi}"
            km.bn(f"{d}/bn1", f"{s}.bn1")
            km.conv(f"{d}/conv1", f"{s}.conv1")
            km.bn(f"{d}/bn2", f"{s}.bn2")
            km.put(f"{d}/prelu/alpha", km.take(f"{s}.prelu.weight"))
            km.conv(f"{d}/conv2", f"{s}.conv2")
            km.bn(f"{d}/bn3", f"{s}.bn3")
            if km.has(f"{s}.downsample.0.weight"):
                km.conv(f"{d}/down_conv", f"{s}.downsample.0")
                km.bn(f"{d}/down_bn", f"{s}.downsample.1")
    km.bn("head_bn", "bn2")
    # torch flattens NCHW (channel-major); we flatten NHWC — reorder the fc
    # input dimension from (C, H, W) to (H, W, C) before transposing.
    fc_w = km.take("fc.weight")          # (out, C*H*W)
    C = km.take("bn2.running_mean").shape[0]
    hw = fc_w.shape[1] // C
    s = int(np.sqrt(hw))
    assert s * s == hw, (fc_w.shape, C)
    fc_w = fc_w.reshape(fc_w.shape[0], C, s, s).transpose(0, 2, 3, 1)
    km.put("fc/kernel", _lin(fc_w.reshape(fc_w.shape[0], -1)))
    km.put("fc/bias", km.take("fc.bias"))
    km.bn("features", "features")
    return {"params": unflatten(km.out)}


# ---------------------------------------------------------------------------
# Full SD checkpoint
# ---------------------------------------------------------------------------

def load_sd_checkpoint(path: str, unet_cfg: UNetConfig = UNetConfig.sd_v1()
                       ) -> Dict:
    """sd-v1-4 .ckpt -> {"unet","vae","clip"} param pytrees."""
    from celebbasis_tpu.utils.pt_io import load_pt
    ckpt = load_pt(path)
    state = ckpt.get("state_dict", ckpt)
    state = {k: v for k, v in state.items() if isinstance(v, np.ndarray)}
    return {
        "unet": convert_unet(state, unet_cfg),
        "vae": convert_vae(state),
        "clip": convert_clip_text(state),
    }
