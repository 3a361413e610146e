"""x_transformer (full generality) torch state_dict -> Flax bridge.

Counterpart of :mod:`celebbasis_tpu.models.xtransformer` — maps a reference
``TransformerWrapper`` state_dict (`/root/reference/ldm/modules/
x_transformer.py:549-650`) with ANY knob combination onto our param tree.
The hot BERT default path keeps its dedicated converter
(``bridge.convert_bert_text``); this one resolves the same layer plan the
reference's ``AttentionLayers.__init__`` builds (rezero ``.1.fn`` nesting,
macaron ``Scale`` nesting, per-norm param shapes, GRU residual cells,
talking-heads/mem-kv extras, ``to_logits``/``memory_tokens``).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from celebbasis_tpu.models.xtransformer import XTConfig, XTWrapperConfig
from celebbasis_tpu.utils.bridge import KeyMap, unflatten


def convert_xtransformer(state: Dict[str, np.ndarray], wcfg: XTWrapperConfig,
                         cfg: XTConfig, prefix: str = "") -> Dict:
    """Any-knob TransformerWrapper state_dict -> XTransformerWrapper params."""
    src = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    km = KeyMap(src)

    km.put("token_emb", km.take("token_emb.weight"))
    if wcfg.use_pos_emb and not cfg.position_infused_attn:
        km.put("pos_emb", km.take("pos_emb.emb.weight"))
    emb_dim = wcfg.emb_dim if wcfg.emb_dim is not None else cfg.dim
    if emb_dim != cfg.dim:
        km.linear("project_emb", "project_emb")
    if wcfg.num_memory_tokens > 0:
        km.put("memory_tokens", km.take("memory_tokens"))
    if cfg.position_infused_attn:
        km.take("attn_layers.pia_pos_emb.inv_freq")  # deterministic buffer,
        # recomputed on the fly by _sinusoid — consume so unused() stays clean
    km.norm("norm/LayerNorm_0", "norm")
    if km.has("to_logits.weight"):      # absent under tie_embedding (:584)
        km.linear("to_logits", "to_logits")

    for ind, lt in enumerate(cfg.layer_types):
        t = f"attn_layers.layers.{ind}"
        dst = f"attn_layers/layers_{ind}"
        # norm slot .0
        if cfg.use_rezero:
            pass                         # Identity norm, gate handled below
        elif cfg.use_scalenorm or cfg.use_rmsnorm:
            km.put(f"{dst}_norm/g", km.take(f"{t}.0.g"))
        else:
            km.norm(f"{dst}_norm/LayerNorm_0", f"{t}.0")
        # block slot .1 (rezero wraps attention in .1.fn; macaron wraps the
        # FF in Scale's .1.fn)
        blk = f"{t}.1"
        if lt in ("a", "c"):
            if cfg.use_rezero:
                km.put(f"{dst}_rezero_g", km.take(f"{blk}.g"))
                blk = f"{blk}.fn"
            for p in ("to_q", "to_k", "to_v"):
                km.linear(f"{dst}_attn/{p}", f"{blk}.{p}", bias=False)
            if cfg.on_attn:
                km.linear(f"{dst}_attn/to_out", f"{blk}.to_out.0")
            else:
                km.linear(f"{dst}_attn/to_out", f"{blk}.to_out")
            if cfg.talking_heads:
                km.put(f"{dst}_attn/pre_softmax_proj",
                       km.take(f"{blk}.pre_softmax_proj"))
                km.put(f"{dst}_attn/post_softmax_proj",
                       km.take(f"{blk}.post_softmax_proj"))
            if cfg.num_mem_kv > 0:
                km.put(f"{dst}_attn/mem_k", km.take(f"{blk}.mem_k"))
                km.put(f"{dst}_attn/mem_v", km.take(f"{blk}.mem_v"))
        elif lt == "f":
            if cfg.macaron:
                blk = f"{blk}.fn"
            if cfg.ff_glu:
                km.linear(f"{dst}_ff/proj", f"{blk}.net.0.proj")
            else:
                km.linear(f"{dst}_ff/fc1", f"{blk}.net.0.0")
            km.linear(f"{dst}_ff/fc2", f"{blk}.net.2")
        # residual slot .2
        if cfg.gate_residual:
            g = f"{t}.2.gru"
            km.put(f"{dst}_gru/weight_ih", km.take(f"{g}.weight_ih"))
            km.put(f"{dst}_gru/weight_hh", km.take(f"{g}.weight_hh"))
            km.put(f"{dst}_gru/bias_ih", km.take(f"{g}.bias_ih"))
            km.put(f"{dst}_gru/bias_hh", km.take(f"{g}.bias_hh"))

    leftover = km.unused()
    if leftover:
        raise ValueError(f"unmapped x_transformer keys: {leftover[:8]}")
    return {"params": unflatten(km.out)}
