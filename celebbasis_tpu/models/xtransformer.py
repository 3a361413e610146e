"""Full x_transformer library generality — Flax.

Parity target: the reference's complete stripped x-transformers copy
(`/root/reference/ldm/modules/x_transformer.py:1-650`), every knob — not just
the BERTEmbedder-used default path (that hot path lives in
``models/bert_text.py`` with the flash-attention core and stays the one the
legacy LDM configs instantiate).  This module is the *generality* layer: a
user of the reference library can bring any ``TransformerWrapper(Encoder(...))``
configuration here and get the same numbers.

Covered knobs, with reference lines:
* norms: LayerNorm / ScaleNorm / RMSNorm / Rezero (x_transformer.py:139-161,
  128-136, 417-422) — note the reference wraps the rezero gate around
  *attention layers only* (``isinstance(layer, Attention)``, :467-468); FF
  layers run ungated with Identity norm.  Replicated.
* layer plans: default / cross_attend / only_cross (:424-429), custom_layers
  (:434-435), par_ratio PAR blocks (:436-446), sandwich_coef (:447-449).
* macaron (:431-432, 463): **the reference's own macaron path raises** —
  its ``Scale.forward`` tuple-unpacks the FF's plain tensor
  (``x, *rest = self.fn(x)``, :123-125) and then adds a tuple to the
  residual.  We implement the intended semantics (pre-block FF scaled 0.5);
  tests/test_xtransformer.py pins that the reference raises TypeError.
* attention extras: talking heads (:246-249,326-327,356-357), sparse_topk
  (:344-349), num_mem_kv memory key/values (:258-262,311-316), on_attn GLU
  output (:265-266), causal masking with mem offset (:336-342), input/context
  masks (:302-309), residual_attn / cross_residual_attn pre-softmax
  accumulation (:321-322,523-526), shortformer per-layer ``mems``
  (:286-288,496-512) and position-infused sinusoidal embeddings with query
  offset (:290-294,405-406).
* pre_norm=False post-norm placement (:507-529), gate_residual GRU gating
  (:168-179,470-473).
* wrapper: emb_dim != dim projection (:578), tie_embedding logits (:584),
  num_memory_tokens prepend + mask pad (:586-594,624-630), use_pos_emb=False,
  return_embeddings / return_mems (max_mem_len truncation, :639-643) /
  return_attn (:645-647), and the embedding_manager hook right after token
  lookup (:612-617).

TPU notes: sequences here are tiny (77 tokens) and several knobs need the
explicit score matrix (talking heads, sparse_topk, residual_attn, attention
maps), so this library keeps plain einsum attention in fp32 — correctness
and generality over speed.  Everything is static-shape and jit-clean; the
layer plan is resolved in Python at trace time.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

DEFAULT_DIM_HEAD = 64
_MASK_VALUE = -jnp.finfo(jnp.float32).max  # max_neg_value (:82-83)


# --------------------------------------------------------------------------
# layer plan (AttentionLayers.__init__, :424-453)

def compute_layer_types(depth: int,
                        cross_attend: bool = False,
                        only_cross: bool = False,
                        macaron: bool = False,
                        custom_layers: Optional[Sequence[str]] = None,
                        par_ratio: Optional[int] = None,
                        sandwich_coef: Optional[int] = None) -> Tuple[str, ...]:
    """The reference's layer-plan resolution, verbatim semantics."""
    if cross_attend and not only_cross:
        default_block: Tuple[str, ...] = ("a", "c", "f")
    elif cross_attend and only_cross:
        default_block = ("c", "f")
    else:
        default_block = ("a", "f")
    if macaron:
        default_block = ("f",) + default_block

    if custom_layers is not None:
        return tuple(custom_layers)
    if par_ratio is not None:
        par_depth = depth * len(default_block)
        assert 1 < par_ratio <= par_depth, "par ratio out of range"
        default_block = tuple(t for t in default_block if t != "f")
        par_attn = par_depth // par_ratio
        depth_cut = par_depth * 2 // 3  # PAR paper's 2/3 attention cutoff
        par_width = (depth_cut + depth_cut // par_attn) // par_attn
        assert len(default_block) <= par_width, \
            "default block is too large for par_ratio"
        par_block = default_block + ("f",) * (par_width - len(default_block))
        par_head = par_block * par_attn
        return tuple(par_head) + ("f",) * (par_depth - len(par_head))
    if sandwich_coef is not None:
        assert 0 < sandwich_coef <= depth, \
            "sandwich coefficient should be less than the depth"
        return (("a",) * sandwich_coef
                + default_block * (depth - sandwich_coef)
                + ("f",) * sandwich_coef)
    return default_block * depth


@dataclass(frozen=True)
class XTConfig:
    """AttentionLayers knobs (x_transformer.py:370-394) + attn_/ff_ kwargs."""
    dim: int
    depth: int
    heads: int = 8
    dim_head: int = DEFAULT_DIM_HEAD
    causal: bool = False
    cross_attend: bool = False
    only_cross: bool = False
    use_scalenorm: bool = False
    use_rmsnorm: bool = False
    use_rezero: bool = False
    position_infused_attn: bool = False
    custom_layers: Optional[Tuple[str, ...]] = None
    sandwich_coef: Optional[int] = None
    par_ratio: Optional[int] = None
    residual_attn: bool = False
    cross_residual_attn: bool = False
    macaron: bool = False
    pre_norm: bool = True
    gate_residual: bool = False
    # attn_* kwargs (:215-266)
    talking_heads: bool = False
    sparse_topk: Optional[int] = None
    num_mem_kv: int = 0
    on_attn: bool = False
    # ff_* kwargs (:194-211)
    ff_mult: int = 4
    ff_glu: bool = False

    @property
    def layer_types(self) -> Tuple[str, ...]:
        return compute_layer_types(
            self.depth, self.cross_attend, self.only_cross, self.macaron,
            self.custom_layers, self.par_ratio, self.sandwich_coef)

    @property
    def num_attn_layers(self) -> int:
        return sum(1 for t in self.layer_types if t == "a")


# --------------------------------------------------------------------------
# norms

class ScaleNorm(nn.Module):
    """x_transformer.py:139-148 — scalar-g L2 norm, eps clamp."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,), jnp.float32)
        scale = x.shape[-1] ** -0.5
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * scale
        return x / jnp.maximum(norm, self.eps) * g


class RMSNorm(nn.Module):
    """x_transformer.py:151-160 — per-dim g, same clamped-norm formula."""
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        scale = x.shape[-1] ** -0.5
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * scale
        return x / jnp.maximum(norm, self.eps) * g


class _LayerNorm(nn.Module):
    """torch nn.LayerNorm(dim) default: eps 1e-5, affine."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32)(x)


def _sinusoid(n: int, dim: int, offset: int = 0) -> jax.Array:
    """FixedPositionalEmbedding (:39-49): [sin | cos] concat layout."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(n, dtype=jnp.float32) + offset
    sin_inp = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([jnp.sin(sin_inp), jnp.cos(sin_inp)], axis=-1)[None]


# --------------------------------------------------------------------------
# blocks

class XTFeedForward(nn.Module):
    """FeedForward (:194-211): Linear→GELU(exact)→Linear, or GEGLU when glu."""
    mult: int = 4
    glu: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        inner = int(d * self.mult)
        if self.glu:
            h = nn.Dense(inner * 2, param_dtype=jnp.float32, name="proj")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
        else:
            h = nn.Dense(inner, param_dtype=jnp.float32, name="fc1")(x)
            h = nn.gelu(h, approximate=False)
        return nn.Dense(d, param_dtype=jnp.float32, name="fc2")(h)


class XTAttention(nn.Module):
    """Attention (:215-367) with every extra; returns
    (out, pre_softmax_scores, post_softmax_attn)."""
    cfg: XTConfig
    causal: bool = False

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None,
                 pia_emb: bool = False, prev_attn=None, mem=None):
        cfg = self.cfg
        h, dh = cfg.heads, cfg.dim_head
        inner = h * dh
        b, n, d = x.shape
        kv_input = x if context is None else context

        q_input, k_input, v_input = x, kv_input, kv_input
        if mem is not None:  # shortformer per-layer memory (:286-288)
            k_input = jnp.concatenate([mem, k_input], axis=-2)
            v_input = jnp.concatenate([mem, v_input], axis=-2)
        if pia_emb:  # position-infused attention, query offset (:290-294)
            offset = k_input.shape[-2] - q_input.shape[-2]
            q_input = q_input + _sinusoid(q_input.shape[1], d, offset)
            k_input = k_input + _sinusoid(k_input.shape[1], d)

        q = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32,
                     name="to_q")(q_input)
        k = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32,
                     name="to_k")(k_input)
        v = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32,
                     name="to_v")(v_input)
        split = lambda t: t.reshape(b, t.shape[1], h, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        input_mask = None
        if mask is not None or context_mask is not None:
            q_mask = jnp.ones((b, n), bool) if mask is None else mask
            k_mask = q_mask if context is None else context_mask
            if k_mask is None:
                k_mask = jnp.ones((b, k.shape[-2]), bool)
            input_mask = q_mask[:, None, :, None] & k_mask[:, None, None, :]

        if cfg.num_mem_kv > 0:  # learned memory key/values (:258-262,311-316)
            mem_k = self.param("mem_k", nn.initializers.normal(1.0),
                               (h, cfg.num_mem_kv, dh), jnp.float32)
            mem_v = self.param("mem_v", nn.initializers.normal(1.0),
                               (h, cfg.num_mem_kv, dh), jnp.float32)
            k = jnp.concatenate([jnp.broadcast_to(mem_k, (b, *mem_k.shape)), k],
                                axis=-2)
            v = jnp.concatenate([jnp.broadcast_to(mem_v, (b, *mem_v.shape)), v],
                                axis=-2)
            if input_mask is not None:
                input_mask = jnp.pad(
                    input_mask, ((0, 0),) * 3 + ((cfg.num_mem_kv, 0),),
                    constant_values=True)

        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (dh ** -0.5)
        if prev_attn is not None:  # residual attention (:321-322)
            dots = dots + prev_attn
        pre_softmax = dots

        if cfg.talking_heads:  # (:326-327)
            pre_proj = self.param("pre_softmax_proj",
                                  nn.initializers.normal(1.0), (h, h),
                                  jnp.float32)
            dots = jnp.einsum("bhij,hk->bkij", dots, pre_proj)

        if input_mask is not None:
            dots = jnp.where(input_mask, dots, _MASK_VALUE)
        if self.causal:  # mem-offset causal mask (:336-342)
            i, j = dots.shape[-2:]
            r_i = jnp.arange(i)[:, None]
            r_j = jnp.arange(j)[None, :]
            causal_mask = (r_j - (j - i)) > r_i
            dots = jnp.where(causal_mask[None, None], _MASK_VALUE, dots)
        if cfg.sparse_topk is not None and cfg.sparse_topk < dots.shape[-1]:
            top, _ = jax.lax.top_k(dots, cfg.sparse_topk)  # (:344-349)
            vk = top[..., -1:]
            dots = jnp.where(dots < vk, _MASK_VALUE, dots)

        attn = jax.nn.softmax(dots, axis=-1)
        post_softmax = attn
        if cfg.talking_heads:  # (:356-357)
            post_proj = self.param("post_softmax_proj",
                                   nn.initializers.normal(1.0), (h, h),
                                   jnp.float32)
            attn = jnp.einsum("bhij,hk->bkij", attn, post_proj)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if cfg.on_attn:  # GLU output head (:265-266)
            o = nn.Dense(d * 2, param_dtype=jnp.float32, name="to_out")(out)
            a, g = jnp.split(o, 2, axis=-1)
            out = a * jax.nn.sigmoid(g)
        else:
            out = nn.Dense(d, param_dtype=jnp.float32, name="to_out")(out)
        return out, pre_softmax, post_softmax


class _GRUGate(nn.Module):
    """GRUGating (:168-179): torch nn.GRUCell(out, residual) semantics."""

    @nn.compact
    def __call__(self, x, residual):
        d = x.shape[-1]
        w_ih = self.param("weight_ih", nn.initializers.lecun_normal(),
                          (3 * d, d), jnp.float32)
        w_hh = self.param("weight_hh", nn.initializers.lecun_normal(),
                          (3 * d, d), jnp.float32)
        b_ih = self.param("bias_ih", nn.initializers.zeros, (3 * d,),
                          jnp.float32)
        b_hh = self.param("bias_hh", nn.initializers.zeros, (3 * d,),
                          jnp.float32)
        gi = x @ w_ih.T + b_ih
        gh = residual @ w_hh.T + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        nst = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * nst + z * residual


class XTAttentionLayers(nn.Module):
    """AttentionLayers (:370-539): the full layer plan with every knob."""
    cfg: XTConfig

    def _norm(self, name: str):
        cfg = self.cfg
        if cfg.use_rezero:       # norm_fn = Identity (:421)
            return lambda x: x
        if cfg.use_rmsnorm:      # rmsnorm beats scalenorm (:417-418)
            return RMSNorm(name=name)
        if cfg.use_scalenorm:
            return ScaleNorm(name=name)
        return _LayerNorm(name=name)

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None,
                 mems: Optional[List[Optional[jax.Array]]] = None,
                 return_hiddens: bool = False):
        cfg = self.cfg
        layer_types = cfg.layer_types
        mems = list(mems) if mems is not None else [None] * cfg.num_attn_layers

        hiddens, attn_maps = [], []
        prev_attn = prev_cross_attn = None
        for ind, lt in enumerate(layer_types):
            is_last = ind == len(layer_types) - 1
            layer_mem = None
            if lt == "a":
                hiddens.append(x)
                layer_mem = mems.pop(0)

            residual = x
            norm = self._norm(f"layers_{ind}_norm")
            if cfg.pre_norm:
                x = norm(x)

            if lt == "a":
                out, pre, post = XTAttention(
                    cfg, causal=cfg.causal, name=f"layers_{ind}_attn")(
                        x, mask=mask, pia_emb=cfg.position_infused_attn,
                        prev_attn=prev_attn, mem=layer_mem)
            elif lt == "c":
                out, pre, post = XTAttention(
                    cfg, causal=False, name=f"layers_{ind}_attn")(
                        x, context=context, mask=mask,
                        context_mask=context_mask, prev_attn=prev_cross_attn)
            elif lt == "f":
                out = XTFeedForward(cfg.ff_mult, cfg.ff_glu,
                                    name=f"layers_{ind}_ff")(x)
                if cfg.macaron:
                    # intended Scale(0.5) semantics; the reference's own
                    # macaron path raises (see module docstring)
                    out = out * 0.5
            else:
                raise ValueError(f"invalid layer type {lt}")

            if lt in ("a", "c") and cfg.use_rezero:
                g = self.param(f"layers_{ind}_rezero_g",
                               nn.initializers.zeros, (1,), jnp.float32)
                out = out * g  # Rezero wraps attention only (:467-468)

            if cfg.gate_residual:
                x = _GRUGate(name=f"layers_{ind}_gru")(out, residual)
            else:
                x = out + residual

            if lt == "a":
                attn_maps.append(post)
                if cfg.residual_attn:
                    prev_attn = pre
            elif lt == "c":
                attn_maps.append(post)
                if cfg.cross_residual_attn:
                    prev_cross_attn = pre

            if not cfg.pre_norm:
                # torch registers the final layer's norm params even though
                # :528 skips applying it — call and discard to keep the param
                # tree bridge-complete
                y = norm(x)
                if not is_last:
                    x = y

        if return_hiddens:
            return x, (hiddens, attn_maps)
        return x


class XTEncoder(XTAttentionLayers):
    """Encoder (:542-545) — causal must stay False."""

    def __post_init__(self):
        assert not self.cfg.causal, "cannot set causality on encoder"
        super().__post_init__()


@dataclass(frozen=True)
class XTWrapperConfig:
    """TransformerWrapper knobs (:549-594)."""
    num_tokens: int
    max_seq_len: int
    emb_dim: Optional[int] = None
    max_mem_len: int = 0
    num_memory_tokens: int = 0
    tie_embedding: bool = False
    use_pos_emb: bool = True


class XTransformerWrapper(nn.Module):
    """TransformerWrapper (:549-650), every return mode + the TI hook."""
    wcfg: XTWrapperConfig
    cfg: XTConfig

    @nn.compact
    def __call__(self, ids: jax.Array,
                 return_embeddings: bool = False,
                 mask=None, context=None, context_mask=None,
                 mems: Optional[List[jax.Array]] = None,
                 return_mems: bool = False, return_attn: bool = False,
                 inject: Optional[Callable] = None):
        w, cfg = self.wcfg, self.cfg
        b, n = ids.shape
        emb_dim = w.emb_dim if w.emb_dim is not None else cfg.dim

        token_emb = self.param("token_emb", nn.initializers.normal(0.02),
                               (w.num_tokens, emb_dim), jnp.float32)
        x = jnp.take(token_emb, ids, axis=0)
        if inject is not None:  # embedding_manager hook (:612-617)
            x = inject(ids, x)

        if w.use_pos_emb and not cfg.position_infused_attn:
            pos = self.param("pos_emb", nn.initializers.normal(0.02),
                             (w.max_seq_len, emb_dim), jnp.float32)
            x = x + pos[None, :n, :]

        if emb_dim != cfg.dim:  # project_emb (:578)
            x = nn.Dense(cfg.dim, param_dtype=jnp.float32,
                         name="project_emb")(x)

        if w.num_memory_tokens > 0:  # (:586-594,624-630)
            mem_tok = self.param("memory_tokens", nn.initializers.normal(1.0),
                                 (w.num_memory_tokens, cfg.dim), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(mem_tok, (b, *mem_tok.shape)), x], axis=1)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (w.num_memory_tokens, 0)),
                               constant_values=True)

        x, (hiddens, maps) = XTAttentionLayers(cfg, name="attn_layers")(
            x, context=context, mask=mask, context_mask=context_mask,
            mems=mems, return_hiddens=True)
        x = _LayerNorm(name="norm")(x)

        x = x[:, w.num_memory_tokens:]

        if return_embeddings:
            out = x
        elif w.tie_embedding:  # (:584)
            out = x @ token_emb.T
        else:
            out = nn.Dense(w.num_tokens, param_dtype=jnp.float32,
                           name="to_logits")(x)

        if return_mems:  # (:639-643)
            if mems is not None:
                new_mems = [jnp.concatenate(pair, axis=-2)
                            for pair in zip(mems, hiddens)]
            else:
                new_mems = hiddens
            new_mems = [jax.lax.stop_gradient(t[..., -w.max_mem_len:, :])
                        for t in new_mems]
            return out, new_mems
        if return_attn:
            return out, maps
        return out
