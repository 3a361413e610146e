"""Device mesh + sharding rules (DP primary, optional TP) — SPMD via GSPMD.

The reference's only distribution strategy is Lightning DDP over NCCL
(`/root/reference/main_id_embed.py:597`; SURVEY §2.5).  The TPU equivalent is
a 1-D ``data`` mesh over ICI: batch sharded, frozen params replicated, and the
tiny MLP gradients all-reduced by XLA (bytes — negligible on ICI).

Beyond parity, a 2-D ``(data, model)`` mesh is supported: UNet/CLIP attention
QKV and MLP weights shard column-parallel on 'model' with row-parallel output
projections (Megatron layout), expressed purely as parameter
``PartitionSpec`` rules — GSPMD inserts the all-reduces.  No module code
changes; layouts ride ``NamedSharding`` on the param pytree.
"""
from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style tensor-parallel rules: (regex on the flattened param path,
# PartitionSpec). First match wins; default replicated.
_TP_RULES = [
    # attention: column-parallel QKV, row-parallel output
    (re.compile(r"(to_q|to_k|to_v|q_proj|k_proj|v_proj)/kernel"), P(None, "model")),
    (re.compile(r"(to_q|to_k|to_v|q_proj|k_proj|v_proj)/bias"), P("model")),
    (re.compile(r"(to_out|out_proj)/kernel"), P("model", None)),
    # MLP: column then row
    (re.compile(r"(ff/proj_in|fc1)/kernel"), P(None, "model")),
    (re.compile(r"(ff/proj_in|fc1)/bias"), P("model")),
    (re.compile(r"(ff/proj_out|fc2)/kernel"), P("model", None)),
]

# Conv channel-parallel rules — OFF by default.  scripts/audit_tp_rules.py
# (4x2 virtual mesh, full train step) measured: dp-only 5 collectives,
# attention/MLP TP 89, + conv rules 163 — the conv specs add 74 collectives
# (29 extra all-gathers) that are pure activation reshards around GroupNorm
# and skip-concats, with no matching all-reduce savings.  Kept opt-in for
# experimentation on real pods (conv_tp=True).
_TP_CONV_RULES = [
    (re.compile(r"(conv1)/kernel"), P(None, None, None, "model")),
    (re.compile(r"(conv1)/bias"), P("model")),
    (re.compile(r"(conv2|skip)/kernel"), P(None, None, "model", None)),
]


def param_partition_spec(path: str, ndim: int, use_tp: bool,
                         conv_tp: bool = False) -> P:
    if use_tp:
        rules = _TP_RULES + (_TP_CONV_RULES if conv_tp else [])
        for rx, spec in rules:
            if rx.search(path):
                if len([s for s in spec if s is not None]) and ndim == len(spec):
                    return spec
    return P()


# FSDP-style weight sharding: no reference counterpart (DDP replicates);
# this is the TPU-native memory-scaling lever — shard each large frozen
# leaf over 'data' and let GSPMD all-gather it at use.  Per-chip frozen
# memory drops ~Nx (3.4GB fp32 -> 0.43GB on a v5e-8) at the cost of one
# weights all-gather per step, which overlaps compute on ICI.
_FSDP_MIN_SIZE = 2 ** 20  # leaves under 1M elements stay replicated


def fsdp_partition_spec(shape, n_data: int,
                        min_size: int = _FSDP_MIN_SIZE) -> P:
    """Shard the largest n_data-divisible axis over 'data'; small or
    indivisible leaves stay replicated."""
    size = int(np.prod(shape)) if shape else 0
    if size < min_size:
        return P()
    for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
        if shape[d] % n_data == 0:
            spec = [None] * len(shape)
            spec[d] = "data"
            return P(*spec)
    return P()


def shard_params(params: Any, mesh: Mesh, use_tp: bool = False,
                 conv_tp: bool = False, fsdp: bool = False) -> Any:
    """Place a param pytree on the mesh (replicated, TP-sharded if 2-D,
    and/or FSDP-sharded over 'data' for leaves no TP rule claimed)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    n_data = mesh.shape["data"]
    out = []
    for path, leaf in flat:
        name = jax.tree_util.keystr(path, simple=True, separator="/")
        spec = param_partition_spec(name, getattr(leaf, "ndim", 0), use_tp,
                                    conv_tp)
        if fsdp and spec == P():
            spec = fsdp_partition_spec(getattr(leaf, "shape", ()), n_data)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def param_shardings(params: Any, mesh: Mesh, use_tp: bool = False,
                    conv_tp: bool = False, fsdp: bool = False) -> Any:
    """The NamedSharding pytree (for jit in_shardings) without placing data."""
    n_data = mesh.shape["data"]

    def one(path, leaf):
        name = jax.tree_util.keystr(path, simple=True, separator="/")
        spec = param_partition_spec(name, getattr(leaf, "ndim", 0),
                                    use_tp, conv_tp)
        if fsdp and spec == P():
            spec = fsdp_partition_spec(getattr(leaf, "shape", ()), n_data)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(one, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array's leading (batch) axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
