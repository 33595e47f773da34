"""Mesh sharding plans: tensor/data parallelism via jax.sharding.

TPU-native replacement for both the reference's single-node TP plan
(/root/reference/src/backend/tensor_parallel.rs:13-409 — head/FFN column and
row splits, explicit all_reduce/all_gather) and its gRPC distributed stack
(/root/reference/src/distributed/): weights are annotated with NamedSharding
over a ("data", "model") mesh and GSPMD inserts the collectives (psum after
row-parallel matmuls, all-gathers where needed), overlapped with compute.
Each host loads its own shard straight from the GGUF file — no coordinator
streaming weights over the wire (SURVEY.md §2.4).

Plan (Megatron-style, matching shard_weight row/col split semantics):
  wq/wk/wv, ffn gate/up:  column-parallel (shard N / output features)
  wo, ffn down:           row-parallel   (shard K / input features)
  embed, output:          shard vocab dim
  norms, biases of row-parallel layers: replicated
  KV cache: heads over "model" when divisible, batch over "data"
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.linear import DenseLinear, QuantLinear

REPLICATED = P()


def make_mesh(n_model: int | None = None, n_data: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def _col(mesh):  # shard output-feature dim
    return NamedSharding(mesh, P(None, "model"))


def _row(mesh):  # shard input-feature dim
    return NamedSharding(mesh, P("model", None))


def _rep(mesh):
    return NamedSharding(mesh, REPLICATED)


def _shard_linear(lin, mesh, kind: str):
    """kind: 'col' | 'row'. Works for DenseLinear and QuantLinear (packed,
    scales and mins all share the [K', N] layout). Falls back to replication
    when the sharded dim is not divisible by the mesh (ShardingPlan
    divisibility checks, reference tensor_parallel.rs:70-104)."""
    n_model = mesh.shape["model"]
    col = kind == "col"
    k_, n_ = lin.shape if isinstance(lin, DenseLinear) else (lin.k, lin.n)
    dim = n_ if col else k_
    if dim % n_model != 0:
        kind = "rep"
    if kind == "rep":
        r = _rep(mesh)
        if isinstance(lin, QuantLinear):
            return QuantLinear(
                packed=jax.device_put(lin.packed, r),
                scales=jax.device_put(lin.scales, r),
                mins=jax.device_put(lin.mins, r) if lin.mins is not None else None,
                bias=jax.device_put(lin.bias, r) if lin.bias is not None else None,
                fmt=lin.fmt, group=lin.group, k=lin.k, n=lin.n,
                source_type=lin.source_type,
            )
        return DenseLinear(
            jax.device_put(lin.weight, r),
            jax.device_put(lin.bias, r) if lin.bias is not None else None,
        )
    mat = _col(mesh) if col else _row(mesh)
    # bias adds after the matmul: column-parallel bias is sharded over model,
    # row-parallel bias must be replicated (added after the psum)
    bias_s = NamedSharding(mesh, P("model")) if col else _rep(mesh)

    def put(x, s):
        return jax.device_put(x, s) if x is not None else None

    if isinstance(lin, QuantLinear):
        return QuantLinear(
            packed=put(lin.packed, mat),
            scales=put(lin.scales, mat),
            mins=put(lin.mins, mat),
            bias=put(lin.bias, bias_s),
            fmt=lin.fmt, group=lin.group, k=lin.k, n=lin.n,
            source_type=lin.source_type,
        )
    assert isinstance(lin, DenseLinear)
    return DenseLinear(put(lin.weight, mat), put(lin.bias, bias_s))


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Apply the TP plan to a built model params pytree (in place copy)."""
    rep = _rep(mesh)

    def rep_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), tree,
            is_leaf=lambda x: isinstance(x, (DenseLinear, QuantLinear)),
        ) if tree is not None else None

    out: dict[str, Any] = {}
    out["embed"] = jax.device_put(params["embed"], _rep(mesh))
    out["final_norm"] = rep_tree(params["final_norm"])
    out["output"] = (
        _shard_linear(params["output"], mesh, "col")
        if params.get("output") is not None else None
    )

    layers = []
    for layer in params["layers"]:
        nl: dict[str, Any] = {}
        for key in ("attn_norm", "ffn_norm", "post_attn_norm", "post_ffn_norm"):
            if key in layer:
                nl[key] = rep_tree(layer[key])
        if "attn" in layer:
            attn = dict(layer["attn"])
            na = {}
            if "wqkv" in attn:
                # unfuse for TP: a fused projection would make the q/k/v
                # output slices cross shard boundaries (extra collectives)
                from ..ops.linear import unfuse_linear

                wqkv = attn.pop("wqkv")
                wq, wk, wv = unfuse_linear(wqkv, list(wqkv.splits))
                attn.update(wq=wq, wk=wk, wv=wv)
            for key in ("wq", "wk", "wv"):
                na[key] = _shard_linear(attn[key], mesh, "col")
            na["wo"] = _shard_linear(attn["wo"], mesh, "row")
            for key in ("q_norm", "k_norm", "sinks"):
                if key in attn:
                    na[key] = jax.device_put(attn[key], rep)
            if "gate" in attn:
                na["gate"] = _shard_linear(attn["gate"], mesh, "col")
            nl["attn"] = na
        if "deltanet" in layer:
            nl["deltanet"] = rep_tree(layer["deltanet"])
        if "ffn" in layer:
            nl["ffn"] = _shard_ffn(layer["ffn"], mesh)
        # anything not covered above (e.g. mamba ssm_* weights) must not be
        # silently dropped: replicate it
        for key, value in layer.items():
            if key not in nl:
                nl[key] = rep_tree(value)
        layers.append(nl)
    out["layers"] = layers
    return out


def _shard_ffn(ffn: dict, mesh: Mesh) -> dict:
    rep = _rep(mesh)
    out: dict[str, Any] = {}
    if "router" in ffn:  # MoE: shard experts over model dim (expert parallel)
        # the router is tiny — replicate it
        out["router"] = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), ffn["router"],
            is_leaf=lambda x: isinstance(x, (DenseLinear, QuantLinear)))
        exp_s = NamedSharding(mesh, P("model", None, None))
        out["experts"] = {
            k: jax.device_put(v, exp_s) for k, v in ffn["experts"].items()
        }
        if "shared" in ffn:
            out["shared"] = {
                "gate": _shard_linear(ffn["shared"]["gate"], mesh, "col"),
                "up": _shard_linear(ffn["shared"]["up"], mesh, "col"),
                "down": _shard_linear(ffn["shared"]["down"], mesh, "row"),
            }
        if "shared_gate" in ffn:
            out["shared_gate"] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), ffn["shared_gate"],
                is_leaf=lambda x: isinstance(x, (DenseLinear, QuantLinear)))
        return out
    if "gate_up" in ffn:  # unfuse for TP (see attn comment)
        from ..ops.linear import unfuse_linear

        ffn = dict(ffn)
        gu = ffn.pop("gate_up")
        gate, up = unfuse_linear(gu, list(gu.splits))
        ffn.update(gate=gate, up=up)
    if "gate" in ffn:
        out["gate"] = _shard_linear(ffn["gate"], mesh, "col")
    out["up"] = _shard_linear(ffn["up"], mesh, "col")
    out["down"] = _shard_linear(ffn["down"], mesh, "row")
    return out


def shard_kv(kv: dict, mesh: Mesh, num_kv_heads: int) -> dict:
    """KV cache (per-layer [B, S, H, D] tuples): batch over data, heads
    over model when divisible (else replicated heads)."""
    n_model = mesh.shape["model"]
    head_axis = "model" if num_kv_heads % n_model == 0 else None
    batch = kv["k"][0].shape[0]
    batch_axis = "data" if batch % mesh.shape["data"] == 0 else None
    s = NamedSharding(mesh, P(batch_axis, None, head_axis, None))

    def put_layers(t, sharding):
        return tuple(jax.device_put(a, sharding) for a in t)

    out = dict(kv)
    out["k"] = put_layers(kv["k"], s)
    out["v"] = put_layers(kv["v"], s)
    if "k_scale" in kv:  # quantized formats: per-layer [B, S, H] scales
        s3 = NamedSharding(mesh, P(batch_axis, None, head_axis))
        out["k_scale"] = put_layers(kv["k_scale"], s3)
        out["v_scale"] = put_layers(kv["v_scale"], s3)
    if "k_swa" in kv:  # SWA ring stacks: same layout, ring-sized seq axis
        out["k_swa"] = put_layers(kv["k_swa"], s)
        out["v_swa"] = put_layers(kv["v_swa"], s)
        out["swa_pos"] = put_layers(
            kv["swa_pos"], NamedSharding(mesh, P(batch_axis, None)))
    rep = NamedSharding(mesh, P())
    for key in ("deltanet", "mamba"):  # recurrent state: replicated
        if key in kv:
            out[key] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), kv[key]
            )
    return out


def replicate_inputs(mesh: Mesh, *arrays):
    rep = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, rep) for a in arrays)
