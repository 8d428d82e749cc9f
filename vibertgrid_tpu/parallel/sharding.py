"""Parameter partitioning rules (optional tensor parallelism).

The reference never shards weights (SURVEY §2.1: DP only, model ~150M
params); on TPU a ``model`` mesh axis is nearly free to support, so the BERT
encoder gets Megatron-style rules — attention QKV and FFN-in kernels split on
the output feature dim, attention-out and FFN-out kernels on the input dim —
letting GSPMD insert the pair of all-reduces per layer over ICI. Everything
else (CNN, heads, embeddings) stays replicated; at this model scale that is
the right trade.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple[str, ...], leaf) -> P:
    keys = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(keys)
    if "bert_model" in keys and "attention" in keys:
        if any(k in keys for k in ("query", "key", "value")):
            return P(None, "model") if leaf.ndim == 2 else P("model")
        if "out" in keys:
            return P("model", None) if leaf.ndim == 2 else P()
    if "bert_model" in keys and "intermediate" in keys:
        return P(None, "model") if leaf.ndim == 2 else P("model")
    if "bert_model" in keys and joined.endswith(("output/kernel",)):
        return P("model", None)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedShardings for a param tree (TP on BERT, replicated elsewhere)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def apply_shardings(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def optimizer_state_shardings(opt_state, mesh: Mesh, min_size: int = 2**16):
    """ZeRO-1-style NamedShardings for optimizer state.

    Beyond the reference (SURVEY §2.1: full-replica optimizers): each large
    optimizer-state leaf (Adam m/v, SGD momentum — together 2-3× the param
    bytes in fp32) is sharded over the ``data`` axis on its first
    axis divisible by the axis size; small/indivisible leaves replicate.
    With replicated params GSPMD all-gathers the sharded update at apply
    time — the classic ZeRO-1 trade of one gather per step for an
    N×-smaller optimizer-state footprint per chip.
    """
    n_data = mesh.shape["data"]

    def spec_for(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.size < min_size:
            return P()
        for ax in range(leaf.ndim):
            if leaf.shape[ax] % n_data == 0:
                return P(*([None] * ax + ["data"]))
        return P()

    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, spec_for(leaf)), opt_state
    )


def shard_optimizer_state(opt_state, mesh: Mesh, min_size: int = 2**16):
    """Place optimizer state with :func:`optimizer_state_shardings`."""
    shardings = optimizer_state_shardings(opt_state, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, opt_state, shardings)
