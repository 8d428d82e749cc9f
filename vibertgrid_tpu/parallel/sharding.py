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
