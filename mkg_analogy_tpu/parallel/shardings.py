"""Sharding rules: GSPMD PartitionSpecs over the (dp, tp) mesh.

Design (scaling-book recipe): annotate parameter and batch shardings, let
XLA insert the collectives. For this model family the heavy, shardable
dimensions are

- the tied MLM decoder / word-embedding table (~42k rows)  -> vocab over tp
- attention QKV/out projections (heads)                    -> inner dim over tp
- MLP intermediate (3072)                                  -> inner dim over tp
- batch                                                    -> dp

Everything else (LayerNorms, biases of output projections, scalars) is
replicated. Rules are ordered regex -> PartitionSpec over flattened
``path/like/this`` parameter names.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_sharding_rules() -> List[Tuple[str, P]]:
    return [
        # tied embedding table + decoder bias: shard vocab dim
        (r".*word_embeddings$", P("tp", None)),
        (r".*mlm_bias$", P("tp")),
        # attention projections: inner (head) dim on tp
        (r".*attn/(query|key|value)/kernel$", P(None, "tp")),
        (r".*attn/(query|key|value)/bias$", P("tp")),
        (r".*attn/out/kernel$", P("tp", None)),
        # MLP: intermediate dim on tp
        (r".*(intermediate|fc1|fusion_dense)/kernel$", P(None, "tp")),
        (r".*(intermediate|fc1|fusion_dense)/bias$", P("tp")),
        (r".*(output|fc2)/kernel$", P("tp", None)),
        # KGE embedding tables: shard entity/relation dim
        (r".*(ent|rel)_.*embedding.*$", P("tp", None)),
    ]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def shard_params_spec(params: Any, rules=None) -> Any:
    """PartitionSpec pytree matching ``params`` via the rule table.

    A rule only applies if its spec's sharded axes exist on the array (rank
    check); otherwise the param is replicated.
    """
    rules = rules if rules is not None else param_sharding_rules()

    def assign(path, leaf):
        name = _path_str(path)
        for pat, spec in rules:
            if re.match(pat, name):
                if len(spec) <= leaf.ndim:
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_spec(batch: Any) -> Any:
    """Shard every batch array on its leading (batch) dim over dp."""

    def assign(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return P("dp")
        return P()

    return jax.tree_util.tree_map(assign, batch)


def make_shardings(mesh: Mesh, spec_tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
