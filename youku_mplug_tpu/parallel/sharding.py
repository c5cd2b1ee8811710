"""Parameter sharding via path-pattern rules (the GSPMD analog of Megatron
Column/Row/VocabParallel layers).

The reference hand-shards each layer type (reference:
modeling_distributed_gpt3.py:843-857 ColumnParallelLinear QKV,
RowParallelLinear output/MLP; :619 VocabParallelEmbedding).  TPU-natively the
model is written as plain einsums and the *same partitioning* is expressed as
``NamedSharding`` rules matched against parameter tree paths; XLA then
inserts exactly the collectives Megatron hand-codes (all-reduce after
row-parallel matmul, etc.).

Tensor-parallel layout for the GPT-3 decoder (hidden H, heads n, ffn F=4H,
vocab V) over mesh axis ``model``:

- qkv kernel        [H, 3, n, d]   shard heads (n)        — column-parallel
- attn out kernel   [n, d, H]      shard heads (n)        — row-parallel
- mlp fc1 kernel    [H, F]         shard F                — column-parallel
- mlp fc2 kernel    [F, H]         shard F                — row-parallel
- token embedding   [V, H]         shard V                — vocab-parallel
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ShardingRules = Sequence[tuple[str, P]]

# Rules are matched first-hit against '/'-joined flax param paths.  Specs
# shorter than the param rank are right-aligned (leading dims — e.g. the
# nn.scan layer axis — stay unsharded), so the same rule covers scanned
# [L, ...] and unrolled [...] layouts.
GPT3_SHARDING_RULES: ShardingRules = (
    # decoder (param shapes: see models/gpt3.py)
    (r".*word_embeddings/embedding$", P("model", None)),
    (r".*attn/qkv_kernel$", P(None, None, "model", None)),
    (r".*attn/qkv_bias$", P(None, "model", None)),
    (r".*attn/out_kernel$", P("model", None, None)),
    (r".*/mlp/fc1_kernel$", P(None, "model")),
    (r".*/mlp/fc1_bias$", P("model")),
    (r".*/mlp/fc2_kernel$", P("model", None)),
    # vision encoder attention (TimeSformer spatial+temporal, PlainBlock,
    # EVA ViT-g — reference eva_vit.py:413-427): heads column-parallel,
    # output projection row-parallel, like the decoder.  Required for the
    # 1.9B EVA-g encoder, which cannot be replicated per device.
    (r".*attn/q_bias$", P("model", None)),
    (r".*attn/v_bias$", P("model", None)),
    (r".*attn/proj_kernel$", P("model", None, None)),
    # everything else (layernorms, embeds, small heads): replicated
    (r".*", P()),
)


# Bloom / mPLUG-Owl tensor-parallel rules (models/bloom.py, models/owl.py).
# Bloom's fused QKV is HEAD-MAJOR [H, n, 3, d] (heads at dim 1, matching
# the HF checkpoint layout) — different from GPT-3's [H, 3, n, d], hence
# a separate rule set.  Abstractor q/k/v projections are column-parallel
# on the output dim, its out projection row-parallel.
BLOOM_SHARDING_RULES: ShardingRules = (
    (r".*word_embeddings/embedding$", P("model", None)),
    # matches both MPLUGOwlVideo's text_decoder/decoder/... and a bare
    # BloomLM's decoder/... paths; vision blocks never contain 'decoder/'
    (r".*decoder/.*attn/qkv_kernel$", P(None, "model", None, None)),
    (r".*decoder/.*attn/qkv_bias$", P("model", None, None)),
    (r".*attn/out_kernel$", P("model", None, None)),
    # vision ViT fused qkv keeps the GPT-3 [D, 3, n, d] layout
    (r".*attn/qkv_kernel$", P(None, None, "model", None)),
    (r".*/mlp/fc1_kernel$", P(None, "model")),
    (r".*/mlp/fc1_bias$", P("model")),
    (r".*/mlp/fc2_kernel$", P("model", None)),
    # visual abstractor (owl.py OwlAbstractorLayer: [d, d] projections;
    # gated MLP w1/w3 column-parallel, w2 row-parallel — ffn_ln sits on
    # the sharded intermediate width, GSPMD inserts the reduction)
    (r".*abstractor.*/(q|k|v)_kernel$", P(None, "model")),
    (r".*abstractor.*/(q|k|v)_bias$", P("model")),
    (r".*abstractor.*/out_kernel$", P("model", None)),
    (r".*abstractor.*/mlp/(w1|w3)_kernel$", P(None, "model")),
    (r".*abstractor.*/mlp/(w1|w3)_bias$", P("model")),
    (r".*abstractor.*/mlp/w2_kernel$", P("model", None)),
    (r".*abstractor.*/mlp/ffn_ln/(scale|bias)$", P("model")),
    # per-frame ViT (same layout as the TimeSformer rules)
    (r".*attn/q_bias$", P("model", None)),
    (r".*attn/v_bias$", P("model", None)),
    (r".*attn/proj_kernel$", P("model", None, None)),
    (r".*", P()),
)


def _match(path: str, rules: ShardingRules) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()


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


def sharding_for_params(params: Any, mesh: Mesh,
                        rules: ShardingRules = GPT3_SHARDING_RULES):
    """Pytree of NamedShardings matching ``params`` via path rules.

    Scanned-layer params (leading layer dim from nn.scan) are handled by the
    rules operating on trailing dims: a spec P(a, b) applied to a rank-3
    scanned kernel [L, x, y] is promoted to P(None, a, b).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf):
        spec = _match(_path_str(path), rules)
        ndim = np.ndim(leaf)
        shape = np.shape(leaf)
        n = len(spec)
        if n < ndim:  # promote: pad leading None (scan dim etc.)
            spec = P(*([None] * (ndim - n) + list(spec)))
        elif n > ndim:
            spec = P(*spec[n - ndim:])
        # drop axes that don't divide the dim evenly (e.g. tiny test vocabs)
        cleaned = []
        for dim, axis in zip(shape, spec):
            if axis is not None and dim % mesh.shape[axis] != 0:
                axis = None
            cleaned.append(axis)
        return NamedSharding(mesh, P(*cleaned))

    specs = {jax.tree_util.keystr(path): spec_for(path, leaf)
             for path, leaf in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path, _: specs[jax.tree_util.keystr(path)], params)


def shard_params(params: Any, mesh: Mesh,
                 rules: ShardingRules = GPT3_SHARDING_RULES):
    """Device-put params with rule-derived shardings."""
    shardings = sharding_for_params(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def data_sharding(mesh: Mesh, *trailing: Any) -> NamedSharding:
    """Batch-dim sharding over the data axis (DistributedSampler analog)."""
    return NamedSharding(mesh, P("data", *trailing))
