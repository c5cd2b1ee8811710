"""LoRA adapter utilities: merge trained adapters into the base kernels.

Deployment closure for ``GPT3Config.lora_rank`` (models/gpt3.py): after
finetuning, ``merge_lora(params, cfg)`` folds every ``lora_<name>_{a,b}``
pair into its base kernel (``W' = W + (alpha/r) * a @ b`` reshaped to the
kernel's layout) and drops the adapter params, so serving runs the plain
rank-0 model — no extra matmuls per step, and the merged tree can then go
through ``quantize_gpt3_decoder`` like any base checkpoint.

Reference has no analog (its decoder is all-frozen or all-trained,
distributed_gpt3.py:88-95).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

def lora_pair(mod, name: str, rank: int, in_dim: int, out_dim: int,
              init_std: float = 0.02):
    """Create (a, b) adapter params on `mod` for projection `name`, or
    None when rank <= 0.  b is zero-init so rank>0 starts as a no-op."""
    if rank <= 0:
        return None
    import flax.linen as nn

    a = mod.param(f"lora_{name}_a",
                  nn.initializers.normal(stddev=init_std), (in_dim, rank))
    b = mod.param(f"lora_{name}_b", nn.initializers.zeros, (rank, out_dim))
    return a, b


def lora_delta(pair, x, rank: int, alpha: float, dtype):
    """alpha/r-scaled low-rank delta (x @ a) @ b, or None."""
    if pair is None:
        return None
    a, b = pair
    xa = jnp.einsum("...h,hr->...r", x, a.astype(dtype))
    return jnp.einsum("...r,rk->...k", xa, b.astype(dtype)) * jnp.asarray(
        alpha / rank, dtype)


# adapter name -> base kernel param name (decoder merge map)
_TARGET_KERNEL = {
    "qkv": "qkv_kernel",
    "out": "out_kernel",       # decoder attention out projection
    "proj": "proj_kernel",     # vision attention out projection
    "fc1": "fc1_kernel",
    "fc2": "fc2_kernel",
}


def _merge_module(mod: dict, scale: float) -> dict:
    out = {}
    for k, v in mod.items():
        if isinstance(v, dict):
            out[k] = _merge_module(v, scale)
            continue
        if k.startswith("lora_"):
            # every adapter must have a fold target — never drop one
            name = k[len("lora_"):].rsplit("_", 1)[0]
            if name not in _TARGET_KERNEL:
                raise ValueError(f"no merge target for adapter {k!r}")
            continue  # folded below
        out[k] = v
    for name, kernel_name in _TARGET_KERNEL.items():
        a = mod.get(f"lora_{name}_a")
        b = mod.get(f"lora_{name}_b")
        if a is None or b is None:
            continue
        kernel = out[kernel_name]
        # handle the scan-stacked leading layer dim: a [..., in, r],
        # b [..., r, out_flat]; kernel may be higher-rank (qkv [h,3,n,d],
        # out [n,d,h]) — fold through a flat 2-D view of its trailing dims
        delta = jnp.einsum("...ir,...ro->...io", a, b) * scale
        lead = kernel.shape[:a.ndim - 2]  # scan dims ([] or [L])
        flat = kernel.reshape(lead + (a.shape[-2], b.shape[-1]))
        merged = (flat.astype(jnp.float32)
                  + delta.astype(jnp.float32)).astype(kernel.dtype)
        out[kernel_name] = merged.reshape(kernel.shape)
    return out


def merge_lora(params: Any, lora_rank: int, lora_alpha: float = 16.0):
    """Fold lora_* adapters into base kernels; returns a rank-0 tree."""
    if lora_rank <= 0:
        return params
    scale = float(lora_alpha) / float(lora_rank)
    return _merge_module(dict(params), scale)


def extract_adapters(params: Any) -> dict:
    """Pull every lora_* leaf out of a param tree into a flat
    {path: array} dict — a portable adapter file is a few MB instead of
    the multi-GB base checkpoint (np.savez(**extract_adapters(p)))."""
    keystr = jax.tree_util.keystr
    return {keystr(p): x
            for p, x in jax.tree_util.tree_leaves_with_path(params)
            if "lora_" in keystr(p)}


def inject_adapters(params: Any, adapters: dict) -> Any:
    """Inverse of extract_adapters: write the flat adapter dict back onto
    a (freshly initialized or base) param tree; raises on any adapter
    path missing from the tree or shape mismatch."""
    keystr = jax.tree_util.keystr
    seen = set()

    def put(path, x):
        k = keystr(path)
        if k in adapters:
            seen.add(k)
            a = jnp.asarray(adapters[k])
            if a.shape != x.shape:
                raise ValueError(f"adapter {k}: shape {a.shape} != "
                                 f"param {x.shape}")
            return a.astype(x.dtype)
        return x

    out = jax.tree_util.tree_map_with_path(put, params)
    missing = set(adapters) - seen
    if missing:
        raise ValueError(f"adapter paths not in the param tree: "
                         f"{sorted(missing)[:5]}")
    return out
