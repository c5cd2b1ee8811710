"""One-way PyTorch checkpoint importers.

Replaces the reference's TP-sharded load path (reference:
modeling_distributed_gpt3.py — pre_load per mp_rank file:431-441,
split_state_dict/split_into_partitions:1476-1503) and vision weight
surgery (models/vision_transformer.py — _convert_pretrained_vit:719-728,
resize_pos_embed:731-749, resize_temporal_embed:752-764): torch shards are
merged on host into ONE logical jax param tree; GSPMD handles all runtime
sharding, so mp_rank files never exist on the TPU side.

Layout conventions handled:
- megatron fused QKV is head-major interleaved [(np, 3, hn), H] (the
  distributed model's split, modeling_distributed_gpt3.py:895-903) —
  different from the non-distributed twin's [3, np, hn]!
- column-parallel weights shard dim 0, row-parallel dim 1, vocab dim 0.
- vision qkv.bias splits into q_bias / zero-k / v_bias.
- pos-embed bilinear grid resize + temporal-embed linear resize when the
  target resolution/frame count differs.
"""

from __future__ import annotations

import os
import re
from typing import Dict

import numpy as np

# megatron partition dim per param name suffix (stride is 1 everywhere in
# the GPT-3 configs)
_PARTITION_DIMS = (
    (r"query_key_value\.weight$", 0),
    (r"query_key_value\.bias$", 0),
    (r"attention\.dense\.weight$", 1),
    (r"dense_h_to_4h\.weight$", 0),
    (r"dense_h_to_4h\.bias$", 0),
    (r"dense_4h_to_h\.weight$", 1),
    (r"word_embeddings\.weight$", 0),
)


def _partition_dim(name: str):
    for pat, dim in _PARTITION_DIMS:
        if re.search(pat, name):
            return dim
    return None


def load_torch_gpt3_state(model_dir: str) -> Dict[str, np.ndarray]:
    """Load + merge megatron ``mp_rank_XX_model_states.pt`` shards (or a
    single ``pytorch_model.bin``) into a full numpy state dict."""
    import torch

    model_sub = os.path.join(model_dir, "model")
    shard_files = []
    if os.path.isdir(model_sub):
        shard_files = sorted(
            os.path.join(model_sub, f) for f in os.listdir(model_sub)
            if re.match(r"mp_rank_\d+_model_states\.pt", f))
    if not shard_files:
        single = os.path.join(model_dir, "pytorch_model.bin")
        if os.path.exists(single):
            shard_files = [single]
    if not shard_files:
        raise FileNotFoundError(f"no GPT-3 checkpoint under {model_dir}")

    shards = []
    for f in shard_files:
        sd = torch.load(f, map_location="cpu", weights_only=False)
        for key in ("module", "model", "state_dict"):
            if key in sd:
                sd = sd[key]
        shards.append({k.replace("model.language_model", "language_model"):
                       v for k, v in sd.items()})

    merged = {}
    for name, first in shards[0].items():
        if not hasattr(first, "numpy"):
            continue
        if len(shards) == 1:
            merged[name] = first.float().numpy()
            continue
        dim = _partition_dim(name)
        if dim is None:
            merged[name] = first.float().numpy()
        else:
            import torch as _t

            merged[name] = _t.cat(
                [s[name] for s in shards], dim=dim).float().numpy()
    return merged


def gpt3_params_from_torch(sd: Dict[str, np.ndarray], text_cfg,
                           scan_layers: bool = True,
                           megatron_qkv: bool = True,
                           layer_pairing: bool = False) -> dict:
    """Megatron/twin GPT-3 state dict -> our GPT3LM param tree.

    megatron_qkv: fused QKV rows are (heads, 3, d) interleaved (the
    distributed checkpoints); False means the twin's (3, heads, d).
    """
    h = text_cfg.hidden_size
    n = text_cfg.num_attention_heads
    d = text_cfg.head_dim
    L = text_cfg.num_hidden_layers
    lm = "language_model."
    t = lm + "transformer.layers.{}."

    def qkv_kernel(w):  # [3H, H] -> [H, 3, n, d]
        wt = w.T  # [H, 3H]
        if megatron_qkv:
            return wt.reshape(h, n, 3, d).transpose(0, 2, 1, 3)
        return wt.reshape(h, 3, n, d)

    def qkv_bias(b):  # [3H] -> [3, n, d]
        if megatron_qkv:
            return b.reshape(n, 3, d).transpose(1, 0, 2)
        return b.reshape(3, n, d)

    def layer(i):
        return {
            "ln1_scale": sd[t.format(i) + "input_layernorm.weight"],
            "ln1_bias": sd[t.format(i) + "input_layernorm.bias"],
            "ln2_scale": sd[t.format(i) + "post_attention_layernorm.weight"],
            "ln2_bias": sd[t.format(i) + "post_attention_layernorm.bias"],
            "attn": {
                "qkv_kernel": qkv_kernel(
                    sd[t.format(i) + "attention.query_key_value.weight"]),
                "qkv_bias": qkv_bias(
                    sd[t.format(i) + "attention.query_key_value.bias"]),
                "out_kernel": sd[t.format(i) + "attention.dense.weight"
                                 ].T.reshape(n, d, h),
                "out_bias": sd[t.format(i) + "attention.dense.bias"],
            },
            "mlp": {
                "fc1_kernel": sd[t.format(i) + "mlp.dense_h_to_4h.weight"].T,
                "fc1_bias": sd[t.format(i) + "mlp.dense_h_to_4h.bias"],
                "fc2_kernel": sd[t.format(i) + "mlp.dense_4h_to_h.weight"].T,
                "fc2_bias": sd[t.format(i) + "mlp.dense_4h_to_h.bias"],
            },
        }

    layers = [layer(i) for i in range(L)]
    if scan_layers and layer_pairing:
        # pair-scan layout (GPT3Config.layer_pairing): even layers stack
        # into sublayer 'a', odd into 'b', each [L/2, ...]
        import jax

        layer_tree = {
            "a": jax.tree.map(lambda *xs: np.stack(xs), *layers[0::2]),
            "b": jax.tree.map(lambda *xs: np.stack(xs), *layers[1::2]),
        }
    elif scan_layers:
        import jax

        stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
        layer_tree = stacked
    else:
        layer_tree = {f"layers_{i}": layers[i] for i in range(L)}

    decoder = {
        "position_embeddings": sd[lm + "embedding.position_embeddings."
                                  "weight"]
        if lm + "embedding.position_embeddings.weight" in sd
        else sd[lm + "position_embeddings.weight"],
        "ln_f_scale": sd[lm + "transformer.final_layernorm.weight"],
        "ln_f_bias": sd[lm + "transformer.final_layernorm.bias"],
    }
    if scan_layers:
        decoder["layers"] = layer_tree
    else:
        decoder.update(layer_tree)
    word_key = (lm + "embedding.word_embeddings.weight"
                if lm + "embedding.word_embeddings.weight" in sd
                else lm + "word_embeddings.weight")
    emb = sd[word_key]
    if emb.shape[0] < text_cfg.vocab_size:  # vocab padding
        emb = np.concatenate([
            emb, np.zeros((text_cfg.vocab_size - emb.shape[0],
                           emb.shape[1]), emb.dtype)])
    return {
        "word_embeddings": {"embedding": emb[:text_cfg.vocab_size]},
        "decoder": decoder,
    }


def load_hf_torch_state(model_dir: str,
                        prefix_strip: str = "") -> Dict[str, np.ndarray]:
    """Load an HF-format checkpoint directory: single ``pytorch_model.bin``,
    sharded ``pytorch_model-XXXXX-of-YYYYY.bin`` (disjoint key union — HF
    shards split BY KEY, unlike megatron's by-dimension mp_rank shards),
    or ``*.safetensors``.  Used for the BloomZ-7B / mPLUG-Owl checkpoints
    (reference README.md:118 — ``MAGAer13/mplug-youku-bloomz-7b``)."""
    import torch

    files = sorted(os.listdir(model_dir))
    shard_files = [f for f in files
                   if re.match(r"pytorch_model(-\d+-of-\d+)?\.bin$", f)]
    st_files = [f for f in files if f.endswith(".safetensors")]
    merged: Dict[str, np.ndarray] = {}
    if shard_files:
        for f in shard_files:
            sd = torch.load(os.path.join(model_dir, f), map_location="cpu",
                            weights_only=True)
            for k, v in sd.items():
                if hasattr(v, "numpy"):
                    merged[k] = v.float().numpy()
    elif st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(model_dir, f), framework="np") as sf:
                for k in sf.keys():
                    merged[k] = np.asarray(sf.get_tensor(k), np.float32)
    else:
        raise FileNotFoundError(f"no HF checkpoint under {model_dir}")
    if prefix_strip:
        merged = {(k[len(prefix_strip):] if k.startswith(prefix_strip)
                   else k): v for k, v in merged.items()}
    return merged


def bloom_params_from_torch(sd: Dict[str, np.ndarray], cfg,
                            scan_layers: bool = True) -> dict:
    """HF Bloom state dict -> our BloomLM param tree.

    HF fused QKV rows are HEAD-MAJOR interleaved [n, 3, d]
    (modeling_bloom.py BloomAttention._reshape: view(b, s, n, 3, d)) —
    our qkv_kernel is [H, n, 3, d], so the map is transpose + reshape.
    Accepts keys with or without the ``transformer.`` prefix (BloomModel
    vs BloomForCausalLM checkpoints)."""
    h = cfg.hidden_size
    n = cfg.num_attention_heads
    d = cfg.head_dim
    L = cfg.num_hidden_layers
    if "transformer.word_embeddings.weight" in sd:
        sd = {k[len("transformer."):] if k.startswith("transformer.")
              else k: v for k, v in sd.items()}

    def layer(i):
        t = f"h.{i}."
        return {
            "ln1_scale": sd[t + "input_layernorm.weight"],
            "ln1_bias": sd[t + "input_layernorm.bias"],
            "ln2_scale": sd[t + "post_attention_layernorm.weight"],
            "ln2_bias": sd[t + "post_attention_layernorm.bias"],
            "attn": {
                # [3H, H] -> [H, 3H] -> [H, n, 3, d] (head-major rows)
                "qkv_kernel": sd[
                    t + "self_attention.query_key_value.weight"
                ].T.reshape(h, n, 3, d),
                "qkv_bias": sd[
                    t + "self_attention.query_key_value.bias"
                ].reshape(n, 3, d),
                "out_kernel": sd[t + "self_attention.dense.weight"
                                 ].T.reshape(n, d, h),
                "out_bias": sd[t + "self_attention.dense.bias"],
            },
            "mlp": {
                "fc1_kernel": sd[t + "mlp.dense_h_to_4h.weight"].T,
                "fc1_bias": sd[t + "mlp.dense_h_to_4h.bias"],
                "fc2_kernel": sd[t + "mlp.dense_4h_to_h.weight"].T,
                "fc2_bias": sd[t + "mlp.dense_4h_to_h.bias"],
            },
        }

    layers = [layer(i) for i in range(L)]
    if scan_layers:
        import jax

        layer_tree = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    else:
        layer_tree = {f"layers_{i}": layers[i] for i in range(L)}

    decoder = {
        "emb_ln_scale": sd["word_embeddings_layernorm.weight"],
        "emb_ln_bias": sd["word_embeddings_layernorm.bias"],
        "ln_f_scale": sd["ln_f.weight"],
        "ln_f_bias": sd["ln_f.bias"],
    }
    if scan_layers:
        decoder["layers"] = layer_tree
    else:
        decoder.update(layer_tree)
    emb = sd["word_embeddings.weight"]
    if emb.shape[0] < cfg.vocab_size:
        emb = np.concatenate([
            emb, np.zeros((cfg.vocab_size - emb.shape[0], emb.shape[1]),
                          emb.dtype)])
    return {
        "word_embeddings": {"embedding": emb[:cfg.vocab_size]},
        "decoder": decoder,
    }


def _interp_linear_axis(x: np.ndarray, new_len: int,
                        axis: int) -> np.ndarray:
    """1-D linear interpolation along ``axis`` with torch
    F.interpolate's align_corners=False half-pixel sampling."""
    old = x.shape[axis]
    if old == new_len:
        return x
    src = (np.arange(new_len) + 0.5) * old / new_len - 0.5
    lo = np.clip(np.floor(src).astype(int), 0, old - 1)
    hi = np.clip(lo + 1, 0, old - 1)
    w = np.clip(src - lo, 0.0, 1.0)
    shape = [1] * x.ndim
    shape[axis] = new_len
    w = w.reshape(shape)
    return (np.take(x, lo, axis=axis) * (1 - w)
            + np.take(x, hi, axis=axis) * w)


def resize_pos_embed(posemb: np.ndarray, num_patches_new: int) -> np.ndarray:
    """[1, 1+N_old, D] -> [1, 1+N_new, D], bilinear over the patch grid
    (reference vision_transformer.py:731-749, torch F.interpolate
    mode='bilinear' align_corners=False — bilinear is separable, so two
    half-pixel 1-D passes reproduce it exactly; the previous cv2.resize
    crashed past OpenCV's 512-channel cap, i.e. on every >512-dim ViT)."""
    tok, grid = posemb[:, :1], posemb[0, 1:]
    gs_old = int(np.sqrt(len(grid)))
    gs_new = int(np.sqrt(num_patches_new))
    if gs_old == gs_new:
        return posemb
    grid = grid.reshape(gs_old, gs_old, -1).astype(np.float32)
    grid = _interp_linear_axis(grid, gs_new, axis=0)
    grid = _interp_linear_axis(grid, gs_new, axis=1)
    return np.concatenate(
        [tok, grid.reshape(1, gs_new * gs_new, -1)], axis=1)


def resize_temporal_embed(temb: np.ndarray, t_new: int) -> np.ndarray:
    """[1, T_old, D] -> [1, T_new, D], linear interp (reference
    vision_transformer.py:752-764, torch F.interpolate mode='linear',
    align_corners=False)."""
    return _interp_linear_axis(temb, t_new, axis=1)


def vision_params_from_torch(sd: Dict[str, np.ndarray], vision_cfg) -> dict:
    """timm/CLIP/TimeSformer torch state dict -> our TimeSformer params.

    Applies the reference's conversion: fused qkv.bias -> q/v bias with
    zero k (vision_transformer.py:719-728), pos/temporal embed resize,
    drops classifier heads.  Missing temporal submodules (image-pretrained
    checkpoints) are left absent — the caller merges over freshly
    initialized params.
    """
    dim = vision_cfg.embed_dim
    n = vision_cfg.num_heads
    d = dim // n

    def attn(prefix):
        out = {}
        if prefix + "qkv.weight" not in sd:
            return None
        out["qkv_kernel"] = sd[prefix + "qkv.weight"].T.reshape(dim, 3, n, d)
        if prefix + "qkv.bias" in sd:
            b = sd[prefix + "qkv.bias"]
            out["q_bias"] = b[:dim].reshape(n, d)
            out["v_bias"] = b[2 * dim:].reshape(n, d)
        else:
            out["q_bias"] = sd.get(prefix + "q_bias",
                                   np.zeros(dim, np.float32)).reshape(n, d)
            out["v_bias"] = sd.get(prefix + "v_bias",
                                   np.zeros(dim, np.float32)).reshape(n, d)
        out["proj_kernel"] = sd[prefix + "proj.weight"].T.reshape(n, d, dim)
        out["proj_bias"] = sd[prefix + "proj.bias"]
        return out

    def ln(prefix):
        if prefix + "weight" not in sd:
            return None
        return {"scale": sd[prefix + "weight"], "bias": sd[prefix + "bias"]}

    def mlp(prefix):
        if prefix + "fc1.weight" not in sd:
            return None
        return {"fc1_kernel": sd[prefix + "fc1.weight"].T,
                "fc1_bias": sd[prefix + "fc1.bias"],
                "fc2_kernel": sd[prefix + "fc2.weight"].T,
                "fc2_bias": sd[prefix + "fc2.bias"]}

    params: dict = {}
    if "patch_embed.proj.weight" in sd:
        w = sd["patch_embed.proj.weight"]
        params["patch_embed"] = {"kernel": w.reshape(w.shape[0], -1).T}
        if "patch_embed.proj.bias" in sd:
            params["patch_embed"]["bias"] = sd["patch_embed.proj.bias"]
    if "cls_token" in sd:
        params["cls_token"] = sd["cls_token"]
    if "pos_embed" in sd:
        params["pos_embed"] = resize_pos_embed(
            sd["pos_embed"], vision_cfg.num_patches)
    if "temporal_embed" in sd:
        params["temporal_embed"] = resize_temporal_embed(
            sd["temporal_embed"], vision_cfg.num_frames)
    for name in ("norm", "norm_pre"):
        block = ln(name + ".")
        if block:
            params[name] = block

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}."
        entry = {}
        for sub, fn in (("norm1", ln), ("norm2", ln), ("temporal_ln", ln),
                        ("mlp", mlp)):
            got = fn(b + sub + ".")
            if got:
                entry[sub] = got
        for sub in ("attn", "temporal_attn"):
            got = attn(b + sub + ".")
            if got:
                entry[sub] = got
        if b + "temporal_fc.weight" in sd:
            entry["temporal_fc_kernel"] = sd[b + "temporal_fc.weight"].T
            entry["temporal_fc_bias"] = sd[b + "temporal_fc.bias"]
        params[f"blocks_{i}"] = entry
        i += 1
    return params


def merge_into(params: dict, imported: dict, prefix="") -> int:
    """Recursively overwrite matching leaves of ``params`` with
    ``imported`` (shape-checked); returns number of leaves replaced."""
    import jax.numpy as jnp

    count = 0
    for k, v in imported.items():
        if k not in params:
            continue
        if isinstance(v, dict):
            count += merge_into(params[k], v, prefix + k + "/")
        else:
            tgt = params[k]
            if tuple(np.shape(v)) != tuple(np.shape(tgt)):
                raise ValueError(
                    f"shape mismatch at {prefix}{k}: "
                    f"{np.shape(v)} vs {np.shape(tgt)}")
            params[k] = jnp.asarray(v, dtype=tgt.dtype)
            count += 1
    return count


# canonical external abstractor naming (MplugOwlVisualAbstractor* module
# tree, the MAGAer13/mplug-owl* checkpoint family): per-layer suffix ->
# (our param path under abstractor/layers_{i}, transpose-linear-weight?)
_OWL_LAYER_MAP = {
    "crossattention.norm1": ("norm_q", False),
    "crossattention.normk": ("norm_kv", False),
    "crossattention.attention.query": ("q", True),
    "crossattention.attention.key": ("k", True),
    "crossattention.attention.value": ("v", True),
    "crossattention.output.out_proj": ("out", True),
    "crossattention.output.norm2": ("norm_mlp", False),
    "crossattention.output.mlp.w1": ("mlp/w1", True),
    "crossattention.output.mlp.w2": ("mlp/w2", True),
    "crossattention.output.mlp.w3": ("mlp/w3", True),
    "crossattention.output.mlp.ffn_ln": ("mlp/ffn_ln", False),
}

# fallback keyword classifier for naming drift between checkpoint
# releases: ordered (so 'normk' wins over 'k'); each entry is
# (keyword set matched against '.'-split name tokens, target, linear?)
_OWL_FALLBACK = (
    ({"norm1"}, "norm_q", False),
    ({"normk"}, "norm_kv", False),
    ({"norm_k"}, "norm_kv", False),
    ({"norm2"}, "norm_mlp", False),
    ({"ffn_ln"}, "mlp/ffn_ln", False),
    ({"w1"}, "mlp/w1", True),
    ({"w2"}, "mlp/w2", True),
    ({"w3"}, "mlp/w3", True),
    ({"fc1"}, "mlp/w1", True),
    ({"fc2"}, "mlp/w2", True),
    ({"query"}, "q", True),
    ({"q_proj"}, "q", True),
    ({"key"}, "k", True),
    ({"k_proj"}, "k", True),
    ({"value"}, "v", True),
    ({"v_proj"}, "v", True),
    ({"out_proj"}, "out", True),
    ({"o_proj"}, "out", True),
    ({"dense"}, "out", True),
)

_OWL_LAYER_RE = re.compile(r"(?:^|\.)layers?[._](\d+)\.")


def _owl_assign(tree: dict, path: str, value, *, linear: bool,
                is_weight: bool):
    """Place one external tensor at ``path`` ('a/b/c') in ``tree``.

    linear weights transpose [out, in] -> [in, out] and land at
    '<path>_kernel'/'<path>_bias'; LayerNorms land at '<path>/scale' and
    '<path>/bias' (vision.LayerNormFP32 naming)."""
    parts = path.split("/")
    if linear:
        leaf = parts[-1] + ("_kernel" if is_weight else "_bias")
        value = value.T if is_weight else value
        parts = parts[:-1] + [leaf]
    else:
        parts = parts + ["scale" if is_weight else "bias"]
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def owl_abstractor_params_from_torch(sd: Dict[str, np.ndarray],
                                     abst_cfg) -> dict:
    """External mPLUG-Owl abstractor tensors -> a partial MPLUGOwlVideo
    param tree {'abstractor': ..., 'visual_fc': ..., 'vit_eos': ...}.

    Deterministic and FAIL-LOUD: every input tensor must be consumed by
    the canonical name map (_OWL_LAYER_MAP — the published
    MplugOwlVisualAbstractor module tree) or the keyword fallback
    (_OWL_FALLBACK, for naming drift across releases); anything left
    over raises ValueError listing the unconsumed names, so a real
    checkpoint can never silently leave the abstractor at random init
    (the round-4 failure mode this replaces).

    Handled outside the per-layer map: ``query_tokens`` [1, nq, d] (the
    learnable queries live on the top-level external model),
    ``visual_fc``/``vit_eos`` (inside the external abstractor module),
    and any ``*temporal*`` embedding [T, d] or [1, T, d] (the mPLUG-video
    variant), frame-count-resized to ``abst_cfg.max_frames``.
    """
    out: dict = {"abstractor": {}}
    unconsumed = []
    for name, v in sorted(sd.items()):
        base = name[:-len(".weight")] if name.endswith(".weight") else (
            name[:-len(".bias")] if name.endswith(".bias") else name)
        is_weight = name.endswith(".weight")

        # ---- top-level (non-layer) tensors -------------------------------
        tokens = set(re.split(r"[._]", name))
        if "query_tokens" in name or "query_embeds" in name:
            q = np.asarray(v)
            if q.ndim == 2:
                q = q[None]
            if q.shape != (1, abst_cfg.num_queries, abst_cfg.hidden_size):
                raise ValueError(
                    f"{name}: query tokens shape {q.shape} != "
                    f"(1, {abst_cfg.num_queries}, {abst_cfg.hidden_size})")
            out["abstractor"]["query_embeds"] = q
            continue
        if "visual_fc" in name:
            # flax Dense naming: kernel/bias ([in, out] kernel)
            node = out.setdefault("visual_fc", {})
            if is_weight:
                node["kernel"] = np.asarray(v).T
            else:
                node["bias"] = np.asarray(v)
            continue
        if "vit_eos" in name:
            out["vit_eos"] = np.asarray(v).reshape(1, 1, -1)
            continue
        if "temporal" in tokens or "temporal" in name:
            t = np.asarray(v)
            if t.ndim == 2:
                t = t[None]
            t = resize_temporal_embed(t, abst_cfg.max_frames)
            out["abstractor"]["temporal_embed"] = t[0]
            continue

        # ---- per-layer tensors -------------------------------------------
        m = _OWL_LAYER_RE.search(base)
        if m is None:
            unconsumed.append(name)
            continue
        li = int(m.group(1))
        if li >= abst_cfg.num_layers:
            raise ValueError(
                f"{name}: layer {li} >= num_layers {abst_cfg.num_layers}")
        suffix = base[m.end():]
        layer_tree = out["abstractor"].setdefault(f"layers_{li}", {})
        hit = _OWL_LAYER_MAP.get(suffix)
        if hit is None:
            toks = set(re.split(r"[._]", suffix)) | {suffix.split(".")[-1]}
            for kws, target, linear in _OWL_FALLBACK:
                if kws & toks:
                    hit = (target, linear)
                    break
        if hit is None:
            unconsumed.append(name)
            continue
        target, linear = hit
        _owl_assign(layer_tree, target, np.asarray(v), linear=linear,
                    is_weight=is_weight)

    if unconsumed:
        raise ValueError(
            "abstractor import: %d tensor(s) have no mapping — refusing "
            "to continue with a partially-imported abstractor (it would "
            "silently produce noise visual conditioning). Unconsumed: %s"
            % (len(unconsumed), ", ".join(sorted(unconsumed))))
    return out


def owl_vision_params_from_torch(sd: Dict[str, np.ndarray],
                                 vision_cfg) -> dict:
    """External MplugOwlVisionModel tensors -> our VisionTransformer
    params (models/vision.py, clip_model layout).

    The external vision tower uses megatron-style naming — fused
    ``self_attn.query_key_value`` with HEAD-MAJOR interleaved rows
    [n, 3, d] (the same fused layout as the checkpoint's Bloom side),
    ``self_attn.dense``, ``input_layernorm``/``post_attention_layernorm``
    per layer, ``embeddings.{cls_token,patch_embed,position_embedding,
    pre_layernorm}`` and a final ``post_layernorm`` — none of which the
    timm converter (:func:`vision_params_from_torch`) recognizes.

    Like the abstractor mapper this is deterministic and fail-loud:
    unconsumed input tensors raise.  The fused k-bias is dropped by the
    zero-k convention — attention scores are invariant to a constant
    key offset (q·(k+b) shifts every logit in the row equally), so the
    drop is mathematically exact.
    """
    dim = vision_cfg.embed_dim
    n = vision_cfg.num_heads
    d = dim // n
    params: dict = {}
    unconsumed = []

    def ln_assign(tree, key, v, is_weight):
        tree.setdefault(key, {})[
            "scale" if is_weight else "bias"] = np.asarray(v)

    layer_re = re.compile(r"encoder\.layers\.(\d+)\.")
    for name, v in sorted(sd.items()):
        v = np.asarray(v)
        is_weight = name.endswith(".weight")
        m = layer_re.search(name)
        if m is None:
            # ---- embeddings / final norm -----------------------------
            if "cls_token" in name:
                params["cls_token"] = v.reshape(1, 1, dim)
            elif "position_embedding" in name or "pos_embed" in name:
                pe = v if v.ndim == 3 else v[None]
                params["pos_embed"] = resize_pos_embed(
                    pe, vision_cfg.num_patches)
            elif "patch_embed" in name and is_weight:
                params.setdefault("patch_embed", {})[
                    "kernel"] = v.reshape(v.shape[0], -1).T
            elif "patch_embed" in name and name.endswith(".bias"):
                params.setdefault("patch_embed", {})["bias"] = v
            elif "pre_layernorm" in name or "pre_layrnorm" in name:
                ln_assign(params, "norm_pre", v, is_weight)
            elif "post_layernorm" in name:
                ln_assign(params, "norm", v, is_weight)
            else:
                unconsumed.append(name)
            continue

        # ---- per-layer tensors ---------------------------------------
        li = int(m.group(1))
        if li >= vision_cfg.depth:
            raise ValueError(
                f"{name}: layer {li} >= depth {vision_cfg.depth}")
        suffix = name[m.end():]
        blk = params.setdefault(f"blocks_{li}", {})
        if suffix.startswith(("input_layernorm", "layer_norm1")):
            ln_assign(blk, "norm1", v, is_weight)
        elif suffix.startswith(("post_attention_layernorm",
                                "layer_norm2")):
            ln_assign(blk, "norm2", v, is_weight)
        elif "query_key_value" in suffix:
            attn = blk.setdefault("attn", {})
            if is_weight:  # [3D, D] head-major rows -> [D, 3, n, d]
                attn["qkv_kernel"] = (
                    v.T.reshape(dim, n, 3, d).transpose(0, 2, 1, 3))
            else:  # [3D] head-major -> q/v per-head; k dropped (inert)
                b = v.reshape(n, 3, d)
                attn["q_bias"] = b[:, 0]
                attn["v_bias"] = b[:, 2]
        elif "self_attn.dense" in suffix or suffix.startswith(
                ("self_attn.out_proj", "self_attn.proj")):
            attn = blk.setdefault("attn", {})
            if is_weight:
                attn["proj_kernel"] = v.T.reshape(n, d, dim)
            else:
                attn["proj_bias"] = v
        elif "mlp.fc1" in suffix:
            mlp = blk.setdefault("mlp", {})
            mlp["fc1_kernel" if is_weight else "fc1_bias"] = (
                v.T if is_weight else v)
        elif "mlp.fc2" in suffix:
            mlp = blk.setdefault("mlp", {})
            mlp["fc2_kernel" if is_weight else "fc2_bias"] = (
                v.T if is_weight else v)
        else:
            unconsumed.append(name)

    if unconsumed:
        raise ValueError(
            "owl vision import: %d tensor(s) have no mapping — refusing "
            "a partial vision import. Unconsumed: %s"
            % (len(unconsumed), ", ".join(sorted(unconsumed))))
    return params


def _leaf_paths(tree, prefix=""):
    out = []
    for k, v in tree.items():
        p = prefix + "/" + k if prefix else k
        out += _leaf_paths(v, p) if isinstance(v, dict) else [p]
    return out


def check_covered(expected_tree: dict, provided_tree: dict, what: str,
                  optional=()):
    """Raise unless every leaf of ``expected_tree`` has a value in
    ``provided_tree`` (fail-loud against partial checkpoint imports);
    ``optional`` is an iterable of substrings marking legitimately
    absent paths."""
    expected = set(_leaf_paths(expected_tree))
    provided = set(_leaf_paths(provided_tree))
    missing = sorted(
        p for p in expected - provided
        if not any(o in p for o in optional))
    if missing:
        raise ValueError(
            "%s import: checkpoint provides no tensor for %d model "
            "param(s) — refusing a partial import (random init would "
            "silently corrupt the model). Missing: %s"
            % (what, len(missing), ", ".join(missing)))


def merge_exact(params: dict, imported: dict, prefix="") -> int:
    """Like :func:`merge_into` but FAIL-LOUD: every imported leaf must
    have a matching target key (and shape) in ``params``."""
    import jax.numpy as jnp

    count = 0
    for k, v in imported.items():
        if k not in params:
            raise ValueError(f"no target param at {prefix}{k} "
                             f"(model tree has: {sorted(params)})")
        if isinstance(v, dict):
            count += merge_exact(params[k], v, prefix + k + "/")
        else:
            tgt = params[k]
            if tuple(np.shape(v)) != tuple(np.shape(tgt)):
                raise ValueError(
                    f"shape mismatch at {prefix}{k}: "
                    f"{np.shape(v)} vs {np.shape(tgt)}")
            params[k] = jnp.asarray(v, dtype=tgt.dtype)
            count += 1
    return count


def import_owl(params: dict, cfg, model_dir: str) -> dict:
    """Import an HF mPLUG-Owl checkpoint directory into an initialized
    MPLUGOwlVideo param tree (models/owl.py).

    The language model side (``language_model.transformer.*`` — HF Bloom)
    imports oracle-exactly via :func:`bloom_params_from_torch`
    (tests/test_bloom.py pins the math).  The abstractor side imports
    through the deterministic fail-loud mapper
    :func:`owl_abstractor_params_from_torch` — an unconsumed or
    unmappable abstractor tensor raises instead of leaving the visual
    conditioning at random init.  Vision tensors merge via the shared
    TimeSformer/CLIP converter.
    """
    def _copy_tree(d):
        # deep-copy the dict structure, share the array leaves (deepcopy
        # would duplicate device buffers — 14 GB for the 7B checkpoint)
        return {k: _copy_tree(v) if isinstance(v, dict) else v
                for k, v in d.items()}

    sd = load_hf_torch_state(model_dir)
    params = _copy_tree(params)

    lm = {k[len("language_model."):]: v for k, v in sd.items()
          if k.startswith("language_model.")}
    if lm:
        dec = bloom_params_from_torch(lm, cfg.text,
                                      scan_layers=cfg.text.scan_layers)
        n = merge_into(params["text_decoder"], dec)
        print(f"imported {n} Bloom decoder tensors from {model_dir}",
              flush=True)

    vis = {k[len("vision_model."):]: v for k, v in sd.items()
           if k.startswith("vision_model.")}
    if vis:
        # the timm converter only understands "blocks.{i}" naming; any
        # OTHER layer naming (or no layer keys at all — e.g. a missing
        # by-key HF shard leaving only embeddings.*) routes through the
        # external mapper, whose coverage check then rejects partial
        # checkpoints instead of silently importing ~0 tensors
        if any(k.startswith("blocks.") for k in vis):
            vp = vision_params_from_torch(vis, cfg.vision)
            check_covered(params["visual_encoder"], vp, "owl vision",
                          optional=("patch_embed/bias", "lora_"))
            n = merge_into(params["visual_encoder"], vp)
            print(f"imported {n} vision tensors", flush=True)
        else:
            # external MplugOwlVisionModel naming (megatron-style) —
            # deterministic fail-loud mapper, like the abstractor side;
            # patch-embed conv has no bias in the external tower, lora
            # adapters are finetune-side params no checkpoint carries
            vp = owl_vision_params_from_torch(vis, cfg.vision)
            check_covered(params["visual_encoder"], vp, "owl vision",
                          optional=("patch_embed/bias", "lora_"))
            n = merge_exact(params["visual_encoder"], vp)
            print(f"imported {n} vision tensors (exact, fail-loud)",
                  flush=True)

    abst = {k: v for k, v in sd.items()
            if k.startswith("abstractor.") or k.startswith("query_tokens")}
    if abst:
        stripped = {(k[len("abstractor."):] if k.startswith("abstractor.")
                     else k): v for k, v in abst.items()}
        ap = owl_abstractor_params_from_torch(stripped, cfg.abstractor)
        if "vit_eos" in ap and not cfg.use_vit_eos:
            raise ValueError(
                "checkpoint carries vit_eos but cfg.use_vit_eos=False")

        # fail-loud BOTH ways: unconsumed checkpoint tensors raised
        # inside the mapper; here the model side — every abstractor-side
        # target param must be covered, or the import would silently
        # leave part of the visual conditioning at random init (e.g. a
        # partially-downloaded shard set).  Legitimately absent:
        # temporal_embed / in_proj (image-variant checkpoints).
        expected = {"abstractor": params["abstractor"],
                    "visual_fc": params["visual_fc"]}
        if cfg.use_vit_eos:
            expected["vit_eos"] = params["vit_eos"]
        check_covered(expected, ap, "abstractor",
                      optional=("temporal_embed", "/in_proj/", "lora_"))

        n = merge_exact(params, ap)
        print(f"imported {n} abstractor tensors (exact, fail-loud)",
              flush=True)

    claimed = ("language_model.", "vision_model.", "abstractor.",
               "query_tokens")
    leftovers = sorted(k for k in sd if not k.startswith(claimed))
    if leftovers:
        # not fatal (checkpoints carry tied lm_head copies, rotary
        # buffers etc.) but never silent
        print(f"WARNING: {len(leftovers)} checkpoint tensor(s) outside "
              f"the known module prefixes were ignored: "
              f"{leftovers[:6]}{'...' if len(leftovers) > 6 else ''}",
              flush=True)
    return params


def import_all(params: dict, cfg, src_spec) -> dict:
    """Import decoder and/or vision torch weights into an initialized
    param tree.  src_spec: {"gpt3": model_dir, "vision": path_or_dir}."""
    import copy

    params = dict(params)
    if isinstance(src_spec, str):
        src_spec = {"gpt3": src_spec}
    if src_spec.get("gpt3"):
        sd = load_torch_gpt3_state(src_spec["gpt3"])
        dec = gpt3_params_from_torch(
            sd, cfg.model.text,
            scan_layers=cfg.model.text.scan_layers,
            layer_pairing=cfg.model.text.pairing_active)
        n = merge_into(params["text_decoder"], dec)
        print(f"imported {n} decoder tensors from {src_spec['gpt3']}",
              flush=True)
    if src_spec.get("vision"):
        import torch

        sd = torch.load(src_spec["vision"], map_location="cpu",
                        weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.float().numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
        vis = vision_params_from_torch(sd, cfg.model.vision)
        n = merge_into(params["visual_encoder"], vis)
        print(f"imported {n} vision tensors from {src_spec['vision']}",
              flush=True)
    return params
