"""HBM fit table: per-chip memory high-water estimate for a model size
under a given (data, model) mesh — host-side metadata only (eval_shape +
sharding rules), no device needed.

Answers "does 13B fit at TP=8?" the way a capacity planner would:
params (bf16) + optimizer state (fp32 master + 2x adam moments on the
TRAINED subset) + gradient buffer + KV-cache / activation envelope,
divided by the model-axis degree where the sharding rules shard.

    python tools/hbm_fit.py                 # table for 1.3B/2.7B/13B
    python tools/hbm_fit.py --decode        # serving fit (params + cache)

Reference model JSONs: configs/models/config_gpt3_{1.3B,2.7B,13B}.json.
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
from youku_mplug_tpu.parallel.sharding import GPT3_SHARDING_RULES, _match, _path_str

HBM_PER_CHIP = 16e9  # v5e
SIZES = ("1.3B", "2.7B", "13B")


def decoder_cfg(size: str) -> GPT3Config:
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "models",
        f"config_gpt3_{size}.json")
    return GPT3Config.from_json_file(path)


def sharded_bytes(cfg: GPT3Config, tp: int, bytes_per_param: float):
    """Total per-chip bytes for the decoder param tree under TP=tp,
    honoring which tensors the rules actually shard."""
    model = GPT3LM(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), tokens=tokens))["params"]
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    total = 0.0
    for path, leaf in flat:
        spec = _match(_path_str(path), GPT3_SHARDING_RULES)
        n = int(np.prod(leaf.shape))
        # a rule with any named axis divides by tp when the matched dim
        # divides evenly (rules right-align; scan layer dim unsharded)
        sharded = False
        ndim = len(leaf.shape)
        spec_t = ([None] * (ndim - len(spec)) + list(spec))[-ndim:] \
            if len(spec) <= ndim else list(spec)[-ndim:]
        for dim, ax in zip(leaf.shape, spec_t):
            if ax is not None and dim % tp == 0:
                sharded = True
        total += n * bytes_per_param / (tp if sharded else 1)
    return total


def fit_row(size: str, tp: int, batch: int, seq: int, train: bool,
            frozen_decoder: bool = True):
    cfg = decoder_cfg(size)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(
            jax.eval_shape(lambda: GPT3LM(cfg).init(
                jax.random.key(0),
                tokens=jnp.zeros((1, 8), jnp.int32)))["params"]))
    p_bf16 = sharded_bytes(cfg, tp, 2.0)
    row = {"size": size, "tp": tp, "params_B": round(n_params / 1e9, 2),
           "params_bf16_GB": round(p_bf16 / 1e9, 2)}
    if train:
        if frozen_decoder:
            opt = 0.0  # frozen: no master copy, no moments, no grads
        else:
            # fp32 master + adam m/v + bf16 grad = (4+4+4+2)/2 x bf16
            opt = p_bf16 * 7.0
        # activation envelope: remat keeps ~per-layer boundaries; the
        # measured flagship (1.3B B=16 S=1568+208) high-water is ~12 GB
        # total on chip — approximate activations as residual stream
        # boundaries x4 + flash lse (empirical 2x margin)
        h = cfg.hidden_size
        acts = 4 * batch * seq * h * 2 * cfg.num_hidden_layers / max(tp, 1)
        row.update({"opt_state_GB": round(opt / 1e9, 2),
                    "acts_est_GB": round(acts / 1e9, 2)})
        total = p_bf16 + opt + acts
    else:
        # serving: params + packed KV cache [L, B, M, 2H] bf16 (cache
        # sharded on heads under TP)
        m = seq
        kv = cfg.num_hidden_layers * batch * m * 2 * cfg.hidden_size * 2
        kv /= max(tp, 1)
        row.update({"kv_cache_GB": round(kv / 1e9, 2)})
        total = p_bf16 + kv
    row["total_GB"] = round(total / 1e9, 2)
    row["fits_16GB"] = bool(total < HBM_PER_CHIP * 0.92)  # 8% runtime slack
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decode", action="store_true",
                    help="serving fit (params + KV cache) instead of train")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1776,
                    help="train: total tokens (queries+text); decode: cache width")
    args = ap.parse_args()
    rows = []
    for size in SIZES:
        for tp in (1, 4, 8):
            rows.append(fit_row(size, tp, args.batch, args.seq,
                                train=not args.decode))
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
