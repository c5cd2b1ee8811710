"""int8 KV-cache (ops/kv_cache.py): quantization math, the pallas decode
kernel's in-VMEM dequant (interpret mode), and the end-to-end decode
paths of both decoder families with a quantized cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.ops import kv_cache as kvc
from youku_mplug_tpu.ops.decode_attention import decode_attention

jax.config.update("jax_platforms", "cpu")


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    n, d = 4, 16
    kvp = jnp.asarray(rng.standard_normal((2, 3, 2 * n * d)) * 3.0,
                      jnp.float32)
    q, sc = kvc.quantize_rows(kvp, n)
    assert q.dtype == jnp.int8 and sc.shape == (2, 3, 2 * n)
    back = kvc.dequantize_rows(q, sc, n, jnp.float32)
    # symmetric absmax: error <= scale/2 = absmax/254 per head
    g = np.asarray(kvp).reshape(2, 3, 2 * n, d)
    bound = np.abs(g).max(-1, keepdims=True) / 254.0 + 1e-6
    err = np.abs(np.asarray(back).reshape(2, 3, 2 * n, d) - g)
    assert (err <= bound).all()


def test_cache_write_scalar_and_per_sample():
    n, d, L, B, M = 2, 8, 3, 4, 16
    cache = kvc.make_cache(L, B, M, n * d, n, jnp.float32, quantized=True)
    rng = np.random.default_rng(1)
    kvp = jnp.asarray(rng.standard_normal((B, 2, 2 * n * d)), jnp.float32)
    # scalar idx, stacked layer write
    c2 = kvc.cache_write(cache, kvp, n, jnp.int32(5), lidx=jnp.int32(1))
    got = kvc.layer_dequant(kvc.layer_slice(c2, jnp.int32(1)), n,
                            jnp.float32)
    np.testing.assert_allclose(np.asarray(got)[:, 5:7], np.asarray(kvp),
                               atol=0.05, rtol=0.02)
    assert np.asarray(kvc.layer_slice(c2, jnp.int32(0))["kv"]).sum() == 0
    # per-sample idx
    idx = jnp.asarray([0, 3, 7, 9], jnp.int32)
    c3 = kvc.cache_write(cache, kvp, n, idx, lidx=jnp.int32(2))
    got3 = kvc.layer_dequant(kvc.layer_slice(c3, jnp.int32(2)), n,
                             jnp.float32)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got3)[b, int(idx[b]):int(idx[b]) + 2],
            np.asarray(kvp)[b], atol=0.05, rtol=0.02)


def test_cache_scatter_write_matches_fallback_interpret():
    """The pallas scatter-write kernel (TPU continuous-batching hot
    path) must produce exactly the fori_loop fallback's cache — both
    leaves, in place, untouched rows preserved."""
    rng = np.random.default_rng(7)
    L, B, M, n, d = 3, 4, 32, 4, 8
    W = 2 * n * d
    idx = jnp.asarray([0, 3, 7, 31], jnp.int32)
    lidx = jnp.int32(1)
    kvp = jnp.asarray(rng.standard_normal((B, 1, W)), jnp.float32)
    # bf16-style float leaf
    base = jnp.asarray(rng.standard_normal((L, B, M, W)), jnp.float32)
    want = kvc._write_rows(base, kvp, lidx, idx, per_sample=True)
    got = kvc.cache_scatter_write(base, kvp[:, 0], idx, lidx,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # int8 pair: scatter == single-loop fallback on both leaves
    rk, rs = kvc.quantize_rows(kvp, n)
    bkv = jnp.asarray(rng.integers(-5, 5, (L, B, M, W)), jnp.int8)
    bsc = jnp.asarray(rng.standard_normal((L, B, M, 2 * n)), jnp.float32)
    wk, ws = kvc._write_rows_quant(bkv, bsc, rk, rs, lidx, idx,
                                   per_sample=True)
    gk, gs = kvc.cache_scatter_write(bkv, rk[:, 0], idx, lidx, csc=bsc,
                                     rows_sc=rs[:, 0], interpret=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(ws))


def test_decode_kernel_int8_matches_dequant_reference_interpret():
    """The in-kernel per-block dequant must equal running the fp kernel
    on the host-dequantized cache — the scale commutes exactly with the
    segment-reduce matmuls, so tolerance is fp32 rounding only."""
    rng = np.random.default_rng(2)
    L, B, M, n, d = 2, 4, 128, 4, 32
    nd = n * d
    rows = jnp.asarray(rng.standard_normal((L * B * M, 1, 2 * nd)),
                       jnp.float32)
    qrows, srows = kvc.quantize_rows(rows, n)
    ckv_q = qrows.reshape(L, B, M, 2 * nd)
    scales = srows.reshape(L, B, M, 2 * n)
    ckv_f = kvc.dequantize_rows(ckv_q, scales, n, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, nd)), jnp.float32)
    clen = jnp.asarray([5, 60, 100, 127], jnp.int32)
    vfrom = jnp.asarray([0, 2, 0, 30], jnp.int32)
    out_q = decode_attention(q, ckv_q, n, jnp.int32(1), clen, vfrom,
                             kv_scales=scales, interpret=True)
    out_f = decode_attention(q, ckv_f, n, jnp.int32(1), clen, vfrom,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f),
                               atol=1e-5, rtol=1e-5)


def test_decode_kernel_int8_alibi_interpret():
    """int8 dequant composes with the in-register ALiBi ladder."""
    from youku_mplug_tpu.models.bloom import alibi_slopes

    rng = np.random.default_rng(3)
    L, B, M, n, d = 1, 2, 64, 4, 32
    nd = n * d
    rows = jnp.asarray(rng.standard_normal((L * B * M, 1, 2 * nd)),
                       jnp.float32)
    qrows, srows = kvc.quantize_rows(rows, n)
    ckv_q = qrows.reshape(L, B, M, 2 * nd)
    scales = srows.reshape(L, B, M, 2 * n)
    ckv_f = kvc.dequantize_rows(ckv_q, scales, n, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, nd)), jnp.float32)
    clen = jnp.asarray([10, 63], jnp.int32)
    slopes = alibi_slopes(n)
    out_q = decode_attention(q, ckv_q, n, jnp.int32(0), clen,
                             alibi_slopes=slopes, kv_scales=scales,
                             interpret=True)
    out_f = decode_attention(q, ckv_f, n, jnp.int32(0), clen,
                             alibi_slopes=slopes, interpret=True)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f),
                               atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_gpt3():
    from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
    from youku_mplug_tpu.runtime.precision import FP32_POLICY

    kw = dict(vocab_size=97, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=4, max_position_embeddings=128,
              attn_impl="xla", decode_attn_impl="gather")
    cfg_fp = GPT3Config(**kw)
    cfg_q = GPT3Config(kv_cache_dtype="int8", **kw)
    model_fp = GPT3LM(cfg_fp, policy=FP32_POLICY)
    model_q = GPT3LM(cfg_q, policy=FP32_POLICY)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(3, 97, size=(2, 6)), jnp.int32)
    params = model_fp.init(jax.random.key(0), ids)["params"]
    return model_fp, model_q, params, ids, cfg_fp


def _decode_logits(model, params, ids, steps=4):
    cache = model.apply({"params": params}, ids.shape[0], 64,
                        method=type(model).init_cache)
    emb = model.apply({"params": params}, ids, method=type(model).embed)
    logits, cache = model.apply({"params": params}, emb, cache,
                                jnp.int32(0), method=type(model).decode_step)
    outs = [logits]
    clen = ids.shape[1]
    for _ in range(steps):
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        emb = model.apply({"params": params}, tok[:, None],
                          method=type(model).embed)
        logits, cache = model.apply({"params": params}, emb, cache,
                                    jnp.int32(clen),
                                    method=type(model).decode_step)
        outs.append(logits)
        clen += 1
    return jnp.stack(outs)


def test_gpt3_decode_int8_cache_close_and_greedy_equal(tiny_gpt3):
    model_fp, model_q, params, ids, _ = tiny_gpt3
    lf = np.asarray(_decode_logits(model_fp, params, ids))
    lq = np.asarray(_decode_logits(model_q, params, ids))
    # per-head int8 K/V (~0.4% RMS) stays a small logits perturbation
    assert np.max(np.abs(lf - lq)) < 0.08, np.max(np.abs(lf - lq))
    np.testing.assert_array_equal(lf.argmax(-1), lq.argmax(-1))


def test_bloom_decode_int8_cache_close(tiny_gpt3):
    from youku_mplug_tpu.models.bloom import BloomConfig, BloomLM
    from youku_mplug_tpu.runtime.precision import FP32_POLICY

    kw = dict(vocab_size=89, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=4, attn_impl="xla",
              decode_attn_impl="gather")
    model_fp = BloomLM(BloomConfig(**kw), policy=FP32_POLICY)
    model_q = BloomLM(BloomConfig(kv_cache_dtype="int8", **kw),
                      policy=FP32_POLICY)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(4, 89, size=(2, 5)), jnp.int32)
    params = model_fp.init(jax.random.key(1), tokens=ids)["params"]
    lf = np.asarray(_decode_logits(model_fp, params, ids))
    lq = np.asarray(_decode_logits(model_q, params, ids))
    assert np.max(np.abs(lf - lq)) < 0.08, np.max(np.abs(lf - lq))


def test_engine_runs_with_int8_cache(tiny_gpt3):
    from youku_mplug_tpu.models.generation import GenerationConfig
    from youku_mplug_tpu.serving.engine import ServingEngine

    model_fp, model_q, params, ids, cfg = tiny_gpt3
    gcfg = GenerationConfig(max_new_tokens=6, eos_id=-1, pad_id=0,
                            beam_size=1)
    outs = {}
    for key, model in (("fp", model_fp), ("q", model_q)):
        eng = ServingEngine(model, params, num_slots=2, max_len=64,
                            prefill_buckets=(8,), config=gcfg,
                            rng=jax.random.key(2))
        rids = [eng.submit(list(np.asarray(ids[i]))) for i in range(2)]
        fin = {f.rid: f.tokens for f in eng.run_to_completion()}
        outs[key] = [fin[r] for r in rids]
        assert all(len(t) == 6 for t in outs[key])
    # tiny random model, fp32 math: greedy should agree through 6 steps
    assert outs["fp"] == outs["q"]


def test_generate_int8_cache_beam_gather(tiny_gpt3):
    """Beam search gathers the quantized cache pytree (kv + scale leaves
    reordered together)."""
    from youku_mplug_tpu.models.generation import GenerationConfig, generate

    model_fp, model_q, params, ids, _ = tiny_gpt3
    lens = jnp.asarray([6, 4], jnp.int32)
    gcfg = GenerationConfig(max_new_tokens=5, eos_id=-1, pad_id=0,
                            beam_size=2)
    sf = np.asarray(generate(model_fp, params, ids, lens,
                             config=gcfg)["sequences"])
    sq = np.asarray(generate(model_q, params, ids, lens,
                             config=gcfg)["sequences"])
    np.testing.assert_array_equal(sf, sq)
