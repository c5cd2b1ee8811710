"""Bloom decoder parity vs the installed HF transformers implementation.

The reference ships the BloomZ-7B path through the external mPLUG-Owl repo
over HF checkpoints (reference README.md:111-133), so the HF
``BloomForCausalLM`` IS the authoritative oracle for the decoder math —
ALiBi slopes/bias, head-major fused QKV, embedding layernorm, BloomGelu,
residual wiring and the tied LM head are all pinned here on identical
weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.bloom import BloomConfig, BloomLM, alibi_slopes
from youku_mplug_tpu.models.importers import (
    bloom_params_from_torch,
    load_hf_torch_state,
    merge_into,
)
from youku_mplug_tpu.runtime.precision import FP32_POLICY

torch = pytest.importorskip("torch")
hf_bloom = pytest.importorskip("transformers.models.bloom")

H, L, N, V = 32, 2, 4, 97
D = H // N


def hf_config():
    from transformers import BloomConfig as HFBloomConfig

    return HFBloomConfig(
        vocab_size=V, hidden_size=H, n_layer=L, n_head=N,
        hidden_dropout=0.0, attention_dropout=0.0,
        use_cache=False, attn_implementation="eager")


@pytest.fixture(scope="module")
def oracle():
    from transformers import BloomForCausalLM

    torch.manual_seed(0)
    return BloomForCausalLM(hf_config()).eval()


@pytest.fixture(scope="module")
def cfg():
    return BloomConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=N, hidden_dropout=0.0, attention_dropout=0.0,
        attn_impl="xla", decode_attn_impl="gather")


@pytest.mark.parametrize("n", [4, 8, 32, 12, 6])
def test_alibi_slopes_match_hf(n):
    """Slope ladder == HF build_alibi_tensor for power-of-two and odd
    head counts (the two-ladder extension)."""
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    mask = torch.ones(1, 5)
    hf = build_alibi_tensor(mask, n, torch.float32)  # [n, 1, 5]
    hf_slopes = hf[:, 0, 1].numpy()  # bias at key position 1 == slope
    np.testing.assert_allclose(alibi_slopes(n), hf_slopes, rtol=1e-6)


def _params_from_oracle(oracle, cfg):
    sd = {k: v.detach().float().numpy()
          for k, v in oracle.state_dict().items()}
    return bloom_params_from_torch(sd, cfg, scan_layers=cfg.scan_layers)


def test_logits_parity_vs_hf(oracle, cfg):
    model = BloomLM(cfg, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, V, size=(2, 11))
    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.key(0), tokens=jnp.asarray(tokens))["params"])
    imported = _params_from_oracle(oracle, cfg)
    n = merge_into(params, imported)
    # every leaf must be replaced (no orphan params)
    assert n == len(jax.tree.leaves(params)), n

    out = model.apply({"params": params}, tokens=jnp.asarray(tokens),
                      return_logits=True)
    ours = np.asarray(out["logits"], np.float32)

    with torch.no_grad():
        ref = oracle(input_ids=torch.tensor(tokens)).logits.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_prefill_decode_matches_forward(oracle, cfg):
    """Cache path (prefill then step-by-step decode) reproduces the full
    forward logits — pins the ALiBi absolute-position bias in the cached
    path and the packed cache writes."""
    model = BloomLM(cfg, policy=FP32_POLICY)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, V, size=(2, 9)))
    params = model.init(jax.random.key(0), tokens=tokens)["params"]

    full = model.apply({"params": params}, tokens=tokens,
                       return_logits=True)["logits"]

    cache = model.apply({"params": params}, 2, 9 + 4,
                        method=BloomLM.init_cache, dtype=jnp.float32)
    emb = model.apply({"params": params}, tokens[:, :6],
                      method=BloomLM.embed)
    logits, cache = model.apply({"params": params}, emb, cache,
                                jnp.int32(0), method=BloomLM.decode_step)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, 5]),
                               atol=1e-4, rtol=1e-4)
    for t in range(6, 9):
        emb = model.apply({"params": params}, tokens[:, t:t + 1],
                          method=BloomLM.embed)
        logits, cache = model.apply({"params": params}, emb, cache,
                                    jnp.int32(t),
                                    method=BloomLM.decode_step)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, t]),
                                   atol=1e-4, rtol=1e-4)


def test_generate_front_padding_invariance(cfg):
    """Batched variable-length greedy generate == per-sample unpadded
    generate (the front-padding + shift-invariant ALiBi contract)."""
    from youku_mplug_tpu.models.generation import GenerationConfig, generate

    model = BloomLM(cfg, policy=FP32_POLICY)
    rng = np.random.default_rng(2)
    lens = np.array([7, 4])
    prompts = rng.integers(4, V, size=(2, 7))
    for b, ln in enumerate(lens):
        prompts[b, ln:] = cfg.pad_id
    gcfg = GenerationConfig(max_new_tokens=5, eos_id=cfg.eos_id,
                            pad_id=cfg.pad_id, beam_size=1)
    params = model.init(jax.random.key(3),
                        tokens=jnp.asarray(prompts))["params"]
    batched = generate(model, params, jnp.asarray(prompts),
                       jnp.asarray(lens), config=gcfg)
    for b, ln in enumerate(lens):
        solo = generate(model, params,
                        jnp.asarray(prompts[b:b + 1, :ln]),
                        jnp.asarray(lens[b:b + 1]), config=gcfg)
        np.testing.assert_array_equal(
            np.asarray(batched["sequences"][b]),
            np.asarray(solo["sequences"][0]))


def test_hf_sharded_checkpoint_roundtrip(tmp_path, oracle, cfg):
    """save_pretrained with tiny shards -> load_hf_torch_state union ->
    same logits as the in-memory import."""
    oracle.save_pretrained(tmp_path, max_shard_size="50KB",
                           safe_serialization=False)
    sd = load_hf_torch_state(str(tmp_path))
    imported = bloom_params_from_torch(sd, cfg)

    model = BloomLM(cfg, policy=FP32_POLICY)
    tokens = jnp.asarray(np.arange(10)[None] % V)
    params = jax.tree.map(
        np.asarray, model.init(jax.random.key(0), tokens=tokens)["params"])
    n = merge_into(params, imported)
    assert n == len(jax.tree.leaves(params))
    ours = model.apply({"params": params}, tokens=tokens,
                       return_logits=True)["logits"]
    with torch.no_grad():
        ref = oracle(input_ids=torch.tensor(np.asarray(tokens))).logits
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_flash_alibi_matches_xla_interpret(cfg):
    """Packed flash kernel with in-kernel ALiBi (interpret mode) == the
    XLA bias-tensor path, fwd and grads."""
    from youku_mplug_tpu.ops import flash_attention as fa
    from youku_mplug_tpu.ops.attention import mha_reference

    rng = np.random.default_rng(3)
    b, s, n, d = 2, 128, 4, 64
    q, k, v = [jnp.asarray(rng.standard_normal((b, s, n * d)), jnp.float32)
               for _ in range(3)]
    slopes = alibi_slopes(n)

    def packed_ref(q, k, v):
        def heads(x):
            return jnp.moveaxis(x.reshape(b, s, n, d), 2, 1)
        bias = (jnp.asarray(slopes)[None, :, None, None]
                * jnp.arange(s, dtype=jnp.float32)[None, None, None, :])
        out = mha_reference(heads(q), heads(k), heads(v), causal=True,
                            bias=bias)
        return jnp.moveaxis(out, 1, 2).reshape(b, s, n * d)

    import unittest.mock as mock

    # route pallas_call through interpret mode on CPU
    import jax.experimental.pallas as pl
    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    with mock.patch.object(fa.pl, "pallas_call", interp_call):
        out = fa.flash_attention_packed(q, k, v, n, causal=True,
                                        alibi_slopes=slopes)
        ref = packed_ref(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        def loss_flash(q, k, v):
            return jnp.sum(fa.flash_attention_packed(
                q, k, v, n, causal=True, alibi_slopes=slopes) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(packed_ref(q, k, v) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=5e-4, rtol=5e-4)


def test_decode_kernel_alibi_matches_reference_interpret(cfg):
    """Pallas decode kernel with alibi (interpret) == gather + XLA bias."""
    from youku_mplug_tpu.ops.decode_attention import decode_attention
    from youku_mplug_tpu.ops.attention import mha_reference

    rng = np.random.default_rng(4)
    ell, b, m, n, d = 2, 2, 128, 4, 32
    nd = n * d
    ckv = jnp.asarray(rng.standard_normal((ell, b, m, 2 * nd)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, nd)), jnp.float32)
    cache_len = jnp.asarray([40, 17], jnp.int32)
    valid_from = jnp.asarray([0, 3], jnp.int32)
    slopes = alibi_slopes(n)

    out = decode_attention(q, ckv, n, 1, cache_len, valid_from,
                           alibi_slopes=slopes, interpret=True)

    layer = ckv[1]
    kh = jnp.moveaxis(layer[..., :nd].reshape(b, m, n, d), 2, 1)
    vh = jnp.moveaxis(layer[..., nd:].reshape(b, m, n, d), 2, 1)
    qh = q.reshape(b, 1, n, d).transpose(0, 2, 1, 3)
    ki = jnp.arange(m)
    allowed = ((ki[None] <= cache_len[:, None])
               & (ki[None] >= valid_from[:, None]))  # [B, M]
    alibi = (jnp.asarray(slopes)[None, :, None, None]
             * ki.astype(jnp.float32)[None, None, None, :])
    bias = alibi + jnp.where(allowed, 0.0,
                             jnp.finfo(jnp.float32).min)[:, None, None, :]
    ref = mha_reference(qh, kh, vh, bias=bias)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, nd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_serving_engine_and_lookup_with_bloom(cfg):
    """The serving stack (continuous-batching engine + prompt-lookup
    speculative generate) drives BloomLM through the shared
    embed/init_cache/decode_step surface: engine output must equal the
    plain batched generate, and lookup decoding must be token-exact."""
    from youku_mplug_tpu.models.generation import GenerationConfig, generate
    from youku_mplug_tpu.serving.engine import ServingEngine
    from youku_mplug_tpu.serving.speculative import (
        ngram_speculative_generate,
    )

    model = BloomLM(cfg, policy=FP32_POLICY)
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(4, V, size=6)),
               list(rng.integers(4, V, size=4))]
    params = model.init(jax.random.key(1),
                        tokens=jnp.asarray([prompts[0]]))["params"]
    gcfg = GenerationConfig(max_new_tokens=6, eos_id=-1,
                            pad_id=cfg.pad_id, beam_size=1)

    # oracle: batched greedy generate
    pad = max(len(p) for p in prompts)
    ids = np.full((2, pad), cfg.pad_id, np.int32)
    for i, p in enumerate(prompts):
        ids[i, :len(p)] = p
    lens = jnp.asarray([len(p) for p in prompts])
    want = np.asarray(generate(model, params, jnp.asarray(ids), lens,
                               config=gcfg)["sequences"])

    eng = ServingEngine(model, params, num_slots=2, max_len=128,
                        prefill_buckets=(8,), config=gcfg,
                        rng=jax.random.key(2))
    rids = [eng.submit(p) for p in prompts]
    fin = {f.rid: f.tokens for f in eng.run_to_completion()}
    for i, rid in enumerate(rids):
        np.testing.assert_array_equal(np.asarray(fin[rid]), want[i])

    spec = ngram_speculative_generate(
        model, params, jnp.asarray(ids), lens, config=gcfg,
        speculate_len=3, ngram=2)
    np.testing.assert_array_equal(np.asarray(spec["sequences"]), want)
