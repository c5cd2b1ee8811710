import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.ops import (
    cross_entropy_with_logits,
    layer_norm,
    lm_cross_entropy,
    mha_reference,
)
from youku_mplug_tpu.ops.cross_entropy import masked_mean_loss


def test_layer_norm_matches_numpy(rng):
    x = rng.normal(size=(4, 7, 32)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                     eps=1e-6)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-6) * scale + bias
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_layer_norm_bf16_fp32_island(rng):
    x = (rng.normal(size=(2, 8, 16)) * 100).astype(np.float32)
    scale = np.ones(16, np.float32)
    bias = np.zeros(16, np.float32)
    got = layer_norm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(scale),
                     jnp.asarray(bias))
    assert got.dtype == jnp.bfloat16
    # stats in fp32: normalized output bounded regardless of input magnitude
    assert np.abs(np.asarray(got, np.float32)).max() < 10


def test_layer_norm_custom_vjp_matches_autodiff(rng):
    # layer_norm carries a hand-written VJP (residuals: x, mean, rstd)
    # so save-everything remat doesn't keep fp32 copies of the widened
    # input; its grads must match autodiff of the plain formula.
    def plain_ln(x, s, b, eps=1e-5):
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, -1, keepdims=True)
        v = jnp.mean(jnp.square(x32 - m), -1, keepdims=True)
        y = (x32 - m) * jax.lax.rsqrt(v + eps)
        return (y * s + b).astype(x.dtype)

    x = jnp.asarray(rng.normal(size=(4, 7, 64)) * 3, jnp.float32)
    s = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a).astype(jnp.float32)))

    got = jax.grad(loss(layer_norm), (0, 1, 2))(x, s, b)
    want = jax.grad(loss(plain_ln), (0, 1, 2))(x, s, b)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)
    # bf16 input: fwd values bitwise-match the plain formula
    xb = x.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(layer_norm(xb, s, b), np.float32),
        np.asarray(plain_ln(xb, s, b), np.float32))


def test_mha_reference_causal(rng):
    b, h, s, d = 2, 3, 16, 8
    q = rng.normal(size=(b, h, s, d)).astype(np.float32)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    v = rng.normal(size=(b, h, s, d)).astype(np.float32)
    out = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        causal=True)
    # naive numpy
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    mask = np.tril(np.ones((s, s), bool))
    scores = np.where(mask, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_mha_reference_kv_len_mask(rng):
    b, h, s, d = 2, 2, 8, 4
    q = rng.normal(size=(b, h, s, d)).astype(np.float32)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    v = rng.normal(size=(b, h, s, d)).astype(np.float32)
    kv_len = jnp.array([5, 8])
    out = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        kv_len=kv_len)
    # batch 0 must equal attention over first 5 keys only
    out0 = mha_reference(jnp.asarray(q[:1, :, :, :]),
                         jnp.asarray(k[:1, :, :5, :]),
                         jnp.asarray(v[:1, :, :5, :]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out0[0]),
                               rtol=1e-5, atol=1e-5)


def test_flash_attention_interpret_matches_reference(rng):
    from youku_mplug_tpu.ops import flash_attention as fa
    import unittest.mock as mock
    b, h, s, d = 2, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    import functools
    from jax.experimental import pallas as pl
    with mock.patch.object(
            pl, "pallas_call", functools.partial(pl.pallas_call,
                                                 interpret=True)):
        for causal in (False, True):
            got = fa.flash_attention(q, k, v, causal=causal, block_q=128,
                                     block_k=128)
            want = mha_reference(q, k, v, causal=causal)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-3)


def test_flash_attention_grads_interpret(rng):
    from youku_mplug_tpu.ops import flash_attention as fa
    import unittest.mock as mock
    import functools
    from jax.experimental import pallas as pl
    b, h, s, d = 1, 2, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, causal=True,
                                          block_q=128, block_k=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    with mock.patch.object(
            pl, "pallas_call", functools.partial(pl.pallas_call,
                                                 interpret=True)):
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_cross_entropy_matches_logsoftmax(rng):
    logits = jnp.asarray(rng.normal(size=(3, 5, 11)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 11, size=(3, 5)))
    loss = cross_entropy_with_logits(logits, labels)
    want = -jax.nn.log_softmax(logits)[
        jnp.arange(3)[:, None], jnp.arange(5)[None], labels]
    np.testing.assert_allclose(np.asarray(loss), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_lm_cross_entropy_chunked_equals_dense(rng):
    b, s, hdim, v = 2, 12, 16, 37
    hidden = jnp.asarray(rng.normal(size=(b, s, hdim)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(v, hdim)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(b, s)))
    dense = lm_cross_entropy(hidden, emb, labels)
    chunked = lm_cross_entropy(hidden, emb, labels, chunk=4)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(chunked),
                               rtol=1e-5, atol=1e-5)


def test_masked_mean_loss():
    losses = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    mask = jnp.asarray([[1, 1, 0], [0, 1, 0]])
    got = masked_mean_loss(losses, mask)
    np.testing.assert_allclose(float(got), (1 + 2 + 5) / 3, rtol=1e-6)


def test_vocab_sharded_ce_matches_replicated(rng):
    """Sharding the embedding on vocab over the model axis must not change
    the loss (the GSPMD analog of vocab_parallel_cross_entropy)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from youku_mplug_tpu.runtime import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    b, s, hdim, v = 4, 8, 16, 64
    hidden = jnp.asarray(rng.normal(size=(b, s, hdim)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(v, hdim)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(b, s)))

    want = lm_cross_entropy(hidden, emb, labels)

    with jax.set_mesh(mesh):
        hidden_s = jax.device_put(hidden, NamedSharding(mesh, P("data")))
        emb_s = jax.device_put(emb, NamedSharding(mesh, P("model", None)))
        labels_s = jax.device_put(labels, NamedSharding(mesh, P("data")))
        got = jax.jit(lm_cross_entropy)(hidden_s, emb_s, labels_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_attention_nopad_path(rng):
    """Ragged lengths (197/208) must take the whole-block no-pad path and
    match the reference, incl. gradients."""
    import functools
    import unittest.mock as mock

    from jax.experimental import pallas as pl

    from youku_mplug_tpu.ops import flash_attention as fa

    for s, causal in ((197, False), (208, True)):
        q = jnp.asarray(rng.normal(size=(1, 2, s, 32)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 2, s, 32)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 2, s, 32)), jnp.float32)
        with mock.patch.object(
                pl, "pallas_call",
                functools.partial(pl.pallas_call, interpret=True)):
            got = fa.flash_attention(q, k, v, causal=causal)
            g = jax.grad(lambda q_: jnp.sum(fa.flash_attention(
                q_, k, v, causal=causal) ** 2))(q)
        want = mha_reference(q, k, v, causal=causal)
        g_ref = jax.grad(lambda q_: jnp.sum(mha_reference(
            q_, k, v, causal=causal) ** 2))(q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-3)


def test_flash_attention_packed_matches_reference(rng):
    import functools
    import unittest.mock as mock

    from jax.experimental import pallas as pl

    from youku_mplug_tpu.ops.flash_attention import flash_attention_packed

    b, n, s, d = 2, 3, 208, 128
    q = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)

    def unpack(t):
        return t.reshape(b, s, n, d).transpose(0, 2, 1, 3)

    with mock.patch.object(
            pl, "pallas_call",
            functools.partial(pl.pallas_call, interpret=True)):
        for causal in (False, True):
            got = flash_attention_packed(q, k, v, n, causal=causal)
            want = mha_reference(unpack(q), unpack(k), unpack(v),
                                 causal=causal)
            want = want.transpose(0, 2, 1, 3).reshape(b, s, n * d)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-3)
        # gradients
        g = jax.grad(lambda q_: jnp.sum(flash_attention_packed(
            q_, k, v, n, causal=True) ** 2))(q)
    g_ref = jax.grad(lambda q_: jnp.sum(
        mha_reference(unpack(q_), unpack(k), unpack(v), causal=True) ** 2
    ))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("period_block", ["", "16"],
                         ids=["whole-seq", "diag"])
def test_flash_attention_packed_period(rng, period_block, monkeypatch):
    """Block-diagonal (periodic) mask == per-group attention; grads too.
    This is the grouped-temporal-attention kernel path (period=T).
    Runs both cell geometries: the default masked whole-sequence cells
    and the opt-in diagonal blocks (FLASH_PERIOD_BLOCK — default-off
    after the 2026-08-19 hardware A/B, see _pick_period_block)."""
    import functools
    import unittest.mock as mock

    from jax.experimental import pallas as pl

    from youku_mplug_tpu.ops.flash_attention import flash_attention_packed

    if period_block:
        monkeypatch.setenv("FLASH_PERIOD_BLOCK", period_block)
    else:
        monkeypatch.delenv("FLASH_PERIOD_BLOCK", raising=False)

    b, n, d, period, groups = 2, 4, 64, 8, 14
    s = period * groups  # 112, the grouped temporal sequence
    q = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)

    def per_group(q_, k_, v_):
        # reference: run each period-sized group separately
        def unpack(t):
            return t.reshape(b * groups, period, n, d).transpose(0, 2, 1, 3)
        out = mha_reference(unpack(q_), unpack(k_), unpack(v_))
        return out.transpose(0, 2, 1, 3).reshape(b, s, n * d)

    with mock.patch.object(
            pl, "pallas_call",
            functools.partial(pl.pallas_call, interpret=True)):
        got = flash_attention_packed(q, k, v, n, period=period)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(per_group(q, k, v)),
                                   rtol=2e-3, atol=2e-3)
        g = jax.grad(lambda q_: jnp.sum(flash_attention_packed(
            q_, k, v, n, period=period) ** 2))(q)
    g_ref = jax.grad(lambda q_: jnp.sum(per_group(q_, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("b,n,s,d", [(2, 4, 208, 64), (2, 2, 197, 64),
                                     (8, 2, 197, 64)],
                         ids=["decoder-geom", "vision-geom",
                              "vision-geom-batchblocked"])
def test_flash_attention_packed_subhead_strips(rng, b, n, s, d):
    """d=64 packs two heads per 128-lane strip (the hot geometry of both
    production loops); outputs and all three grads must match plain
    attention.  b=8 exercises multi-sample (batch-blocked) grid cells."""
    import functools
    import unittest.mock as mock

    from jax.experimental import pallas as pl

    from youku_mplug_tpu.ops import flash_attention as fa
    from youku_mplug_tpu.ops.flash_attention import flash_attention_packed

    # the b=8 case must exercise multi-sample cells even though production
    # defaults to single-sample (real-TPU Mosaic rejects bb>1; see
    # FORCE_SINGLE_SAMPLE_CELLS)
    q = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)

    def unpack(t):
        return t.reshape(b, s, n, d).transpose(0, 2, 1, 3)

    def pack(t):
        return t.transpose(0, 2, 1, 3).reshape(b, s, n * d)

    with mock.patch.object(
            pl, "pallas_call",
            functools.partial(pl.pallas_call, interpret=True)), \
            mock.patch.object(fa, "FORCE_SINGLE_SAMPLE_CELLS", False):
        assert fa._pick_block_b(b, s, n * d, arrays=8) > 1
        for causal in (False, True):
            got = flash_attention_packed(q, k, v, n, causal=causal)
            want = pack(mha_reference(unpack(q), unpack(k), unpack(v),
                                      causal=causal))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-3)

        def loss(q_, k_, v_):
            return jnp.sum(flash_attention_packed(
                q_, k_, v_, n, causal=True) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q_, k_, v_):
        return jnp.sum(pack(mha_reference(
            unpack(q_), unpack(k_), unpack(v_), causal=True)) ** 2)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_int8_quantization_roundtrip(rng):
    from youku_mplug_tpu.ops.quant import dequantize, quantize_int8

    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32) * 0.05)
    q, scale = quantize_int8(w, (0,))
    assert q.dtype == jnp.int8 and scale.shape == (1, 48)
    back = dequantize(q, scale, jnp.float32)
    # per-channel symmetric int8: relative error bounded by 1/127
    err = np.abs(np.asarray(back) - np.asarray(w))
    bound = np.abs(np.asarray(w)).max(0) / 127.0 * 0.51
    assert (err <= bound[None, :] + 1e-8).all()
    # matmul with output-channel scaling equals dequant matmul
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    y_scaled = (x @ q.astype(jnp.float32)) * scale[0]
    y_deq = x @ back
    np.testing.assert_allclose(np.asarray(y_scaled), np.asarray(y_deq),
                               rtol=1e-5, atol=1e-5)


def test_quantize_gpt3_decoder_tree(rng):
    from youku_mplug_tpu.ops.quant import (
        decoder_bytes,
        quantize_gpt3_decoder,
    )

    params = {
        "decoder": {"layers": {
            "attn": {
                "qkv_kernel": jnp.asarray(rng.normal(
                    size=(3, 32, 3, 4, 8)).astype(np.float32)),  # scanned
                "qkv_bias": jnp.zeros((3, 3, 4, 8), jnp.float32),
                "out_kernel": jnp.asarray(rng.normal(
                    size=(3, 4, 8, 32)).astype(np.float32)),
                "out_bias": jnp.zeros((3, 32), jnp.float32),
            },
            "mlp": {
                "fc1_kernel": jnp.asarray(rng.normal(
                    size=(3, 32, 64)).astype(np.float32)),
                "fc1_bias": jnp.zeros((3, 64), jnp.float32),
                "fc2_kernel": jnp.asarray(rng.normal(
                    size=(3, 64, 32)).astype(np.float32)),
                "fc2_bias": jnp.zeros((3, 32), jnp.float32),
            },
        }},
        "word_embeddings": {"embedding": jnp.ones((97, 32), jnp.float32)},
    }
    q, scales = quantize_gpt3_decoder(params)
    assert q["decoder"]["layers"]["attn"]["qkv_kernel"].dtype == jnp.int8
    assert q["decoder"]["layers"]["mlp"]["fc2_kernel"].dtype == jnp.int8
    # embeddings and biases untouched
    assert q["word_embeddings"]["embedding"].dtype == jnp.float32
    assert q["decoder"]["layers"]["attn"]["qkv_bias"].dtype == jnp.float32
    # scanned layout: scale keeps the layer dim, collapses reduction
    s = scales["decoder"]["layers"]["attn"]["qkv_kernel"]
    assert s.shape == (3, 1, 3, 4, 8)
    s2 = scales["decoder"]["layers"]["attn"]["out_kernel"]
    assert s2.shape == (3, 1, 1, 32)
    # int8 kernels shrink the tree
    assert decoder_bytes(q) < 0.45 * decoder_bytes(params)


def test_quantize_embedding_roundtrip(rng):
    """include_embedding: per-row int8 embedding; TiedEmbedding dequant on
    lookup and output-channel scaling on the tied logits matmul."""
    import jax

    from youku_mplug_tpu.models.gpt3 import TiedEmbedding
    from youku_mplug_tpu.ops.quant import quantize_gpt3_decoder

    emb = jnp.asarray(rng.normal(size=(97, 32)).astype(np.float32)) * \
        jnp.linspace(0.1, 3.0, 97)[:, None]  # row-varying magnitudes
    params = {"word_embeddings": {"embedding": emb}}
    q, s = quantize_gpt3_decoder(params, include_embedding=True)
    qe = q["word_embeddings"]["embedding"]
    se = s["word_embeddings"]["embedding"]
    assert qe.dtype == jnp.int8 and se.shape == (97, 1)
    # off by default
    q0, _ = quantize_gpt3_decoder(params)
    assert q0["word_embeddings"]["embedding"].dtype == jnp.float32

    mod = TiedEmbedding(97, 32, name="word_embeddings")
    tokens = jnp.asarray(rng.integers(0, 97, (2, 5)))
    hidden = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))

    fp_rows = mod.apply({"params": params["word_embeddings"]}, tokens,
                        jnp.float32, method=TiedEmbedding.encode)
    fp_logits = mod.apply({"params": params["word_embeddings"]}, hidden,
                          method=TiedEmbedding.attend)
    q_vars = {"params": {"embedding": qe}, "qscales": {"embedding": se}}
    q_rows = mod.apply(q_vars, tokens, jnp.float32,
                       method=TiedEmbedding.encode)
    q_logits = mod.apply(q_vars, hidden, method=TiedEmbedding.attend)
    np.testing.assert_allclose(np.asarray(q_rows), np.asarray(fp_rows),
                               rtol=0.03, atol=0.03)
    a, b = np.asarray(fp_logits), np.asarray(q_logits)
    assert np.abs(a - b).max() < 0.02 * np.abs(a).max()


@pytest.mark.parametrize("m,causal", [(2, False), (4, False), (2, True)])
def test_flash_attention_packed_multi_ref(rng, m, causal):
    """Multi-ref cell packing (FLASH_MULTI_REF): m samples per grid cell
    via m singleton-lead refs must be bit-comparable to the reference
    attention in fwd and in all three grads.  The causal case pins the
    dispatch guard: causal keeps m=1 (multi-ref causal crashes Mosaic on
    real hardware, see flash_attention.py) yet must stay numerically
    exact with FLASH_MULTI_REF set."""
    import functools
    import unittest.mock as mock

    from jax.experimental import pallas as pl

    from youku_mplug_tpu.ops import flash_attention as fa

    b, n, s, d = 4, 2, 197, 64
    q = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, n * d)), jnp.float32)

    def unpack(t):
        return t.reshape(b, s, n, d).transpose(0, 2, 1, 3)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_) ** 2)

    want = mha_reference(unpack(q), unpack(k), unpack(v), causal=causal)
    want = want.transpose(0, 2, 1, 3).reshape(b, s, n * d)
    gw = jax.grad(loss(lambda q_, k_, v_: mha_reference(
        unpack(q_), unpack(k_), unpack(v_), causal=causal)
        .transpose(0, 2, 1, 3).reshape(b, s, n * d)), argnums=(0, 1, 2))(
        q, k, v)

    with mock.patch.object(
            pl, "pallas_call",
            functools.partial(pl.pallas_call, interpret=True)), \
            mock.patch.object(fa, "_MULTI_REF", m), \
            mock.patch.object(fa, "_pick_multi",
                              mock.Mock(wraps=fa._pick_multi)) as spy:
        assert spy(b, s, n * d, 8) == m
        spy.reset_mock()
        got = fa.flash_attention_packed(q, k, v, n, causal=causal)
        gg = jax.grad(loss(lambda q_, k_, v_: fa.flash_attention_packed(
            q_, k_, v_, n, causal=causal)), argnums=(0, 1, 2))(q, k, v)
        if causal:
            # the dispatch guard must short-circuit BEFORE consulting
            # _pick_multi (multi-ref causal crashes Mosaic on hardware;
            # interpret-mode numerics alone would not catch a removed
            # guard)
            spy.assert_not_called()
        else:
            assert spy.called
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    for a, b_ in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-3, atol=5e-3)
