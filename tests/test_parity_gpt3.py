"""Decoder parity vs the reference's non-distributed GPT-3
(/root/reference/models/modeling_gpt3.py) on identical weights.

The reference's distributed decoder (modeling_distributed_gpt3.py) computes
the same function as its non-distributed twin at TP=1 (SURVEY §4), modulo
gelu flavor: the distributed path uses megatron's tanh-approx bias_gelu,
the twin uses exact erf gelu.  Ours follows the distributed path, so the
oracle's activation is patched to tanh-approx before comparison.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
from youku_mplug_tpu.runtime.precision import FP32_POLICY

from tests.oracle import load_reference_module

torch = pytest.importorskip("torch")

H, L, N, V, P = 32, 2, 4, 97, 64
D = H // N


@pytest.fixture(scope="module")
def oracle():
    mod = load_reference_module("models/modeling_gpt3.py", "ref_gpt3")
    cfg = mod.GPT3Config(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=N, max_position_embeddings=P,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layernorm_epsilon=1e-5)
    torch.manual_seed(0)
    model = mod.GPT3Model(cfg).eval()
    # align activation with the distributed path (tanh-approx bias_gelu)
    for layer in model.language_model.transformer.layers:
        layer.mlp.activation_func = (
            lambda x: torch.nn.functional.gelu(x, approximate="tanh"))
    return model


def port_params(oracle_model):
    """Map oracle torch weights into our flax param tree (scanned layers)."""
    sd = {k: v.detach().numpy() for k, v in oracle_model.state_dict().items()}
    lm = "language_model."

    def stack(fmt, transform):
        return jnp.stack([
            transform(sd[fmt.format(i)]) for i in range(L)])

    t = lm + "transformer.layers.{}."
    layers = {
        "ln1_scale": stack(t + "input_layernorm.weight", lambda x: x),
        "ln1_bias": stack(t + "input_layernorm.bias", lambda x: x),
        "ln2_scale": stack(t + "post_attention_layernorm.weight",
                           lambda x: x),
        "ln2_bias": stack(t + "post_attention_layernorm.bias", lambda x: x),
        "attn": {
            "qkv_kernel": stack(
                t + "attention.query_key_value.weight",
                lambda w: w.T.reshape(H, 3, N, D)),
            "qkv_bias": stack(
                t + "attention.query_key_value.bias",
                lambda b: b.reshape(3, N, D)),
            "out_kernel": stack(
                t + "attention.dense.weight",
                lambda w: w.T.reshape(N, D, H)),
            "out_bias": stack(t + "attention.dense.bias", lambda x: x),
        },
        "mlp": {
            "fc1_kernel": stack(t + "mlp.dense_h_to_4h.weight",
                                lambda w: w.T),
            "fc1_bias": stack(t + "mlp.dense_h_to_4h.bias", lambda x: x),
            "fc2_kernel": stack(t + "mlp.dense_4h_to_h.weight",
                                lambda w: w.T),
            "fc2_bias": stack(t + "mlp.dense_4h_to_h.bias", lambda x: x),
        },
    }
    return {
        "word_embeddings": {
            "embedding": jnp.asarray(sd[lm + "word_embeddings.weight"])},
        "decoder": {
            "position_embeddings": jnp.asarray(
                sd[lm + "position_embeddings.weight"]),
            "layers": layers,
            "ln_f_scale": jnp.asarray(
                sd[lm + "transformer.final_layernorm.weight"]),
            "ln_f_bias": jnp.asarray(
                sd[lm + "transformer.final_layernorm.bias"]),
        },
    }


def test_logits_parity(oracle):
    params = port_params(oracle)
    cfg = GPT3Config(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=N, max_position_embeddings=P,
        layernorm_epsilon=1e-5, hidden_dropout=0.0, attention_dropout=0.0)
    ours = GPT3LM(cfg, policy=FP32_POLICY)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, V, size=(2, 9))

    with torch.no_grad():
        ref_out = oracle(input_ids=torch.tensor(tokens))
        ref_logits = ref_out["logits"]

    out = ours.apply({"params": params}, jnp.asarray(tokens),
                     return_logits=True)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_logits.numpy(), rtol=2e-4, atol=2e-4)


def test_query_prefix_parity(oracle):
    """Query-embedding prefix forward must match the oracle's
    query_embeds path (the prefix-LM heart of mPLUG-Video)."""
    params = port_params(oracle)
    cfg = GPT3Config(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=N, max_position_embeddings=P,
        layernorm_epsilon=1e-5, hidden_dropout=0.0, attention_dropout=0.0)
    ours = GPT3LM(cfg, policy=FP32_POLICY)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, V, size=(2, 6))
    queries = rng.normal(size=(2, 3, H)).astype(np.float32)

    with torch.no_grad():
        ref_out = oracle(
            input_ids=torch.tensor(tokens),
            query_embeds=torch.tensor(queries))
        ref_logits = ref_out["logits"]
        ref_hidden = ref_out["last_hidden_state"]

    tok_emb = ours.apply({"params": params}, jnp.asarray(tokens),
                         method=GPT3LM.embed)
    input_embeds = jnp.concatenate([jnp.asarray(queries), tok_emb], axis=1)
    out = ours.apply({"params": params}, input_embeds=input_embeds,
                     return_logits=True)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_logits.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), ref_hidden.numpy(),
        rtol=2e-4, atol=2e-4)
