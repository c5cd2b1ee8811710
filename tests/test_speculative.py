"""Speculative greedy decoding == target-only greedy decoding, exactly.

The draft model only affects speed (acceptance rate), never the output:
any committed token either agreed with the target's greedy choice or IS
the target's greedy choice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.models.generation import GenerationConfig, generate
from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
from youku_mplug_tpu.runtime.precision import FP32_POLICY
from youku_mplug_tpu.serving.speculative import speculative_generate

V = 61
TARGET = dict(vocab_size=V, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=4, max_position_embeddings=128,
              hidden_dropout=0.0, attention_dropout=0.0,
              layernorm_epsilon=1e-5)
DRAFT = dict(TARGET, hidden_size=16, num_hidden_layers=1,
             num_attention_heads=2)


@pytest.fixture(scope="module")
def models():
    target = GPT3LM(GPT3Config(**TARGET), policy=FP32_POLICY)
    draft = GPT3LM(GPT3Config(**DRAFT), policy=FP32_POLICY)
    tok = jnp.ones((1, 4), jnp.int32)
    tp = target.init(jax.random.key(0), tok)["params"]
    dp = draft.init(jax.random.key(1), tok)["params"]
    return target, tp, draft, dp


@pytest.mark.parametrize("k", [1, 3, 5])
def test_speculative_equals_greedy(models, k):
    target, tp, draft, dp = models
    rng = np.random.default_rng(0)
    b, p = 3, 7
    prompt = jnp.asarray(rng.integers(1, V, (b, p)), jnp.int32)
    plen = jnp.asarray([7, 4, 6], jnp.int32)
    cfg = GenerationConfig(max_new_tokens=12, eos_id=2, pad_id=0,
                           do_sample=False, beam_size=1)

    want = generate(target, tp, prompt, plen, config=cfg)["sequences"]
    got = speculative_generate(target, tp, draft, dp, prompt, plen,
                               config=cfg, speculate_len=k)["sequences"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_perfect_draft_accepts_everything(models):
    # draft == target: every proposal agrees, each round commits k+1
    target, tp, _, _ = models
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(1, V, (2, 5)), jnp.int32)
    plen = jnp.asarray([5, 3], jnp.int32)
    cfg = GenerationConfig(max_new_tokens=10, eos_id=2, pad_id=0,
                           do_sample=False, beam_size=1)
    want = generate(target, tp, prompt, plen, config=cfg)["sequences"]
    out = speculative_generate(target, tp, target, tp, prompt, plen,
                               config=cfg, speculate_len=4)
    np.testing.assert_array_equal(np.asarray(out["sequences"]),
                                  np.asarray(want))
    # a perfect draft commits k+1 tokens per round: far fewer verify
    # rounds than tokens (proves the multi-commit path actually engages)
    assert int(out["rounds"]) <= 3, int(out["rounds"])
    assert float(out["tokens_per_round"]) > 2.0
