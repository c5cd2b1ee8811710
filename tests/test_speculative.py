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


def test_spec_accept_marginal_is_target_distribution():
    """Monte-Carlo check of the rejection-sampling core: the first
    committed token's marginal law equals the target distribution
    regardless of the draft distribution."""
    from youku_mplug_tpu.serving.speculative import _spec_accept

    Vv, k, n = 7, 3, 60000
    key = jax.random.key(0)
    # deliberately mismatched draft vs target distributions
    p_t = jax.nn.softmax(jnp.array([[2.0, 0.5, 0.0, -1.0, 1.0, -2.0, 0.3],
                                    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                                    [1.0, 1.0, -3.0, 2.0, 0.0, 0.0, 0.0],
                                    [0.5, -0.5, 0.5, -0.5, 0.5, -0.5, 0.5]]))
    p_d = jax.nn.softmax(jnp.array([[-2.0, 1.0, 1.0, 1.0, -1.0, 2.0, 0.0],
                                    [1.0, -1.0, 0.0, 0.0, 2.0, 0.0, -1.0],
                                    [0.0, 0.0, 3.0, -1.0, 1.0, 0.0, 1.0]]))

    def one(key):
        kd, ka = jax.random.split(key)
        drafts = jax.vmap(
            lambda r, p: jax.random.categorical(r, jnp.log(p)))(
            jax.random.split(kd, k), p_d).astype(jnp.int32)
        commit, n_commit = _spec_accept(ka, drafts, p_d, p_t)
        return commit[0], n_commit

    firsts, n_commits = jax.vmap(one)(jax.random.split(key, n))
    emp = np.bincount(np.asarray(firsts), minlength=Vv) / n
    # 4-sigma band per bucket on n=60k samples
    sigma = np.sqrt(np.asarray(p_t[0]) * (1 - np.asarray(p_t[0])) / n)
    np.testing.assert_allclose(emp, np.asarray(p_t[0]),
                               atol=float((4 * sigma).max()) + 1e-3)
    # acceptance should be nontrivial (not always 1, not always k+1)
    assert 1.0 < float(n_commits.mean()) < k + 1


def test_speculative_sampling_runs_and_terminates(models):
    target, tp, draft, dp = models
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(1, V, (2, 5)), jnp.int32)
    plen = jnp.asarray([5, 4], jnp.int32)
    cfg = GenerationConfig(max_new_tokens=8, eos_id=2, pad_id=0,
                           do_sample=True, top_k=0, top_p=1.0,
                           temperature=1.0, beam_size=1)
    out = speculative_generate(target, tp, draft, dp, prompt, plen,
                               config=cfg, speculate_len=3,
                               rng=jax.random.key(11))
    seqs = np.asarray(out["sequences"])
    assert seqs.shape == (2, 8)
    assert seqs.min() >= 0 and seqs.max() < V
    # after an eos the tail must be pad
    for row in seqs:
        hits = np.where(row == 2)[0]
        if hits.size:
            assert (row[hits[0] + 1:] == 0).all()


# ---------------------------------------------------------------------------
# prompt-lookup (n-gram) speculative decoding
# ---------------------------------------------------------------------------

def test_ngram_propose_copies_continuation():
    from youku_mplug_tpu.serving.speculative import _ngram_propose

    # history: ... 5 6 7 8 9 ... 5 6 | cur — suffix (5,6) matched at the
    # earlier occurrence; proposal must copy its continuation 7 8 9
    hist = jnp.asarray([[1, 5, 6, 7, 8, 9, 4, 5, 6, 0, 0, 0]], jnp.int32)
    cur = jnp.asarray([9], jnp.int32)
    lo = jnp.asarray([0], jnp.int32)
    props = _ngram_propose(hist, cur, 2, 3, lo)
    np.testing.assert_array_equal(np.asarray(props), [[7, 8, 9]])

    # most RECENT match wins: two occurrences with different continuations
    hist2 = jnp.asarray([[5, 6, 1, 5, 6, 2, 9, 5, 6, 0, 0]], jnp.int32)
    props2 = _ngram_propose(hist2, jnp.asarray([9], jnp.int32), 2, 2, lo)
    np.testing.assert_array_equal(np.asarray(props2), [[2, 9]])

    # pads before valid_from must not fabricate a match
    hist3 = jnp.asarray([[0, 0, 0, 3, 0, 0, 0, 0]], jnp.int32)
    props3 = _ngram_propose(hist3, jnp.asarray([6], jnp.int32), 2, 2,
                            jnp.asarray([3], jnp.int32))
    # no valid match: fallback repeats the tail (reads hist[4:6] = 0,0)
    assert props3.shape == (1, 2)


@pytest.mark.parametrize("k,n", [(3, 2), (8, 3), (1, 1)])
def test_ngram_speculative_equals_greedy(models, k, n):
    from youku_mplug_tpu.serving.speculative import (
        ngram_speculative_generate,
    )

    target, tp, _, _ = models
    rng = np.random.default_rng(7)
    b, p = 3, 9
    prompt = jnp.asarray(rng.integers(1, V, (b, p)), jnp.int32)
    plen = jnp.asarray([9, 5, 7], jnp.int32)
    cfg = GenerationConfig(max_new_tokens=14, eos_id=2, pad_id=0,
                           do_sample=False, beam_size=1)
    want = generate(target, tp, prompt, plen, config=cfg)["sequences"]
    out = ngram_speculative_generate(target, tp, prompt, plen, config=cfg,
                                     speculate_len=k, ngram=n)
    np.testing.assert_array_equal(np.asarray(out["sequences"]),
                                  np.asarray(want))
    assert float(out["tokens_per_round"]) >= 1.0


def test_ngram_speculative_with_query_embeds(models):
    from youku_mplug_tpu.serving.speculative import (
        ngram_speculative_generate,
    )

    target, tp, _, _ = models
    rng = np.random.default_rng(9)
    prompt = jnp.asarray(rng.integers(1, V, (2, 6)), jnp.int32)
    plen = jnp.asarray([6, 4], jnp.int32)
    qe = jnp.asarray(rng.normal(size=(2, 3, TARGET["hidden_size"])),
                     jnp.float32)
    cfg = GenerationConfig(max_new_tokens=10, eos_id=2, pad_id=0,
                           do_sample=False, beam_size=1)
    want = generate(target, tp, prompt, plen, query_embeds=qe,
                    config=cfg)["sequences"]
    out = ngram_speculative_generate(target, tp, prompt, plen, config=cfg,
                                     speculate_len=4, ngram=2,
                                     query_embeds=qe)
    np.testing.assert_array_equal(np.asarray(out["sequences"]),
                                  np.asarray(want))
