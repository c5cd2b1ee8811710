"""Continuous-batching serving engine tests.

Correctness contract: every request decoded by the slot-based engine must
produce exactly the tokens of an unpadded, uncached greedy forward on the
same model (the oracle from test_generation), regardless of which other
requests share the batch, when they were admitted, or which slot/bucket
they landed in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.models.generation import GenerationConfig
from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
from youku_mplug_tpu.runtime.precision import FP32_POLICY
from youku_mplug_tpu.serving.engine import ServingEngine

from tests.test_generation import greedy_oracle

V, H, L, N = 37, 16, 2, 2
CFG = GPT3Config(vocab_size=V, hidden_size=H, num_hidden_layers=L,
                 num_attention_heads=N, max_position_embeddings=128,
                 hidden_dropout=0.0, attention_dropout=0.0)
EOS = 2


@pytest.fixture(scope="module")
def model_params():
    model = GPT3LM(CFG, policy=FP32_POLICY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    return model, params["params"]


def _engine(model, params, **kw):
    kw.setdefault("num_slots", 3)
    kw.setdefault("max_len", 64)
    kw.setdefault("prefill_buckets", (4, 8))
    kw.setdefault("config", GenerationConfig(
        max_new_tokens=8, eos_id=EOS, pad_id=EOS))
    return ServingEngine(model, params, **kw)


def _strip(tokens):
    return tokens[:tokens.index(EOS)] if EOS in tokens else tokens


def test_single_request_matches_oracle(model_params):
    model, params = model_params
    eng = _engine(model, params)
    prompt = [1, 5, 9, 11]
    rid = eng.submit(prompt)
    fin = eng.run_to_completion()
    assert [f.rid for f in fin] == [rid]
    want = _strip(greedy_oracle(model, params, prompt, None, 8, EOS))
    assert fin[0].tokens == want


def test_staggered_requests_match_solo_decodes(model_params):
    """The continuous-batching case: a second request joins mid-flight
    (different length, different bucket) — both must equal their solo
    oracle decodes (per-sample cache_len correctness)."""
    model, params = model_params
    eng = _engine(model, params)
    p1, p2 = [1, 5, 9, 11, 3, 6], [4, 7]
    r1 = eng.submit(p1)
    fin = []
    for _ in range(3):  # r1 decodes alone for a few steps
        fin.extend(eng.step())
    r2 = eng.submit(p2)
    fin.extend(eng.run_to_completion())
    got = {f.rid: f.tokens for f in fin}
    assert set(got) == {r1, r2}
    assert got[r1] == _strip(greedy_oracle(model, params, p1, None, 8, EOS))
    assert got[r2] == _strip(greedy_oracle(model, params, p2, None, 8, EOS))


def test_multi_step_dispatch_matches_oracle(model_params):
    """steps_per_dispatch>1 (k decode steps fused into one lax.scan
    dispatch) must be invisible to results: same tokens as the per-token
    loop / the uncached oracle, including slots that hit EOS or max_new
    mid-scan and late-admitted requests joining between dispatches."""
    model, params = model_params
    prompts = [[1, 5, 9, 11], [4, 7], [3, 6, 2 + 3, 8, 10, 12]]
    want = {i: _strip(greedy_oracle(model, params, p, None, 8, EOS))
            for i, p in enumerate(prompts)}

    eng = _engine(model, params, num_slots=2)  # third request is queued
    rids = [eng.submit(p) for p in prompts]
    fin = []
    while not eng.idle:
        fin.extend(eng.step_many(4))
    got = {f.rid: f.tokens for f in fin}
    assert set(got) == set(rids)
    for i, rid in enumerate(rids):
        assert got[rid] == want[i], (i, got[rid], want[i])

    # run_to_completion(steps_per_dispatch=...) takes the same path
    eng2 = _engine(model, params)
    r = eng2.submit(prompts[0])
    fin2 = eng2.run_to_completion(steps_per_dispatch=8)
    assert {f.rid: f.tokens for f in fin2} == {r: want[0]}


def test_slot_reuse_queue_overflow(model_params):
    """More requests than slots: the queue drains as slots free up, and a
    reused slot (stale cache contents) still decodes correctly."""
    model, params = model_params
    eng = _engine(model, params, num_slots=1)
    prompts = [[1, 5, 9], [4, 7, 13, 2 + 9], [8]]
    rids = [eng.submit(p) for p in prompts]
    fin = {f.rid: f.tokens for f in eng.run_to_completion()}
    assert set(fin) == set(rids)
    for rid, p in zip(rids, prompts):
        assert fin[rid] == _strip(
            greedy_oracle(model, params, p, None, 8, EOS))


def test_query_embeds_prefix(model_params):
    """Visual-query prefix requests (the mPLUG-Video captioning path)."""
    model, params = model_params
    rng = np.random.default_rng(3)
    eng = _engine(model, params)
    nq = 3
    p1, p2 = [1, 5, 9], [4, 7]
    q1 = rng.normal(size=(nq, H)).astype(np.float32)
    q2 = rng.normal(size=(nq, H)).astype(np.float32)
    r1 = eng.submit(p1, query_embeds=q1)
    r2 = eng.submit(p2, query_embeds=q2)
    fin = {f.rid: f.tokens for f in eng.run_to_completion()}
    assert fin[r1] == _strip(greedy_oracle(model, params, p1, q1, 8, EOS))
    assert fin[r2] == _strip(greedy_oracle(model, params, p2, q2, 8, EOS))


def test_max_new_tokens_cap(model_params):
    model, params = model_params
    eng = _engine(model, params)
    rid = eng.submit([1, 5], max_new_tokens=3)
    fin = eng.run_to_completion()
    assert [f.rid for f in fin] == [rid]
    assert len(fin[0].tokens) <= 3


def test_engine_with_tensor_parallel_params(model_params):
    """Serving composes with TP: the same engine run with the decoder
    sharded over a (data=1, model=2) mesh must produce byte-identical
    tokens (GSPMD inserts the collectives; the engine never knows)."""
    from jax.sharding import Mesh

    from youku_mplug_tpu.parallel.sharding import (
        GPT3_SHARDING_RULES,
        shard_params,
    )

    model, params = model_params
    prompts = [[1, 5, 9, 11], [4, 7]]
    eng = _engine(model, params)
    rids = [eng.submit(p) for p in prompts]
    want = {f.rid: f.tokens for f in eng.run_to_completion()}

    devs = np.asarray(jax.devices()[:2]).reshape(1, 2)
    mesh = Mesh(devs, ("data", "model"))
    with jax.set_mesh(mesh):
        p_sh = shard_params({"p": params}, mesh, GPT3_SHARDING_RULES)["p"]
        eng_sh = _engine(model, p_sh)
        rids_sh = [eng_sh.submit(p) for p in prompts]
        got = {f.rid: f.tokens for f in eng_sh.run_to_completion()}
    for r, rs in zip(rids, rids_sh):
        assert got[rs] == want[r]


def test_engine_with_int8_decoder(model_params):
    """Serving composes with int8 weight quantization (ops/quant.py):
    the engine accepts {'params', 'qscales'} variable dicts and decodes
    sanely (greedy argmax may differ from fp32 — assert structure, not
    token equality, plus determinism across runs)."""
    from youku_mplug_tpu.ops.quant import quantize_gpt3_decoder

    model, params = model_params
    qparams, scales = quantize_gpt3_decoder(params)
    lm_vars = {"params": qparams, "qscales": scales}
    prompts = [[1, 5, 9, 11], [4, 7]]
    eng1 = _engine(model, lm_vars)
    r1 = [eng1.submit(p) for p in prompts]
    got1 = {f.rid: f.tokens for f in eng1.run_to_completion()}
    eng2 = _engine(model, lm_vars)
    r2 = [eng2.submit(p) for p in prompts]
    got2 = {f.rid: f.tokens for f in eng2.run_to_completion()}
    assert set(got1) == set(r1)
    for a, b in zip(r1, r2):
        assert got1[a] == got2[b]  # deterministic
        assert all(0 <= t < V for t in got1[a])


def test_lookup_speculative_matches_oracle(model_params):
    """step_lookup (continuous batching + prompt-lookup speculation) is
    exactly greedy: every request equals its solo oracle decode, and a
    staggered admission mid-flight stays correct."""
    model, params = model_params
    eng = _engine(model, params)
    p1, p2 = [1, 5, 9, 11, 3, 6], [4, 7]
    r1 = eng.submit(p1)
    fin = []
    fin.extend(eng.step_lookup(3))        # r1 speculates alone
    r2 = eng.submit(p2)                   # joins mid-flight
    fin.extend(eng.run_to_completion(lookup_k=3, ngram=2))
    got = {f.rid: f.tokens for f in fin}
    assert set(got) == {r1, r2}
    assert got[r1] == _strip(greedy_oracle(model, params, p1, None, 8, EOS))
    assert got[r2] == _strip(greedy_oracle(model, params, p2, None, 8, EOS))


def test_lookup_speculative_multi_commit(model_params):
    """On a repetitive prompt the lookup draft must commit more than one
    token per dispatch (the speculation actually engages)."""
    model, params = model_params
    eng = _engine(model, params, config=GenerationConfig(
        max_new_tokens=12, eos_id=-1, pad_id=0))
    # long periodic prompt: the model's greedy continuation of a cycle is
    # often the cycle itself; even if not, correctness is pinned above —
    # here we only require SOME dispatch to commit > 1 token OR the
    # request to finish in fewer dispatches than tokens
    eng.submit([3, 8, 3, 8, 3, 8])
    dispatches = 0
    while not eng.idle:
        eng.step_lookup(4)
        dispatches += 1
        assert dispatches < 50
    assert dispatches <= 12


def test_lookup_propose_host_helper():
    from youku_mplug_tpu.serving.engine import ServingEngine

    f = ServingEngine._lookup_propose
    # most recent match of suffix (5, 6) is at [..., 5, 6, 7, 8]
    assert f([5, 6, 9, 5, 6, 7, 8, 5, 6], 2, 3) == [7, 8, 5]
    # no match: repeat the tail
    assert f([1, 2, 3], 2, 2) == [2, 3]
    # match at the very start
    assert f([4, 9, 1, 4, 9], 2, 1) == [1]
