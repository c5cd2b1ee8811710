"""Capture a device trace of the jitted generate (serving decode path)
into /tmp/jaxprof_decode.  Same knobs as bench_decode.py; parse with
tools/parse_trace.py or attribute_trace.py (pass the trace path)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from youku_mplug_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()
import __graft_entry__ as ge
from youku_mplug_tpu.models.generation import GenerationConfig, generate
from youku_mplug_tpu.models.gpt3 import GPT3LM
from youku_mplug_tpu.models.tasks import MPLUGVideo

batch = int(os.environ.get("BENCH_DECODE_BATCH", "16"))
new_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "64"))
prompt_len = 16

cfg = ge._flagship_cfg()
model, params, video, ids, mask = ge._build(cfg, batch=batch,
                                            max_length=prompt_len)
video = jax.random.normal(jax.random.key(1), video.shape, video.dtype)
query_embeds = model.apply(
    {"params": params}, video, method=MPLUGVideo.encode_video)[1]
lm = GPT3LM(cfg.text, policy=model.policy)
lm_vars = params["text_decoder"]
if os.environ.get("BENCH_DECODE_INT8", "1") == "1":
    from youku_mplug_tpu.ops.quant import quantize_gpt3_decoder

    qparams, scales = quantize_gpt3_decoder(lm_vars,
                                            include_embedding=True)
    lm_vars = {"params": qparams, "qscales": scales}

prompt = jnp.full((batch, prompt_len), 5, jnp.int32)
plen = jnp.full((batch,), prompt_len, jnp.int32)
gcfg = GenerationConfig(max_new_tokens=new_tokens, beam_size=1,
                        do_sample=False, eos_id=-1, pad_id=0)

out = generate(lm, lm_vars, prompt, plen, query_embeds=query_embeds,
               config=gcfg, rng=jax.random.key(0))
_ = jax.device_get(out["sequences"])  # compile + warmup
os.makedirs("/tmp/jaxprof_decode", exist_ok=True)
with jax.profiler.trace("/tmp/jaxprof_decode"):
    out = generate(lm, lm_vars, prompt, plen, query_embeds=query_embeds,
                   config=gcfg, rng=jax.random.key(1))
    _ = jax.device_get(out["sequences"])
print("decode trace done", flush=True)
