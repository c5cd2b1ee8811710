import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()
import __graft_entry__ as ge
from youku_mplug_tpu.models.gpt3 import GPT3LM
from youku_mplug_tpu.models.generation import GenerationConfig, generate

cfg = ge._flagship_cfg()
model, params, _, _, _ = ge._build(cfg, batch=4, max_length=80)
dec_params = params["text_decoder"]
decoder = GPT3LM(cfg.text)
ids = jnp.ones((4, 16), jnp.int32)
lens = jnp.asarray([16, 12, 10, 16], jnp.int32)
qf = jnp.zeros((4, 128, 2048), jnp.bfloat16)

gcfg = GenerationConfig(max_new_tokens=16, eos_id=7, pad_id=7,
                        do_sample=False, beam_size=3)
t0 = time.time()
out = generate(decoder, dec_params, ids, lens, query_embeds=qf, config=gcfg)
seq = jax.device_get(out["sequences"])
print("beam decode compile+run:", round(time.time()-t0, 1), "s, shape",
      seq.shape, flush=True)
t0 = time.time()
out = generate(decoder, dec_params, ids + 1, lens, query_embeds=qf,
               config=gcfg)
seq = jax.device_get(out["sequences"])
dt = time.time() - t0
print(f"warm beam decode: {dt*1000:.0f} ms for 4x3 beams x 16 tokens "
      f"-> {4*16/dt:.0f} tok/s (batch)", flush=True)
