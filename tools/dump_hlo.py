"""AOT-compile the bench train step and dump the optimized HLO to
/tmp/step_hlo.txt (works through the axon relay — as_text() fetches the
post-optimization module wherever it was compiled).  Same knobs as
bench.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from youku_mplug_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()
import __graft_entry__ as ge
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.optim.factory import OptimizerConfig
from youku_mplug_tpu.train.state import create_train_state
from youku_mplug_tpu.train.trainer import make_train_step

batch = int(os.environ.get("BENCH_BATCH", "16"))
remat_env = os.environ.get("BENCH_REMAT", "1")
cfg = ge._flagship_cfg(
    scan_layers=os.environ.get("BENCH_SCAN", "1") == "1",
    remat=remat_env != "0",
    remat_policy=(remat_env
                  if remat_env in ("dots", "attn", "names", "offload", "nofc1", "narrow")
                  else "nothing"),
    ce_chunk=int(os.environ.get("BENCH_CE_CHUNK", "32")),
    grad_ckpt=os.environ.get("BENCH_VIS_CKPT", "1") == "1",
    use_packed_flash=os.environ.get("BENCH_PACKED", "1") == "1",
    vis_remat_policy=os.environ.get("BENCH_VIS_REMAT", "sixth"),
    dec_attn_impl=os.environ.get("BENCH_DEC_ATTN", "packed"),
    vis_attn_impl=os.environ.get("BENCH_VIS_ATTN", "packed"),
    temporal_flash=os.environ.get("BENCH_TFLASH", "1") == "1",
)
model, params, video, ids, mask = ge._build(cfg, batch=batch, max_length=80)

import jax.numpy as jnp
state, tx, _ = create_train_state(
    params, OptimizerConfig(lr=1e-4, epochs=1, niter_per_ep=1000,
                            warmup_steps=0, freeze_text_decoder=True),
    frozen_dtype=jnp.bfloat16)


def loss_fn(p, batch_, rng, step):
    return model.apply({"params": p}, batch_["video"], batch_["ids"],
                       batch_["mask"], method=MPLUGVideo.pretrain_loss)


step_fn = jax.jit(make_train_step(loss_fn, tx))
batch_dev = {"video": video, "ids": ids, "mask": mask}
compiled = step_fn.lower(state, batch_dev, jax.random.key(0)).compile()
out = os.environ.get("HLO_OUT", "/tmp/step_hlo.txt")
with open(out, "w") as f:
    f.write(compiled.as_text())
print("wrote", out, flush=True)
try:
    mem = compiled.memory_analysis()
    print("peak HBM:", getattr(mem, "temp_size_in_bytes", None),
          "args:", getattr(mem, "argument_size_in_bytes", None), flush=True)
except Exception as e:
    print("memory_analysis unavailable:", e)
