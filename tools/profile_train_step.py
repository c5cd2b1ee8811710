"""Capture a device trace of ONE real train step (same step as bench.py)
into /tmp/jaxprof.  Parse with tools/parse_trace.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

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
video = jax.random.normal(jax.random.key(2), video.shape, video.dtype)

import jax.numpy as jnp
state, tx, _ = create_train_state(
    params, OptimizerConfig(lr=1e-4, epochs=1, niter_per_ep=1000,
                            warmup_steps=0, freeze_text_decoder=True),
    frozen_dtype=jnp.bfloat16)


def loss_fn(p, batch_, rng, step):
    return model.apply({"params": p}, batch_["video"], batch_["ids"],
                       batch_["mask"], method=MPLUGVideo.pretrain_loss)


# donate the state: without aliasing, old+new state double-buffers ~3.5 GB
# and the lighter-remat policies (half/third) then OOM on a 16 GB chip
step_fn = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))
batch_dev = {"video": video, "ids": ids, "mask": mask}
state, m = step_fn(state, batch_dev, jax.random.key(0))
_ = float(m["loss"])  # compile + warmup
os.makedirs("/tmp/jaxprof", exist_ok=True)
with jax.profiler.trace("/tmp/jaxprof"):
    batch_dev["video"] = video + jnp.bfloat16(0.01)
    state, m = step_fn(state, batch_dev, jax.random.key(1))
    _ = float(m["loss"])
print("trace done, loss", float(m["loss"]), flush=True)
