import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, os, time
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()
import __graft_entry__ as ge
from youku_mplug_tpu.models.tasks import MPLUGVideo
cfg = ge._flagship_cfg()
model, params, video, ids, mask = ge._build(cfg, batch=16, max_length=80)
video = jax.random.normal(jax.random.key(2), video.shape, video.dtype)
fg = jax.jit(lambda p, v, i, m: jax.grad(lambda vv: model.apply(
    {"params": p}, vv, i, m,
    method=MPLUGVideo.pretrain_loss)["loss"])(v).astype(jnp.float32).sum())
_ = float(fg(params, video, ids, mask))
os.makedirs("/tmp/jaxprof", exist_ok=True)
with jax.profiler.trace("/tmp/jaxprof"):
    _ = float(fg(params, video + jnp.bfloat16(0.01), ids, mask))
print("trace done", flush=True)
import subprocess
print(subprocess.run(["find", "/tmp/jaxprof", "-name", "*.pb", "-o",
                      "-name", "*.json.gz", "-o", "-name", "*trace*"],
                     capture_output=True, text=True).stdout[-2000:])
