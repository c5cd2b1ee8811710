import time, jax, jax.numpy as jnp, dataclasses
import __graft_entry__ as ge
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

B = 16
cfg = ge._flagship_cfg()
model, params, video, ids, mask = ge._build(cfg, batch=B, max_length=80)

def timeit(name, f, *args):
    t0 = time.time(); r = f(*args); jax.block_until_ready(r)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: compile {compile_t:.1f}s step {(time.time()-t0)/3*1000:.0f}ms", flush=True)

# 1. full fwd
fwd = jax.jit(lambda p, v, i, m: model.apply(
    {"params": p}, v, i, m, method=MPLUGVideo.pretrain_loss)["loss"])
timeit("fwd", fwd, params, video, ids, mask)

# 2. vision-only grad
vg = jax.jit(jax.grad(lambda p, v: jnp.sum(model.apply(
    {"params": p}, v, method=MPLUGVideo.encode_video)[1].astype(jnp.float32)**2)))
timeit("vision fwd+bwd", vg, params, video)

# 3. full grad wrt all params
fg = jax.jit(jax.grad(lambda p, v, i, m: model.apply(
    {"params": p}, v, i, m, method=MPLUGVideo.pretrain_loss)["loss"]))
timeit("full fwd+bwd", fg, params, video, ids, mask)
