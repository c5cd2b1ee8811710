import time, jax, jax.numpy as jnp
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

# 0. calibrate: chained big matmuls, known flops
N = 4096
w = jnp.ones((N, N), jnp.bfloat16)
@jax.jit
def chain(x, w):
    for _ in range(20):
        x = jax.lax.dot(x, w, preferred_element_type=jnp.bfloat16) * (1.0/N)
    return x
x = jnp.ones((N, N), jnp.bfloat16)
x = chain(x, w); jax.block_until_ready(x)
t0 = time.time()
for _ in range(5):
    x = chain(x, w)
jax.block_until_ready(x)
dt = (time.time() - t0) / 5
tf = 20 * 2 * N**3 / dt / 1e12
print(f"matmul chain: {dt*1000:.1f} ms -> {tf:.1f} TF/s", flush=True)

# 1. flagship fwd with dependency chaining
import __graft_entry__ as ge
from youku_mplug_tpu.models.tasks import MPLUGVideo
B = 16
cfg = ge._flagship_cfg()
model, params, video, ids, mask = ge._build(cfg, batch=B, max_length=80)
fwd = jax.jit(lambda p, v, i, m: model.apply(
    {"params": p}, v, i, m, method=MPLUGVideo.pretrain_loss)["loss"])
loss = fwd(params, video, ids, mask); jax.block_until_ready(loss)
t0 = time.time()
for _ in range(5):
    video = video + (loss * 0).astype(video.dtype)
    loss = fwd(params, video, ids, mask)
jax.block_until_ready(loss)
print(f"fwd chained: {(time.time()-t0)/5*1000:.0f} ms", flush=True)

# 2. full grad with chaining
fg = jax.jit(jax.grad(lambda p, v, i, m: model.apply(
    {"params": p}, v, i, m, method=MPLUGVideo.pretrain_loss)["loss"]))
g = fg(params, video, ids, mask); jax.block_until_ready(jax.tree.leaves(g)[0])
t0 = time.time()
for _ in range(3):
    leaf = jax.tree.leaves(g)[0]
    video = video + (leaf.sum() * 0).astype(video.dtype)
    g = fg(params, video, ids, mask)
jax.block_until_ready(jax.tree.leaves(g)[0])
print(f"fwd+bwd chained: {(time.time()-t0)/3*1000:.0f} ms", flush=True)
