import time, jax, jax.numpy as jnp
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

N = 4096
w = jax.random.normal(jax.random.key(0), (N, N), jnp.bfloat16) * 0.01
@jax.jit
def chain(x, w):
    for _ in range(20):
        x = jax.lax.dot(x, w, preferred_element_type=jnp.bfloat16)
        x = x / (jnp.max(jnp.abs(x)) + 1e-3)
    return x
x = jax.random.normal(jax.random.key(1), (N, N), jnp.bfloat16)
x = chain(x, w); jax.block_until_ready(x)
t0 = time.time()
for i in range(5):
    x = chain(x + jnp.bfloat16(1e-3 * (i+1)), w)
jax.block_until_ready(x)
dt = (time.time() - t0) / 5
print(f"matmul chain (changing inputs): {dt*1000:.1f} ms -> "
      f"{20*2*N**3/dt/1e12:.1f} TF/s", flush=True)

import __graft_entry__ as ge
from youku_mplug_tpu.models.tasks import MPLUGVideo
B = 16
cfg = ge._flagship_cfg()
model, params, video, ids, mask = ge._build(cfg, batch=B, max_length=80)
video = jax.random.normal(jax.random.key(2), video.shape, video.dtype)

fg = jax.jit(jax.grad(lambda p, v, i, m: model.apply(
    {"params": p}, v, i, m, method=MPLUGVideo.pretrain_loss)["loss"]))
g = fg(params, video, ids, mask); jax.block_until_ready(jax.tree.leaves(g)[0])
t0 = time.time()
K = 3
for i in range(K):
    video = video + jnp.bfloat16(0.001 * (i + 1))
    g = fg(params, video, ids, mask)
jax.block_until_ready(jax.tree.leaves(g))
print(f"fwd+bwd (changing inputs): {(time.time()-t0)/K*1000:.0f} ms",
      flush=True)
