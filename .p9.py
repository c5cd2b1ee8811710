import time, jax, jax.numpy as jnp
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

N = 4096
ITER = 100
w = jax.random.normal(jax.random.key(0), (N, N), jnp.bfloat16) * 0.01
@jax.jit
def chain(x, w):
    def body(i, x):
        y = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
        return (y / (jnp.max(jnp.abs(y)) + 1e-3)).astype(jnp.bfloat16)
    x = jax.lax.fori_loop(0, ITER, body, x)
    return jnp.sum(x.astype(jnp.float32))
x = jax.random.normal(jax.random.key(1), (N, N), jnp.bfloat16)
_ = float(chain(x, w))
t0 = time.time()
s = float(chain(x + jnp.bfloat16(0.01), w))
dt = time.time() - t0
print(f"{ITER}x4096^3 matmul, forced: {dt*1000:.0f} ms -> "
      f"{ITER*2*N**3/dt/1e12:.1f} TF/s (peak 197)", flush=True)

import __graft_entry__ as ge
from youku_mplug_tpu.models.tasks import MPLUGVideo
B = 16
cfg = ge._flagship_cfg()
model, params, video, ids, mask = ge._build(cfg, batch=B, max_length=80)
video = jax.random.normal(jax.random.key(2), video.shape, video.dtype)

fwd = jax.jit(lambda p, v, i, m: model.apply(
    {"params": p}, v, i, m, method=MPLUGVideo.pretrain_loss)["loss"])
_ = float(fwd(params, video, ids, mask))
t0 = time.time()
for i in range(3):
    _ = float(fwd(params, video + jnp.bfloat16(0.001*(i+1)), ids, mask))
print(f"fwd forced: {(time.time()-t0)/3*1000:.0f} ms", flush=True)

fg = jax.jit(lambda p, v, i, m: jax.grad(lambda vv: model.apply(
    {"params": p}, vv, i, m,
    method=MPLUGVideo.pretrain_loss)["loss"])(v).astype(jnp.float32).sum())
_ = float(fg(params, video, ids, mask))
t0 = time.time()
for i in range(3):
    _ = float(fg(params, video + jnp.bfloat16(0.002*(i+1)), ids, mask))
print(f"fwd+actbwd forced: {(time.time()-t0)/3*1000:.0f} ms", flush=True)
