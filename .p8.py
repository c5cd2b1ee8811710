import time, jax, jax.numpy as jnp
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

N = 4096
ITER = 200
w = jax.random.normal(jax.random.key(0), (N, N), jnp.bfloat16) * 0.01
@jax.jit
def chain(x, w):
    def body(i, x):
        y = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
        return (y / (jnp.max(jnp.abs(y)) + 1e-3)).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, ITER, body, x)
x = jax.random.normal(jax.random.key(1), (N, N), jnp.bfloat16)
r = chain(x, w); jax.block_until_ready(r)
t0 = time.time()
r = chain(r, w); jax.block_until_ready(r)
dt = time.time() - t0
print(f"single-dispatch {ITER}x matmul: {dt*1000:.0f} ms -> "
      f"{ITER*2*N**3/dt/1e12:.1f} TF/s", flush=True)

# model: loop the full loss 8x inside one jit
import __graft_entry__ as ge
from youku_mplug_tpu.models.tasks import MPLUGVideo
B = 16
cfg = ge._flagship_cfg()
model, params, video, ids, mask = ge._build(cfg, batch=B, max_length=80)
video = jax.random.normal(jax.random.key(2), video.shape, video.dtype)

K = 4
@jax.jit
def fwd_loop(p, v, i_, m_):
    def body(k, carry):
        v, acc = carry
        loss = model.apply({"params": p}, v, i_, m_,
                           method=MPLUGVideo.pretrain_loss)["loss"]
        return (v + loss.astype(v.dtype) * 1e-6, acc + loss)
    return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0)))[1]
r = fwd_loop(params, video, ids, mask); jax.block_until_ready(r)
t0 = time.time()
r = fwd_loop(params, video + jnp.bfloat16(0.01), ids, mask)
jax.block_until_ready(r)
print(f"fwd x{K} single dispatch: {(time.time()-t0)/K*1000:.0f} ms/fwd",
      flush=True)

@jax.jit
def fg_loop(p, v, i_, m_):
    def body(k, carry):
        v, acc = carry
        g = jax.grad(lambda vv: model.apply(
            {"params": p}, vv, i_, m_,
            method=MPLUGVideo.pretrain_loss)["loss"])(v)
        return (v + g * 1e-6, acc + g.astype(jnp.float32).sum())
    return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0)))[1]
r = fg_loop(params, video, ids, mask); jax.block_until_ready(r)
t0 = time.time()
r = fg_loop(params, video + jnp.bfloat16(0.02), ids, mask)
jax.block_until_ready(r)
print(f"fwd+actbwd x{K} single dispatch: {(time.time()-t0)/K*1000:.0f} "
      f"ms/step", flush=True)
