"""Micro-bench the packed flash kernels at the production geometries.

Times fwd and fwd+bwd at the three flagship call shapes (vision spatial,
vision temporal periodic, decoder causal) with the marginal-cost method:
N iterations inside one jit, timed at two N values, difference divided
by the iteration delta — immune to the tunneled relay's ~30 ms fixed
per-dispatch RPC.  The loss is sum(out^2) so the backward cannot be
simplified away; the carry perturbs q so the loop cannot be hoisted.

Usage: python tools/bench_flash.py [geometry ...]
  geometries: spatial temporal decoder (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from youku_mplug_tpu.ops.flash_attention import flash_attention_packed
from youku_mplug_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

GEOMS = {
    # name: (batch, seq, heads, head_dim, causal, period)
    "spatial": (128, 197, 12, 64, False, 0),
    "temporal": (16, 1568, 12, 64, False, 8),
    "decoder": (16, 208, 32, 64, True, 0),
}


def bench(name, b, s, n, d, causal, period):
    q = jax.random.normal(jax.random.key(0), (b, s, n * d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, s, n * d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, s, n * d), jnp.bfloat16)

    def fwd_loss(q, k, v):
        o = flash_attention_packed(q, k, v, n, causal=causal, period=period)
        return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-9

    grad_fn = jax.grad(fwd_loss, argnums=(0, 1, 2))

    def loop(body):
        def run(it, q, k, v):
            def step(i, c):
                return c + body(q + (c * 1e-9).astype(q.dtype), k, v)
            return jax.lax.fori_loop(0, it, step, jnp.float32(0.0))
        return jax.jit(run, static_argnums=0)

    def fwd_body(q, k, v):
        return fwd_loss(q, k, v)

    def bwd_body(q, k, v):
        g = grad_fn(q, k, v)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in g) * 1e-9

    # flops (fwd): qk + pv, block-diagonal discount for periodic
    frac = (period / s) if period else (0.5 if causal else 1.0)
    fwd_tf = 4 * b * n * s * s * d * frac / 1e12

    for label, body, tf in (("fwd", fwd_body, fwd_tf),
                            ("fwd+bwd", bwd_body, 3.5 * fwd_tf)):
        f = loop(body)
        ts = []
        for it in (10, 60):
            float(f(it, q, k, v))
            t0 = time.perf_counter()
            float(f(it, q, k, v))
            ts.append(time.perf_counter() - t0)
        dt = (ts[1] - ts[0]) / 50
        print(f"{name:9s} {label:8s} {dt*1e3:8.3f} ms/iter  "
              f"{tf/dt:7.1f} TF/s-useful")


if __name__ == "__main__":
    names = sys.argv[1:] or list(GEOMS)
    for nm in names:
        bench(nm, *GEOMS[nm])
