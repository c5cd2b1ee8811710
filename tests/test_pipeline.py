"""Pipeline parallelism (GPipe over a 'pipe' mesh axis): correctness vs
sequential layer application, including a GPT-3-shaped transformer stage
and composition with a data axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh


def _mesh(pipe: int, data: int = 1):
    devs = np.asarray(jax.devices()[:pipe * data]).reshape(data, pipe)
    return Mesh(devs, ("data", "pipe"))


def test_gpipe_matches_sequential_linear():
    from youku_mplug_tpu.parallel.pipeline import gpipe, stack_to_stages

    n_layers, d, mb, m = 8, 16, 4, 6
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(n_layers, d, d)).astype(np.float32)
                    * 0.2)
    xs = jnp.asarray(rng.normal(size=(m, mb, d)).astype(np.float32))

    def layer(wi, x):
        return jnp.tanh(x @ wi)

    # sequential reference
    def seq(x):
        for i in range(n_layers):
            x = layer(w[i], x)
        return x

    want = jax.vmap(seq)(xs)

    mesh = _mesh(pipe=4)

    def stage_fn(w_local, x):  # w_local: [L/P, d, d]
        def body(x, wi):
            return layer(wi, x), None
        x, _ = jax.lax.scan(body, x, w_local)
        return x

    with jax.set_mesh(mesh):
        w_sh = stack_to_stages(w, mesh, "pipe")
        got = jax.jit(lambda ws, xs_: gpipe(
            stage_fn, ws, xs_, mesh=mesh, axis="pipe"))(w_sh, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gpipe_transformer_stage_with_data_axis():
    """A pre-LN transformer layer stack pipelined over 4 stages while the
    batch is untouched — output must equal the scanned single-device
    stack."""
    from youku_mplug_tpu.parallel.pipeline import gpipe, stack_to_stages

    n_layers, d, heads, mb, m = 4, 32, 4, 2, 3
    hd = d // heads
    rng = np.random.default_rng(1)

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)

    params = {
        "qkv": mk(n_layers, d, 3, heads, hd),
        "out": mk(n_layers, heads, hd, d),
        "fc1": mk(n_layers, d, 2 * d),
        "fc2": mk(n_layers, 2 * d, d),
    }
    s = 6
    xs = jnp.asarray(rng.normal(size=(m, mb, s, d)).astype(np.float32))

    def layer(p, x):
        qkv = jnp.einsum("bsh,hcnd->bcsnd", x, p["qkv"])
        q, k, v = (jnp.moveaxis(qkv[:, i], 2, 1) for i in range(3))
        a = jax.nn.softmax(
            jnp.einsum("bnqd,bnkd->bnqk", q, k) / np.sqrt(hd), axis=-1)
        o = jnp.einsum("bnqk,bnkd->bnqd", a, v)
        o = jnp.einsum("bnsd,ndh->bsh", o, p["out"])
        x = x + o
        h = jax.nn.gelu(jnp.einsum("bsh,hf->bsf", x, p["fc1"]))
        return x + jnp.einsum("bsf,fh->bsh", h, p["fc2"])

    def seq(x):
        for i in range(n_layers):
            x = layer(jax.tree.map(lambda t: t[i], params), x)
        return x

    want = jax.vmap(seq)(xs)

    mesh = _mesh(pipe=4, data=2)

    def stage_fn(p_local, x):
        def body(x, pi):
            return layer(pi, x), None
        x, _ = jax.lax.scan(body, x, p_local)
        return x

    with jax.set_mesh(mesh):
        p_sh = stack_to_stages(params, mesh, "pipe")
        got = jax.jit(lambda ps, xs_: gpipe(
            stage_fn, ps, xs_, mesh=mesh, axis="pipe",
            data_axis="data"))(p_sh, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
