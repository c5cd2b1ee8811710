import time, jax, jax.numpy as jnp
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()
import __graft_entry__ as ge
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.optim.factory import OptimizerConfig
from youku_mplug_tpu.train.state import create_train_state
from youku_mplug_tpu.train.trainer import make_train_step
from youku_mplug_tpu.runtime.mesh import MeshConfig, make_mesh

B = 16
cfg = ge._flagship_cfg()
model, params, video, ids, mask = ge._build(cfg, batch=B, max_length=80)
video = jax.random.normal(jax.random.key(3), video.shape, video.dtype)
mesh = make_mesh(MeshConfig(data=1, model=1))
with jax.set_mesh(mesh):
    state, tx, _ = create_train_state(
        params, OptimizerConfig(lr=1e-4, epochs=1, niter_per_ep=1000,
                                warmup_steps=0))
    def loss_fn(p, b, rng, step):
        return model.apply({"params": p}, b["video"], b["ids"], b["mask"],
                           method=MPLUGVideo.pretrain_loss)
    step_fn = make_train_step(loss_fn, tx)
    batch = {"video": video, "ids": ids, "mask": mask}
    K = 8
    @jax.jit
    def multi(state, batch, rng):
        def body(i, st):
            st, m = step_fn(st, batch, jax.random.fold_in(rng, i))
            return st
        st = jax.lax.fori_loop(0, K, body, state)
        _, m = step_fn(st, batch, rng)
        return m["loss"]
    loss = float(multi(state, batch, jax.random.key(0)))
    t0 = time.time()
    loss = float(multi(state, batch, jax.random.key(1)))
    dt = (time.time() - t0) / (K + 1)
    print(f"in-jit train step: {dt*1000:.0f} ms/step, loss {loss:.3f}",
          flush=True)
