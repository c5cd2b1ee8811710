import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youku_mplug_tpu.optim.factory import (
    OptimizerConfig,
    cosine_schedule,
    decay_mask,
    freeze_mask,
    lr_scale_tree,
    merge_params,
    partition_params,
)
from youku_mplug_tpu.train.state import create_train_state
from youku_mplug_tpu.train.trainer import make_train_step


def _toy_params():
    return {
        "visual_encoder": {
            "pos_embed": jnp.ones((1, 5, 4)),
            "blocks_0": {"attn": {"qkv_kernel": jnp.ones((4, 4)),
                                  "proj_bias": jnp.ones((4,))},
                         "temporal_fc_kernel": jnp.ones((4, 4))},
        },
        "text_decoder": {"word_embeddings": {"embedding": jnp.ones((7, 4))}},
        "visual_fc": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
    }


def test_masks():
    p = _toy_params()
    d = decay_mask(p)
    assert d["visual_encoder"]["pos_embed"] is False  # no_weight_decay set
    assert d["visual_encoder"]["blocks_0"]["attn"]["qkv_kernel"] is True
    assert d["visual_fc"]["bias"] is False  # 1-D

    f = freeze_mask(p, freeze_text_decoder=True, freeze_vit=True)
    assert f["text_decoder"]["word_embeddings"]["embedding"] is True
    assert f["visual_encoder"]["blocks_0"]["attn"]["qkv_kernel"] is True
    # temporal params stay trainable under freeze_vit
    assert f["visual_encoder"]["blocks_0"]["temporal_fc_kernel"] is False
    assert f["visual_fc"]["kernel"] is False

    s = lr_scale_tree(p, visual_backbone_scale=True)
    assert s["visual_encoder"]["blocks_0"]["attn"]["qkv_kernel"] == 0.1
    assert s["visual_encoder"]["blocks_0"]["temporal_fc_kernel"] == 1.0
    assert s["visual_fc"]["kernel"] == 1.0


def test_partition_merge_roundtrip():
    p = _toy_params()
    f = freeze_mask(p, True, False)
    train, frozen = partition_params(p, f)
    assert "text_decoder" in frozen and "text_decoder" not in train
    merged = merge_params(train, frozen)
    assert jax.tree.structure(merged) == jax.tree.structure(p)


def test_cosine_schedule_matches_reference_array():
    import math

    base, final, epochs, nip, warm = 1e-3, 1e-5, 4, 10, 5
    fn = cosine_schedule(base, final, epochs, nip, warmup_steps=warm)
    # reference formula (utils.py:350-372)
    warmup = np.linspace(0, base, warm)
    iters = np.arange(epochs * nip - warm)
    ref = np.concatenate([warmup, [
        final + 0.5 * (base - final) * (1 + math.cos(math.pi * i /
                                                     len(iters)))
        for i in iters]])
    got = np.asarray([float(fn(i)) for i in range(epochs * nip)])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-9)


def test_train_step_decreases_loss_and_freezes():
    params = _toy_params()
    cfg = OptimizerConfig(lr=0.05, min_lr=0.05, weight_decay=0.0,
                          clip_grad=1.0, epochs=1, niter_per_ep=100,
                          warmup_steps=0, freeze_text_decoder=True)
    state, tx, _ = create_train_state(params, cfg)

    target = jnp.full((4, 4), 0.5)

    def loss_fn(p, batch, rng, step):
        pred = batch["x"] @ p["visual_fc"]["kernel"] + \
            p["visual_fc"]["bias"]
        # touch a frozen param so grads *would* flow if not partitioned
        pred = pred + 0.0 * p["text_decoder"]["word_embeddings"][
            "embedding"].sum()
        return {"loss": jnp.mean((pred - batch["y"]) ** 2)}

    step_fn = jax.jit(make_train_step(loss_fn, tx))
    batch = {"x": jnp.eye(4), "y": target}
    rng = jax.random.key(0)
    losses = []
    for _ in range(20):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5
    # frozen decoder params untouched
    np.testing.assert_array_equal(
        np.asarray(state.frozen["text_decoder"]["word_embeddings"]
                   ["embedding"]), np.ones((7, 4)))
    assert int(state.step) == 20


def test_train_step_skips_nonfinite():
    params = {"w": jnp.ones((2,))}
    cfg = OptimizerConfig(lr=0.1, weight_decay=0.0, clip_grad=None,
                          epochs=1, niter_per_ep=10, warmup_steps=0,
                          freeze_text_decoder=False)
    state, tx, _ = create_train_state(params, cfg)

    def loss_fn(p, batch, rng, step):
        return {"loss": jnp.sum(p["w"]) * batch["scale"]}

    step_fn = jax.jit(make_train_step(loss_fn, tx))
    state1, m1 = step_fn(state, {"scale": jnp.float32(jnp.nan)},
                         jax.random.key(0))
    assert float(m1["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(np.asarray(state1.trainable["w"]),
                                  np.ones(2))

    state2, m2 = step_fn(state1, {"scale": jnp.float32(1.0)},
                         jax.random.key(0))
    assert float(m2["skipped_nonfinite"]) == 0.0
    assert not np.allclose(np.asarray(state2.trainable["w"]), np.ones(2))


def test_update_freq_accumulates_full_batch():
    """update_freq>1 takes raw [B, ...] batches, splits them into
    micro-batches, and matches the single-step full-batch update
    (reference update_freq semantics, run_pretrain:135-147)."""
    cfg = OptimizerConfig(lr=0.05, min_lr=0.05, weight_decay=0.0,
                          clip_grad=None, epochs=1, niter_per_ep=100,
                          warmup_steps=0, freeze_text_decoder=False)

    def loss_fn(p, batch, rng, step):
        pred = batch["x"] @ p["w"]
        return {"loss": jnp.mean((pred - batch["y"]) ** 2),
                "aux": jnp.mean(batch["y"])}

    batch = {"x": jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 3)).astype(np.float32)),
        "y": jnp.asarray(np.arange(4.0, dtype=np.float32))}

    def run(update_freq):
        params = {"w": jnp.ones((3,))}
        state, tx, _ = create_train_state(params, cfg)
        step_fn = jax.jit(make_train_step(loss_fn, tx,
                                          update_freq=update_freq))
        state, metrics = step_fn(state, batch, jax.random.key(0))
        return np.asarray(state.trainable["w"]), metrics

    w1, m1 = run(1)
    w2, m2 = run(2)
    # mean-of-micro-losses == full-batch loss for equal micro sizes
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(w2, w1, rtol=1e-5)
    # scalar aux metrics are averaged across micro-batches
    np.testing.assert_allclose(float(m2["aux"]), float(m1["aux"]),
                               rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from youku_mplug_tpu.train.checkpoint import CheckpointManager

    params = {"w": jnp.arange(4.0), "nested": {"b": jnp.ones((2, 2))}}
    mngr = CheckpointManager(str(tmp_path / "ckpt"), keep=3)
    for step in (1, 2, 3, 4):
        mngr.save(step, jax.tree.map(lambda x: x * step, params),
                  metadata={"epoch": step})
    assert mngr.all_steps() == [2, 3, 4]  # keep=3
    assert mngr.latest_step() == 4
    assert mngr.rollback_step() == 3
    restored = mngr.restore(3, params)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.arange(4.0) * 3)
    meta = mngr.restore_metadata(4)
    assert meta == {"epoch": 4}
    mngr.close()


def test_checkpoint_async_save(tmp_path):
    """async_save: save() returns without blocking on the disk write;
    every read path barriers on in-flight writes, so the
    save-then-immediately-restore sequence stays correct."""
    from youku_mplug_tpu.train.checkpoint import CheckpointManager

    params = {"w": jnp.arange(8.0), "n": {"b": jnp.full((4, 4), 2.0)}}
    mngr = CheckpointManager(str(tmp_path / "ckpt"), keep=3,
                             async_save=True)
    for step in (1, 2, 3):
        mngr.save(step, jax.tree.map(lambda x: x * step, params),
                  metadata={"epoch": step})
    # reads barrier on the in-flight write
    assert mngr.latest_step() == 3
    restored = mngr.restore(3, params)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.arange(8.0) * 3)
    assert mngr.restore_metadata(2) == {"epoch": 2}
    assert mngr.rollback_step() == 2
    # explicit barrier is also exposed (pre-exit flush)
    mngr.wait_until_finished()
    mngr.close()

    # a fresh SYNC manager over the same directory sees all steps
    mngr2 = CheckpointManager(str(tmp_path / "ckpt"))
    assert mngr2.latest_step() == 3
    r2 = mngr2.restore(2, params)
    np.testing.assert_allclose(np.asarray(r2["n"]["b"]),
                               np.full((4, 4), 4.0))
    mngr2.close()


def test_lr_scale_rules_two_optimizer_split():
    p = _toy_params()
    s = lr_scale_tree(p, lr_scale_rules=((r"visual_encoder", 0.2),
                                         (r"visual_fc", 2.0)))
    assert s["visual_encoder"]["blocks_0"]["attn"]["qkv_kernel"] == 0.2
    assert s["visual_fc"]["kernel"] == 2.0
    assert s["text_decoder"]["word_embeddings"]["embedding"] == 1.0


def test_layer_decay_scales():
    """Layer-wise lr decay matches the reference assigner semantics
    (optim_factory.py:268-291): embeddings at the deepest decay, block i
    at decay^(L+1-(i+1)), head at 1.0."""
    from youku_mplug_tpu.optim.factory import layer_decay_scale_tree

    params = {
        "pos_embed": jnp.zeros((1, 5, 8)),
        "patch_embed": {"kernel": jnp.zeros((4, 8))},
        "blocks_0": {"attn": {"qkv_kernel": jnp.zeros((8, 8))}},
        "blocks_3": {"mlp": {"fc1_kernel": jnp.zeros((8, 8))}},
        "head": {"kernel": jnp.zeros((8, 2))},
    }
    L, d = 4, 0.75
    s = layer_decay_scale_tree(params, d, L)
    assert s["pos_embed"] == pytest.approx(d ** (L + 1))
    assert s["patch_embed"]["kernel"] == pytest.approx(d ** (L + 1))
    assert s["blocks_0"]["attn"]["qkv_kernel"] == pytest.approx(d ** L)
    assert s["blocks_3"]["mlp"]["fc1_kernel"] == pytest.approx(d ** (L - 3))
    assert s["head"]["kernel"] == pytest.approx(1.0)
