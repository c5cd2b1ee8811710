import json
import os

import numpy as np
import pytest

from youku_mplug_tpu.data.datasets import (
    ClsVideoDataset,
    PretrainVideoDataset,
    RetrievalVideoDataset,
    SyntheticVideoDataset,
    pre_caption,
)
from youku_mplug_tpu.data.loader import MetaLoader, ShardedLoader
from youku_mplug_tpu.data.samplers import (
    get_frame_indices,
    get_frame_indices_start_end,
)
from youku_mplug_tpu.data.transforms import (
    RandomResizedCrop,
    Resize,
    TemporalConsistentRandAugment,
    clip_to_tensor,
    normalize,
    train_transform,
)


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("videos")
    for k in range(3):
        path = str(d / f"vid{k}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (64, 48))
        for i in range(25):
            frame = np.full((48, 64, 3), (i * 9 + k * 40) % 255, np.uint8)
            w.write(frame)
        w.release()
    return str(d)


def test_frame_indices_modes():
    rng = np.random.default_rng(0)
    idx = get_frame_indices(4, 100, "rand", rng=rng)
    assert len(idx) == 4 and all(0 <= i < 100 for i in idx)
    assert idx == sorted(idx)

    mid = get_frame_indices(4, 100, "middle")
    assert mid == [12, 37, 62, 87]

    # fewer frames than requested: pad with last
    short = get_frame_indices(8, 3, "middle")
    assert len(short) == 8 and short[-1] == short[2]

    fps = get_frame_indices(4, 100, "fps0.5", input_fps=10,
                            max_num_frames=3)
    assert len(fps) == 3

    iv = get_frame_indices(4, 100, "interval", rng=rng)
    assert len(iv) == 4

    se = get_frame_indices_start_end(4, 100, fps=10, start_time=1.0,
                                     end_time=5.0, rng=rng)
    assert all(10 <= i < 50 for i in se)


def test_native_decoder_matches_cv2(video_dir):
    from youku_mplug_tpu.data import native_decode
    from youku_mplug_tpu.data.video_decode import _read_cv2

    if not native_decode.available():
        pytest.skip("native decoder unavailable")
    path = os.path.join(video_dir, "vid0.mp4")
    r = native_decode.NativeVideoReader(path)
    assert len(r) == 25
    assert abs(r.fps - 10.0) < 0.1
    frames = r.get_batch([0, 5, 10, 10, 24])
    assert frames.shape == (5, 48, 64, 3)
    np.testing.assert_array_equal(frames[2], frames[3])  # dup index
    cv2_frames = _read_cv2(path, [0, 5, 10, 10, 24])
    # same codec decode: allow tiny colorspace rounding differences
    diff = np.abs(frames.astype(int) - cv2_frames.astype(int))
    assert diff.max() <= 2, diff.max()
    r.close()


def test_native_decoder_rescale(video_dir):
    from youku_mplug_tpu.data import native_decode

    if not native_decode.available():
        pytest.skip("native decoder unavailable")
    path = os.path.join(video_dir, "vid1.mp4")
    with native_decode.NativeVideoReader(path) as r:
        frames = r.get_batch([0, 1], width=32, height=24)
    assert frames.shape == (2, 24, 32, 3)


def test_native_decoder_sparse_seek(tmp_path):
    """Sparse sampling from a long video must stay frame-accurate through
    the keyframe-seek fast path (and the backward-rewind on handle reuse)."""
    import cv2

    from youku_mplug_tpu.data import native_decode
    from youku_mplug_tpu.data.video_decode import _read_cv2

    if not native_decode.available():
        pytest.skip("native decoder unavailable")
    path = str(tmp_path / "long.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
    for i in range(300):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:, :, 0] = i % 256  # per-frame fingerprint in the blue plane
        frame[:, :, 1] = (i // 4) % 256
        w.write(frame)
    w.release()

    sparse = [3, 57, 123, 250, 299]
    with native_decode.NativeVideoReader(path) as r:
        got = r.get_batch(sparse)
        # reuse the handle with earlier indices: exercises backward seek
        got2 = r.get_batch([10, 200])
    want = _read_cv2(path, sparse)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 4, f"sparse seek decode mismatch: {diff.max()}"
    want2 = _read_cv2(path, [10, 200])
    assert np.abs(got2.astype(int) - want2.astype(int)).max() <= 4


def test_transforms_shapes_and_consistency():
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, size=(4, 48, 64, 3), dtype=np.uint8)

    out = RandomResizedCrop(32)(clip, rng=rng)
    assert out.shape == (4, 32, 32, 3)

    out = Resize((24, 36))(clip)
    assert out.shape == (4, 24, 36, 3)

    # temporal consistency: identical frames stay identical after augment
    same = np.broadcast_to(clip[:1], clip.shape).copy()
    auged = TemporalConsistentRandAugment(n=2, m=5)(same, rng=rng)
    for t in range(1, 4):
        np.testing.assert_array_equal(auged[0], auged[t])

    full = train_transform(32)(clip, rng=rng)
    assert full.shape == (4, 32, 32, 3) and full.dtype == np.uint8

    cthw = clip_to_tensor(clip)
    assert cthw.shape == (3, 4, 48, 64)
    assert 0.0 <= cthw.min() and cthw.max() <= 1.0
    norm = normalize(cthw)
    assert norm.shape == cthw.shape


def test_device_normalize_matches_host():
    import jax.numpy as jnp

    from youku_mplug_tpu.ops.preprocess import normalize_clip

    rng = np.random.default_rng(1)
    clips = rng.integers(0, 255, size=(2, 4, 8, 8, 3), dtype=np.uint8)
    dev = np.asarray(normalize_clip(jnp.asarray(clips), dtype=jnp.float32))
    host = np.stack([normalize(clip_to_tensor(c)) for c in clips])
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_pretrain_dataset_and_loader(video_dir, tmp_path):
    ann = [{"video_id": f"vid{k}.mp4", "caption": f"Title {k}!"}
           for k in range(3)]
    ann_path = str(tmp_path / "ann.json")
    json.dump(ann, open(ann_path, "w"))

    ds = PretrainVideoDataset([ann_path], video_dir,
                              transform=train_transform(32), num_frames=4)
    sample = ds[0]
    assert sample["video"].shape == (4, 32, 32, 3)
    assert sample["text"] == "title 0"

    loader = ShardedLoader(ds, batch_size=2, num_workers=2, seed=0,
                           process_index=0, process_count=1)
    batches = list(loader)
    assert len(batches) == 1  # 3 samples, batch 2, drop_last
    assert batches[0]["video"].shape == (2, 4, 32, 32, 3)
    assert len(batches[0]["text"]) == 2


def test_sharded_loader_partitions_disjointly():
    ds = SyntheticVideoDataset(length=16, num_frames=2, size=8)
    seen = []
    for r in range(2):
        loader = ShardedLoader(ds, batch_size=2, num_workers=1, seed=3,
                               shuffle=True, process_index=r,
                               process_count=2)
        for b in loader:
            seen += list(b["index"])
    assert sorted(seen) == list(range(16))


def test_process_workers_match_threads():
    """workers_impl='process' (forked workers, the GIL-immune mode for
    many-core hosts) yields batch-identical output to the thread pool."""
    import numpy as np

    ds = SyntheticVideoDataset(length=8, num_frames=2, size=8)
    kw = dict(batch_size=2, num_workers=2, seed=5, shuffle=True,
              process_index=0, process_count=1)
    got_t = list(ShardedLoader(ds, workers_impl="thread", **kw))
    got_p = list(ShardedLoader(ds, workers_impl="process", **kw))
    assert len(got_t) == len(got_p) == 4
    for bt, bp in zip(got_t, got_p):
        assert bt.keys() == bp.keys()
        np.testing.assert_array_equal(bt["video"], bp["video"])
        assert list(bt["index"]) == list(bp["index"])
        assert bt["text"] == bp["text"]
    import pytest

    with pytest.raises(ValueError, match="workers_impl"):
        ShardedLoader(ds, workers_impl="greenlet", **kw)


def test_retry_walks_to_next_index(video_dir, tmp_path):
    ann = [{"clip_name": "missing.mp4", "caption": "bad"},
           {"clip_name": "vid0.mp4", "caption": "good"}]
    p = str(tmp_path / "ret.jsonl")
    with open(p, "w") as f:
        for a in ann:
            f.write(json.dumps(a) + "\n")
    ds = RetrievalVideoDataset(p, video_dir, transform=Resize(16),
                               num_frames=2)
    s = ds[0]  # index 0 fails -> walks to 1
    assert s["text"] == "good"
    assert s["index"] == 1


def test_meta_loader_deterministic():
    ds1 = SyntheticVideoDataset(length=4, num_frames=2, size=8)
    ds2 = SyntheticVideoDataset(length=8, num_frames=2, size=8)
    mk = lambda: MetaLoader([
        ShardedLoader(ds1, 2, num_workers=1, process_index=0,
                      process_count=1, seed=0),
        ShardedLoader(ds2, 2, num_workers=1, process_index=0,
                      process_count=1, seed=0)], seed=5)
    order1 = [src for src, _ in mk()]
    order2 = [src for src, _ in mk()]
    assert order1 == order2
    assert sorted(order1) == [0, 0, 1, 1, 1, 1]


def test_pre_caption():
    # reference semantics: punctuation removed, -/ become spaces
    assert pre_caption("Hello, World!!  Nice") == "hello world nice"
    assert pre_caption("semi-final w/e") == "semi final w e"
    assert pre_caption("a b c d", max_words=2) == "a b"


def test_qa_dataset(video_dir, tmp_path):
    import json as _json

    from youku_mplug_tpu.data.datasets import QAVideoDataset

    ann = [{"video_id": "vid0.mp4", "question": "What IS this?!",
            "answer": "a test"},
           {"video_id": "vid1.mp4", "question": "color?", "answer": "gray"}]
    p = str(tmp_path / "qa.jsonl")
    with open(p, "w") as f:
        for a in ann:
            f.write(_json.dumps(a) + "\n")

    ds = QAVideoDataset(p, video_dir, transform=Resize(16), num_frames=2,
                        split="train")
    s = ds[0]
    assert s["question"] == "what is this"  # pre_question cleanup
    assert s["answers"] == ["a test[SEP]"]

    ds_test = QAVideoDataset(p, video_dir, transform=Resize(16),
                             num_frames=2, split="test", answer_list=p)
    s = ds_test[1]
    assert s["question_id"] == 1
    assert sorted(ds_test.answer_list) == ["a test", "gray"]


def test_length_balanced_loader():
    from youku_mplug_tpu.data.loader import LengthBalancedLoader

    class LenDataset(SyntheticVideoDataset):
        def get_item_length(self, i):
            return i  # lengths 0..N-1

    ds = LenDataset(length=80, num_frames=2, size=8)
    per_rank_means = []
    all_seen = []
    for rank in range(2):
        loader = LengthBalancedLoader(ds, 4, num_bucket=4, num_workers=1,
                                      seed=1, process_index=rank,
                                      process_count=2)
        idxs = [i for b in loader for i in b["index"]]
        all_seen += idxs
        per_rank_means.append(np.mean(idxs))
    # balanced: both ranks see similar length distributions, no overlap
    assert abs(per_rank_means[0] - per_rank_means[1]) < 12
    assert len(all_seen) == len(set(all_seen))


def test_vqa_accuracy():
    from youku_mplug_tpu.evals.vqa import normalize_answer, vqa_accuracy

    assert normalize_answer("A Dog!") == "dog"
    assert normalize_answer("two") == "2"
    assert normalize_answer("isnt") == "isn't"

    preds = {0: "dog", 1: "cat"}
    anns = {0: ["dog"] * 10, 1: ["dog"] * 7 + ["cat"] * 3}
    acc = vqa_accuracy(preds, anns)
    assert acc > 50 and acc < 100  # q0 = 100%, q1 partial
    assert vqa_accuracy({0: "dog"}, {0: ["dog"] * 10}) == 100.0


def test_image_datasets(tmp_path):
    import cv2

    from youku_mplug_tpu.data.image_datasets import (
        ImageTextDataset,
        VQAImageDataset,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    for k in range(2):
        img = np.full((40, 40, 3), 30 * (k + 1), np.uint8)
        cv2.imwrite(str(d / f"im{k}.jpg"), img)

    ann = [{"image": "im0.jpg", "caption": "A Cat!"},
           {"image": "missing.jpg", "caption": "bad"},
           {"image": "im1.jpg", "caption": ["multi", "caps"]}]
    p = str(tmp_path / "it.json")
    json.dump(ann, open(p, "w"))

    ds = ImageTextDataset(p, str(d), transform=Resize(16))
    s0 = ds[0]
    assert s0["image"].shape == (16, 16, 3)
    assert s0["text"] == "a cat"
    s1 = ds[1]  # retry walks past the missing file
    assert s1["index"] == 2

    qann = [{"image": "im0.jpg", "question": "What色?", "answer": "gray"}]
    qp = str(tmp_path / "vqa.json")
    json.dump(qann, open(qp, "w"))
    qds = VQAImageDataset(qp, str(d), transform=Resize(16), split="train")
    q = qds[0]
    assert q["answers"] == ["gray[SEP]"]
    assert abs(sum(q["weights"]) - 1.0) < 1e-6


def test_gif_decode(tmp_path):
    """GIF clips decode through the same reader (reference read_frames_gif
    capability, dataset/video_utils/utils.py:120)."""
    from PIL import Image

    from youku_mplug_tpu.data.video_decode import read_frames

    gif = str(tmp_path / "t.gif")
    frames = [Image.fromarray(np.full((32, 32, 3), i * 40, np.uint8))
              for i in range(6)]
    frames[0].save(gif, save_all=True, append_images=frames[1:],
                   duration=100)
    clip = read_frames(gif, num_frames=4, sample="middle")
    assert clip.shape == (4, 32, 32, 3) and clip.dtype == np.uint8


def test_tar_packed_video(video_dir, tmp_path):
    import tarfile

    from youku_mplug_tpu.data.video_decode import read_frames

    archive = str(tmp_path / "pack.tar")
    with tarfile.open(archive, "w") as tf:
        tf.add(os.path.join(video_dir, "vid0.mp4"), arcname="vid0.mp4")
    clip = read_frames(archive + "/vid0.mp4", num_frames=2, sample="middle")
    assert clip.shape[0] == 2 and clip.dtype == np.uint8


def test_random_erasing_semantics():
    import numpy as np

    from youku_mplug_tpu.data.transforms import RandomErasing

    clip = np.ones((4, 32, 32, 3), np.float32)
    # p=1 const: same cube erased in every frame
    re = RandomErasing(probability=1.0, mode="const", cube=True)
    out = re(clip.copy(), rng=np.random.default_rng(0))
    erased = out == 0
    assert erased.any()
    # same box across frames
    per_frame = erased.reshape(4, -1)
    assert (per_frame == per_frame[0]).all()
    # area within bounds
    frac = erased[0].mean()
    assert 0.01 < frac < 0.40

    # pixel mode fills with noise, not a constant
    re = RandomErasing(probability=1.0, mode="pixel", cube=True)
    out = re(clip.copy(), rng=np.random.default_rng(1))
    changed = out != 1.0
    assert changed.any()
    vals = out[changed]
    assert np.unique(vals).size > 10

    # p=0: identity
    re = RandomErasing(probability=0.0)
    out = re(clip.copy(), rng=np.random.default_rng(2))
    np.testing.assert_array_equal(out, clip)

    # non-cube: boxes may differ across frames
    re = RandomErasing(probability=1.0, mode="const", cube=False)
    out = re(clip.copy(), rng=np.random.default_rng(3))
    per_frame = (out == 0).reshape(4, -1)
    assert not (per_frame == per_frame[0]).all()


def test_rand_augment_extra_ops_match_pil_semantics():
    """The full reference op table (rand_augment.py:398-415): each op must
    run on uint8 frames and match PIL where PIL defines the semantics."""
    import numpy as np

    from youku_mplug_tpu.data import transforms as T

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)

    for name in T.RAND_TRANSFORMS:
        fn, arg_fn = T.AUG_OPS[name]
        out = fn(img.copy(), *arg_fn(5))
        assert out.shape == img.shape and out.dtype == np.uint8, name

    # exact semantics spot-checks
    np.testing.assert_array_equal(T.AUG_OPS["Invert"][0](img), 255 - img)
    sol = T.AUG_OPS["Solarize"][0](img, 128)
    np.testing.assert_array_equal(sol[img < 128], img[img < 128])
    np.testing.assert_array_equal(sol[img >= 128], 255 - img[img >= 128])
    post = T.AUG_OPS["Posterize"][0](img, 4)
    np.testing.assert_array_equal(post, img & 0xF0)
    ac = T.AUG_OPS["AutoContrast"][0](img)
    for c in range(3):
        assert ac[..., c].min() == 0 and ac[..., c].max() == 255
    # Color factor 1.0 is identity; 0.0 is grayscale
    col1 = T.AUG_OPS["Color"][0](img, 1.0)
    np.testing.assert_allclose(col1, img, atol=1)
    col0 = T.AUG_OPS["Color"][0](img, 0.0)
    assert (col0[..., 0] == col0[..., 1]).all()

    # the temporal-consistent wrapper accepts the full reference list
    aug = T.TemporalConsistentRandAugment(n=3, m=7, augs=T.RAND_TRANSFORMS)
    clip = rng.integers(0, 256, (4, 24, 32, 3), dtype=np.uint8)
    out = aug(clip, rng=np.random.default_rng(1))
    assert out.shape == clip.shape


def test_read_frames_short_side(video_dir):
    """decode_short_side: aspect-preserving decode-time scale — short
    side hits the target, long side scales proportionally, and small
    sources are never upscaled."""
    from youku_mplug_tpu.data.video_decode import (
        _short_side_dims,
        read_frames,
    )

    path = os.path.join(video_dir, "vid1.mp4")  # 64x48 test clip
    out = read_frames(path, num_frames=2, sample="middle", short_side=24)
    assert out.shape == (2, 24, 32, 3)  # 48x64 -> 24x32
    # never upscale: short_side larger than the source is a no-op
    out = read_frames(path, num_frames=2, sample="middle", short_side=512)
    assert out.shape[1:] == (48, 64, 3)
    # dim helper: portrait sources scale the width side
    assert _short_side_dims(480, 640, 288) == (384, 288)
    assert _short_side_dims(640, 480, 288) == (288, 384)
    assert _short_side_dims(240, 320, 288) == (0, 0)


def test_translate_fast_path_matches_warp():
    """Integer translate offsets take the slice-copy fast path; it must be
    bit-exact with the warpAffine route it replaces."""
    import numpy as np

    from youku_mplug_tpu.data import transforms as T

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    for off in (0.0, 1.0, 5.0, 17.0, -4.0):
        want_x = T._warp(img, np.float32([[1, 0, -off], [0, 1, 0]]))
        np.testing.assert_array_equal(T._translate_x(img, off), want_x)
        want_y = T._warp(img, np.float32([[1, 0, 0], [0, 1, -off]]))
        np.testing.assert_array_equal(T._translate_y(img, off), want_y)
    # fractional offsets still go through warpAffine
    frac = T._translate_x(img, 2.5)
    assert frac.shape == img.shape


def test_mim_pretrain_transform(tmp_path):
    """Two-resolution MIM transform (reference DataAugmentationForPretrain,
    pretrain_transforms.py:155 + masking_generator.py): exact mask count,
    shared crop box across resolutions, worker determinism, dataset wiring."""
    import json
    import os

    import cv2
    import numpy as np

    from youku_mplug_tpu.data.image_datasets import ImageTextDataset
    from youku_mplug_tpu.data.pretrain_transforms import (
        BlockwiseMaskingGenerator,
        MIMPretrainTransform,
        TwoResolutionRandomResizedCrop,
    )

    # mask generator: exact count, every time, incl. hard corner cases
    for num in (1, 75, 118, 196):
        gen = BlockwiseMaskingGenerator(14, num)
        for seed in range(3):
            m = gen(np.random.default_rng(seed))
            assert m.shape == (14, 14) and m.sum() == num

    rng = np.random.default_rng(0)
    clip = rng.integers(0, 256, (2, 120, 160, 3), dtype=np.uint8)

    # same crop box in both streams: equal sizes + interp => equal pixels
    crop = TwoResolutionRandomResizedCrop(64, second_size=64)
    a, b = crop(clip, rng=np.random.default_rng(1))
    np.testing.assert_array_equal(a, b)
    # different second resolution keeps the box: on smooth content,
    # downscaling the first stream reproduces the second
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    smooth = np.stack([yy * 2, xx, (yy + xx)], axis=-1)
    smooth = np.clip(smooth, 0, 255).astype(np.uint8)[None].repeat(2, 0)
    crop2 = TwoResolutionRandomResizedCrop(64, second_size=32)
    a, b = crop2(smooth, rng=np.random.default_rng(1))
    assert a.shape == (2, 64, 64, 3) and b.shape == (2, 32, 32, 3)
    re = cv2.resize(a[0], (32, 32), interpolation=cv2.INTER_CUBIC)
    assert np.mean(np.abs(re.astype(np.int32) - b[0].astype(np.int32))) < 4

    # full transform: shapes, dtype, determinism under a fixed rng
    t = MIMPretrainTransform(input_size=64, window_size=4,
                             num_mask_patches=6)
    out1 = t(clip, rng=np.random.default_rng(7))
    out2 = t(clip, rng=np.random.default_rng(7))
    assert out1["patches"].shape == (2, 64, 64, 3)
    assert out1["patches"].dtype == np.uint8
    assert out1["visual_tokens"].shape == (2, 64, 64, 3)
    assert out1["mask"].shape == (4, 4) and out1["mask"].sum() == 6
    for k in out1:
        np.testing.assert_array_equal(out1[k], out2[k])

    # dataset wiring: ImageTextDataset(mim_transform=...) emits the
    # COCA-path keys consumed by MPLUG_COCA (image, target, flat mask)
    img_path = os.path.join(tmp_path, "im.png")
    cv2.imwrite(img_path, rng.integers(0, 256, (96, 96, 3), dtype=np.uint8))
    ann = os.path.join(tmp_path, "ann.json")
    json.dump([{"image": "im.png", "caption": "一只猫"}], open(ann, "w"))
    ds = ImageTextDataset(ann, image_root=str(tmp_path), mim_transform=t)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["image_target"].shape == (64, 64, 3)
    assert item["bool_masked_pos"].shape == (16,)
    assert item["bool_masked_pos"].sum() == 6
    assert item["text"] == "一只猫"
