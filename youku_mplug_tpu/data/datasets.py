"""Video-text datasets (annotation reading + decode + transform + retry).

Mirrors the reference's dataset classes (reference:
dataset/video_pretrain_dataset.py:18-101 pretrain;
dataset/video_downstream_datasets.py — retrieval train/eval:34-207,
caption:335, cls:413-455, qa:219) with the same annotation formats:

- pretrain: CSV with ``video_id:FILE``/``title`` columns or JSON list of
  {"video_id", "caption"} (optional start_time/end_time)
- retrieval: jsonl/CSV of {"clip_name", "caption"} with match_ids
- caption: jsonl of {"video_id"|"clip_name", "golden_caption"} eval lists
- cls: jsonl of {"video_id", "video_title", "category_id"/"label"}

Fault tolerance matches the reference: decode failures retry, then fall
through to another index (pretrain: random resample up to 20; downstream:
walk to the next index).

Samples return uint8 (T, H, W, C) clips; normalization happens on device
(ops/preprocess.py).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from youku_mplug_tpu.data import remote_io
from youku_mplug_tpu.data.video_decode import read_frames


def load_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def pre_caption(caption: str, max_words: int = 0) -> str:
    """Caption cleanup (reference dataset/utils.py:19-40): strip
    punctuation, dashes/slashes to spaces, collapse whitespace."""
    caption = re.sub(r"([,.'!?\"()*#:;~])", "", caption.lower())
    caption = caption.replace("-", " ").replace("/", " ").replace(
        "<person>", "person")
    caption = re.sub(r"\s{2,}", " ", caption)
    caption = caption.rstrip("\n").strip(" ")
    if max_words > 0:
        words = caption.split(" ")
        if len(words) > max_words:
            caption = " ".join(words[:max_words])
    return caption


def _read_annotations(ann_file, id_key="video_id", text_key="caption"):
    """CSV (``<id>:FILE`` convention) / json / jsonl annotation reader."""
    files = ann_file if isinstance(ann_file, (list, tuple)) else [ann_file]
    ann = []
    for f in files:
        if f.endswith(".csv"):
            import pandas as pd

            df = pd.read_csv(f)
            id_col = next(c for c in df.columns if c.endswith(":FILE"))
            text_col = next(c for c in df.columns if not c.endswith(":FILE"))
            ann += [{id_key: v, text_key: t}
                    for v, t in zip(df[id_col], df[text_col])]
        elif f.endswith(".jsonl"):
            ann += load_jsonl(f)
        else:
            ann += json.load(open(f))
    return ann


class VideoDataset:
    """Base: decode with retries, transform, uint8 output."""

    def __init__(self, ann: List[dict], video_root: str, transform=None,
                 num_frames: int = 8, sample: str = "rand", seed: int = 0,
                 decode_size: int = 0, decode_short_side: int = 0):
        self.ann = ann
        self.video_root = video_root
        self.transform = transform
        self.num_frames = num_frames
        self.sample = sample
        self.seed = seed
        self.epoch = 0
        # decode_size > 0: ask the decoder to rescale during decode (cheap
        # sws resize) so the host transform works on small frames.
        # decode_short_side > 0: the aspect-preserving variant (the
        # production lever; see read_frames).
        self.decode_size = decode_size
        self.decode_short_side = decode_short_side

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.ann)

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 2_654_435_761
            + index)

    def _video_path(self, ann: dict) -> str:
        vid = ann.get("video_id") or ann.get("clip_name")
        if remote_io.is_remote(self.video_root):
            # oss:// / http(s):// corpus (reference reads these straight
            # from the bucket, video_pretrain_dataset.py:70-82); spooled
            # to the local cache at decode time (remote_io.fetch)
            return self.video_root.rstrip("/") + "/" + str(vid)
        path = os.path.join(self.video_root, str(vid))
        if not os.path.splitext(path)[1]:
            for ext in (".mp4", ".avi", ".mkv", ".webm"):
                if os.path.exists(path + ext):
                    return path + ext
        return path

    def _decode(self, ann: dict, rng) -> np.ndarray:
        kw = {}
        if ann.get("start_time") is not None and ann.get(
                "end_time") is not None:
            kw = {"start_time": ann["start_time"],
                  "end_time": ann["end_time"]}
        return read_frames(
            remote_io.fetch(self._video_path(ann)),
            num_frames=self.num_frames,
            sample=self.sample, rng=rng,
            width=self.decode_size, height=self.decode_size,
            short_side=self.decode_short_side, **kw)

    def _load_clip(self, index: int, retries: int = 3):
        rng = self._rng(index)
        err = None
        for _ in range(retries):
            try:
                clip = self._decode(self.ann[index], rng)
                if self.transform is not None:
                    clip = self.transform(clip, rng=rng)
                return clip
            except Exception as e:  # decode failure tolerance
                err = e
                # a corrupt spool file would fail every retry; re-download
                remote_io.evict(self._video_path(self.ann[index]))
        raise IOError(f"decode failed for index {index}: {err}")


class PretrainVideoDataset(VideoDataset):
    """(clip, caption) pairs; random-resample retry up to 20 tries
    (reference video_pretrain_dataset.py:45-96)."""

    def __init__(self, ann_file, video_root, transform=None, num_frames=8,
                 max_words=30, seed=0, **kw):
        ann = _read_annotations(ann_file)
        for a in ann:
            if "title" in a and "caption" not in a:
                a["caption"] = a.pop("title")
        super().__init__(ann, video_root, transform, num_frames, seed=seed,
                         **kw)
        self.max_words = max_words

    def __getitem__(self, index: int):
        rng = self._rng(index)
        for _ in range(20):
            try:
                clip = self._load_clip(index)
                text = pre_caption(str(self.ann[index]["caption"]),
                                   self.max_words)
                return {"video": clip, "text": text, "index": index}
            except Exception:
                index = int(rng.integers(0, len(self)))
        raise IOError("too many decode failures")


class RetrievalVideoDataset(VideoDataset):
    """(clip, caption, match_id); eval variant also exposes the text list
    and vid2txt/txt2vid maps (reference video_downstream_datasets.py:34-207).
    """

    def __init__(self, ann_file, video_root, transform=None, num_frames=4,
                 max_words=80, has_multi_vision_gt=False, train=True,
                 seed=0, **kw):
        ann = _read_annotations(ann_file, id_key="clip_name")
        super().__init__(ann, video_root, transform, num_frames,
                         sample="rand" if train else "middle", seed=seed,
                         **kw)
        self.max_words = max_words
        self.train = train
        self.has_multi_vision_gt = has_multi_vision_gt
        self.match_ids: Dict[Any, int] = {}
        n = 0
        for a in self.ann:
            key = a["caption"] if has_multi_vision_gt else a["clip_name"]
            if key not in self.match_ids:
                self.match_ids[key] = n
                n += 1
        # eval indexing structures
        self.text: List[str] = []
        self.txt2vid: Dict[int, List[int]] = {}
        self.vid2txt: Dict[int, List[int]] = {}
        for vi, a in enumerate(self.ann):
            caps = a["caption"] if isinstance(a["caption"], list) else [
                a["caption"]]
            self.vid2txt[vi] = []
            for c in caps:
                ti = len(self.text)
                self.text.append(pre_caption(str(c), self.max_words))
                self.vid2txt[vi].append(ti)
                self.txt2vid[ti] = [vi]

    def __getitem__(self, index: int):
        orig = index
        for _ in range(len(self)):
            try:
                clip = self._load_clip(index)
                a = self.ann[index]
                cap = a["caption"] if not isinstance(a["caption"], list) \
                    else a["caption"][0]
                key = a["caption"] if self.has_multi_vision_gt else \
                    a["clip_name"]
                return {"video": clip,
                        "text": pre_caption(str(cap), self.max_words),
                        "match_id": self.match_ids[key],
                        "index": index}
            except Exception:
                index = 0 if index == len(self) - 1 else index + 1
                if index == orig:
                    break
        raise IOError("all decode attempts failed")


class CaptionVideoDataset(VideoDataset):
    """caption finetune/eval; eval keeps golden captions per video
    (reference video_downstream_datasets.py:335-410)."""

    def __init__(self, ann_file, video_root, transform=None, num_frames=16,
                 max_words=80, train=True, prompt="", seed=0, **kw):
        ann = _read_annotations(ann_file)
        super().__init__(ann, video_root, transform, num_frames,
                         sample="rand" if train else "middle", seed=seed,
                         **kw)
        self.max_words = max_words
        self.train = train
        self.prompt = prompt

    def __getitem__(self, index: int):
        orig = index
        for _ in range(len(self)):
            try:
                clip = self._load_clip(index)
                a = self.ann[index]
                cap = a.get("caption") or a.get("golden_caption") or ""
                if isinstance(cap, list):
                    golden = [pre_caption(str(c), self.max_words)
                              for c in cap]
                    cap = cap[0]
                else:
                    golden = [pre_caption(str(cap), self.max_words)]
                vid = a.get("video_id") or a.get("clip_name")
                return {"video": clip,
                        "text": pre_caption(str(cap), self.max_words),
                        "golden": golden,
                        "video_id": str(vid),
                        "index": index}
            except Exception:
                index = 0 if index == len(self) - 1 else index + 1
                if index == orig:
                    break
        raise IOError("all decode attempts failed")


class ClsVideoDataset(VideoDataset):
    """(clip, title, label) for 45-way category prediction (reference
    video_downstream_datasets.py:413-455)."""

    def __init__(self, ann_file, video_root, transform=None, num_frames=8,
                 max_words=80, train=True, seed=0, **kw):
        ann = _read_annotations(ann_file)
        super().__init__(ann, video_root, transform, num_frames,
                         sample="rand" if train else "middle", seed=seed,
                         **kw)
        self.max_words = max_words
        self.train = train

    def __getitem__(self, index: int):
        orig = index
        for _ in range(len(self)):
            try:
                clip = self._load_clip(index)
                a = self.ann[index]
                title = a.get("video_title") or a.get("title") or ""
                label = a.get("category_id", a.get("label", -1))
                return {"video": clip,
                        "text": pre_caption(str(title), self.max_words),
                        "label": int(label),
                        "index": index}
            except Exception:
                index = 0 if index == len(self) - 1 else index + 1
                if index == orig:
                    break
        raise IOError("all decode attempts failed")


class SyntheticVideoDataset:
    """Procedural clips + captions, for tests and input-pipeline benches."""

    def __init__(self, length=64, num_frames=8, size=224, num_classes=5,
                 transform=None):
        self.length = length
        self.num_frames = num_frames
        self.size = size
        self.num_classes = num_classes
        self.transform = transform

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        rng = np.random.default_rng(index)
        t, s = self.num_frames, self.size
        base = rng.integers(0, 255, size=(1, s, s, 3), dtype=np.uint8)
        drift = (np.arange(t, dtype=np.int16)[:, None, None, None] * 3)
        clip = ((base.astype(np.int16) + drift) % 256).astype(np.uint8)
        if self.transform is not None:
            clip = self.transform(clip, rng=rng)
        label = index % self.num_classes
        return {"video": clip, "text": f"synthetic clip {index} class "
                                       f"{label}",
                "label": label, "match_id": index, "index": index,
                "golden": [f"synthetic clip {index}"],
                "video_id": str(index)}


def pre_question(question: str, max_words: int = 0) -> str:
    """Question cleanup (reference dataset/utils.py:3-16)."""
    question = re.sub(r"([,.'!?\"()*#:;~])", "", question.lower())
    question = question.replace("-", " ").replace("/", " ")
    question = question.rstrip(" ")
    if max_words > 0:
        words = question.split(" ")
        if len(words) > max_words:
            question = " ".join(words[:max_words])
    return question


class QAVideoDataset(VideoDataset):
    """Video question answering (reference video_qa_dataset,
    video_downstream_datasets.py:219-323): train yields
    (clip, question, answers, weights); test yields
    (clip, question, question_id) plus an answer candidate list."""

    def __init__(self, ann_file, video_root, transform=None, num_frames=16,
                 max_ques_words=30, split="train", eos="[SEP]",
                 answer_list="", seed=0, **kw):
        ann = _read_annotations(ann_file)
        super().__init__(ann, video_root, transform, num_frames,
                         sample="rand" if split == "train" else "middle",
                         seed=seed, **kw)
        self.split = split
        self.eos = eos
        self.max_ques_words = 50 if split == "test" else max_ques_words
        self.answer_list = []
        if split == "test" and answer_list:
            if answer_list.endswith(".json"):
                self.answer_list = list(json.load(open(answer_list)).keys())
            else:
                self.answer_list = sorted(
                    {x["answer"] for x in load_jsonl(answer_list)})
        for idx, a in enumerate(self.ann):
            a["question_id"] = idx

    def __getitem__(self, index):
        orig = index
        for _ in range(len(self)):
            try:
                clip = self._load_clip(index)
                a = self.ann[index]
                question = pre_question(str(a["question"]),
                                        self.max_ques_words)
                if self.split == "train":
                    return {"video": clip, "question": question,
                            "answers": [str(a["answer"]) + self.eos],
                            "weights": [1.0], "index": index}
                return {"video": clip, "question": question,
                        "question_id": int(a["question_id"]),
                        "index": index}
            except Exception:
                index = 0 if index == len(self) - 1 else index + 1
                if index == orig:
                    break
        raise IOError("all decode attempts failed")
