"""Video frame reading: native libav decoder with cv2 fallback.

Mirrors the reference's read_frames_decord contract (reference:
dataset/video_utils/utils.py:97-117): sample frame indices, decode,
return (T, H, W, C) uint8 RGB.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from youku_mplug_tpu.data import native_decode
from youku_mplug_tpu.data.samplers import (
    get_frame_indices,
    get_frame_indices_start_end,
)


def _read_cv2(video_path, indices, width=0, height=0):
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {video_path}")
    try:
        order = sorted(set(int(i) for i in indices))
        frames = {}
        pos = 0
        want = iter(order)
        nxt = next(want, None)
        while nxt is not None:
            ok, frame = cap.read()
            if not ok:
                break
            if pos == nxt:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if width and height:
                    frame = cv2.resize(frame, (width, height),
                                       interpolation=cv2.INTER_CUBIC)
                frames[pos] = frame
                nxt = next(want, None)
            pos += 1
        if not frames:
            raise IOError(f"no frames decoded: {video_path}")
        last = frames[max(frames)]
        out = np.stack([frames.get(int(i), last) for i in indices])
        return out
    finally:
        cap.release()


def _probe_cv2(video_path):
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {video_path}")
    vlen = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    cap.release()
    return vlen, fps, (h, w)


def _resolve_tar(video_path: str) -> str:
    """Support tar-packed videos, ``archive.tar/member.mp4`` (the
    capability of the reference's read_from_tar,
    dataset/video_utils/utils.py:134-144): extract the member once into a
    per-archive temp cache and return the extracted path."""
    import hashlib
    import tarfile
    import tempfile

    if ".tar/" not in video_path:
        return video_path
    archive, member = video_path.split(".tar/", 1)
    archive += ".tar"
    cache = os.path.join(
        tempfile.gettempdir(), "youku_mplug_tpu_tar",
        hashlib.md5(archive.encode()).hexdigest())
    out = os.path.join(cache, member)
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        # extract to a unique temp file then atomically rename so
        # concurrent loader workers never observe a partial file
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out),
                                   prefix=".tarx_")
        try:
            with tarfile.open(archive) as tf:
                with tf.extractfile(member) as src, \
                        os.fdopen(fd, "wb") as dst:
                    dst.write(src.read())
            os.replace(tmp, out)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    return out


def _short_side_dims(h: int, w: int, short_side: int):
    """Aspect-preserving decode-time scale: short side -> ``short_side``
    (never upscales).  Returns (out_w, out_h), 0 meaning source size."""
    if short_side <= 0 or min(h, w) <= short_side:
        return 0, 0
    if h <= w:
        return int(round(w * short_side / h)), short_side
    return short_side, int(round(h * short_side / w))


def read_frames(video_path: str, num_frames: int = 8, sample: str = "rand",
                fix_start: Optional[int] = None, max_num_frames: int = -1,
                start_time: Optional[float] = None,
                end_time: Optional[float] = None,
                width: int = 0, height: int = 0, short_side: int = 0,
                rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Decode ``num_frames`` sampled frames -> (T, H, W, C) uint8 RGB.

    ``short_side``: decode-time sws-scale to this short side, preserving
    aspect (mutually exclusive with width/height).  The production lever
    for high-res sources: host transforms then touch ~short_side-px
    frames instead of source resolution, and the decoder's swscale does
    the one big resample in C (cf. reference read_frames_decord, which
    always decodes at source size: dataset/video_utils/utils.py:97-117).
    """
    video_path = _resolve_tar(video_path)
    use_native = native_decode.available()
    if use_native:
        reader = native_decode.NativeVideoReader(video_path)
        vlen = len(reader)
        fps = reader.fps or 30.0
        if short_side:
            height_, width_ = reader.shape
            width, height = _short_side_dims(height_, width_, short_side)
    else:
        vlen, fps, (height_, width_) = _probe_cv2(video_path)
        if short_side:
            width, height = _short_side_dims(height_, width_, short_side)
    if vlen <= 0:
        vlen = 1

    if start_time is not None and end_time is not None:
        indices = get_frame_indices_start_end(
            num_frames, vlen, fps, start_time, end_time, rng=rng)
    else:
        indices = get_frame_indices(
            num_frames, vlen, sample=sample, fix_start=fix_start,
            input_fps=fps, max_num_frames=max_num_frames, rng=rng)

    if use_native:
        try:
            return reader.get_batch(indices, width=width, height=height)
        finally:
            reader.close()
    return _read_cv2(video_path, indices, width=width, height=height)
