"""data/remote_io.py: oss:// and http:// fetch, caching, eviction, and
dataset integration (reference: dataset/video_pretrain_dataset.py:34-82)."""

import os
import sys
import types

import numpy as np
import pytest

from youku_mplug_tpu.data import remote_io


@pytest.fixture
def fake_oss2(monkeypatch):
    """Inject an in-memory oss2 SDK."""
    store = {}

    class _Obj:
        def __init__(self, data):
            self._d = data

        def read(self):
            return self._d

    class Auth:
        def __init__(self, ak, sk):
            self.ak, self.sk = ak, sk

    class Bucket:
        def __init__(self, auth, endpoint, name):
            assert auth.ak and auth.sk and endpoint
            self.name = name

        def get_object(self, key):
            if (self.name, key) not in store:
                raise KeyError(key)
            return _Obj(store[(self.name, key)])

    mod = types.ModuleType("oss2")
    mod.Auth = Auth
    mod.Bucket = Bucket
    monkeypatch.setitem(sys.modules, "oss2", mod)
    remote_io._BUCKETS.clear()
    remote_io.configure_oss(
        {"vids": {"AK": "k", "SK": "s", "ENDPOINT": "http://e"}})
    yield store
    remote_io._BUCKETS.clear()
    remote_io._OSS_INFO.clear()


def test_is_remote():
    assert remote_io.is_remote("oss://b/k.mp4")
    assert remote_io.is_remote("https://h/v.mp4")
    assert not remote_io.is_remote("/data/v.mp4")
    assert not remote_io.is_remote("rel/v.mp4")


def test_oss_read_bytes(fake_oss2):
    fake_oss2[("vids", "a/b.mp4")] = b"hello-video"
    assert remote_io.read_bytes("oss://vids/a/b.mp4") == b"hello-video"


def test_oss_missing_credentials(fake_oss2, monkeypatch):
    for v in ("OSS_ACCESS_KEY_ID", "OSS_ACCESS_KEY_SECRET", "OSS_ENDPOINT"):
        monkeypatch.delenv(v, raising=False)
    with pytest.raises(KeyError, match="no credentials"):
        remote_io.read_bytes("oss://unknown-bucket/k.mp4")


def test_oss_env_credentials(fake_oss2, monkeypatch):
    monkeypatch.setenv("OSS_ACCESS_KEY_ID", "ak")
    monkeypatch.setenv("OSS_ACCESS_KEY_SECRET", "sk")
    monkeypatch.setenv("OSS_ENDPOINT", "http://e2")
    fake_oss2[("envbucket", "x.mp4")] = b"z"
    assert remote_io.read_bytes("oss://envbucket/x.mp4") == b"z"


def test_fetch_caches_and_evicts(fake_oss2, tmp_path):
    fake_oss2[("vids", "c.mp4")] = b"AAAA"
    cache = str(tmp_path / "cache")
    p1 = remote_io.fetch("oss://vids/c.mp4", cache_dir=cache)
    assert open(p1, "rb").read() == b"AAAA"
    assert p1.endswith(".mp4")
    # cached: a changed remote is NOT re-read
    fake_oss2[("vids", "c.mp4")] = b"BBBB"
    p2 = remote_io.fetch("oss://vids/c.mp4", cache_dir=cache)
    assert p2 == p1 and open(p2, "rb").read() == b"AAAA"
    # evict forces re-download
    remote_io.evict("oss://vids/c.mp4", cache_dir=cache)
    p3 = remote_io.fetch("oss://vids/c.mp4", cache_dir=cache)
    assert open(p3, "rb").read() == b"BBBB"


def test_fetch_local_passthrough(tmp_path):
    f = tmp_path / "local.mp4"
    f.write_bytes(b"x")
    assert remote_io.fetch(str(f)) == str(f)


def test_retry_then_fail(fake_oss2):
    calls = []

    class FlakyBucket:
        def get_object(self, key):
            calls.append(key)
            raise IOError("flake")

    remote_io._BUCKETS["vids"] = FlakyBucket()
    with pytest.raises(IOError, match="after 3 tries"):
        remote_io.read_bytes("oss://vids/x.mp4", retries=3, backoff=0.0)
    assert len(calls) == 3


def test_http_fetch(tmp_path):
    import http.server
    import threading

    (tmp_path / "v.bin").write_bytes(b"HTTPDATA")

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=str(tmp_path), **k)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        data = remote_io.read_bytes(f"http://127.0.0.1:{port}/v.bin")
        assert data == b"HTTPDATA"
        p = remote_io.fetch(f"http://127.0.0.1:{port}/v.bin",
                            cache_dir=str(tmp_path / "c"))
        assert open(p, "rb").read() == b"HTTPDATA"
    finally:
        srv.shutdown()


def test_dataset_remote_root(fake_oss2, tmp_path, monkeypatch):
    """VideoDataset with an oss:// root decodes through the spool cache."""
    from youku_mplug_tpu.data import video_decode
    from youku_mplug_tpu.data.datasets import VideoDataset

    # make a tiny real clip, upload it to the fake bucket
    clip_path = str(tmp_path / "src.mp4")
    _write_tiny_video(clip_path)
    fake_oss2[("vids", "v001.mp4")] = open(clip_path, "rb").read()

    monkeypatch.setattr(remote_io, "DEFAULT_CACHE",
                        str(tmp_path / "spool"))
    ds = VideoDataset([{"video_id": "v001.mp4", "caption": "c"}],
                      "oss://vids", num_frames=2)
    # patch fetch default used inside _decode via DEFAULT_CACHE monkeypatch
    clip = ds._load_clip(0)
    assert clip.shape[0] == 2 and clip.shape[-1] == 3
    assert os.listdir(tmp_path / "spool")


def _write_tiny_video(path, frames=4, size=32):
    cv2 = pytest.importorskip("cv2")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 4,
                        (size, size))
    rng = np.random.default_rng(0)
    for _ in range(frames):
        w.write(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    w.release()
