"""Multi-host contracts, simulated: per-host loader sharding (the
DistributedSampler contract — reference dataset/dist_utils + torch
DistributedSampler usage) and a real two-process jax.distributed CPU
bring-up through runtime.mesh.distributed_init."""

import os
import subprocess
import sys

import numpy as np
import pytest


class _IdxDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": i}


def _all_host_batches(n_items, batch_size, world, epoch=0, shuffle=True,
                      drop_last=True):
    from youku_mplug_tpu.data.loader import ShardedLoader

    per_host = []
    for rank in range(world):
        loader = ShardedLoader(_IdxDataset(n_items), batch_size,
                               shuffle=shuffle, seed=7, drop_last=drop_last,
                               num_workers=2, process_index=rank,
                               process_count=world)
        loader.set_epoch(epoch)
        batches = [b["idx"] for b in loader]
        per_host.append(batches)
    return per_host


@pytest.mark.parametrize("world,n_items,batch", [(4, 64, 4), (3, 50, 4)])
def test_loader_shards_disjoint_and_covering(world, n_items, batch):
    per_host = _all_host_batches(n_items, batch, world)
    # same number of batches on every host (collective-deadlock freedom)
    counts = {len(b) for b in per_host}
    assert len(counts) == 1
    seen = [int(i) for host in per_host for b in host for i in b.ravel()]
    # disjoint across hosts up to the wrap-padding duplicates
    uniq, cnt = np.unique(seen, return_counts=True)
    n_pad = ((n_items + world - 1) // world) * world - n_items
    assert (cnt > 1).sum() <= n_pad + world * batch  # wrap + drop_last slack
    # coverage: with drop_last the tail may be dropped, but most items seen
    assert len(uniq) >= n_items - world * batch
    # different epochs reshuffle identically across hosts
    e1 = _all_host_batches(n_items, batch, world, epoch=1)
    assert not all(
        np.array_equal(a, b)
        for ha, hb in zip(per_host, e1) for a, b in zip(ha, hb))


def test_loader_same_seed_same_order_across_hosts():
    """Host shards must come from ONE global permutation (same seed):
    interleaving the host shards reconstructs that permutation."""
    from youku_mplug_tpu.data.loader import ShardedLoader

    world, n = 4, 32
    shards = []
    for rank in range(world):
        loader = ShardedLoader(_IdxDataset(n), 8, shuffle=True, seed=3,
                               drop_last=True, num_workers=1,
                               process_index=rank, process_count=world)
        shards.append(np.concatenate([b["idx"] for b in loader]))
    interleaved = np.stack(shards, axis=1).ravel()  # undo order[rank::world]
    perm = np.random.default_rng(3 * 100_003 + 0).permutation(n)
    np.testing.assert_array_equal(interleaved, perm)


def test_local_batch_size_contract():
    import jax

    from youku_mplug_tpu.runtime.mesh import (
        MeshConfig,
        local_batch_size,
        make_mesh,
    )

    mesh = make_mesh(MeshConfig(data=4, model=2))
    # single process: per-host == global
    assert local_batch_size(32, mesh) == 32
    with pytest.raises(ValueError):
        local_batch_size(30, mesh)  # not divisible by data axis


def test_two_process_distributed_init(tmp_path):
    """Real jax.distributed bring-up: two CPU processes rendezvous via
    distributed_init, see a global 2-device topology, and agree on
    disjoint loader shards (reference NCCL init: initialize.py:134-141)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ""  # no inherited forced device count
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))})
from youku_mplug_tpu.runtime.mesh import distributed_init
pid = int(sys.argv[1])
distributed_init("127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2 * len(jax.local_devices()), (
    jax.device_count(), len(jax.local_devices()))
from youku_mplug_tpu.data.loader import ShardedLoader
class DS:
    def __len__(self): return 16
    def __getitem__(self, i): return {{"idx": i}}
loader = ShardedLoader(DS(), 4, shuffle=False, num_workers=1)
idx = sorted(int(x) for b in loader for x in b["idx"])
expected = list(range(pid, 16, 2))
assert idx == expected, (idx, expected)
print("OK", pid, flush=True)
""")
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed CPU rendezvous timed out on this host")
    for rc, out in outs:
        assert rc == 0, out
        assert "OK" in out


def test_gather_eval_rows_single_process_dedup():
    from youku_mplug_tpu.cli.common import gather_eval_rows

    rows = np.arange(8, dtype=np.float32).reshape(4, 2)
    order = np.array([2, 0, 1, 0])  # wrap-padded duplicate of index 0
    merged, idx = gather_eval_rows(rows, order)
    np.testing.assert_array_equal(idx, [0, 1, 2])
    np.testing.assert_array_equal(merged[0], rows[1])  # first occurrence
    np.testing.assert_array_equal(merged[2], rows[0])


def test_collect_records_single_process_dedup():
    from youku_mplug_tpu.cli.common import collect_records, sum_across_hosts

    recs = [{"video_id": "a", "pred": "x"}, {"video_id": "b", "pred": "y"},
            {"video_id": "a", "pred": "z"}]  # wrap-padded duplicate
    merged = collect_records(recs, dedup_key="video_id")
    assert [r["video_id"] for r in merged] == ["a", "b"]
    assert merged[0]["pred"] == "x"  # first occurrence kept
    np.testing.assert_array_equal(sum_across_hosts(np.array([1.0, 2.0])),
                                  [1.0, 2.0])


def test_collect_records_two_processes(tmp_path):
    """String eval records (captions/QA answers) merge across hosts via
    the padded-uint8 allgather — the analog of the reference's
    collect_result per-rank JSON files (dataset/utils.py:80-160); and
    sum_across_hosts reduces eval counters (run_cls:250-263)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))})
import numpy as np
from youku_mplug_tpu.runtime.mesh import distributed_init
pid = int(sys.argv[1])
distributed_init("127.0.0.1:{port}", num_processes=2, process_id=pid)
from youku_mplug_tpu.cli.common import collect_records, sum_across_hosts
# host 0 scored items 0,2 (+wrap dup of 0); host 1 scored 1,3 — with
# CJK text to exercise the utf-8 payload path
recs = ([{{"video_id": "v0", "cap": "你好"}}, {{"video_id": "v2", "cap": "c2"}},
         {{"video_id": "v0", "cap": "dup"}}] if pid == 0 else
        [{{"video_id": "v1", "cap": "c1"}}, {{"video_id": "v3", "cap": "世界"}}])
merged = collect_records(recs, dedup_key="video_id")
ids = sorted(r["video_id"] for r in merged)
assert ids == ["v0", "v1", "v2", "v3"], ids
caps = {{r["video_id"]: r["cap"] for r in merged}}
assert caps["v0"] == "你好" and caps["v3"] == "世界", caps
tot = sum_across_hosts(np.array([1.0 + pid, 10.0]))
np.testing.assert_allclose(tot, [3.0, 20.0])
print("OK", pid, flush=True)
""")
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed CPU rendezvous timed out")
    for rc, out in outs:
        assert rc == 0, out
        assert "OK" in out


def test_gather_eval_rows_two_processes(tmp_path):
    """Each host scores its loader shard; gather_eval_rows must merge the
    shards into the full, ordered matrix on BOTH hosts (the reference's
    rank-partitioned eval + collect_result)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))})
import numpy as np
from youku_mplug_tpu.runtime.mesh import distributed_init
pid = int(sys.argv[1])
distributed_init("127.0.0.1:{port}", num_processes=2, process_id=pid)
from youku_mplug_tpu.cli.common import gather_eval_rows
# each host scored rows for its strided shard of 6 items (wrap to 8)
idx = np.arange(pid, 8, 2) % 6
rows = idx[:, None].astype(np.float32) * np.ones((1, 3), np.float32)
merged, order = gather_eval_rows(rows, idx)
assert list(order) == list(range(6)), order
np.testing.assert_array_equal(merged[:, 0], np.arange(6))
print("OK", pid, flush=True)
""")
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed CPU rendezvous timed out")
    for rc, out in outs:
        assert rc == 0, out
        assert "OK" in out
