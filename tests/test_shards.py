"""Tar-shard streaming dataset: write/read roundtrip, worker sharding,
shuffle buffer determinism."""

import numpy as np

from affectgpt_tpu.data.shards import ShardDataset, iter_shard, write_shards


def _make(tmp_path, n=25, shard_size=10):
    samples = [
        {
            "__key__": f"clip{i:04d}",
            "feat.npy": np.full((3, 4), i, np.float32),
            "meta.json": {"idx": i},
            "cap.txt": f"caption {i}",
        }
        for i in range(n)
    ]
    return write_shards(samples, str(tmp_path / "shards"), shard_size=shard_size)


def test_roundtrip(tmp_path):
    paths = _make(tmp_path)
    assert len(paths) == 3  # 25 samples / 10 per shard
    got = list(iter_shard(paths[0]))
    assert len(got) == 10
    s = got[7]
    assert s["__key__"] == "clip0007"
    np.testing.assert_array_equal(s["feat.npy"], np.full((3, 4), 7, np.float32))
    assert s["meta.json"] == {"idx": 7} and s["cap.txt"] == "caption 7"


def test_worker_split_disjoint_and_complete(tmp_path):
    paths = _make(tmp_path)
    seen = []
    for w in range(2):
        ds = ShardDataset(paths, worker_index=w, num_workers=2)
        seen.append({s["__key__"] for s in ds})
    assert not (seen[0] & seen[1])
    assert seen[0] | seen[1] == {f"clip{i:04d}" for i in range(25)}


def test_shuffle_deterministic_and_epoch_varies(tmp_path):
    paths = _make(tmp_path)
    order1 = [s["__key__"] for s in ShardDataset(paths, shuffle_buffer=8, seed=3)]
    order2 = [s["__key__"] for s in ShardDataset(paths, shuffle_buffer=8, seed=3)]
    assert order1 == order2  # same seed+epoch → same stream
    ds = ShardDataset(paths, shuffle_buffer=8, seed=3)
    e1 = [s["__key__"] for s in ds]
    e2 = [s["__key__"] for s in ds]  # second epoch reshuffles
    assert sorted(e1) == sorted(e2) and e1 != e2
    assert e1 != [f"clip{i:04d}" for i in range(25)]  # actually shuffled


def test_transform(tmp_path):
    paths = _make(tmp_path, n=5, shard_size=5)
    ds = ShardDataset(paths, transform=lambda s: {"k": s["__key__"].upper()})
    assert next(iter(ds)) == {"k": "CLIP0000"}
