"""Host data-plane tests: samplers, threaded loader, transforms, decollate."""

import numpy as np
import pytest
from PIL import Image

from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.data.loaders import DataLoader, collate
from ganslate_tpu.data.samplers import InfiniteSampler, SequentialShardSampler
from ganslate_tpu.data.utils.transforms import (get_paired_image_transform,
                                                get_single_image_transform)
from ganslate_tpu.utils.io import decollate


class ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"A": np.full((4, 4, 1), float(i), np.float32),
                "idx": i,
                "metadata": {"name": f"s{i}"}}


def test_infinite_sampler_covers_dataset():
    sampler = InfiniteSampler(size=10, shuffle=True, seed=3)
    it = iter(sampler)
    first_epoch = [next(it) for _ in range(10)]
    assert sorted(first_epoch) == list(range(10))  # a full permutation
    # stream continues indefinitely
    more = [next(it) for _ in range(25)]
    assert len(more) == 25


def test_sampler_world_size_remap_continuity(monkeypatch):
    """Pod-reshape resume: a ws=2 run where each process consumed P indices
    has covered exactly the first 2P slots of the shared raw stream; a ws=1
    sampler fast-forwarded to the remapped global cursor (2P) continues with
    slot 2P — no repeated and no skipped sample (VERDICT r4 item 8)."""
    from ganslate_tpu.utils import communication

    size, P, seed = 10, 7, 11
    consumed = []
    for rank in (0, 1):
        monkeypatch.setattr(communication, "get_rank", lambda r=rank: r)
        monkeypatch.setattr(communication, "get_world_size", lambda: 2)
        it = iter(InfiniteSampler(size=size, shuffle=True, seed=seed))
        consumed.append([next(it) for _ in range(P)])

    monkeypatch.setattr(communication, "get_rank", lambda: 0)
    monkeypatch.setattr(communication, "get_world_size", lambda: 1)
    raw_stream = iter(InfiniteSampler(size=size, shuffle=True, seed=seed))
    first = [next(raw_stream) for _ in range(2 * P)]
    # ranks interleave the shared raw stream: rank r owns slots r, r+2, ...
    assert consumed[0] == first[0::2]
    assert consumed[1] == first[1::2]

    resumed = InfiniteSampler(size=size, shuffle=True, seed=0)
    resumed.set_state(seed, 2 * P)   # the remapped global cursor
    cont = iter(resumed)
    continuation = [next(cont) for _ in range(15)]
    expected = [next(raw_stream) for _ in range(15)]
    assert continuation == expected


def test_trainer_restore_remaps_world_size(tmp_path):
    """Trainer._restore_data_state maps a sidecar saved at world_size=2 to
    this run's world_size=1: per-process position 6 -> global cursor 12."""
    import json
    import logging

    from ganslate_tpu.engines.trainer import Trainer

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    (ckpt / "data_state_3.json").write_text(json.dumps(
        {"sampler_seed": 5, "position": 6, "world_size": 2}))

    sampler = InfiniteSampler(size=10, seed=0)

    class _Stub:
        pass

    stub = _Stub()
    stub.data_loader = _Stub()
    stub.data_loader.sampler = sampler
    stub.conf = Conf.create({"train": {"output_dir": str(tmp_path)}})
    stub.logger = logging.getLogger("test_ws_remap")
    Trainer._restore_data_state(stub, 3)
    assert sampler.seed == 5
    assert sampler.position == 12


def test_sequential_shard_sampler():
    s0 = list(SequentialShardSampler(10, shard=0, num_shards=2))
    s1 = list(SequentialShardSampler(10, shard=1, num_shards=2))
    assert s0 == [0, 2, 4, 6, 8] and s1 == [1, 3, 5, 7, 9]
    assert len(SequentialShardSampler(10, 0, 2)) == 5


@pytest.mark.parametrize("num_workers", [0, 2])
def test_loader_batches_and_collate(num_workers):
    ds = ToyDataset(10)
    loader = DataLoader(ds, sampler=SequentialShardSampler(10),
                        batch_size=4, num_workers=num_workers, drop_last=False)
    batches = list(loader)
    assert len(batches) == 3  # 4 + 4 + 2
    assert batches[0]["A"].shape == (4, 4, 4, 1)
    assert batches[2]["A"].shape == (2, 4, 4, 1)
    # scalars stack, metadata dicts collate recursively
    np.testing.assert_array_equal(batches[0]["idx"], [0, 1, 2, 3])
    assert batches[0]["metadata"]["name"] == ["s0", "s1", "s2", "s3"]
    assert len(loader) == 3


def test_loader_drop_last_and_infinite():
    ds = ToyDataset(10)
    loader = DataLoader(ds, sampler=InfiniteSampler(10, seed=0),
                        batch_size=4, num_workers=2, drop_last=True)
    it = iter(loader)
    for _ in range(5):  # infinite stream keeps producing full batches
        batch = next(it)
        assert batch["A"].shape[0] == 4


def test_loader_worker_error_propagates():
    class Broken(ToyDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = DataLoader(Broken(4), sampler=SequentialShardSampler(4),
                        batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        next(iter(loader))


def _transform_conf(preprocess, mode="train"):
    return Conf.create({
        "mode": mode,
        mode: {"dataset": {
            "image_channels": 3,
            "preprocess": preprocess,
            "load_size": [20, 20],
            "final_size": [16, 16],
        }}})


def test_single_transform_resize_crop_flip():
    conf = _transform_conf(["resize", "random_crop", "random_flip"])
    transform = get_single_image_transform(conf)
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (30, 40, 3), np.uint8).astype(np.uint8))
    out = transform(img, rng=np.random.default_rng(0))
    assert out.shape == (16, 16, 3)
    assert out.min() >= -1 and out.max() <= 1


def test_paired_transform_identical_params():
    conf = _transform_conf(["resize", "random_crop", "random_flip"])
    transform = get_paired_image_transform(conf)
    arr = np.random.default_rng(1).integers(0, 255, (30, 40, 3), np.uint8)
    img = Image.fromarray(arr.astype(np.uint8))
    a, b = transform(img, img, rng=np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)  # same random params on both


def test_random_transforms_stripped_outside_train():
    conf = _transform_conf(["resize", "random_crop", "random_flip"], mode="val")
    transform = get_single_image_transform(conf)
    assert transform.preprocess == ["resize"]


def test_decollate():
    batch = {
        "image": np.zeros((2, 3, 4)),
        "meta": {"scl": np.array([1.0, 2.0]), "name": ["a", "b"]},
    }
    out = decollate(batch)
    assert len(out) == 2
    assert out[0]["image"].shape == (3, 4)
    assert out[1]["meta"]["scl"] == 2.0
    assert out[0]["meta"]["name"] == "a"
