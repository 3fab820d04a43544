"""Data pipeline tests on synthetic image fixtures."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from advshadow_tpu.data import (
    BatchLoader,
    ImageFolderDataset,
    RandomResizedCrop,
    ShadowPairDataset,
    list_image_folder,
)


def _write_img(path, color, size=(48, 40)):
    Image.new("RGB", size, color).save(path)


@pytest.fixture
def image_folder(tmp_path):
    for cls, color in (("cat", (255, 0, 0)), ("dog", (0, 255, 0))):
        d = tmp_path / cls
        d.mkdir()
        for i in range(4):
            _write_img(d / f"{cls}_{i}.png", color)
    return str(tmp_path)


@pytest.fixture
def shadow_folder(tmp_path):
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    labels = {}
    for i in range(5):
        name = f"Abyssinian_{i}.png"
        _write_img(img_dir / name, (i * 40, 100, 50))
        Image.new("L", (48, 40), 255).save(mask_dir / f"mask_{name}")
        labels[name] = "Abyssinian"
    # one image without mask -> must be dropped
    _write_img(img_dir / "Bengal_0.png", (1, 2, 3))
    labels["Bengal_0.png"] = "Bengal"
    with open(tmp_path / "labels.json", "w") as f:
        json.dump(labels, f)
    return str(img_dir), str(mask_dir), str(tmp_path / "labels.json")


class TestImageFolder:
    def test_listing(self, image_folder):
        paths, labels, classes = list_image_folder(image_folder)
        assert classes == ["cat", "dog"]
        assert len(paths) == 8 and labels[:4] == [0] * 4

    def test_dataset_output(self, image_folder):
        ds = ImageFolderDataset(image_folder, image_size=16)
        x, y = ds[0]
        assert x.shape == (16, 16, 3) and x.dtype == np.float32
        assert -1.0 <= x.min() and x.max() <= 1.0
        # the red 'cat' class maps to ~(+1, -1, -1) in [-1,1]
        assert x[..., 0].mean() > 0.9 and x[..., 1].mean() < -0.9
        assert y == 0


class TestRandomResizedCrop:
    def test_params_within_bounds(self):
        rrc = RandomResizedCrop(16, scale=(0.8, 1.0))
        rng = np.random.default_rng(0)
        for _ in range(50):
            i, j, ch, cw = rrc.sample_params(40, 30, rng)
            assert 0 <= i <= 30 - ch and 0 <= j <= 40 - cw
            assert 0.5 < (ch * cw) / (40 * 30) <= 1.0


class TestShadowPairs:
    def test_pairing_and_labels(self, shadow_folder):
        img_dir, mask_dir, labels_json = shadow_folder
        ds = ShadowPairDataset(img_dir, mask_dir, image_size=16,
                               labels_json=labels_json)
        # Bengal_0 has no mask file -> dropped
        assert len(ds) == 5
        x, m, y, name = ds[0]
        assert x.shape == (16, 16, 3) and m.shape == (16, 16)
        assert set(np.unique(m)).issubset({0.0, 1.0})
        assert name.startswith("Abyssinian") and y == 0

    def test_aligned_crops(self, shadow_folder):
        """Image and mask must share crop params (fixing the reference's
        independently-random transforms)."""
        img_dir, mask_dir, _ = shadow_folder
        ds = ShadowPairDataset(img_dir, mask_dir, image_size=16)
        _, m, _, _ = ds[0]
        # full-white mask stays full-white under any aligned crop
        np.testing.assert_allclose(m, 1.0)


class TestBatchLoader:
    def test_batching_and_shapes(self, image_folder):
        ds = ImageFolderDataset(image_folder, image_size=16)
        loader = BatchLoader(ds, batch_size=4, seed=1)
        batches = list(loader)
        assert len(batches) == 2
        x, y = batches[0]
        assert x.shape == (4, 16, 16, 3) and y.shape == (4,)

    def test_host_sharding_disjoint(self, image_folder):
        ds = ImageFolderDataset(image_folder, image_size=16)
        seen = []
        for host in range(2):
            loader = BatchLoader(ds, batch_size=2, seed=7, num_hosts=2,
                                 host_id=host, shuffle=True)
            idx = loader._indices()
            seen.append(set(int(i) for i in idx))
        assert seen[0].isdisjoint(seen[1])
        assert len(seen[0] | seen[1]) == 8

    def test_host_sharding_covers_uneven_dataset(self):
        """DistributedSampler semantics: when len(dataset) % num_hosts
        != 0 the permutation is wrap-padded, so EVERY sample appears on
        some host each epoch (no silent drops)."""

        class Sized:
            def __len__(self):
                return 101

        union = set()
        counts = []
        for host in range(2):
            loader = BatchLoader(Sized(), batch_size=4, seed=5,
                                 num_hosts=2, host_id=host, shuffle=True)
            idx = loader._indices()
            counts.append(len(idx))
            union |= set(int(i) for i in idx)
        assert union == set(range(101))       # full coverage
        assert counts == [51, 51]             # padded to equal shards
        assert len(loader) == 51 // 4         # drop_last __len__ sees the pad

    def test_epoch_reshuffles(self, image_folder):
        ds = ImageFolderDataset(image_folder, image_size=16)
        loader = BatchLoader(ds, batch_size=8, seed=3)
        i1 = loader._indices().tolist()
        loader.epoch += 1
        i2 = loader._indices().tolist()
        assert i1 != i2 and sorted(i1) == sorted(i2)


class TestTrainValSplit:
    def test_disjoint_reproducible(self, image_folder):
        tr = ImageFolderDataset(image_folder, 16, seed=5, split="train")
        va = ImageFolderDataset(image_folder, 16, seed=5, split="val")
        assert len(tr) == 6 and len(va) == 2  # 80/20 of 8
        assert set(tr.paths).isdisjoint(va.paths)
        tr2 = ImageFolderDataset(image_folder, 16, seed=5, split="train")
        assert tr.paths == tr2.paths


class TestLoaderErrorPropagation:
    def test_worker_exception_raises_not_hangs(self):
        class Broken:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i == 2:
                    raise OSError("corrupt image")
                return np.zeros((4, 4, 3), np.float32), 0

        loader = BatchLoader(Broken(), batch_size=2, shuffle=False)
        with pytest.raises(OSError, match="corrupt image"):
            list(loader)
