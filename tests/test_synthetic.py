"""Tests for the procedural mask-paired dataset + the mask-debug CLI."""

import json
import os

import numpy as np
import pytest

from advshadow_tpu.data.synthetic import CLASSES, generate_dataset, \
    render_sample


def test_render_deterministic_and_shaped():
    for cls in CLASSES:
        a_img, a_mask = render_sample(cls, 3, 48, seed=7)
        b_img, b_mask = render_sample(cls, 3, 48, seed=7)
        assert a_img.shape == (48, 48, 3) and a_img.dtype == np.uint8
        assert a_mask.shape == (48, 48) and set(np.unique(a_mask)) <= {0, 255}
        np.testing.assert_array_equal(a_img, b_img)
        np.testing.assert_array_equal(a_mask, b_mask)


def test_render_varies_by_index_seed_class():
    base = render_sample("disk", 0, 48, seed=0)[0]
    assert (render_sample("disk", 1, 48, seed=0)[0] != base).any()
    assert (render_sample("disk", 0, 48, seed=1)[0] != base).any()
    assert (render_sample("star", 0, 48, seed=0)[0] != base).any()


def test_mask_covers_object():
    img, mask = render_sample("square", 5, 64, seed=0)
    frac = (mask > 0).mean()
    assert 0.03 < frac < 0.6          # object present, not wall-to-wall


def test_generate_dataset_layout(tmp_path):
    paths = generate_dataset(str(tmp_path), n_per_class=2, image_size=32,
                             seed=0)
    names = sorted(os.listdir(paths["images"]))
    assert len(names) == 2 * len(CLASSES)
    for n in names:
        assert os.path.exists(os.path.join(paths["masks"], f"mask_{n}"))
    with open(paths["labels_json"]) as f:
        labels = json.load(f)
    assert set(labels.values()) == set(CLASSES)
    # byclass ImageFolder tree
    assert sorted(os.listdir(paths["byclass"])) == sorted(CLASSES)


def test_generate_dataset_split_disjoint(tmp_path):
    a = generate_dataset(str(tmp_path / "a"), 2, 32, 0, start_index=0)
    b = generate_dataset(str(tmp_path / "b"), 2, 32, 0, start_index=100)
    na = set(os.listdir(a["images"]))
    nb = set(os.listdir(b["images"]))
    assert not (na & nb)


def test_loads_into_shadow_pair_dataset(tmp_path):
    from advshadow_tpu.data import ShadowPairDataset

    paths = generate_dataset(str(tmp_path), n_per_class=2, image_size=32,
                             seed=0)
    ds = ShadowPairDataset(paths["images"], paths["masks"], 32,
                           labels_json=paths["labels_json"])
    assert len(ds) == 2 * len(CLASSES)
    img, mask, label, name = ds[0]
    assert img.shape == (32, 32, 3) and mask.shape == (32, 32)
    assert 0 <= label < len(CLASSES)
    # alphabetical class order matches the id2label convention used by
    # examples/real_training_run.py
    assert ds.classes == sorted(CLASSES)


def test_mask_debug_panel(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    from advshadow_tpu.cli.mask_debug import main as mask_debug_main

    img, _ = render_sample("cross", 2, 64, seed=0)
    src = str(tmp_path / "img.png")
    Image.fromarray(img).resize((128, 128)).save(src)
    out = mask_debug_main(["--image", src, "--resize_width", "128",
                           "--grabcut_iter", "2"])
    assert out["detections"] >= 1
    assert 0.0 < out["fg_fraction"] < 1.0
    panel = cv2.imread(out["panel"])
    assert panel is not None and panel.shape[1] >= 5 * 128
