"""End-to-end pipeline tests: train CLI -> checkpoint -> generate CLI,
shadow-train CLI, deploy server protocol, mask extraction, misc tools."""

import json
import os
import threading

import jax
import numpy as np
import pytest
from PIL import Image

from advshadow_tpu.serve import DeployServer, send_request

TINY = ["--channels", "8,16,32,64,128,256", "--image_size", "16",
        "--batch_size", "4", "--epochs", "2"]


@pytest.fixture
def dataset(tmp_path):
    root = tmp_path / "data"
    for cls, color in (("cat", (200, 30, 30)), ("dog", (30, 200, 30))):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(4):
            Image.new("RGB", (24, 24), color).save(d / f"{cls}_{i}.png")
    return str(root)


@pytest.fixture
def shadow_dataset(tmp_path):
    img_dir = tmp_path / "imgs"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    labels = {}
    for i in range(4):
        name = f"Abyssinian_{i}.png"
        Image.new("RGB", (24, 24), (120, 90, 60)).save(img_dir / name)
        m = Image.new("L", (24, 24), 0)
        m.paste(255, (4, 4, 20, 20))
        m.save(mask_dir / f"mask_{name}")
        labels[name] = "Abyssinian"
    labels_json = tmp_path / "labels.json"
    labels_json.write_text(json.dumps(labels))
    return str(img_dir), str(mask_dir), str(labels_json)


class TestTrainGeneratePipeline:
    def test_train_then_generate(self, dataset, tmp_path):
        from advshadow_tpu.cli.generate import main as generate_main
        from advshadow_tpu.cli.train import main as train_main

        result_path = str(tmp_path / "results")
        out = train_main([
            "--dataset_path", dataset, "--result_path", result_path,
            "--run_name", "t", "--sample", "ddim", "--vis", "",
            *TINY,
        ])
        assert len(out["loss"]) == 2 and np.isfinite(out["loss"][-1])
        ckpt = os.path.join(out["results_dir"], "ckpt_last")
        assert os.path.isdir(ckpt)

        # metadata-driven generation from that checkpoint
        imgs = generate_main([
            "--weight_path", ckpt,
            "--result_path", str(tmp_path / "gen"),
            "--class_name", "0", "--num_images", "2", "--use_ema", "",
        ])
        assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8
        # metadata was honored (image size from ckpt)
        meta = json.load(open(os.path.join(ckpt, "metadata.json")))
        assert meta["image_size"] == 16 and meta["conditional"] is True

    def test_ckpt_every_gates_saves(self, dataset, tmp_path, monkeypatch):
        """--ckpt_every N saves on gated epochs + the final epoch only."""
        import advshadow_tpu.cli.train as train_cli

        saved = []
        real = train_cli.save_ckpt
        monkeypatch.setattr(
            train_cli, "save_ckpt",
            lambda d, e, **kw: (saved.append(e), real(d, e, **kw))[1])
        out = train_cli.main([
            "--dataset_path", dataset,
            "--result_path", str(tmp_path / "results"),
            "--run_name", "ce", "--vis", "",
            "--channels", "8,16,32,64,128,256", "--image_size", "16",
            "--batch_size", "4", "--epochs", "4", "--ckpt_every", "3",
        ])
        assert saved == [0, 3]  # epoch 0 (gate) + final epoch
        meta = json.load(open(os.path.join(
            out["results_dir"], "ckpt_last", "metadata.json")))
        assert meta["start_epoch"] == 3

    def test_resume(self, dataset, tmp_path):
        from advshadow_tpu.cli.train import main as train_main

        result_path = str(tmp_path / "results")
        args = ["--dataset_path", dataset, "--result_path", result_path,
                "--run_name", "r", "--vis", "", *TINY]
        train_main(args)
        out = train_main(args + ["--resume", "1", "--start_epoch", "1"])
        assert len(out["loss"]) == 1  # epochs 1..2

    def test_resume_default_skips_finished_epoch(self, dataset, tmp_path):
        """metadata start_epoch records the epoch that FINISHED; a resume
        without --start_epoch must continue at the NEXT epoch (same
        semantics as train_shadow), not re-train the completed one."""
        from advshadow_tpu.cli.train import main as train_main

        result_path = str(tmp_path / "results")
        args = ["--dataset_path", dataset, "--result_path", result_path,
                "--run_name", "rd", "--vis", "", *TINY]
        train_main(args)  # epochs 0..1; ckpt_last metadata start_epoch == 1
        done = train_main(args[:-1] + ["3", "--resume", "1"])
        assert len(done["loss"]) == 1  # exactly epoch 2
        meta = json.load(open(os.path.join(
            done["results_dir"], "ckpt_last", "metadata.json")))
        assert meta["start_epoch"] == 2

    def test_str2bool_flag_spellings(self):
        """'False'/'0'/'' disable, '1'/'true' enable (ref mirrors
        type=bool, where bool('False') is True — fixed here)."""
        from advshadow_tpu.cli.train import build_parser

        p = build_parser()
        base = ["--dataset_path", "x"]
        assert p.parse_args(base + ["--resume", "False"]).resume is False
        assert p.parse_args(base + ["--amp", "0"]).amp is False
        assert p.parse_args(base + ["--vis", ""]).vis is False
        assert p.parse_args(base + ["--resume", "1"]).resume is True
        assert p.parse_args(base + ["--amp", "true"]).amp is True
        assert p.parse_args(base).conditional is True  # defaults intact


class TestShadowTrainPipeline:
    def test_shadow_train_smoke(self, shadow_dataset, tmp_path):
        from advshadow_tpu.cli.train_shadow import main as ts_main

        img_dir, mask_dir, labels_json = shadow_dataset
        out = ts_main([
            "--dataset_path", img_dir, "--mask_dir", mask_dir,
            "--labels_json", labels_json,
            "--result_path", str(tmp_path / "res"), "--run_name", "s",
            "--vis", "", "--epochs", "1",
            "--channels", "8,16,32,64,128,256",
            "--image_size", "16", "--batch_size", "4",
            "--shadow_iterations", "1", "--attack_iterations", "2",
        ])
        assert np.isfinite(out["loss"][-1])


class TestDeployServer:
    def test_protocol_roundtrip(self):
        def fake_generate(req):
            assert req["sample"] == "ddim"
            return {"image": [{"image_id": "x", "image_name": "x.jpg"}]}

        server = DeployServer(port=0, generate_fn=fake_generate)
        server.start(background=True)
        try:
            resp = send_request("localhost", server.port,
                                {"sample": "ddim", "conditional": False})
            data = json.loads(resp)
            assert data["image"][0]["image_name"] == "x.jpg"
        finally:
            server.stop()

    def test_error_returns_500(self):
        def broken(req):
            raise RuntimeError("boom")

        server = DeployServer(port=0, generate_fn=broken)
        server.start(background=True)
        try:
            resp = send_request("localhost", server.port, {"a": 1})
            assert resp == "500"
        finally:
            server.stop()


class TestMaskExtraction:
    def test_weights_free_pipeline(self, tmp_path):
        import cv2

        from advshadow_tpu.masks import extract_and_save_masks

        src = tmp_path / "imgs"
        dst = tmp_path / "masks"
        src.mkdir()
        # object on plain background so GrabCut has something to find
        arr = np.full((60, 80, 3), 250, np.uint8)
        arr[15:45, 25:55] = (40, 90, 160)
        cv2.imwrite(str(src / "obj_1.png"), arr)
        n = extract_and_save_masks(str(src), str(dst))
        assert n == 1
        mask = cv2.imread(str(dst / "mask_obj_1.png"), cv2.IMREAD_GRAYSCALE)
        assert mask is not None and set(np.unique(mask)).issubset({0, 255})
        assert mask.sum() > 0

    def test_combine_masks_thresholds(self):
        from advshadow_tpu.masks import combine_detection_masks

        boxes = np.zeros((1, 1, 2, 7), np.float32)
        boxes[0, 0, 0, 1:3] = (0, 0.9)          # confident detection
        boxes[0, 0, 0, 3:7] = (0.0, 0.0, 0.5, 0.5)
        boxes[0, 0, 1, 1:3] = (0, 0.5)          # below 0.7 -> dropped
        boxes[0, 0, 1, 3:7] = (0.5, 0.5, 1.0, 1.0)
        masks = np.ones((2, 1, 5, 5), np.float32)
        out = combine_detection_masks((40, 40), boxes, masks)
        assert out[:20, :20].min() == 255
        assert out[25:, 25:].max() == 0


class TestDataTools:
    def test_label_json(self, tmp_path):
        from advshadow_tpu.masks import label_json_from_filenames

        (tmp_path / "Abyssinian_1.png").touch()
        Image.new("RGB", (4, 4)).save(tmp_path / "Abyssinian_1.png")
        out = label_json_from_filenames(str(tmp_path),
                                        str(tmp_path / "l.json"))
        assert out["Abyssinian_1.png"] == "Abyssinian"

    def test_subset_sampling(self, tmp_path):
        from advshadow_tpu.masks import pick_images_and_masks

        img, mask = tmp_path / "i", tmp_path / "m"
        img.mkdir()
        mask.mkdir()
        for i in range(6):
            Image.new("RGB", (4, 4)).save(img / f"a_{i}.png")
            Image.new("L", (4, 4)).save(mask / f"mask_a_{i}.png")
        chosen = pick_images_and_masks(str(img), str(mask),
                                       str(tmp_path / "oi"),
                                       str(tmp_path / "om"), n=3, seed=0)
        assert len(chosen) == 3
        assert len(os.listdir(tmp_path / "oi")) == 3
        assert len(os.listdir(tmp_path / "om")) == 3

    def test_resize_folder(self, tmp_path):
        from advshadow_tpu.masks import resize_images_in_folder

        Image.new("RGB", (50, 30)).save(tmp_path / "x.png")
        n = resize_images_in_folder(str(tmp_path), str(tmp_path / "out"), 16)
        assert n == 1
        with Image.open(tmp_path / "out" / "x.png") as im:
            assert im.size == (16, 16)


class TestSRPipeline:
    def test_sr_train_smoke(self, dataset, tmp_path):
        from advshadow_tpu.cli.train_sr import main as sr_main

        out = sr_main([
            "--dataset_path", dataset, "--result_path", str(tmp_path / "sr"),
            "--epochs", "2", "--batch_size", "4", "--image_size", "16",
            "--scale", "4", "--n_blocks", "1", "--channels", "8",
        ])
        assert len(out["loss"]) == 2
        assert out["loss"][1] < out["loss"][0]  # MSE drops on flat images

    def test_sr_dataset_shapes(self, dataset):
        from advshadow_tpu.data import SRDataset

        ds = SRDataset(16, dataset, scale=4)
        lr, hr = ds[0]
        assert lr.shape == (4, 4, 3) and hr.shape == (16, 16, 3)
        assert 0 <= lr.min() and hr.max() <= 1


class TestNetworkKwargFiltering:
    def test_unet_ddpm_via_registry(self):
        from advshadow_tpu.models import make_network

        m = make_network("unet_ddpm", act="silu", channel=(8, 16),
                         model_channels=16, num_classes=5)
        assert m.model_channels == 16 and m.num_classes == 5


class TestNativeGrabCut:
    """The framework's own C++ GrabCut (GMM + Dinic max-flow)."""

    def _fixture(self):
        rng = np.random.default_rng(0)
        h, w = 60, 80
        img = np.full((h, w, 3), 245, np.uint8)
        img[15:45, 25:55] = (160, 90, 40)
        img = (img.astype(np.int16)
               + rng.integers(-8, 8, img.shape)).clip(0, 255).astype(np.uint8)
        gt = np.zeros((h, w), bool)
        gt[15:45, 25:55] = True
        init = np.zeros((h, w), np.uint8)
        init[10:50, 20:60] = 255  # loose probable-foreground box
        return img, init, gt

    def test_native_refine_recovers_object(self):
        from advshadow_tpu.masks.extract import grabcut_refine
        from advshadow_tpu.masks.native import native_available

        if not native_available():
            pytest.skip("g++ build unavailable")
        img, init, gt = self._fixture()
        out = grabcut_refine(img, init, iterations=5, backend="native") > 0
        iou = (out & gt).sum() / (out | gt).sum()
        assert iou > 0.95

    def test_native_agrees_with_cv2(self):
        import cv2

        from advshadow_tpu.masks.extract import grabcut_refine
        from advshadow_tpu.masks.native import native_available

        if not native_available():
            pytest.skip("g++ build unavailable")
        img, init, gt = self._fixture()
        ours = grabcut_refine(img, init, iterations=5, backend="native") > 0
        cv = grabcut_refine(img, init, iterations=5, backend="cv2") > 0
        agreement = (ours == cv).mean()
        assert agreement > 0.95

    def test_hard_labels_respected(self):
        from advshadow_tpu.masks.native import (GC_BGD, GC_FGD, GC_PR_BGD,
                                                native_available,
                                                native_grabcut)

        if not native_available():
            pytest.skip("g++ build unavailable")
        img, _, _ = self._fixture()
        mask = np.full(img.shape[:2], GC_PR_BGD, np.uint8)
        mask[0, 0] = GC_BGD
        mask[30, 40] = GC_FGD
        out = native_grabcut(img, mask, iter_count=2)
        assert out[0, 0] == GC_BGD and out[30, 40] == GC_FGD


class TestAttackCLI:
    def test_shadow_attack_folder(self, shadow_dataset, tmp_path):
        from advshadow_tpu.cli.attack import main as attack_main

        img_dir, mask_dir, labels_json = shadow_dataset
        out = attack_main([
            "--method", "shadow", "--dataset_path", img_dir,
            "--mask_dir", mask_dir, "--labels_json", labels_json,
            "--output_path", str(tmp_path / "atk"),
            "--image_size", "16", "--batch_size", "4",
            "--preset", "train",
        ])
        assert out["count"] == 4
        files = os.listdir(tmp_path / "atk")
        assert len(files) == 4
        assert all(f.startswith("Abyssinian_") for f in files)

    def test_baseline_attacks(self, shadow_dataset, tmp_path):
        from advshadow_tpu.cli.attack import main as attack_main

        img_dir, _, _ = shadow_dataset
        for method in ("fgsm", "bim", "pgd"):
            out = attack_main([
                "--method", method, "--dataset_path", img_dir,
                "--output_path", str(tmp_path / method),
                "--image_size", "16", "--batch_size", "4",
                "--num_iterations", "2",
            ])
            assert out["count"] == 4


class TestClassifyCLI:
    def test_folder_predictions_and_gradcam(self, shadow_dataset, tmp_path):
        from advshadow_tpu.cli.classify import main as classify_main

        img_dir, _, _ = shadow_dataset
        res = classify_main([
            "--path", img_dir, "--image_size", "32",
            "--gradcam", "1", "--output_path", str(tmp_path),
        ])
        assert len(res) == 4
        first = next(iter(res.values()))
        assert "label" in first and 0 <= first["confidence"] <= 1
        cams = [f for f in os.listdir(tmp_path) if f.endswith("_gradcam.png")]
        assert len(cams) == 4


class TestUnconditionalPipeline:
    def test_unconditional_ddpm_family(self, dataset, tmp_path):
        """The diff_model.py:487-575 pretraining path: unconditional
        UNetModel + cosine schedule + DDPM sampling via the same CLI."""
        from advshadow_tpu.cli.train import main as train_main

        out = train_main([
            "--dataset_path", dataset, "--result_path", str(tmp_path / "u"),
            "--run_name", "uncond", "--conditional", "",
            "--network", "unet_ddpm", "--noise_schedule", "cosine",
            "--sample", "ddim", "--vis", "", "--model_channels", "32",
            "--image_size", "16", "--batch_size", "4", "--epochs", "1",
        ])
        assert np.isfinite(out["loss"][-1])


class TestDetectorPrimitives:
    def test_box_iou(self):
        import jax.numpy as jnp

        from advshadow_tpu.masks.detector import box_iou

        a = jnp.asarray([[0, 0, 10, 10.0]])
        b = jnp.asarray([[5, 5, 15, 15.0], [0, 0, 10, 10.0],
                         [20, 20, 30, 30.0]])
        iou = np.asarray(box_iou(a, b))[0]
        assert iou[0] == pytest.approx(25 / 175)
        assert iou[1] == pytest.approx(1.0)
        assert iou[2] == 0.0

    def test_nms_suppresses_overlaps(self):
        import jax.numpy as jnp

        from advshadow_tpu.masks.detector import nms

        boxes = jnp.asarray([[0, 0, 10, 10.0], [1, 1, 11, 11.0],
                             [20, 20, 30, 30.0]])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        idx, valid = nms(boxes, scores, max_outputs=3, iou_threshold=0.5)
        kept = [int(i) for i, v in zip(idx, valid) if bool(v)]
        assert kept == [0, 2]  # box 1 suppressed by box 0

    def test_roi_align_constant_region(self):
        import jax.numpy as jnp

        from advshadow_tpu.masks.detector import roi_align

        feat = jnp.zeros((16, 16, 1)).at[4:12, 4:12, :].set(3.0)
        out = roi_align(feat, jnp.asarray([[4.0, 4, 12, 12]]),
                        output_size=4)
        # interior bins of a constant region must equal the constant
        assert np.asarray(out)[0, 1:3, 1:3, 0] == pytest.approx(3.0, abs=1e-5)

    def test_anchors_and_decode(self):
        import jax.numpy as jnp

        from advshadow_tpu.masks.detector import decode_boxes, \
            generate_anchors

        anchors = generate_anchors((2, 2), stride=8, scales=(16,),
                                   ratios=(1.0,))
        assert anchors.shape == (4, 4)
        # first anchor centered at (4, 4) with 16x16 extent
        np.testing.assert_allclose(anchors[0], [-4, -4, 12, 12], atol=1e-5)
        # zero deltas decode to the anchors themselves
        dec = decode_boxes(anchors, jnp.zeros((4, 4)))
        np.testing.assert_allclose(dec, anchors, atol=1e-4)


class TestFullStory:
    """The complete paper workflow chained end to end on tiny data:
    shadow-diffusion training -> conditional generation -> shadow attack
    on a folder -> ASR + PSNR/SSIM + FID over the attacked outputs."""

    def test_workflow(self, shadow_dataset, tmp_path):
        import jax.numpy as jnp

        from advshadow_tpu.cli.attack import main as attack_main
        from advshadow_tpu.cli.evaluate import main as eval_main
        from advshadow_tpu.cli.generate import main as generate_main
        from advshadow_tpu.cli.train_shadow import main as ts_main

        img_dir, mask_dir, labels_json = shadow_dataset

        # 1. train the shadow-diffusion model
        out = ts_main([
            "--dataset_path", img_dir, "--mask_dir", mask_dir,
            "--labels_json", labels_json,
            "--result_path", str(tmp_path / "run"), "--run_name", "story",
            "--vis", "", "--epochs", "1",
            "--channels", "8,16,32,64,128,256",
            "--image_size", "16", "--batch_size", "4",
            "--shadow_iterations", "1", "--attack_iterations", "2",
            "--sample", "ddim",
        ])
        assert np.isfinite(out["loss"][-1])
        ckpt = os.path.join(out["results_dir"], "ckpt_last")

        # 2. generate conditionally from the trained checkpoint
        imgs = generate_main([
            "--weight_path", ckpt, "--result_path", str(tmp_path / "gen"),
            "--class_name", "0", "--num_images", "2",
        ])
        assert imgs.shape == (2, 16, 16, 3)

        # 3. attack the original folder
        atk = attack_main([
            "--method", "shadow", "--dataset_path", img_dir,
            "--mask_dir", mask_dir, "--labels_json", labels_json,
            "--output_path", str(tmp_path / "atk"),
            "--image_size", "16", "--batch_size", "4", "--preset", "train",
        ])
        assert atk["count"] == 4

        # 4. evaluate: ASR on the attacked folder, PSNR/SSIM originals vs
        # attacked, FID originals vs attacked
        asr = eval_main(["asr", "--folder", str(tmp_path / "atk"),
                         "--image_size", "16"])
        assert asr["n"] == 4 and 0.0 <= asr["asr"] <= 1.0

        ps = eval_main(["psnr-ssim", "--folder1", img_dir,
                        "--folder2", str(tmp_path / "atk"),
                        "--image_size", "16"])
        assert 0.0 < ps["mean_ssim"] <= 1.0 and ps["mean_psnr"] > 5.0

        fid = eval_main(["fid", "--folder1", img_dir,
                         "--folder2", str(tmp_path / "atk"),
                         "--image_size", "32"])
        assert np.isfinite(fid["fid"]) and fid["fid"] >= -1.0


class TestDeployGeneratePath:
    def test_serve_from_trained_checkpoint(self, dataset, tmp_path):
        """End-to-end serve: train a tiny model, then answer a live socket
        request through default_generate_fn (ckpt-metadata-driven)."""
        import time

        from advshadow_tpu.cli.train import main as train_main

        out = train_main([
            "--dataset_path", dataset, "--result_path", str(tmp_path / "r"),
            "--run_name", "srv", "--sample", "ddim", "--vis", "",
            "--epochs", "1", *TINY[:-2],
        ])
        ckpt = os.path.join(out["results_dir"], "ckpt_last")

        server = DeployServer(port=0)
        server.start(background=True)
        try:
            time.sleep(0.2)
            resp = send_request("localhost", server.port, {
                "sample": "ddim", "num_images": 1, "weight_path": ckpt,
                "sample_steps": 5, "sample_method": "logsnr",
                "result_path": str(tmp_path / "served"), "class_name": 1,
                "use_ema": True,
            })
            data = json.loads(resp)
            name = data["image"][0]["image_name"]
            assert os.path.exists(tmp_path / "served" / name)

            # the fast-sampler request path (sample_steps honored),
            # with the round-3 guidance fixes on the SDE variant
            resp = send_request("localhost", server.port, {
                "sample": "dpmpp_sde", "sample_steps": 5, "num_images": 1,
                "weight_path": ckpt, "cfg_rescale": 0.7,
                "cfg_interval": [50, 900], "sample_method": "logsnr",
                "dtype": "bf16",
                "result_path": str(tmp_path / "served2"), "class_name": 1,
                "use_ema": True,
            })
            data = json.loads(resp)
            name = data["image"][0]["image_name"]
            assert os.path.exists(tmp_path / "served2" / name)
        finally:
            server.stop()


class TestVictimTraining:
    def test_finetune_learns_colors(self, dataset, tmp_path):
        """Fine-tune a tiny victim on the 2-color dataset; training
        accuracy must reach 1.0 and the saved npz ckpt must load back
        through the shared victim loader path."""
        from advshadow_tpu.cli.train_victim import main as tv_main
        from advshadow_tpu.victims import load_variables

        out = tv_main([
            "--dataset_path", dataset, "--victim", "resnet18",
            "--image_size", "32", "--batch_size", "4", "--epochs", "12",
            "--lr", "1e-3", "--result_path", str(tmp_path / "v"),
        ])
        assert out["train_acc"][-1] >= 0.75
        assert out["train_acc"][-1] >= out["train_acc"][0]
        assert out["ckpt"].endswith(".npz")
        variables = load_variables(out["ckpt"])
        assert "params" in variables and "batch_stats" in variables


class TestBenchmarkSuite:
    def test_suite_smoke_configs(self, monkeypatch):
        """The BASELINE.md benchmark suite must not rot: run the two
        host-cheap configs in BENCH_SMALL mode."""
        monkeypatch.setenv("BENCH_SMALL", "1")
        import runpy

        mod = runpy.run_path("benchmarks/suite.py")
        out = mod["main"](["mask-pipeline", "sweep"])
        assert out["mask-pipeline"]["unit"] == "imgs/sec"
        assert out["mask-pipeline"]["value"] > 0
        rows = out["sweep"]["rows"]
        assert set(rows) == {"eval", "diff2", "train"}
        for r in rows.values():
            assert 0 <= r["asr"] <= 1 and 0 < r["ssim"] <= 1

    def test_suite_smoke_flagship_fast(self, monkeypatch):
        """The beyond-reference few-step flagship config (dpmpp-SDE-20 +
        dynamic threshold, the TRAINED128_r04 generation_grid winner)
        must keep running end-to-end in small mode."""
        monkeypatch.setenv("BENCH_SMALL", "1")
        import runpy

        mod = runpy.run_path("benchmarks/suite.py")
        out = mod["main"](["flagship-128-fast"])["flagship-128-fast"]
        assert out["unit"] == "imgs/sec/chip" and out["value"] > 0
        assert out["sampler"]["sample"] == "dpmpp_sde"
        assert out["sampler"]["dynamic_threshold"] == 0.995


class TestFIDInceptionPath:
    def test_fid_cli_with_inception_features(self, shadow_dataset, tmp_path):
        """The reference's FID protocol uses InceptionV3 pool features
        (ref fid_fast.py:11-13); the CLI must drive that extractor."""
        from advshadow_tpu.cli.evaluate import main as eval_main

        img_dir, _, _ = shadow_dataset
        out = eval_main([
            "fid", "--folder1", img_dir, "--folder2", img_dir,
            "--feature_victim", "inception_v3", "--image_size", "128",
        ])
        assert np.isfinite(out["fid"]) and out["fid"] >= 0


class TestPLMSGeneration:
    def test_generate_plms_from_ckpt(self, dataset, tmp_path):
        from advshadow_tpu.cli.generate import main as generate_main
        from advshadow_tpu.cli.train import main as train_main

        out = train_main([
            "--dataset_path", dataset, "--result_path", str(tmp_path / "r"),
            "--run_name", "p", "--sample", "plms", "--vis", "",
            "--epochs", "1", *TINY[:-2],
        ])
        imgs = generate_main([
            "--weight_path", os.path.join(out["results_dir"], "ckpt_last"),
            "--result_path", str(tmp_path / "g"), "--class_name", "0",
            "--num_images", "2", "--sample_steps", "20",
        ])
        assert imgs.shape == (2, 16, 16, 3)


class TestVisSampling:
    def test_train_vis_writes_grids(self, dataset, tmp_path):
        """--vis with --amp: the per-epoch grids sample through a bf16
        copy of the net, sub-batched at large sizes (the f32 CFG-2N
        full-res sample crashed the axon relay at 128 px)."""
        import glob

        from advshadow_tpu.cli.train import main as train_main

        result_path = str(tmp_path / "results")
        out = train_main([
            "--dataset_path", dataset, "--result_path", result_path,
            "--run_name", "v", "--sample", "ddim", "--vis", "1",
            "--amp", "1", "--vis_sample_steps", "4",
            "--channels", "8,16,32,64,128,256", "--image_size", "16",
            "--batch_size", "4", "--epochs", "1",
        ])
        assert np.isfinite(out["loss"][-1])
        grids = glob.glob(os.path.join(out["results_dir"], "vis", "*.png"))
        # raw + EMA grid per epoch (ref: tools/train.py:240-258)
        assert len(grids) == 2, grids

    def test_shadow_train_vis_writes_grid(self, shadow_dataset, tmp_path):
        import glob

        from advshadow_tpu.cli.train_shadow import main as shadow_main

        img_dir, mask_dir, labels_json = shadow_dataset
        out = shadow_main([
            "--dataset_path", img_dir, "--mask_dir", mask_dir,
            "--labels_json", labels_json,
            "--result_path", str(tmp_path / "sresults"),
            "--run_name", "sv", "--sample", "ddim", "--vis", "1",
            "--amp", "1", "--vis_sample_steps", "4",
            "--victim", "resnet18",
            "--shadow_iterations", "1", "--attack_iterations", "2",
            "--channels", "8,16,32,64,128,256", "--image_size", "16",
            "--batch_size", "4", "--epochs", "1",
        ])
        assert np.isfinite(out["loss"][-1])
        grids = glob.glob(os.path.join(out["results_dir"], "vis", "*.png"))
        assert len(grids) == 1, grids
