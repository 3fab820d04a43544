"""End-to-end AdvShadow pipeline on a toy dataset — runnable example.

Walks the complete paper workflow with tiny settings so it finishes in a
few minutes on one chip (or CPU):

  1. make a toy image+mask dataset
  2. fine-tune a victim classifier on it
  3. train the shadow-diffusion model (attack-synthesized batches)
  4. generate conditional samples from the checkpoint
  5. attack the dataset folder with the EVAL-preset shadow attack
  6. evaluate ASR / PSNR-SSIM / FID on the attacked outputs

For the real Oxford-IIIT Pet experiment, swap the toy dataset for the
pet images, extract masks with ``cli.mask_dataset``, and raise the
sizes/epochs to the reference's configs (SURVEY.md §6).
"""

import json
import os
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advshadow_tpu.cli.attack import main as attack_main
from advshadow_tpu.cli.evaluate import main as evaluate_main
from advshadow_tpu.cli.generate import main as generate_main
from advshadow_tpu.cli.train_shadow import main as train_shadow_main
from advshadow_tpu.cli.train_victim import main as train_victim_main


def make_toy_dataset(root: str, n_per_class: int = 8, size: int = 32):
    """Two-class colored-square dataset with masks + label json."""
    rng = np.random.default_rng(0)
    flat = os.path.join(root, "images")
    masks = os.path.join(root, "masks")
    byclass = os.path.join(root, "byclass")
    os.makedirs(flat), os.makedirs(masks)
    labels = {}
    for cls, color in (("Abyssinian", (200, 60, 40)),
                       ("Bengal", (40, 80, 200))):
        os.makedirs(os.path.join(byclass, cls))
        for i in range(n_per_class):
            arr = np.full((size, size, 3), 235, np.uint8)
            jitter = rng.integers(-20, 20, 3)
            arr[size // 4: 3 * size // 4, size // 4: 3 * size // 4] = \
                np.clip(np.array(color) + jitter, 0, 255)
            name = f"{cls}_{i}.png"
            Image.fromarray(arr).save(os.path.join(flat, name))
            Image.fromarray(arr).save(os.path.join(byclass, cls, name))
            m = np.zeros((size, size), np.uint8)
            m[size // 4: 3 * size // 4, size // 4: 3 * size // 4] = 255
            Image.fromarray(m).save(os.path.join(masks, f"mask_{name}"))
            labels[name] = cls
    with open(os.path.join(root, "labels.json"), "w") as f:
        json.dump(labels, f)
    return flat, masks, os.path.join(root, "labels.json"), byclass


def main():
    root = tempfile.mkdtemp(prefix="advshadow_example_")
    print(f"working dir: {root}")
    flat, masks, labels_json, byclass = make_toy_dataset(root)

    print("\n=== 1. fine-tune a victim ===")
    victim = train_victim_main([
        "--dataset_path", byclass, "--victim", "resnet18",
        "--image_size", "32", "--batch_size", "4", "--epochs", "10",
        "--lr", "1e-3", "--result_path", f"{root}/victim_run",
    ])
    print(f"victim ckpt: {victim['ckpt']}")

    print("\n=== 2. train the shadow-diffusion model ===")
    run = train_shadow_main([
        "--dataset_path", flat, "--mask_dir", masks,
        "--labels_json", labels_json,
        "--victim", "resnet18", "--victim_ckpt", victim["ckpt"],
        "--num_classes", "2",
        "--result_path", f"{root}/diffusion_run", "--run_name", "toy",
        "--channels", "8,16,32,64,128,256", "--image_size", "16",
        "--batch_size", "4", "--epochs", "2", "--sample", "ddim",
        "--vis", "", "--shadow_iterations", "1", "--attack_iterations", "4",
    ])
    ckpt = os.path.join(run["results_dir"], "ckpt_last")

    print("\n=== 3. generate conditional samples ===")
    imgs = generate_main([
        "--weight_path", ckpt, "--result_path", f"{root}/generated",
        "--class_name", "-1",
    ])
    print(f"generated: {imgs.shape}")

    print("\n=== 4. shadow-attack the dataset ===")
    atk = attack_main([
        "--method", "shadow", "--dataset_path", flat, "--mask_dir", masks,
        "--labels_json", labels_json, "--output_path", f"{root}/attacked",
        "--victim", "resnet18", "--victim_ckpt", victim["ckpt"],
        "--num_classes", "2", "--image_size", "32", "--batch_size", "8",
        "--preset", "eval",
    ])
    print(f"attacked {atk['count']} images "
          f"({atk['imgs_per_sec']:.2f} imgs/s)")

    print("\n=== 5. evaluate ===")
    # NOTE: toy class names happen to be real pet classes, so the default
    # Oxford-Pet label map resolves them; ASR against the 2-class victim
    # needs the small map:
    id2label = {"id2label": {"0": "Abyssinian", "1": "Bengal"}}
    with open(f"{root}/toy_labels.json", "w") as f:
        json.dump(id2label, f)
    asr = evaluate_main([
        "asr", "--folder", f"{root}/attacked", "--victim", "resnet18",
        "--victim_ckpt", victim["ckpt"], "--num_classes", "2",
        "--label_json", f"{root}/toy_labels.json", "--image_size", "32",
    ])
    ps = evaluate_main([
        "psnr-ssim", "--folder1", flat, "--folder2", f"{root}/attacked",
        "--image_size", "32",
    ])
    fid = evaluate_main([
        "fid", "--folder1", flat, "--folder2", f"{root}/attacked",
        "--image_size", "32",
    ])
    print(f"\nASR={asr['asr']:.3f}  SSIM={ps['mean_ssim']:.4f}  "
          f"PSNR={ps['mean_psnr']:.2f}dB  FID={fid['fid']:.3f}")


if __name__ == "__main__":
    main()
