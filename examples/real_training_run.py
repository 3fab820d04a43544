"""Real (non-toy) AdvShadow training run on the TPU — evidence producer.

Closes the loop the benchmarks could not: every quality number in
`SUITE_r02.json`'s sweep ran against a randomly-initialized victim and an
untrained UNet.  This script trains the actual pipeline end-to-end on
one chip and preserves the artifacts:

  1. ``data``      — deterministic procedural mask-paired dataset
                     (10 classes; see advshadow_tpu/data/synthetic.py —
                     the host has zero egress, so no real photos exist)
  2. ``victim``    — fine-tune a resnet18 victim at 64 px to high val
                     accuracy (cli.train_victim)
  3. ``diffusion`` — train the flagship conditional shadow-diffusion
                     UNet (ref config ddim2/main2.py:118-135 at 64 px):
                     every batch is adversarially shadowed against the
                     trained victim, then the diffusion model trains on
                     it (cli.train_shadow)
  4. ``eval``      — attack a held-out split with the trained victim,
                     generate conditional samples from the checkpoint,
                     and measure ASR / clean accuracy / PSNR / SSIM /
                     FID with TRAINED weights -> TRAINED_r02.json

Artifacts land in ``artifacts/real_run/``: loss curves (json+png),
victim accuracy history, per-class sample grids, the EMA checkpoint
(f16 npz + metadata), and the metrics JSON.

Usage:  python examples/real_training_run.py --phase all
        python examples/real_training_run.py --phase diffusion --epochs 100
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts", "real_run")

# flagship conditional-UNet channel config (ref: ddim2/main2.py:118-135,
# model/networks/unet.py defaults), run at 64 px
FLAGSHIP_CHANNELS = "32,64,128,256,512,1024"


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--phase", default="all",
                   choices=["data", "victim", "diffusion", "eval", "all"])
    p.add_argument("--data_root", default="/tmp/advshadow_realdata")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--n_train_per_class", type=int, default=200)
    p.add_argument("--n_eval_per_class", type=int, default=64,
                   help="64/class = 640 eval images > 512 feature dims, so "
                        "FID leaves the rank-deficient clamp regime")
    p.add_argument("--victim_epochs", type=int, default=12)
    p.add_argument("--epochs", type=int, default=100,
                   help="diffusion epochs (31 steps/epoch at batch 64)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--channels", default=FLAGSHIP_CHANNELS)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="tiny sizes for CI (CPU-safe)")
    return p


def phase_data(args) -> dict:
    from advshadow_tpu.data.synthetic import CLASSES, generate_dataset

    t0 = time.time()
    train = generate_dataset(
        os.path.join(args.data_root, "train"), args.n_train_per_class,
        args.image_size, args.seed, start_index=0)
    evals = generate_dataset(
        os.path.join(args.data_root, "eval"), args.n_eval_per_class,
        args.image_size, args.seed, start_index=1000)
    id2label = {str(i): c for i, c in enumerate(sorted(CLASSES))}
    id2label_path = os.path.join(args.data_root, "id2label.json")
    with open(id2label_path, "w") as f:
        json.dump({"id2label": id2label}, f)
    print(f"[data] {10 * (args.n_train_per_class + args.n_eval_per_class)} "
          f"images in {time.time() - t0:.1f}s")
    return {"train": train, "eval": evals, "id2label": id2label_path}


def phase_victim(args) -> dict:
    from advshadow_tpu.cli.train_victim import main as train_victim_main

    out = train_victim_main([
        "--dataset_path", os.path.join(args.data_root, "train", "byclass"),
        "--victim", "resnet18",
        "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--epochs", str(args.victim_epochs),
        "--lr", "1e-3", "--seed", str(args.seed),
        "--result_path", os.path.join(ART, "victim_run"),
        "--run_name", "victim64",
    ])
    with open(os.path.join(ART, "victim_history.json"), "w") as f:
        json.dump(out["train_acc"], f)
    print(f"[victim] final train acc {out['train_acc'][-1]:.3f} "
          f"-> {out['ckpt']}")
    return out


def _victim_ckpt() -> str:
    return os.path.join(ART, "victim_run", "victim64", "victim_resnet18.npz")


def phase_diffusion(args) -> dict:
    from advshadow_tpu.cli.train_shadow import main as train_shadow_main

    train_root = os.path.join(args.data_root, "train")
    out = train_shadow_main([
        "--dataset_path", os.path.join(train_root, "images"),
        "--mask_dir", os.path.join(train_root, "masks"),
        "--labels_json", os.path.join(train_root, "labels.json"),
        "--victim", "resnet18", "--victim_ckpt", _victim_ckpt(),
        "--network", "unet", "--channels", args.channels,
        "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--epochs", str(args.epochs),
        "--num_classes", "10",
        "--sample", "ddim",
        "--lr", "3e-4", "--seed", str(args.seed),
        "--vis", "",                       # vis grids generated in eval phase
        "--result_path", os.path.join(ART, "diffusion_run"),
        "--run_name", "shadow64",
        "--amp", "1",
    ])
    losses = out["loss"]
    with open(os.path.join(ART, "diffusion_loss.json"), "w") as f:
        json.dump(losses, f)
    _plot_losses(losses)
    print(f"[diffusion] {len(losses)} epochs, final loss {losses[-1]:.5f}; "
          f"ckpt in {out['results_dir']}")
    return out


def _plot_losses(losses):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 3.2), dpi=120)
        ax.plot(np.arange(1, len(losses) + 1), losses, lw=1.5)
        ax.set_xlabel("epoch")
        ax.set_ylabel("diffusion MSE loss")
        ax.set_yscale("log")
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(ART, "diffusion_loss.png"))
        plt.close(fig)
    except Exception as e:                      # plot is best-effort
        print(f"[plot] skipped: {e}")


def _compress_ckpt(results_dir: str):
    """EMA params -> f16 npz (git-sized evidence) + metadata copy."""
    from advshadow_tpu.train.checkpoint import load_ckpt

    tree = load_ckpt(os.path.join(results_dir, "ckpt_last"))
    ema = tree.get("ema_model") if tree.get("ema_model") is not None \
        else tree["model"]
    flat = {}

    def walk(sub, prefix=""):
        for k, v in sub.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v).astype(np.float16)

    walk(ema)
    np.savez_compressed(os.path.join(ART, "ema_params_f16.npz"), **flat)
    with open(os.path.join(ART, "metadata.json"), "w") as f:
        json.dump(tree.get("metadata", {}), f, indent=2)


def phase_eval(args) -> dict:
    from advshadow_tpu.cli.attack import main as attack_main
    from advshadow_tpu.cli.evaluate import main as evaluate_main
    from advshadow_tpu.cli.generate import main as generate_main

    results_dir = os.path.join(ART, "diffusion_run", "shadow64")
    eval_root = os.path.join(args.data_root, "eval")
    attacked = os.path.join(args.data_root, "attacked")
    vckpt = _victim_ckpt()
    metrics: dict = {}

    # conditional sample grid from the trained checkpoint: one row per
    # class, gen_per_class columns (samples also land as singles for FID)
    gen_root = os.path.join(args.data_root, "generated")
    # 64/class = 640 generated images > 512 feature dims so the
    # generated-vs-train FID leaves the rank-deficient clamp regime
    n_cls, per_cls = 10, (2 if args.smoke else 64)
    steps = 10 if args.smoke else 100
    rows = []
    for c in range(n_cls):
        imgs = generate_main([
            "--weight_path", os.path.join(results_dir, "ckpt_last"),
            "--result_path", os.path.join(gen_root, f"cls{c}"),
            "--generate_name", f"g{c}", "--num_images", str(per_cls),
            "--class_name", str(c), "--sample", "ddim",
            "--sample_steps", str(steps),
            "--use_ema", "1", "--seed", str(args.seed + c),
        ])
        rows.append(np.concatenate(list(np.asarray(imgs))[:10], axis=1))
    from PIL import Image

    Image.fromarray(np.concatenate(rows, axis=0)).save(
        os.path.join(ART, "sample_grid.png"))
    flat_gen = os.path.join(args.data_root, "generated_flat")
    os.makedirs(flat_gen, exist_ok=True)
    for dirpath, _, files in os.walk(gen_root):
        for fn in files:
            if fn.endswith(".png") and "_" in fn:     # singles, not grids
                shutil.copy(os.path.join(dirpath, fn),
                            os.path.join(flat_gen, fn))

    # shadow-attack the held-out split with the TRAINED victim
    out = attack_main([
        "--method", "shadow", "--preset", "eval",
        "--dataset_path", os.path.join(eval_root, "images"),
        "--mask_dir", os.path.join(eval_root, "masks"),
        "--labels_json", os.path.join(eval_root, "labels.json"),
        "--victim", "resnet18", "--victim_ckpt", vckpt,
        "--num_classes", "10",
        "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--output_path", attacked, "--seed", str(args.seed),
    ])
    metrics["attack_imgs_per_sec"] = out["imgs_per_sec"]

    id2label = os.path.join(args.data_root, "id2label.json")
    common = ["--victim", "resnet18", "--victim_ckpt", vckpt,
              "--label_json", id2label, "--num_classes", "10",
              "--image_size", str(args.image_size)]
    metrics["clean"] = evaluate_main(
        ["asr", "--folder", os.path.join(eval_root, "images")] + common)
    metrics["attacked"] = evaluate_main(
        ["asr", "--folder", attacked] + common)
    metrics["psnr_ssim"] = evaluate_main([
        "psnr-ssim", "--folder1", os.path.join(eval_root, "images"),
        "--folder2", attacked, "--image_size", str(args.image_size)])
    fid_common = ["--feature_victim", "resnet18", "--victim_ckpt", vckpt,
                  "--num_classes", "10", "--image_size",
                  str(args.image_size)]
    metrics["fid_attacked_vs_clean"] = evaluate_main(
        ["fid", "--folder1", os.path.join(eval_root, "images"),
         "--folder2", attacked] + fid_common)
    metrics["fid_generated_vs_train"] = evaluate_main(
        ["fid", "--folder1", os.path.join(args.data_root, "train", "images"),
         "--folder2", flat_gen] + fid_common)

    # class-conditioning check: victim accuracy on the generated images
    # (well above 1/num_classes chance = conditioning works; depressed
    # below clean accuracy = the model generates adversarial shadows,
    # which is the paper's objective)
    metrics["victim_accuracy_on_generated"] = _generated_accuracy(
        flat_gen, vckpt)
    # self-describing evidence (round-2 verdict Weak #5): the generation
    # config behind fid_generated_vs_train / victim_accuracy_on_generated
    metrics["generation"] = {
        "sampler": "ddim", "sample_steps": steps, "cfg_scale": 3,
        "use_ema": True, "seed": f"{args.seed} + class_index",
        "classes": n_cls, "per_class": per_cls,
        "image_size": args.image_size,
    }

    _gradcam_panel(args, eval_root, attacked, vckpt)
    _compress_ckpt(results_dir)

    with open(os.path.join(REPO, "TRAINED_r02.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))
    return metrics


def _generated_accuracy(flat_gen: str, vckpt: str) -> dict:
    """Victim accuracy on generated singles named ``g<class>_<i>.png``."""
    import re

    import jax.numpy as jnp
    from PIL import Image

    from advshadow_tpu.eval import compute_asr
    from advshadow_tpu.victims import make_victim_fn, make_victim_model

    ims, lbl = [], []
    for fn in sorted(os.listdir(flat_gen)):
        m = re.match(r"g(\d+)_\d+\.png", fn)
        if not m:
            continue
        ims.append(np.asarray(
            Image.open(os.path.join(flat_gen, fn)).convert("RGB"),
            np.float32) / 255.0)
        lbl.append(int(m.group(1)))
    from advshadow_tpu.victims import load_variables

    model = make_victim_model("resnet18", num_classes=10)
    variables = load_variables(vckpt)
    vf = make_victim_fn(model, variables)
    imgs = jnp.asarray(np.stack(ims))
    targets = jnp.asarray(lbl, jnp.int32)
    total = 0.0
    for i in range(0, len(lbl), 64):
        total += compute_asr(vf, imgs[i: i + 64], targets[i: i + 64])[
            "accuracy"] * min(64, len(lbl) - i)
    return {"accuracy": total / len(lbl), "n": len(lbl), "chance": 0.1}


def _gradcam_panel(args, eval_root, attacked, vckpt, n: int = 6):
    """clean | attacked | CAM(clean) | CAM(attacked) rows on the trained
    victim — the reference's ddim2/test.py:502-549 visualization, here as
    committed evidence that the attack moves the victim's attention."""
    import jax.numpy as jnp
    from PIL import Image

    from advshadow_tpu.eval.gradcam import grad_cam, make_resnet_cam_fn, \
        show_cam_on_image
    from advshadow_tpu.victims import make_victim_model

    from advshadow_tpu.victims import load_variables

    model = make_victim_model("resnet18", num_classes=10)
    variables = load_variables(vckpt)
    cam_fn = make_resnet_cam_fn(model, variables)

    names = sorted(os.listdir(attacked))[:: max(1, len(os.listdir(attacked))
                                                // n)][:n]
    rows = []
    for nm in names:
        clean = np.asarray(Image.open(
            os.path.join(eval_root, "images", nm)).convert("RGB"),
            np.float32) / 255.0
        adv = np.asarray(Image.open(
            os.path.join(attacked, nm)).convert("RGB"), np.float32) / 255.0
        pair = jnp.asarray(np.stack([clean, adv]))
        cams = grad_cam(cam_fn, pair)
        tiles = [clean, adv,
                 np.asarray(show_cam_on_image(pair[0], cams[0])),
                 np.asarray(show_cam_on_image(pair[1], cams[1]))]
        rows.append(np.concatenate(tiles, axis=1))
    panel = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
    Image.fromarray(panel).save(os.path.join(ART, "gradcam_panel.png"))


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")   # CI-safe (CLAUDE.md trap)
        args.n_train_per_class = 8
        args.n_eval_per_class = 4
        args.victim_epochs = 2
        args.epochs = 2
        args.batch_size = 8
        args.image_size = 32
        args.channels = "8,16,32,64,128,256"
    os.makedirs(ART, exist_ok=True)
    phases = ([args.phase] if args.phase != "all"
              else ["data", "victim", "diffusion", "eval"])
    out = {}
    for ph in phases:
        print(f"\n===== phase: {ph} =====")
        out[ph] = {"data": phase_data, "victim": phase_victim,
                   "diffusion": phase_diffusion, "eval": phase_eval}[ph](args)
    return out


if __name__ == "__main__":
    main()
