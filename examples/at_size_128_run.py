"""Reproducible driver for the at-size (128 px) flagship run.

The paper's core experiment is the 128 px conditional shadow-diffusion
model (ref: ddim2/main2.py:118-209, 300-epoch protocol per
tools/train.py:330).  The original round-3 run was launched by an ad-hoc
(uncommitted) watchdog script and its orbax tree lived under a
.gitignored path — a host reboot erased the weights, leaving
TRAINED128_r03.json non-reproducible.  This driver re-derives the ENTIRE
recipe from the committed train.log files
(artifacts/at_size_128/diffusion_run/shadow128/train.log,
artifacts/at_size_128/victim_run/*/train.log) and, unlike the original,
ends by exporting the EMA weights as a git-sized f16 npz next to the
checkpoint metadata — so the flagship model itself is committed evidence
from now on (restore with
``advshadow_tpu.train.restore_ckpt_from_npz``).

Phases (resumable; each skips itself if its output already exists):
  data       - synthetic procedural dataset, 50/class train (idx 0..),
               64/class eval (idx 1000..), seed 0, 128 px.  The 50 is
               derived from the original run's own numbers: its steady
               39.3 s epochs at the measured 1.24 s/step train step give
               ~31 steps/epoch = ~500 images at batch 16 (a 200/class
               split reproduces 125-step, 155 s epochs — measured)
  victim     - resnet18 fine-tune, 8 epochs batch 32 lr 1e-3 seed 0
               (the shadow-synthesis victim; the committed
               victim128_strong npz [40 epochs] remains the EVAL victim)
  diffusion  - conditional shadow-diffusion train to 300 epochs,
               batch 16, targeted IGA synthesis (exact args from the
               committed train.log); subprocess watchdog restarts with
               --resume on relay wedges
  export     - EMA -> artifacts/at_size_128/ema_params_f16.npz (+
               metadata.json) for commit

Usage: python examples/at_size_128_run.py [phase ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ART = os.path.join(REPO, "artifacts", "at_size_128")
DATA = os.environ.get("ADVSHADOW_128_DATA", "/tmp/advshadow_128")
RESULTS = os.path.join(ART, "diffusion_run")
CKPT = os.path.join(RESULTS, "shadow128", "ckpt_last")
SIZE, N_TRAIN_PER_CLS, N_EVAL_PER_CLS, EPOCHS = 128, 50, 64, 300


def log(msg):
    print(f"[at128] {msg}", file=sys.stderr, flush=True)


def phase_data():
    from advshadow_tpu.data.synthetic import generate_dataset

    train_root = os.path.join(DATA, "train")
    if not os.path.exists(os.path.join(train_root, "labels.json")):
        generate_dataset(train_root, N_TRAIN_PER_CLS, SIZE, 0, start_index=0)
    eval_root = os.path.join(DATA, "eval")
    if not os.path.exists(os.path.join(eval_root, "labels.json")):
        generate_dataset(eval_root, N_EVAL_PER_CLS, SIZE, 0,
                         start_index=1000)
    log(f"data ready under {DATA}")


def _victim_npz():
    return os.path.join(ART, "victim_run", "victim128",
                        "victim_resnet18.npz")


def phase_victim():
    if os.path.exists(_victim_npz()):
        log("victim128 npz exists, skipping")
        return
    from advshadow_tpu.cli.train_victim import main as train_victim_main

    out = train_victim_main([
        "--dataset_path", os.path.join(DATA, "train", "byclass"),
        "--victim", "resnet18", "--image_size", str(SIZE),
        "--batch_size", "32", "--epochs", "8", "--lr", "1e-3",
        "--seed", "0",
        "--result_path", os.path.join(ART, "victim_run"),
        "--run_name", "victim128",
    ])
    log(f"victim trained: final acc {out['train_acc'][-1]:.3f}")


def _train_argv(resume: bool):
    argv = [
        sys.executable, "-m", "advshadow_tpu.cli.train_shadow",
        "--seed", "0", "--conditional", "1", "--sample", "ddim",
        "--network", "unet", "--run_name", "shadow128",
        "--epochs", str(EPOCHS), "--batch_size", "16",
        "--image_size", str(SIZE),
        "--dataset_path", os.path.join(DATA, "train", "images"),
        "--mask_dir", os.path.join(DATA, "train", "masks"),
        "--labels_json", os.path.join(DATA, "train", "labels.json"),
        "--amp", "1", "--optim", "adamw", "--act", "gelu",
        "--loss", "mse", "--lr", "3e-4", "--lr_func", "linear",
        "--result_path", RESULTS,
        "--noise_schedule", "framework_linear", "--cfg_scale", "3",
        "--num_classes", "10", "--channels", "32,64,128,256,512,1024",
        "--ckpt_every", "10",
        "--victim", "resnet18", "--victim_ckpt", _victim_npz(),
        "--vis", "0",   # original run had vis=false; the per-epoch
        # 500-step sample at 128 px also crashes the axon relay
        "--targeted", "1", "--shadow_intensity", "0.43",
        "--shadow_iterations", "1", "--attack_epsilon", "0.05",
        "--attack_alpha", "0.005", "--attack_iterations", "20",
        "--soft_mask", "1",
    ]
    if resume:
        argv += ["--resume", "1"]
    return argv


def _trained_epochs() -> int:
    meta = os.path.join(CKPT, "metadata.json")
    if not os.path.exists(meta):
        return 0
    with open(meta) as f:
        return int(json.load(f).get("start_epoch", 0))


def _ckpt_mtime() -> float:
    meta = os.path.join(CKPT, "metadata.json")
    return os.path.getmtime(meta) if os.path.exists(meta) else 0.0


def phase_diffusion(max_attempts: int = 12, stall_seconds: int = 1200):
    """Train to EPOCHS with a watchdog: the TPU relay occasionally wedges
    mid-run (see artifacts/at_size_128/resume_log.txt from the original
    round-3 run) — sometimes by crashing the trainer, sometimes by
    HANGING it (process alive, no progress; observed at epoch 90 of the
    reproduction).  Progress is tracked via ckpt_last's metadata mtime
    (written every --ckpt_every=10 epochs ~= 6.5 min); no update for
    ``stall_seconds`` kills the child.  Each restart resumes from
    ckpt_last."""
    attempt = 0
    while _trained_epochs() < EPOCHS - 1:
        resume = os.path.exists(CKPT)
        attempt += 1
        if attempt > max_attempts:
            raise RuntimeError(
                f"diffusion phase did not reach {EPOCHS} epochs in "
                f"{max_attempts} attempts (at {_trained_epochs()})")
        log(f"train attempt {attempt} (resume={resume}, "
            f"epoch {_trained_epochs()})")
        child = subprocess.Popen(_train_argv(resume), cwd=REPO)
        last_progress = time.time()
        last_mtime = _ckpt_mtime()
        while child.poll() is None:
            time.sleep(30)
            m = _ckpt_mtime()
            if m > last_mtime:
                last_mtime, last_progress = m, time.time()
            elif time.time() - last_progress > stall_seconds:
                log(f"STALL: no checkpoint progress in {stall_seconds}s "
                    f"(epoch {_trained_epochs()}) — killing trainer")
                child.kill()
                child.wait()
                break
        log(f"trainer exited rc={child.returncode} "
            f"(epoch {_trained_epochs()})")
        time.sleep(10)
    log(f"diffusion trained to epoch {_trained_epochs()}")


def phase_export():
    from advshadow_tpu.train.checkpoint import export_params_npz, load_ckpt

    tree = load_ckpt(CKPT)
    ema = tree.get("ema_model") if tree.get("ema_model") is not None \
        else tree["model"]
    out = export_params_npz(ema, os.path.join(ART, "ema_params_f16.npz"))
    with open(os.path.join(ART, "metadata.json"), "w") as f:
        json.dump(tree.get("metadata", {}), f, indent=2)
    log(f"exported {out} ({os.path.getsize(out) / 1e6:.1f} MB) + "
        "metadata.json")


PHASES = {"data": phase_data, "victim": phase_victim,
          "diffusion": phase_diffusion, "export": phase_export}


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    names = list(argv if argv is not None else sys.argv[1:]) or list(PHASES)
    for name in names:
        log(f"=== {name} ===")
        PHASES[name]()
    print(json.dumps({"metric": "at_size_128_run", "phases": names,
                      "epochs": _trained_epochs()}))


if __name__ == "__main__":
    main()
