"""Diagnose the distillation conditioning plateau (round-4 verdict Weak #2).

All three stage-1 s16 students (700, 1900 updates, x0-weighted 700)
scored victim accuracy EXACTLY 0.1281 (41/320) on generated images.
Before burning another stage-1 budget, this driver answers, with
measurements, which of three worlds we are in:

  A. Evaluation artifact — the same weights were scored thrice
     (checkpoint mixup).  Ruled in/out by pairwise parameter distances
     between the committed npz trees.
  B. Init-dominated outputs — distinct weights whose generations are
     pixel-near-identical to the student INIT (the unguided teacher on
     the same grid + same seeds), so the victim's 320 argmaxes never
     change.  Ruled in/out by generating the unguided teacher on the
     students' exact grid/seeds and measuring pixel MSE + prediction
     agreement between every model pair.
  C. Genuine plateau — weights and generations move but conditioning
     does not.  The remaining world if A and B are ruled out.

Writes a ``plateau_diagnostics`` block into
artifacts/at_size_128/distill_metrics.json, including per-class
prediction histograms (does the victim collapse onto a few classes?).

Ref context for the protocol this distills: the reference's CFG
double-batch sampling (model/samples/ddpm.py:62-74).

Usage: python examples/distill_diagnose.py  (TPU, ~15 min warm)
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ART = os.path.join(REPO, "artifacts", "at_size_128")
DATA = os.environ.get("ADVSHADOW_128_DATA", "/tmp/advshadow_128")
METRICS = os.path.join(ART, "distill_metrics.json")
N_CLS, PER_CLS, SUB = 10, 32, 16
STUDENTS = ("s16", "s16ext_1900", "s16_x0")


def log(msg):
    print(f"[diagnose] {msg}", flush=True)


def _npz_tree(path):
    arch = np.load(path)
    return {k: np.asarray(arch[k], np.float32) for k in arch.files}


def phase_weights(diag):
    """Pairwise relative L2 distance between committed param trees."""
    trees = {"teacher": _npz_tree(os.path.join(ART, "ema_params_f16.npz"))}
    for s in STUDENTS:
        trees[s] = _npz_tree(
            os.path.join(ART, "distilled", s, "ema_params_f16.npz"))
    names = list(trees)
    out = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            keys = sorted(set(trees[a]) & set(trees[b]))
            num = sum(float(np.sum((trees[a][k] - trees[b][k]) ** 2))
                      for k in keys)
            den = sum(float(np.sum(trees[a][k] ** 2)) for k in keys)
            out[f"{a}|{b}"] = round(float(np.sqrt(num / max(den, 1e-30))),
                                    6)
    diag["pairwise_relative_l2"] = out
    log(f"weights: {out}")
    return diag


def _ensure_ckpts():
    from advshadow_tpu.train import restore_ckpt_from_npz

    paths = {}
    teacher = os.path.join(ART, "diffusion_run", "shadow128")
    if not os.path.exists(os.path.join(teacher, "ckpt_last",
                                       "metadata.json")):
        restore_ckpt_from_npz(os.path.join(ART, "ema_params_f16.npz"),
                              os.path.join(ART, "metadata.json"), teacher)
    paths["teacher_cfg0_16grid"] = os.path.join(teacher, "ckpt_last")
    for s in STUDENTS:
        dst = os.path.join(ART, "distill_run", f"diag_{s}")
        if not os.path.exists(os.path.join(dst, "ckpt_last",
                                           "metadata.json")):
            restore_ckpt_from_npz(
                os.path.join(ART, "distilled", s, "ema_params_f16.npz"),
                os.path.join(ART, "distilled", s, "metadata.json"), dst)
        paths[s] = os.path.join(dst, "ckpt_last")
    return paths


def _generate(tag, ckpt):
    """PER_CLS x N_CLS generations with the battery's exact seed formula
    (benchmarks/at_size_128_eval.py:_gen_and_eval) at ddim-16/logsnr
    cfg 0 — the students' own sampling config."""
    from advshadow_tpu.cli.generate import main as generate_main

    root = os.path.join(DATA, f"diag_{tag}")
    flat = root + "_flat"
    if os.path.exists(os.path.join(flat, "done.json")):
        return flat
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(flat, ignore_errors=True)
    os.makedirs(flat)
    n_sub = PER_CLS // SUB
    for c in range(N_CLS):
        for j in range(n_sub):
            generate_main([
                "--weight_path", ckpt,
                "--result_path", os.path.join(root, f"cls{c}", f"sub{j}"),
                "--generate_name", f"g{c}", "--num_images", str(SUB),
                "--class_name", str(c), "--sample", "ddim",
                "--sample_steps", "16", "--sample_method", "logsnr",
                "--cfg_scale", "0", "--dtype", "bf16", "--use_ema", "1",
                "--seed", str(1000 + c * n_sub + j),
            ])
    for c in range(N_CLS):
        idx = 0
        for dirpath, _, files in sorted(
                os.walk(os.path.join(root, f"cls{c}"))):
            for fn in sorted(files):
                if fn.endswith(".png") and "_" in fn:
                    shutil.copy(os.path.join(dirpath, fn),
                                os.path.join(flat, f"g{c}_{idx}.png"))
                    idx += 1
    with open(os.path.join(flat, "done.json"), "w") as f:
        json.dump({"n": N_CLS * PER_CLS}, f)
    log(f"generated {tag}")
    return flat


def _load_flat(flat):
    from PIL import Image

    xs, ys, names = [], [], []
    for fn in sorted(os.listdir(flat)):
        if not fn.endswith(".png"):
            continue
        xs.append(np.asarray(Image.open(os.path.join(flat, fn)),
                             np.float32) / 255.0)
        ys.append(int(fn.split("_")[0][1:]))
        names.append(fn)
    return np.stack(xs), np.asarray(ys), names


def _victim_predict(arr):
    import jax.numpy as jnp

    from advshadow_tpu.victims import load_variables, make_victim_fn, \
        make_victim_model
    from advshadow_tpu.victims.zoo import safe_argmax

    vckpt = os.path.join(ART, "victim_run", "victim128_strong",
                         "victim_resnet18.npz")
    model = make_victim_model("resnet18", num_classes=N_CLS)
    vf = make_victim_fn(model, load_variables(vckpt))
    preds = []
    for s in range(0, len(arr), 64):
        preds.append(np.asarray(safe_argmax(vf(jnp.asarray(arr[s:s + 64])))))
    return np.concatenate(preds)


def phase_generations(diag):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    paths = _ensure_ckpts()
    flats = {tag: _generate(tag, ckpt) for tag, ckpt in paths.items()}

    data, preds = {}, {}
    for tag, flat in flats.items():
        arr, ys, names = _load_flat(flat)
        data[tag] = arr
        preds[tag] = _victim_predict(arr)
        acc = float(np.mean(preds[tag] == ys))
        hist = np.bincount(preds[tag], minlength=N_CLS).tolist()
        per_cls = [round(float(np.mean(preds[tag][ys == c] == c)), 4)
                   for c in range(N_CLS)]
        diag.setdefault("models", {})[tag] = {
            "victim_accuracy": round(acc, 4),
            "n_correct": int(np.sum(preds[tag] == ys)),
            "predicted_class_histogram": hist,
            "per_class_accuracy": per_cls,
        }
        log(f"{tag}: acc={acc:.4f} hist={hist}")

    tags = list(flats)
    pair = {}
    for i, a in enumerate(tags):
        for b in tags[i + 1:]:
            mse = float(np.mean((data[a] - data[b]) ** 2))
            agree = float(np.mean(preds[a] == preds[b]))
            pair[f"{a}|{b}"] = {"pixel_mse": round(mse, 6),
                                "prediction_agreement": round(agree, 4)}
    diag["pairwise_generations"] = pair
    log(f"pairs: {json.dumps(pair)}")
    return diag


def main():
    diag = {"seed_formula": "1000 + n_sub*class_index + sub_batch",
            "sampler": "ddim16/logsnr cfg0 (students' own config)",
            "victim": "victim128_strong"}
    diag = phase_weights(diag)
    diag = phase_generations(diag)

    # verdict synthesis: which world are we in?
    w = diag["pairwise_relative_l2"]
    same_weights = any(v < 1e-4 for k, v in w.items()
                       if "teacher" not in k)
    teacher_pairs = {k: v for k, v in
                     diag["pairwise_generations"].items()
                     if "teacher_cfg0_16grid" in k}
    init_dominated = all(v["prediction_agreement"] > 0.97
                         for v in teacher_pairs.values())
    diag["reading"] = (
        "A: checkpoint mixup — student npz trees are numerically "
        "identical" if same_weights else
        "B: init-dominated — distinct weights but generations keep the "
        "unguided teacher's victim predictions (agreement >0.97 with the "
        "teacher at cfg0 on the same grid/seeds)" if init_dominated else
        "C: genuine plateau — weights and generations both moved; "
        "conditioning did not")
    metrics = json.load(open(METRICS)) if os.path.exists(METRICS) else {}
    metrics["plateau_diagnostics"] = diag
    with open(METRICS, "w") as f:
        json.dump(metrics, f, indent=2)
    log(f"reading: {diag['reading']}")
    print(json.dumps({"metric": "distill_plateau_diagnosis",
                      "reading": diag["reading"].split(":")[0]}))


if __name__ == "__main__":
    main()
