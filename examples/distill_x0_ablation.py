"""Measure the distillation loss-weight ablation (--loss_weight x0).

distill_metrics.json's conclusion attributes the s16 student's
conditioning gap (vacc 0.1281 vs the teacher's 0.2313 on the SAME
ddim-16/logsnr grid) to distillation budget: 2.7x stage-1 updates did
not move it (distill_s16ext_1900).  A competing hypothesis is the loss
WEIGHTING: Salimans & Ho's truncated-SNR weight max(snr, 1) strongly
up-weights the low-t (high-SNR) segments, while the guidance lift the
student must absorb lives at high t where CFG bends the trajectory —
uniform x0-space MSE (--loss_weight x0, cli/distill.py) keeps those
segments weighted.  This driver runs stage 1 (s16) from the committed
teacher with x0 weighting at the SAME budget as the committed s16 row
(700 updates, batch 16, seed 0, cfg 3 — everything identical except the
weight), evaluates the student on its own grid with the same battery
generation phase, and appends the row + a ``loss_weight_ablation``
block to distill_metrics.json (annotating the top-level conclusion with
the ablation's verdict).  Either number settles the hypothesis: vacc ~0.13
= weighting is not the bottleneck (budget explanation stands); vacc
materially above 0.13 = the gap was (partly) the weighting.

All inputs rebuild from committed evidence (same pattern as
examples/distill_s16_extend.py), so a host wipe costs nothing.

Usage: python examples/distill_x0_ablation.py [phase ...]
Phases: inputs, distill, eval, export   (default: all, resumable)
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
STEPS = int(os.environ.get("ADVSHADOW_DISTILL_STEPS", "700"))
METRICS = os.path.join(ART, "distill_metrics.json")
TEACHER_RESULTS = os.path.join(ART, "diffusion_run", "shadow128")
TEACHER_CKPT = os.path.join(TEACHER_RESULTS, "ckpt_last")
DISTILL_ROOT = os.path.join(ART, "distill_run")
STAGE_CKPT = os.path.join(DISTILL_ROOT, "shadow128_x0_s16", "ckpt_last")
TAG = "distill_s16_x0_700"


def log(msg):
    print(f"[x0abl] {msg}", file=sys.stderr, flush=True)


def phase_inputs():
    from advshadow_tpu.data.synthetic import generate_dataset
    from advshadow_tpu.train import restore_ckpt_from_npz

    train_root = os.path.join(DATA, "train")
    if not os.path.exists(os.path.join(train_root, "labels.json")):
        generate_dataset(train_root, 50, 128, 0, start_index=0)
        log(f"regenerated train split at {train_root}")
    if not os.path.exists(os.path.join(TEACHER_CKPT, "metadata.json")):
        restore_ckpt_from_npz(os.path.join(ART, "ema_params_f16.npz"),
                              os.path.join(ART, "metadata.json"),
                              TEACHER_RESULTS)
        log("teacher ckpt rebuilt from committed npz")
    log("inputs ready")


def phase_distill(max_attempts: int = 3):
    if os.path.exists(os.path.join(STAGE_CKPT, "metadata.json")):
        log("x0 stage ckpt exists, skipping")
        return
    argv = [
        sys.executable, "-m", "advshadow_tpu.cli.distill",
        "--weight_path", TEACHER_CKPT, "--use_ema", "1",
        "--dataset_path", os.path.join(DATA, "train", "byclass"),
        "--stages", "16", "--steps_per_stage", str(STEPS),
        "--cfg_scale", "3", "--batch_size", "16", "--amp", "1",
        "--lr", "1e-4", "--seed", "0", "--loss_weight", "x0",
        "--result_path", DISTILL_ROOT, "--run_name", "shadow128_x0",
    ]
    for attempt in range(1, max_attempts + 1):
        log(f"x0 stage attempt {attempt}")
        t0 = time.time()
        rc = subprocess.call(argv, cwd=REPO)
        log(f"attempt {attempt} rc={rc} ({time.time() - t0:.0f}s)")
        if rc == 0 and os.path.exists(
                os.path.join(STAGE_CKPT, "metadata.json")):
            return
    raise RuntimeError(f"x0 stage failed {max_attempts} times")


def _stage_updates() -> int:
    """Actual update count of the stage checkpoint (save_ckpt stores
    epoch=done as metadata start_epoch) — NOT the current env-derived
    STEPS, which could mislabel a leftover ckpt trained under a
    different budget (round-4 advisor finding)."""
    meta_path = os.path.join(STAGE_CKPT, "metadata.json")
    with open(meta_path) as f:
        done = json.load(f).get("start_epoch")
    if done is None:
        return STEPS
    if done != STEPS:
        log(f"WARNING: stage ckpt has {done} updates, env asks {STEPS} — "
            "recording the ckpt's actual count")
    return int(done)


def phase_eval():
    from benchmarks.at_size_128_eval import _gen_and_eval

    with open(METRICS) as f:
        metrics = json.load(f)
    rows = metrics.setdefault("students", {})
    # the row and the ablation summary are separate products: an
    # interrupted earlier run may have written the row without the
    # summary, and the summary is what the experiment exists to produce
    # (round-4 advisor finding) — skip only when BOTH are present
    if TAG in rows and "loss_weight_ablation" in metrics:
        log(f"{TAG} row + ablation block present, skipping")
        return
    if TAG not in rows:
        row = _gen_and_eval(TAG, "ddim", 16, "logsnr", 0,
                            per_cls=32, ckpt=STAGE_CKPT)
        row["config"]["guidance_baked"] = 3.0
        row["loss_weight"] = "x0"
        row["stage1_updates_total"] = _stage_updates()
        rows[TAG] = row
    row = rows[TAG]
    trunc = rows["distill_s16"]["victim_accuracy_on_generated"]
    teach = metrics["teacher_grid_controls"][
        "teacher_cfg3_ddim16_logsnr"]["victim_accuracy_on_generated"]
    vacc = row["victim_accuracy_on_generated"]
    reading = (
        "x0 weighting closes part of the conditioning gap at equal "
        "budget" if vacc > trunc + 0.03 else
        "weighting is not the bottleneck at this budget — the "
        "budget explanation stands")
    metrics["loss_weight_ablation"] = {
        "trunc_snr_700": trunc, "x0_700": vacc,
        "teacher_same_grid": teach, "reading": reading,
    }
    # keep the committed top-level conclusion in sync with the ablation
    # verdict instead of silently contradicting it
    note = (f" [loss-weight ablation, equal 700-update budget: x0 vacc "
            f"{vacc} vs trunc_snr {trunc} — {reading}]")
    if "loss-weight ablation" not in metrics.get("conclusion", ""):
        metrics["conclusion"] = metrics.get("conclusion", "") + note
    with open(METRICS, "w") as f:
        json.dump(metrics, f, indent=2)
    log(f"{TAG}: vacc={vacc} (trunc_snr={trunc}, teacher grid={teach}), "
        f"fid={row['fid_generated_vs_train']}")


def phase_export():
    from advshadow_tpu.train.checkpoint import export_params_npz, load_ckpt

    d = os.path.join(ART, "distilled", "s16_x0")
    if os.path.exists(os.path.join(d, "metadata.json")):
        log("export exists, skipping")
        return
    tree = load_ckpt(STAGE_CKPT)
    ema = tree.get("ema_model") if tree.get("ema_model") is not None \
        else tree["model"]
    os.makedirs(d, exist_ok=True)
    out = export_params_npz(ema, os.path.join(d, "ema_params_f16.npz"))
    with open(os.path.join(d, "metadata.json"), "w") as f:
        json.dump(tree.get("metadata", {}), f, indent=2)
    log(f"exported {out} ({os.path.getsize(out) / 1e6:.1f} MB)")


PHASES = {"inputs": phase_inputs, "distill": phase_distill,
          "eval": phase_eval, "export": phase_export}


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    names = list(argv if argv is not None else sys.argv[1:]) or list(PHASES)
    for name in names:
        log(f"=== {name} ===")
        PHASES[name]()
    print(json.dumps({"metric": "distill_x0_ablation", "phases": names,
                      "steps": STEPS}))


if __name__ == "__main__":
    main()
