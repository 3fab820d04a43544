"""Progressive guided distillation of the 128 px flagship (real TPU run).

Distills the committed at-size checkpoint (artifacts/at_size_128/
ema_params_f16.npz, the reproduction of the paper's core experiment,
ref: ddim2/main2.py:118-209) into few-step students with CFG baked in
(cli/distill.py; Salimans & Ho 2202.00512 + Meng et al. 2210.03142).
The teacher's committed few-step operating point is 20 denoiser calls
x CFG double-batch (TRAINED128_r04.json generation_grid); a 4-step
student needs 4 plain forwards — a 10x cut in network work per image.

Phases (resumable; each skips itself if its output exists):
  data     - the committed-recipe synthetic train split (seed 0)
  teacher  - rebuild ckpt_last from the committed npz + metadata
  distill  - stages 16 -> 8 -> 4, ONE CLI SUBPROCESS PER STAGE (each
             stage's ckpt is its own restart point; a relay wedge costs
             at most one stage), 1500 updates/stage, batch 16, bf16
  eval     - score each student through the same battery generation
             phase as the teacher rows (FID gen-vs-train + victim
             accuracy + warm e2e imgs/s), write
             artifacts/at_size_128/distill_metrics.json
  export   - per-stage EMA f16 npz + metadata for committing

Usage: python examples/distill_128_run.py [phase ...]   (default: all)
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
TEACHER_RESULTS = os.path.join(ART, "diffusion_run", "shadow128")
TEACHER_CKPT = os.path.join(TEACHER_RESULTS, "ckpt_last")
DISTILL_ROOT = os.path.join(ART, "distill_run")
STAGES = [16, 8, 4]
STEPS_PER_STAGE = int(os.environ.get("ADVSHADOW_DISTILL_STEPS", "1500"))
SIZE, N_TRAIN_PER_CLS = 128, 50
METRICS = os.path.join(ART, "distill_metrics.json")


def log(msg):
    print(f"[distill128] {msg}", file=sys.stderr, flush=True)


def _stage_ckpt(n: int) -> str:
    return os.path.join(DISTILL_ROOT, f"shadow128_s{n}", "ckpt_last")


def phase_data():
    from advshadow_tpu.data.synthetic import generate_dataset

    train_root = os.path.join(DATA, "train")
    if not os.path.exists(os.path.join(train_root, "labels.json")):
        generate_dataset(train_root, N_TRAIN_PER_CLS, SIZE, 0,
                         start_index=0)
    log(f"data ready under {DATA}")


def phase_teacher():
    if os.path.exists(os.path.join(TEACHER_CKPT, "metadata.json")):
        log("teacher ckpt present")
        return
    from advshadow_tpu.train import restore_ckpt_from_npz

    path = restore_ckpt_from_npz(
        os.path.join(ART, "ema_params_f16.npz"),
        os.path.join(ART, "metadata.json"), TEACHER_RESULTS)
    log(f"teacher rebuilt at {path}")


def phase_distill(max_attempts_per_stage: int = 3):
    teacher = TEACHER_CKPT
    for n in STAGES:
        ckpt = _stage_ckpt(n)
        if os.path.exists(os.path.join(ckpt, "metadata.json")):
            log(f"stage s{n} ckpt exists, skipping")
            teacher = ckpt
            continue
        argv = [
            sys.executable, "-m", "advshadow_tpu.cli.distill",
            "--weight_path", teacher, "--use_ema", "1",
            "--dataset_path", os.path.join(DATA, "train", "byclass"),
            "--stages", str(n),
            "--steps_per_stage", str(STEPS_PER_STAGE),
            "--cfg_scale", "3", "--batch_size", "16", "--amp", "1",
            "--lr", "1e-4", "--seed", "0",
            "--result_path", DISTILL_ROOT, "--run_name", "shadow128",
        ]
        for attempt in range(1, max_attempts_per_stage + 1):
            log(f"stage s{n} attempt {attempt} (teacher={teacher})")
            t0 = time.time()
            rc = subprocess.call(argv, cwd=REPO)
            log(f"stage s{n} attempt {attempt} rc={rc} "
                f"({time.time() - t0:.0f}s)")
            if rc == 0 and os.path.exists(
                    os.path.join(ckpt, "metadata.json")):
                break
        else:
            raise RuntimeError(f"stage s{n} failed "
                               f"{max_attempts_per_stage} times")
        teacher = ckpt
    log("all stages distilled")


def phase_eval():
    from benchmarks.at_size_128_eval import _gen_and_eval

    metrics = {}
    if os.path.exists(METRICS):
        with open(METRICS) as f:
            metrics = json.load(f)
    rows = metrics.setdefault("students", {})
    for n in STAGES:
        tag = f"distill_s{n}"
        if tag in rows:
            log(f"eval {tag} present, skipping")
            continue
        # cfg_scale 0: guidance is baked into the student's conditional
        # forward; sampling is N plain logsnr DDIM steps
        rows[tag] = _gen_and_eval(tag, "ddim", n, "logsnr", 0,
                                  per_cls=32, ckpt=_stage_ckpt(n))
        rows[tag]["config"]["guidance_baked"] = 3.0
        with open(METRICS, "w") as f:
            json.dump(metrics, f, indent=2)
        log(f"eval {tag}: {rows[tag]['fid_generated_vs_train']} FID, "
            f"{rows[tag]['victim_accuracy_on_generated']} victim acc")
    metrics["teacher_reference"] = {
        "source": "TRAINED128_r04.json (generation / generation_grid)",
        "protocol": "ddim50 uniform CFG3 and dpmpp_sde20 logsnr CFG3",
    }
    metrics["stage_steps"] = STEPS_PER_STAGE
    metrics["stages"] = STAGES
    with open(METRICS, "w") as f:
        json.dump(metrics, f, indent=2)
    log(f"wrote {METRICS}")


def phase_export():
    from advshadow_tpu.train.checkpoint import export_params_npz, load_ckpt

    out_root = os.path.join(ART, "distilled")
    for n in STAGES:
        tree = load_ckpt(_stage_ckpt(n))
        ema = tree.get("ema_model") if tree.get("ema_model") is not None \
            else tree["model"]
        d = os.path.join(out_root, f"s{n}")
        os.makedirs(d, exist_ok=True)
        out = export_params_npz(ema, os.path.join(d, "ema_params_f16.npz"))
        with open(os.path.join(d, "metadata.json"), "w") as f:
            json.dump(tree.get("metadata", {}), f, indent=2)
        log(f"exported {out} ({os.path.getsize(out) / 1e6:.1f} MB)")


PHASES = {"data": phase_data, "teacher": phase_teacher,
          "distill": phase_distill, "eval": phase_eval,
          "export": phase_export}


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    names = list(argv if argv is not None else sys.argv[1:]) or list(PHASES)
    for name in names:
        log(f"=== {name} ===")
        PHASES[name]()
    print(json.dumps({"metric": "distill_128_run", "phases": names}))


if __name__ == "__main__":
    main()
