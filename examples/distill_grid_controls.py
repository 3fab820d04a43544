"""Teacher-on-the-students'-grid controls for the distillation table.

The distilled students (artifacts/at_size_128/distilled/) sample with N
plain logsnr DDIM steps and carry victim-conditioning ~0.13 — the
UNGUIDED teacher's level — while the CFG-3 teacher scores 0.2547 on its
own DDIM-50 protocol.  The s16 budget extension (distill_s16ext_1900)
showed 2.7x stage-1 budget does not move that number, so the remaining
question is WHERE the conditioning is lost: in the distillation, or in
the few-step grid itself.  This driver measures the missing controls —
the TEACHER, CFG 3 (the exact fused double-batch forward the stage-1
targets are built from), sampled on the students' own grids
(ddim-{16,8,4} logsnr) — through the same battery.  teacher@N >> student
sN means distillation loses guidance; teacher@N ~= student sN means the
grid itself never expressed it and the students are faithful.

Rows land in distill_metrics.json under "teacher_grid_controls".

Usage: python examples/distill_grid_controls.py
(restartable: rows already present are skipped; committed-evidence
inputs are rebuilt after a host wipe, same as distill_s16_extend.py)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ART = os.path.join(REPO, "artifacts", "at_size_128")
DATA = os.environ.get("ADVSHADOW_128_DATA", "/tmp/advshadow_128")
METRICS = os.path.join(ART, "distill_metrics.json")
GRIDS = (16, 8, 4)


def main():
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    from examples.distill_s16_extend import _ensure_committed_inputs

    _ensure_committed_inputs()
    from benchmarks.at_size_128_eval import _gen_and_eval

    teacher = os.path.join(ART, "diffusion_run", "shadow128", "ckpt_last")
    metrics = json.load(open(METRICS)) if os.path.exists(METRICS) else {}
    rows = metrics.setdefault("teacher_grid_controls", {})
    for n in GRIDS:
        tag = f"teacher_cfg3_ddim{n}_logsnr"
        if tag in rows:
            print(f"[controls] {tag} present, skipping", flush=True)
            continue
        rows[tag] = _gen_and_eval(tag, "ddim", n, "logsnr", 3,
                                  per_cls=32, ckpt=teacher)
        with open(METRICS, "w") as f:
            json.dump(metrics, f, indent=2)
        print(f"[controls] {tag}: "
              f"fid={rows[tag]['fid_generated_vs_train']} "
              f"vacc={rows[tag]['victim_accuracy_on_generated']}",
              flush=True)
    print("[controls] done", flush=True)


if __name__ == "__main__":
    main()
