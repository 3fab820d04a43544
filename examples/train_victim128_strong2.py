"""Committed recipe for the round-4 stronger 128 px eval victim.

The round-3 at-size eval victim (victim128_strong, 40 epochs on the
50/class flagship train split) plateaus at 0.892 clean accuracy on the
held-out eval split, which blunts the ASR contrast of the attack rows
(round-3 verdict stretch #8).  The fix is data, not epochs: this trains
on a 6x larger procedural split (300/class, start_index 2000 — disjoint
from the flagship train split at 0.. and the eval split at 1000..) for
30 epochs.

Output: artifacts/at_size_128/victim_run/victim128_strong2/
victim_resnet18.npz — picked up by benchmarks/at_size_128_eval.py's
"strong" phase.

Ref context: the reference evaluates against ImageNet-pretrained
torchvision classifiers fine-tuned on Oxford-IIIT Pet
(ASR_fast.py:16-88); both are environment-blocked here, so procedural
victims stand in (PARITY.md "victims" note).

Usage: python examples/train_victim128_strong2.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.environ.get("ADVSHADOW_128_VDATA", "/tmp/advshadow_128_victim")
ART = os.path.join(REPO, "artifacts", "at_size_128")
SIZE, PER_CLS, EPOCHS = 128, 300, 30


def main():
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    from advshadow_tpu.data.synthetic import generate_dataset

    if not os.path.exists(os.path.join(DATA, "labels.json")):
        generate_dataset(DATA, PER_CLS, SIZE, 0, start_index=2000)
    from advshadow_tpu.cli.train_victim import main as train_victim_main

    out = train_victim_main([
        "--dataset_path", os.path.join(DATA, "byclass"),
        "--victim", "resnet18", "--image_size", str(SIZE),
        "--batch_size", "32", "--epochs", str(EPOCHS), "--lr", "1e-3",
        "--seed", "0",
        "--result_path", os.path.join(ART, "victim_run"),
        "--run_name", "victim128_strong2",
    ])
    print(json.dumps({"metric": "victim128_strong2",
                      "final_train_acc": out["train_acc"][-1]}))


if __name__ == "__main__":
    main()
