"""Multi-victim ASR / transferability protocol at 128 px.

The reference's evaluation deliberately sweeps the SAME folder of
attacked images through ~6+ victim families sequentially (ref:
ASR_fast.py:129-167 — timm resnet50/convnext/swin, VGG16/19, ViT,
DINOv2, EfficientNetV2-S, fastai resnet18; each prints (1-asr)*100).
Round 4 closed the zoo architectures + trainer but every committed ASR
number was still against resnet18 victims only (round-4 verdict
Missing #3).  This driver runs the full protocol at the paper's size:

  1. train 5 additional 128 px victims from the zoo on the procedural
     victim split (300/class, start_index 2000 — disjoint from the
     flagship train and eval splits), resumable per-victim;
  2. optimize the shadow attack ONCE against the resnet18 surrogate
     (victim128_strong, the same ckpt every battery row uses), EVAL
     preset at the area-equivalent radius 30, targeted + corrected
     untargeted-ascent modes, warm-timed;
  3. evaluate the SAME attacked images on every victim (plus each
     victim's clean accuracy — transfer ASR is only interpretable
     against it) and write a per-architecture table to
     TRAINED128_r05.json as ``multi_victim_transferability``.

ImageNet-pretrained weights are environment-blocked (PARITY.md), so
these are procedurally-trained victims: the table measures the
*transferability protocol*, with each victim's clean accuracy printed
beside its ASR.

Usage: python benchmarks/multi_victim_asr.py [train eval]  (TPU)
       ADVSHADOW_ZOO_EPOCHS=20 to change the per-victim budget.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts", "at_size_128")
VDATA = os.environ.get("ADVSHADOW_128_VDATA", "/tmp/advshadow_128_victim")
OUT = os.environ.get("ADVSHADOW_128_OUT",
                     os.path.join(REPO, "TRAINED128_r05.json"))
SIZE, N_CLS = 128, 10
EPOCHS = int(os.environ.get("ADVSHADOW_ZOO_EPOCHS", "20"))
#: the reference's families, minus the environment-blocked pretrained
#: checkpoints: convolutional (vgg16, efficientnetv2_s, convnext_tiny)
#: and attention (vit_s16, swin_tiny) victims, per ASR_fast.py:129-167
#: efficientnetv2_s last: its eval-forward remote compile ran >55 min
#: in round 5 — with incremental row writes, a timeout loses only it
ZOO = ("vgg16", "vit_s16", "convnext_tiny", "swin_tiny",
       "efficientnetv2_s")
#: AdamW from-scratch LRs: 1e-3 matches the resnet18 victims; the
#: transformer families need the lower standard 3e-4 to train stably,
#: and normalization-free VGG needs 1e-4 (1e-3 pins it at chance —
#: measured: 20 epochs flat at loss ln(10))
LR = {"vit_s16": 3e-4, "swin_tiny": 3e-4, "vgg16": 1e-4}
#: vit_s16's position table and swin_tiny's window partition are fixed
#: at the 224 px ImageNet geometry (exact-naming replicas of the
#: reference's victims, which all consume 224 — ASR_fast.py:90-97), so
#: these two train at 224 and make_victim_fn resizes 128->224 in-graph
#: at attack/eval time, exactly the reference's eval preprocessing
TRAIN_SIZE = {"vit_s16": 224, "swin_tiny": 224}


def log(msg):
    print(f"[multi-victim] {msg}", file=sys.stderr, flush=True)


def _zoo_ckpt(name):
    return os.path.join(ART, "victim_run", f"zoo128_{name}",
                        f"victim_{name}.npz")


def phase_train():
    from advshadow_tpu.data.synthetic import generate_dataset

    if not os.path.exists(os.path.join(VDATA, "labels.json")):
        generate_dataset(VDATA, 300, SIZE, 0, start_index=2000)
        log(f"regenerated victim split at {VDATA}")
    from advshadow_tpu.cli.train_victim import main as train_victim_main

    for name in ZOO:
        if os.path.exists(_zoo_ckpt(name)):
            log(f"{name}: ckpt exists, skipping")
            continue
        t0 = time.time()
        out = train_victim_main([
            "--dataset_path", os.path.join(VDATA, "byclass"),
            "--victim", name,
            "--image_size", str(TRAIN_SIZE.get(name, SIZE)),
            "--batch_size", "32", "--epochs", str(EPOCHS),
            "--lr", str(LR.get(name, 1e-3)), "--seed", "0",
            "--result_path", os.path.join(ART, "victim_run"),
            "--run_name", f"zoo128_{name}",
        ])
        log(f"{name}: trained in {time.time() - t0:.0f}s "
            f"(final train acc {out['train_acc'][-1]:.3f})")


def _victim_eval_fn(name, ckpt):
    from advshadow_tpu.victims import load_variables, make_victim_fn, \
        make_victim_model

    model = make_victim_model(name, num_classes=N_CLS)
    return make_victim_fn(model, load_variables(ckpt),
                          input_size=TRAIN_SIZE.get(name))


def phase_eval():
    import jax
    import jax.numpy as jnp

    from advshadow_tpu.attack import EVAL_CONFIG
    from advshadow_tpu.victims.zoo import safe_argmax
    from benchmarks.at_size_128_eval import (_attack, _chunked_logits,
                                             _load_eval, _victim_ckpt,
                                             _warm_attack, phase_data)

    eval_root = phase_data()
    imgs01, masks, labels = _load_eval(eval_root)
    n = int(imgs01.shape[0])

    # the attack surrogate: the SAME resnet18 every battery row uses
    surrogate_ckpt = _victim_ckpt()
    surrogate = _victim_eval_fn("resnet18", surrogate_ckpt)

    rng = jax.random.PRNGKey(23)
    rng, t_rng = jax.random.split(rng)
    targets = (labels + jax.random.randint(t_rng, labels.shape, 1,
                                           N_CLS)) % N_CLS
    adv = {}
    for mode in ("targeted", "ascent"):
        cfg = dataclasses.replace(EVAL_CONFIG, radius_init=30.0,
                                  untargeted_ascent=(mode == "ascent"))
        tgt = targets if mode == "targeted" else labels
        _warm_attack(surrogate, imgs01, masks, tgt, cfg)
        t0 = time.time()
        adv[mode], rng = _attack(surrogate, imgs01, masks, tgt, rng, cfg)
        log(f"attack {mode}: {n / (time.time() - t0):.1f} imgs/s (warm)")

    victims = [("resnet18", surrogate_ckpt)] + \
        [(name, _zoo_ckpt(name)) for name in ZOO]
    rows = {}

    def _write_block():
        block = {
            "protocol": "attack optimized on resnet18 surrogate only "
                        "(EVAL preset, radius 30, warm-timed), identical "
                        "attacked images evaluated on every victim "
                        "(ref: ASR_fast.py:129-167)",
            "surrogate": os.path.relpath(surrogate_ckpt, REPO),
            "n": n, "image_size": SIZE, "radius_init": 30.0,
            "zoo_epochs": EPOCHS,
            "victims_note": "procedurally-trained victims (pretrained "
                            "ImageNet weights environment-blocked); "
                            "fooling_rate_* counts label flips among "
                            "each victim's initially-correct images",
            "victims": rows,
        }
        metrics = {}
        if os.path.exists(OUT):
            with open(OUT) as f:
                metrics = json.load(f)
        metrics["multi_victim_transferability"] = block
        with open(OUT, "w") as f:
            json.dump(metrics, f, indent=2)
        return block

    for name, ckpt in victims:
        if not os.path.exists(ckpt):
            log(f"{name}: no ckpt at {ckpt} — skipping")
            continue
        vf = _victim_eval_fn(name, ckpt)
        accs = {}
        for tag, batch in (("clean", imgs01), ("targeted",
                                               adv["targeted"]),
                           ("ascent", adv["ascent"])):
            pred = safe_argmax(_chunked_logits(vf, batch, chunk=64))
            accs[tag] = pred
        clean_acc = float(jnp.mean((accs["clean"] == labels)
                                   .astype(jnp.float32)))
        row = {
            "clean_accuracy": round(clean_acc, 4),
            "surrogate": name == "resnet18",
            "ckpt": os.path.relpath(ckpt, REPO),
        }
        for mode in ("targeted", "ascent"):
            acc = float(jnp.mean((accs[mode] == labels)
                                 .astype(jnp.float32)))
            row[f"accuracy_{mode}"] = round(acc, 4)
            row[f"asr_{mode}"] = round(1 - acc, 4)
            # the reference counts flips among initially-correct images
            # implicitly (its folder holds attacked images regardless);
            # fooling-rate-on-correct is the transfer-fair variant
            correct = accs["clean"] == labels
            flipped = correct & (accs[mode] != labels)
            denom = float(jnp.sum(correct.astype(jnp.float32)))
            row[f"fooling_rate_{mode}"] = round(
                float(jnp.sum(flipped.astype(jnp.float32)))
                / max(denom, 1.0), 4)
        row["target_hit_rate"] = round(float(jnp.mean(
            (accs["targeted"] == targets).astype(jnp.float32))), 4)
        rows[name] = row
        log(f"{name}: clean={clean_acc:.3f} "
            f"asr_t={row['asr_targeted']:.3f} "
            f"fool_t={row['fooling_rate_targeted']:.3f} "
            f"asr_a={row['asr_ascent']:.3f} "
            f"fool_a={row['fooling_rate_ascent']:.3f}")
        # incremental write: one victim's slow remote compile must not
        # lose the finished rows to the driver's phase timeout
        _write_block()

    block = _write_block()
    log(f"wrote {OUT}")
    return block


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    phases = list(argv if argv is not None else sys.argv[1:]) or [
        "train", "eval"]
    if "train" in phases:
        phase_train()
    if "eval" in phases:
        block = phase_eval()
        print(json.dumps({"metric": "multi_victim_asr",
                          "victims": len(block["victims"])}))
    else:
        print(json.dumps({"metric": "multi_victim_asr",
                          "phases": phases}))


if __name__ == "__main__":
    main()
