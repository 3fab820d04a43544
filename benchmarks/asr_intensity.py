"""ASR / stealth tradeoff curve on the TRAINED pipeline.

The reference evaluates its shadow attack at fixed intensities chosen
per driver (0.051 at ddim2/test.py:831, 0.33 at ddim2/diff_model2.py:616,
0.43 at tools/train_shadow.py:225) and reports ASR + PSNR/SSIM at that
single operating point.  This script sweeps the shadow intensity over
the whole practical range on the held-out split with the fine-tuned
victim from ``examples/real_training_run.py`` and records the full
attack-success / imperceptibility tradeoff, untargeted and targeted —
the paper-style curve the reference never plots.

Writes ``artifacts/real_run/asr_intensity.json`` and a matplotlib
figure next to it.

Usage:  python benchmarks/asr_intensity.py
        (expects /tmp/advshadow_realdata from the real-run data phase;
         regenerate with `python examples/real_training_run.py --phase data`)
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
ART = os.path.join(REPO, "artifacts", "real_run")
DATA = os.environ.get("ADVSHADOW_DATA", "/tmp/advshadow_realdata")
VCKPT = os.path.join(ART, "victim_run", "victim64", "victim_resnet18.npz")

# the reference's three published operating points (0.051 nearly
# invisible, 0.33, 0.43) plus fill-in values up to a hard shadow;
# composite is img*(1-intensity) inside the mask, so higher = darker
INTENSITIES = [0.051, 0.15, 0.25, 0.33, 0.43, 0.60, 0.80]


def main():
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    import jax
    import jax.numpy as jnp

    from advshadow_tpu.attack import EVAL_CONFIG, batched_optimize_shadow
    from advshadow_tpu.data import ShadowPairDataset
    from advshadow_tpu.eval.psnr_ssim import batch_psnr_ssim
    from advshadow_tpu.victims import make_victim_fn, make_victim_model
    from advshadow_tpu.victims.zoo import safe_argmax

    eval_root = os.path.join(DATA, "eval")
    dataset = ShadowPairDataset(
        os.path.join(eval_root, "images"), os.path.join(eval_root, "masks"),
        64, labels_json=os.path.join(eval_root, "labels.json"), seed=0)

    from advshadow_tpu.victims import load_variables

    victim = make_victim_model("resnet18", num_classes=10)
    variables = load_variables(VCKPT)
    victim_fn = make_victim_fn(victim, variables)

    n = len(dataset)
    items = [dataset[i] for i in range(n)]
    imgs01 = (jnp.asarray(np.stack([it[0] for it in items])) + 1.0) / 2.0
    masks = jnp.asarray(np.stack([it[1] for it in items]))
    labels = jnp.asarray([it[2] for it in items], jnp.int32)

    clean_pred = safe_argmax(victim_fn(imgs01))
    clean_acc = float(jnp.mean((clean_pred == labels).astype(jnp.float32)))
    print(f"n={n} clean_acc={clean_acc:.4f}", file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    rows = []
    # modes: compat untargeted (reference semantics), targeted, and the
    # round-4 corrected untargeted ascent (self-label CE ascent inner
    # attack — see attack/optimize.py ShadowOptConfig.untargeted_ascent)
    for mode in ("untargeted", "targeted", "ascent"):
        targeted = mode == "targeted"
        rng, t_rng = jax.random.split(rng)
        if targeted:
            offset = jax.random.randint(t_rng, labels.shape, 1, 10)
            targets = (labels + offset) % 10
        else:
            targets = labels
        for intensity in INTENSITIES:
            cfg = dataclasses.replace(EVAL_CONFIG, shadow_intensity=intensity,
                                      untargeted_ascent=(mode == "ascent"))
            t0 = time.time()
            chunks = []
            for s in range(0, n, 128):
                rng, a_rng = jax.random.split(rng)
                res = batched_optimize_shadow(
                    victim_fn, imgs01[s:s + 128], masks[s:s + 128],
                    targets[s:s + 128], a_rng, cfg)
                chunks.append(jax.block_until_ready(res.image))
            adv = jnp.concatenate(chunks)
            dt = time.time() - t0
            pred = safe_argmax(victim_fn(adv))
            acc = float(jnp.mean((pred == labels).astype(jnp.float32)))
            hit = float(jnp.mean((pred == targets).astype(jnp.float32)))
            ssim_v, psnr_v = batch_psnr_ssim(adv, imgs01)
            row = {
                "mode": mode,
                "targeted": targeted,
                "intensity": intensity,
                "asr": round(1.0 - acc, 4),
                "accuracy": round(acc, 4),
                "target_hit_rate": round(hit, 4) if targeted else None,
                "psnr": round(float(jnp.mean(psnr_v)), 3),
                "ssim": round(float(jnp.mean(ssim_v)), 4),
                "seconds": round(dt, 2),
            }
            rows.append(row)
            print(json.dumps(row), file=sys.stderr)

    out = {
        "n": n,
        "clean_accuracy": round(clean_acc, 4),
        "preset": "eval (ref ddim2/test.py:479-617 operating point)",
        "victim": "resnet18 fine-tuned (artifacts/real_run)",
        "rows": rows,
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "asr_intensity.json"), "w") as f:
        json.dump(out, f, indent=2)
    _plot(out)
    print(json.dumps({"metric": "asr_intensity_sweep", "rows": len(rows)}))


def _plot(out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.4), dpi=140)
    modes = ((("untargeted", "o", "untargeted (compat)"),
              ("targeted", "s", "targeted"),
              ("ascent", "^", "untargeted (ascent)"))
             if any("mode" in r for r in out["rows"])
             else ((False, "o", "untargeted"), (True, "s", "targeted")))
    for mode, marker, label in modes:
        rows = [r for r in out["rows"]
                if r.get("mode", r["targeted"]) == mode]
        if not rows:
            continue
        xs = [r["intensity"] for r in rows]
        ax1.plot(xs, [r["asr"] for r in rows], marker=marker, label=label)
        ax2.plot([r["ssim"] for r in rows], [r["asr"] for r in rows],
                 marker=marker, label=label)
    ax1.set_xlabel("shadow intensity (1-intensity brightness scale)")
    ax1.set_ylabel("ASR")
    ax1.legend()
    ax1.set_title(f"ASR vs intensity (clean acc "
                  f"{out['clean_accuracy']:.3f}, n={out['n']})")
    ax2.set_xlabel("SSIM vs clean")
    ax2.set_ylabel("ASR")
    ax2.set_title("attack success / stealth tradeoff")
    fig.tight_layout()
    fig.savefig(os.path.join(ART, "asr_intensity.png"))


if __name__ == "__main__":
    main()
