"""Extend the s16 guidance-baking stage past the round-deadline budget.

distill_metrics.json's control row showed the 700-update students carry
the UNGUIDED teacher's conditioning (victim acc ~0.10-0.13 vs 0.25 for
the CFG-3 teacher): stage 1 bakes the trajectory before it bakes the
guidance lift.  This driver continues stage 1 — student initialized at
a committed stage's weights (ADVSHADOW_EXTEND_FROM, default s16, with
ADVSHADOW_EXTEND_BASE total updates already in it), teacher = the
original flagship with the CFG-3 fused forward — for
ADVSHADOW_EXTEND_STEPS more updates (default 1200), saves
`shadow128_s16ext_<total>/ckpt_last`, and re-runs the same battery row
so the budget→conditioning trend is a measured curve, not a claim.

Usage: python examples/distill_s16_extend.py
       ADVSHADOW_EXTEND_FROM=s16ext_1900 ADVSHADOW_EXTEND_BASE=1900 \
       ADVSHADOW_EXTEND_STEPS=3100 python examples/distill_s16_extend.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ART = os.path.join(REPO, "artifacts", "at_size_128")
DATA = os.environ.get("ADVSHADOW_128_DATA", "/tmp/advshadow_128")
STEPS = int(os.environ.get("ADVSHADOW_EXTEND_STEPS", "1200"))
#: committed stage to continue from (dir under artifacts/.../distilled)
#: and the total stage-1 updates already in it — chained extensions
#: (s16 at 700 -> s16ext_1900 -> ...) build one budget->conditioning
#: trend curve
FROM = os.environ.get("ADVSHADOW_EXTEND_FROM", "s16")
BASE = int(os.environ.get("ADVSHADOW_EXTEND_BASE", "700"))
METRICS = os.path.join(ART, "distill_metrics.json")
SNAP = os.path.join(DATA, f"s16ext_{FROM}_{STEPS}_resume.npz")
SNAP_EVERY = 100


def _ensure_committed_inputs():
    """Rebuild dataset + checkpoints from committed evidence if a host
    wipe erased the working trees (same pattern as
    examples/at_size_128_eval_from_committed.py)."""
    from advshadow_tpu.data.synthetic import generate_dataset
    from advshadow_tpu.train import restore_ckpt_from_npz

    train_root = os.path.join(DATA, "train")
    if not os.path.exists(os.path.join(train_root, "labels.json")):
        generate_dataset(train_root, 50, 128, 0, start_index=0)
        print(f"[s16ext] regenerated train split at {train_root}",
              flush=True)
    teacher_results = os.path.join(ART, "diffusion_run", "shadow128")
    if not os.path.exists(os.path.join(teacher_results, "ckpt_last",
                                       "metadata.json")):
        restore_ckpt_from_npz(os.path.join(ART, "ema_params_f16.npz"),
                              os.path.join(ART, "metadata.json"),
                              teacher_results)
        print("[s16ext] teacher ckpt rebuilt from committed npz",
              flush=True)
    s16_results = os.path.join(ART, "distill_run", f"shadow128_{FROM}")
    if not os.path.exists(os.path.join(s16_results, "ckpt_last",
                                       "metadata.json")):
        restore_ckpt_from_npz(
            os.path.join(ART, "distilled", FROM, "ema_params_f16.npz"),
            os.path.join(ART, "distilled", FROM, "metadata.json"),
            s16_results)
        print(f"[s16ext] {FROM} stage ckpt rebuilt from committed npz",
              flush=True)


def _save_snap(state, done, losses):
    """Uncompressed f32 snapshot of params+ema+progress so a relay-wedge
    kill/restart resumes mid-run instead of redoing the whole budget
    (optimizer moments are dropped; AdamW re-warms in ~beta-horizon
    steps, which is noise at this budget)."""
    import numpy as np
    from advshadow_tpu.train.checkpoint import _flatten

    flat = {"__done__": np.asarray(done, np.int64),
            "__losses__": np.asarray(losses, np.float32)}
    for tag, tree in (("p:", state.params), ("e:", state.ema_params)):
        for k, v in _flatten(tree).items():
            flat[tag + k] = np.asarray(v, np.float32)
    tmp = SNAP + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, SNAP)


def _load_snap(like):
    """Returns (params, ema_params, done, losses) or None."""
    import numpy as np
    from advshadow_tpu.train.checkpoint import _unflatten

    if not os.path.exists(SNAP):
        return None
    arch = np.load(SNAP)
    trees = []
    for tag in ("p:", "e:"):
        flat = {k[len(tag):]: arch[k] for k in arch.files
                if k.startswith(tag)}
        trees.append(_unflatten(flat, like))
    return (trees[0], trees[1], int(arch["__done__"]),
            [float(x) for x in arch["__losses__"]])


def main():
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    _ensure_committed_inputs()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advshadow_tpu.core import make_diffusion
    from advshadow_tpu.data import BatchLoader, ImageFolderDataset
    from advshadow_tpu.models import make_network
    from advshadow_tpu.train.checkpoint import load_ckpt, save_ckpt
    from advshadow_tpu.train.distill import (
        DistillConfig, create_distill_state, make_distill_step)

    teacher_tree = load_ckpt(os.path.join(ART, "diffusion_run", "shadow128",
                                          "ckpt_last"))
    s16_tree = load_ckpt(os.path.join(ART, "distill_run",
                                      f"shadow128_{FROM}", "ckpt_last"))
    meta = teacher_tree["metadata"]
    model = make_network(meta["network"], num_classes=meta["num_classes"],
                         act=meta["act"], channel=tuple(meta["channel"]),
                         dtype=jnp.bfloat16)
    coeffs = make_diffusion(1000, meta["noise_schedule"])
    to_f32 = lambda tr: jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), tr)
    teacher_params = to_f32(teacher_tree["ema_model"])
    student_init = to_f32(s16_tree["model"])

    config = DistillConfig(n_student=16, cfg_w=3.0, steps=STEPS,
                           compute_dtype=jnp.bfloat16)
    start, losses = 0, []
    snap = _load_snap(student_init)
    if snap is not None:
        student_init, ema0, start, losses = snap[0], snap[1], snap[2], snap[3]
        print(f"[s16ext] resumed from snapshot at step {start}", flush=True)
    state = create_distill_state(model, config, student_init)
    if snap is not None:
        state = state.replace(step=start,
                              ema_params=jax.tree_util.tree_map(
                                  lambda p: jnp.asarray(p, jnp.float32),
                                  ema0))
    step_fn = make_distill_step(coeffs, config, model.apply)

    dataset = ImageFolderDataset(os.path.join(DATA, "train", "byclass"),
                                 meta["image_size"], seed=0)
    loader = BatchLoader(dataset, 16, seed=1)  # fresh shuffle stream
    rng = jax.random.fold_in(jax.random.PRNGKey(1), start)
    done, t0 = start, time.time()
    while done < STEPS:
        for batch in loader:
            if done >= STEPS:
                break
            rng, k = jax.random.split(rng)
            state, m = step_fn(state, teacher_params,
                               jnp.asarray(batch[0]),
                               jnp.asarray(batch[1], jnp.int32), k)
            losses.append(float(m["loss"]))
            done += 1
            if done % 100 == 0:
                print(f"[s16ext] {done}/{STEPS} loss="
                      f"{np.mean(losses[-100:]):.4f} "
                      f"({(done - start) / (time.time() - t0):.2f} "
                      "steps/s)", flush=True)
            if done % SNAP_EVERY == 0 or done == STEPS:
                _save_snap(state, done, losses)
    total = BASE + STEPS
    out = os.path.join(ART, "distill_run", f"shadow128_s16ext_{total}")
    ckpt_meta = dict(
        num_classes=meta["num_classes"], conditional=True,
        image_size=meta["image_size"], sample="ddim",
        network=meta["network"], act=meta["act"],
        classes_name=meta.get("classes_name"),
        noise_schedule=meta["noise_schedule"],
        channel=meta["channel"], sample_steps=16,
        sample_method="logsnr", guidance_baked=3.0,
        distilled_stages=[16, 16], stage1_updates_total=total)
    save_ckpt(out, epoch=done, params=jax.device_get(state.params),
              ema_params=jax.device_get(state.ema_params), **ckpt_meta)
    print(f"[s16ext] saved {out} (loss {np.mean(losses[:100]):.3f} -> "
          f"{np.mean(losses[-100:]):.3f})", flush=True)

    # committed-evidence export (distill_run/ is gitignored): f16 EMA npz
    # + metadata, same policy as the other distilled stages
    from advshadow_tpu.train.checkpoint import export_params_npz

    exp_dir = os.path.join(ART, "distilled", f"s16ext_{total}")
    export_params_npz(jax.device_get(state.ema_params),
                      os.path.join(exp_dir, "ema_params_f16.npz"))
    with open(os.path.join(exp_dir, "metadata.json"), "w") as f:
        json.dump(dict(ckpt_meta, start_epoch=done), f, indent=2)
    print(f"[s16ext] exported {exp_dir}", flush=True)

    from benchmarks.at_size_128_eval import _gen_and_eval

    metrics = json.load(open(METRICS)) if os.path.exists(METRICS) else {}
    row = _gen_and_eval(f"distill_s16ext_{total}", "ddim", 16, "logsnr", 0,
                        per_cls=32, ckpt=os.path.join(out, "ckpt_last"))
    row["config"]["guidance_baked"] = 3.0
    row["stage1_updates_total"] = total
    row["loss_first100"] = float(np.mean(losses[:100]))
    row["loss_last100"] = float(np.mean(losses[-100:]))
    # keyed by total budget so chained extensions build a trend curve
    # instead of overwriting the previous point
    metrics.setdefault("students", {})[f"distill_s16ext_{total}"] = row
    with open(METRICS, "w") as f:
        json.dump(metrics, f, indent=2)
    print("[s16ext] eval", row["fid_generated_vs_train"],
          row["victim_accuracy_on_generated"],
          row.get("warm_imgs_per_sec_e2e_cli"), flush=True)


if __name__ == "__main__":
    main()
