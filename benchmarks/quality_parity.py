"""Measured quality parity vs the PyTorch reference attack pipeline.

Runs the reference's ACTUAL ``optimize_shadow_position`` →
``apply_shadow`` → ``apply_adversarial_perturbation`` chain
(ref: ddim2/test.py:479-871, imported read-only with heavy deps stubbed,
CPU) and this framework's ``optimize_shadow_position`` in ``hard=True``
compat mode, on identical inputs:

- one shared victim (a small CNN instantiated in torch, weights ported
  1:1 to the flax twin),
- identical images, masks, target labels,
- identical IG baselines (torch.randn_like monkeypatched on the
  reference side; ``ig_baselines`` injected on ours).

Reports the BASELINE.md north-star quantities: ASR under the shared
victim for both pipelines, PSNR/SSIM of attacked-vs-original per
pipeline and their deviations, plus direct cross-pipeline pixel
agreement.  ``python -m benchmarks.quality_parity`` writes
``QUALITY_r02.json`` at the repo root.

Protocol notes (reference quirks reproduced, not fixed):
- the reference swaps (y, x) from ``torch.nonzero(mask).mean(0)[1:]``
  into an (x, y) shadow center (ddim2/test.py:500-501 vs :639-644);
  ``ShadowOptConfig(center_transpose_compat=True)`` replicates that
  bit-for-bit, so the masks here are ASYMMETRIC circles (independent
  cx/cy) and the parity claim covers the transpose quirk too.
- the reference mutates ``original_image`` in place via a shared-memory
  numpy view (``rgb_image /= rgb_image.max()``, ddim2/test.py:541-542);
  outputs don't depend on the mutated tensor, but we pass a copy anyway.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# reference import (read-only, stubs for heavy deps)
# ---------------------------------------------------------------------------

def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    # fill in missing attrs even on an existing stub (tests/reference_loader
    # registers leaner stubs for the same modules; order must not matter)
    for k, v in attrs.items():
        if not hasattr(mod, k):
            setattr(mod, k, v)
    return mod


class _StubGradCAM:
    def __init__(self, model=None, target_layers=None):
        self._shape = None

    def __call__(self, input_tensor=None, **kw):
        h, w = input_tensor.shape[-2:]
        return np.zeros((1, h, w), np.float32)


def load_reference_attack():
    """Import ddim2/test.py (the attack library) with stubs."""
    _stub("pytorch_grad_cam", GradCAM=_StubGradCAM)
    _stub("pytorch_grad_cam.utils")
    _stub("pytorch_grad_cam.utils.image",
          show_cam_on_image=lambda img, cam, use_rgb=True: img)
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models")
    tv.datasets = _stub("torchvision.datasets")
    tv.transforms = _stub("torchvision.transforms")
    class _StubAxis:
        def __getattr__(self, name):  # imshow / set_title / axis / ...
            return lambda *a, **k: None

    def _subplots(nrows=1, ncols=1, **k):
        n = (nrows if isinstance(nrows, int) else 1) * \
            (ncols if isinstance(ncols, int) else 1)
        axs = [_StubAxis() for _ in range(max(n, 1))]
        return None, (axs if len(axs) > 1 else axs[0])

    _stub("matplotlib", use=lambda *a: None)
    _stub("matplotlib.pyplot", subplots=_subplots, show=lambda *a, **k: None,
          figure=lambda *a, **k: None, close=lambda *a, **k: None)
    _stub("requests")
    _stub("fastai")
    _stub("fastai.vision")
    _stub("fastai.vision.core", PILImage=object)
    spec = importlib.util.spec_from_file_location(
        "ref_ddim2_test", os.path.join(REFERENCE, "ddim2", "test.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_ddim2_test"] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# shared victim: torch model + flax twin with ported weights
# ---------------------------------------------------------------------------

def build_victim(num_classes=37, seed=0):
    """Returns (torch_classifier_wrapper, flax_victim_fn).

    The torch model is shaped so the reference's Grad-CAM hook path
    ``classifier.model[0][7][-1]`` resolves (ddim2/test.py:503)."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    features = tnn.Sequential(
        tnn.Conv2d(3, 16, 3, 2, 1), tnn.ReLU(),      # 0 1
        tnn.Conv2d(16, 32, 3, 2, 1), tnn.ReLU(),     # 2 3
        tnn.Conv2d(32, 32, 3, 2, 1), tnn.ReLU(),     # 4 5
        tnn.Identity(),                               # 6
        tnn.Sequential(tnn.Conv2d(32, 32, 3, 1, 1), tnn.ReLU()),  # 7
    )
    model = tnn.Sequential(
        features,
        tnn.Sequential(tnn.AdaptiveAvgPool2d(1), tnn.Flatten(),
                       tnn.Linear(32, num_classes)),
    ).eval()

    class Wrapper:  # the reference's classifier.{model,predict} surface
        pass

    clf = Wrapper()
    clf.model = model

    # flax twin + 1:1 port
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from advshadow_tpu.victims.port import convert_conv, convert_linear

    class QVictim(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(16, (3, 3), 2, padding=1, name="c0")(x))
            x = nn.relu(nn.Conv(32, (3, 3), 2, padding=1, name="c2")(x))
            x = nn.relu(nn.Conv(32, (3, 3), 2, padding=1, name="c4")(x))
            x = nn.relu(nn.Conv(32, (3, 3), 1, padding=1, name="c7")(x))
            x = x.mean(axis=(1, 2))
            return nn.Dense(num_classes, name="fc")(x)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = {
        "c0": {"kernel": convert_conv(sd["0.0.weight"]), "bias": sd["0.0.bias"]},
        "c2": {"kernel": convert_conv(sd["0.2.weight"]), "bias": sd["0.2.bias"]},
        "c4": {"kernel": convert_conv(sd["0.4.weight"]), "bias": sd["0.4.bias"]},
        "c7": {"kernel": convert_conv(sd["0.7.0.weight"]),
               "bias": sd["0.7.0.bias"]},
        "fc": {"kernel": convert_linear(sd["1.2.weight"]), "bias": sd["1.2.bias"]},
    }
    fm = QVictim()
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}

    def victim_fn(x):
        return fm.apply(variables, x)

    return clf, victim_fn


# ---------------------------------------------------------------------------
# the measurement
# ---------------------------------------------------------------------------

def make_inputs(n_images, size, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.random((n_images, size, size, 3), dtype=np.float32)
    masks = np.zeros((n_images, size, size), np.float32)
    ys, xs = np.mgrid[0:size, 0:size]
    for i in range(n_images):
        cx = float(rng.uniform(size * 0.30, size * 0.70))
        cy = float(rng.uniform(size * 0.30, size * 0.70))  # asymmetric
        r = float(rng.uniform(size * 0.2, size * 0.32))
        masks[i] = ((xs - cx) ** 2 + (ys - cy) ** 2 <= r * r).astype(
            np.float32)
    targets = rng.integers(0, 37, n_images).astype(np.int32)
    baselines = rng.standard_normal(
        (n_images, 16, size, size, 3)).astype(np.float32)  # >= iterations
    return images, masks, targets, baselines


def run_reference(ref, clf, images, masks, targets, baselines, iterations):
    import torch

    outs, radii = [], []
    gd = ref.GaussianDiffusion(timesteps=10)
    orig_randn_like = torch.randn_like
    try:
        for i in range(images.shape[0]):
            draws = iter(baselines[i])
            torch.randn_like = lambda x, **k: torch.from_numpy(
                np.transpose(next(draws), (2, 0, 1))).unsqueeze(0)
            img = torch.from_numpy(np.transpose(images[i].copy(), (2, 0, 1)))
            mask = torch.from_numpy(masks[i]).unsqueeze(0)  # [1, H, W]
            tgt = torch.tensor([int(targets[i])])
            _, radius, shadowed = gd.optimize_shadow_position(
                clf, img, mask, tgt, "cpu", lr=0.1, iterations=iterations)
            outs.append(np.transpose(shadowed.numpy(), (1, 2, 0)))
            radii.append(float(radius))
    finally:
        torch.randn_like = orig_randn_like
    return np.stack(outs), np.asarray(radii)


def run_ours(victim_fn, images, masks, targets, baselines, iterations):
    import jax
    import jax.numpy as jnp

    from advshadow_tpu.attack import ShadowOptConfig, optimize_shadow_position

    cfg = ShadowOptConfig(iterations=iterations, hard=True,
                          center_transpose_compat=True)
    fn = jax.jit(lambda im, m, t, b: optimize_shadow_position(
        victim_fn, im, m, t, jax.random.PRNGKey(0), cfg,
        ig_baselines=b))
    outs, radii = [], []
    for i in range(images.shape[0]):
        res = fn(jnp.asarray(images[i]), jnp.asarray(masks[i]),
                 jnp.int32(targets[i]), jnp.asarray(baselines[i][:iterations]))
        outs.append(np.asarray(res.image))
        radii.append(float(res.radius))
    return np.stack(outs), np.asarray(radii)


def _asr(victim_fn, clean, attacked, targets):
    import jax.numpy as jnp

    clean_pred = np.asarray(victim_fn(jnp.asarray(clean))).argmax(-1)
    adv_pred = np.asarray(victim_fn(jnp.asarray(attacked))).argmax(-1)
    flipped = float(np.mean(adv_pred != clean_pred))
    targeted = float(np.mean(adv_pred == targets))
    return flipped, targeted


def run_quality_parity(n_images=8, image_size=64, iterations=11, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    ref = load_reference_attack()
    clf, victim_fn = build_victim(seed=seed)
    images, masks, targets, baselines = make_inputs(n_images, image_size, seed)

    ref_out, ref_radii = run_reference(
        ref, clf, images, masks, targets, baselines, iterations)
    our_out, our_radii = run_ours(
        victim_fn, images, masks, targets, baselines, iterations)

    import jax.numpy as jnp

    from advshadow_tpu.eval import batch_psnr_ssim

    # reference eval protocol: PSNR/SSIM of attacked vs original @64, win 7
    ssim_ref, psnr_ref = batch_psnr_ssim(jnp.asarray(ref_out),
                                         jnp.asarray(images))
    ssim_our, psnr_our = batch_psnr_ssim(jnp.asarray(our_out),
                                         jnp.asarray(images))
    # cross-pipeline agreement
    ssim_x, psnr_x = batch_psnr_ssim(jnp.asarray(our_out), jnp.asarray(ref_out))
    asr_ref, tgt_ref = _asr(victim_fn, images, ref_out, targets)
    asr_our, tgt_our = _asr(victim_fn, images, our_out, targets)

    return {
        "protocol": {
            "n_images": n_images, "image_size": image_size,
            "iterations": iterations,
            "inner": "IG 10x(20+1), eps 0.01, alpha 0.005",
            "intensity": 0.051, "blur_k": 5, "seed": seed,
            "reference": "ddim2/test.py:479-871 (imported, CPU)",
            "ours": "optimize_shadow_position(hard=True), shared baselines",
        },
        "psnr_vs_original": {"reference": float(psnr_ref),
                             "ours": float(psnr_our),
                             "abs_deviation": abs(float(psnr_ref) - float(psnr_our))},
        "ssim_vs_original": {"reference": float(ssim_ref),
                             "ours": float(ssim_our),
                             "abs_deviation": abs(float(ssim_ref) - float(ssim_our))},
        "asr_flip": {"reference": asr_ref, "ours": asr_our,
                     "abs_deviation": abs(asr_ref - asr_our)},
        "asr_targeted": {"reference": tgt_ref, "ours": tgt_our,
                         "abs_deviation": abs(tgt_ref - tgt_our)},
        "cross_pipeline": {
            "max_abs_pixel_diff": float(np.max(np.abs(ref_out - our_out))),
            "mean_abs_pixel_diff": float(np.mean(np.abs(ref_out - our_out))),
            "psnr_ours_vs_reference_output": float(psnr_x),
            "ssim_ours_vs_reference_output": float(ssim_x),
            "max_radius_diff": float(np.max(np.abs(ref_radii - our_radii))),
        },
    }


if __name__ == "__main__":
    result = run_quality_parity(
        n_images=int(os.environ.get("QP_IMAGES", 16)),
        image_size=int(os.environ.get("QP_SIZE", 64)),
        iterations=int(os.environ.get("QP_ITERS", 11)),
    )
    out_path = os.path.join(REPO, "QUALITY_r02.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print(f"wrote {out_path}")
