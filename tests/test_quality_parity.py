"""End-to-end PIPELINE quality parity vs the PyTorch reference attack.

Runs the reference's actual optimize_shadow_position chain
(ddim2/test.py:479-871, imported read-only) and ours in hard-compat mode
on identical inputs/victim/baselines — the BASELINE.md north-star check
("ASR matched, <=1e-3 PSNR/SSIM deviation"), small config for CI.  The
full 16-image x 11-iteration measurement is ``benchmarks/quality_parity.py``
-> QUALITY_r02.json.
"""

import pytest

torch = pytest.importorskip("torch")


def test_pipeline_quality_parity_small():
    from benchmarks.quality_parity import run_quality_parity

    out = run_quality_parity(n_images=2, image_size=64, iterations=3)
    assert out["psnr_vs_original"]["abs_deviation"] <= 1e-3
    assert out["ssim_vs_original"]["abs_deviation"] <= 1e-3
    assert out["asr_flip"]["abs_deviation"] == 0.0
    assert out["asr_targeted"]["abs_deviation"] == 0.0
    # the pipelines agree pixel-for-pixel to f32 noise
    assert out["cross_pipeline"]["max_abs_pixel_diff"] <= 1e-5
    assert out["cross_pipeline"]["max_radius_diff"] <= 1e-4
