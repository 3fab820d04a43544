from advshadow_tpu.attack.optimize import (
    DIFF2_CONFIG,
    EVAL_CONFIG,
    TRAIN_CONFIG,
    ShadowOptConfig,
    ShadowOptResult,
    batched_optimize_shadow,
    clamp_shadow_params,
    optimize_shadow_position,
)
from advshadow_tpu.attack.perturb import (
    bim_attack,
    cross_entropy,
    fgsm_perturbation,
    integrated_gradients_attack,
    iterative_gradient_attack,
    pgd_attack,
)
from advshadow_tpu.attack.shadow import (
    apply_shadow,
    composite_shadow,
    create_shadow_mask,
    mask_centroid,
    soften_mask,
)

__all__ = [
    "DIFF2_CONFIG",
    "EVAL_CONFIG",
    "TRAIN_CONFIG",
    "ShadowOptConfig",
    "ShadowOptResult",
    "batched_optimize_shadow",
    "clamp_shadow_params",
    "optimize_shadow_position",
    "bim_attack",
    "cross_entropy",
    "fgsm_perturbation",
    "integrated_gradients_attack",
    "iterative_gradient_attack",
    "pgd_attack",
    "apply_shadow",
    "composite_shadow",
    "create_shadow_mask",
    "mask_centroid",
    "soften_mask",
]
