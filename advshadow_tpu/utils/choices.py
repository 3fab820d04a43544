"""Choice lists for CLI flags.

The reference imports these from a ``config.choices`` module that does
not exist in the snapshot (broken imports at ref: tools/train.py:25-26,
tools/train_shadow.py:31-32).  The values are recovered from the
initializer registries (ref: utils/initializer.py:88-96 networks,
:145-153 optimizers, :158-175 samplers, :189-196 lr functions;
model/modules/activation.py:23-33 activations; tools/train.py:360
image formats) — this module supplies the working equivalent.
"""

from __future__ import annotations

bool_choices = [True, False]
sample_choices = ["ddpm", "ddim", "plms", "dpmpp", "dpmpp_sde"]
network_choices = ["unet", "cspdarkunet", "unet_ddpm"]
sr_network_choices = ["srv1"]
optim_choices = ["adam", "adamw", "sgd"]
loss_choices = ["mse", "l1", "huber", "smooth_l1"]
act_choices = ["gelu", "silu", "relu", "relu6", "lrelu"]
lr_func_choices = ["linear", "cosine", "warmup_cosine"]
image_format_choices = ["png", "jpg"]
noise_schedule_choices = ["linear", "cosine", "framework_linear",
                          "framework_cosine", "sqrt_linear", "sqrt"]
parallel_choices = ["dp"]  # tp/pp hooks exist on the mesh; dp is wired


def str2bool(v) -> bool:
    """argparse ``type=`` for boolean flags.

    The reference uses ``type=bool`` throughout (ref: tools/train.py:305,
    332, 369, ...), where any non-empty string — including ``"False"`` and
    ``"0"`` — parses as True.  This keeps the same flag surface
    (``--vis ""`` disables, ``--resume 1`` enables) but makes the obvious
    spellings ``False``/``0``/``no`` actually mean False.
    """
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() not in ("", "0", "false", "no", "none", "f", "n")


__all__ = [
    "bool_choices", "sample_choices", "network_choices",
    "sr_network_choices", "optim_choices", "loss_choices", "act_choices",
    "lr_func_choices", "image_format_choices", "noise_schedule_choices",
    "parallel_choices", "str2bool",
]
