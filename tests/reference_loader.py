"""Import the PyTorch reference (read-only, /root/reference) for golden
numeric-parity tests.  Missing heavyweight deps (torchvision, fastai,
coloredlogs, matplotlib, ...) are stubbed — the parity tests only touch
pure-math code paths (schedules, diffusion coefficients, embeddings)."""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Returns (diff_model, base_diffusion_module) or raises ImportError."""
    import torch  # noqa: F401 — hard requirement

    # stub torchvision surface used at diff_model import time
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models")
    tv.datasets = _stub("torchvision.datasets")
    tv.transforms = _stub("torchvision.transforms")
    tv.utils = _stub("torchvision.utils", save_image=lambda *a, **k: None)
    _stub("coloredlogs", install=lambda **k: None)
    _stub("matplotlib", use=lambda *a: None)
    _stub("matplotlib.pyplot")
    _stub("requests")

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import diff_model  # noqa: E402
    from model.samples import base as samples_base  # noqa: E402

    return diff_model, samples_base
