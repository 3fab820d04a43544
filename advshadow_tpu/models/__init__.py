from advshadow_tpu.models.cspdarkunet import CSPDarkUnet
from advshadow_tpu.models.sr import SRv1
from advshadow_tpu.models.unet_cond import UNet
from advshadow_tpu.models.unet_ddpm import UNetModel

#: Network registry — the working equivalent of the reference's missing
#: ``config.choices`` network list (ref: utils/initializer.py:88-96).
NETWORKS = {
    "unet": UNet,
    "cspdarkunet": CSPDarkUnet,
    "unet_ddpm": UNetModel,
}

SR_NETWORKS = {
    "srv1": SRv1,
}


def make_network(name: str, **kwargs):
    """Build a denoiser by name, dropping kwargs the class doesn't take
    (the families have different config surfaces: the conditional UNets
    take ``channel``/``act``; UNetModel takes ``model_channels``/
    ``channel_mult``/... and hardcodes SiLU like the reference)."""
    try:
        cls = NETWORKS[name]
    except KeyError:
        raise ValueError(f"unknown network {name!r}; choices: {sorted(NETWORKS)}")
    import dataclasses

    valid = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in kwargs.items() if k in valid})


__all__ = ["UNet", "CSPDarkUnet", "UNetModel", "SRv1", "NETWORKS",
           "SR_NETWORKS", "make_network"]
