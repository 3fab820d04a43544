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
    try:
        cls = NETWORKS[name]
    except KeyError:
        raise ValueError(f"unknown network {name!r}; choices: {sorted(NETWORKS)}")
    return cls(**kwargs)


__all__ = ["UNet", "CSPDarkUnet", "UNetModel", "SRv1", "NETWORKS",
           "SR_NETWORKS", "make_network"]
