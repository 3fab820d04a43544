from advshadow_tpu.victims.labels import (
    OXFORD_PET_CLASSES,
    label_to_int,
    load_id2label,
    true_label_from_filename,
)
from advshadow_tpu.victims.convnext import ConvNeXt, convnext_base, convnext_tiny
from advshadow_tpu.victims.efficientnet import EfficientNetV2, efficientnetv2_s
from advshadow_tpu.victims.inception import InceptionV3, inception_v3
from advshadow_tpu.victims.port import port_resnet, port_vgg
from advshadow_tpu.victims.store import (
    PORTERS,
    load_torch_state_dict,
    load_variables,
    port_state_dict,
    save_variables,
)
from advshadow_tpu.victims.swin import SwinTransformer, swin_base, swin_tiny
from advshadow_tpu.victims.resnet import ResNet, resnet18, resnet34, resnet50
from advshadow_tpu.victims.vgg import VGG, vgg16, vgg19
from advshadow_tpu.victims.vit import ViT, vit_b16, vit_s16
from advshadow_tpu.victims.zoo import (
    VICTIMS,
    imagenet_normalize,
    make_victim_fn,
    make_victim_model,
)

__all__ = [
    "OXFORD_PET_CLASSES",
    "label_to_int",
    "load_id2label",
    "true_label_from_filename",
    "ConvNeXt", "convnext_base", "convnext_tiny",
    "EfficientNetV2", "efficientnetv2_s",
    "InceptionV3", "inception_v3",
    "SwinTransformer", "swin_base", "swin_tiny",
    "port_resnet",
    "port_vgg",
    "PORTERS",
    "load_torch_state_dict",
    "load_variables",
    "port_state_dict",
    "save_variables",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "VGG",
    "vgg16",
    "vgg19",
    "ViT",
    "vit_b16",
    "vit_s16",
    "VICTIMS",
    "imagenet_normalize",
    "make_victim_fn",
    "make_victim_model",
]
