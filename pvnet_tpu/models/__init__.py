"""Flax model zoo: fully-convolutional ResNet-8s segmentation + vector-field
networks (the reference's model_repository.py family)."""

from pvnet_tpu.models.pvnet import PVNet, pvnet_resnet18, pvnet_resnet34, pvnet_resnet50  # noqa: F401
from pvnet_tpu.models.resnet import ResNetBackbone  # noqa: F401
from pvnet_tpu.models.vgg import VGG16Convs, vgg16_convs  # noqa: F401
