"""hebbax model zoo — Flax modules, channels-last, HebbSpec-aware."""

from .registry import (available_networks, get_network, network_meta,
                       primary_logits)
from .unet2d import (UNet2D, UNetCCT2D, UNetSuperpix2D, UNetURPC2D,
                     UNetVAE2D)
from .unet3d import UNet3D, UNet3DCCT, UNet3DDTC, UNet3DSuperpix
from .urpc3d import UNet3DURPC
from .vnet import VNet, VNetDTC

__all__ = [
    "available_networks", "get_network", "network_meta", "primary_logits",
    "UNet2D", "UNetCCT2D", "UNetSuperpix2D", "UNetURPC2D", "UNetVAE2D",
    "UNet3D", "UNet3DCCT", "UNet3DDTC", "UNet3DSuperpix", "UNet3DURPC",
    "VNet", "VNetDTC",
]
