"""Single model registry: ``config.network`` string -> model factory.

Replaces the reference's duplicated-and-drifted if/elif chains
(/root/reference/train.py:324-373 vs predict.py:233-276 — vtnet trainable
but not predictable there; highresnet/fusionnet/fcn3d orphaned). One
registry serves both drivers, and every library-level model is reachable.
"""

from __future__ import annotations

from typing import Callable, Dict

from flax import linen as nn

_REGISTRY: Dict[str, Callable] = {}

# 2-D networks operate on [B, H, W, C] slices; the drivers adapt 3-D
# [B, 1, H, W, C] patches by squeezing/re-expanding the depth axis
# (capability the reference has only at library level, SURVEY §2.4).
TWO_D_NETWORKS = {
    "unet2d", "unetpp", "segnet", "fcn2d", "deeplab", "pspnet",
    "miniseg", "highres2dnet",
}


def is_2d(network: str) -> bool:
    return network in TWO_D_NETWORKS


# Total spatial downsampling factor per 3-D network: whole-volume
# inference pads each spatial dim to this multiple so every pool/merge
# divides cleanly (and the decoder's upsamples line back up with skips).
_PAD_MULTIPLE: Dict[str, int] = {
    "vtnet": 32,  # k4s4 embed x 3 PatchMergings (H/W); windows self-pad
    "unetr": 16,  # k16s16 patch embed
    "highresnet": 1,  # fully dilated, no downsampling
}


def pad_multiple(network: str) -> int:
    """Spatial-dim multiple required for a clean whole-volume forward
    (default 16 = four stride-2 stages, the U-Net family)."""
    return _PAD_MULTIPLE.get(network, 16)


def register(name: str):
    def deco(factory: Callable):
        _REGISTRY[name] = factory
        return factory

    return deco


def build_model(config) -> nn.Module:
    name = config.network
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown network '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](config)


def available_models():
    return sorted(_REGISTRY)


def _populate() -> None:
    """Import model modules lazily to keep `import <pkg>` light."""
    from .three_d.unet3d import UNet3D

    _REGISTRY.setdefault("unet", UNet3D.from_config)

    # Widened zoo — registered as modules land. Import errors surface only
    # when the model is requested.
    for name, path, cls in [
        ("res_unet", ".three_d.residual_unet3d", "ResidualUNet3D"),
        ("vnet", ".three_d.vnet3d", "VNet"),
        ("densevoxelnet", ".three_d.densevoxelnet3d", "DenseVoxelNet"),
        ("densenet", ".three_d.densenet3d", "SkipDenseNet3D"),
        ("highresnet", ".three_d.highresnet", "HighRes3DNet"),
        ("csrnet", ".three_d.csrnet", "CSRNet"),
        ("er_net", ".three_d.er_net", "ERNet"),
        ("re_net", ".three_d.re_net", "RENet"),
        ("IS", ".three_d.is_net", "ISNet"),
        ("dunet", ".three_d.double_unet", "DoubleUNet"),
        ("unetr", ".three_d.unetr", "UNETR"),
        ("vtnet", ".three_d.vtnet", "VTUNet"),
        ("fusionnet", ".three_d.fusionnet", "FusionNet"),
        ("fcn3d", ".three_d.fcn3d", "FCN3D"),
        ("unet2d", ".two_d.unet2d", "UNet2D"),
        ("unetpp", ".two_d.unetpp", "UNetPlusPlus"),
        ("segnet", ".two_d.segnet", "SegNet"),
        ("fcn2d", ".two_d.fcn2d", "FCN32s"),
        ("deeplab", ".two_d.deeplab", "DeepLabV3"),
        ("pspnet", ".two_d.pspnet", "PSPNet"),
        ("miniseg", ".two_d.miniseg", "MiniSeg"),
        ("highres2dnet", ".two_d.highresnet2d", "HighRes2DNet"),
    ]:
        if name in _REGISTRY:
            continue

        def make(path=path, cls=cls):
            def factory(config):
                import importlib

                mod = importlib.import_module(path, package=__package__)
                return getattr(mod, cls).from_config(config)

            return factory

        _REGISTRY[name] = make()


_populate()
