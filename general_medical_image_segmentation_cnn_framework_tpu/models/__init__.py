"""Model zoo (Flax linen, NDHWC/NHWC channels-last).

3-D: unet, res_unet, vnet, densevoxelnet, densenet, highresnet, csrnet,
er_net, re_net, IS, dunet, unetr, vtnet (+ fusionnet, fcn3d).
2-D: unet2d, unetpp, segnet, fcn2d, deeplab, pspnet, miniseg, highres2dnet.

All models share the call convention ``model(x, train: bool)`` with
``x: [B, *spatial, C]`` returning float32 logits ``[B, *spatial, out]``.
"""

from .registry import available_models, build_model, register

__all__ = ["available_models", "build_model", "register"]
