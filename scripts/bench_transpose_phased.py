"""Paired A/B of the phased transposed conv inside full train steps.

Times the densenet (SkipDenseNet3D) train step with the new
conv_transpose_phased routing vs the old lhs_dilation route — see
scripts/ab_harness.py for the paired-measurement methodology.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax

import general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d as c3
from ab_harness import run_ab

PHASED = c3.conv_transpose_phased


def dilated(x, kernel, stride):
    n_sp = x.ndim - 2
    k = kernel.shape[:n_sp]
    spatial = "DHW"[3 - n_sp:]
    dn = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1,) * n_sp,
        [(ki - 1, ki - 1) for ki in k], lhs_dilation=tuple(stride),
        dimension_numbers=dn,
    )


if __name__ == "__main__":
    run_ab(
        "conv_transpose_phased",
        {"phased": PHASED, "dilated": dilated},
        default_network="densenet",
    )
