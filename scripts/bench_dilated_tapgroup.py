"""Paired A/B of the dilated tap-grouped conv inside full train steps.

Times the highresnet train step (its dilation-2/4 stages are the only
dilated convs in the zoo) with the new dilated-eligible routing vs the
old native-conv3d fallback — see scripts/ab_harness.py for the
paired-measurement methodology.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d as c3
from ab_harness import run_ab

ELIGIBLE = c3.eligible


def eligible_no_dilation(kernel_size, stride, dilation, groups):
    if tuple(dilation) != (1, 1, 1):
        return False
    return ELIGIBLE(kernel_size, stride, dilation, groups)


if __name__ == "__main__":
    run_ab(
        "eligible",
        {"dilated-tapgroup": ELIGIBLE, "native": eligible_no_dilation},
        default_network="highresnet",
    )
