"""Weight-init dispatch matching the reference's ``weights_init_normal``
(/root/reference/train.py:33-61, selected by ``config.init_type``).

The reference applies, with gain 0.02, one of
normal / xavier / xavier_uniform / kaiming / orthogonal / none to every
Conv/Linear weight (bias -> 0). BatchNorm keeps its default init (the
reference's classname check matches only "BatchNorm2d", so 3-D BN is left
at weight=1, bias=0 — we reproduce that by leaving norm init at scale=1).
"""

from __future__ import annotations

from jax.nn import initializers as ji

_GAIN = 0.02


def kernel_initializer(init_type: str):
    """Return a Flax kernel initializer equivalent to the reference's
    torch init for Conv/Linear weights."""
    if init_type == "normal":
        return ji.normal(stddev=_GAIN)
    if init_type == "xavier":
        # torch xavier_normal_(gain): std = gain * sqrt(2/(fan_in+fan_out))
        return ji.variance_scaling(_GAIN**2, "fan_avg", "normal")
    if init_type == "xavier_uniform":
        # torch xavier_uniform_(gain=1.0)
        return ji.variance_scaling(1.0, "fan_avg", "uniform")
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2/fan_in)
        return ji.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return ji.orthogonal(scale=_GAIN)
    if init_type == "none":
        # torch default Conv init: kaiming_uniform_(a=sqrt(5)) ==
        # U(-b, b) with b = sqrt(6 / ((1 + 5) * fan_in)) -> scale 1/3 fan_in
        return ji.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


def bias_initializer(init_type: str):
    """Biases are zeroed for every init type (reference train.py:59-60)."""
    del init_type
    return ji.zeros
