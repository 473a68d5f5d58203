"""HighRes2DNet: the 2-D instantiation of the shared HighResNet family.

The reference's ``models/two_d/highresnet.py`` is dead code (broken
package-relative imports, SURVEY §2.8); the architecture itself is the
same dimension-generic HighResNet as 3-D (:13-143). Our implementation is
rank-generic, so the 2-D variant is one subclass.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..three_d.highresnet import HighResNet


class HighRes2DNet(HighResNet):
    dimensions: int = 2

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            out_channels=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
