#!/usr/bin/env python
"""CLI shim preserving the reference surface:
``python train.py config=<model> config.KEY=VALUE`` (README.md:37-51)."""

from general_medical_image_segmentation_cnn_framework_tpu.train import main

if __name__ == "__main__":
    main()
