#!/usr/bin/env python
"""CLI shim preserving the reference surface:
``python predict.py config=<model> config.ckpt=<abs path>`` (README.md:71-73)."""

from general_medical_image_segmentation_cnn_framework_tpu.predict import main

if __name__ == "__main__":
    main()
