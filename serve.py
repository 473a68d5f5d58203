#!/usr/bin/env python
"""Resident serving CLI (capability extension — the reference has no
serving story): watch a directory, predict volumes as they arrive.

``python serve.py config=<model> config.ckpt=<path> config.watch_dir=<dir>``
(add ``config.serve_once=true`` for batch/cron mode)."""

from general_medical_image_segmentation_cnn_framework_tpu.serving import main

if __name__ == "__main__":
    main()
