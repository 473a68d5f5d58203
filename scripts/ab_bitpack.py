"""Paired A/B of the bit-packed binary mask fetch (ops/sliding_window).

Interleaves the real pipelined inference bench (bench.bench_inference —
ordered uploads + deferred fetch, bf16 upload) with the bit-pack
auto-detection forced OFF vs left ON.  Tunnel variance is +-40%: only
interleaved in-process pairs count.

Usage: python scripts/ab_bitpack.py [network] [rounds]
"""

import sys

sys.path.insert(0, ".")

import bench
from general_medical_image_segmentation_cnn_framework_tpu.ops import sliding_window


def main():
    network = sys.argv[1] if len(sys.argv) > 1 else "unet"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    real_detect = sliding_window._binary_channels

    def run(pack: bool) -> float:
        sliding_window._binary_channels = (
            real_detect if pack else (lambda *a, **k: False)
        )
        try:
            return bench.bench_inference(network=network)
        finally:
            sliding_window._binary_channels = real_detect

    # warm both compiled variants before timing
    run(False)
    run(True)
    for r in range(rounds):
        off = run(False)
        on = run(True)
        print(
            f"round {r}: pack_off={off:.1f}vols/min pack_on={on:.1f}vols/min "
            f"ratio={on / off:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
