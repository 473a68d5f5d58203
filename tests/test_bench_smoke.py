"""bench.py smoke: the inference benchmark runs on CPU with tiny sizes."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_bench_inference_smoke():
    import bench

    vols_per_min = bench.bench_inference(
        n_volumes=1, vol_shape=(32, 32, 32), patch=16, batch_size=4
    )
    assert vols_per_min > 0
