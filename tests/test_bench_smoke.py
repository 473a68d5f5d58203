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


import pytest


@pytest.mark.quick
def test_run_ab_script_captures_and_bounds():
    """The extras runner returns stdout on rc=0, '' on failure, and ''
    (not an exception) on timeout — a hung experiment must cost itself,
    not the driver's bench."""
    import bench

    out = bench._run_ab_script(["-c", "print('hello 1.5ms')"], timeout=60)
    assert "hello" in out
    assert bench._run_ab_script(["-c", "raise SystemExit(3)"], timeout=60) == ""
    assert (
        bench._run_ab_script(
            ["-c", "import time; time.sleep(30)"], timeout=2
        )
        == ""
    )


@pytest.mark.quick
def test_parse_medians():
    import bench

    out = (
        "densenet 64^3 phased rep0: 400.0 ms/step\n"
        "densenet 64^3 dilated rep0: 550.0 ms/step\n"
        "densenet 64^3 phased rep1: 420.0 ms/step\n"
    )
    med = bench._parse_medians(
        out, r"(?:\w+) (?:\d+)\^3 (\w+) rep\d+: ([\d.]+) ms/step", 1, 2
    )
    assert med == {"phased": 410.0, "dilated": 550.0}
