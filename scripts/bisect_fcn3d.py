"""Localize fcn3d's in-context slowdown by timing forward PREFIXES.

r5 finding: every fcn3d layer times at 5-10 ms standalone (sum ~70 ms)
but the whole 64^3 eval forward is 830 ms — the cost lives in the
COMBINED graph (layout/copy cascades), not in any op. The s2d fold
didn't move the step (1002 vs 928 ms), so this bisects: time the jitted
prefix up to each stage; the increment attributes in-context cost.

Run: python scripts/bisect_fcn3d.py [--reps 3]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from flax import linen as nn

from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.fcn3d import (
    _BilinearDeconv,
    _ceil_pool,
)
from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import TorchConv

STAGES = [
    "conv1a_p60", "conv1b", "pool1",
    "conv2a_p15", "conv2b", "pool2",
    "conv3x3", "pool3",
    "conv4x3", "pool4",
    "conv5x3", "pool5",
    "fc6", "fc7", "head",
]


class FCNPrefix(nn.Module):
    stop: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k=3, p=1: TorchConv(
            features=f, kernel_size=k, padding=p, dtype=self.dtype,
            init_type="normal",
        )
        relu = nn.relu
        s = 0

        def done(h):
            return s >= self.stop

        h = relu(conv(8, 3, 60)(x)); s = 1
        if done(h): return h
        h = relu(conv(8)(h)); s = 2
        if done(h): return h
        h = _ceil_pool(h); s = 3
        if done(h): return h
        h = relu(conv(16, 3, 15)(h)); s = 4
        if done(h): return h
        h = relu(conv(16)(h)); s = 5
        if done(h): return h
        h = _ceil_pool(h); s = 6
        if done(h): return h
        for _ in range(3):
            h = relu(conv(32)(h))
        s = 7
        if done(h): return h
        h = _ceil_pool(h); pool3 = h; s = 8
        if done(h): return h
        for _ in range(3):
            h = relu(conv(64)(h))
        s = 9
        if done(h): return h
        h = _ceil_pool(h); pool4 = h; s = 10
        if done(h): return h
        for _ in range(3):
            h = relu(conv(64)(h))
        s = 11
        if done(h): return h
        h = _ceil_pool(h); s = 12
        if done(h): return h
        h = relu(conv(512, 7, 0)(h)); s = 13
        if done(h): return h
        h = relu(conv(512, 1, 0)(h)); s = 14
        if done(h): return h
        h = conv(1, 1, 0)(h)
        upscore2 = _BilinearDeconv(1, 4, 2, self.dtype)(h)
        g = conv(1, 1, 0)(pool4 * 0.01)
        g = g[:, 5 : 5 + upscore2.shape[1], 5 : 5 + upscore2.shape[2], 5 : 5 + upscore2.shape[3]]
        up4 = _BilinearDeconv(1, 4, 2, self.dtype)(upscore2 + g)
        g = conv(1, 1, 0)(pool3 * 0.0001)
        g = g[:, 9 : 9 + up4.shape[1], 9 : 9 + up4.shape[2], 9 : 9 + up4.shape[3]]
        h = _BilinearDeconv(1, 16, 8, self.dtype)(up4 + g)
        h = h[:, 31 : 31 + x.shape[1], 31 : 31 + x.shape[2], 31 : 31 + x.shape[3]]
        return h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--start", type=int, default=1)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 64, 1), jnp.bfloat16)
    prev = 0.0
    for stop in range(args.start, len(STAGES) + 1):
        m = FCNPrefix(stop=stop)
        v = jax.jit(m.init)(rng, x)
        fn = jax.jit(lambda v, x, m=m: m.apply(v, x))
        out = fn(v, x)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(v, x)
        float(jnp.sum(out.astype(jnp.float32)))
        t = (time.perf_counter() - t0) / args.reps * 1e3
        print(
            f"prefix {stop:2d} ({STAGES[stop - 1]:10s}): {t:8.1f} ms "
            f"(+{t - prev:7.1f})",
            flush=True,
        )
        prev = t

    # suspicion probes: the same graph with (a) float32 compute,
    # (b) stride-2 max_pool WITHOUT the ceil-mode -inf pad
    m = FCNPrefix(stop=len(STAGES), dtype=jnp.float32)
    v = jax.jit(m.init)(rng, x.astype(jnp.float32))
    fn = jax.jit(lambda v, x, m=m: m.apply(v, x))
    out = fn(v, x.astype(jnp.float32))
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(v, x.astype(jnp.float32))
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"full fwd f32: {(time.perf_counter() - t0) / args.reps * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
