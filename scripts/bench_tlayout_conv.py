"""Hardware A/B: T-layout Pallas conv3d (K=9*Cin im2col) vs the XLA
tap-grouped conv at the UNet shallow-level shapes the r3 roofline showed
moving 2.9-7.6x minimal bytes (VERDICT r3 #3).

Three variants per shape, paired + interleaved in one process (tunnel
variance is +-40%; only paired comparisons are valid — CLAUDE.md):
  xla      — ops.conv3d.conv3d_tapgrouped (today's default path)
  tl+tr    — Pallas conv3d_tlayout INCLUDING the [..W,C]<->[..C,W]
             transposes (drop-in, per-conv cost)
  tl       — Pallas conv3d_tlayout on activations already in T-layout
             (the ConvBlock-amortized case: transpose once per block)

Run: python scripts/bench_tlayout_conv.py  (real TPU; first Mosaic
compile of the kernel may take minutes — a hang here IS a result, record
it in BASELINE.md).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from general_medical_image_segmentation_cnn_framework_tpu.ops import pallas_tlayout
from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
    conv3d_tapgrouped,
)

SHAPES = [
    # (name, D/H/W cube, cin, cout)  — enc1b / dec1a at 128^3; enc2b/dec2a
    # at 64^3 route through the depth-pair lane-folded variant (fold=2)
    ("enc1b_128_32to32", 128, 32, 32),
    ("dec1a_128_64to32", 128, 64, 32),
    ("enc2b_64_64to64", 64, 64, 64),
    ("dec2a_64_128to64", 64, 128, 64),
]


def timed(fn, args, n=10):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def make_variants(s, cin, cout, dtype):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(1, s, s, s, cin)), dtype)
    k = jnp.asarray(r.normal(size=(3, 3, 3, cin, cout)) * 0.1, dtype)
    x_t = pallas_tlayout.to_tlayout(x)
    ct = jnp.ones((1, s, s, s, cout), dtype)
    ct_t = pallas_tlayout.to_tlayout(ct)

    fwd = {
        "xla": (jax.jit(conv3d_tapgrouped), (x, k)),
        "tl+tr": (
            jax.jit(
                lambda x, k: pallas_tlayout.from_tlayout(
                    pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
                )
            ),
            (x, k),
        ),
        "tl": (jax.jit(pallas_tlayout.conv3d_tlayout), (x_t, k)),
    }

    def g_xla(x, k):
        return jax.grad(lambda x, k: jnp.sum(conv3d_tapgrouped(x, k) * ct), (0, 1))(x, k)

    def g_tltr(x, k):
        def loss(x, k):
            y = pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
            return jnp.sum(pallas_tlayout.from_tlayout(y) * ct)

        return jax.grad(loss, (0, 1))(x, k)

    def g_tl(x_t, k):
        return jax.grad(
            lambda x_t, k: jnp.sum(pallas_tlayout.conv3d_tlayout(x_t, k) * ct_t), (0, 1)
        )(x_t, k)

    fb = {
        "xla": (jax.jit(g_xla), (x, k)),
        "tl+tr": (jax.jit(g_tltr), (x, k)),
        "tl": (jax.jit(g_tl), (x_t, k)),
    }
    return fwd, fb


def step_ab(network, patch, n=8):
    """Full-train-step paired A/B: GMIST_TLAYOUT_CONV off vs on (fresh jit
    per variant; the env flag is read at trace time inside TorchConv)."""
    import os

    import bench
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    res = {}
    for variant in ("off", "on"):
        os.environ.pop("GMIST_TLAYOUT_CONV", None)
        if variant == "on":
            os.environ["GMIST_TLAYOUT_CONV"] = "1"
        config = bench._config(network, patch)
        model = build_model(config)
        rng = jax.random.PRNGKey(0)
        params, stats, opt, tx = init_train_state(config, model, rng)
        raw = make_train_step(config, model, tx)
        step = jax.jit(lambda p, s, o, x, y, r: raw(p, s, o, x, y, r))
        x = jax.random.normal(rng, (1, patch, patch, patch, 1), jnp.float32)
        y = (jax.random.uniform(rng, (1, patch, patch, patch, 1)) > 0.5).astype(
            jnp.float32
        )
        params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(n):
            params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
        _ = float(loss)
        res[variant] = (time.perf_counter() - t0) / n * 1e3
    os.environ.pop("GMIST_TLAYOUT_CONV", None)
    print(
        f"{network}_{patch} step: off={res['off']:.1f}ms on={res['on']:.1f}ms "
        f"({res['off'] / res['on']:.2f}x)",
        flush=True,
    )


def main():
    global SHAPES
    dtype = jnp.bfloat16
    if "--smoke" in sys.argv:  # CPU structure check (interpret mode, tiny)
        jax.config.update("jax_platforms", "cpu")
        pallas_tlayout._INTERPRET = True
        dtype = jnp.float32
        SHAPES = [("smoke_8_32to32", 8, 32, 32)]
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}")
    for name, s, cin, cout in SHAPES:
        fwd, fb = make_variants(s, cin, cout, dtype)
        for tag, table in (("fwd", fwd), ("fwd+bwd", fb)):
            res = {}
            # interleave: one warm+timed pass per variant, repeated pairs
            for variant, (fn, args) in table.items():
                res[variant] = timed(fn, args, n=8) * 1e3
            base = res["xla"]
            line = " ".join(f"{v}={t:.2f}ms({base / t:.2f}x)" for v, t in res.items())
            print(f"{name} {tag}: {line}", flush=True)

    if "--smoke" in sys.argv:
        step_ab("unet", 16, n=1)  # structure check (W=16 -> both paths XLA)
    else:
        # end-to-end: the flagship step and the UNETR decoder pyramid
        # (91.6% of its step is these conv shapes — r3 transformer profile)
        step_ab("unet", 128)
        step_ab("unetr", 128, n=5)


if __name__ == "__main__":
    main()
