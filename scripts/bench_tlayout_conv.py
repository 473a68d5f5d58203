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
    # Cin=1 stem (r2: 5-6 ms at 128^3 from channels-last 128x lane
    # padding) — rides the cinpad wrapper (zero-pad Cin to 32: 32x input
    # bytes of a SMALL tensor instead of 128x, same proven kernel shapes)
    ("stem_128_1to32", 128, 1, 32),
]


def probe_compile(timeout=900):
    """Compile + run the kernel once in a SUBPROCESS with a timeout: a
    Mosaic reject/hang is a *possible outcome* (r1 precedent: roll-based
    shift variants hung the remote compile) and must not eat the whole
    hw session. Returns (ok, diagnosis)."""
    import subprocess

    code = (
        "import sys; sys.path.insert(0, '.');\n"
        "import jax, jax.numpy as jnp, numpy as np\n"
        "from general_medical_image_segmentation_cnn_framework_tpu.ops import pallas_tlayout as p\n"
        "r = np.random.default_rng(0)\n"
        "for w, cin in ((128, 32), (64, 64)):  # plain + lane-folded\n"
        "    x = jnp.asarray(r.normal(size=(1, 4, 8, w, cin)), jnp.bfloat16)\n"
        "    k = jnp.asarray(r.normal(size=(3, 3, 3, cin, 8)), jnp.bfloat16)\n"
        "    y = p.conv3d_tlayout(p.to_tlayout(x), k)\n"
        "    print('probe ok', w, float(jnp.sum(y.astype(jnp.float32))), flush=True)\n"
        "x_t = p.to_tlayout(jnp.asarray(r.normal(size=(1, 4, 8, 128, 32)), jnp.bfloat16))\n"
        "g_t = p.to_tlayout(jnp.asarray(r.normal(size=(1, 4, 8, 128, 8)), jnp.bfloat16))\n"
        "dw = p.wgrad_tapcols_tlayout(x_t, g_t)\n"
        "print('probe ok wgrad', float(jnp.sum(dw)), flush=True)\n"
        "k8 = jnp.asarray(r.normal(size=(3, 3, 3, 32, 8)), jnp.bfloat16)\n"
        "y2 = p.conv3d_tlayout_fused(x_t, k8)\n"
        "print('probe ok v2', float(jnp.sum(y2.astype(jnp.float32))), flush=True)\n"
        "xf = p.to_tlayout(jnp.asarray(r.normal(size=(1, 4, 8, 64, 32)), jnp.bfloat16))\n"
        "y3 = p.conv3d_tlayout_fused(xf, k8)\n"
        "print('probe ok v2fold', float(jnp.sum(y3.astype(jnp.float32))), flush=True)\n"
        "b = jnp.asarray(r.normal(size=(8,)), jnp.float32)\n"
        "y4 = p.conv3d_tlayout_fused(x_t, k8, bias=b, relu=True)\n"
        "print('probe ok v2brelu', float(jnp.sum(y4.astype(jnp.float32))), flush=True)\n"
        "x2 = jnp.asarray(r.normal(size=(1, 8, 32, 128)), jnp.bfloat16)\n"
        "k2 = jnp.asarray(r.normal(size=(3, 3, 32, 8)), jnp.bfloat16)\n"
        "y5 = p.conv2d_plane_tlayout(x2, k2)\n"
        "print('probe ok 2d', float(jnp.sum(y5.astype(jnp.float32))), flush=True)\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired as e:
        return False, (
            f"MOSAIC COMPILE HANG (>{timeout}s). partial output:\n"
            f"{(e.stdout or b'').decode(errors='replace') if isinstance(e.stdout, bytes) else e.stdout}\n"
            f"{(e.stderr or b'').decode(errors='replace') if isinstance(e.stderr, bytes) else e.stderr}"
        )
    if r.returncode != 0:
        return False, f"MOSAIC REJECT rc={r.returncode}:\n{r.stderr[-3000:]}"
    return True, r.stdout.strip()


def bh_sweep(s=128, cin=32, cout=32, dtype=jnp.bfloat16):
    """Block-height knob for the flagship shape: fwd-only, explicit bh
    (the custom-VJP wrapper reads GMIST_TLAYOUT_BH at trace time, which
    jit caching would mask in-process)."""
    r = np.random.default_rng(0)
    x_t = pallas_tlayout.to_tlayout(jnp.asarray(r.normal(size=(1, s, s, s, cin)), dtype))
    k = jnp.asarray(r.normal(size=(3, 3, 3, cin, cout)) * 0.1, dtype)
    for bh in (2, 4, 8, 16, 32):
        fn = jax.jit(
            lambda x_t, k, bh=bh: pallas_tlayout._shift_add_depth(
                pallas_tlayout.conv2d_tapcols_tlayout(x_t, k, bh=bh), cout, x_t.dtype
            )
        )
        t = timed(fn, (x_t, k), n=5)
        print(f"bh_sweep {s}^3 {cin}->{cout} bh={bh}: {t * 1e3:.2f}ms", flush=True)


def timed(fn, args, n=10):
    """Amortized sync: dispatch n calls back-to-back and hard-sync ONCE.

    The per-call variant (sync inside the loop) adds the tunnel's full
    round-trip latency (~25-30 ms measured, r5) to EVERY rep — at layer
    scale that swamps the op itself and compresses every ratio toward
    1x. Only the paired DIFFERENCES from such runs are meaningful; this
    version measures the ops themselves."""

    def _sync(o):
        return float(jnp.sum(o[0] if isinstance(o, tuple) else o))

    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


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
                    pallas_tlayout.conv3d_tlayout_cinpad(pallas_tlayout.to_tlayout(x), k)
                )
            ),
            (x, k),
        ),
        "tl": (jax.jit(pallas_tlayout.conv3d_tlayout_cinpad), (x_t, k)),
    }
    v2_ok = pallas_tlayout.supported(cin, cout, s, dtype, d=s, allow_cinpad=True)
    if v2_ok:  # v2 fused (in-VMEM depth accumulation; folded for W<128)
        fwd["tl2"] = (jax.jit(pallas_tlayout.conv3d_tlayout_fused_cinpad), (x_t, k))

    def g_xla(x, k):
        return jax.grad(lambda x, k: jnp.sum(conv3d_tapgrouped(x, k) * ct), (0, 1))(x, k)

    def g_tltr(x, k):
        def loss(x, k):
            y = pallas_tlayout.conv3d_tlayout_cinpad(pallas_tlayout.to_tlayout(x), k)
            return jnp.sum(pallas_tlayout.from_tlayout(y) * ct)

        return jax.grad(loss, (0, 1))(x, k)

    def g_tl(x_t, k):
        return jax.grad(
            lambda x_t, k: jnp.sum(pallas_tlayout.conv3d_tlayout_cinpad(x_t, k) * ct_t), (0, 1)
        )(x_t, k)

    fb = {
        "xla": (jax.jit(g_xla), (x, k)),
        "tl+tr": (jax.jit(g_tltr), (x, k)),
        "tl": (jax.jit(g_tl), (x_t, k)),
    }
    if v2_ok:
        # v2 dispatch is read from the env at TRACE time, which happens on
        # the wrapped fn's first call — set it around every invocation
        import os

        def g_tl2(x_t, k, _jit=jax.jit(lambda a, b: g_tl(a, b))):
            old = os.environ.get("GMIST_TLAYOUT_V2")
            os.environ["GMIST_TLAYOUT_V2"] = "1"
            try:
                return _jit(x_t, k)
            finally:
                if old is None:
                    os.environ.pop("GMIST_TLAYOUT_V2", None)
                else:
                    os.environ["GMIST_TLAYOUT_V2"] = old

        fb["tl2"] = (g_tl2, (x_t, k))
    return fwd, fb


ENV_VARIANTS = {
    "off": {},
    "v1": {"GMIST_TLAYOUT_CONV": "1"},
    "v2": {"GMIST_TLAYOUT_CONV": "1", "GMIST_TLAYOUT_V2": "1"},
    # v2 minus ConvBlock residency: isolates the in-block-layout win
    "v2nb": {
        "GMIST_TLAYOUT_CONV": "1", "GMIST_TLAYOUT_V2": "1",
        "GMIST_TLAYOUT_BLOCK": "0",
    },
    # v2 with the Pallas wgrad (all-Pallas bwd) — decides GMIST_TLAYOUT_WGRAD
    "v2w": {
        "GMIST_TLAYOUT_CONV": "1", "GMIST_TLAYOUT_V2": "1",
        "GMIST_TLAYOUT_WGRAD": "pallas",
    },
}
# eval path has no bwd/residency knobs: off / v1 / v2 only
INFER_VARIANTS = {k: ENV_VARIANTS[k] for k in ("off", "v1", "v2")}
_ENV_KEYS = (
    "GMIST_TLAYOUT_CONV", "GMIST_TLAYOUT_V2", "GMIST_TLAYOUT_BLOCK",
    "GMIST_TLAYOUT_WGRAD", "GMIST_TLAYOUT_CINPAD",
)


def step_ab(network, patch, n=8):
    """Full-train-step paired A/B: conv routing off / tlayout-v1 /
    tlayout-v2-fused (fresh jit per variant; the env flags are read at
    trace time inside TorchConv / conv3d_tlayout)."""
    import os

    import bench
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    res = {}
    for variant, env in ENV_VARIANTS.items():
        for key in _ENV_KEYS:
            os.environ.pop(key, None)
        os.environ.update(env)
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
    for key in _ENV_KEYS:
        os.environ.pop(key, None)
    print(
        f"{network}_{patch} step: "
        + " ".join(f"{v}={t:.1f}ms" for v, t in res.items())
        + f" (v1 {res['off'] / res['v1']:.2f}x, v2 {res['off'] / res['v2']:.2f}x)",
        flush=True,
    )


def infer_ab(network="unet", n=3):
    """Whole-volume eval A/B (256x256x128): off / v1 / v2 — v2's eval
    ConvBlocks run as single BN-folded Conv+BN+ReLU kernels. Fresh
    forward closure per variant, so the env flags retrace."""
    import os

    import bench

    res = {}
    for variant, env in INFER_VARIANTS.items():
        for key in _ENV_KEYS:
            os.environ.pop(key, None)
        os.environ.update(env)
        res[variant] = bench.bench_whole_volume(network, n_volumes=n)
    for key in _ENV_KEYS:
        os.environ.pop(key, None)
    print(
        f"{network}_whole_volume infer: "
        + " ".join(f"{v}={t:.1f}vols/min" for v, t in res.items())
        + f" (v1 {res['v1'] / res['off']:.2f}x, v2 {res['v2'] / res['off']:.2f}x)",
        flush=True,
    )


def slide_ab(network="unet", n=2):
    """Sliding-window predict A/B (the PRIMARY bench metric): off / v1 /
    v2 — eval ConvBlocks on the v2 path run as single BN-folded kernels
    inside the per-patch scan. Fresh closure per variant (env retrace)."""
    import os

    import bench

    res = {}
    for variant, env in INFER_VARIANTS.items():
        for key in _ENV_KEYS:
            os.environ.pop(key, None)
        os.environ.update(env)
        res[variant] = bench.bench_inference(network, n_volumes=n)
    for key in _ENV_KEYS:
        os.environ.pop(key, None)
    print(
        f"{network}_sliding_window infer: "
        + " ".join(f"{v}={t:.1f}vols/min" for v, t in res.items())
        + f" (v1 {res['v1'] / res['off']:.2f}x, v2 {res['v2'] / res['off']:.2f}x)",
        flush=True,
    )


def main():
    global SHAPES
    dtype = jnp.bfloat16
    if "--step-ab" in sys.argv:
        # bench.py extras mode: compile-probe the kernel in a subprocess
        # (a Mosaic hang must cost this probe, not the driver's bench),
        # then paired off/on full-train-step A/Bs on the two families the
        # r3 roofline says are conv-traffic-bound. Exit 0 either way; the
        # caller parses the "step:" lines and logs everything else.
        print(f"backend={jax.default_backend()}")
        ok, diag = probe_compile()
        print(f"compile probe: {diag}", flush=True)
        if ok:
            step_ab("unet", 128)
            step_ab("unetr", 128, n=5)
            infer_ab("unet")
            slide_ab("unet")
        return
    if "--smoke" in sys.argv:  # CPU structure check (interpret mode, tiny)
        jax.config.update("jax_platforms", "cpu")
        pallas_tlayout._INTERPRET = True
        dtype = jnp.float32
        SHAPES = [("smoke_8_32to32", 8, 32, 32)]
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}")
    if "--smoke" not in sys.argv:
        ok, diag = probe_compile()
        print(f"compile probe: {diag}", flush=True)
        if not ok:
            print(
                "kernel does not compile on this backend — record the error "
                "string above in BASELINE.md (VERDICT r3 #3 closure) and keep "
                "the XLA tap-grouped default.",
                flush=True,
            )
            return
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
        bh_sweep()
        # end-to-end: the flagship step and the UNETR decoder pyramid
        # (91.6% of its step is these conv shapes — r3 transformer profile)
        step_ab("unet", 128)
        step_ab("unetr", 128, n=5)
        infer_ab("unet")
        slide_ab("unet")


if __name__ == "__main__":
    main()
