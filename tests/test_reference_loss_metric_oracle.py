"""Direct-oracle parity for losses and metrics against the reference's OWN
``utils/loss_function.py`` and ``utils/metric.py`` (VERDICT r3 #4).

``tests/test_losses_metrics.py`` checks our formulas against hand-derived
values; these tests instead execute the reference's torch/numpy code itself
(loaded by file path from the read-only snapshot) and assert agreement, so a
misread smooth constant or reduction cannot pass.

Covered:
* cross_entropy_3D (loss_function.py:8-16), weighted + size_average variants
* Binary_Loss == nn.BCEWithLogitsLoss (loss_function.py:19-41)
* BinaryDiceLoss smooth=1 p=2, all reductions (loss_function.py:61-99)
* DiceLoss sigmoid-global eps 1e-5 (loss_function.py:102-130)
* DiceLossss per-class one-hot dice, softmax/weight variants
  (loss_function.py:148-185)
* metric() spacing=None -> (jaccard, dice) (metric.py:20-75)
* metric() spacing path -> precision/recall/jaccard/dice with the monai
  import stubbed (monai isn't installed here; HD95 itself gets a real
  cross-check below whenever monai IS available)
* hausdorff_95 vs monai.metrics.compute_hausdorff_distance(percentile=95)
  — importorskip-gated (reference metric.py:6,29-32)
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
pytestmark = [
    pytest.mark.quick,
    pytest.mark.skipif(not REF.exists(), reason="reference snapshot not available"),
]

import jax.numpy as jnp  # noqa: E402

from general_medical_image_segmentation_cnn_framework_tpu import losses, metrics  # noqa: E402


def _load_ref(fname, modname, stubs=()):
    """Load a reference utils/ module by FILE PATH (the snapshot has no
    __init__.py and a bare 'utils' namespace package would collide with
    other sys.path entries). ``stubs`` pre-populates sys.modules so
    modules with uninstalled imports (torchio, monai) still load."""
    for name in stubs:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    spec = importlib.util.spec_from_file_location(modname, REF / "utils" / fname)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_loss():
    return _load_ref("loss_function.py", "_ref_loss_function")


@pytest.fixture(scope="module")
def ref_metric():
    stub = types.ModuleType("monai.metrics")

    def _not_wired(*a, **k):  # only the spacing path calls it; stubbed per-test
        raise AssertionError("compute_hausdorff_distance stub not configured")

    stub.compute_hausdorff_distance = _not_wired
    stub.__stub__ = True  # lets test_hd95_monai_crosscheck tell us apart
    monai = types.ModuleType("monai")
    monai.metrics = stub
    monai.__stub__ = True
    sys.modules.setdefault("torchio", types.ModuleType("torchio"))
    sys.modules["monai"] = monai
    sys.modules["monai.metrics"] = stub
    return _load_ref("metric.py", "_ref_metric")


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_cross_entropy_3d_oracle(ref_loss):
    r = _rng(1)
    logits = r.normal(size=(2, 3, 4, 5, 6)).astype(np.float32)  # [n,c,h,w,s]
    target = r.integers(0, 3, size=(2, 4, 5, 6))
    for weight in (None, np.array([0.2, 1.0, 3.0], np.float32)):
        for size_average in (True, False):
            want = ref_loss.cross_entropy_3D(
                torch.from_numpy(logits),
                torch.from_numpy(target),
                weight=None if weight is None else torch.from_numpy(weight),
                size_average=size_average,
            ).item()
            got = float(
                losses.cross_entropy(
                    jnp.asarray(np.moveaxis(logits, 1, -1)),
                    jnp.asarray(target),
                    weight=None if weight is None else jnp.asarray(weight),
                    size_average=size_average,
                )
            )
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_binary_loss_oracle(ref_loss):
    r = _rng(2)
    logits = (3 * r.normal(size=(2, 2, 8, 7, 6))).astype(np.float32)
    target = (r.uniform(size=(2, 2, 8, 7, 6)) > 0.5).astype(np.float32)
    want = ref_loss.Binary_Loss()(
        torch.from_numpy(logits), torch.from_numpy(target)
    ).item()
    got = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_binary_dice_loss_oracle(ref_loss):
    r = _rng(3)
    pred = r.uniform(size=(3, 8, 7, 6)).astype(np.float32)
    tgt = (r.uniform(size=(3, 8, 7, 6)) > 0.5).astype(np.float32)
    for reduction in ("mean", "sum", "none"):
        ref = ref_loss.BinaryDiceLoss(reduction=reduction)(
            torch.from_numpy(pred), torch.from_numpy(tgt)
        )
        got = losses.binary_dice_loss(
            jnp.asarray(pred), jnp.asarray(tgt), reduction=reduction
        )
        np.testing.assert_allclose(
            np.asarray(got), ref.detach().numpy(), rtol=1e-6, atol=1e-6
        )


def test_dice_loss_oracle(ref_loss):
    r = _rng(4)
    logits = (2 * r.normal(size=(2, 1, 9, 8, 7))).astype(np.float32)
    tgt = (r.uniform(size=(2, 1, 9, 8, 7)) > 0.6).astype(np.float32)
    want = ref_loss.DiceLoss()(torch.from_numpy(logits), torch.from_numpy(tgt)).item()
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_dicelossss_oracle(ref_loss):
    r = _rng(5)
    n_classes = 3
    inputs = r.normal(size=(2, n_classes, 6, 5, 4)).astype(np.float32)
    target = r.integers(0, n_classes, size=(2, 6, 5, 4)).astype(np.float32)
    for softmax in (False, True):
        for weight in (None, [0.5, 1.0, 2.0]):
            want = ref_loss.DiceLossss(n_classes)(
                torch.from_numpy(inputs),
                torch.from_numpy(target),
                weight=weight,
                softmax=softmax,
            ).item()
            got = float(
                losses.multiclass_dice_loss(
                    jnp.asarray(np.moveaxis(inputs, 1, -1)),
                    jnp.asarray(target.astype(np.int32)),
                    n_classes,
                    weight=weight,
                    softmax=softmax,
                )
            )
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def _blob_pair(seed, shape=(20, 21, 22)):
    """Two overlapping-but-different binary masks (balls with offset)."""
    r = _rng(seed)
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"))
    c = np.array([s / 2 for s in shape])
    gt = (np.sqrt(((g - c[:, None, None, None]) ** 2).sum(0)) < 6).astype(np.int64)
    off = c + r.uniform(-3, 3, 3)
    pred = (np.sqrt(((g - off[:, None, None, None]) ** 2).sum(0)) < 7).astype(np.int64)
    return gt, pred


def test_metric_no_spacing_oracle(ref_metric):
    gt, pred = _blob_pair(6)
    want = ref_metric.metric(
        torch.from_numpy(gt[None, None]), torch.from_numpy(pred[None, None])
    )
    got = metrics.seg_metrics(gt, pred)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_metric_no_spacing_oracle_empty_pred(ref_metric):
    gt, _ = _blob_pair(7)
    pred = np.zeros_like(gt)
    want = ref_metric.metric(torch.from_numpy(gt), torch.from_numpy(pred))
    got = metrics.seg_metrics(gt, pred)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_metric_spacing_stats_oracle(ref_metric):
    """The spacing path's precision/recall/jaccard/dice (metric.py:55-66)
    with compute_hausdorff_distance stubbed to a sentinel — the HD95 value
    itself is cross-checked against real monai below when available."""
    gt, pred = _blob_pair(8)
    sentinel = 17.25
    sys.modules["monai.metrics"].compute_hausdorff_distance = (
        lambda *a, **k: torch.tensor([[sentinel]])
    )
    ref_metric.compute_hausdorff_distance = (
        lambda *a, **k: torch.tensor([[sentinel]])
    )
    want = ref_metric.metric(
        torch.from_numpy(gt[None]), torch.from_numpy(pred[None]), spacing=(1.0, 1.0, 1.0)
    )
    got = metrics.seg_metrics(gt, pred, spacing=(1.0, 1.0, 1.0))
    assert want[4] == sentinel  # reference returned the monai value verbatim
    np.testing.assert_allclose(got[:4], want[:4], rtol=1e-10)


def test_hd95_monai_crosscheck():
    """Our EDT reimplementation vs monai compute_hausdorff_distance
    (percentile=95, directed=False) — the exact call the reference makes
    (metric.py:32). Runs wherever monai is installed."""
    monai_metrics = pytest.importorskip("monai.metrics")
    if getattr(monai_metrics, "__stub__", False):
        pytest.skip("only the ref_metric fixture's stub is present, not monai")
    for seed, spacing in ((9, (1.0, 1.0, 1.0)), (10, (0.7, 1.1, 2.3))):
        gt, pred = _blob_pair(seed)
        want = float(
            monai_metrics.compute_hausdorff_distance(
                torch.from_numpy(pred[None, None]),
                torch.from_numpy(gt[None, None]),
                percentile=95,
                spacing=spacing,
            ).numpy()[0][0]
        )
        got = metrics.hausdorff_95(gt > 0, pred > 0, spacing)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def _monai_pipeline_hd95(pred, gt, spacing, percentile=95):
    """Transcription of the monai call chain the reference invokes
    (metric.py:29-32 -> monai.metrics.compute_hausdorff_distance with
    percentile=95, directed=False), written directly from monai's
    published algorithm so it EXECUTES in this environment (monai itself
    is not installable here; VERDICT r4 #6):

      get_mask_edges:      surface = mask XOR binary_erosion(mask)
                           (scipy zero-padded border => edge voxels that
                           touch the array boundary count as surface)
      get_surface_distance: EDT of the complement of the OTHER surface,
                           sampled at the physical spacing, indexed at
                           this surface's voxels
      hd95:                max over both directions of the linearly
                           interpolated 95th percentile (torch.quantile
                           == np.percentile default)

    Deliberately does NOT crop — monai's union-bounding-box crop is a
    pure optimization, so this full-volume form is the semantic ground
    truth the crop must preserve. No code shared with
    metrics.hausdorff_95 beyond scipy itself.
    """
    from scipy import ndimage

    pred = np.asarray(pred, dtype=bool)
    gt = np.asarray(gt, dtype=bool)
    if not pred.any() or not gt.any():
        return float("inf")
    e_pred = pred ^ ndimage.binary_erosion(pred)
    e_gt = gt ^ ndimage.binary_erosion(gt)
    if not e_pred.any() or not e_gt.any():
        return float("inf")
    sp = np.asarray(spacing, dtype=np.float64)
    d_pred_to_gt = ndimage.distance_transform_edt(~e_gt, sampling=sp)[e_pred]
    d_gt_to_pred = ndimage.distance_transform_edt(~e_pred, sampling=sp)[e_gt]
    return float(
        max(
            np.percentile(d_pred_to_gt, percentile),
            np.percentile(d_gt_to_pred, percentile),
        )
    )


def test_hd95_monai_pipeline_always_runs():
    """metrics.hausdorff_95 (union-bbox-cropped EDT) == the full-volume
    monai-pipeline transcription above, on isotropic + anisotropic
    spacings and an edge-touching mask. Unlike test_hd95_monai_crosscheck
    (which needs monai installed), this executes everywhere."""
    cases = [
        (_blob_pair(9), (1.0, 1.0, 1.0)),
        (_blob_pair(10), (0.7, 1.1, 2.3)),
        (_blob_pair(11, shape=(16, 30, 13)), (2.0, 0.5, 1.0)),
    ]
    # a mask touching the array border: its border face is all surface
    # (zero-padded erosion), which the crop path must reproduce
    gt_edge = np.zeros((18, 19, 20), np.int64)
    gt_edge[0:7, 3:12, 5:15] = 1
    pred_edge = np.roll(gt_edge, (2, 1, 0), (0, 1, 2))
    cases.append(((gt_edge, pred_edge), (1.3, 0.9, 1.1)))
    for (gt, pred), spacing in cases:
        want = _monai_pipeline_hd95(pred > 0, gt > 0, spacing)
        got = metrics.hausdorff_95(gt > 0, pred > 0, spacing)
        np.testing.assert_allclose(got, want, rtol=1e-9, err_msg=str(spacing))
    # degenerate: one side empty -> inf, matching seg_metrics' guard
    empty = np.zeros((8, 8, 8), bool)
    gt, pred = _blob_pair(12, shape=(8, 8, 8))
    assert _monai_pipeline_hd95(empty, gt > 0, (1, 1, 1)) == float("inf")
    assert metrics.hausdorff_95(gt > 0, empty, (1, 1, 1)) == float("inf")
