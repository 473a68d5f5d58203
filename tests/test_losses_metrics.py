"""Losses/metrics numerical parity vs torch (cpu) reference formulas.

torch (CPU build) is available in the test environment, so we check our
jax implementations directly against torch.nn.BCEWithLogitsLoss and
hand-computed dice/metric values with the reference's smooth constants.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from general_medical_image_segmentation_cnn_framework_tpu import losses, metrics


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_bce_with_logits_matches_torch(rng):
    import torch

    logits = rng.normal(size=(2, 4, 4, 4, 2)).astype(np.float32)
    targets = (rng.uniform(size=(2, 4, 4, 4, 2)) > 0.5).astype(np.float32)
    ours = float(losses.bce_with_logits(logits, targets))
    theirs = float(
        torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(targets))
    )
    assert abs(ours - theirs) < 1e-5


def test_one_hot_background():
    gt = np.zeros((1, 2, 2, 2, 1), np.float32)
    gt[0, 0, 0, 0, 0] = 1.0
    oh = np.asarray(losses.one_hot_background(gt))
    assert oh.shape == (1, 2, 2, 2, 2)
    assert oh[0, 0, 0, 0, 0] == 0 and oh[0, 0, 0, 0, 1] == 1
    assert oh[0, 1, 1, 1, 0] == 1 and oh[0, 1, 1, 1, 1] == 0


def test_cross_entropy_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 3, 3, 3, 4)).astype(np.float32)
    target = rng.integers(0, 4, size=(2, 3, 3, 3))
    ours = float(losses.cross_entropy(logits, target))
    # torch cross_entropy_3D equivalent: NLL of log_softmax averaged over voxels
    lt = torch.tensor(np.moveaxis(logits, -1, 1))
    tt = torch.tensor(target, dtype=torch.long)
    theirs = float(F.cross_entropy(lt, tt))
    assert abs(ours - theirs) < 1e-5


def test_binary_dice_loss_hand():
    pred = np.array([[1.0, 0.0, 1.0, 0.0]])
    tgt = np.array([[1.0, 1.0, 0.0, 0.0]])
    # num = 1 + 1 = 2 ; den = 2 + 2 + 1 = 5 ; loss = 1 - 2/5
    assert abs(float(losses.binary_dice_loss(pred, tgt)) - (1 - 2 / 5)) < 1e-6


def test_dice_loss_range(rng):
    logits = rng.normal(size=(2, 4, 4, 4, 1)).astype(np.float32)
    tgt = (rng.uniform(size=(2, 4, 4, 4, 1)) > 0.5).astype(np.float32)
    val = float(losses.dice_loss(logits, tgt))
    assert 0.0 <= val <= 1.0


def test_multiclass_dice_perfect():
    target = np.zeros((1, 2, 2, 2), np.int32)
    target[0, 0] = 1
    onehot = np.eye(2, dtype=np.float32)[target]
    val = float(losses.multiclass_dice_loss(onehot, target, n_classes=2))
    assert val < 1e-4


def test_seg_metrics_hand():
    gt = np.zeros((4, 4, 4), int)
    pred = np.zeros((4, 4, 4), int)
    gt[:2] = 1  # 32 voxels
    pred[1:3] = 1  # 32 voxels, 16 overlap
    jaccard, dice = metrics.seg_metrics(gt, pred)
    assert abs(jaccard - 16 / (48 + 0.001)) < 1e-9
    assert abs(dice - 32 / (64 + 0.001)) < 1e-9


def test_seg_metrics_with_spacing():
    gt = np.zeros((8, 8, 8), int)
    pred = np.zeros((8, 8, 8), int)
    gt[2:6, 2:6, 2:6] = 1
    pred[2:6, 2:6, 2:6] = 1
    precision, recall, jaccard, dice, hd95 = metrics.seg_metrics(
        gt, pred, spacing=(1.0, 1.0, 1.0)
    )
    assert abs(dice - 128 / (128 + 0.001)) < 1e-6
    assert hd95 == 0.0
    assert precision > 0.999 and recall > 0.999


def test_hausdorff_translation():
    gt = np.zeros((16, 16, 16), bool)
    pred = np.zeros((16, 16, 16), bool)
    gt[4:8, 4:8, 4:8] = True
    pred[6:10, 4:8, 4:8] = True  # shifted by 2 in x
    hd = metrics.hausdorff_95(gt, pred, spacing=(1, 1, 1))
    assert 1.0 <= hd <= 3.0
    # spacing scales distances
    hd2 = metrics.hausdorff_95(gt, pred, spacing=(2, 1, 1))
    assert hd2 > hd


def test_device_dice_matches_host(rng):
    gt = (rng.uniform(size=(2, 8, 8, 8)) > 0.5).astype(np.int32)
    pred = (rng.uniform(size=(2, 8, 8, 8)) > 0.5).astype(np.int32)
    j_dev, d_dev = metrics.dice_jaccard(gt, pred)
    j_host, d_host = metrics.seg_metrics(gt, pred)
    assert abs(float(j_dev) - j_host) < 1e-5
    assert abs(float(d_dev) - d_host) < 1e-5


def test_focal_loss_reduces_easy_examples():
    logits = np.array([[10.0]], np.float32)  # confident correct
    tgt = np.array([[1.0]], np.float32)
    assert float(losses.focal_loss(logits, tgt)) < 1e-4


def _hd95_bruteforce(gt, pred, spacing):
    """O(S^2) all-pairs reference for the EDT implementation (MONAI
    compute_hausdorff_distance semantics: erosion-XOR surfaces, directed
    95th percentiles via np.percentile, undirected max)."""
    from scipy import ndimage

    def surface_pts(m):
        s = m ^ ndimage.binary_erosion(m)
        return np.argwhere(s) * np.asarray(spacing, np.float64)

    a, b = surface_pts(gt), surface_pts(pred)
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    return max(
        np.percentile(d.min(axis=0), 95),  # pred surface -> gt surface
        np.percentile(d.min(axis=1), 95),  # gt surface -> pred surface
    )


def test_hausdorff95_matches_bruteforce():
    """EDT hausdorff_95 vs an independent all-pairs computation, on
    irregular blobs, isotropic AND anisotropic spacing."""
    r = np.random.default_rng(3)
    shape = (14, 15, 16)
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"))
    for seed, spacing in ((0, (1.0, 1.0, 1.0)), (1, (0.7, 1.3, 2.1)), (2, (3.0, 1.0, 1.0))):
        rr = np.random.default_rng(seed)
        c1 = np.array([7, 7, 8]) + rr.uniform(-2, 2, 3)
        c2 = c1 + rr.uniform(-3, 3, 3)
        gt = (np.sqrt(((g - c1[:, None, None, None]) ** 2).sum(0)) < 4.5)
        pred = (np.sqrt(((g - c2[:, None, None, None]) ** 2).sum(0)) < 3.5)
        want = _hd95_bruteforce(gt, pred, spacing)
        got = metrics.hausdorff_95(gt, pred, spacing)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_hausdorff95_empty_surfaces():
    gt = np.zeros((8, 8, 8), bool)
    pred = np.zeros((8, 8, 8), bool)
    pred[2:4, 2:4, 2:4] = True
    assert metrics.hausdorff_95(gt, pred, (1, 1, 1)) == float("inf")
    assert metrics.hausdorff_95(pred, gt, (1, 1, 1)) == float("inf")
    assert metrics.hausdorff_95(gt, gt, (1, 1, 1)) == float("inf")


def _bruteforce_hd95(gt, pred, spacing):
    """Independent HD95 oracle: O(n^2) all-pairs surface distances.

    Implements MONAI's documented semantics from scratch (no shared code
    with metrics.hausdorff_95, which uses scipy EDT): a surface voxel is
    foreground with a background 6-neighbor (out-of-bounds counts as
    background — what binary erosion with border_value=0 produces, and
    what MONAI's crop-with-margin yields); directed distances are
    center-to-center Euclidean in physical units; HD95 = max of the two
    directed 95th percentiles (np.percentile linear interpolation).
    """
    spacing = np.asarray(spacing, dtype=np.float64)

    def surface_points(mask):
        pts = []
        shape = np.array(mask.shape)
        for p in np.argwhere(mask):
            if (p == 0).any() or (p == shape - 1).any():
                pts.append(p)
                continue
            for ax in range(3):
                for d in (-1, 1):
                    q = p.copy()
                    q[ax] += d
                    if not mask[tuple(q)]:
                        pts.append(p)
                        break
                else:
                    continue
                break
        return np.asarray(pts, dtype=np.float64)

    s_gt = surface_points(gt)
    s_pred = surface_points(pred)
    if len(s_gt) == 0 or len(s_pred) == 0:
        return float("inf")

    def directed(a, b):
        d = np.sqrt(
            (((a[:, None, :] - b[None, :, :]) * spacing) ** 2).sum(-1)
        ).min(axis=1)
        return np.percentile(d, 95)

    return float(max(directed(s_pred, s_gt), directed(s_gt, s_pred)))


def test_hd95_bruteforce_oracle_random_blobs():
    """metrics.hausdorff_95 (scipy-EDT path) vs the O(n^2) brute-force
    oracle on random smoothed blobs, isotropic and anisotropic spacing.
    scipy's EDT is exact Euclidean, so agreement is to float precision."""
    from scipy import ndimage

    rng = np.random.default_rng(7)
    for seed in range(6):
        field_g = ndimage.gaussian_filter(
            rng.normal(size=(12, 12, 12)), sigma=2.0
        )
        field_p = ndimage.gaussian_filter(
            rng.normal(size=(12, 12, 12)), sigma=2.0
        )
        gt = field_g > np.percentile(field_g, 70)
        pred = field_p > np.percentile(field_p, 70)
        if not gt.any() or not pred.any():
            continue
        for spacing in [(1.0, 1.0, 1.0), (1.0, 1.5, 2.0)]:
            got = metrics.hausdorff_95(gt, pred, spacing)
            want = _bruteforce_hd95(gt, pred, spacing)
            assert got == pytest.approx(want, rel=1e-9), (seed, spacing)


def test_hd95_bruteforce_oracle_edge_cases():
    gt = np.zeros((8, 8, 8), bool)
    pred = np.zeros((8, 8, 8), bool)
    # empty either side -> inf (reference behavior: monai warns + nan/inf;
    # we report inf consistently)
    gt[2, 2, 2] = True
    assert metrics.hausdorff_95(gt, pred, (1, 1, 1)) == float("inf")
    # single voxel vs single voxel: plain Euclidean distance
    pred[5, 6, 2] = True
    want = np.sqrt(3.0**2 + 4.0**2)
    assert metrics.hausdorff_95(gt, pred, (1, 1, 1)) == pytest.approx(want)
    assert _bruteforce_hd95(gt, pred, (1, 1, 1)) == pytest.approx(want)
    # full-array masks: every border voxel is surface, distance 0
    full = np.ones((6, 6, 6), bool)
    assert metrics.hausdorff_95(full, full, (1, 2, 3)) == 0.0
