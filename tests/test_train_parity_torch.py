"""Training-trajectory parity: the REAL train step (make_train_step — BCE on
(bg, fg) one-hot + Adam + batch-stat BatchNorm) must track a PyTorch
training loop of the transplanted model step-for-step. This is the
checkable form of the BASELINE 'Dice within ±0.002' north star: same
weights + same data + same optimizer => same loss/dice trajectory.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict  # noqa: E402
from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import (  # noqa: E402
    UNet3D,
)
from general_medical_image_segmentation_cnn_framework_tpu.train import (  # noqa: E402
    init_train_state,
    make_train_step,
)

from test_torch_parity import _TorchUNet3D, _copy_conv, _copy_convT, _copy_bn  # noqa: E402


def _transplant(params, tm):
    conv_i = 0
    blocks = list(tm.enc) + [tm.bottleneck] + list(tm.dec)
    for blk in blocks:
        for c, b in ((blk.c1, blk.b1), (blk.c2, blk.b2)):
            scope = params[f"ConvBlock_{conv_i}"]
            tc = scope["TorchConv_0"]
            _copy_conv(c, tc["kernel"], tc["bias"])
            _copy_bn(b, scope["BatchNorm_0"])
            conv_i += 1
    for i, up in enumerate(tm.ups):
        scope = params[f"TorchConvTranspose_{i}"]
        _copy_convT(up, scope["kernel"], scope["bias"])
    head = params["Conv_0"]
    _copy_conv(tm.head, head["kernel"], head["bias"])


def test_training_trajectory_matches_torch():
    f, patch, bs, n_steps, lr = 4, 16, 2, 8, 1e-3
    config = ConfigDict(
        {
            "network": "unet", "in_classes": 1, "out_classes": 2,
            "patch_size": (patch,) * 3, "init_lr": lr,
            "init_type": "none", "precision": "float32", "seed": 0,
        }
    )
    model = UNet3D(in_channels=1, out_channels=2, init_features=f)
    rng = jax.random.PRNGKey(0)

    # flax state via the real driver path
    x0 = jnp.zeros((1, patch, patch, patch, 1), jnp.float32)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x0, train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    import optax

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    opt_state = tx.init(params)
    step = make_train_step(config, model, tx)

    # torch twin with the SAME weights (seed the GLOBAL torch RNG its ctor
    # draws from, so the trajectory is suite-order independent)
    torch.manual_seed(0)
    tm = _TorchUNet3D(1, 2, f)
    tm.train()
    _transplant(params, tm)
    opt_t = torch.optim.Adam(tm.parameters(), lr=lr)
    criterion = tnn.BCEWithLogitsLoss()

    # fixed batches, same for both frameworks
    rng_np = np.random.default_rng(0)
    batches = [
        (
            rng_np.normal(size=(bs, patch, patch, patch, 1)).astype(np.float32),
            (rng_np.uniform(size=(bs, patch, patch, patch, 1)) > 0.5).astype(np.float32),
        )
        for _ in range(n_steps)
    ]

    losses_f, losses_t, dices_f, dices_t = [], [], [], []
    for x_np, y_np in batches:
        params, batch_stats, opt_state, loss, dice = step(
            params, batch_stats, opt_state,
            jnp.asarray(x_np), jnp.asarray(y_np), rng,
        )
        losses_f.append(float(loss))
        dices_f.append(float(dice))

        xt = torch.tensor(np.transpose(x_np, (0, 4, 1, 2, 3)))
        gt = torch.tensor(np.transpose(y_np, (0, 4, 1, 2, 3)))
        gt2 = torch.cat([1 - gt, gt], dim=1)  # (bg, fg) one-hot
        opt_t.zero_grad()
        logits = tm(xt)
        loss_t = criterion(logits, gt2)
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))
        with torch.no_grad():
            pred_fg = logits.argmax(dim=1)
            gt_fg = gt2.argmax(dim=1)
            inter = (pred_fg * gt_fg).sum().item()
            dice_t = 2 * inter / (pred_fg.sum().item() + gt_fg.sum().item() + 1e-3)
        dices_t.append(dice_t)

    np.testing.assert_allclose(losses_f, losses_t, rtol=2e-3, atol=2e-4)
    # the north star: dice parity within ±0.002 at every step
    np.testing.assert_allclose(dices_f, dices_t, atol=2e-3)
