"""Training-trajectory parity against the reference's OWN torch classes.

Extends test_train_parity_torch.py (unet3d vs a mirror) along the two axes
the r2 review asked for:

* a second numerics family — res_unet (InstanceNorm, LeakyReLU, nearest
  upsample, deep supervision; the no-running-stats path), trained against
  the ACTUAL reference ``residual_unet3d.UNet`` imported from
  /root/reference — same weights + same batches + Adam => same loss/dice
  trajectory. Dropout3d(0.6) is disabled on BOTH sides (identity): dropout
  masks cannot be made bit-equal across frameworks, and every other branch
  of the training computation is exercised without it.
* a multi-class (out_classes=3) cross-entropy run — the driver's CE path
  vs torch ``nn.CrossEntropyLoss`` on the reference ``unet3d.UNet3D`` with
  3 output channels.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict  # noqa: E402
from general_medical_image_segmentation_cnn_framework_tpu.train import (  # noqa: E402
    make_train_step,
)

from test_reference_oracle import (  # noqa: E402
    REF,
    ref_module,
    set_conv,
    set_convT,
    set_norm,
    to_channels_last,
    unfreeze,
)

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference snapshot not available"
)


def _res_unet_transplant(params, tm):
    """torch reference residual_unet3d.UNet -> flax ResidualUNet3D params
    (same mapping as test_reference_oracle.test_res_unet_oracle)."""
    set_conv(params, "TorchConv_0", tm.conv3d_c1_1)
    set_conv(params, "TorchConv_1", tm.conv3d_c1_2)
    set_conv(params, "TorchConv_2", tm.lrelu_conv_c1[1])
    for i, conv in enumerate([tm.conv3d_c2, tm.conv3d_c3, tm.conv3d_c4, tm.conv3d_c5]):
        set_conv(params, f"TorchConv_{3 + i}", conv)
    for i, nlc in enumerate([tm.norm_lrelu_conv_c2, tm.norm_lrelu_conv_c3,
                             tm.norm_lrelu_conv_c4, tm.norm_lrelu_conv_c5]):
        set_conv(params[f"_NormLReluConv_{i}"], "TorchConv_0", nlc[2])
    for i, nluc in enumerate([tm.norm_lrelu_upscale_conv_norm_lrelu_l0,
                              tm.norm_lrelu_upscale_conv_norm_lrelu_l1,
                              tm.norm_lrelu_upscale_conv_norm_lrelu_l2,
                              tm.norm_lrelu_upscale_conv_norm_lrelu_l3]):
        set_conv(params[f"_NormLReluUpscaleConvNormLRelu_{i}"], "TorchConv_0", nluc[3])
    set_conv(params, "TorchConv_7", tm.conv3d_l0)
    for i, cnl in enumerate([tm.conv_norm_lrelu_l1, tm.conv_norm_lrelu_l2,
                             tm.conv_norm_lrelu_l3, tm.conv_norm_lrelu_l4]):
        set_conv(params[f"_ConvNormLRelu_{i}"], "TorchConv_0", cnl[0])
    for i, conv in enumerate([tm.conv3d_l1, tm.conv3d_l2, tm.conv3d_l3, tm.conv3d_l4]):
        set_conv(params, f"TorchConv_{8 + i}", conv)
    set_conv(params, "TorchConv_12", tm.ds2_1x1_conv3d)
    set_conv(params, "TorchConv_13", tm.ds3_1x1_conv3d)


def test_res_unet_training_trajectory_vs_reference():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.residual_unet3d import (
        ResidualUNet3D,
    )

    f, patch, bs, n_steps, lr = 4, 32, 1, 6, 1e-3
    config = ConfigDict(
        {
            "network": "res_unet", "in_classes": 1, "out_classes": 2,
            "patch_size": (patch,) * 3, "init_lr": lr,
            "init_type": "none", "precision": "float32", "seed": 0,
        }
    )
    # dropout off on both sides (cross-framework masks cannot match)
    model = ResidualUNet3D(in_channels=1, n_classes=2, base_n_filter=f,
                           dropout_rate=0.0)
    # the torch ctor draws initial weights from torch's GLOBAL RNG; pin it so
    # the trajectory (and the dice-drift tolerance) doesn't depend on which
    # tests ran before this one in the suite
    torch.manual_seed(0)
    mod = ref_module("three_d.residual_unet3d")
    tm = mod.UNet(in_channels=1, n_classes=2, base_n_filter=f)
    tm.dropout3d = tnn.Identity()
    tm.train()

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, patch, patch, patch, 1), jnp.float32)
    variables = unfreeze(model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x0, train=False
    ))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    _res_unet_transplant(params, tm)  # torch (randomly initialized) -> flax

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    opt_state = tx.init(params)
    step = make_train_step(config, model, tx)
    opt_t = torch.optim.Adam(tm.parameters(), lr=lr)
    criterion = tnn.BCEWithLogitsLoss()

    rng_np = np.random.default_rng(3)
    losses_f, losses_t, dices_f, dices_t = [], [], [], []
    for _ in range(n_steps):
        x_np = rng_np.normal(size=(bs, patch, patch, patch, 1)).astype(np.float32)
        y_np = (rng_np.uniform(size=(bs, patch, patch, patch, 1)) > 0.5).astype(np.float32)

        params, batch_stats, opt_state, loss, dice = step(
            params, batch_stats, opt_state,
            jnp.asarray(x_np), jnp.asarray(y_np), rng,
        )
        losses_f.append(float(loss))
        dices_f.append(float(dice))

        xt = torch.tensor(np.transpose(x_np, (0, 4, 1, 2, 3)))
        gt = torch.tensor(np.transpose(y_np, (0, 4, 1, 2, 3)))
        gt2 = torch.cat([1 - gt, gt], dim=1)
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
            dices_t.append(
                2 * inter / (pred_fg.sum().item() + gt_fg.sum().item() + 1e-3)
            )

    np.testing.assert_allclose(losses_f, losses_t, rtol=2e-3, atol=3e-4)
    # dice is argmax-thresholded: with random GT the logits hover near 0 and
    # each boundary voxel flip moves dice by ~6e-5, so chaotic fp divergence
    # (InstanceNorm trajectories, cross-framework reduction order) amplifies
    # over steps while the LOSS trajectory — the real parity signal — stays
    # within 2e-3. Tight on the first two steps, bounded drift afterwards.
    np.testing.assert_allclose(dices_f[:2], dices_t[:2], atol=2e-3)
    np.testing.assert_allclose(dices_f, dices_t, atol=1.5e-2)


def test_multiclass_ce_training_trajectory_vs_reference():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import (
        UNet3D,
    )

    f, patch, bs, n_steps, lr, n_cls = 4, 16, 2, 6, 1e-3, 3
    config = ConfigDict(
        {
            "network": "unet", "in_classes": 1, "out_classes": n_cls,
            "patch_size": (patch,) * 3, "init_lr": lr,
            "init_type": "none", "precision": "float32", "seed": 0,
        }
    )
    model = UNet3D(in_channels=1, out_channels=n_cls, init_features=f)
    torch.manual_seed(0)  # suite-order-independent torch init (see above)
    mod = ref_module("three_d.unet3d")
    tm = mod.UNet3D(in_channels=1, out_channels=n_cls, init_features=f)
    tm.train()

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, patch, patch, patch, 1), jnp.float32)
    variables = unfreeze(model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x0, train=False
    ))
    params, batch_stats = variables["params"], variables["batch_stats"]

    blocks = [tm.encoder1, tm.encoder2, tm.encoder3, tm.encoder4, tm.bottleneck,
              tm.decoder4, tm.decoder3, tm.decoder2, tm.decoder1]
    names = ["enc1", "enc2", "enc3", "enc4", "bottleneck",
             "dec4", "dec3", "dec2", "dec1"]
    i = 0
    for blk, nm in zip(blocks, names):
        for j in (1, 2):
            set_conv(params[f"ConvBlock_{i}"], "TorchConv_0", getattr(blk, f"{nm}conv{j}"))
            set_norm(params[f"ConvBlock_{i}"], batch_stats[f"ConvBlock_{i}"],
                     "BatchNorm_0", getattr(blk, f"{nm}norm{j}"))
            i += 1
    for k, up in enumerate([tm.upconv4, tm.upconv3, tm.upconv2, tm.upconv1]):
        set_convT(params, f"TorchConvTranspose_{k}", up)
    set_conv(params, "Conv_0", tm.conv)

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    opt_state = tx.init(params)
    step = make_train_step(config, model, tx)
    opt_t = torch.optim.Adam(tm.parameters(), lr=lr)
    criterion = tnn.CrossEntropyLoss()

    rng_np = np.random.default_rng(4)
    losses_f, losses_t = [], []
    for _ in range(n_steps):
        x_np = rng_np.normal(size=(bs, patch, patch, patch, 1)).astype(np.float32)
        y_np = rng_np.integers(0, n_cls, size=(bs, patch, patch, patch, 1)).astype(np.float32)

        params, batch_stats, opt_state, loss, dice = step(
            params, batch_stats, opt_state,
            jnp.asarray(x_np), jnp.asarray(y_np), rng,
        )
        losses_f.append(float(loss))

        xt = torch.tensor(np.transpose(x_np, (0, 4, 1, 2, 3)))
        labels = torch.tensor(
            np.transpose(y_np[..., 0], (0, 1, 2, 3)).astype(np.int64)
        )
        opt_t.zero_grad()
        logits = tm(xt)
        loss_t = criterion(logits, labels)
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))

    np.testing.assert_allclose(losses_f, losses_t, rtol=2e-3, atol=3e-4)
