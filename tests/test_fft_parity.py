"""FFT band-split parity with the reference's torch formulation (bs=1,
where the reference's all-dims rfftn quirk is a no-op — SURVEY §2.8)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from general_medical_image_segmentation_cnn_framework_tpu.ops.fft import (  # noqa: E402
    band_split,
)


def _torch_band_split(x_ncdhw, limit):
    """The reference's low/high_pass_torch (train.py:76-88) re-expressed."""
    import torch.fft as fft

    t = torch.tensor(x_ncdhw)
    pass1 = torch.abs(fft.rfftfreq(t.shape[-1])) < limit
    pass2 = torch.abs(fft.fftfreq(t.shape[-2])) < limit
    kernel_low = torch.outer(pass2, pass1).to(t)
    block1 = torch.abs(fft.rfftfreq(t.shape[-1])) > limit
    block2 = torch.abs(fft.fftfreq(t.shape[-2])) > limit
    kernel_high = torch.outer(block2, block1).to(t)
    fft_input = fft.rfftn(t)
    low = fft.irfftn(fft_input * kernel_low, s=t.shape[-3:])
    high = fft.irfftn(fft_input * kernel_high, s=t.shape[-3:])
    return low.numpy(), high.numpy()


def test_band_split_matches_torch_bs1():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 8, 12, 16)).astype(np.float32)  # NCDHW
    low_t, high_t = _torch_band_split(x, 0.04)

    x_ndhwc = np.transpose(x, (0, 2, 3, 4, 1))
    low_j, high_j = band_split(jnp.asarray(x_ndhwc), 0.04)
    low_j = np.transpose(np.asarray(low_j), (0, 4, 1, 2, 3))
    high_j = np.transpose(np.asarray(high_j), (0, 4, 1, 2, 3))

    np.testing.assert_allclose(low_j, low_t, atol=1e-4)
    np.testing.assert_allclose(high_j, high_t, atol=1e-4)


def test_band_split_reconstructs_partial():
    """low + high misses only the |f| == limit band (strict inequalities)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    low, high = band_split(x, 0.5)  # 0.5 captures everything except nyquist
    recon = np.asarray(low + high)
    assert np.abs(recon - np.asarray(x)).max() < np.abs(np.asarray(x)).max()
