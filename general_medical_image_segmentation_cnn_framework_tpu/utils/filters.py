"""Gaussian frequency-domain low/high-pass filters.

Capability parity with the reference's ``utils/Filter.py`` (scipy
fourier_gaussian low/high pass; unused by its entry scripts but part of
the library surface). Implemented with numpy/scipy on host; the FFT
band-split actually used by the IS training path lives on device in
``ops/fft.py``.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def gaussian_low_pass(image: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    """Low-pass: fourier-domain gaussian smoothing."""
    freq = np.fft.fftn(image.astype(np.float32))
    filtered = ndimage.fourier_gaussian(freq, sigma=sigma)
    return np.real(np.fft.ifftn(filtered)).astype(np.float32)


def gaussian_high_pass(image: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    """High-pass: original minus the gaussian low-pass component."""
    return image.astype(np.float32) - gaussian_low_pass(image, sigma)
