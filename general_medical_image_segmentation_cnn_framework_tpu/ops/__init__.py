"""Device-side ops: FFT band-split, sliding-window inference, Pallas kernels."""

from .fft import band_split, low_pass, high_pass
from .sliding_window import sliding_window_predict

__all__ = ["band_split", "low_pass", "high_pass", "sliding_window_predict"]
