"""Device-side signal-processing ops (pure JAX / Pallas)."""

from .stft import hann_window, spectrogram  # noqa: F401
from .wavelets import Wavelet, get_wavelet, qmf  # noqa: F401
from .wpt import (  # noqa: F401
    graycode_permutation,
    packet_image,
    wpt_analysis,
    wpt_output_length,
    wpt_synthesis,
)
