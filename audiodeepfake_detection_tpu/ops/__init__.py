"""Device-side signal-processing ops (pure JAX / Pallas)."""

from .audio import add_noise, augment, contrast, resample  # noqa: F401
from .cwt import cwt, scale2frequency  # noqa: F401
from .lfcc import amplitude_to_db, compute_deltas, create_dct, lfcc, linear_fbanks  # noqa: F401
from .normalize import (  # noqa: F401
    WelfordState,
    normalize,
    welford_finalize,
    welford_init,
    welford_update,
)
from .quantize import (  # noqa: F401
    bake_int8_weights,
    calibrate_dcnn,
    calibrate_model,
    quantize_dcnn,
    quantize_model,
    quantized_conv,
    quantized_dense,
)
from .stft import hann_window, spectrogram  # noqa: F401
from .wavelets import Wavelet, get_wavelet, qmf  # noqa: F401
from .wpt import (  # noqa: F401
    graycode_permutation,
    packet_image,
    wpt_analysis,
    wpt_output_length,
    wpt_synthesis,
)
from .wpt_pallas import wpt_packets_pallas  # noqa: F401
