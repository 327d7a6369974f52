"""TPU-native audio deepfake detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gan-police/audiodeepfake-detection: wavelet-packet / STFT time-frequency
front-ends, dilated-CNN / LCNN / AST classifiers, data-parallel training over
a ``jax.sharding.Mesh``, grid-search experiment driver, EER evaluation,
integrated-gradients attribution and GAN fingerprint analysis.
"""

from .version import __version__  # noqa: F401
