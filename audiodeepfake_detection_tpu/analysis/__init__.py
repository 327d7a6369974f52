"""Offline analysis: attribution, GAN fingerprints, plots, model diffs."""

from .integrated_gradients import (  # noqa: F401
    Mean,
    integral_approximation,
    integrated_grad,
    interpolate_images,
    run_integrated_gradients,
)
