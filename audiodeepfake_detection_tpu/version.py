"""Version of the audiodeepfake-detection-tpu package."""

__version__ = "0.1.0"
