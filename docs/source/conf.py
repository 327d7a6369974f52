"""Sphinx configuration for the TPU audio-deepfake-detection framework.

Counterpart of the reference's readthedocs setup
(reference: docs/source/conf.py, readthedocs.yml).  Build with
``sphinx-build -b html docs/source docs/build`` in an environment with
sphinx installed (this container intentionally has none; the configuration
is CI/readthedocs-ready).
"""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "audiodeepfake-detection-tpu"
copyright = "2026"
author = "audiodeepfake-detection-tpu contributors"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

napoleon_google_docstring = True
autosummary_generate = True

# heavy / hardware-bound imports are mocked so docs build anywhere
autodoc_mock_imports = [
    "jax",
    "jaxlib",
    "flax",
    "optax",
    "orbax",
    "chex",
    "torch",
    "tensorboardX",
    "matplotlib",
    "scipy",
    "sklearn",
]

templates_path = ["_templates"]
exclude_patterns = []

html_theme = "alabaster"
