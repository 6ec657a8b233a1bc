# Sphinx configuration for ska-pst-dsp-tpu.
# Build (where sphinx is available):  sphinx-build -b html docs/src docs/html
project = "ska-pst-dsp-tpu"
author = "ska-pst-dsp-tpu developers"
release = "0.2"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
exclude_patterns = []
html_theme = "alabaster"

# kernels import jax at module load; keep autodoc light on doc builders
autodoc_mock_imports = []
