# Sphinx configuration for the dsl_tpu docs (reference: docs/conf.py).
# Build with `make html` (needs sphinx + myst-parser; not bundled in the
# TPU container — docs also read fine as plain markdown).
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "DSL-TPU"
copyright = "2026, dsl_tpu contributors"
author = "dsl_tpu contributors"

with open("../dsl_tpu/version.py") as f:
    exec(compile(f.read(), "version.py", "exec"))
release = locals().get("__version__", "0.0.0")
version = release

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
# myst-parser (maintained) replaces the reference's recommonmark for .md
try:
    import myst_parser  # noqa: F401

    extensions.append("myst_parser")
except ImportError:
    pass

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]
language = "zh_CN"

html_theme = "alabaster"
html_static_path = []

# heavyweight deps mocked so autodoc can import dsl_tpu anywhere
autodoc_mock_imports = ["jax", "jaxlib", "flax", "optax", "orbax", "cv2",
                        "chex", "einops", "torch"]


def builder_inited_handler(app):
    # regenerate modelzoo_statistics.md (reference conf.py runs stat.py)
    import subprocess

    subprocess.run([sys.executable, "stat.py"], cwd=os.path.dirname(
        os.path.abspath(__file__)))


def setup(app):
    app.connect("builder-inited", builder_inited_handler)
