"""Sphinx configuration for morgana_tpu API documentation."""
import os
import sys

sys.path.insert(0, os.path.abspath('..'))

project = 'morgana_tpu'
author = 'morgana_tpu developers'
release = '0.1.0'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
]

autodoc_member_order = 'bysource'
napoleon_numpy_docstring = True
html_theme = 'alabaster'
master_doc = 'index'
