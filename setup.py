"""Legacy-install shim beside pyproject.toml (the canonical metadata).

The reference ships a setup.py (EliasGhennam/ETL_OMS setup.py:1-16);
this one exists so editable installs also work in offline environments
whose setuptools lacks the `wheel` package PEP 660 builds require:
``python setup.py develop`` needs neither network nor wheel.
"""

from setuptools import setup

setup()
