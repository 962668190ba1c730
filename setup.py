"""Setuptools shim: metadata lives in setup.cfg; this file exists so
`pip install -e .` can use the legacy develop path in environments
whose setuptools lacks bdist_wheel (see the note atop setup.cfg).
Mirrors the reference's installable-package surface
(/root/reference/setup.py:1)."""

from setuptools import setup

setup()
