"""Minimal torchvision stand-in: only `torchvision.models` resnets.

Importable as top-level `torchvision` by putting tools/ref_stubs on
sys.path ahead of site-packages (see tools/parity_vs_reference.py).
"""
from . import models  # noqa: F401
