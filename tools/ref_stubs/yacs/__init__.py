"""Minimal yacs stand-in (see yacs/config.py)."""
