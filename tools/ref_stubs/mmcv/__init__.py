"""Minimal mmcv stand-in: only the import surface the reference touches."""
