"""Minimal timm stand-in: only `timm.models.layers` utilities."""
