"""Rendering: pure-JAX orthographic rasterizer + two-hand renderer."""

from renderih_tpu.render.rasterize import rasterize_orthographic
from renderih_tpu.render.renderer import TwoHandRenderer

__all__ = ["rasterize_orthographic", "TwoHandRenderer"]
