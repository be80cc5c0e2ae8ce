"""Offline two-hand pose optimization (GeOptimizer equivalent)."""

from renderih_tpu.optimize.geo import (
    GeoWeights,
    anchor_pairs,
    contact_loss,
    repulsion_loss,
    edge_preserve_loss,
    pose_angle_limit_loss,
    optimize_two_hands,
)

__all__ = [
    "GeoWeights",
    "anchor_pairs",
    "contact_loss",
    "repulsion_loss",
    "edge_preserve_loss",
    "pose_angle_limit_loss",
    "optimize_two_hands",
]
