"""Training losses."""

from renderih_tpu.losses.graph_loss import (
    GraphLossWeights,
    smooth_l1,
    normal_loss,
    edge_length_loss,
    mesh_downsample,
    two_hand_graph_loss,
)
from renderih_tpu.losses.focal import sigmoid_focal_loss, dice_loss

__all__ = [
    "GraphLossWeights",
    "smooth_l1",
    "normal_loss",
    "edge_length_loss",
    "mesh_downsample",
    "two_hand_graph_loss",
    "sigmoid_focal_loss",
    "dice_loss",
]
