"""Mesh-graph pipeline: offline coarsening + on-device graph ops.

`coarsen.py` (NumPy/SciPy, runs once offline) builds the multi-level
Heavy-Edge-Matching coarsening of the MANO mesh: padded binary-tree vertex
layout, rescaled Laplacians per level, and the permutation between mesh
vertex order and the GCN layout.

`ops.py` (JAX) holds the on-device pieces: dense Chebyshev graph
convolution, pooling/upsampling over the binary-tree layout, and the
mesh<->GCN index converters.
"""

from renderih_tpu.graph.coarsen import (
    GraphLevels,
    build_graph_levels,
    build_adjacency,
    load_reference_graph_pkl,
)
from renderih_tpu.graph.ops import (
    cheby_conv,
    graph_pool_avg,
    graph_pool_max,
    graph_upsample,
    vert_to_gcn,
    gcn_to_vert,
)

__all__ = [
    "GraphLevels",
    "build_graph_levels",
    "build_adjacency",
    "load_reference_graph_pkl",
    "cheby_conv",
    "graph_pool_avg",
    "graph_pool_max",
    "graph_upsample",
    "vert_to_gcn",
    "gcn_to_vert",
]
