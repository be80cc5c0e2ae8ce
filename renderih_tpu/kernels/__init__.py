"""Pallas TPU kernels for the hot ops.

These are optional fast paths; every kernel has a pure-XLA reference
implementation elsewhere in the package (`models/attention.py`,
`ops/sdf.py`) that the tests compare against (kernels run in interpret
mode on CPU).
"""

from renderih_tpu.kernels.fused_attention import fused_mha
from renderih_tpu.kernels.sdf_pallas import sdf_grid_pallas

__all__ = ["fused_mha", "sdf_grid_pallas"]
