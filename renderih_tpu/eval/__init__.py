"""Evaluation: metrics and eval loops."""

from renderih_tpu.eval.metrics import (
    batch_similarity_align,
    mpjpe,
    pa_mpjpe,
    compute_mrrpe,
    compute_cdev,
    two_hand_metrics,
)

__all__ = [
    "batch_similarity_align",
    "mpjpe",
    "pa_mpjpe",
    "compute_mrrpe",
    "compute_cdev",
    "two_hand_metrics",
]
