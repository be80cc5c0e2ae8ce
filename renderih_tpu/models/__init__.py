"""Network modules: encoders, attention, dual-graph decoder, top model."""

from renderih_tpu.models.model import (
    HandNet,
    build_model,
    init_model,
    model_call_kwargs,
)
from renderih_tpu.models.decoder import DecoderOutput, GraphDecoder

__all__ = [
    "HandNet",
    "build_model",
    "init_model",
    "model_call_kwargs",
    "DecoderOutput",
    "GraphDecoder",
]
