"""Denoiser networks: FiLM ResMLP (reference parity) and transformer (scale)."""

from ddqst_tpu.models.d3pm import (  # noqa: F401
    ConditionalD3PM,
    PlainMLP,
    build_model,
)
from ddqst_tpu.models.transformer import TransformerDenoiser  # noqa: F401
