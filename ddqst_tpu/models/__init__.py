"""Denoiser networks: FiLM ResMLP (reference parity) and transformer (scale)."""

from ddqst_tpu.models.d3pm import ConditionalD3PM, build_model  # noqa: F401
from ddqst_tpu.models.transformer import TransformerDenoiser  # noqa: F401
