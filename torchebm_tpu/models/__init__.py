"""Model zoo (reference ``torchebm/models/__init__.py:12-27``)."""

from .components import (
    AdaLNZeroBlock,
    AdaLNZeroPatchHead,
    ConvPatchEmbed2d,
    FeedForward,
    LabelEmbedder,
    MLPTimestepEmbedder,
    MultiheadSelfAttention,
    build_2d_sincos_pos_embed,
    modulate,
    patchify2d,
    unpatchify2d,
)
from .conditional_transformer_2d import ConditionalTransformer2D
from .nets import ConvEnergy2D, MLPEnergy, MLPVelocityField
from .wrappers import EqMEnergy, InteractionModel, LabelClassifierFreeGuidance

__all__ = [
    "ConditionalTransformer2D",
    "LabelClassifierFreeGuidance",
    "InteractionModel",
    "EqMEnergy",
    "MLPEnergy",
    "MLPVelocityField",
    "ConvEnergy2D",
    "patchify2d",
    "unpatchify2d",
    "ConvPatchEmbed2d",
    "build_2d_sincos_pos_embed",
    "MLPTimestepEmbedder",
    "LabelEmbedder",
    "modulate",
    "MultiheadSelfAttention",
    "FeedForward",
    "AdaLNZeroBlock",
    "AdaLNZeroPatchHead",
]
