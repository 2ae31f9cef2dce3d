"""Reusable model components (reference ``torchebm/models/components/``)."""

from .embeddings import LabelEmbedder, MLPTimestepEmbedder
from .heads import AdaLNZeroPatchHead
from .patch import ConvPatchEmbed2d, patchify2d, unpatchify2d
from .positional import build_2d_sincos_pos_embed
from .transformer import (
    AdaLNZeroBlock,
    FeedForward,
    MultiheadSelfAttention,
    modulate,
)

__all__ = [
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
