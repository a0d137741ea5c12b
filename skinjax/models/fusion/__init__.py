from skinjax.models.fusion.blocks import (
    AlteredResidualBlock,
    FeatureModulation,
    GatedAlteredResidualBlock,
    MetaBlock,
    MetaNet,
    MLP,
    MLPHead,
    ResidualBlock,
    SimpleAttentionBlock,
    StackedGatedResidualBlock,
    TransformerAttentionBlock,
)
from skinjax.models.fusion.multimodal import MECHANISMS, MultimodalModel

__all__ = [
    "AlteredResidualBlock",
    "FeatureModulation",
    "GatedAlteredResidualBlock",
    "MetaBlock",
    "MetaNet",
    "MLP",
    "MLPHead",
    "ResidualBlock",
    "SimpleAttentionBlock",
    "StackedGatedResidualBlock",
    "TransformerAttentionBlock",
    "MECHANISMS",
    "MultimodalModel",
]
