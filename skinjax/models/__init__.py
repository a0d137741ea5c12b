"""Model zoo: backbones, text towers, fusion zoo, baselines, model factory."""

from skinjax.models.factory import create_model
from skinjax.models.fusion import MECHANISMS, MultimodalModel

__all__ = ["create_model", "MECHANISMS", "MultimodalModel"]
