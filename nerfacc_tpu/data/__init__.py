from .nerf_synthetic import SubjectLoader
from .procedural import (
    ProceduralDynamicSceneLoader,
    ProceduralSceneLoader,
    ProceduralUnboundedSceneLoader,
)

__all__ = [
    "SubjectLoader",
    "ProceduralSceneLoader",
    "ProceduralDynamicSceneLoader",
    "ProceduralUnboundedSceneLoader",
]
