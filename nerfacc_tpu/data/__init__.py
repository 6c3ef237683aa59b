from .nerf_synthetic import SubjectLoader
from .procedural import ProceduralDynamicSceneLoader, ProceduralSceneLoader

__all__ = [
    "SubjectLoader",
    "ProceduralSceneLoader",
    "ProceduralDynamicSceneLoader",
]
