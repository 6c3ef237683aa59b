from .nerf_synthetic import SubjectLoader
from .procedural import ProceduralSceneLoader

__all__ = ["SubjectLoader", "ProceduralSceneLoader"]
