from .device_sampler import DeviceRaySampler
from .nerf_synthetic import SubjectLoader
from .procedural import (
    ProceduralDynamicSceneLoader,
    ProceduralOpaqueSceneLoader,
    ProceduralSceneLoader,
    ProceduralUnboundedSceneLoader,
)

__all__ = [
    "SubjectLoader",
    "DeviceRaySampler",
    "ProceduralSceneLoader",
    "ProceduralDynamicSceneLoader",
    "ProceduralOpaqueSceneLoader",
    "ProceduralUnboundedSceneLoader",
]
