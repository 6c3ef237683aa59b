from .device_sampler import DeviceRaySampler
from .nerf_synthetic import SubjectLoader
from .procedural import (
    ProceduralDynamicSceneLoader,
    ProceduralSceneLoader,
    ProceduralUnboundedSceneLoader,
)

__all__ = [
    "SubjectLoader",
    "DeviceRaySampler",
    "ProceduralSceneLoader",
    "ProceduralDynamicSceneLoader",
    "ProceduralUnboundedSceneLoader",
]
