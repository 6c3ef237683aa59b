from .device_sampler import DeviceRaySampler
from .nerf_synthetic import SubjectLoader
from .procedural import (
    PROCEDURAL_SCENES,
    ProceduralDynamicSceneLoader,
    ProceduralLocalDynamicSceneLoader,
    ProceduralMixedSceneLoader,
    ProceduralOpaqueSceneLoader,
    ProceduralSceneLoader,
    ProceduralTexturedSceneLoader,
    ProceduralThinSceneLoader,
    ProceduralUnboundedSceneLoader,
)

__all__ = [
    "SubjectLoader",
    "DeviceRaySampler",
    "ProceduralSceneLoader",
    "ProceduralDynamicSceneLoader",
    "ProceduralOpaqueSceneLoader",
    "ProceduralUnboundedSceneLoader",
    "ProceduralTexturedSceneLoader",
    "ProceduralThinSceneLoader",
    "ProceduralMixedSceneLoader",
    "ProceduralLocalDynamicSceneLoader",
    "PROCEDURAL_SCENES",
]
