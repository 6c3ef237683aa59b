from .encoders import (
    HashGridEncoder,
    SinusoidalEncoder,
    spherical_harmonics_16,
)
from .mlp import (
    NDRTNeRFRadianceField,
    TNeRFRadianceField,
    VanillaNeRFRadianceField,
)
from .ngp import NGPDensityField, NGPRadianceField, contract_to_unisphere, trunc_exp

__all__ = [
    "HashGridEncoder",
    "SinusoidalEncoder",
    "spherical_harmonics_16",
    "VanillaNeRFRadianceField",
    "TNeRFRadianceField",
    "NDRTNeRFRadianceField",
    "NGPDensityField",
    "NGPRadianceField",
    "contract_to_unisphere",
    "trunc_exp",
]
