from .bilinear_onehot import bilinear_gather_onehot
from .bilinear_pallas import bilinear_gather_pallas, pallas_available
from .trilinear_pallas import trilinear_lift_pallas

__all__ = [
    "bilinear_gather_pallas",
    "bilinear_gather_onehot",
    "trilinear_lift_pallas",
    "pallas_available",
]
