from .bilinear_onehot import bilinear_gather_onehot
from .bilinear_pallas import bilinear_gather_pallas, pallas_available
from .bilinear_gradgather import bilinear_gather_grad
from .trilinear_pallas import trilinear_lift, trilinear_lift_pallas

__all__ = [
    "bilinear_gather_pallas",
    "bilinear_gather_onehot",
    "trilinear_lift_pallas",
    "trilinear_lift",
    "bilinear_gather_grad",
    "pallas_available",
]
