from .bilinear_pallas import bilinear_gather_pallas, pallas_available

__all__ = ["bilinear_gather_pallas", "pallas_available"]
