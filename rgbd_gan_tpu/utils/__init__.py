from .image_processing import postprocessing_sigmoid, postprocessing_tanh, to_host

__all__ = ["postprocessing_tanh", "postprocessing_sigmoid", "to_host"]
