from .preview import convert_batch_images, render_preview_grid, sample_generate_light

__all__ = ["convert_batch_images", "render_preview_grid", "sample_generate_light"]
