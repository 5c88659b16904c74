"""Utilities: image-grid rendering, RNG helpers."""

from spiking_diffusion_tpu.utils.grids import save_image_grid, save_recon_grid

__all__ = ["save_image_grid", "save_recon_grid"]
