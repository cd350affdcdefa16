"""Rendering drivers: disk images, spectra, light curves."""

from .image import image_grid, render_disk_image, render_disk_image_jit
