"""Rendering drivers: disk images, spectra, surface solving."""

from .image import image_grid, render_disk_image, render_disk_image_jit
from .driver import (
    DiskRaytrace, DiskSpectrum, DiskSpectrum_BlackBody,
    disk_tetrad, observed_gfactor, emission_angle,
    vertical_gravity, spectral_hardening, find_surface, find_surface_march,
)
from .polarized import (render_polarized_image, chandrasekhar_poldeg,
                        polarized_spectrum)
from .lightcurve import (equatorial_crossing_map, hotspot_lightcurve,
                         volume_image, volume_lightcurve)
from .checkpoint import (FrameCheckpoint, checkpointed_frames,
                         hotspot_lightcurve_checkpointed)
from .lineprofile import disk_g_map, line_profile, transfer_function
from .spectrum_fit import PolarGrid, make_polar_grid, disk_spectrum
from .shadow import BHImage, gfactor_plunge, render_bh_image
