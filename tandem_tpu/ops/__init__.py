from .grid_sample import grid_sample_bilinear, bilinear_sample_pixel
from .warp import plane_sweep_warp
