from .grid_sample import grid_sample_bilinear, bilinear_sample_pixel
from .warp import plane_sweep_warp
from .warp3d import depth_reprojection_warp
from .linalg import (inv3x3, invert_pixel_projection, solve_psd,
                     solve_gauss_jordan, inv_psd_small)
