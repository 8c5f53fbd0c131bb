from .tsdf import (TsdfConfig, TsdfVolume, create_volume, allocate_blocks,
                   integrate, raycast, render_depth_splat)
from .mesh import extract_mesh
