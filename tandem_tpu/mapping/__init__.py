from .tsdf import (TsdfConfig, TsdfVolume, create_volume, allocate_blocks,
                   integrate, raycast)
from .mesh import extract_mesh
