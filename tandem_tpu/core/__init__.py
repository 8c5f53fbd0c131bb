from .se3 import (se3_exp, se3_log, so3_exp, so3_log, se3_inverse,
                  se3_compose, se3_identity)
from .camera import (cam_intrinsics, cam_resize, cam_stack, scale_K_naive,
                     stage_intrinsics_exact, stage_intrinsics_runtime)
