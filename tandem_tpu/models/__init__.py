from .cva_mvsnet import CvaMVSNet, StageOutputs, Outputs
from .losses import compute_loss
from .metrics import eval_errors
