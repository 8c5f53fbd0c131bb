from .mvsnet_runner import MvsnetRunner, init_variables
