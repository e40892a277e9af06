from .checkpoint import convert_torch_state_dict, load_torch_checkpoint
from .config import CfgNode, get_default_config, load_config
