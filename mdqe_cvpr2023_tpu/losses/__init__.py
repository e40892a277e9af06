from .matcher import dynamic_k_matching, hungarian_match_costs, clip_peak_match
from .criterion import criterion_apply, CriterionCfg
