from . import rle
from .dataset import (ClipMapper, CombinedClipLoader, collate_clips,
                      load_coco_json_as_pseudo_videos, load_ytvis_json)
from .augmentation import AugmentationPipeline
from .ytvis_eval import YTVISEvaluator
from .builtin import DATASET_SPLITS, get_dataset
