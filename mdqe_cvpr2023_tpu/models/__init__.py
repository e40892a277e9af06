from .attention import MSDeformAttnCfg, ms_deform_attn_module_init, ms_deform_attn_module
from .resnet import resnet_init, resnet_apply
from .encoder import encoder_init, encoder_apply
from .mask_head import mask_head_init, mask_head_apply
from .decoder import decoder_init, decoder_apply
from .detr import MDQEModelCfg, detr_init, detr_apply_backbone, detr_encode, detr_mask_feats
