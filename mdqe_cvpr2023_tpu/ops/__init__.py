from .deform_attn import ms_deform_attn, ms_deform_attn_ref
