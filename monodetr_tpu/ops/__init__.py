from . import box_ops, utils
from .msda import ms_deform_attn, ms_deform_attn_reference

__all__ = ["box_ops", "utils", "ms_deform_attn", "ms_deform_attn_reference"]
