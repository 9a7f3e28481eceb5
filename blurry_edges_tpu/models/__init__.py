from .local_stage import LocalStage, smish
from .global_stage import GlobalStage, sincos_2d_positional_encoding
from .unet import UNet as DepthCompletion
from .unet import UNet

__all__ = ["LocalStage", "GlobalStage", "DepthCompletion", "UNet",
           "smish", "sincos_2d_positional_encoding"]
