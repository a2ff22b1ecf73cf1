from .unet3d import UNet3D, UNet3DSep, UNet2D, feature_maps
from .heads import TaskHead, DepHead, ConvBlock
from .build import build_model, process_args, postprocess
from .losses import (l1_loss, l2_loss, gaussian_loss, laplace_loss,
                     gradient_loss, smoothness_loss, hessian_loss)
from .criterion import make_criterion

__all__ = [
    "UNet3D", "UNet3DSep", "UNet2D", "feature_maps", "TaskHead", "DepHead",
    "ConvBlock", "build_model", "process_args", "postprocess",
    "l1_loss", "l2_loss", "gaussian_loss", "laplace_loss",
    "gradient_loss", "smoothness_loss", "hessian_loss", "make_criterion",
]
