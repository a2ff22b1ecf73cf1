from .prepare import prepare_image, center_crop, zero_crop_bounds
from .tiles import tile_plan, tiled_apply
from .api import Inferencer, get_deformed_atlas

__all__ = ["prepare_image", "center_crop", "zero_crop_bounds", "tile_plan",
           "tiled_apply", "Inferencer", "get_deformed_atlas"]
