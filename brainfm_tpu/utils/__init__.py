from .nifti import MRIread, MRIwrite, load_nifti, save_nifti
from .orientation import get_ras_axes, align_volume_to_ref
from .logging import MetricLogger, SmoothedValue, setup_logging

__all__ = ["MRIread", "MRIwrite", "load_nifti", "save_nifti",
           "get_ras_axes", "align_volume_to_ref",
           "MetricLogger", "SmoothedValue", "setup_logging"]
