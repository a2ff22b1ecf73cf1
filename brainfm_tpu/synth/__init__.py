from .constants import (LABELS_EXTRACEREBRAL, LABELS_LEFT, N_NEUTRAL,
                        CT_BRIGHTNESS_GROUP, RIGHT_TO_LEFT, build_lut,
                        build_vflip)
from .params import SynthStatic, sample_setup, resolution_sampler
from .deform import (make_affine_matrix, random_affine, random_nonlinear_field,
                     deform_grid, integrate_svf)
from .gmm import sample_contrast_lut, synth_intensities
from .pathology import random_shape, augment_pathology, encode_pathology
from .augment import (gamma_transform, sample_bias_field, resample_resolution,
                      add_noise)
from .engine import synth_item, SubjectBank

__all__ = [
    "LABELS_EXTRACEREBRAL", "LABELS_LEFT", "N_NEUTRAL", "CT_BRIGHTNESS_GROUP",
    "RIGHT_TO_LEFT", "build_lut", "build_vflip", "SynthStatic", "sample_setup",
    "resolution_sampler", "make_affine_matrix", "random_affine",
    "random_nonlinear_field", "deform_grid", "integrate_svf",
    "sample_contrast_lut", "synth_intensities", "random_shape",
    "augment_pathology", "encode_pathology", "gamma_transform",
    "sample_bias_field", "resample_resolution", "add_noise", "synth_item",
    "SubjectBank",
]
