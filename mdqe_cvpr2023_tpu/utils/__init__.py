from .misc import (
    aligned_bilinear,
    aligned_bilinear_matrix,
    inverse_sigmoid,
    grid_sample,
    make_reference_points,
    interpolate_bilinear,
    interpolate_nearest,
)
from . import boxes
from . import nn
