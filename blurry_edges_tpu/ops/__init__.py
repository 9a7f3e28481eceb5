from .wedge import (
    make_patch_grid,
    params2dists,
    params2etas,
    dists2indicators,
    boundary_distance_field,
    normalized_gaussian,
    boundary_map,
    depth_masks,
    inverse_3x3,
    solve_colors,
    render_patches,
)
from .dfd import DfDSolver
from .optics import kernel_sigma, gaussian_psf_bank, max_kernel_halfwidth, blur_fixed_support
from .patchify import unfold, fold, fold_count
from .sobel import image_derivative

__all__ = [
    "make_patch_grid", "params2dists", "params2etas", "dists2indicators",
    "boundary_distance_field", "normalized_gaussian", "boundary_map", "depth_masks",
    "inverse_3x3", "solve_colors", "render_patches",
    "DfDSolver",
    "kernel_sigma", "gaussian_psf_bank", "max_kernel_halfwidth", "blur_fixed_support",
    "unfold", "fold", "fold_count",
    "image_derivative",
]
