from .bounds import BOUND_CODES, apply_bound
from .splines import spline_weight, spline_grad
from .interp import interp3d, nearest3d, trilinear3d
from .resize import restrict_spline
from .pushpull import grid_pull, grid_push, grid_count, grid_grad, grid_hess
from .coeff import spline_coeff, spline_coeff_nd
from .resize import resize_spline, myzoom, myzoom_anisotropic, volume_resize
from .blur import gaussian_blur_3d, gaussian_kernel_1d
from .perlin import perlin_noise_3d, fractal_noise_3d, shape_3d, velocity_3d
from .fd import gradient_f, gradient_b, gradient_c, curl_3d
from .pde import advect_rhs, apply_neumann_bc
from .ode import odeint, odeint_adjoint, odeint_masked_final

__all__ = [
    "BOUND_CODES", "apply_bound", "spline_weight", "spline_grad",
    "interp3d", "nearest3d", "trilinear3d",
    "grid_pull", "grid_push", "grid_count", "grid_grad",
    "spline_coeff", "spline_coeff_nd",
    "resize_spline", "myzoom", "myzoom_anisotropic", "volume_resize",
    "gaussian_blur_3d", "gaussian_kernel_1d",
    "perlin_noise_3d", "fractal_noise_3d", "shape_3d", "velocity_3d",
    "gradient_f", "gradient_b", "gradient_c", "curl_3d",
    "advect_rhs", "apply_neumann_bc", "odeint", "odeint_adjoint",
    "odeint_masked_final", "grid_hess", "restrict_spline",
]
