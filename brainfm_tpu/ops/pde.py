"""Advection PDE right-hand side for pathology-shape evolution.

Parity with the reference advection operator for divergence-free velocity
(/root/reference/ShapeID/DiffEqs/pde.py:499-509 `Grad_div_free_vectorV`,
:563-660 `AdvDiffPDE` with perf_pattern='adv', V_type='vector_div_free',
BC='neumann' — the configuration the generator instantiates,
Generator/datasets.py:131-138): upwind differencing switched on the local
velocity sign, with replicate-padding Neumann boundary re-imposition on the
state before each RHS evaluation.
"""

from __future__ import annotations

import jax.numpy as jnp

from .fd import gradient_b, gradient_f


def apply_neumann_bc(c):
    """Replace the one-voxel boundary shell with its inner neighbour
    (parity: pde.py:588-611 ReplicationPad3d of the interior)."""
    inner = c[..., 1:-1, 1:-1, 1:-1]
    return jnp.pad(inner, [(0, 0)] * (c.ndim - 3) + [(1, 1)] * 3, mode="edge")


def upwind_gradient(c, v, axis_last_ndim: int):
    """Upwind derivative of c along one spatial axis: backward where v>0,
    forward where v<=0 (parity: pde.py:301-329 `Upwind`)."""
    df = gradient_f(c)[..., axis_last_ndim]
    db = gradient_b(c)[..., axis_last_ndim]
    flag = (v > 0).astype(c.dtype)
    return df * (1.0 - flag) + db * flag


def advect_rhs(c, vx, vy, vz, bc: str = "neumann"):
    """dC/dt = -(V . grad_upwind C) for div-free V (parity: pde.py:499-509,
    with set_BC applied to C first, pde.py:616-621)."""
    if bc in ("neumann", "cauchy", "dirichlet_neumann", "source_neumann"):
        c = apply_neumann_bc(c)
    cx = upwind_gradient(c, vx, 0)
    cy = upwind_gradient(c, vy, 1)
    cz = upwind_gradient(c, vz, 2)
    return -(vx * cx + vy * cy + vz * cz)
