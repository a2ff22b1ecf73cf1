"""Spline sampling on deformed grids: pull / push / count / grad.

Capability parity with the reference interpol stack
(/root/reference/utils/interpol/api.py:137-331, iso0.py, iso1.py, nd.py):
arbitrary spline order 0-7 per dimension, all 7 boundary conditions,
optional extrapolation masking. The reference hand-unrolls TorchScript
kernels per order/dimension; here one generic formulation emits fused XLA
gathers (the corner loop is unrolled at trace time, static per
order/dim), and autodiff supplies the exact pull<->push adjoint pair the
reference implements by hand (autograd.py:125-303).

Array convention: channels-last. `inp` is (*spatial, C) or (*spatial,);
`grid` is (*out_spatial, ndim) in voxel coordinates.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp

from .bounds import apply_bound
from .splines import spline_grad, spline_hess, spline_weight


def _as_list(v, ndim):
    if isinstance(v, (list, tuple)):
        assert len(v) == ndim
        return list(v)
    return [v] * ndim


def _node_span(x, order: int):
    """First interpolation node and per-node offsets for a static order."""
    if order % 2 == 1:
        b0 = jnp.floor(x).astype(jnp.int32) - (order - 1) // 2
    else:
        b0 = jnp.floor(x + 0.5).astype(jnp.int32) - order // 2
    return b0


def _weights_indices(x, n, order, bound):
    """Per-dim lists of (index, combined weight) for each of the order+1 nodes."""
    b0 = _node_span(x, order)
    nodes, weights, grads = [], [], []
    for k in range(order + 1):
        node = b0 + k
        w = spline_weight(x - node.astype(x.dtype), order)
        g = spline_grad(x - node.astype(x.dtype), order)
        idx, sign = apply_bound(node, n, bound)
        nodes.append(idx)
        weights.append(w * sign)
        grads.append(g * sign)
    return nodes, weights, grads


def _inbounds_mask(grid, shape, extrapolate):
    if extrapolate:
        return None
    ndim = grid.shape[-1]
    ok = jnp.ones(grid.shape[:-1], bool)
    tiny = 5e-2
    for d in range(ndim):
        x = grid[..., d]
        ok &= (x >= -tiny) & (x <= shape[d] - 1 + tiny)
    return ok


def _prep(inp, grid):
    ndim = grid.shape[-1]
    squeeze = inp.ndim == ndim
    if squeeze:
        inp = inp[..., None]
    spatial = inp.shape[:-1]
    assert len(spatial) == ndim, f"input spatial rank {len(spatial)} != grid dim {ndim}"
    return inp, spatial, ndim, squeeze


def grid_pull(inp, grid, interpolation=1, bound="zero", extrapolate=True):
    """Sample `inp` at `grid` (parity: utils/interpol/api.py:137-200).

    inp: (*spatial, C) or (*spatial,); grid: (*out, ndim) voxel coords.
    """
    inp, spatial, ndim, squeeze = _prep(inp, grid)
    orders = _as_list(interpolation, ndim)
    bounds = _as_list(bound, ndim)
    C = inp.shape[-1]
    flat = inp.reshape(-1, C)

    per_dim = [
        _weights_indices(grid[..., d], spatial[d], orders[d], bounds[d])[:2]
        for d in range(ndim)
    ]
    strides = []
    s = 1
    for d in reversed(range(ndim)):
        strides.insert(0, s)
        s *= spatial[d]

    out = jnp.zeros(grid.shape[:-1] + (C,), inp.dtype)
    for corner in itertools.product(*[range(len(per_dim[d][0])) for d in range(ndim)]):
        idx = 0
        w = None
        for d, k in enumerate(corner):
            idx = idx + per_dim[d][0][k] * strides[d]
            wk = per_dim[d][1][k]
            w = wk if w is None else w * wk
        out = out + jnp.take(flat, idx, axis=0) * w[..., None]

    ok = _inbounds_mask(grid, spatial, extrapolate)
    if ok is not None:
        out = jnp.where(ok[..., None], out, 0.0)
    if squeeze:
        out = out[..., 0]
    return out


def grid_push(inp, grid, shape=None, interpolation=1, bound="zero", extrapolate=True):
    """Splat `inp` at `grid` into a volume of `shape` — the adjoint of pull
    (parity: utils/interpol/api.py:203-252)."""
    ndim = grid.shape[-1]
    squeeze = inp.shape == grid.shape[:-1]
    if squeeze:
        inp = inp[..., None]
    assert inp.shape[:-1] == grid.shape[:-1], "push input must match grid spatial shape"
    if shape is None:
        shape = inp.shape[:-1]
    C = inp.shape[-1]
    orders = _as_list(interpolation, ndim)
    bounds = _as_list(bound, ndim)

    ok = _inbounds_mask(grid, shape, extrapolate)
    if ok is not None:
        inp = jnp.where(ok[..., None], inp, 0.0)

    per_dim = [
        _weights_indices(grid[..., d], shape[d], orders[d], bounds[d])[:2]
        for d in range(ndim)
    ]
    strides = []
    s = 1
    for d in reversed(range(ndim)):
        strides.insert(0, s)
        s *= shape[d]
    total = s

    flat_inp = inp.reshape(-1, C)
    out = jnp.zeros((total, C), inp.dtype)
    for corner in itertools.product(*[range(len(per_dim[d][0])) for d in range(ndim)]):
        idx = 0
        w = None
        for d, k in enumerate(corner):
            idx = idx + per_dim[d][0][k] * strides[d]
            wk = per_dim[d][1][k]
            w = wk if w is None else w * wk
        out = out.at[idx.reshape(-1)].add(flat_inp * w.reshape(-1, 1))

    out = out.reshape(tuple(shape) + (C,))
    if squeeze:
        out = out[..., 0]
    return out


def grid_count(grid, shape, interpolation=1, bound="zero", extrapolate=True):
    """Splat ones (parity: utils/interpol/api.py:253-289)."""
    ones = jnp.ones(grid.shape[:-1], jnp.float32)
    return grid_push(ones, grid, shape, interpolation, bound, extrapolate)


def grid_grad(inp, grid, interpolation=1, bound="zero", extrapolate=True):
    """Spatial gradients of the spline at `grid`
    (parity: utils/interpol/api.py:290-331). Returns (*out, C, ndim) or
    (*out, ndim) for channel-less input."""
    inp, spatial, ndim, squeeze = _prep(inp, grid)
    orders = _as_list(interpolation, ndim)
    bounds = _as_list(bound, ndim)
    C = inp.shape[-1]
    flat = inp.reshape(-1, C)

    per_dim = [
        _weights_indices(grid[..., d], spatial[d], orders[d], bounds[d])
        for d in range(ndim)
    ]
    strides = []
    s = 1
    for d in reversed(range(ndim)):
        strides.insert(0, s)
        s *= spatial[d]

    out = jnp.zeros(grid.shape[:-1] + (C, ndim), inp.dtype)
    for corner in itertools.product(*[range(len(per_dim[d][0])) for d in range(ndim)]):
        idx = 0
        for d, k in enumerate(corner):
            idx = idx + per_dim[d][0][k] * strides[d]
        vals = jnp.take(flat, idx, axis=0)
        for gdim in range(ndim):
            w = None
            for d, k in enumerate(corner):
                wk = per_dim[d][2][k] if d == gdim else per_dim[d][1][k]
                w = wk if w is None else w * wk
            out = out.at[..., gdim].add(vals * w[..., None])

    ok = _inbounds_mask(grid, spatial, extrapolate)
    if ok is not None:
        out = jnp.where(ok[..., None, None], out, 0.0)
    if squeeze:
        out = out[..., 0, :]
    return out


def grid_hess(inp, grid, interpolation=1, bound="zero", extrapolate=True):
    """Hessian of the interpolant wrt sampling coordinates
    (parity: utils/interpol/pushpull.py:207 grid_hess / iso1.hess3d).
    Returns (*out, C, ndim, ndim) or (*out, ndim, ndim) for channel-less
    input. Off-diagonals are grad x grad separable terms; diagonals use the
    second-derivative spline weights (zero a.e. for orders <2)."""
    inp, spatial, ndim, squeeze = _prep(inp, grid)
    orders = _as_list(interpolation, ndim)
    bounds = _as_list(bound, ndim)
    C = inp.shape[-1]
    flat = inp.reshape(-1, C)

    per_dim = []
    for d in range(ndim):
        x = grid[..., d]
        b0 = _node_span(x, orders[d])
        nodes, weights, grads, hesses = [], [], [], []
        for k in range(orders[d] + 1):
            node = b0 + k
            t = x - node.astype(x.dtype)
            idx, sign = apply_bound(node, spatial[d], bounds[d])
            nodes.append(idx)
            weights.append(spline_weight(t, orders[d]) * sign)
            grads.append(spline_grad(t, orders[d]) * sign)
            hesses.append(spline_hess(t, orders[d]) * sign)
        per_dim.append((nodes, weights, grads, hesses))

    strides = []
    s = 1
    for d in reversed(range(ndim)):
        strides.insert(0, s)
        s *= spatial[d]

    out = jnp.zeros(grid.shape[:-1] + (C, ndim, ndim), inp.dtype)
    for corner in itertools.product(
            *[range(len(per_dim[d][0])) for d in range(ndim)]):
        idx = 0
        for d, k in enumerate(corner):
            idx = idx + per_dim[d][0][k] * strides[d]
        vals = jnp.take(flat, idx, axis=0)
        for i in range(ndim):
            for j in range(i, ndim):
                w = None
                for d, k in enumerate(corner):
                    if d == i == j:
                        wk = per_dim[d][3][k]
                    elif d in (i, j):
                        wk = per_dim[d][2][k]
                    else:
                        wk = per_dim[d][1][k]
                    w = wk if w is None else w * wk
                out = out.at[..., i, j].add(vals * w[..., None])
                if j != i:
                    out = out.at[..., j, i].add(vals * w[..., None])

    ok = _inbounds_mask(grid, spatial, extrapolate)
    if ok is not None:
        out = jnp.where(ok[..., None, None, None], out, 0.0)
    if squeeze:
        out = out[..., 0, :, :]
    return out


def identity_grid(shape, dtype=jnp.float32):
    """Identity transformation field (*shape, dim)
    (parity: utils/interpol/api.py:455-476)."""
    mesh = jnp.meshgrid(*[jnp.arange(s, dtype=dtype) for s in shape],
                        indexing="ij")
    return jnp.stack(mesh, axis=-1)


def add_identity_grid(disp):
    """Displacement field -> transformation field
    (parity: utils/interpol/api.py:505-521)."""
    dim = disp.shape[-1]
    return disp + identity_grid(disp.shape[-dim - 1:-1], disp.dtype)


def affine_grid(mat, shape):
    """Dense transformation grid from an affine matrix (..., D[+1], D+1)
    (parity: utils/interpol/api.py:524-555)."""
    mat = jnp.asarray(mat)
    shape = tuple(shape)
    nb_dim = mat.shape[-1] - 1
    if nb_dim != len(shape):
        raise ValueError("affine matrix dimension does not match shape")
    if mat.shape[-2] not in (nb_dim, nb_dim + 1):
        raise ValueError("affine matrix must be (..., D|D+1, D+1)")
    batch = mat.shape[:-2]
    grid = identity_grid(shape, mat.dtype)
    lin = mat[..., :nb_dim, :nb_dim]
    off = mat[..., :nb_dim, -1]
    out = jnp.einsum("...ij,...j->...i",
                     lin.reshape(*batch, *(1,) * nb_dim, nb_dim, nb_dim),
                     grid) + off.reshape(*batch, *(1,) * nb_dim, nb_dim)
    return out
