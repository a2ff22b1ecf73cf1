"""Surface (cortical mesh) target deformation.

Parity with /root/reference/Generator/utils.py:479-534
(`read_and_deform_surface`): load the four FreeSurfer meshes from the
subject's .mat sidecar, push the vertices through the inverse affine and the
negative SVF, apply the sagittal-flip vertex remap and hemisphere swap.
Vertex counts vary per subject, so this runs as a host-callable on numpy +
one device interpolation; it is only active when the 'surface' task is on
(cfgs/generator/default.yaml:50).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.interp import trilinear3d


def load_surfaces_mat(path: str):
    """Load {Vlw,Flw,Vrw,Frw,Vlp,Flp,Vrp,Frp} from the .mat sidecar."""
    from scipy.io.matlab import loadmat

    mat = loadmat(path)
    return {k: np.asarray(mat[k]) for k in
            ("Vlw", "Flw", "Vrw", "Frw", "Vlp", "Flp", "Vrp", "Frp")}


def deform_surface_vertices(V, A, c2, Fneg):
    """One vertex set through inverse-affine + negative SVF
    (parity: utils.py:494-510)."""
    V = jnp.asarray(V, jnp.float32)
    A = jnp.asarray(A, jnp.float32)
    c2 = jnp.asarray(c2, jnp.float32)
    Ainv = jnp.linalg.inv(A)
    Vc = (V - c2) @ Ainv.T
    disp = trilinear3d(Fneg, Vc[:, 0] + c2[0], Vc[:, 1] + c2[1],
                       Vc[:, 2] + c2[2])
    return Vc + disp + c2


def deform_surfaces(surfs: dict, A, c2, Fneg, flip: bool, size):
    """All four meshes + flip handling (parity: utils.py:512-534)."""
    out = {}
    for k in ("Vlw", "Vrw", "Vlp", "Vrp"):
        # np.array (copy), not asarray: a jax.Array exports read-only
        # memory and the flip branch below mutates in place
        out[k] = np.array(deform_surface_vertices(surfs[k], A, c2, Fneg))
    for k in ("Flw", "Frw", "Flp", "Frp"):
        out[k] = np.asarray(surfs[k])
    if flip:
        for k in ("Vlw", "Vrw", "Vlp", "Vrp"):
            out[k][:, 0] = size[0] - 1 - out[k][:, 0]
        out["Vlw"], out["Vrw"] = out["Vrw"], out["Vlw"]
        out["Vlp"], out["Vrp"] = out["Vrp"], out["Vlp"]
        out["Flw"], out["Frw"] = out["Frw"], out["Flw"]
        out["Flp"], out["Frp"] = out["Frp"], out["Flp"]
    return out
