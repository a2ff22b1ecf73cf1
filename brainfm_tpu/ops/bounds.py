"""Boundary-condition index folding for spline sampling.

Semantics parity with the reference boundary transforms
(/root/reference/utils/interpol/bounds.py:25-89), which implement the
standard DCT/DST/DFT extension conventions of Thevenaz & Unser. Here each
condition is a pure vectorized function `i -> (index, sign)` usable inside
jit; the reference's class/enum dispatch is resolved statically in Python.

sign is {-1, 0, +1}: 0 marks out-of-bounds reads under the 'zero' bound and
node zeros under dst1; -1 marks antisymmetric reflections (dst1/dst2).
"""

from __future__ import annotations

import jax.numpy as jnp

BOUND_CODES = {
    "zero": 0, "zeros": 0,
    "replicate": 1, "nearest": 1,
    "dct1": 2, "mirror": 2,
    "dct2": 3, "reflect": 3,
    "dst1": 4, "antimirror": 4,
    "dst2": 5, "antireflect": 5,
    "dft": 6, "wrap": 6,
}


def bound_code(bound) -> int:
    if isinstance(bound, str):
        return BOUND_CODES[bound.lower()]
    return int(bound)


def apply_bound(i: jnp.ndarray, n: int, bound) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold integer node index `i` into [0, n-1] under boundary `bound`.

    Returns (index:int32, sign:float32). `n` and `bound` are static.
    """
    code = bound_code(bound)
    i = i.astype(jnp.int32)
    one = jnp.ones(i.shape, jnp.float32)

    if code == 0:  # zero
        sign = jnp.where((i < 0) | (i >= n), 0.0, 1.0)
        return jnp.clip(i, 0, n - 1), sign

    if code == 1:  # replicate
        return jnp.clip(i, 0, n - 1), one

    if code in (3, 5):  # dct2 / dst2 share the index map (period 2n)
        n2 = 2 * n
        idx = jnp.where(i < 0, n2 - 1 - jnp.remainder(-i - 1, n2), jnp.remainder(i, n2))
        idx = jnp.where(idx >= n, n2 - 1 - idx, idx)
        if code == 3:
            return idx, one
        # dst2 sign: odd reflection periods are negated
        j = jnp.where(i < 0, n - 1 - i, i)
        sign = jnp.where(jnp.remainder(j // n, 2) > 0, -1.0, 1.0)
        return idx, sign

    if code == 2:  # dct1 (mirror about first/last sample, period 2(n-1))
        if n == 1:
            return jnp.zeros(i.shape, jnp.int32), one
        n2 = 2 * (n - 1)
        idx = jnp.remainder(jnp.abs(i), n2)
        idx = jnp.where(idx >= n, n2 - idx, idx)
        return idx, one

    if code == 4:  # dst1 (antimirror; zeros at virtual nodes -1 and n)
        if n == 1:
            # reference Bound.transform returns None (identity, sign +1)
            # for singleton dims (utils/interpol/bounds.py:65-66)
            return jnp.zeros(i.shape, jnp.int32), one
        n2 = 2 * (n + 1)
        idx = jnp.where(i < 0, -i - 2, i)
        idx = jnp.remainder(idx, n2)
        idx = jnp.where(idx > n, n2 - 2 - idx, idx)
        idx = jnp.where(idx == -1, 0, idx)
        idx = jnp.where(idx == n, n - 1, idx)
        # sign
        j = jnp.where(i < 0, -i + (n - 1), i)
        j = jnp.remainder(j, n2)
        sign = jnp.where(j == 0, 0.0, 1.0)
        sign = jnp.where(jnp.remainder(j, n + 1) == n, 0.0, sign)
        sign = jnp.where(jnp.remainder(j // (n + 1), 2) > 0, -sign, sign)
        return jnp.clip(idx, 0, n - 1), sign

    if code == 6:  # dft (wrap)
        return jnp.remainder(i, n), one

    raise ValueError(f"unknown bound {bound}")
