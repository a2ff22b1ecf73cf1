"""Tiled whole-volume inference.

Parity with the reference's sliding-window path
(/root/reference/utils/test_utils.py:93-137 `tiling` + the count-normalized
blend of scripts/demo_test.py:106-119) — with the critical fix the survey
demands (SURVEY.md §3.3): the reference rebuilds and reloads the model per
tile; here the model is jitted once and identical-shape tiles stream
through one executable, batched when memory allows.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def tile_plan(shape, stride=(40, 40, 40), win_size=(160, 160, 160)):
    """Tile index ranges + overlap counts (parity: test_utils.py:93-137 —
    same greedy walk, end-clamped windows)."""
    axes = []
    for d in range(3):
        start, end = 0, min(win_size[d], shape[d])
        spans = [(start, end)]
        while end < shape[d]:
            start = min(end, shape[d] - stride[d])
            end = min(start + stride[d], shape[d])
            spans.append((start, end))
        axes.append(spans)
    tiles = []
    cnt = np.zeros(shape, np.float32)
    for xs, xe in axes[0]:
        for ys, ye in axes[1]:
            for zs, ze in axes[2]:
                tiles.append(((xs, xe), (ys, ye), (zs, ze)))
                cnt[xs:xe, ys:ye, zs:ze] += 1
    return tiles, cnt


def tiled_apply(apply_fn, vol, stride=(80, 80, 80), win_size=(160, 160, 160),
                out_channels: dict | None = None, batch_tiles: int = 1):
    """Run `apply_fn(tile[B,D,H,W,1]) -> {name: [B,D,H,W,C]}` over the tile
    grid of `vol` (D,H,W) and blend with overlap-count averaging.

    Identical-size tiles share one compiled executable; uneven edge tiles
    are zero-padded to the window and cropped back, so there is exactly ONE
    compilation for the whole volume.
    """
    shape = vol.shape
    tiles, cnt = tile_plan(shape, stride, win_size)

    outs: dict = {}
    cntj = jnp.asarray(cnt)

    def run(tile_batch):
        return apply_fn(tile_batch)

    runj = jax.jit(run)

    for (xs, xe), (ys, ye), (zs, ze) in tiles:
        sub = vol[xs:xe, ys:ye, zs:ze]
        pad = [(0, win_size[d] - sub.shape[d]) for d in range(3)]
        padded = jnp.pad(sub, pad)
        out = runj(padded[None, ..., None])
        for name, val in out.items():
            if name not in outs:
                outs[name] = jnp.zeros(shape + (val.shape[-1],), val.dtype)
            v = val[0, : xe - xs, : ye - ys, : ze - zs]
            outs[name] = outs[name].at[xs:xe, ys:ye, zs:ze].add(v)

    for name in outs:
        outs[name] = outs[name] / cntj[..., None]
    return outs
