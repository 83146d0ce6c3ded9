"""Sample-adaptive offset (spec 8.7.3) as a whole-picture elementwise JAX op.

Per-CTB parameters are upsampled on the host to per-pixel maps; the device
computes band and edge offsets for every sample in one fused elementwise
program and selects by type.  Bit-exact counterpart of native/src/sao.cc.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# edge class neighbor offsets (dy, dx) pairs
EO_D = np.array([[[0, -1], [0, 1]],
                 [[-1, 0], [1, 0]],
                 [[-1, -1], [1, 1]],
                 [[1, -1], [-1, 1]]], dtype=np.int32)
EDGE_CAT = np.array([1, 2, 0, 3, 4], dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def sao_plane(src, type_map, eo_class_map, band_pos_map, offsets_map,
              skip_map, bit_depth: int = 8, edge_ok=None):
    """Apply SAO to one plane.

    src:          [H, W] int32 (deblocked input)
    type_map:     [H, W] int32 (0 none, 1 band, 2 edge)
    eo_class_map: [H, W] int32 (0..3)
    band_pos_map: [H, W] int32
    offsets_map:  [H, W, 4] int32 (sao offsets, already sign-applied/scaled)
    skip_map:     [H, W] bool (lossless/PCM samples to leave untouched)
    edge_ok:      optional [H, W] bool — False where an edge-offset neighbor
                  crosses a disabled slice/tile boundary (spec 8.7.3 filter
                  boundary rules, precomputed by edge_boundary_ok)
    """
    H, W = src.shape
    maxv = (1 << bit_depth) - 1
    shift = bit_depth - 5

    # --- band offset (gather-free: 4-way select) ---
    band_idx = src >> shift
    k = (band_idx - band_pos_map) & 31
    o = offsets_map
    band_off = jnp.where(k == 0, o[..., 0],
                         jnp.where(k == 1, o[..., 1],
                                   jnp.where(k == 2, o[..., 2],
                                             jnp.where(k == 3, o[..., 3], 0))))
    band_res = src + band_off

    # --- edge offset ---
    # neighbors via padded shifts; out-of-picture positions are masked below
    pad = jnp.pad(src, 1, mode="edge")

    def shifted(dy, dx):
        return jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (H, W))

    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    eo = eo_class_map
    # gather both neighbors for all 4 classes, select by class
    na = jnp.zeros_like(src)
    nb = jnp.zeros_like(src)
    valid = jnp.ones_like(src, dtype=bool)
    for cls in range(4):
        (dy0, dx0), (dy1, dx1) = EO_D[cls]
        sel = eo == cls
        na = jnp.where(sel, shifted(int(dy0), int(dx0)), na)
        nb = jnp.where(sel, shifted(int(dy1), int(dx1)), nb)
        v = ((yy + int(dy0) >= 0) & (yy + int(dy0) < H) &
             (xx + int(dx0) >= 0) & (xx + int(dx0) < W) &
             (yy + int(dy1) >= 0) & (yy + int(dy1) < H) &
             (xx + int(dx1) >= 0) & (xx + int(dx1) < W))
        valid = jnp.where(sel, v, valid)

    sgn = lambda a: jnp.sign(a).astype(jnp.int32)
    edge_idx = 2 + sgn(src - na) + sgn(src - nb)
    cat = jnp.asarray(EDGE_CAT)[edge_idx]
    edge_off = jnp.take_along_axis(
        offsets_map, jnp.clip(cat - 1, 0, 3)[..., None], axis=2)[..., 0]
    if edge_ok is not None:
        valid = valid & edge_ok
    edge_res = jnp.where((cat > 0) & valid, src + edge_off, src)

    out = jnp.where(type_map == 1, band_res,
                    jnp.where(type_map == 2, edge_res, src))
    out = jnp.clip(out, 0, maxv)
    return jnp.where(skip_map | (type_map == 0), src, out)


def edge_boundary_ok(emap, slice_addr, across_slices, tile_id, across_tiles,
                     ctb_size, H, W):
    """Host: per-pixel mask of edge-offset applicability across slice/tile
    boundaries (native/src/sao.cc neighbor_ok; spec 8.7.3).

    emap:          [H, W] eo class per pixel
    slice_addr:    [ctb_h, ctb_w] SliceAddrRs per CTB
    across_slices: [ctb_h, ctb_w] bool, loop_filter_across_slices of the
                   CTB's slice
    tile_id:       [ctb_h, ctb_w] tile id per CTB
    ctb_size:      CTB size in this channel's samples — an int, or a
                   (cs_y, cs_x) pair for anisotropic chroma (4:2:2)
    """
    cs_y, cs_x = ((ctb_size, ctb_size) if np.isscalar(ctb_size)
                  else tuple(ctb_size))
    yy = np.arange(H)[:, None] // cs_y
    xx = np.arange(W)[None, :] // cs_x
    A = slice_addr[yy, xx]
    L = across_slices[yy, xx]
    T = tile_id[yy, xx]

    def shifted(m, dy, dx):
        ys = np.clip(np.arange(H) + dy, 0, H - 1)
        xs = np.clip(np.arange(W) + dx, 0, W - 1)
        return m[ys[:, None], xs[None, :]]

    def ok(dy, dx):
        An = shifted(A, dy, dx)
        Ln = shifted(L, dy, dx)
        Tn = shifted(T, dy, dx)
        slice_ok = (An == A) | (L & Ln)
        tile_ok = across_tiles | (Tn == T)
        return slice_ok & tile_ok

    out = np.ones((H, W), dtype=bool)
    for cls in range(4):
        (dy0, dx0), (dy1, dx1) = EO_D[cls]
        m = ok(int(dy0), int(dx0)) & ok(int(dy1), int(dx1))
        out = np.where(emap == cls, m, out)
    return out


def upsample_ctb_params(sao_rec, c, ctb_w, ctb_h, ctb_size, H, W):
    """Host: expand per-CTB SaoParams records to per-pixel maps for channel c.

    ctb_size is the CTB extent in this channel's samples — an int, or a
    (cs_y, cs_x) pair for anisotropic chroma geometry (4:2:2).
    """
    cs_y, cs_x = ((ctb_size, ctb_size) if np.isscalar(ctb_size)
                  else tuple(ctb_size))
    tmap = np.zeros((H, W), dtype=np.int32)
    emap = np.zeros((H, W), dtype=np.int32)
    bmap = np.zeros((H, W), dtype=np.int32)
    omap = np.zeros((H, W, 4), dtype=np.int32)
    types = sao_rec["type_idx"][:, c].reshape(ctb_h, ctb_w)
    eocls = sao_rec["eo_class"][:, c].reshape(ctb_h, ctb_w)
    bpos = sao_rec["band_pos"][:, c].reshape(ctb_h, ctb_w)
    offs = sao_rec["offset"][:, c, :].reshape(ctb_h, ctb_w, 4)

    def up(a):
        return np.repeat(np.repeat(a, cs_y, 0), cs_x, 1)[:H, :W]

    tmap = up(types).astype(np.int32)
    emap = up(eocls).astype(np.int32)
    bmap = up(bpos).astype(np.int32)
    omap = np.repeat(np.repeat(offs, cs_y, 0), cs_x, 1)[:H, :W].astype(np.int32)
    return tmap, emap, bmap, omap
