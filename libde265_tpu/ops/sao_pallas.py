"""Pallas TPU kernel for the SAO per-sample filter core.

The XLA version (ops/sao.py sao_plane) is a chain of ~15 elementwise ops over
five full-picture maps; XLA fuses most of it, but each fusion still streams
HBM.  This kernel evaluates the whole decision tree (band offset, edge
offset, category select, clip, skip) in one VMEM pass on (8, 128) VPU tiles.

Neighbor samples (na/nb) and all per-pixel parameter maps are precomputed as
plain arrays, so the kernel body is branch-free elementwise math — the shape
Pallas/VPU wants.  Gathers are avoided by passing the four offsets as
separate planes and selecting by comparison.

Bit-exact counterpart of the jnp path; selected by ops.sao.sao_plane when
running on a TPU backend (interpret mode elsewhere keeps tests hermetic).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 8
_TILE_W = 128


def _kernel(src, na, nb, tmap, bmap, o0, o1, o2, o3, keep, edge_ok, out,
            *, bit_depth: int):
    maxv = (1 << bit_depth) - 1
    shift = bit_depth - 5
    s = src[:]

    # --- band offset: k = (band - pos) & 31, offset if k < 4 ---
    k = (s >> shift) - bmap[:]
    k = jnp.bitwise_and(k, 31)
    boff = jnp.where(k == 0, o0[:],
                     jnp.where(k == 1, o1[:],
                               jnp.where(k == 2, o2[:],
                                         jnp.where(k == 3, o3[:], 0))))
    band = s + boff

    # --- edge offset: category from two neighbor sign comparisons ---
    sa = jnp.sign(s - na[:])
    sb = jnp.sign(s - nb[:])
    eidx = 2 + sa + sb                     # 0..4
    # EDGE_CAT = [1, 2, 0, 3, 4]; offsets index cat-1
    eoff = jnp.where(eidx == 0, o0[:],
                     jnp.where(eidx == 1, o1[:],
                               jnp.where(eidx == 3, o2[:],
                                         jnp.where(eidx == 4, o3[:], 0))))
    eoff = jnp.where(edge_ok[:] != 0, eoff, 0)
    edge = s + eoff

    res = jnp.where(tmap[:] == 1, band, jnp.where(tmap[:] == 2, edge, s))
    res = jnp.clip(res, 0, maxv)
    out[:] = jnp.where(keep[:] != 0, s, res)


@functools.partial(jax.jit, static_argnames=("bit_depth", "interpret"))
def sao_plane_pallas(src, na, nb, tmap, bmap, offs4, keep, edge_ok,
                     bit_depth: int = 8, interpret: bool = False):
    """Apply the SAO core on one padded plane.

    src/na/nb:  [H, W] int32 (pre-filter samples + the two class neighbors)
    tmap:       [H, W] int32 (0 none, 1 band, 2 edge)
    bmap:       [H, W] int32 band positions
    offs4:      [4, H, W] int32 offsets (band: positions 0..3 of the band
                window; edge: categories 1..4)
    keep:       [H, W] int32, nonzero = leave sample untouched (skip/invalid)
    edge_ok:    [H, W] int32, zero = neighbor crosses a disabled boundary
    H and W must be multiples of (8, 128) — pad before, slice after.
    """
    H, W = src.shape
    grid = (H // _TILE_H, W // _TILE_W)
    spec = pl.BlockSpec((_TILE_H, _TILE_W),
                        lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, bit_depth=bit_depth),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        grid=grid,
        in_specs=[spec] * 11,
        out_specs=spec,
        interpret=interpret,
    )(src, na, nb, tmap, bmap, offs4[0], offs4[1], offs4[2], offs4[3],
      keep, edge_ok)


def sao_neighbors_jnp(src, emap):
    """In-graph (jit-able) neighbor/validity resolution for the kernel:
    returns (na, nb, valid) for per-pixel eo classes."""
    from .sao import EO_D

    H, W = src.shape
    pad = jnp.pad(src, 1, mode="edge")
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    na = jnp.zeros_like(src)
    nb = jnp.zeros_like(src)
    valid = jnp.zeros(src.shape, jnp.int32)
    for cls in range(4):
        dy0, dx0 = EO_D[cls][0]
        dy1, dx1 = EO_D[cls][1]
        a = jax.lax.dynamic_slice(pad, (1 + int(dy0), 1 + int(dx0)), (H, W))
        b = jax.lax.dynamic_slice(pad, (1 + int(dy1), 1 + int(dx1)), (H, W))
        sel = emap == cls
        na = jnp.where(sel, a, na)
        nb = jnp.where(sel, b, nb)
        v = ((ys + int(dy0) >= 0) & (ys + int(dy0) < H) &
             (ys + int(dy1) >= 0) & (ys + int(dy1) < H) &
             (xs + int(dx0) >= 0) & (xs + int(dx0) < W) &
             (xs + int(dx1) >= 0) & (xs + int(dx1) < W))
        valid = jnp.where(sel, v.astype(jnp.int32), valid)
    return na, nb, valid


def sao_plane_fused(plane, tmap, emap, bmap, omap, skip, bit_depth: int = 8,
                    edge_ok=None, interpret: bool = False):
    """In-graph drop-in for ops.sao.sao_plane built on the Pallas kernel.

    Unlike sao_plane_via_pallas (host numpy pre-pass), every input here is a
    traced array: the class-dependent neighbors and boundary validity are
    resolved with jnp ops that XLA fuses into the kernel's feed, so the
    whole SAO stage is one VMEM pass inside the fused frame program."""
    H, W = plane.shape
    na, nb, valid = sao_neighbors_jnp(plane, emap)
    ok = valid if edge_ok is None else valid * edge_ok.astype(jnp.int32)
    Hp = -(-H // _TILE_H) * _TILE_H
    Wp = -(-W // _TILE_W) * _TILE_W

    def pad(a):
        return jnp.pad(a, ((0, Hp - H), (0, Wp - W)))

    offs4 = jnp.stack([pad(omap[..., k]) for k in range(4)])
    out = sao_plane_pallas(pad(plane), pad(na), pad(nb), pad(tmap),
                           pad(bmap), offs4, pad(skip.astype(jnp.int32)),
                           pad(ok), bit_depth=bit_depth, interpret=interpret)
    return out[:H, :W]


def _pad(a, H, W):
    return np.pad(a, ((0, H - a.shape[0]), (0, W - a.shape[1])))


def sao_plane_via_pallas(src, type_map, eo_class_map, band_pos_map,
                         offsets_map, skip_map, bit_depth=8, edge_ok=None,
                         interpret=None):
    """Drop-in equivalent of ops.sao.sao_plane built on the Pallas kernel.

    Host-side: resolves the class-dependent neighbors into explicit na/nb
    arrays and the picture-boundary validity, pads to VPU tiles, runs the
    kernel, and crops.
    """
    from .sao import EO_D

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    src = np.asarray(src, dtype=np.int32)
    H, W = src.shape
    Hp = -(-H // _TILE_H) * _TILE_H
    Wp = -(-W // _TILE_W) * _TILE_W

    na = np.empty((H, W), np.int32)
    nb = np.empty((H, W), np.int32)
    valid = np.zeros((H, W), bool)
    ys, xs = np.arange(H), np.arange(W)
    for cls in range(4):
        (dy0, dx0), (dy1, dx1) = EO_D[cls]
        sel = np.asarray(type_map == 2) & (np.asarray(eo_class_map) == cls)
        a = src[np.clip(ys + dy0, 0, H - 1)[:, None],
                np.clip(xs + dx0, 0, W - 1)[None, :]]
        b = src[np.clip(ys + dy1, 0, H - 1)[:, None],
                np.clip(xs + dx1, 0, W - 1)[None, :]]
        na = np.where(sel, a, na)
        nb = np.where(sel, b, nb)
        v = ((ys[:, None] + dy0 >= 0) & (ys[:, None] + dy0 < H) &
             (ys[:, None] + dy1 >= 0) & (ys[:, None] + dy1 < H) &
             (xs[None, :] + dx0 >= 0) & (xs[None, :] + dx0 < W) &
             (xs[None, :] + dx1 >= 0) & (xs[None, :] + dx1 < W))
        valid = np.where(sel, v, valid)

    ok = valid if edge_ok is None else (valid & np.asarray(edge_ok))
    # keep = skip OR (edge sample with an invalid neighbor is handled by
    # zeroing the offset, so only skip_map forces pass-through)
    keep = np.asarray(skip_map).astype(np.int32)
    edge_ok32 = ok.astype(np.int32)

    out = sao_plane_pallas(
        jnp.asarray(_pad(src, Hp, Wp)),
        jnp.asarray(_pad(na, Hp, Wp)),
        jnp.asarray(_pad(nb, Hp, Wp)),
        jnp.asarray(_pad(np.asarray(type_map, np.int32), Hp, Wp)),
        jnp.asarray(_pad(np.asarray(band_pos_map, np.int32), Hp, Wp)),
        jnp.asarray(np.stack([_pad(np.asarray(offsets_map[..., k], np.int32),
                                   Hp, Wp) for k in range(4)])),
        jnp.asarray(_pad(keep, Hp, Wp)),
        jnp.asarray(_pad(edge_ok32, Hp, Wp)),
        bit_depth=bit_depth,
        interpret=interpret,
    )
    return np.asarray(out)[:H, :W]
