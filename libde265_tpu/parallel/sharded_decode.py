"""Tile-sharded frame decode over a device mesh (the TPU analogue of the
reference's tile worker threads, /root/reference/libde265/decctx.cc:963-1061).

HEVC tiles partition a picture into independently-parseable rectangles: no
intra prediction, MV prediction or CABAC state crosses a tile boundary.  On
a TPU mesh that independence becomes *sharding*: each device reconstructs
one tile of the (rows x cols) grid from its own per-tile record batches (TUs, PUs, intra
super-waves), with the DPB replicated.

Loop filters are the only cross-tile coupling:

- ``loop_filter_across_tiles == False``: filters are gated at tile
  boundaries by the bitstream itself, so the whole decode is embarrassingly
  parallel — each shard runs the ordinary whole-frame program on its tile.
- ``loop_filter_across_tiles == True``: after per-tile reconstruction each
  shard exchanges an 8-pixel halo (plus filter-metadata grids) with its
  neighbours via ``lax.ppermute`` — one ICI hop — and then runs deblock +
  SAO on the halo-padded tile with *redundant boundary compute*: edges
  within 3 samples of the boundary are computed identically on both
  neighbours, so no mid-filter communication is needed.

The heavy lifting reuses the fused whole-picture program (`_frame_fn`): a
per-tile feed is constructed so that each tile decodes as if it were a small
picture, with motion vectors pre-biased by ``4 * tile_origin`` so frame-global
reference windows come out of tile-local cell coordinates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import fused_decode as fd
from ..decoder import FrameProgramData
from ..ops import transform as tx

# Halo width in luma pixels each side.  16 (two 8-px edge columns) keeps
# BOTH the luma and the 4:2:0 chroma deblock edge grids phase-aligned in the
# padded tile (chroma pad = 8 chroma px = one chroma edge column), and far
# exceeds the deblock reach (edge +-3 writes, +-4 reads).
HALO = 16


def tile_grid(prog: FrameProgramData):
    """Tile y/x-ranges (luma pixels) from the per-CTB tile-id grid.

    Returns (rows, cols): lists of (y0, y1) and (x0, x1).  HEVC tile grids
    are rectangular by construction (pps tile geometry), so the grid is the
    cartesian product rows x cols.
    """
    tid = prog.tile_id
    ctb = prog.ctb_size
    if tid is None or tid.size == 0:
        return [(0, prog.height)], [(0, prog.width)]
    row0 = tid[0]
    xb = [0]
    for i in range(1, len(row0)):
        if row0[i] != row0[i - 1]:
            xb.append(i * ctb)
    xb.append(prog.width)
    col0 = tid[:, 0]
    yb = [0]
    for i in range(1, len(col0)):
        if col0[i] != col0[i - 1]:
            yb.append(i * ctb)
    yb.append(prog.height)
    rows = [(yb[i], min(yb[i + 1], prog.height)) for i in range(len(yb) - 1)]
    cols = [(xb[i], min(xb[i + 1], prog.width)) for i in range(len(xb) - 1)]
    return rows, cols


def tile_columns(prog: FrameProgramData):
    """Tile x-ranges (luma pixels); requires a single row of tiles."""
    rows, cols = tile_grid(prog)
    if len(rows) != 1:
        raise ValueError("stream has multiple tile rows; use tile_grid")
    return cols


class _TileView:
    """prog-shaped shim over per-tile filtered record arrays for _bin_tus."""

    def __init__(self, tus, coeff_val, coeff_pos):
        self.tus = tus
        self.coeff_val = coeff_val
        self.coeff_pos = coeff_pos


def _bin_tus_tile(prog, sel, x_off_l, y_off_l, sub_x, sub_y):
    """Per-tile TU binning with tile-local coordinates."""
    tus = prog.tus[sel].copy()
    if len(tus):
        offx = np.where(tus["cidx"] == 0, x_off_l, x_off_l // sub_x)
        offy = np.where(tus["cidx"] == 0, y_off_l, y_off_l // sub_y)
        tus["x"] = tus["x"] - offx
        tus["y"] = tus["y"] - offy
    view = _TileView(tus, prog.coeff_val, prog.coeff_pos)
    view.width = prog.width
    view.scaling_factors = prog.scaling_factors
    return fd._bin_tus(view)


def _localize_intra_recs(irec, t, th, tw, R, C, sub_x, sub_y, tu_of,
                         tu_local_row):
    """Slice one tile's rows out of the whole-frame intra record array.

    Rows of other tiles keep the shared (step, slot) schedule but lose the
    valid bit; coordinates are rebased to tile-local ones; rrow is
    remapped to the tile-local residual-bin row.  The availability bits
    need no rebasing: intra prediction never crosses a tile boundary, so
    every available border sample of a kept block lies inside the tile.
    """
    out = irec.copy()
    if not len(irec):
        return out
    r, c = t // C, t % C
    cidx = irec[:, 8]
    sx = np.where(cidx == 0, 1, sub_x)
    sy = np.where(cidx == 0, 1, sub_y)
    gx = irec[:, 3] * sx
    gy = irec[:, 2] * sy
    mine = (np.clip(gx // tw, 0, C - 1) == c) & \
        (np.clip(gy // th, 0, R - 1) == r)
    out[:, 4] = np.where(mine, irec[:, 4], 0)
    out[:, 3] = np.where(mine, irec[:, 3] - (c * tw) // sx, 0)
    out[:, 2] = np.where(mine, irec[:, 2] - (r * th) // sy, 0)
    rr = irec[:, 5]
    new_rr = np.full(len(irec), -1, np.int32)
    for lg, sel_g in tu_of.items():
        m = mine & (irec[:, 9] == lg) & (rr >= 0)
        if m.any():
            gtu = sel_g[np.clip(rr[m], 0, len(sel_g) - 1)]
            new_rr[m] = tu_local_row[gtu]
    out[:, 5] = new_rr
    return out


def _exchange(x, h, axis_name, fwd, bwd, axis=-1):
    """Halo exchange along `axis`: [prev-neighbor tail | x | next head].

    fwd/bwd are the ppermute (src, dst) lattice pairs.  Devices without a
    neighbour receive zeros from ppermute, which the positional edge masks
    and bs=0 metadata then keep inert.
    """
    nd = x.ndim
    ax = axis % nd
    head = lax.slice_in_dim(x, 0, h, axis=ax)
    tail = lax.slice_in_dim(x, x.shape[ax] - h, x.shape[ax], axis=ax)
    from_prev = lax.ppermute(tail, axis_name, fwd)
    from_next = lax.ppermute(head, axis_name, bwd)
    return jnp.concatenate([from_prev, x, from_next], axis=ax)


def _halo_filter(planes, tf, std, axis_name, grid):
    """Deblock + SAO on the halo-padded tile (redundant boundary compute).

    Runs inside shard_map after per-tile reconstruction when
    loop_filter_across_tiles is on: halo exchange along the tile lattice
    (x within rows, then y within columns — the second pass carries the
    corner data transitively), then the ordinary whole-picture filter
    sections on the padded tile, then crop.
    """
    R, C = grid
    T = R * C
    th, tw = std["H"], std["W"]
    W_frame, H_frame = tw * C, th * R
    sub_x = max(std["sub_x"], 1)
    sub_y = max(std["sub_y"], 1)
    has_chroma = not std["mono"]
    hx, h4 = HALO, HALO // 4
    hcx, hcy = HALO // sub_x, HALO // sub_y
    twc = max(std["cw"], 1)
    thc = max(std["ch"], 1)

    fwd_x = [(t, t + 1) for t in range(T) if t % C != C - 1]
    bwd_x = [(t, t - 1) for t in range(T) if t % C != 0]
    fwd_y = [(t, t + C) for t in range(T - C)]
    bwd_y = [(t, t - C) for t in range(C, T)]

    def ex2(x, hy_, hx_, xaxis=-1, yaxis=-2):
        x = _exchange(x, hx_, axis_name, fwd_x, bwd_x, axis=xaxis)
        return _exchange(x, hy_, axis_name, fwd_y, bwd_y, axis=yaxis)

    y = ex2(planes[0], hx, hx)
    if has_chroma:
        cb = ex2(planes[1], hcy, hcx)
        cr = ex2(planes[2], hcy, hcx)

    g = {k: ex2(tf[k], h4, h4) for k in ("qp4", "nzc4", "dbf4", "cu4",
                                         "si4", "sa4", "ti4")}
    pu_idx = ex2(tf["pu_idx"], h4, h4)
    sao_m = {k: ex2(tf[k], h4, h4, xaxis=1, yaxis=0)
             for k in ("st4", "se4", "sb4", "so4")}

    pb_h, pbw = pu_idx.shape
    recs = tf["slice_recs"]
    gx0 = tf["gx0"][0]
    gy0 = tf["gy0"][0]

    # per-cell PU params from the halo'd index grid + unbiased PU table
    pidx = pu_idx.reshape(-1)
    covered = pidx >= 0
    pc = jnp.clip(pidx, 0)
    pu = tf["pu_raw"]
    cell = {"pf": jnp.where(covered, pu[pc, 4], 0)}
    for l in (0, 1):
        has = ((cell["pf"] >> l) & 1).astype(bool)
        cell[f"mv{l}x"] = jnp.where(has, pu[pc, 0 + 2 * l], 0)
        cell[f"mv{l}y"] = jnp.where(has, pu[pc, 1 + 2 * l], 0)
        cell[f"poc{l}"] = jnp.where(
            has, tf["ref_pocs"][jnp.clip(pu[pc, 5 + l], 0)], fd.NOREF)
    cell["slice"] = jnp.clip(pu[pc, 9], 0, std["n_slices"] - 1)

    # positional edge masks: the picture bounds are interior rows/columns
    # of the padded tile, invisible to the frame program's edge-0 drop
    gxv = gx0 - hx + 4 * jnp.arange(pbw)
    gyv = gy0 - hx + 4 * jnp.arange(pb_h)
    in_x = ((gxv >= 0) & (gxv < W_frame))[None, :]
    in_y = ((gyv >= 0) & (gyv < H_frame))[:, None]
    edge_x = ((gxv > 0) & (gxv < W_frame))[None, :]
    edge_y = ((gyv > 0) & (gyv < H_frame))[:, None]
    allow_xv = (edge_x & in_y).astype(jnp.int32)
    allow_xh = (in_x & edge_y).astype(jnp.int32)

    st2 = dict(std)
    st2.update(H=th + 2 * hx, W=tw + 2 * hx, ch=thc + 2 * hcy,
               cw=twc + 2 * hcx, ctb_size=4,
               across_tiles=True, multi_boundary=True,
               run_deblock=True, run_sao=True)
    feed2 = {"qp4": g["qp4"], "nzc4": g["nzc4"], "dbf4": g["dbf4"],
             "cu4": g["cu4"], "slice_idx": g["si4"],
             "slice_addr": g["sa4"], "tile_id": g["ti4"],
             "allow_xv": allow_xv, "allow_xh": allow_xh}

    skip4 = (g["cu4"] & 4) != 0
    if std["pcm_lf_disable"]:
        skip4 = skip4 | ((g["cu4"] & 2) != 0)

    planes2 = [y, cb, cr] if has_chroma else [y]
    if std["run_deblock"]:
        planes2 = fd._deblock_section(planes2, feed2, recs, cell, skip4, st2)

    if std["run_sao"]:
        from ..ops.sao import EO_D, sao_plane
        sidx4 = jnp.clip(g["si4"], 0, std["n_slices"] - 1)
        sao_on = [recs[sidx4, 4] != 0, recs[sidx4, 5] != 0]
        out = []
        for c in range(len(planes2)):
            ry = 4 if c == 0 else 4 // sub_y
            rx = 4 if c == 0 else 4 // sub_x
            Hc_pad, Wc_pad = planes2[c].shape
            Wc_frame = W_frame if c == 0 else W_frame // sub_x
            Hc_frame = H_frame if c == 0 else H_frame // sub_y
            bd = std["bd"] if c == 0 else std["bdc"]

            def up(a):
                return jnp.repeat(jnp.repeat(a, ry, 0),
                                  rx, 1)[:Hc_pad, :Wc_pad]

            on = sao_on[0 if c == 0 else 1].astype(jnp.int32)
            tmap = up(sao_m["st4"][:, :, c] * on)
            emap = up(sao_m["se4"][:, :, c])
            bmap = up(sao_m["sb4"][:, :, c])
            omap = jnp.repeat(jnp.repeat(sao_m["so4"][:, :, c], ry, 0),
                              rx, 1)[:Hc_pad, :Wc_pad]
            skip = up(skip4.astype(jnp.int32)).astype(bool)
            # picture-boundary validity on the (interior) global rows/cols
            gxc = (gx0 // (1 if c == 0 else sub_x) -
                   (hx if c == 0 else hcx) + jnp.arange(Wc_pad))
            gyc = (gy0 // (1 if c == 0 else sub_y) -
                   (hx if c == 0 else hcy) + jnp.arange(Hc_pad))
            eok = jnp.ones((Hc_pad, Wc_pad), bool)
            for cls in range(4):
                (dy0, dx0), (dy1, dx1) = EO_D[cls]
                v = (((gxc + int(dx0) >= 0) & (gxc + int(dx0) < Wc_frame) &
                      (gxc + int(dx1) >= 0) &
                      (gxc + int(dx1) < Wc_frame))[None, :] &
                     ((gyc + int(dy0) >= 0) & (gyc + int(dy0) < Hc_frame) &
                      (gyc + int(dy1) >= 0) &
                      (gyc + int(dy1) < Hc_frame))[:, None])
                eok = jnp.where(emap == cls, v, eok)
            out.append(sao_plane(planes2[c], tmap, emap, bmap, omap, skip,
                                 bit_depth=bd, edge_ok=eok))
        planes2 = out

    cropped = [planes2[0][hx:hx + th, hx:hx + tw]]
    if has_chroma:
        cropped += [p[hcy:hcy + thc, hcx:hcx + twc] for p in planes2[1:]]
    return tuple(cropped)


class ShardedTileDecoder:
    """Decode tiled frames with one tile column per mesh device.

    Usage::
        mesh = make_mesh(4)
        sd = ShardedTileDecoder(mesh)
        planes = sd.decode(prog)          # bit-exact vs the scalar oracle
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_dev = mesh.devices.size
        self.dpb = {}
        self._order = []

    # ---- host-side per-tile partitioning -------------------------------

    def _partition(self, prog):
        rows, cols = tile_grid(prog)
        R, C = len(rows), len(cols)
        T = R * C
        if T != self.n_dev:
            raise ValueError(f"{T} tiles ({R}x{C}) vs {self.n_dev} devices")
        tw = cols[0][1] - cols[0][0]
        th = rows[0][1] - rows[0][0]
        if any(x1 - x0 != tw for x0, x1 in cols) or \
                any(y1 - y0 != th for y0, y1 in rows):
            raise ValueError("non-uniform tile sizes unsupported")

        H, W = prog.height, prog.width
        has_chroma = prog.chroma_width > 0
        sub_x = W // prog.chroma_width if has_chroma else 1
        sub_y = H // prog.chroma_height if has_chroma else 1

        # whole-frame TU binning (for intra rrow mapping)
        bins_w, tl_w, tr_w = fd._bin_tus(prog)
        if prog.ip is not None:
            irec_w, n_steps, nsteps_pc = fd._intra_records_native(prog)
        elif len(prog.intras):
            irec_w, n_steps, nsteps_pc = fd._plan_intra(prog, tl_w, tr_w)
        else:
            irec_w = np.zeros((0, fd.IREC_COLS), np.int32)
            n_steps, nsteps_pc = 0, np.zeros(3, np.int32)

        # map whole-frame (lg, bin row) -> global tu index
        tu_of = {}
        for lg in bins_w:
            sel = np.nonzero(prog.tus["log2_size"] == lg)[0]
            tu_of[lg] = sel

        # tile (row-major index) of each TU
        if len(prog.tus):
            lum = prog.tus["cidx"] == 0
            tu_x_l = np.where(lum, prog.tus["x"], prog.tus["x"] * sub_x)
            tu_y_l = np.where(lum, prog.tus["y"], prog.tus["y"] * sub_y)
            tu_tile = (np.clip(tu_y_l // th, 0, R - 1) * C +
                       np.clip(tu_x_l // tw, 0, C - 1))
        else:
            tu_tile = np.zeros(0, np.int32)

        # per-tile, per-lg local bin row of each global TU
        tu_local_row = np.full(len(prog.tus), -1, np.int32)
        for lg in (2, 3, 4, 5):
            for t in range(T):
                sel = np.nonzero((prog.tus["log2_size"] == lg) &
                                 (tu_tile == t))[0]
                tu_local_row[sel] = np.arange(len(sel))

        per_tile = []
        for t in range(T):
            y0, y1 = rows[t // C]
            x0, x1 = cols[t % C]
            sel = np.nonzero(tu_tile == t)[0] if len(prog.tus) else \
                np.zeros(0, np.int64)
            bins, _, _ = _bin_tus_tile(prog, sel, x0, y0, sub_x, sub_y)
            xs = _localize_intra_recs(irec_w, t, th, tw, R, C, sub_x, sub_y,
                                      tu_of, tu_local_row)
            pus = prog.pus.copy()
            if len(pus):
                for l in (0, 1):
                    pus[f"mv{l}x"] = pus[f"mv{l}x"] + 4 * x0
                    pus[f"mv{l}y"] = pus[f"mv{l}y"] + 4 * y0
            per_tile.append({"bins": bins, "irec": xs, "pus": pus,
                             "x0": x0, "x1": x1, "y0": y0, "y1": y1})
        return (per_tile, (R, C), (th, tw), sub_x, sub_y, n_steps,
                nsteps_pc, irec_w)

    # ---- device feeds ---------------------------------------------------

    def decode(self, prog: FrameProgramData):
        (per_tile, (R, C), (th, tw), sub_x, sub_y, n_steps, nsteps_pc,
         irec_w) = self._partition(prog)
        T = len(per_tile)
        H, W = prog.height, prog.width
        has_chroma = prog.chroma_width > 0
        bd = prog.bit_depth[0]
        bdc = prog.bit_depth[1] if has_chroma else bd
        twc = tw // sub_x
        thc = th // sub_y

        # replicated reference stacks (unpadded: XLA gather path)
        refs, slot_map = self._refs(prog)

        # --- stacked per-tile feeds [T, ...] ---
        caps = {}
        for pt in per_tile:
            for lg, b in pt["bins"].items():
                caps[f"tu{lg}"] = max(caps.get(f"tu{lg}", 1), b["n"])
                caps[f"co{lg}"] = max(caps.get(f"co{lg}", 1), len(b["cv"]))
                for ch in ("y", "cb", "cr"):
                    caps[f"sc{lg}{ch}"] = max(caps.get(f"sc{lg}{ch}", 0),
                                              len(b[f"sc_{ch}"]))
        lgs = sorted({lg for pt in per_tile for lg in pt["bins"]})
        intra_keys = sorted(
            {(fd._PLANE_CLASS[int(c)], int(lg)) for c, lg in
             zip(irec_w[:, 8], irec_w[:, 9])}) if len(irec_w) else []

        feed = {}

        def stack(name, arrs):
            feed[name] = jnp.asarray(np.stack(arrs))

        z0 = np.zeros(0, np.int32)

        def bin_fld(pt, lg, fld):
            if lg not in pt["bins"]:
                return z0
            b = pt["bins"][lg]
            if fld in b:
                return b[fld]
            # derive the unpacked coefficient views from the wire-compact
            # byte-entry stream (delta positions, zero bytes advance by 15;
            # _bin_tus / fused_decode._expand_feed counterpart)
            s = 1 << lg
            cv = b["cv"].astype(np.int64)
            ent = np.stack([(cv >> (8 * h)) & 0xFF for h in range(4)],
                           axis=1).reshape(-1).astype(np.int32)
            val = ((ent >> 4) ^ 8) - 8
            step = np.where(val == 0, 15, (ent & 0xF) + 1)
            coff = b["coff"]
            crow = np.repeat(np.arange(len(coff) - 1, dtype=np.int32),
                             np.diff(coff))
            C = np.cumsum(step)
            Cexcl = np.concatenate([[0], C])
            pos = C - Cexcl[coff[crow]] - 1
            if fld == "cval":
                # fold the |val|>7 escape corrections back in (host-side:
                # this path scatters full-precision cval directly)
                for fx, dv in zip(b.get("cfx", z0), b.get("cfv", z0)):
                    r, p = int(fx) // (s * s), int(fx) % (s * s)
                    lo, hi = int(coff[r]), int(coff[r + 1])
                    j = np.nonzero((pos[lo:hi] == p) & (val[lo:hi] != 0))[0]
                    if len(j):
                        val[lo + j[0]] += int(dv)
                return val
            if fld == "cpos":
                p10 = np.clip(pos, 0, s * s - 1)
                return ((p10 // s) << 6) | (p10 % s)
            # zero (advance/pad) bytes emit nothing: mask from the scatter
            return np.where(val != 0, crow, 1 << 30)

        for lg in lgs:
            tcap, ccap = caps[f"tu{lg}"], 4 * caps[f"co{lg}"]
            for fld, cap, fill in (("qp", tcap, 0), ("flags", tcap, 0),
                                   ("mid", tcap, 0), ("cval", ccap, 0),
                                   ("cpos", ccap, 0),
                                   ("crow", ccap, 1 << 30)):
                stack(f"bin{lg}.{fld}", [
                    fd._pad_rows(bin_fld(pt, lg, fld), cap, fill=fill)
                    for pt in per_tile])
            for ch in ("y", "cb", "cr"):
                cap = caps[f"sc{lg}{ch}"]
                stack(f"bin{lg}.sc_{ch}", [
                    fd._pad_rows(pt["bins"][lg][f"sc_{ch}"] if lg in
                                 pt["bins"] else np.zeros((0, 3), np.int32),
                                 cap, fill=-1) for pt in per_tile])

        stack("irec", [pt["irec"] for pt in per_tile])

        # PU/cell data
        pcap = max(max((len(pt["pus"]) for pt in per_tile), default=1), 1)
        pu_arrs = []
        for pt in per_tile:
            pu = np.zeros((pcap, 10), np.int32)
            p = pt["pus"]
            if len(p):
                pu[:len(p), 0] = p["mv0x"]
                pu[:len(p), 1] = p["mv0y"]
                pu[:len(p), 2] = p["mv1x"]
                pu[:len(p), 3] = p["mv1y"]
                pu[:len(p), 4] = p["pred_flags"]
                for l in (0, 1):
                    slot = np.array([slot_map.get(int(v), 0)
                                     for v in p[f"ref_dpb{l}"]], np.int32)
                    pu[:len(p), 5 + l] = slot
                    pu[:len(p), 7 + l] = np.maximum(
                        p[f"ref_idx{l}"].astype(np.int32), 0)
                pu[:len(p), 9] = p["slice"]
            pu_arrs.append(pu)
        feed["pu"] = jnp.asarray(np.stack(pu_arrs))

        tw4, th4 = tw // 4, th // 4

        def tile_slice4(g):
            return [g[pt["y0"] // 4:pt["y0"] // 4 + th4,
                      pt["x0"] // 4:pt["x0"] // 4 + tw4] for pt in per_tile]

        stack("pu_idx", tile_slice4(prog.pu_idx))
        feed["ref_pocs"] = jnp.asarray(np.broadcast_to(np.array(
            [prog.ref_pocs[i] if i < len(prog.ref_pocs) else fd.NOREF
             for i in range(fd.MAX_REFS)], np.int32), (T, fd.MAX_REFS)))

        # grids (per-4x4 and per-CTB), sliced per tile
        g4 = {"qp4": prog.qp_y, "nzc4": prog.nonzero_coeff,
              "dbf4": prog.deblock_flags, "cu4": prog.cu_info}
        for name, g in g4.items():
            stack(name, tile_slice4(g.astype(np.int32)))
        ctb = prog.ctb_size
        twc_ctb, thc_ctb = tw // ctb, th // ctb

        def tile_slice_ctb(g):
            return [g[pt["y0"] // ctb:pt["y0"] // ctb + thc_ctb,
                      pt["x0"] // ctb:pt["x0"] // ctb + twc_ctb]
                    for pt in per_tile]

        for name, g in (("slice_idx", prog.slice_idx),
                        ("slice_addr", prog.slice_addr),
                        ("tile_id", prog.tile_id)):
            stack(name, tile_slice_ctb(g.astype(np.int32)))
        if prog.sao is not None and len(prog.sao):
            sh = prog.slice_idx.shape
            for name, fld, extra in (("sao_t", "type_idx", ()),
                                     ("sao_eo", "eo_class", ()),
                                     ("sao_band", "band_pos", ()),
                                     ("sao_off", "offset", (4,))):
                g = prog.sao[fld].astype(np.int32).reshape(*sh, 3, *extra)
                stack(name, tile_slice_ctb(g))
        else:
            sh = (thc_ctb, twc_ctb)
            for name, extra in (("sao_t", ()), ("sao_eo", ()),
                                ("sao_band", ()), ("sao_off", (4,))):
                feed[name] = jnp.zeros((T, *sh, 3, *extra), jnp.int32)

        for c in range(3):
            feed[f"pcm{c}"] = jnp.zeros((T, 0, 2), jnp.int32)
        if prog.pcms is not None and len(prog.pcms):
            raise NotImplementedError("PCM blocks in sharded decode")

        n_slices = max(len(prog.slice_records), 1)
        recs = np.zeros((n_slices, 208), np.int32)
        recs[:len(prog.slice_records)] = prog.slice_records
        feed["slice_recs"] = jnp.asarray(np.broadcast_to(
            recs, (T, *recs.shape)))
        feed["nsteps"] = jnp.asarray(np.broadcast_to(
            nsteps_pc.astype(np.int32), (T, 3)))
        feed["mc_on"] = jnp.asarray(np.broadcast_to(np.array(
            [1 if len(prog.pus) else 0], np.int32), (T, 1)))

        st = tuple(sorted({
            "H": th, "W": tw, "sub_x": sub_x, "sub_y": sub_y,
            "cw": max(twc, 1), "ch": max(thc, 1),
            "bd": bd, "bdc": bdc, "mono": not has_chroma,
            "ctb_size": ctb, "n_slices": n_slices,
            "use_l1": bool((prog.pus["pred_flags"] & 2).any())
            if len(prog.pus) else False,
            "has_inter": len(prog.pus) > 0,
            "scaling": False, "lgs": tuple(lgs),
            "pcm_lf_disable": bool(prog.pcm_loop_filter_disable),
            "across_tiles": bool(prog.across_tiles),
            "multi_boundary": True,
            "run_deblock": bool(len(prog.slice_records) and
                                not np.all(prog.slice_records[:, 1])),
            "run_sao": bool(len(prog.slice_records) and
                            np.any(prog.slice_records[:, 4] |
                                   prog.slice_records[:, 5])),
            "pallas_mc": False, "segk": 1,
            "steps_cap": max(n_steps, 1),
            "intra_bins": tuple(intra_keys),
        }.items()))

        std = dict(st)
        halo_mode = prog.across_tiles and (std["run_deblock"] or
                                           std["run_sao"])
        if halo_mode:
            # mode B: reconstruct unfiltered per tile, then halo-exchange
            # and filter with redundant boundary compute
            st = tuple(sorted({**std, "run_deblock": False,
                               "run_sao": False}.items()))
            if len(prog.slice_records) and not np.all(
                    prog.slice_records[:, 9]):
                raise NotImplementedError(
                    "across-tiles halo filtering with slice-gated filters")
            self._add_filter_feed(feed, prog, per_tile, th, tw, sub_x,
                                  sub_y, slot_map)

        planes = self._run_sharded(refs, feed, st, (R, C), halo=halo_mode,
                                   std=std)
        out = tuple(jnp.concatenate(
            [jnp.concatenate([p[r * C + c] for c in range(C)], axis=-1)
             for r in range(R)], axis=-2) for p in planes)
        self._store(prog.poc, out)
        return out

    def _add_filter_feed(self, feed, prog, per_tile, th, tw, sub_x, sub_y,
                         slot_map):
        """Extra per-tile feeds for the halo filter pass (cell-resolution
        slice/tile grids, cell-resolution SAO maps, unbiased PU table,
        per-tile global x/y offsets)."""
        T = len(per_tile)
        ctb = prog.ctb_size
        cs4 = ctb // 4
        tw4, th4 = tw // 4, th // 4
        ph = prog.pu_idx.shape[0]

        def up4(g):
            return np.repeat(np.repeat(g.astype(np.int32), cs4, 0),
                             cs4, 1)[:ph]

        def tslice(gu):
            return [gu[pt["y0"] // 4:pt["y0"] // 4 + th4,
                       pt["x0"] // 4:pt["x0"] // 4 + tw4]
                    for pt in per_tile]

        for name, g in (("sa4", prog.slice_addr), ("ti4", prog.tile_id),
                        ("si4", prog.slice_idx)):
            feed[name] = jnp.asarray(np.stack(tslice(up4(g))))
        ctb_h, ctb_w = prog.slice_idx.shape
        if prog.sao is not None and len(prog.sao):
            sh = (ctb_h, ctb_w)
            for name, fld, extra in (("st4", "type_idx", ()),
                                     ("se4", "eo_class", ()),
                                     ("sb4", "band_pos", ()),
                                     ("so4", "offset", (4,))):
                g = prog.sao[fld].astype(np.int32).reshape(*sh, 3, *extra)
                gu = np.repeat(np.repeat(g, cs4, 0), cs4, 1)[:ph]
                feed[name] = jnp.asarray(np.stack(tslice(gu)))
        else:
            for name, extra in (("st4", ()), ("se4", ()), ("sb4", ()),
                                ("so4", (4,))):
                feed[name] = jnp.zeros((T, th4, tw4, 3, *extra), jnp.int32)
        # unbiased PU table (filters need frame-consistent MVs)
        pcap = feed["pu"].shape[1]
        pu = np.zeros((pcap, 10), np.int32)
        p = prog.pus
        if len(p):
            pu[:len(p), 0] = p["mv0x"]
            pu[:len(p), 1] = p["mv0y"]
            pu[:len(p), 2] = p["mv1x"]
            pu[:len(p), 3] = p["mv1y"]
            pu[:len(p), 4] = p["pred_flags"]
            for l in (0, 1):
                slot = np.array([slot_map.get(int(v), 0)
                                 for v in p[f"ref_dpb{l}"]], np.int32)
                pu[:len(p), 5 + l] = slot
                pu[:len(p), 7 + l] = np.maximum(
                    p[f"ref_idx{l}"].astype(np.int32), 0)
            pu[:len(p), 9] = p["slice"]
        feed["pu_raw"] = jnp.asarray(np.broadcast_to(pu, (T, *pu.shape)))
        feed["gx0"] = jnp.asarray(np.array(
            [[pt["x0"]] for pt in per_tile], np.int32))
        feed["gy0"] = jnp.asarray(np.array(
            [[pt["y0"]] for pt in per_tile], np.int32))

    def _run_sharded(self, refs, feed, st, grid, halo=False, std=None):
        mesh, axis = self.mesh, self.axis
        shard = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        feed = {k: jax.device_put(v, shard) for k, v in feed.items()}
        refs = [jax.device_put(r, repl) for r in refs]

        @jax.jit
        def run(refs_y, refs_cb, refs_cr, feed):
            def body(ry, rcb, rcr, tile_feed):
                tf = {k: v[0] for k, v in tile_feed.items()}
                f = {}
                for k, v in tf.items():
                    parts = k.split(".")
                    if parts[0].startswith("bin"):
                        f.setdefault(parts[0], {})[parts[1]] = v
                    else:
                        f[k] = v
                planes = fd._frame_fn(ry, rcb, rcr, f, None, dict(st))
                if halo:
                    planes = _halo_filter(planes, tf, std, axis, grid)
                return tuple(p[None] for p in planes)

            from jax.experimental.shard_map import shard_map
            specs = jax.tree.map(lambda _: P(axis), feed)
            return shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), specs),
                out_specs=P(axis),
                check_rep=False)(refs_y, refs_cb, refs_cr, feed)

        return run(refs[0], refs[1], refs[2], feed)

    # ---- DPB ------------------------------------------------------------

    def _refs(self, prog):
        pocs = list(prog.ref_pocs)
        slot_map = {}
        stack = [[], [], []]
        H, W = prog.height, prog.width
        cw = max(prog.chroma_width, 1)
        ch = max(prog.chroma_height, 1)
        for i, poc in enumerate(pocs[:fd.MAX_REFS]):
            if poc in self.dpb:
                planes = self.dpb[poc]
            else:
                planes = [jnp.full((H, W), 1 << (prog.bit_depth[0] - 1),
                                   jnp.int32)]
                if prog.chroma_width:
                    planes = planes + [
                        jnp.full((ch, cw), 1 << (prog.bit_depth[c] - 1),
                                 jnp.int32) for c in (1, 2)]
            slot_map[i] = len(stack[0])
            for c in range(3):
                stack[c].append(planes[c] if c < len(planes)
                                else jnp.zeros((1, 1), jnp.int32))
        z = jnp.zeros((H, W), jnp.int32)
        zc = jnp.zeros((ch, cw), jnp.int32)
        while len(stack[0]) < fd.MAX_REFS:
            stack[0].append(z)
            stack[1].append(zc)
            stack[2].append(zc)
        return [jnp.stack(s) for s in stack], slot_map

    def _store(self, poc, planes):
        self.dpb[poc] = planes
        self._order.append(poc)
        if len(self._order) > 17:
            old = self._order.pop(0)
            if old in self.dpb and old not in self._order:
                del self.dpb[old]
