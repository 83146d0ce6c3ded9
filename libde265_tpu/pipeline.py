"""Whole-picture JAX reconstruction pipeline.

Executes a FrameProgram with the batched device kernels:

  1. residuals for ALL TUs, size-binned (ops.transform)   [device]
  2. motion compensation for all PUs, size-binned (ops.mc) [device]
  3. inter-TU residual add                                  [host scatter]
  4. intra ops in decode order (ops.intra)                  [host, v2: wavefront]
  5. deblocking (ops.deblock)                               [device]
  6. SAO (ops.sao)                                          [device]

Inter prediction never reads the current picture, and intra neighbors are
final after steps 2-3, so this ordering is equivalent to the serial decode
order (see native/src/recon.cc).

All chroma geometries are supported (4:0:0/4:2:0/4:2:2/4:4:4): subsampling
factors are derived per axis from the program's plane dimensions, covering
chroma MV precision (8.5.3.2.2), anisotropic intra borders, the non-4:2:0
deblock chroma-QP mapping (8.7.2.5.5), and per-axis SAO CTB geometry.
"""
from __future__ import annotations

import numpy as np

from .decoder import (FrameProgramData, OP_INTRA, OP_RESIDUAL, OP_INTER,
                      TU_INTRA, TU_TQ_BYPASS, TU_RDPCM, TU_TRANSFORM_SKIP,
                      TU_USE_DST)
from .ops import deblock as dbk
from .ops import intra as intra_ops
from .ops import mc as mc_ops
from .ops import sao as sao_ops
from .ops import transform as tx

SLICE_TYPE_B, SLICE_TYPE_P, SLICE_TYPE_I = 0, 1, 2


def _compute_residuals(prog: FrameProgramData):
    """All TU residuals, size-binned on device. Returns {tu_index: [s,s] int32}."""
    out = {}
    tus = prog.tus
    if len(tus) == 0:
        return out
    # host fallback set: transquant bypass, and explicit RDPCM on
    # transform-skip TUs; RDPCM without transform-skip takes the normal
    # inverse-transform path (mirrors native/src/transform.cc)
    rdpcm_ts = ((tus["flags"] & TU_RDPCM) != 0) & \
               ((tus["flags"] & TU_TRANSFORM_SKIP) != 0)
    plain = ((tus["flags"] & TU_TQ_BYPASS) == 0) & ~rdpcm_ts
    for lg in (2, 3, 4, 5):
        sel = np.nonzero((tus["log2_size"] == lg) & plain)[0]
        if len(sel) == 0:
            continue
        levels = tx.scatter_coeffs(tus, prog.coeff_val, prog.coeff_pos, lg, sel)
        qp = tus["qp"][sel].astype(np.int32)
        fact = tx.qp_to_fact(qp)
        tskip = (tus["flags"][sel] & TU_TRANSFORM_SKIP) != 0
        use_dst = (tus["flags"][sel] & TU_USE_DST) != 0
        bd = prog.bit_depth[0]  # per-TU channel bd equal for 8-bit
        if prog.scaling_factors is not None:
            # per-TU matrix id (spec 7.4.5 / 8.6.3): cidx (+3 for inter,
            # except 32x32 which has only intra/inter luma matrices)
            cidx = tus["cidx"][sel].astype(np.int32)
            intra = (tus["flags"][sel] & TU_INTRA) != 0
            if lg == 5:
                mid = np.where(intra, 0, 1)
            else:
                mid = cidx + np.where(intra, 0, 3)
            sf = prog.scaling_factors[lg][mid].astype(np.int32)
            res = np.asarray(tx.residual_batch(levels, fact, tskip, use_dst,
                                               lg, bd, sf=sf, qp=qp))
        else:
            res = np.asarray(
                tx.residual_batch(levels, fact, tskip, use_dst, lg, bd))
        for k, t in enumerate(sel):
            out[int(t)] = res[k]
    # bypass / explicit-RDPCM TUs: host fallback (rare; RExt only)
    from .decoder import TU_RDPCM_VERTICAL
    for t in np.nonzero(~plain)[0]:
        tu = tus[t]
        lg = int(tu["log2_size"])
        s = 1 << lg
        block = np.zeros((s, s), dtype=np.int64)
        start, n = int(tu["coeff_start"]), int(tu["ncoeff"])
        pos = prog.coeff_pos[start:start + n]
        block[pos >> 6, pos & 63] = prog.coeff_val[start:start + n]
        axis = 0 if (tu["flags"] & TU_RDPCM_VERTICAL) else 1
        if tu["flags"] & TU_TQ_BYPASS:
            # transquant bypass: residual = levels (rdpcm: prefix sums)
            if tu["flags"] & TU_RDPCM:
                block = np.cumsum(block, axis=axis)
            out[int(t)] = block.astype(np.int32)
            continue
        # explicit RDPCM on a transform-skip TU: dequant (8.6.3) +
        # transform-skip scaling, then directional prefix sums
        # (native/src/transform.cc kTransformSkip+kRdpcm path)
        c = int(tu["cidx"])
        bd = prog.bit_depth[c]
        qp = min(max(int(tu["qp"]), 0), 75)
        bd_shift = bd + lg - 5
        if prog.scaling_factors is None:
            fact = np.int64(tx.LEVEL_SCALE[qp % 6]) << (qp // 6)
            bd_shift -= 4  # flat factor 16 folded into the shift
        else:
            intra = bool(tu["flags"] & TU_INTRA)
            mid = ((0 if intra else 1) if lg == 5
                   else c + (0 if intra else 3))
            sf = prog.scaling_factors[lg][mid].astype(np.int64)
            fact = (sf * int(tx.LEVEL_SCALE[qp % 6])) << (qp // 6)
        deq = np.clip((block * fact + (1 << (bd_shift - 1))) >> bd_shift,
                      -32768, 32767)
        bd_shift2 = max(20 - bd, 0)
        v = ((deq << (5 + lg)) + (1 << (bd_shift2 - 1))) >> bd_shift2
        out[int(t)] = np.cumsum(v, axis=axis).astype(np.int32)
    return out


def _apply_ccp(prog: FrameProgramData, residuals):
    """RExt cross-component prediction (spec 8.6.6): chroma residual +=
    (scale * luma_residual_term) >> 3, pairing each scaled chroma TU with the
    most recent luma TU in op order (4:4:4 only, identical geometry).

    Integer behavior replicates the reference decoder exactly
    (transform.cc:244-260 there): LOGICAL uint32 shifts for the luma term and
    int32 wraparound in the product — see native/src/transform.cc CCP hook.
    """
    tus = prog.tus
    if len(tus) == 0 or not (tus["cross_comp_scale"] != 0).any():
        return
    bd_y = prog.bit_depth[0]
    last_luma = -1
    for op in prog.ops:
        if op["kind"] != OP_RESIDUAL:
            continue
        t = int(op["idx"])
        tu = tus[t]
        if tu["cidx"] == 0:
            last_luma = t
            continue
        s = int(tu["cross_comp_scale"])
        if s == 0 or last_luma < 0:
            continue
        bd_c = prog.bit_depth[int(tu["cidx"])]
        r_y = residuals[last_luma].astype(np.uint32)
        term32 = ((r_y << np.uint32(bd_c)) >> np.uint32(bd_y))
        prod = (np.uint32(s & 0xFFFFFFFF) * term32).astype(np.int32)
        residuals[t] = (residuals[t] + (prod >> 3)).astype(np.int32)


def _motion_compensate(prog: FrameProgramData, planes):
    """Batched MC for all PUs; writes predictions into planes."""
    pus = prog.pus
    if len(pus) == 0:
        return
    recs = prog.slice_records
    H, W = prog.height, prog.width
    bd = prog.bit_depth[0]
    has_chroma = prog.chroma_width > 0
    sx = W // prog.chroma_width if has_chroma else 1
    sy = H // prog.chroma_height if has_chroma else 1
    # chroma MV precision: 1/8 chroma-pel on subsampled axes, else the luma
    # 1/4-pel doubled (spec 8.5.3.2.2; mirrors native/src/recon.cc)
    shx, shy = (3 if sx == 2 else 2), (3 if sy == 2 else 2)

    # group PUs by (w, h)
    keys = pus["w"].astype(np.int64) * 1000 + pus["h"]
    for key in np.unique(keys):
        sel = np.nonzero(keys == key)[0]
        w = int(pus["w"][sel[0]])
        h = int(pus["h"][sel[0]])
        n = len(sel)

        preds_l = [None, None]
        preds_c = [[None, None], [None, None]]  # [list][cb/cr]
        for l in range(2):
            used = ((pus["pred_flags"][sel] >> l) & 1).astype(bool)
            win = np.zeros((n, h + 7, w + 7), dtype=np.int32)
            fx = np.zeros(n, dtype=np.int32)
            fy = np.zeros(n, dtype=np.int32)
            winc = [np.zeros((n, h // sy + 3, w // sx + 3), dtype=np.int32)
                    for _ in range(2)]
            fcx = np.zeros(n, dtype=np.int32)
            fcy = np.zeros(n, dtype=np.int32)
            for k, i in enumerate(sel):
                if not used[k]:
                    continue
                pu = pus[i]
                ref = prog.ref_planes[pu[f"ref_dpb{l}"]]
                mvx, mvy = int(pu[f"mv{l}x"]), int(pu[f"mv{l}y"])
                x0 = int(pu["x"]) + (mvx >> 2)
                y0 = int(pu["y"]) + (mvy >> 2)
                fx[k], fy[k] = mvx & 3, mvy & 3
                win[k] = mc_ops.gather_windows(ref[0].astype(np.int32),
                                               [x0], [y0], w, h, 8, 3)[0]
                if not has_chroma:
                    continue
                cx = int(pu["x"]) // sx + (mvx >> shx)
                cy = int(pu["y"]) // sy + (mvy >> shy)
                fcx[k] = (mvx & 7) if sx == 2 else ((mvx & 3) << 1)
                fcy[k] = (mvy & 7) if sy == 2 else ((mvy & 3) << 1)
                for c in range(2):
                    winc[c][k] = mc_ops.gather_windows(
                        ref[1 + c].astype(np.int32), [cx], [cy], w // sx,
                        h // sy, 4, 1)[0]
            preds_l[l] = np.asarray(mc_ops.mc_luma_batch(win, fx, fy, w, h, bd))
            if has_chroma:
                for c in range(2):
                    preds_c[l][c] = np.asarray(mc_ops.mc_chroma_batch(
                        winc[c], fcx, fcy, w // sx, h // sy, bd))

        # merge params per PU
        bi = pus["pred_flags"][sel] == 3
        first = np.where((pus["pred_flags"][sel] & 1) != 0, 0, 1)
        sl = pus["slice"][sel]
        weighted = recs[sl, 6] != 0
        denom_l = recs[sl, 7]
        denom_c = recs[sl, 8]
        r0 = np.where(first == 0, pus["ref_idx0"][sel],
                      pus["ref_idx1"][sel]).astype(np.int64)
        r1 = np.maximum(pus["ref_idx1"][sel], 0).astype(np.int64)

        def wp(base, lst, ridx):
            return recs[sl, base + lst * 16 + ridx]

        def wpc(base, lst, ridx, c):
            return recs[sl, base + (lst * 16 + ridx) * 2 + c]

        p0 = np.where(first[:, None, None] == 0, preds_l[0], preds_l[1])
        p1 = preds_l[1]
        lw0 = wp(16, first, r0)
        lo0 = wp(48, first, r0)
        lw1 = wp(16, np.ones_like(first), r1)
        lo1 = wp(48, np.ones_like(first), r1)
        merged = np.asarray(mc_ops.pred_merge_batch(
            p0, p1, bi, weighted, lw0, lo0, lw1, lo1, denom_l, bd))
        for k, i in enumerate(sel):
            pu = pus[i]
            planes[0][pu["y"]:pu["y"] + h, pu["x"]:pu["x"] + w] = merged[k]

        for c in range(2 if has_chroma else 0):
            pc0 = np.where(first[:, None, None] == 0, preds_c[0][c],
                           preds_c[1][c])
            pc1 = preds_c[1][c]
            cw0 = wpc(80, first, r0, c)
            co0 = wpc(144, first, r0, c)
            cw1 = wpc(80, np.ones_like(first), r1, c)
            co1 = wpc(144, np.ones_like(first), r1, c)
            mc = np.asarray(mc_ops.pred_merge_batch(
                pc0, pc1, bi, weighted, cw0, co0, cw1, co1, denom_c,
                prog.bit_depth[1]))
            for k, i in enumerate(sel):
                pu = pus[i]
                planes[1 + c][pu["y"] // sy:pu["y"] // sy + h // sy,
                              pu["x"] // sx:pu["x"] // sx + w // sx] = mc[k]


def _apply_pcm(prog: FrameProgramData, planes):
    """Scatter raw PCM samples into the planes (spec 8.4.1: pcm_flag CUs
    bypass prediction+residual; samples coded at sps pcm bit depth).

    Safe to run before the intra loop: each block owns its pixels, and
    intra availability excludes not-yet-decoded positions, so pre-placing
    PCM pixels matches decode order exactly (see recon.cc execute_pcm).
    """
    if prog.pcms is None or len(prog.pcms) == 0:
        return
    has_chroma = prog.chroma_width > 0
    sx = prog.width // prog.chroma_width if has_chroma else 1
    sy = prog.height // prog.chroma_height if has_chroma else 1
    sh_y = max(prog.bit_depth[0] - prog.pcm_bit_depth[0], 0)
    sh_c = max(prog.bit_depth[1] - prog.pcm_bit_depth[1], 0)
    data = prog.pcm_data.astype(np.int32)
    for rec in prog.pcms:
        s = 1 << int(rec["log2_size"])
        p = int(rec["data_start"])
        x, y = int(rec["x"]), int(rec["y"])
        planes[0][y:y + s, x:x + s] = data[p:p + s * s].reshape(s, s) << sh_y
        p += s * s
        if has_chroma:
            cw, ch = s // sx, s // sy
            cx, cy = x // sx, y // sy
            for c in (1, 2):
                planes[c][cy:cy + ch, cx:cx + cw] = \
                    data[p:p + cw * ch].reshape(ch, cw) << sh_c
                p += cw * ch


def _skip_filter_map4(prog: FrameProgramData):
    """Per-4x4 mask of samples the loop filters must leave untouched:
    transquant-bypass CUs, plus PCM CUs when pcm_loop_filter_disable."""
    skip = (prog.cu_info & 4) != 0
    if prog.pcm_loop_filter_disable:
        skip = skip | ((prog.cu_info & 2) != 0)
    return skip


def _paint_motion_grids(prog: FrameProgramData):
    """Per-4x4 motion metadata painted from PU records (deblock bS input)."""
    pb_h, pb_w = prog.qp_y.shape
    pf = np.zeros((pb_h, pb_w), dtype=np.int32)
    mv = [[np.zeros((pb_h, pb_w), dtype=np.int32) for _ in range(2)]
          for _ in range(2)]
    rp = [np.full((pb_h, pb_w), -10 ** 6, dtype=np.int64) for _ in range(2)]
    for pu in prog.pus:
        x4, y4 = pu["x"] >> 2, pu["y"] >> 2
        w4, h4 = pu["w"] >> 2, pu["h"] >> 2
        sl = (slice(y4, y4 + h4), slice(x4, x4 + w4))
        pf[sl] = pu["pred_flags"]
        for l in range(2):
            mv[l][0][sl] = pu[f"mv{l}x"]
            mv[l][1][sl] = pu[f"mv{l}y"]
            if (pu["pred_flags"] >> l) & 1:
                rp[l][sl] = prog.ref_pocs[pu[f"ref_dpb{l}"]]
    return pf, mv, rp


def _deblock(prog: FrameProgramData, planes):
    recs = prog.slice_records
    pb_h, pb_w = prog.qp_y.shape
    # per-4x4 slice-derived params: the Q-side cell's slice governs the
    # offsets/disable (spec 8.7.2; scalar deblock.cc slice_at(xq, yq))
    cs4 = prog.ctb_size // 4
    cy = np.arange(pb_h) // cs4
    cx = np.arange(pb_w) // cs4
    sidx4 = np.clip(prog.slice_idx[cy[:, None], cx[None, :]].astype(np.int64),
                    0, len(recs) - 1)
    disabled4 = recs[sidx4, 1] != 0
    if np.all(disabled4):
        return
    beta_off = recs[sidx4, 2].astype(np.int32)
    tc_off = recs[sidx4, 3].astype(np.int32)
    # pps cb/cr qp offsets for the chroma tc lookup (spec 8.7.2.5.5;
    # scalar deblock.cc:237)
    cqoff = [recs[sidx4, 10].astype(np.int32),
             recs[sidx4, 11].astype(np.int32)]
    bd = prog.bit_depth[0]

    # boundary gating (scalar edge_allowed): an edge between different
    # slices is filtered only if the Q slice allows it; tile boundaries
    # follow pps loop_filter_across_tiles; disabled slices filter nothing
    sa4 = prog.slice_addr[cy[:, None], cx[None, :]]
    ti4 = prog.tile_id[cy[:, None], cx[None, :]]
    across4 = recs[sidx4, 9] != 0

    def gate(shift_axis):
        sp = np.roll(sa4, 1, axis=shift_axis)
        tp = np.roll(ti4, 1, axis=shift_axis)
        slice_ok = (sp == sa4) | across4
        tile_ok = prog.across_tiles | (tp == ti4)
        return slice_ok & tile_ok & ~disabled4

    allow_v4 = gate(1)
    allow_h4 = gate(0)
    has_chroma = prog.chroma_width > 0
    sub_x = prog.width // prog.chroma_width if has_chroma else 1
    sub_y = prog.height // prog.chroma_height if has_chroma else 1
    # 4:2:0 uses the chroma-QP conversion table; 4:2:2/4:4:4 clamp (8.7.2.5.5)
    is420 = sub_x == 2 and sub_y == 2

    def chroma_qp(qpi):
        if is420:
            return np.where(qpi < 30, qpi,
                            np.where(qpi > 43, qpi - 6,
                                     dbk.CHROMA_QP_TAB[np.clip(qpi - 30, 0, 13)]))
        return np.clip(qpi, 0, 51)

    pf, mv, rp = _paint_motion_grids(prog)
    flags = prog.deblock_flags
    meta = {
        "intra": (prog.cu_info & 1),
        "nzc": (prog.nonzero_coeff & 1),
        "tu_edge_v": (flags & 1) != 0,
        "tu_edge_h": (flags & 2) != 0,
        "pu_edge_v": (flags & 4) != 0,
        "pu_edge_h": (flags & 8) != 0,
        "qp": prog.qp_y,
        "pf": pf,
        "mv": mv,
        "rp": rp,
        "bit_depth": bd,
        "beta_off": beta_off,
        "tc_off": tc_off,
        "unfilt": _skip_filter_map4(prog).astype(np.int32),
        "allow_v": allow_v4,
        "allow_h": allow_h4,
    }
    H, W = prog.height, prog.width
    Ev = W // 8
    Eh = H // 8

    # --- vertical ---
    pv = dbk.derive_edge_params(meta, vertical=True)
    def pad_edge0(a):  # prepend the (disabled) picture-boundary edge column
        return np.concatenate([np.zeros((a.shape[0], 1), a.dtype), a], axis=1)[:, :Ev]
    params_v = {k: pad_edge0(v) for k, v in pv.items()}
    planes[0] = dbk.luma_vertical(planes[0], params_v, bd)

    # chroma vertical: chroma edges every 8 chroma cols = luma edge index
    # step sub_x; one luma 4-row segment covers 4//sub_y chroma rows
    bs_v = params_v["bs"]
    qp_l = params_v["qp_l"]
    segs = np.arange(0, bs_v.shape[1], sub_x)
    tco_v = tc_off[:, 2 * segs]  # Q-side slice's tc offset per (row, edge)
    for c in range(2 if has_chroma else 0):
        qpi = qp_l[:, segs] + cqoff[c][:, 2 * segs]
        qpc = chroma_qp(qpi)
        tc_c = dbk.TC_TABLE[np.clip(qpc + 2 + tco_v, 0, 53)] << (bd - 8)
        tc_c = np.where(bs_v[:, segs] == 2, tc_c, 0)
        Ec = prog.chroma_width // 8
        tcc = tc_c[:, :Ec]
        nop = params_v["no_p"][:, segs][:, :Ec]
        noq = params_v["no_q"][:, segs][:, :Ec]
        planes[1 + c] = dbk.chroma_vertical(planes[1 + c], tcc, nop, noq,
                                            prog.bit_depth[1],
                                            rows_per_seg=4 // sub_y)

    # --- horizontal ---
    ph = dbk.derive_edge_params(meta, vertical=False)
    def pad_edge0_h(a):
        return np.concatenate([np.zeros((1, a.shape[1]), a.dtype), a], axis=0)[:Eh]
    params_h = {k: pad_edge0_h(v).T for k, v in ph.items()}
    planes[0] = dbk.luma_horizontal(planes[0], params_h, bd)

    bs_h = params_h["bs"]  # [w4, Eh] (transposed layout)
    qp_lh = params_h["qp_l"]
    segs_h = np.arange(0, bs_h.shape[1], sub_y)
    tco_h = tc_off.T[:, 2 * segs_h]
    for c in range(2 if has_chroma else 0):
        qpi = qp_lh[:, segs_h] + cqoff[c].T[:, 2 * segs_h]
        qpc = chroma_qp(qpi)
        tc_c = dbk.TC_TABLE[np.clip(qpc + 2 + tco_h, 0, 53)] << (bd - 8)
        tc_c = np.where(bs_h[:, segs_h] == 2, tc_c, 0)
        Ec = prog.chroma_height // 8
        tcc = tc_c[:, :Ec]
        nop = params_h["no_p"][:, segs_h][:, :Ec]
        noq = params_h["no_q"][:, segs_h][:, :Ec]
        planes[1 + c] = dbk.chroma_horizontal(planes[1 + c], tcc, nop, noq,
                                              prog.bit_depth[1],
                                              rows_per_seg=4 // sub_x
                                              ).astype(np.int32)


def _apply_sao(prog: FrameProgramData, planes):
    recs = prog.slice_records
    if not np.any(recs[:, 4] | recs[:, 5]):
        return
    skip4 = _skip_filter_map4(prog)  # lossless + filter-disabled PCM
    # per-CTB slice-derived info
    sidx = np.clip(prog.slice_idx, 0, len(recs) - 1)
    sao_on = (recs[sidx, 4] != 0, recs[sidx, 5] != 0)  # luma, chroma per CTB
    across_slices = recs[sidx, 9] != 0
    multi = (len(recs) > 1 and
             (not np.all(across_slices))) or not prog.across_tiles
    sub_x = prog.width // prog.chroma_width if prog.chroma_width else 1
    sub_y = prog.height // prog.chroma_height if prog.chroma_width else 1
    for c in range(3 if prog.chroma_width else 1):
        H = prog.height if c == 0 else prog.chroma_height
        W = prog.width if c == 0 else prog.chroma_width
        cs = ((prog.ctb_size, prog.ctb_size) if c == 0 else
              (prog.ctb_size // sub_y, prog.ctb_size // sub_x))
        tmap, emap, bmap, omap = sao_ops.upsample_ctb_params(
            prog.sao, c, prog.ctb_w, prog.ctb_h, cs, H, W)
        # per-slice sao enable gates the CTB's type (spec 7.3.8.3)
        yy = np.arange(H)[:, None] // cs[0]
        xx = np.arange(W)[None, :] // cs[1]
        on = sao_on[0 if c == 0 else 1][yy, xx]
        tmap = np.where(on, tmap, 0)
        edge_ok = None
        if multi:
            edge_ok = sao_ops.edge_boundary_ok(
                emap, prog.slice_addr, across_slices, prog.tile_id,
                prog.across_tiles, cs, H, W)
        rx = 4 // (1 if c == 0 else sub_x)
        ry = 4 // (1 if c == 0 else sub_y)
        skip = np.repeat(np.repeat(skip4, ry, 0), rx, 1)[:H, :W]
        import jax
        if jax.default_backend() in ("tpu", "axon"):
            # fused single-pass Pallas kernel (~100x the XLA elementwise
            # chain at 4K; see ops/sao_pallas.py)
            from .ops.sao_pallas import sao_plane_via_pallas
            planes[c] = sao_plane_via_pallas(
                planes[c].astype(np.int32), tmap, emap, bmap, omap, skip,
                prog.bit_depth[c], edge_ok=edge_ok, interpret=False)
        else:
            planes[c] = np.asarray(sao_ops.sao_plane(
                planes[c].astype(np.int32), tmap, emap, bmap, omap, skip,
                prog.bit_depth[c], edge_ok=edge_ok))


def reconstruct_stream(programs, run_deblock=True, run_sao=True):
    """Decode a whole stream through the JAX pipeline as an independent
    chain: reconstructed pictures feed back as references for later
    pictures (keyed by POC), so no scalar-oracle pixels are consumed.

    `programs` must be in decode order (as exported).  Yields
    (poc, [Y, Cb, Cr]) per picture.
    """
    ref_store = {}
    for prog in programs:
        subst = [ref_store.get(poc, planes)
                 for poc, planes in zip(prog.ref_pocs, prog.ref_planes)]
        saved = prog.ref_planes
        prog.ref_planes = subst
        planes = reconstruct(prog, run_deblock, run_sao)
        prog.ref_planes = saved
        out = [p.astype(np.uint8) for p in planes]
        ref_store[prog.poc] = out
        yield prog.poc, out


def reconstruct(prog: FrameProgramData, run_deblock=True, run_sao=True,
                device_intra=False):
    """Reconstruct a full picture from its FrameProgram.  Returns 3 planes.

    device_intra=True batches intra blocks into wavefront levels executed on
    the device (ops.intra_wave) instead of the host-sequential loop.
    """
    sub_x = prog.width // prog.chroma_width if prog.chroma_width else 1
    sub_y = prog.height // prog.chroma_height if prog.chroma_width else 1
    chroma444 = prog.chroma_width == prog.width and prog.chroma_width > 0
    planes = [np.zeros((prog.height, prog.width), dtype=np.int32),
              np.zeros((prog.chroma_height, prog.chroma_width), dtype=np.int32),
              np.zeros((prog.chroma_height, prog.chroma_width), dtype=np.int32)]

    residuals = _compute_residuals(prog)
    _apply_ccp(prog, residuals)
    _motion_compensate(prog, planes)
    _apply_pcm(prog, planes)

    # inter residual adds
    tus = prog.tus
    for t in range(len(tus)):
        if tus["flags"][t] & TU_INTRA:
            continue
        tu = tus[t]
        s = 1 << int(tu["log2_size"])
        c = int(tu["cidx"])
        bd = prog.bit_depth[c]
        x, y = int(tu["x"]), int(tu["y"])
        blk = planes[c][y:y + s, x:x + s]
        planes[c][y:y + s, x:x + s] = np.clip(blk + residuals[t], 0,
                                              (1 << bd) - 1)

    # intra ops in decode order
    ctx = intra_ops.IntraContext(prog.width, prog.height, prog.ctb_size,
                                 prog.cu_info, slice_addr=prog.slice_addr,
                                 tile_id=prog.tile_id)
    if device_intra:
        import jax.numpy as jnp

        from .ops import intra_wave
        batches = intra_wave.plan_blocks(prog, ctx, residuals)
        jplanes = {c: jnp.asarray(planes[c]) for c in range(3)}
        for (wave, c, lgs), b in batches.items():
            s = 1 << lgs
            P0, P1, WT = intra_wave.build_mode_tables(s)
            jplanes[c] = intra_wave.intra_wave_kernel(
                jplanes[c], b["pos"], b["subst"], b["unavail"], b["filt"],
                b["strong"], b["mode"], b["edge"], b["resid"], b["y0"],
                b["x0"], b["valid"], P0, P1, WT, s=s,
                bit_depth=prog.bit_depth[c])
        for c in range(3):
            planes[c] = np.asarray(jplanes[c])
        if run_deblock and len(prog.slice_records):
            _deblock(prog, planes)
        if run_sao and len(prog.slice_records):
            _apply_sao(prog, planes)
        return planes

    tu_order = np.zeros(len(tus), dtype=np.int64)
    for op in prog.ops:
        if op["kind"] == OP_INTRA:
            rec = prog.intras[op["idx"]]
            c = int(rec["cidx"])
            sx = 1 if c == 0 else sub_x
            sy = 1 if c == 0 else sub_y
            intra_ops.predict_block(planes[c], ctx, int(rec["x"]),
                                    int(rec["y"]), 1 << int(rec["log2_size"]),
                                    c, int(rec["mode"]), sx, sy,
                                    prog.bit_depth[c],
                                    chroma444=(c != 0 and chroma444))
        elif op["kind"] == OP_RESIDUAL:
            t = int(op["idx"])
            if not (tus["flags"][t] & TU_INTRA):
                continue
            tu = tus[t]
            s = 1 << int(tu["log2_size"])
            c = int(tu["cidx"])
            x, y = int(tu["x"]), int(tu["y"])
            blk = planes[c][y:y + s, x:x + s]
            planes[c][y:y + s, x:x + s] = np.clip(
                blk + residuals[t], 0, (1 << prog.bit_depth[c]) - 1)
    del tu_order

    if run_deblock and len(prog.slice_records):
        _deblock(prog, planes)
    if run_sao and len(prog.slice_records):
        _apply_sao(prog, planes)
    return planes
