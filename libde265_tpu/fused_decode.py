"""Production device decode path: ONE fused jit dispatch per picture.

The launch-per-op path (tpu_decode.DeviceDecoder) is bit-exact but pays one
device dispatch per kernel and recompiles whenever a batch shape changes.
This module compiles a single whole-picture XLA program per stream geometry
and feeds it one packed host->device upload per frame:

  1. inter MC: per-4x4-cell PU parameters are *gathered on device* from the
     natively painted `pu_idx` map (program.h Snapshot::pu_idx) + the PU SoA
     arrays — no host-side rectangle painting at all;
  2. TU residuals: sparse coefficients are scattered into size-binned dense
     batches on device, dequant+IDCT'd, and the inter residuals scatter-added
     into the prediction planes;
  3. intra blocks: a lax.scan over capacity-limited "super-waves" — the host
     list-schedules blocks into steps (a block lands in the earliest step
     after every step that writes its border samples, spilling when a step's
     per-size capacity is full) and the scan replays the steps with the
     plane as carry.  One compiled program regardless of the picture's
     wavefront structure;
  4. deblock + SAO: the whole edge-parameter derivation + both filters are
     traced into the same program (reuses tpu_decode._edge_params_jnp).

All array sizes are padded to per-stream watermark capacities (powers of
two), so a running stream recompiles only when a capacity watermark grows —
O(log) times, not per frame.  `plan_stream` pre-computes the final
capacities so benchmarks compile exactly once per (geometry, use_l1).

Decoded planes stay on device and serve as the reference stack for later
pictures (HBM-resident DPB); only frames the caller pulls are copied back.

Bit-exactness oracle: the scalar C++ backend (tests/test_fused_decode.py).
Exotic RExt paths (cross-component prediction, RDPCM, >8 active refs)
fall back to pipeline.reconstruct for that picture, like tpu_decode.

Reference behavior being replaced: the per-PU/TU acceleration calls of
/root/reference/libde265/decctx.cc:564-650 and motion.cc:288.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pipeline
from .decoder import (OP_INTRA, OP_RESIDUAL, TU_INTRA, TU_RDPCM,
                      TU_RDPCM_VERTICAL, TU_TQ_BYPASS, TU_TRANSFORM_SKIP,
                      TU_USE_DST, FrameProgramData)
from .ops import deblock as dbk
from .ops import deblock_pallas as dbp
from .ops import transform as tx
from .ops.intra import IntraContext
from .ops.intra_wave import border_plan, build_mode_tables
from .ops.mc import EPEL_FILTERS, QPEL_FILTERS
from .ops import coef_pallas as cfp
from .ops import mc_pallas as mcp
from .ops.sao import EO_D
from .tpu_decode import (_chroma_qp_map, _edge_params_jnp, _mc_plane, _merge,
                         _cells_to_plane, _pad_edge0_cols)

MAX_REFS = 8
NOREF = -(10 ** 6)

_warned_debug_knobs = False


def _warn_debug_knobs():
    """TDE_WAVE_STUB / TDE_DEBLOCK_SKIP elide compute for stage-attribution
    experiments and make every decoded frame WRONG; they are read at trace
    time, so a leaked env var would silently poison the jit cache for the
    whole process.  Refuse unless TDE_DEBUG_KNOBS=1 also opts in, and even
    then shout once."""
    global _warned_debug_knobs
    active = [k for k in ("TDE_WAVE_STUB", "TDE_DEBLOCK_SKIP")
              if os.environ.get(k)]
    if not active:
        return
    if os.environ.get("TDE_DEBUG_KNOBS") != "1":
        raise RuntimeError(
            f"{'/'.join(active)} is set: these knobs produce WRONG pixels "
            "and are for stage-attribution experiments only. Set "
            "TDE_DEBUG_KNOBS=1 to confirm, in a fresh process.")
    if not _warned_debug_knobs:
        _warned_debug_knobs = True
        import warnings
        warnings.warn(
            f"{'/'.join(active)} active: decoder output is NOT bit-exact "
            "(stage-attribution mode); do not reuse this process for "
            "correctness runs.", RuntimeWarning, stacklevel=2)

# intra super-wave per-step capacities (blocks of size 1<<lg per scan step);
# a step's overflow spills to the next step.  Sized so spills are rare —
# a capacity spill adds a *serial* scan step, which costs far more than the
# extra vectorized lanes (measured round 2: WAVE_CAP[2]=64 made a 320x240
# I-frame take 255 steps vs the ~139-step dependency bound).
# MUST match kWaveCap in native/src/intraplan.cc.
WAVE_CAP = {2: 256, 3: 128, 4: 64, 5: 16}


def _pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


# ---------------------------------------------------------------------------
# host: per-frame feed packing (numpy, vectorized)
# ---------------------------------------------------------------------------

def _bin_tus(prog: FrameProgramData):
    """Vectorized size-binning of the TU records.

    Returns {lg: dict} with per-bin TU arrays, flattened coefficient
    segments, inter-scatter targets, and tu->(lg,row) mapping arrays.
    """
    tus = prog.tus
    bins = {}
    tu_bin_lg = np.full(len(tus), -1, np.int32)
    tu_bin_row = np.full(len(tus), -1, np.int32)
    if len(tus) == 0:
        return bins, tu_bin_lg, tu_bin_row

    # RExt cross-component prediction pairing: each scaled chroma TU takes
    # the most recent luma TU in op order (4:4:4, identical geometry —
    # mirrors pipeline._apply_ccp / native/src/transform.cc CCP hook)
    tu_ccp_scale = np.zeros(len(tus), np.int32)
    tu_ccp_partner = np.full(len(tus), -1, np.int64)
    if (tus["cross_comp_scale"] != 0).any():
        ridx = prog.ops["idx"][prog.ops["kind"] == OP_RESIDUAL] \
            .astype(np.int64)
        is_l = tus["cidx"][ridx] == 0
        pos = np.where(is_l, np.arange(len(ridx)), -1)
        last = np.maximum.accumulate(pos)
        sel = (tus["cidx"][ridx] != 0) & \
              (tus["cross_comp_scale"][ridx] != 0) & (last >= 0)
        tt = ridx[sel]
        pp = ridx[np.clip(last, 0, None)][sel]
        same = tus["log2_size"][tt] == tus["log2_size"][pp]
        tt, pp = tt[same], pp[same]
        tu_ccp_scale[tt] = tus["cross_comp_scale"][tt]
        tu_ccp_partner[tt] = pp

    for lg in (2, 3, 4, 5):
        sel = np.nonzero(tus["log2_size"] == lg)[0]
        if len(sel) == 0:
            continue
        n = len(sel)
        t = tus[sel]
        tu_bin_lg[sel] = lg
        tu_bin_row[sel] = np.arange(n)
        # ragged gather of the sparse coefficient segments.  Wire format:
        # 8-bit entries, FOUR per int32 word (little-endian byte order),
        # positions delta-coded in raster order per TU: a running position
        # P starts at -1; an entry with val!=0 advances P by dpos+1 and
        # emits level `val` (4-bit signed, clamped to +-7) at P; a zero
        # byte (val==0) advances P by 15 and emits nothing — so both gap
        # bridges and the pad to 4-entry multiples are plain zeros.
        # |val|>7 escapes ship as (cfx, cfv) correction scatter-adds
        # applied after densification.  coff is in ENTRY units (multiples
        # of 4) — ~1.2 B/coeff crosses the wire vs 2 B for the previous
        # val6|pos10 halfword format (measured -0.24 MB/frame at 1080p).
        S = 1 << lg
        starts = t["coeff_start"].astype(np.int64)
        ncs = t["ncoeff"].astype(np.int64)
        total = int(ncs.sum())
        if total:
            off = np.concatenate([[0], np.cumsum(ncs)[:-1]])
            runs = np.repeat(np.arange(n), ncs)
            j_in = np.arange(total, dtype=np.int64) - np.repeat(off, ncs)
            src = np.clip(np.repeat(starts, ncs) + j_in, 0,
                          len(prog.coeff_val) - 1)
            cval = prog.coeff_val[src].astype(np.int32)
            cposw = prog.coeff_pos[src].astype(np.int32)
            p10 = (cposw >> 6) * S + (cposw & 63)
            # sort by position within each TU (positions unique per TU)
            order = np.argsort(runs * (S * S) + p10, kind="stable")
            runs, p10, cval = runs[order], p10[order], cval[order]
            prev = np.empty(total, np.int64)
            prev[1:] = p10[:-1]
            prev[np.concatenate([[0], off[1:][ncs[1:] > 0]]).astype(
                np.int64)] = -1
            gaps = p10 - prev - 1
            adv = gaps // 15                  # leading zero (advance) bytes
            cnt_c = adv + 1                   # bytes per coefficient
            ent_per_tu = np.zeros(n, np.int64)
            np.add.at(ent_per_tu, runs, cnt_c)
            coff = np.concatenate(
                [[0], np.cumsum((ent_per_tu + 3) & ~3)]).astype(np.int32)
            cum = np.cumsum(cnt_c)
            cum0 = np.concatenate([[0], cum])
            within_incl = cum - cum0[np.repeat(off, ncs)]
            cl = np.clip(cval, -7, 7)
            bytestream = np.zeros(int(coff[-1]), np.uint8)
            bytestream[coff[runs] + within_incl - 1] = \
                ((gaps - 15 * adv) & 0xF) | ((cl & 0xF) << 4)
            cv = bytestream.view(np.int32)
            esc = cval != cl
            cfx = (runs[esc] * S * S + p10[esc]).astype(np.int32)
            cfv = (cval - cl)[esc].astype(np.int32)
        else:
            coff = np.zeros(n + 1, np.int32)
            cv = np.zeros(0, np.int32)
            cfx = np.zeros(0, np.int32)
            cfv = np.zeros(0, np.int32)
        flags = t["flags"].astype(np.int32)
        intra = (flags & TU_INTRA) != 0
        cidx = t["cidx"].astype(np.int32)
        if prog.scaling_factors is not None:
            if lg == 5:
                mid = np.where(intra, 0, 1)
            else:
                mid = cidx + np.where(intra, 0, 3)
        else:
            mid = np.zeros(n, np.int32)
        b = {"qp": t["qp"].astype(np.int32), "flags": flags, "mid": mid,
             "n": n, "cv": cv, "coff": coff, "cfx": cfx, "cfv": cfv}
        b["ccp_scale"] = tu_ccp_scale[sel]
        ppr = tu_ccp_partner[sel]
        b["ccp_row"] = np.where(
            ppr >= 0, tu_bin_row[np.clip(ppr, 0, None)], -1).astype(np.int32)
        # inter residual scatter targets per channel; a chroma TU whose own
        # cbf is 0 still scatters when it carries a CCP luma term
        inter_nz = ~intra & ((t["ncoeff"] > 0) | (b["ccp_scale"] != 0))
        for ch, m in (("y", inter_nz & (cidx == 0)),
                      ("cb", inter_nz & (cidx == 1)),
                      ("cr", inter_nz & (cidx == 2))):
            rows = np.nonzero(m)[0].astype(np.int32)
            b[f"sc_{ch}"] = np.stack(
                [rows, t["x"][rows].astype(np.int32),
                 t["y"][rows].astype(np.int32)], axis=1) if len(rows) else \
                np.zeros((0, 3), np.int32)
        bins[lg] = b
    return bins, tu_bin_lg, tu_bin_row


_PLANE_CLASS = {0: "y", 1: "cb", 2: "cr"}

# irec columns (flat per-block intra record feed; the [scap, K, ...] scan
# layout + the border gather/substitution plan are derived ON DEVICE):
#   0 mode, 1 edge, 2 y0, 3 x0, 4 flags(1 unavail|2 filt|4 strong|8 valid),
#   5 rrow, 6 step, 7 slot, 8 cidx, 9 lg, 10..14 border-availability bitmask
IREC_COLS = 15
AVAIL_WORDS = 5  # ceil((4*32+1)/32) for the largest block size


def _pack_irec(irec: np.ndarray) -> np.ndarray:
    """Wire-compact intra records: [n, 15] int32 -> [8, n] column-major.

    w0 = mode(6) | edge(4)<<6 | flags(4)<<10 | cidx(2)<<14 | lg(3)<<16 |
         step(13)<<19;  w1 = y0(16) | x0(16)<<16;
    w2 = (rrow+1)(22) | slot(10)<<22 (rrow rides +1: -1 = no residual);
    w3..w7 = availability words.
    Column-major so the sparse-block upload skips the mostly-zero high
    availability words (only 32x32 blocks use all five)."""
    n = irec.shape[0]
    p = np.zeros((8, n), np.int32)
    p[0] = (irec[:, 0] | (irec[:, 1] << 6) | (irec[:, 4] << 10) |
            (irec[:, 8] << 14) | (irec[:, 9] << 16) | (irec[:, 6] << 19))
    p[1] = irec[:, 2] | (irec[:, 3] << 16)
    p[2] = (irec[:, 5] + 1) | (irec[:, 7] << 22)
    p[3:8] = irec[:, 10:15].T
    return p


def _unpack_irec(p):
    """In-graph inverse of _pack_irec: [8, cap] -> [cap, 15] int32."""
    w0, w1, w2 = p[0], p[1], p[2]
    cols = [w0 & 63, (w0 >> 6) & 15, w1 & 0xFFFF, (w1 >> 16) & 0xFFFF,
            (w0 >> 10) & 15, (w2 & 0x3FFFFF) - 1, (w0 >> 19) & 0x1FFF,
            (w2 >> 22) & 0x3FF, (w0 >> 14) & 3, (w0 >> 16) & 7,
            p[3], p[4], p[5], p[6], p[7]]
    return jnp.stack(cols, axis=1)


def _avail_words(av: np.ndarray) -> np.ndarray:
    """Pack a [n, nb] bool availability matrix into [n, AVAIL_WORDS] int32
    (little-endian bit order, bit k of word k>>5 = sample k)."""
    n, nb = av.shape
    padded = np.zeros((n, AVAIL_WORDS * 32), bool)
    padded[:, :nb] = av
    return np.packbits(padded, axis=1, bitorder="little").view(np.int32)


def _intra_records_native(prog: FrameProgramData):
    """Flat intra record array from the native plan (intraplan.cc).

    Ships only per-block metadata + availability bits; the border gather
    positions and substitution chain are pure functions of (x0, y0, size,
    avail) and are re-derived on device (_wave_body), cutting the per-frame
    feed from O(steps*K*4nT) to O(blocks)."""
    ip = prog.ip
    recs = prog.intras
    n = len(recs)
    steps = ip["step"].astype(np.int32)
    n_steps = int(steps.max(initial=-1)) + 1
    irec = np.zeros((n, IREC_COLS), np.int32)
    irec[:, 0] = recs["mode"]
    irec[:, 1] = ip["edge"]
    irec[:, 2] = recs["y"]
    irec[:, 3] = recs["x"]
    fl = ip["flags"].astype(np.int32) | 8
    irec[:, 4] = fl
    irec[:, 5] = ip["rrow"]
    irec[:, 6] = steps
    irec[:, 7] = ip["slot"]
    irec[:, 8] = recs["cidx"]
    lg_all = recs["log2_size"].astype(np.int32)
    irec[:, 9] = lg_all
    boff = ip["boff"].astype(np.int64)
    bsub = ip["bsub"]
    nsteps_pc = np.zeros(3, np.int32)
    for c in (0, 1, 2):
        m = recs["cidx"] == c
        if m.any():
            nsteps_pc[c] = int(steps[m].max()) + 1
    for lg in (2, 3, 4, 5):
        sel = np.nonzero(lg_all == lg)[0]
        if not len(sel):
            continue
        nb = 4 * (1 << lg) + 1
        bidx = boff[sel][:, None] + np.arange(nb)
        # available <=> substitution maps the sample to itself (native sets
        # bsub[k]=k also for all-unavailable blocks, so mask those out)
        av = (bsub[bidx] == np.arange(nb)) & ((fl[sel] & 1) == 0)[:, None]
        irec[sel, 10:10 + AVAIL_WORDS] = _avail_words(av)
    return irec, n_steps, nsteps_pc


def _plan_intra(prog: FrameProgramData, tu_bin_lg, tu_bin_row):
    """List-schedule the intra blocks into capacity-limited super-waves.

    Python fallback for streams decoded without the native plan (prog.ip is
    None).  Emits the same flat irec array as _intra_records_native.
    """
    if len(prog.intras) == 0:
        return np.zeros((0, IREC_COLS), np.int32), 0, np.zeros(3, np.int32)
    ctx = IntraContext(prog.width, prog.height, prog.ctb_size, prog.cu_info,
                       slice_addr=prog.slice_addr, tile_id=prog.tile_id)
    chroma444 = prog.chroma_width == prog.width and prog.chroma_width > 0

    # residual TU for each intra op (same x/y/cidx, next in decode order)
    resid_of = {}
    pending = {}
    order = []
    for op in prog.ops:
        if op["kind"] == OP_INTRA:
            rec = prog.intras[op["idx"]]
            key = (int(rec["x"]), int(rec["y"]), int(rec["cidx"]))
            pending[key] = int(op["idx"])
            order.append(int(op["idx"]))
        elif op["kind"] == OP_RESIDUAL:
            t = int(op["idx"])
            if not (prog.tus["flags"][t] & TU_INTRA):
                continue
            tu = prog.tus[t]
            key = (int(tu["x"]), int(tu["y"]), int(tu["cidx"]))
            i = pending.get(key)
            if i is not None:
                resid_of[i] = t

    wmaps = {}
    counts = {}   # (cidx, lg) -> list of per-step counts
    rows = []     # irec rows
    n_steps = 0
    nsteps_pc = np.zeros(3, np.int32)
    for i in order:
        rec = prog.intras[i]
        c = int(rec["cidx"])
        if c == 0:
            sub_x = sub_y = 1
            H, Wd = prog.height, prog.width
        else:
            sub_x = prog.width // prog.chroma_width
            sub_y = prog.height // prog.chroma_height
            H, Wd = prog.chroma_height, prog.chroma_width
        if c not in wmaps:
            wmaps[c] = np.zeros(((H + 3) // 4, (Wd + 3) // 4), np.int32)
        wmap = wmaps[c]
        x0, y0 = int(rec["x"]), int(rec["y"])
        lg = int(rec["log2_size"])
        nT = 1 << lg
        pos, subst, unavail = border_plan(ctx, x0, y0, nT, sub_x, sub_y, H, Wd)
        if unavail:
            dep = 0
        else:
            have = subst == np.arange(len(subst))
            cells = pos[have] >> 2
            dep = int(wmap[cells[:, 0], cells[:, 1]].max(initial=0))
        key = (c, lg)
        cap = WAVE_CAP[lg]
        cnt = counts.setdefault(key, [])
        step = dep  # 0-based step index; block must run at step >= dep
        while True:
            while len(cnt) <= step:
                cnt.append(0)
            if cnt[step] < cap:
                break
            step += 1
        slot = cnt[step]
        cnt[step] += 1
        wmap[y0 >> 2:(y0 + nT + 3) >> 2, x0 >> 2:(x0 + nT + 3) >> 2] = step + 1
        n_steps = max(n_steps, step + 1)
        nsteps_pc[c] = max(nsteps_pc[c], step + 1)

        mode = int(rec["mode"])
        filt = False
        if (c == 0 or chroma444) and not ctx.smoothing_disabled:
            if mode != 1 and nT != 4:
                mind = min(abs(mode - 26), abs(mode - 10))
                thresh = 7 if nT == 8 else (1 if nT == 16 else 0)
                filt = True if mode == 0 else (mind > thresh)
        strong = filt and ctx.strong_smoothing and c == 0 and nT == 32
        edge = 0
        if c == 0 and nT < 32:
            edge = {1: 1, 26: 2, 10: 3}.get(mode, 0)
        t = resid_of.get(i)
        rrow = -1
        if t is not None and tu_bin_lg[t] == lg:
            rrow = int(tu_bin_row[t])
        elif t is not None:
            # residual TU size differs from the intra block (cannot happen
            # in HEVC: intra prediction operates per transform block)
            raise ValueError("intra/TU size mismatch")
        nb = 4 * nT + 1
        av = (subst == np.arange(nb)) & (not unavail)
        row = np.zeros(IREC_COLS, np.int32)
        row[0:10] = (mode, edge, y0, x0,
                     (1 * unavail) | (2 * filt) | (4 * strong) | 8,  # 8=valid
                     rrow, step, slot, c, lg)
        row[10:10 + AVAIL_WORDS] = _avail_words(av[None, :])[0]
        rows.append(row)

    return np.stack(rows).astype(np.int32), n_steps, nsteps_pc


def _pack_pcm(prog: FrameProgramData, sub_x, sub_y):
    """Flat (plane, index, value) PCM scatter lists (rare blocks)."""
    if prog.pcms is None or len(prog.pcms) == 0:
        return [np.zeros((0, 2), np.int32) for _ in range(3)]
    sh_y = max(prog.bit_depth[0] - prog.pcm_bit_depth[0], 0)
    sh_c = max((prog.bit_depth[1] if prog.chroma_width else 8) -
               prog.pcm_bit_depth[1], 0)
    data = prog.pcm_data.astype(np.int32)
    out = [[], [], []]
    for rec in prog.pcms:
        s = 1 << int(rec["log2_size"])
        p = int(rec["data_start"])
        x, y0 = int(rec["x"]), int(rec["y"])
        yy, xx = np.mgrid[y0:y0 + s, x:x + s]
        out[0].append(np.stack([(yy * prog.width + xx).ravel(),
                                data[p:p + s * s] << sh_y], axis=1))
        p += s * s
        if prog.chroma_width:
            cw, chh = s // sub_x, s // sub_y
            cx, cy = x // sub_x, y0 // sub_y
            for c in (1, 2):
                yy, xx = np.mgrid[cy:cy + chh, cx:cx + cw]
                out[c].append(np.stack([(yy * prog.chroma_width + xx).ravel(),
                                        data[p:p + cw * chh] << sh_c], axis=1))
                p += cw * chh
    return [np.concatenate(o).astype(np.int32) if o else
            np.zeros((0, 2), np.int32) for o in out]


def _pad_rows(a: np.ndarray, cap: int, fill=0) -> np.ndarray:
    """Pad axis 0 to cap (>= len(a))."""
    if len(a) == cap:
        return np.ascontiguousarray(a)
    pad = np.full((cap - len(a),) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad])


# ---------------------------------------------------------------------------
# device: fused whole-picture kernel
# ---------------------------------------------------------------------------

def _scatter_intra_bins(irec, intra_bins, scap: int):
    """Scatter the flat irec rows into per-(plane, lg) scan arrays on
    device.  Returns {cidx: {lg: {"meta", "rrow", "aw"}}}."""
    pc_of = {"y": 0, "cb": 1, "cr": 2}
    out = {}
    for (pc, lg) in intra_bins:
        c = pc_of[pc]
        K = WAVE_CAP[lg]
        sel = (irec[:, 8] == c) & (irec[:, 9] == lg)
        step = jnp.where(sel, irec[:, 6], 1 << 28)
        slot = irec[:, 7]
        meta = jnp.zeros((scap, K, 5), jnp.int32).at[step, slot].set(
            irec[:, 0:5], mode="drop")
        rrow = jnp.full((scap, K), -1, jnp.int32).at[step, slot].set(
            irec[:, 5], mode="drop")
        aw = jnp.zeros((scap, K, AVAIL_WORDS), jnp.int32).at[step, slot].set(
            irec[:, 10:10 + AVAIL_WORDS], mode="drop")
        depth = jnp.max(jnp.where(sel, irec[:, 6] + 1, 0))
        out.setdefault(c, {})[lg] = {"meta": meta, "rrow": rrow, "aw": aw,
                                     "depth": depth}
    return out


def _intra_scan_all(planes, bins_by_plane, bin_res, st, nsteps):
    if st.get("pallas_intra", False):
        from .ops import intra_window_pallas as iwp
        shapes = [p.shape for p in planes]
        padded = []
        for p in planes:
            hp, wp = iwp.scan_pad_sizes(*p.shape)
            padded.append(iwp.pad_plane_for_scan(p, hp=hp, wp=wp))
        out = _intra_scan_all_inner(padded, bins_by_plane, bin_res, st,
                                    nsteps)
        return [iwp.unpad_plane(p, *shp) for p, shp in zip(out, shapes)]
    return _intra_scan_all_inner(planes, bins_by_plane, bin_res, st, nsteps)


def _intra_scan_all_inner(planes, bins_by_plane, bin_res, st, nsteps):
    """One lax.fori_loop over super-wave steps, all planes advancing
    together (the three plane scans are mutually independent, so the total
    step count is the max over planes, not the sum).

    The step arrays are watermark-deep (the whole stream shares ONE compiled
    program), but the trip count is dynamic: a P frame with a 5-step plan
    runs 5 iterations, not the I-frame watermark (steps beyond a bin's plan
    are all-zero records with the valid bit clear).
    """
    lgs_all = sorted({lg for b in bins_by_plane.values() for lg in b})
    tables = {lg: tuple(jnp.asarray(t) for t in build_mode_tables(1 << lg))
              for lg in lgs_all}
    total = jnp.max(nsteps)

    def step_at(i, pls):
        pls = list(pls)
        for c in sorted(bins_by_plane):
            if c >= len(pls):
                continue
            bd = st["bd"] if c == 0 else st["bdc"]
            for lg in sorted(bins_by_plane[c]):
                v = bins_by_plane[c][lg]

                def run(pl, v=v, lg=lg, bd=bd):
                    meta = lax.dynamic_index_in_dim(v["meta"], i, 0,
                                                    keepdims=False)
                    rrow = lax.dynamic_index_in_dim(v["rrow"], i, 0,
                                                    keepdims=False)
                    aw = lax.dynamic_index_in_dim(v["aw"], i, 0,
                                                  keepdims=False)
                    stub = os.environ.get("TDE_WAVE_STUB", "")
                    if stub == "all":   # perf attribution only (not bit-
                        return pl       # exact): skip the whole wave body
                    if stub == "resid":
                        resid = jnp.zeros((meta.shape[0], 1 << lg, 1 << lg),
                                          jnp.int32)
                    else:
                        resid = jnp.where((rrow >= 0)[:, None, None],
                                          bin_res[lg][jnp.clip(rrow, 0)], 0)
                    return _wave_body(pl, meta, aw, resid, *tables[lg],
                                      s=1 << lg, bit_depth=bd,
                                      pallas=st.get("pallas_intra", False),
                                      interpret=st.get("pallas_interp",
                                                       False))

                # per-bin depth gate: a step beyond this bin's plan depth
                # for THIS frame is a no-op — at ~3ms/step of small-op
                # overhead, skipping the 11 inactive bins of a typical
                # P-frame step is the difference between 3ms and ~0.5ms
                pls[c] = lax.cond(i < v["depth"], run, lambda pl: pl,
                                  pls[c])
        return tuple(pls)

    return list(lax.fori_loop(0, total, step_at, tuple(planes)))


def _wave_body(plane, meta, aw, resid, P0, P1, WT, s: int,
               bit_depth: int, pallas: bool = False,
               interpret: bool = False):
    """One super-wave step: predict + residual-add K same-size blocks.

    Same math as ops.intra_wave.intra_wave_kernel (spec 8.4.4.2).  The
    border gather positions are pure geometry and the substitution chain
    (8.4.4.2.2) is re-derived from the shipped availability bits with a
    cumulative max — nothing but the per-block records crosses PCIe.
    """
    mode, edge, y0, x0 = meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3]
    unavail = (meta[:, 4] & 1).astype(bool)
    filt = (meta[:, 4] & 2).astype(bool)
    strong = (meta[:, 4] & 4).astype(bool)
    valid = (meta[:, 4] & 8).astype(bool)
    N = mode.shape[0]
    n2 = 2 * s
    nb = 4 * s + 1
    maxv = (1 << bit_depth) - 1
    lg = s.bit_length() - 1
    Hc, Wc = plane.shape

    k = jnp.arange(nb)
    stub = os.environ.get("TDE_WAVE_STUB", "")
    if pallas:
        # aligned window-DMA border fetch from the PADDED plane
        # (ops/intra_window_pallas): XLA's generic gather on the live plane
        # costs ~0.4 ms/step at 1080p; the tile-aligned window copies with
        # in-kernel compaction are ~10x less
        from .ops import intra_window_pallas as iwp
        y0p = y0 + iwp.PAD_T
        x0p = x0 + iwp.PAD_L
        nv = valid.sum().astype(jnp.int32)
        if stub == "gather":   # perf attribution only
            b_raw = jnp.zeros((N, nb), jnp.int32)
        else:
            tops, lefts = iwp.border_gather(plane, y0p, x0p, nv, s=s,
                                            interpret=interpret)
            b_raw = jnp.concatenate([jnp.flip(lefts, axis=1), tops], axis=1)
    else:
        # border geometry: k<2s left column (bottom->top), k=2s corner,
        # k>2s top row (left->right); clip keeps never-read unavailable
        # positions in bounds
        yy = jnp.where(k[None, :] < n2, y0[:, None] + (n2 - 1) - k[None, :],
                       y0[:, None] - 1)
        xx = jnp.where(k[None, :] <= n2, x0[:, None] - 1,
                       x0[:, None] + k[None, :] - n2 - 1)
        pos = jnp.clip(yy, 0, Hc - 1) * Wc + jnp.clip(xx, 0, Wc - 1)
        b_raw = plane.reshape(-1)[pos]
    # substitution chain from availability bits: each sample takes the last
    # available sample at or before it, else the first available one.
    # Value-level jump-propagation ladders (log2(nb) shift+selects) replace
    # the cummax + take_along_axis formulation — XLA lowers take_along_axis
    # to a generic gather that costs ~0.2 ms/step on TPU at 1080p caps.
    fil = ((aw[:, k >> 5] >> (k & 31)) & 1).astype(bool)
    b = jnp.where(fil, b_raw, 0)
    sh = 1
    while sh < nb:                       # fill-forward: nearest at-or-before
        b = jnp.where(fil, b, jnp.pad(b, ((0, 0), (sh, 0)))[:, :nb])
        fil = fil | jnp.pad(fil, ((0, 0), (sh, 0)))[:, :nb]
        sh *= 2
    sh = 1
    while sh < nb:                       # fill-backward: before the first
        b = jnp.where(fil, b, jnp.pad(b, ((0, 0), (0, sh)))[:, sh:])
        fil = fil | jnp.pad(fil, ((0, 0), (0, sh)))[:, sh:]
        sh *= 2
    b = jnp.where(unavail[:, None], 1 << (bit_depth - 1), b)

    corner = b[:, n2]
    tap3 = b.at[:, 1:-1].set((b[:, :-2] + 2 * b[:, 1:-1] + b[:, 2:] + 2) >> 2)
    if s == 32:
        thr = 1 << (bit_depth - 5)
        bi_ok = ((jnp.abs(corner + b[:, 4 * s] - 2 * b[:, n2 + s]) < thr) &
                 (jnp.abs(corner + b[:, 0] - 2 * b[:, s]) < thr))
        i = jnp.arange(1, n2)
        bl = b[:, 0:1]
        tr = b[:, 4 * s:4 * s + 1]
        bilin = b
        bilin = bilin.at[:, n2 - i].set(
            ((n2 - i)[None, :] * corner[:, None] + i[None, :] * bl + 32) >> 6)
        bilin = bilin.at[:, n2 + i].set(
            ((n2 - i)[None, :] * corner[:, None] + i[None, :] * tr + 32) >> 6)
        filtered = jnp.where((strong & bi_ok)[:, None], bilin,
                             jnp.where(filt[:, None], tap3, b))
    else:
        filtered = jnp.where(filt[:, None], tap3, b)

    left = jnp.flip(filtered[:, :n2], axis=1)
    top = filtered[:, n2 + 1:]
    corner = filtered[:, n2]

    xg = jnp.arange(s)[None, None, :]
    yg = jnp.arange(s)[None, :, None]
    planar = (((s - 1 - xg) * left[:, :s, None] +
               (xg + 1) * top[:, s, None, None] +
               (s - 1 - yg) * top[:, None, :s] +
               (yg + 1) * left[:, s, None, None] + s) >> (lg + 1))

    dc = (left[:, :s].sum(axis=1) + top[:, :s].sum(axis=1) + s) >> (lg + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (N, s, s))
    if s < 32:
        row0 = (top[:, 1:s] + 3 * dc[:, None] + 2) >> 2
        col0 = (left[:, 1:s] + 3 * dc[:, None] + 2) >> 2
        c00 = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
        dce = dcp.at[:, 0, 1:].set(row0).at[:, 1:, 0].set(col0)
        dce = dce.at[:, 0, 0].set(c00)
        dcp = jnp.where((edge == 1)[:, None, None], dce, dcp)

    # angular reference fetch as one-hot f32 MXU matmuls (exact: samples
    # < 2^24) — the take_along_axis formulation is a generic TPU gather
    # measured at ~0.45 ms/step at 1080p caps
    ohm = (mode[:, None] == jnp.arange(35)[None, :]).astype(jnp.float32)
    p0 = (ohm @ P0.astype(jnp.float32)).astype(jnp.int32)
    p1 = (ohm @ P1.astype(jnp.float32)).astype(jnp.int32)
    w = (ohm @ WT.astype(jnp.float32)).astype(jnp.int32)
    ff = filtered.astype(jnp.float32)
    oh0 = (p0[:, :, None] == k[None, None, :]).astype(jnp.float32)
    oh1 = (p1[:, :, None] == k[None, None, :]).astype(jnp.float32)
    g0 = jnp.einsum("kpn,kn->kp", oh0, ff,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    g1 = jnp.einsum("kpn,kn->kp", oh1, ff,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    ang = (((32 - w) * g0 + w * g1 + 16) >> 5).reshape(N, s, s)
    if s < 32:
        v26 = jnp.clip(top[:, 0, None] + ((left[:, :s] - corner[:, None]) >> 1),
                       0, maxv)
        v10 = jnp.clip(left[:, 0, None] + ((top[:, :s] - corner[:, None]) >> 1),
                       0, maxv)
        ang = jnp.where((edge == 2)[:, None, None],
                        ang.at[:, :, 0].set(v26), ang)
        ang = jnp.where((edge == 3)[:, None, None],
                        ang.at[:, 0, :].set(v10), ang)

    pred = jnp.where((mode == 0)[:, None, None], planar,
                     jnp.where((mode == 1)[:, None, None], dcp, ang))
    if stub == "pred":   # perf attribution only: pure-DC prediction
        pred = dcp
    out = jnp.clip(pred + resid, 0, maxv)

    if pallas:
        if stub == "scatter":   # perf attribution only
            return plane
        return iwp.window_scatter(plane, out, y0p, x0p, valid, s=s,
                                  interpret=interpret)
    # padded entries scatter out of bounds and are dropped (valid blocks of
    # one step are disjoint transform blocks, so updates never collide)
    rows = jnp.where(valid, y0, 1 << 28)[:, None, None] + \
        jnp.arange(s)[None, :, None]
    cols = x0[:, None, None] + jnp.arange(s)[None, None, :]
    return plane.at[rows, cols].set(out, mode="drop", unique_indices=True)


def _sao_section(planes, feed, recs, skip4, st):
    """SAO from per-CTB parameter maps (in-jit port of the host upsampling
    in tpu_decode._filter_meta + _filter_kernel)."""
    H, W, sub_x, sub_y = st["H"], st["W"], st["sub_x"], st["sub_y"]
    ctb = st["ctb_size"]
    sidx = jnp.clip(feed["slice_idx"], 0, st["n_slices"] - 1)
    sao_on = [recs[sidx, 4] != 0, recs[sidx, 5] != 0]
    from .ops.sao import sao_plane
    use_pallas_sao = st.get("pallas_mc", False)
    if use_pallas_sao:
        from .ops.sao_pallas import sao_plane_fused
        interp_sao = jax.default_backend() not in ("tpu", "axon")

    def one_plane(plane, tmap, emap, bmap, omap, skip, cs, bd):
        if st["multi_boundary"]:
            eok = _edge_ok_jnp(emap, feed, recs, sidx, cs,
                               plane.shape[0], plane.shape[1], st)
        else:
            eok = None
        if use_pallas_sao:
            return sao_plane_fused(plane, tmap, emap, bmap, omap, skip,
                                   bit_depth=bd, edge_ok=eok,
                                   interpret=interp_sao)
        return sao_plane(plane, tmap, emap, bmap, omap, skip,
                         bit_depth=bd, edge_ok=eok)

    def maps(c, on, cs_y, cs_x, Hc, Wc):
        def up(a):
            return jnp.repeat(jnp.repeat(a, cs_y, 0), cs_x, 1)[:Hc, :Wc]
        return (up(feed["sao_t"][:, :, c] * on), up(feed["sao_eo"][:, :, c]),
                up(feed["sao_band"][:, :, c]),
                jnp.repeat(jnp.repeat(feed["sao_off"][:, :, c], cs_y, 0),
                           cs_x, 1)[:Hc, :Wc])

    on_l = sao_on[0].astype(jnp.int32)
    t0, e0, b0, o0 = maps(0, on_l, ctb, ctb, H, W)
    skip_l = jnp.repeat(jnp.repeat(skip4.astype(bool), 4, 0), 4, 1)[:H, :W]
    out = [one_plane(planes[0], t0, e0, b0, o0, skip_l, (ctb, ctb),
                     st["bd"])]
    if len(planes) > 1:
        # cb and cr as ONE vmapped pass (identical geometry; only the
        # parameter maps differ) — halves the chroma SAO op count
        Hc, Wc = st["ch"], st["cw"]
        cs_y, cs_x = ctb // sub_y, ctb // sub_x
        on_c = sao_on[1].astype(jnp.int32)
        mc = [maps(c, on_c, cs_y, cs_x, Hc, Wc) for c in (1, 2)]
        skip_c = jnp.repeat(jnp.repeat(skip4.astype(bool), 4 // sub_y, 0),
                            4 // sub_x, 1)[:Hc, :Wc]
        if use_pallas_sao:
            for i, c in enumerate((1, 2)):
                t, e, b, o = mc[i]
                out.append(one_plane(planes[c], t, e, b, o, skip_c,
                                     (cs_y, cs_x), st["bdc"]))
            return out
        tm, em, bm, om = (jnp.stack([a[i] for a in mc]) for i in range(4))
        if st["multi_boundary"]:
            # edge validity depends on the class map, which differs per
            # channel: vmapped alongside
            eok = jax.vmap(lambda e: _edge_ok_jnp(
                e, feed, recs, sidx, (cs_y, cs_x), Hc, Wc, st))(em)
            res = jax.vmap(lambda p, t, e, b, o, ek: sao_plane(
                p, t, e, b, o, skip_c, bit_depth=st["bdc"], edge_ok=ek))(
                jnp.stack(planes[1:]), tm, em, bm, om, eok)
        else:
            res = jax.vmap(lambda p, t, e, b, o: sao_plane(
                p, t, e, b, o, skip_c, bit_depth=st["bdc"]))(
                jnp.stack(planes[1:]), tm, em, bm, om)
        out += [res[0], res[1]]
    return out


def _edge_ok_jnp(emap, feed, recs, sidx, cs, Hc, Wc, st):
    """In-jit port of ops.sao.edge_boundary_ok (slice/tile boundary rules)."""
    cs_y, cs_x = cs
    yy = jnp.arange(Hc)[:, None] // cs_y
    xx = jnp.arange(Wc)[None, :] // cs_x
    A = feed["slice_addr"][yy, xx]
    L = (recs[sidx, 9] != 0)[yy, xx]
    T = feed["tile_id"][yy, xx]

    def shifted(m, dy, dx):
        ys = jnp.clip(jnp.arange(Hc) + dy, 0, Hc - 1)
        xs = jnp.clip(jnp.arange(Wc) + dx, 0, Wc - 1)
        return m[ys[:, None], xs[None, :]]

    def ok(dy, dx):
        An = shifted(A, dy, dx)
        Ln = shifted(L, dy, dx)
        slice_ok = (An == A) | (L & Ln)
        tile_ok = st["across_tiles"] | (shifted(T, dy, dx) == T)
        return slice_ok & tile_ok

    good = jnp.ones((Hc, Wc), bool)
    for cls in range(4):
        (dy0, dx0), (dy1, dx1) = EO_D[cls]
        sel = emap == cls
        v = ok(int(dy0), int(dx0)) & ok(int(dy1), int(dx1))
        good = jnp.where(sel, v, good)
    return good


def _deblock_section(planes, feed, recs, cell, skip4, st):
    """Deblock V+H (luma+chroma) — tpu_decode._filter_kernel body driven by
    in-jit derived metadata.

    TDE_DEBLOCK_SKIP=v,h,cv,ch elides sub-passes at trace time (stage
    attribution experiments only — the output is wrong with any part
    skipped; run one variant per process so the jit cache is not reused
    across env changes)."""
    _dbg_skip = set(filter(None, os.environ.get(
        "TDE_DEBLOCK_SKIP", "").split(",")))
    H, W, sub_x, sub_y = st["H"], st["W"], st["sub_x"], st["sub_y"]
    bd, bdc = st["bd"], st["bdc"]
    has_chroma = not st["mono"]
    is420 = sub_x == 2 and sub_y == 2
    pb_h, pb_w = feed["qp4"].shape
    cs4 = st["ctb_size"] // 4
    cy = jnp.arange(pb_h) // cs4
    cx = jnp.arange(pb_w) // cs4
    sidx4 = jnp.clip(feed["slice_idx"][cy[:, None], cx[None, :]], 0,
                     st["n_slices"] - 1)
    disabled4 = recs[sidx4, 1] != 0
    sa4 = feed["slice_addr"][cy[:, None], cx[None, :]]
    ti4 = feed["tile_id"][cy[:, None], cx[None, :]]
    across4 = recs[sidx4, 9] != 0

    def gate(axis):
        sp = jnp.roll(sa4, 1, axis=axis)
        tp = jnp.roll(ti4, 1, axis=axis)
        slice_ok = (sp == sa4) | across4
        tile_ok = st["across_tiles"] | (tp == ti4)
        return (slice_ok & tile_ok & ~disabled4).astype(jnp.int32)

    dbf = feed["dbf4"]
    meta = {
        "intra": (feed["cu4"] & 1).astype(jnp.int32),
        "nzc": (feed["nzc4"] & 1).astype(jnp.int32),
        "tu_edge_v": ((dbf & 1) != 0).astype(jnp.int32),
        "tu_edge_h": ((dbf & 2) != 0).astype(jnp.int32),
        "pu_edge_v": ((dbf & 4) != 0).astype(jnp.int32),
        "pu_edge_h": ((dbf & 8) != 0).astype(jnp.int32),
        "qp": feed["qp4"],
        "pf": cell["pf"].reshape(pb_h, pb_w),
        "mv": [[cell[f"mv{l}x"].reshape(pb_h, pb_w),
                cell[f"mv{l}y"].reshape(pb_h, pb_w)] for l in (0, 1)],
        "rp": [cell[f"poc{l}"].reshape(pb_h, pb_w) for l in (0, 1)],
        "bit_depth": bd,
        "beta_off": recs[sidx4, 2],
        "tc_off": recs[sidx4, 3],
        "cqo0": recs[sidx4, 10],
        "cqo1": recs[sidx4, 11],
        "unfilt": skip4.astype(jnp.int32),
        # optional positional masks (halo-padded tile shards: kill edges at
        # or beyond the real picture bounds, which are interior columns of
        # the padded array and so invisible to the edge-0 drop below)
        "allow_v": gate(1) * feed.get("allow_xv", 1),
        "allow_h": gate(0) * feed.get("allow_xh", 1),
    }

    y = planes[0]
    cb = planes[1] if has_chroma else planes[0]
    cr = planes[2] if has_chroma else planes[0]
    Ev, Eh = W // 8, H // 8
    # Pallas single-sweep passes (natural layout for BOTH orientations —
    # no full-plane transposes); the XLA chain stays as the CPU-test path
    use_pl = bool(st.get("pallas_deblock", False))
    interp = bool(st.get("pallas_interp", dbp.default_interpret()))

    pv = _edge_params_jnp(meta, vertical=True)
    params_v = {k: _pad_edge0_cols(v, Ev) for k, v in pv.items()
                if k not in ("cqo", "tco")}
    if "v" not in _dbg_skip:
        pad = jnp.zeros((H, W + 8), jnp.int32).at[:, 4:4 + W].set(y)
        if use_pl:
            y = dbp.luma_pass(pad, params_v["bs"], params_v["beta"],
                              params_v["tc"], params_v["no_p"],
                              params_v["no_q"], bit_depth=bd,
                              interpret=interp)[:, 4:4 + W]
        else:
            y = dbk._luma_pass(pad, params_v["bs"], params_v["beta"],
                               params_v["tc"], params_v["no_p"],
                               params_v["no_q"], bit_depth=bd)[:, 4:4 + W]
    if has_chroma and "cv" not in _dbg_skip:
        segs = jnp.arange(0, Ev, sub_x)
        cqo = [_pad_edge0_cols(c, Ev) for c in pv["cqo"]]
        tco = _pad_edge0_cols(jnp.broadcast_to(pv["tco"], pv["bs"].shape), Ev)
        Ec = (W // sub_x) // 8
        # cb and cr run as ONE vmapped pass (same params except the QP
        # offset); halves the chroma filter's op count
        qpi = (params_v["qp_l"][:, segs][None] +
               jnp.stack([c[:, segs] for c in cqo]))
        qpc = _chroma_qp_map(qpi, is420)
        tc_c = jnp.asarray(dbk.TC_TABLE)[
            jnp.clip(qpc + 2 + tco[None, :, segs], 0, 53)] << (bdc - 8)
        tc_c = jnp.where(params_v["bs"][None, :, segs] == 2, tc_c, 0)
        Hc = H // sub_y
        padc = jnp.zeros((2, Hc, W // sub_x + 8), jnp.int32)
        padc = padc.at[:, :, 2:2 + W // sub_x].set(jnp.stack([cb, cr]))
        if use_pl:
            outc = dbp.chroma_pass_stacked(
                padc, tc_c[:, :, :Ec], params_v["no_p"][:, segs][:, :Ec],
                params_v["no_q"][:, segs][:, :Ec], bit_depth=bdc,
                rows_per_seg=4 // sub_y, interpret=interp)
        else:
            outc = jax.vmap(
                lambda p, t: dbk._chroma_pass(
                    p, t, params_v["no_p"][:, segs][:, :Ec],
                    params_v["no_q"][:, segs][:, :Ec],
                    bit_depth=bdc, rows_per_seg=4 // sub_y))(
                padc, tc_c[:, :, :Ec])
        cb, cr = outc[0, :, 2:2 + W // sub_x], outc[1, :, 2:2 + W // sub_x]

    ph = _edge_params_jnp(meta, vertical=False)

    def _pad0_rows(a):
        return jnp.concatenate(
            [jnp.zeros((1, a.shape[1]), a.dtype), a], axis=0)[:Eh]

    # natural [Eh, W/4] orientation (edge e at picture y = 8e)
    ph_n = {k: _pad0_rows(v) for k, v in ph.items()
            if k not in ("cqo", "tco")}
    ph_t = {k: v.T for k, v in ph_n.items()}
    if "h" not in _dbg_skip:
        if use_pl:
            pad = jnp.zeros((H + 8, W), jnp.int32).at[4:4 + H, :].set(y)
            y = dbp.luma_pass_h(pad, ph_n["bs"], ph_n["beta"], ph_n["tc"],
                                ph_n["no_p"], ph_n["no_q"], bit_depth=bd,
                                interpret=interp)[4:4 + H, :]
        else:
            pad = jnp.zeros((W, H + 8), jnp.int32).at[:, 4:4 + H].set(y.T)
            y = dbk._luma_pass(pad, ph_t["bs"], ph_t["beta"], ph_t["tc"],
                               ph_t["no_p"], ph_t["no_q"],
                               bit_depth=bd)[:, 4:4 + H].T
    if has_chroma and "ch" not in _dbg_skip:
        segs_h = jnp.arange(0, Eh, sub_y)
        cqo_n = [_pad0_rows(jnp.broadcast_to(c, ph["bs"].shape))
                 for c in ph["cqo"]]
        tco_n = _pad0_rows(jnp.broadcast_to(ph["tco"], ph["bs"].shape))
        Ech = (H // sub_y) // 8
        qpi = (ph_n["qp_l"][segs_h, :][None] +
               jnp.stack([c[segs_h, :] for c in cqo_n]))
        qpc = _chroma_qp_map(qpi, is420)
        tc_c = jnp.asarray(dbk.TC_TABLE)[
            jnp.clip(qpc + 2 + tco_n[None, segs_h, :], 0, 53)] << (bdc - 8)
        tc_c = jnp.where(ph_n["bs"][None, segs_h, :] == 2, tc_c, 0)
        Wc = W // sub_x
        if use_pl:
            padc = jnp.zeros((2, H // sub_y + 8, Wc), jnp.int32)
            padc = padc.at[:, 2:2 + H // sub_y, :].set(jnp.stack([cb, cr]))
            outc = dbp.chroma_pass_stacked_h(
                padc, tc_c[:, :Ech, :], ph_n["no_p"][segs_h, :][:Ech],
                ph_n["no_q"][segs_h, :][:Ech], bit_depth=bdc,
                cols_per_seg=4 // sub_x, interpret=interp)
            cb = outc[0, 2:2 + H // sub_y, :]
            cr = outc[1, 2:2 + H // sub_y, :]
        else:
            padc = jnp.zeros((2, Wc, H // sub_y + 8), jnp.int32)
            padc = padc.at[:, :, 2:2 + H // sub_y].set(
                jnp.stack([cb.T, cr.T]))
            tc_t = jnp.swapaxes(tc_c, 1, 2)
            outc = jax.vmap(
                lambda p, t: dbk._chroma_pass(
                    p, t, ph_t["no_p"][:, segs_h][:, :Ech],
                    ph_t["no_q"][:, segs_h][:, :Ech],
                    bit_depth=bdc, rows_per_seg=4 // sub_x))(
                padc, tc_t[:, :, :Ech])
            cb = outc[0, :, 2:2 + H // sub_y].T
            cr = outc[1, :, 2:2 + H // sub_y].T

    return [y, cb, cr] if has_chroma else [y]


def _frame_fn(refs_y, refs_cb, refs_cr, feed, sf_tables, st):
    """The fused whole-picture program (traced under jit via _compiled)."""
    H, W = st["H"], st["W"]
    sub_x, sub_y = st["sub_x"], st["sub_y"]
    bd, bdc = st["bd"], st["bdc"]
    has_chroma = not st["mono"]
    pb_h, pb_w = feed["pu_idx"].shape

    # ---- per-cell PU parameter gather (from the natively painted pu_idx) --
    pidx = feed["pu_idx"].reshape(-1)
    covered = pidx >= 0
    pc = jnp.clip(pidx, 0)
    pu = feed["pu"]  # [Pcap, 10]: mv0x mv0y mv1x mv1y pf slot0 slot1 r0 r1 sl
    cell = {}
    cell["pf"] = jnp.where(covered, pu[pc, 4], 0)
    for l in (0, 1):
        has = ((cell["pf"] >> l) & 1).astype(bool)
        cell[f"mv{l}x"] = jnp.where(has, pu[pc, 0 + 2 * l], 0)
        cell[f"mv{l}y"] = jnp.where(has, pu[pc, 1 + 2 * l], 0)
        cell[f"slot{l}"] = jnp.where(has, pu[pc, 5 + l], 0)
        cell[f"poc{l}"] = jnp.where(
            has, feed["ref_pocs"][jnp.clip(pu[pc, 5 + l], 0)], NOREF)
        cell[f"ridx{l}"] = jnp.where(has, jnp.clip(pu[pc, 7 + l], 0), 0)
    cell["slice"] = jnp.clip(pu[pc, 9], 0, st["n_slices"] - 1)

    recs = feed["slice_recs"]
    sl = cell["slice"]
    wg = {"weighted": (recs[sl, 6] != 0).astype(jnp.int32),
          "denom_l": recs[sl, 7], "denom_c": recs[sl, 8]}
    for l in (0, 1):
        r = cell[f"ridx{l}"]
        wg[f"lw{l}"] = recs[sl, 16 + l * 16 + r]
        wg[f"lo{l}"] = recs[sl, 48 + l * 16 + r]
        for c in (0, 1):
            wg[f"cw{l}{c}"] = recs[sl, 80 + (l * 16 + r) * 2 + c]
            wg[f"co{l}{c}"] = recs[sl, 144 + (l * 16 + r) * 2 + c]

    # ---- inter prediction over the cell grid ----
    if st["has_inter"] and st.get("run_mc", True):
        def mc_branch(_):
            y, cbp, crp = _mc_section(refs_y, refs_cb, refs_cr, cell, wg, st,
                                      pb_h, pb_w, feed)
            m = jnp.repeat(jnp.repeat(covered.reshape(pb_h, pb_w), 4, 0),
                           4, 1)[:H, :W]
            y = jnp.where(m, y, 0)
            if has_chroma:
                mc_ = jnp.repeat(jnp.repeat(covered.reshape(pb_h, pb_w),
                                            4 // sub_y, 0),
                                 4 // sub_x, 1)[:H // sub_y, :W // sub_x]
                cbp = jnp.where(mc_, cbp, 0)
                crp = jnp.where(mc_, crp, 0)
                return (y, cbp, crp)
            return (y, y[:1, :1], y[:1, :1])

        def mc_zero(_):
            z = jnp.zeros((H, W), jnp.int32)
            if has_chroma:
                zc = jnp.zeros((H // sub_y, W // sub_x), jnp.int32)
                return (z, zc, zc)
            return (z, z[:1, :1], z[:1, :1])

        # dynamic per-frame gate: intra pictures carry no PUs, so the whole
        # MC section (gathers + Pallas stripes) is skipped at runtime
        y, cbp, crp = lax.cond(feed["mc_on"][0] != 0, mc_branch, mc_zero,
                               0)
        planes = [y, cbp, crp] if has_chroma else [y]
    else:
        planes = [jnp.zeros((H, W), jnp.int32)]
        if has_chroma:
            planes += [jnp.zeros((H // sub_y, W // sub_x), jnp.int32)] * 2

    # ---- residual bins (sparse->dense scatter + dequant + IDCT) ----
    bin_res = {}
    ccaps = dict(zip((2, 3, 4, 5), st.get("ccaps", (0, 0, 0, 0))))
    for lg in st["lgs"] if st.get("run_residual", True) else ():
        s = 1 << lg
        bf = feed[f"bin{lg}"]
        if st.get("pallas_coef", False):
            # TPU-native CSR densify (DMA windows + MXU one-hot matmul)
            # instead of XLA's serializing generic scatter
            levels = cfp.densify_bin(
                bf["cv"], bf["coff"], N=bf["qp"].shape[0], S=s,
                CAP=max(ccaps.get(lg, 1), 1),
                interpret=st.get("pallas_interp", False))
        else:
            crow = bf["crow"]
            cpos = bf["cpos"]
            levels = jnp.zeros((bf["qp"].shape[0], s, s), jnp.int32)
            levels = levels.at[crow, cpos >> 6, cpos & 63].set(
                bf["cval"], mode="drop", unique_indices=True)
        if "cfx" in bf:
            # escape corrections: the 4-bit wire value clamps to +-7;
            # the full-precision delta scatter-adds here (~1.5% of levels)
            cfx, cfv = bf["cfx"], bf["cfv"]
            rr = jnp.where(cfx >= 0, jnp.clip(cfx, 0) // (s * s), 1 << 30)
            pp = jnp.clip(cfx, 0) % (s * s)
            levels = levels.at[rr, pp // s, pp % s].add(
                cfv, mode="drop", unique_indices=True)
        flags = bf["flags"]
        tskip = (flags & TU_TRANSFORM_SKIP) != 0
        use_dst = (flags & TU_USE_DST) != 0
        bypass = (flags & TU_TQ_BYPASS) != 0
        if st["scaling"]:
            sf = sf_tables[lg - 2][bf["mid"]]
            res = tx.residual_batch(levels, tx.qp_to_fact_jnp(bf["qp"]),
                                    tskip, use_dst, lg, bd, sf=sf,
                                    qp=bf["qp"])
        else:
            res = tx.residual_batch(levels, tx.qp_to_fact_jnp(bf["qp"]),
                                    tskip, use_dst, lg, bd)
        base = jnp.where(bypass[:, None, None], levels, res)
        if st.get("has_rdpcm", False):
            # RDPCM (RExt 7.4.9.8 / 8.6.4): directional prefix sums over the
            # bypass levels or the transform-skip-scaled residual.  The flag
            # is only ever set on ts/bypass TUs (native/src/residual.cc:405)
            rd = ((flags & TU_RDPCM) != 0) & (tskip | bypass)
            vert = (flags & TU_RDPCM_VERTICAL) != 0
            cs = jnp.where(vert[:, None, None], jnp.cumsum(base, axis=1),
                           jnp.cumsum(base, axis=2))
            base = jnp.where(rd[:, None, None], cs, base)
        bin_res[lg] = base

    if st.get("has_ccp", False) and st.get("run_residual", True):
        # RExt cross-component prediction (8.6.6): chroma residual +=
        # (scale * ((r_y << bdc) >> bd)) >> 3 with the reference decoder's
        # logical-uint32 shifts and int32 product wraparound
        # (native/src/transform.cc CCP hook); partner rows are same-bin
        # luma TUs resolved at pack time (_bin_tus)
        for lg in st["lgs"]:
            bf = feed[f"bin{lg}"]
            pr, sc_ = bf["ccp_row"], bf["ccp_scale"]
            r_y = bin_res[lg][jnp.clip(pr, 0)]
            term = (r_y.astype(jnp.uint32) << st["bdc"]) >> st["bd"]
            prod = (sc_.astype(jnp.uint32)[:, None, None] * term) \
                .astype(jnp.int32)
            bin_res[lg] = jnp.where((pr >= 0)[:, None, None],
                                    bin_res[lg] + (prod >> 3), bin_res[lg])

    # ---- inter residual scatter-add + clip ----
    if not st.get("run_residual", True):
        for lg in st["lgs"]:
            s_ = 1 << lg
            bin_res[lg] = jnp.zeros((feed[f"bin{lg}"]["qp"].shape[0], s_, s_),
                                    jnp.int32)
    elif st["pallas_mc"]:
        # segment kernel: band stripes per (bin, channel), dense add
        pb_h2 = (H + 3) // 4
        interp_r = jax.default_backend() not in ("tpu", "axon")
        for c, ch in ((0, "y"), (1, "cb"), (2, "cr")):
            if c > 0 and not has_chroma:
                continue
            Hc = H if c == 0 else st["ch"]
            Wc = W if c == 0 else st["cw"]
            ORc = 4 if c == 0 else 4 // sub_y
            wout = max(256, (Wc + 127) & ~127)
            acc = None
            for lg in st["lgs"]:
                key = f"rs{lg}{ch}"
                if f"{key}.n" not in feed:
                    continue
                stripes = mcp.residual_stripes(
                    bin_res[lg], feed[f"{key}.n"], feed[f"{key}.sw"],
                    OR=ORc, S=1 << lg, Wout=wout,
                    n_bands=pb_h2, interpret=interp_r)
                acc = stripes if acc is None else acc + stripes
            if acc is not None:
                res = acc.reshape(pb_h2 * ORc, wout)[:Hc, :Wc]
                planes[c] = planes[c] + res
    else:
        for lg in st["lgs"]:
            s = 1 << lg
            bf = feed[f"bin{lg}"]
            for c, ch in ((0, "y"), (1, "cb"), (2, "cr")):
                if c > 0 and not has_chroma:
                    continue
                sc = bf[f"sc_{ch}"]  # [cap, 3] rows/x/y ; pad rows = -1
                if sc.shape[0] == 0:
                    continue
                rows, xs, ys = sc[:, 0], sc[:, 1], sc[:, 2]
                blk = jnp.where((rows >= 0)[:, None, None],
                                bin_res[lg][jnp.clip(rows, 0)], 0)
                iy = jnp.where(rows < 0, -(s + 1), ys)[:, None, None] + \
                    jnp.arange(s)[None, :, None]
                ix = xs[:, None, None] + jnp.arange(s)[None, None, :]
                planes[c] = planes[c].at[iy, ix].add(blk, mode="drop",
                                                     unique_indices=True)
    planes[0] = jnp.clip(planes[0], 0, (1 << bd) - 1)
    if has_chroma:
        planes[1] = jnp.clip(planes[1], 0, (1 << bdc) - 1)
        planes[2] = jnp.clip(planes[2], 0, (1 << bdc) - 1)

    # ---- PCM scatter ----
    for c in range(len(planes)):
        pcm = feed[f"pcm{c}"]
        if pcm.shape[0]:
            flat = planes[c].reshape(-1)
            flat = flat.at[pcm[:, 0]].set(pcm[:, 1], mode="drop")
            planes[c] = flat.reshape(planes[c].shape)

    # ---- intra super-wave scans (one merged scan over all planes) ----
    if st["intra_bins"]:
        bins_by_plane = _scatter_intra_bins(feed["irec"], st["intra_bins"],
                                            st["steps_cap"])
        planes = _intra_scan_all(planes, bins_by_plane, bin_res, st,
                                 feed["nsteps"])

    # ---- loop filters ----
    skip4 = (feed["cu4"] & 4) != 0
    if st["pcm_lf_disable"]:
        skip4 = skip4 | ((feed["cu4"] & 2) != 0)
    if st["run_deblock"]:
        planes = _deblock_section(planes, feed, recs, cell, skip4, st)
    if st["run_sao"]:
        planes = _sao_section(planes, feed, recs, skip4, st)
    if st.get("fuse_store"):
        # write the decoded planes into their (donated) DPB ring slots
        # inside the same program: zero extra dispatches per frame
        refs = [refs_y, refs_cb, refs_cr]
        outs = []
        for c in range(len(planes)):
            hp = refs[c].shape[0] // (2 * MAX_REFS + 1)
            wp = refs[c].shape[1]
            h, w = planes[c].shape
            padded = jnp.pad(planes[c],
                             ((mcp.PADT, hp - h - mcp.PADT),
                              (mcp.PADL, wp - w - mcp.PADL)), mode="edge")
            outs.append(lax.dynamic_update_slice(
                refs[c], padded, (feed["slot_row"][c], 0)))
        while len(outs) < 3:
            outs.append(refs[len(outs)])
        return tuple(planes) + tuple(outs)
    return tuple(planes)


def _mc_section(refs_y, refs_cb, refs_cr, cell, wg, st, pb_h, pb_w,
                feed=None):
    H, W = st["H"], st["W"]
    sub_x, sub_y = max(st["sub_x"], 1), max(st["sub_y"], 1)
    bd, bdc = st["bd"], st["bdc"]
    use_l1 = st["use_l1"]
    has_chroma = not st["mono"]
    N = pb_h * pb_w
    qf = jnp.asarray(QPEL_FILTERS)
    ef = jnp.asarray(EPEL_FILTERS)
    cy = (jnp.arange(N) // pb_w) * 4
    cx = (jnp.arange(N) % pb_w) * 4
    shx = 3 if sub_x == 2 else 2
    shy = 3 if sub_y == 2 else 2
    cs = 4 // sub_x
    csv = 4 // sub_y

    preds_l, preds_cb, preds_cr = [], [], []
    if st["pallas_mc"]:
        # segment kernel: refs_* are the padded [R*Hpad, Wpad] stacks
        Hc, Wc = max(st["ch"], 1), max(st["cw"], 1)
        hp, wp = mcp.pad_sizes(H, W)
        hpc, wpc = mcp.pad_sizes(Hc, Wc)
        wout_l = max(256, (W + 127) & ~127)
        wout_c = max(256, (Wc + 127) & ~127)
        kk = st["segk"]
        interp = jax.default_backend() not in ("tpu", "axon")

        def seg_args(l):
            return [feed[f"sg{l}n"], feed[f"sg{l}i"], feed[f"pu_mc{l}"]]

        for l in (0, 1) if use_l1 else (0,):
            sy = mcp.mc_stripes(refs_y, *seg_args(l), OR=4, T=8,
                                Hpad=hp, Wout=wout_l, n_bands=pb_h,
                                KMAX=kk, bd=bd, chroma=False,
                                Hdim=H, Wdim=W, sub_x=sub_x, sub_y=sub_y,
                                interpret=interp)
            blk = sy[:, :, :W].reshape(pb_h, 4, pb_w, 4).transpose(
                0, 2, 1, 3).reshape(N, 4, 4)
            preds_l.append(blk)
            if has_chroma:
                for refs_c, acc in ((refs_cb, preds_cb),
                                    (refs_cr, preds_cr)):
                    sc = mcp.mc_stripes(refs_c, *seg_args(l), OR=csv,
                                        T=4, Hpad=hpc, Wout=wout_c,
                                        n_bands=pb_h, KMAX=kk, bd=bdc,
                                        chroma=True, Hdim=Hc, Wdim=Wc,
                                        sub_x=sub_x, sub_y=sub_y,
                                        interpret=interp)
                    acc.append(sc[:, :, :Wc].reshape(
                        pb_h, csv, pb_w, cs).transpose(
                        0, 2, 1, 3).reshape(N, csv, cs))
    else:
        for l in (0, 1) if use_l1 else (0,):
            mvx, mvy = cell[f"mv{l}x"], cell[f"mv{l}y"]
            slot = cell[f"slot{l}"]
            xint = cx + (mvx >> 2)
            yint = cy + (mvy >> 2)
            preds_l.append(_mc_plane(refs_y, slot, xint, yint, mvx & 3,
                                     mvy & 3, qf, 8, 4, bd))
            if has_chroma:
                cxc = cx // sub_x + (mvx >> shx)
                cyc = cy // sub_y + (mvy >> shy)
                fcx = (mvx & 7) if sub_x == 2 else ((mvx & 3) << 1)
                fcy = (mvy & 7) if sub_y == 2 else ((mvy & 3) << 1)
                preds_cb.append(_mc_plane(refs_cb, slot, cxc, cyc, fcx, fcy,
                                          ef, 4, cs, bdc)[:, :csv, :cs])
                preds_cr.append(_mc_plane(refs_cr, slot, cxc, cyc, fcx, fcy,
                                          ef, 4, cs, bdc)[:, :csv, :cs])

    pf = cell["pf"]
    bi = pf == 3
    first = jnp.where((pf & 1) != 0, 0, 1)
    if use_l1:
        fsel = first[:, None, None] == 0
        p0_l = jnp.where(fsel, preds_l[0], preds_l[1])
        p1_l = preds_l[1]
        w0 = jnp.where(first == 0, wg["lw0"], wg["lw1"])
        o0 = jnp.where(first == 0, wg["lo0"], wg["lo1"])
    else:
        p0_l = p1_l = preds_l[0]
        w0, o0 = wg["lw0"], wg["lo0"]
    y_blk = _merge(p0_l, p1_l, bi, wg["weighted"], w0, o0, wg["lw1"],
                   wg["lo1"], wg["denom_l"], bd)
    y_plane = _cells_to_plane(y_blk, pb_h, pb_w, 4)[:H, :W]
    if not has_chroma:
        return y_plane, None, None

    if use_l1:
        fsel = first[:, None, None] == 0
        pcb0 = jnp.where(fsel, preds_cb[0], preds_cb[1])
        pcr0 = jnp.where(fsel, preds_cr[0], preds_cr[1])
        pcb1, pcr1 = preds_cb[1], preds_cr[1]
        cbw0 = jnp.where(first == 0, wg["cw00"], wg["cw10"])
        cbo0 = jnp.where(first == 0, wg["co00"], wg["co10"])
        crw0 = jnp.where(first == 0, wg["cw01"], wg["cw11"])
        cro0 = jnp.where(first == 0, wg["co01"], wg["co11"])
    else:
        pcb0 = pcb1 = preds_cb[0]
        pcr0 = pcr1 = preds_cr[0]
        cbw0, cbo0 = wg["cw00"], wg["co00"]
        crw0, cro0 = wg["cw01"], wg["co01"]
    cb_blk = _merge(pcb0, pcb1, bi, wg["weighted"], cbw0, cbo0, wg["cw10"],
                    wg["co10"], wg["denom_c"], bdc)
    cr_blk = _merge(pcr0, pcr1, bi, wg["weighted"], crw0, cro0, wg["cw11"],
                    wg["co11"], wg["denom_c"], bdc)
    cb_plane = cb_blk.reshape(pb_h, pb_w, csv, cs).transpose(
        0, 2, 1, 3).reshape(pb_h * csv, pb_w * cs)[:H // sub_y, :W // sub_x]
    cr_plane = cr_blk.reshape(pb_h, pb_w, csv, cs).transpose(
        0, 2, 1, 3).reshape(pb_h * csv, pb_w * cs)[:H // sub_y, :W // sub_x]
    return y_plane, cb_plane, cr_plane


_SPARSE_BLOCK = 1024  # words per sparse-upload block (4 KB = 8x128 int32
#                       tile, so the Pallas expander's blocks are aligned)


@functools.partial(jax.jit, static_argnames=("total", "B"))
def _expand_blocks(blocks, idx, *, total, B):
    """Reassemble the full feed buffer from its nonzero blocks on device.

    Watermark padding must never cross the wire: the host ships only the
    blocks containing data plus their indices, and this tiny program
    scatters them into the zero-filled full-size buffer the main frame
    program expects.  One compile per (block-count bucket, total).

    XLA fallback formulation (CPU path): on TPU the scatter lowers to a
    serialized generic-scatter loop that cost ~40 ms/frame at 1080p —
    the device path uses _expand_blocks_pallas instead."""
    nb = (total + B - 1) // B
    full = jnp.zeros((nb, B), jnp.int32).at[idx].set(blocks, mode="drop")
    return full.reshape(-1)[:total]


def _expand_kernel(inv, blk, out):
    out[...] = jnp.where(inv[pl.program_id(0)] >= 0, blk[...], 0)


@functools.partial(jax.jit, static_argnames=("total", "B", "interpret"))
def _expand_blocks_pallas(blocks, inv, *, total, B, interpret=False):
    """Pallas expander: grid over output blocks; block b streams compact
    row inv[b] (prefetch-dependent index map) or zero-fills.  Replaces the
    XLA scatter in _expand_blocks (~40 ms -> sub-ms at 1080p)."""
    nb = (total + B - 1) // B
    M = blocks.shape[0]
    R = B // 128                    # 128-lane rows per sparse block
    src = blocks.reshape(M * R, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(
            (R, 128), lambda b, inv: (jnp.maximum(inv[b], 0), 0))],
        out_specs=pl.BlockSpec((R, 128), lambda b, inv: (b, 0)),
    )
    out = pl.pallas_call(
        _expand_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * R, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(inv, src)
    return out.reshape(-1)[:total]


@functools.partial(jax.jit, static_argnames=("st", "layout"),
                   donate_argnums=(0, 1, 2))
def _compiled_store(refs_y, refs_cb, refs_cr, buf, sf_tables, st, layout):
    """Donating variant: the DPB ring buffers alias through the program
    (st must carry fuse_store=True; feed carries the per-plane slot rows)."""
    return _compiled_impl(refs_y, refs_cb, refs_cr, buf, sf_tables, st,
                          layout)


@functools.partial(jax.jit, static_argnames=("st", "layout"))
def _compiled(refs_y, refs_cb, refs_cr, buf, sf_tables, st, layout):
    """st: tuple of sorted (name, value) pairs — the static config.
    layout: tuple of (dotted-name, offset, shape) into the packed buffer."""
    return _compiled_impl(refs_y, refs_cb, refs_cr, buf, sf_tables, st,
                          layout)


def _compiled_impl(refs_y, refs_cb, refs_cr, buf, sf_tables, st, layout):
    feed = {}
    for (k, off, shp) in layout:
        n = int(np.prod(shp))
        a = buf[off:off + n].reshape(shp)
        parts = k.split(".")
        if parts[0].startswith("bin"):
            feed.setdefault(parts[0], {})[parts[1]] = a
        else:
            feed[k] = a
    std = dict(st)
    _expand_feed(feed, keep_csr=std.get("pallas_coef", False), std=std)
    return _frame_fn(refs_y, refs_cb, refs_cr, feed, sf_tables, std)


def _expand_feed(feed, keep_csr=False, std=None):
    """Expand the wire-compact feed fields in-graph (the transfer tunnel
    is the decode bottleneck at ~50 MB/s, so every field crosses packed and
    is unpacked here with a few vector ops).  With keep_csr the coefficient
    stream stays CSR (cv/coff) for the Pallas densify kernel and the
    searchsorted row derivation is skipped entirely."""
    for k, d in feed.items():
        if not (k.startswith("bin") and isinstance(d, dict) and "cv" in d):
            continue
        if "tm" in d:
            # TU meta halfwords: qp7 (signed) | flags6<<7 | mid3<<13
            tm = d.pop("tm")
            h = jnp.stack([tm & 0xFFFF, (tm >> 16) & 0xFFFF],
                          axis=1).reshape(-1)[:d["coff"].shape[0] - 1]
            d["qp"] = ((h & 0x7F) ^ 64) - 64
            d["flags"] = (h >> 7) & 0x3F
            d["mid"] = (h >> 13) & 7
        if keep_csr:
            continue
        # expand the byte-entry stream for the XLA scatter path: positions
        # are delta-coded per TU (zero bytes advance by 15 and emit
        # nothing), so re-derive them with one cumsum + per-row rebase.
        cv, coff = d.pop("cv"), d.pop("coff")
        s = 1 << int(k[3:])
        ent = jnp.stack([(cv >> (8 * h)) & 0xFF for h in range(4)],
                        axis=1).reshape(-1)
        cval = ((ent >> 4) ^ 8) - 8
        step = jnp.where(cval == 0, 15, (ent & 0xF) + 1)
        i = jnp.arange(ent.shape[0], dtype=jnp.int32)
        crow = jnp.searchsorted(coff, i, side="right").astype(jnp.int32) - 1
        C = jnp.cumsum(step)
        Cexcl = jnp.concatenate([jnp.zeros(1, C.dtype), C])
        pos = C - Cexcl[jnp.clip(coff[jnp.clip(crow, 0)], 0, C.shape[0])] - 1
        d["crow"] = jnp.where((i < coff[-1]) & (cval != 0), crow, 1 << 30)
        d["cval"] = cval
        p10 = jnp.clip(pos, 0, s * s - 1)
        d["cpos"] = ((p10 // s) << 6) | (p10 % s)
    if "irecp" in feed:
        feed["irec"] = _unpack_irec(feed.pop("irecp"))
    pu = feed.get("pu")
    if pu is not None and pu.shape[1] in (4, 5):
        if pu.shape[1] == 5:
            # fold per-list kernel tables for the segment-MC / paint
            # kernels (they re-derive windows from mv/meta/geo via scalar
            # prefetch; the folds keep Mosaic's SMEM padding exact — see
            # mcp.pack_pu_mc).  Unused tables die in jit DCE.
            feed["pu_mc0"] = mcp.pack_pu_mc(pu, 0)
            feed["pu_mc1"] = mcp.pack_pu_mc(pu, 1)
            feed["pu_geo"] = mcp.pack_pu_geo(pu)
        mv0, mv1, meta, sl = pu[:, 0], pu[:, 1], pu[:, 2], pu[:, 3]
        feed["pu"] = jnp.stack(
            [(mv0 << 16) >> 16, mv0 >> 16, (mv1 << 16) >> 16, mv1 >> 16,
             meta & 3, (meta >> 2) & 63, (meta >> 8) & 63,
             (meta >> 14) & 15, (meta >> 18) & 15, sl], axis=1)
    if "g4" in feed and std is not None and std.get("g4_half"):
        # halfword grid (two cells per word): qp8 | nzc1<<8 | dbf4<<9 |
        # cu3<<13; the per-cell PU index never crosses the wire — it is
        # painted on device from the segment index feed
        g4p = feed.pop("g4")
        pb_h = g4p.shape[0]
        W4 = (std["W"] + 3) // 4
        g4 = jnp.stack([g4p & 0xFFFF, (g4p >> 16) & 0xFFFF],
                       axis=2).reshape(pb_h, -1)[:, :W4]
        feed["qp4"] = g4 & 0xFF
        feed["nzc4"] = (g4 >> 8) & 1
        feed["dbf4"] = (g4 >> 9) & 0xF
        feed["cu4"] = (g4 >> 13) & 0x7
        if "sg0i" in feed:
            L = 2 if "sg1i" in feed else 1
            nseg2 = jnp.stack([feed[f"sg{l}n"] for l in range(L)])
            sidx2 = jnp.stack([feed[f"sg{l}i"] for l in range(L)], axis=1)
            feed["pu_idx"] = mcp.paint_pu_idx(
                nseg2, sidx2, feed["pu_geo"], n_bands=pb_h, W4=W4, L=L,
                interpret=bool(std.get("pallas_interp", False)))
        else:  # intra-only stream: no inter coverage
            feed["pu_idx"] = jnp.full((pb_h, W4), -1, jnp.int32)
    elif "g4" in feed:
        g4 = feed.pop("g4")
        feed["qp4"] = g4 & 0xFF
        feed["nzc4"] = (g4 >> 8) & 1
        feed["dbf4"] = (g4 >> 9) & 0xF
        feed["cu4"] = (g4 >> 13) & 0xF
        if "pu_idx" not in feed:
            feed["pu_idx"] = ((g4 >> 17) & 0x7FFF) - 1


# ---------------------------------------------------------------------------
# the decoder
# ---------------------------------------------------------------------------

class FusedDecoder:
    """One fused jit dispatch per picture, with watermark-grown capacities.

    Usage:
        fd = FusedDecoder()
        planes = fd.decode(prog)    # device arrays, also cached by POC
    Use plan_stream(progs) first to pre-size the capacities (single compile).
    """

    def __init__(self, run_deblock=True, run_sao=True):
        _warn_debug_knobs()
        self.run_deblock = run_deblock
        self.run_sao = run_sao
        # stage attribution for profiling: TDE_FUSED_SKIP=intra,mc,residual,
        # deblock,sao compiles a program with those sections elided
        skip = set(filter(None, os.environ.get(
            "TDE_FUSED_SKIP", "").split(",")))
        self._skip = skip
        if "deblock" in skip:
            self.run_deblock = False
        if "sao" in skip:
            self.run_sao = False
        self.dpb = {}
        self._order = []
        self.caps = {"pu": 1, "slices": 1, "steps": 0, "nintra": 0}
        for lg in (2, 3, 4, 5):
            self.caps[f"tu{lg}"] = 0
            self.caps[f"co{lg}"] = 0
            self.caps[f"cc{lg}"] = 0  # max entries per TU (densify CAP)
            self.caps[f"cf{lg}"] = 0  # escape corrections (|val| > 31)
            for ch in ("y", "cb", "cr"):
                self.caps[f"sc{lg}{ch}"] = 0
        for c in range(3):
            self.caps[f"pcm{c}"] = 0
        self._intra_lgs = set()  # (plane_class, lg) seen
        self._sf_tables = None
        # sticky trace-variant latches (see decode())
        self._use_l1 = False
        self._has_inter = False
        self._multi = False
        self._has_ccp = False
        self._has_rdpcm = False
        # Pallas segment-MC path: on for real TPU backends; the XLA gather
        # path stays for CPU tests (interpret mode is far too slow there)
        self.use_pallas_mc = jax.default_backend() in ("tpu", "axon")
        # native C++ feed packer (feedpack.cc); numpy fallback for programs
        # without a live native source or when TDE_NO_NATIVE_PACK is set
        self._no_native_pack = bool(os.environ.get("TDE_NO_NATIVE_PACK"))
        # A/B escape hatch: fall back to the XLA scatter densify
        self._no_pallas_coef = bool(os.environ.get("TDE_NO_PALLAS_COEF"))
        self.caps["segk"] = 0
        # persistent replicate-padded DPB ring (device-resident, in-place
        # slot updates via buffer donation); slot MAX_REFS stays gray
        self._stack = None
        self._stack_dims = None
        self._slot_of = {}
        self._slot_lru = []

    # -- capacity planning --

    def _grow(self, key, n, pad_zero_ok=True):
        if n > self.caps.get(key, 0):
            self.caps[key] = _pow2(n)
        return self.caps[key]

    def plan_stream(self, progs):
        """Pre-size every capacity from a list of FrameProgramData so the
        whole stream decodes with a single compilation per (use_l1,...)."""
        for prog in progs:
            if self._exotic(prog):
                continue
            self._note_rext(prog)
            if self.use_pallas_mc and not self._no_native_pack \
                    and not self._has_ccp:
                caps = self._native_caps(prog)
                if caps is not None:
                    self._plan_from_caps(prog, caps)
                    continue
            bins, tl, tr = _bin_tus(prog)
            sub_y0 = prog.height // prog.chroma_height \
                if prog.chroma_height else 1
            for lg, b in bins.items():
                self._grow(f"tu{lg}", b["n"])
                self._grow(f"co{lg}", len(b["cv"]))
                self._grow(f"cc{lg}",
                           int(np.diff(b["coff"]).max(initial=1)))
                self._grow(f"cf{lg}", len(b["cfx"]))
                for c, ch in ((0, "y"), (1, "cb"), (2, "cr")):
                    self._grow(f"sc{lg}{ch}", len(b[f"sc_{ch}"]))
                    if self.use_pallas_mc and len(b[f"sc_{ch}"]):
                        ORc = 4 if c == 0 else 4 // max(sub_y0, 1)
                        band, srow, x0s = mcp.plan_residual_segments(
                            b[f"sc_{ch}"], 1 << lg, ORc)
                        _, _, K = mcp.pack_band_segments(
                            band, srow, x0s, (prog.height + 3) // 4)
                        self._grow(f"rk{lg}{ch}", K)
            self._grow("pu", len(prog.pus))
            self._grow("slices", len(prog.slice_records))
            self._use_l1 = self._use_l1 or (
                bool((prog.pus["pred_flags"] & 2).any()) if len(prog.pus)
                else False)
            self._has_inter = self._has_inter or len(prog.pus) > 0
            self._multi = self._multi or bool(
                (len(prog.slice_records) > 1 and
                 not np.all(prog.slice_records[:, 9])) or
                not prog.across_tiles)
            if len(prog.intras):
                for c, lg in set(zip(prog.intras["cidx"].tolist(),
                                     prog.intras["log2_size"].tolist())):
                    self._intra_lgs.add((_PLANE_CLASS[int(c)], int(lg)))
                if prog.ip is not None:
                    n_steps = int(prog.ip["step"].max(initial=-1)) + 1
                else:
                    _, n_steps, _ = _plan_intra(prog, tl, tr)
            else:
                n_steps = 0
            self._grow("steps", n_steps)
            self._grow("nintra", len(prog.intras))
            sub_x = prog.width // prog.chroma_width if prog.chroma_width \
                else 1
            sub_y = prog.height // prog.chroma_height if prog.chroma_height \
                else 1
            pcm = _pack_pcm(prog, sub_x, sub_y)
            for c in range(3):
                self._grow(f"pcm{c}", len(pcm[c]))
            if self.use_pallas_mc and len(prog.pus):
                for l in (0, 1):
                    _, _, K = mcp.plan_segment_indices(
                        prog.pus, l, prog.height)
                    self._grow("segk", K)

    # -- helpers --

    def _note_rext(self, prog):
        """Track stream-level RExt features that change the compiled
        program (static config keys has_ccp / has_rdpcm)."""
        if len(prog.tus):
            self._has_ccp = self._has_ccp or \
                bool((prog.tus["cross_comp_scale"] != 0).any())
            self._has_rdpcm = self._has_rdpcm or \
                bool(((prog.tus["flags"] & TU_RDPCM) != 0).any())

    @staticmethod
    def _exotic(prog):
        # CCP and RDPCM are handled in-graph (bin-level partner add /
        # masked cumsum); only >MAX_REFS streams still leave the device
        return len(prog.ref_pocs) > MAX_REFS

    # -- persistent padded DPB ring (pallas path) --

    @staticmethod
    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("hp", "wp"))
    def _upd_slot(stack, plane, row0, hp: int, wp: int):
        """Write one decoded plane (replicate-padded) into its ring slot,
        in place (donated HBM buffer)."""
        h, w = plane.shape
        padded = jnp.pad(plane, ((mcp.PADT, hp - h - mcp.PADT),
                                 (mcp.PADL, wp - w - mcp.PADL)), mode="edge")
        return lax.dynamic_update_slice(stack, padded, (row0, 0))

    def _ensure_stack(self, prog):
        H, W = prog.height, prog.width
        cw = max(prog.chroma_width, 1)
        ch = max(prog.chroma_height, 1)
        hp, wp = mcp.pad_sizes(H, W)
        hpc, wpc = mcp.pad_sizes(ch, cw)
        dims = ((hp, wp), (hpc, wpc), (hpc, wpc))
        if self._stack is not None and self._stack_dims == dims:
            return dims
        self._stack = [
            jnp.full(((2 * MAX_REFS + 1) * hh, ww),
                     1 << (prog.bit_depth[min(c, 1)] - 1), jnp.int32)
            for c, (hh, ww) in enumerate(dims)]
        self._stack_dims = dims
        self._slot_of = {}
        self._slot_lru = []
        return dims

    def _alloc_slot(self, poc):
        if poc in self._slot_of:
            self._slot_lru.remove(poc)
            self._slot_lru.append(poc)
            return self._slot_of[poc]
        if len(self._slot_lru) >= 2 * MAX_REFS:
            old = self._slot_lru.pop(0)
            slot = self._slot_of.pop(old)
        else:
            slot = len(self._slot_lru)
            used = set(self._slot_of.values())
            while slot in used:
                slot += 1
        self._slot_of[poc] = slot
        self._slot_lru.append(poc)
        return slot

    def _store_stack(self, poc, planes, prog):
        dims = self._ensure_stack(prog)
        slot = self._alloc_slot(poc)
        for c in range(min(3, len(planes))):
            hh, ww = dims[c]
            self._stack[c] = self._upd_slot(self._stack[c], planes[c],
                                            slot * hh, hp=hh, wp=ww)

    def _refs(self, prog):
        pocs = list(prog.ref_pocs)
        H, W = prog.height, prog.width
        cw = max(prog.chroma_width, 1)
        ch = max(prog.chroma_height, 1)
        if self.use_pallas_mc:
            self._ensure_stack(prog)
            slot_map = {}
            for i, poc in enumerate(pocs[:MAX_REFS]):
                if poc not in self._slot_of and i < len(prog.ref_planes) \
                        and prog.ref_planes[i] and \
                        prog.ref_planes[i][0] is not None:
                    # ref decoded outside this decoder (seek): seed the ring
                    planes = [jnp.asarray(p.astype(np.int32))
                              for p in prog.ref_planes[i] if p is not None]
                    self._store_stack(poc, planes, prog)
                if poc in self._slot_of:
                    # LRU-touch: an active reference must not be evicted by
                    # the current picture's slot allocation
                    self._slot_lru.remove(poc)
                    self._slot_lru.append(poc)
                slot_map[i] = self._slot_of.get(poc,
                                                2 * MAX_REFS)  # gray
            return self._stack, slot_map
        slot_map = {}
        stack = [[], [], []]
        for i, poc in enumerate(pocs[:MAX_REFS]):
            if poc in self.dpb:
                planes = self.dpb[poc]
            elif (i < len(prog.ref_planes) and prog.ref_planes[i] and
                  prog.ref_planes[i][0] is not None):
                planes = [jnp.asarray(p.astype(np.int32))
                          for p in prog.ref_planes[i] if p is not None]
            else:
                planes = [jnp.full((H, W), 1 << (prog.bit_depth[0] - 1),
                                   jnp.int32)]
                if prog.chroma_width:
                    planes += [jnp.full((ch, cw),
                                        1 << (prog.bit_depth[c] - 1),
                                        jnp.int32) for c in (1, 2)]
            slot_map[i] = len(stack[0])
            for c in range(3):
                stack[c].append(planes[c] if c < len(planes)
                                else jnp.zeros((1, 1), jnp.int32))
        z = jnp.zeros((H, W), jnp.int32)
        zc = jnp.zeros((ch, cw), jnp.int32)
        while len(stack[0]) < MAX_REFS:
            stack[0].append(z)
            stack[1].append(zc)
            stack[2].append(zc)
        return [jnp.stack(s) for s in stack], slot_map

    def decode(self, prog: FrameProgramData):
        if self._exotic(prog):
            planes = pipeline.reconstruct(prog, self.run_deblock,
                                          self.run_sao, device_intra=False)
            out = tuple(jnp.asarray(np.asarray(p)) for p in planes)
            self._store(prog.poc, out, prog)
            return out

        self._note_rext(prog)
        H, W = prog.height, prog.width
        has_chroma = prog.chroma_width > 0
        sub_x = W // prog.chroma_width if has_chroma else 1
        sub_y = H // prog.chroma_height if has_chroma else 1
        bd = prog.bit_depth[0]
        bdc = prog.bit_depth[1] if has_chroma else bd

        refs, slot_map = self._refs(prog)

        slot_row = None
        if self.use_pallas_mc:
            # fused DPB store: allocate this picture's ring slot now; the
            # program writes the slot via the shipped per-plane row offsets
            slot = self._alloc_slot(prog.poc)
            dims = self._stack_dims
            slot_row = np.array([slot * dims[c][0] for c in range(3)],
                                np.int32)

        pack = None
        if self.use_pallas_mc and not self._no_native_pack and \
                not self._has_ccp and \
                getattr(prog, "src", None) is not None:
            # (CCP streams use the numpy packer: it ships the per-bin
            # partner-row/scale feed fields the native packer doesn't)
            pack = self._pack_native(prog, slot_map, slot_row)
        if pack is None:
            pack = self._pack_numpy(prog, slot_map, slot_row)
        layout, buf, lgs, n_slices = pack

        # --- scaling-factor tables (8 KiB; PPS may switch lists per frame) ---
        scaling = prog.scaling_factors is not None
        sft = None
        if scaling:
            sft = tuple(
                jnp.asarray(prog.scaling_factors[lg].astype(np.int32))
                if lg in prog.scaling_factors else jnp.zeros(
                    (6, 1 << lg, 1 << lg), jnp.int32) for lg in (2, 3, 4, 5))

        srec = prog.slice_records
        multi = (len(srec) > 1 and not np.all(srec[:, 9])) or \
            not prog.across_tiles
        # sticky statics: once a frame needs L1 / inter / a filter, every
        # later frame keeps that trace variant (per-slice dynamic gates make
        # the extra work a no-op) so the stream stays on one program
        self._has_inter = self._has_inter or len(prog.pus) > 0
        self._multi = self._multi or bool(multi)
        st = tuple(sorted({
            "H": H, "W": W, "sub_x": sub_x, "sub_y": sub_y,
            "cw": max(prog.chroma_width, 1), "ch": max(prog.chroma_height, 1),
            "bd": bd, "bdc": bdc, "mono": not has_chroma,
            "ctb_size": prog.ctb_size,
            "n_slices": n_slices,
            "use_l1": self._use_l1,
            "has_inter": self._has_inter,
            "scaling": scaling,
            "lgs": tuple(lgs),
            "pcm_lf_disable": bool(prog.pcm_loop_filter_disable),
            "across_tiles": bool(prog.across_tiles),
            "multi_boundary": self._multi,
            "run_deblock": bool(self.run_deblock),
            "run_sao": bool(self.run_sao),
            "pallas_mc": bool(self.use_pallas_mc),
            "segk": self.caps["segk"] or 1,
            "steps_cap": self.caps["steps"] or 1,
            "intra_bins": () if "intra" in self._skip
            else tuple(sorted(self._intra_lgs)),
            "run_mc": "mc" not in self._skip,
            "run_residual": "residual" not in self._skip,
            "fuse_store": bool(self.use_pallas_mc),
            "has_ccp": self._has_ccp,
            "has_rdpcm": self._has_rdpcm,
            # tile-aligned window-DMA border gather / block scatter
            # (ops/intra_window_pallas) — default-on with the fused path;
            # TDE_PALLAS_INTRA=0 falls back to the XLA gather/scatter
            "pallas_intra": bool(self.use_pallas_mc) and
            os.environ.get("TDE_PALLAS_INTRA", "1") != "0",
            "pallas_coef": bool(self.use_pallas_mc) and
            not self._no_pallas_coef,
            # transpose-free single-sweep deblock passes (ops/deblock_pallas)
            # — default-on with the fused path; TDE_PALLAS_DEBLOCK=0 falls
            # back to the XLA chain
            "pallas_deblock": bool(self.use_pallas_mc) and
            os.environ.get("TDE_PALLAS_DEBLOCK", "1") != "0",
            # halfword g4 grid + device-painted pu_idx (wire cut)
            "g4_half": bool(self.use_pallas_mc),
            "ccaps": tuple(max(self.caps.get(f"cc{lg}", 1), 1)
                           for lg in (2, 3, 4, 5)),
            "pallas_interp": jax.default_backend() not in ("tpu", "axon"),
        }.items()))

        dbuf = self._sparse_upload(buf)
        if self.use_pallas_mc:
            out_all = _compiled_store(refs[0], refs[1], refs[2],
                                      dbuf, sft, st, layout)
            n_pl = 3 if has_chroma else 1
            out = tuple(out_all[:n_pl])
            self._stack = list(out_all[n_pl:])
            return out
        out = _compiled(refs[0], refs[1], refs[2], dbuf, sft, st,
                        layout)
        self._store(prog.poc, out, prog)
        return out

    def _sparse_upload(self, buf):
        """Upload only the nonzero 8 KB blocks of the packed feed (plus a
        block index vector) and reassemble on device — watermark padding
        then costs nothing on the ~50 MB/s tunnel."""
        B = _SPARSE_BLOCK
        total = int(buf.size)
        nb = (total + B - 1) // B
        self._cb_scratch_slot = None
        cbix = self._compact_native(buf, total, nb, B)
        if cbix is None:
            padded = buf if total == nb * B else \
                np.pad(buf, (0, nb * B - total))
            blocks = padded.reshape(nb, B)
            nz = np.flatnonzero(blocks.any(axis=1))
            # bucketed to 256-block (0.5 MB) steps: few expander shapes per
            # stream, <= ~6% wire overhead from rounding
            M = max(256, -(-len(nz) // 256) * 256)
            if M < nb:
                cb = np.zeros((M, B), np.int32)
                cb[:len(nz)] = blocks[nz]
                ix = np.full(M, 1 << 30, np.int32)
                ix[:len(nz)] = nz
                cbix = cb, ix, M
        if cbix is None or cbix[2] >= nb:
            # dense frame: the plain upload is no worse
            self.last_wire_bytes = total * 4
            return jnp.asarray(buf)
        cb, ix, M = cbix
        dcb = jnp.asarray(cb)
        if getattr(self, "_cb_scratch_slot", None) is not None:
            # the compact buffer lives in a reused scratch slot: hold the
            # device array so the slot's NEXT reuse can block on this
            # transfer (jnp.asarray makes no guarantee the host memory was
            # consumed at return)
            self._cb_scratch_pending[self._cb_scratch_slot] = dcb
        if jax.default_backend() in ("tpu", "axon"):
            # inverse map: output block -> compact row (-1 = zero block);
            # this path ships inv (nb entries), not ix (M entries)
            self.last_wire_bytes = (M * B + nb) * 4
            inv = np.full(nb, -1, np.int32)
            valid = ix < nb
            inv[ix[valid]] = np.flatnonzero(valid)
            return _expand_blocks_pallas(dcb, jnp.asarray(inv),
                                         total=total, B=B)
        self.last_wire_bytes = (M * B + M) * 4
        return _expand_blocks(dcb, jnp.asarray(ix), total=total, B=B)

    def _compact_native(self, buf, total, nb, B):
        """Nonzero-block scan + copy in C (one ~0.5 ms pass at 1080p vs a
        ~15 ms numpy reduction); returns (blocks[:M], idx[:M], M) or None
        to fall back to the numpy path."""
        if self._no_native_pack or not buf.flags.c_contiguous:
            return None
        try:
            from . import _native
            L = _native.lib()
        except Exception:
            return None
        import ctypes as ct
        # two scratch pairs, flipped per frame; before reusing a slot, block
        # on the device upload previously built from it so a pipeline deeper
        # than two frames cannot overwrite host memory a pending transfer
        # still reads
        pool = getattr(self, "_cb_scratch", None)
        if pool is None:
            pool = [None, None, 0]
            self._cb_scratch = pool
            self._cb_scratch_pending = [None, None]
        pool[2] ^= 1
        pending = self._cb_scratch_pending[pool[2]]
        if pending is not None:
            pending.block_until_ready()
            self._cb_scratch_pending[pool[2]] = None
        scratch = pool[pool[2]]
        if scratch is None or scratch[0].shape[0] < nb:
            scratch = (np.empty((nb, B), np.int32), np.empty(nb, np.int32))
            pool[pool[2]] = scratch
        cb, ix = scratch
        M = L.tde265_compact_blocks(
            buf.ctypes.data_as(ct.c_void_p), total, B, 256,
            cb.ctypes.data_as(ct.c_void_p), ix.ctypes.data_as(ct.c_void_p),
            cb.shape[0])
        if M < 0:
            return None
        self._cb_scratch_slot = pool[2]
        return cb[:M], ix[:M], int(M)

    def _pack_numpy(self, prog: FrameProgramData, slot_map, slot_row):
        """Numpy feed packer: returns (layout, buf, lgs, n_slices)."""
        H, W = prog.height, prog.width
        has_chroma = prog.chroma_width > 0
        sub_x = W // prog.chroma_width if has_chroma else 1
        sub_y = H // prog.chroma_height if has_chroma else 1

        # --- PU SoA [Pcap, 5] (wire format, see mcp.pus_to_wire) ---
        pcap = self._grow("pu", max(len(prog.pus), 1))
        pu = np.zeros((pcap, 5), np.int32)
        if len(prog.pus):
            pw = mcp.pus_to_wire(prog.pus, slot_map)
            pu[:pw.shape[0]] = pw

        # --- MC segments (Pallas path): PU x cell-band work units.  Only
        # the per-segment PU index crosses the wire; windows are re-derived
        # in-kernel from the PU SoA ---
        seg_host = {}
        if self.use_pallas_mc:
            n_bands = (H + 3) // 4
            lists = (0, 1) if self._use_l1 or (
                len(prog.pus) and bool((prog.pus["pred_flags"] & 2).any())) \
                else (0,)
            for l in lists:
                if l == 1:
                    self._use_l1 = True
                counts, sidx, K = mcp.plan_segment_indices(prog.pus, l, H)
                kcap = self._grow("segk", max(K, 1))
                a = np.zeros((n_bands, (kcap + 1) // 2), np.int32)
                a[:, :sidx.shape[1]] = sidx
                seg_host[f"sg{l}i"] = a
                seg_host[f"sg{l}n"] = counts.astype(np.int32)

        # --- TU bins ---
        bins, tl, tr = _bin_tus(prog)
        host = {}
        lgs = []
        z0 = np.zeros(0, np.int32)
        for lg in (2, 3, 4, 5):
            if self.caps[f"tu{lg}"] == 0 and lg not in bins:
                continue
            b = bins.get(lg)
            tcap = self._grow(f"tu{lg}", b["n"] if b else 1)
            ccap = self._grow(f"co{lg}", len(b["cv"]) if b else 1)
            self._grow(f"cc{lg}",
                       int(np.diff(b["coff"]).max(initial=1)) if b else 1)
            lgs.append(lg)
            # TU meta, two per word: qp7 (signed) | flags6<<7 | mid3<<13
            tm16 = np.zeros(tcap + (tcap & 1), np.int32)
            if b:
                nb = len(b["qp"])
                tm16[:nb] = (b["qp"] & 0x7F) | ((b["flags"] & 0x3F) << 7) \
                    | ((b["mid"] & 7) << 13)
            host[f"bin{lg}.tm"] = tm16[0::2] | (tm16[1::2] << 16)
            host[f"bin{lg}.cv"] = _pad_rows(b["cv"] if b else z0, ccap)
            coff = b["coff"] if b else np.zeros(1, np.int32)
            host[f"bin{lg}.coff"] = _pad_rows(coff, tcap + 1,
                                              fill=int(coff[-1]))
            fcap = self._grow(f"cf{lg}", len(b["cfx"]) if b else 0)
            if fcap:
                host[f"bin{lg}.cfx"] = _pad_rows(
                    b["cfx"] if b else z0, fcap, fill=-1)
                host[f"bin{lg}.cfv"] = _pad_rows(b["cfv"] if b else z0,
                                                 fcap)
            if self._has_ccp:
                host[f"bin{lg}.ccp_row"] = _pad_rows(
                    b["ccp_row"] if b else z0, tcap, fill=-1)
                host[f"bin{lg}.ccp_scale"] = _pad_rows(
                    b["ccp_scale"] if b else z0, tcap)
            for c, ch in ((0, "y"), (1, "cb"), (2, "cr")):
                sc = b[f"sc_{ch}"] if b else np.zeros((0, 3), np.int32)
                cap = self._grow(f"sc{lg}{ch}", len(sc))
                if self.use_pallas_mc:
                    if cap == 0:
                        continue
                    ORc = 4 if c == 0 else 4 // max(sub_y, 1)
                    band, srow, x0s = mcp.plan_residual_segments(
                        sc, 1 << lg, ORc)
                    n_bands = (H + 3) // 4
                    cnt, sw, K = mcp.pack_band_segments(
                        band, srow, x0s, n_bands)
                    kcap = self._grow(f"rk{lg}{ch}", K)
                    swp = np.zeros((n_bands, kcap), np.int32)
                    swp[:, :sw.shape[1]] = sw
                    host[f"rs{lg}{ch}.n"] = cnt
                    host[f"rs{lg}{ch}.sw"] = swp
                else:
                    host[f"bin{lg}.sc_{ch}"] = _pad_rows(sc, cap, fill=-1)

        # --- intra super-waves ---
        # The scan depth is WATERMARKED, not per-frame: the axon runtime pays
        # a large executable-switch cost whenever consecutive frames hit
        # different compiled programs, so the whole stream must decode
        # through ONE program.  A P frame replays with a dynamic trip count
        # (max plane depth this frame), and the feed is the flat per-block
        # record array — the [scap, K, ...] scan layout is built on device.
        if prog.ip is not None:
            irec, n_steps, nsteps_pc = _intra_records_native(prog)
        elif len(prog.intras):
            irec, n_steps, nsteps_pc = _plan_intra(prog, tl, tr)
        else:
            irec = np.zeros((0, IREC_COLS), np.int32)
            n_steps, nsteps_pc = 0, np.zeros(3, np.int32)
        self.caps["steps"] = max(self.caps["steps"],
                                 _pow2(n_steps) if n_steps else 0)
        if len(prog.intras):
            for c, lg in set(zip(prog.intras["cidx"].tolist(),
                                 prog.intras["log2_size"].tolist())):
                self._intra_lgs.add((_PLANE_CLASS[int(c)], int(lg)))
        host["nsteps"] = nsteps_pc
        ncap = self._grow("nintra", max(len(irec), 1))
        irecp = np.zeros((8, ncap), np.int32)
        if len(irec):
            irecp[:, :len(irec)] = _pack_irec(irec)
        host["irecp"] = irecp

        # intra residuals reference bin_res[lg]: make sure those bins exist
        for (pcls, lg) in self._intra_lgs:
            if lg not in lgs:
                tcap = self._grow(f"tu{lg}", 1)
                ccap = self._grow(f"co{lg}", 1)
                lgs.append(lg)
                host[f"bin{lg}.qp"] = _pad_rows(z0, tcap)
                host[f"bin{lg}.flags"] = _pad_rows(z0, tcap)
                host[f"bin{lg}.mid"] = _pad_rows(z0, tcap)
                host[f"bin{lg}.cv"] = _pad_rows(z0, ccap)
                host[f"bin{lg}.coff"] = np.zeros(tcap + 1, np.int32)
                if self._has_ccp:
                    host[f"bin{lg}.ccp_row"] = _pad_rows(z0, tcap, fill=-1)
                    host[f"bin{lg}.ccp_scale"] = _pad_rows(z0, tcap)
                for c, ch in ((0, "y"), (1, "cb"), (2, "cr")):
                    cap = self._grow(f"sc{lg}{ch}", 0) or 0
                    if self.use_pallas_mc:
                        if cap:
                            n_bands = (H + 3) // 4
                            kcap = self.caps.get(f"rk{lg}{ch}", 1) or 1
                            host[f"rs{lg}{ch}.n"] = np.zeros(n_bands,
                                                             np.int32)
                            host[f"rs{lg}{ch}.sw"] = np.zeros(
                                (n_bands, kcap), np.int32)
                    else:
                        host[f"bin{lg}.sc_{ch}"] = _pad_rows(
                            np.zeros((0, 3), np.int32), cap, fill=-1)
        lgs = sorted(lgs)

        # --- PCM ---
        pcm = _pack_pcm(prog, sub_x, sub_y)
        for c in range(3):
            cap = self._grow(f"pcm{c}", len(pcm[c]))
            host[f"pcm{c}"] = _pad_rows(pcm[c], cap, fill=1 << 30) if cap \
                else np.zeros((0, 2), np.int32)

        # --- grids + slice data ---
        n_slices = self._grow("slices", max(len(prog.slice_records), 1))
        recs = np.zeros((n_slices, 208), np.int32)
        recs[:len(prog.slice_records)] = prog.slice_records
        host["slice_recs"] = recs
        host["pu"] = pu
        if self.use_pallas_mc:
            # PU slot fields hold DPB-ring positions: index POCs by slot
            pocs_by_slot = np.full(2 * MAX_REFS + 1, NOREF, np.int32)
            for i, poc in enumerate(prog.ref_pocs[:MAX_REFS]):
                pocs_by_slot[slot_map.get(i, 2 * MAX_REFS)] = poc
            host["ref_pocs"] = pocs_by_slot
        else:
            host["ref_pocs"] = np.array(
                [prog.ref_pocs[i] if i < len(prog.ref_pocs) else NOREF
                 for i in range(MAX_REFS)], np.int32)
        host["mc_on"] = np.array([1 if len(prog.pus) else 0], np.int32)
        if self.use_pallas_mc:
            # halfword grid, two horizontally adjacent cells per word:
            # qp(8) | nzc(1) | dbf(4) | cu(3); pu_idx is painted on device
            # from the segment index feed (mcp.paint_pu_idx)
            g16 = (prog.qp_y.astype(np.int32) & 0xFF) | \
                ((prog.nonzero_coeff.astype(np.int32) & 1) << 8) | \
                ((prog.deblock_flags.astype(np.int32) & 0xF) << 9) | \
                ((prog.cu_info.astype(np.int32) & 0x7) << 13)
            pbh, pbw = g16.shape
            if pbw & 1:
                g16 = np.pad(g16, ((0, 0), (0, 1)))
            host["g4"] = g16[:, 0::2] | (g16[:, 1::2] << 16)
        else:
            # per-4x4 grids in one word: qp(8) | nzc(1) | dbf(4) | cu(4) |
            # pu_idx+1 (15, 0 = uncovered) — pu_idx spills to its own field
            # only when the PU count exceeds 15 bits
            g = (prog.qp_y.astype(np.int32) & 0xFF) | \
                ((prog.nonzero_coeff.astype(np.int32) & 1) << 8) | \
                ((prog.deblock_flags.astype(np.int32) & 0xF) << 9) | \
                ((prog.cu_info.astype(np.int32) & 0xF) << 13)
            if self.caps["pu"] < (1 << 15) - 1:
                host["g4"] = g | ((prog.pu_idx.astype(np.int32) + 1) << 17)
            else:
                host["g4"] = g
                host["pu_idx"] = prog.pu_idx.astype(np.int32)
        host["slice_idx"] = prog.slice_idx.astype(np.int32)
        host["slice_addr"] = prog.slice_addr.astype(np.int32)
        host["tile_id"] = prog.tile_id.astype(np.int32)
        sh = (prog.ctb_h, prog.ctb_w)
        if prog.sao is not None and len(prog.sao):
            host["sao_t"] = prog.sao["type_idx"].astype(np.int32).reshape(
                *sh, 3)
            host["sao_eo"] = prog.sao["eo_class"].astype(np.int32).reshape(
                *sh, 3)
            host["sao_band"] = prog.sao["band_pos"].astype(np.int32).reshape(
                *sh, 3)
            host["sao_off"] = prog.sao["offset"].astype(np.int32).reshape(
                *sh, 3, 4)
        else:
            host["sao_t"] = np.zeros((*sh, 3), np.int32)
            host["sao_eo"] = np.zeros((*sh, 3), np.int32)
            host["sao_band"] = np.zeros((*sh, 3), np.int32)
            host["sao_off"] = np.zeros((*sh, 3, 4), np.int32)

        # --- fused DPB store row offsets (slot allocated by decode()) ---
        if self.use_pallas_mc:
            host["slot_row"] = slot_row

        self._use_l1 = self._use_l1 or (
            bool((prog.pus["pred_flags"] & 2).any()) if len(prog.pus)
            else False)

        # --- pack: ONE host->device upload per frame ---
        host.update(seg_host)
        layout = []
        total = 0
        for k in sorted(host):
            a = host[k]
            layout.append((k, total, tuple(a.shape)))
            total += a.size
        buf = np.empty(max(total, 1), np.int32)
        for (k, off, shp) in layout:
            a = host[k]
            buf[off:off + a.size] = a.ravel()
        return tuple(layout), buf, lgs, n_slices

    # -- native C++ feed packer (feedpack.cc) --

    def _native_caps(self, prog):
        """Per-frame size requirements from tde265_pack_caps, or None."""
        import ctypes as ct
        src = getattr(prog, "src", None)
        if src is None:
            return None
        dec, idx = src
        if getattr(dec, "_ctx", None) is None:
            return None
        caps = np.zeros(64, np.int32)
        try:
            rc = dec._lib.tde265_pack_caps(
                dec._ctx, idx, caps.ctypes.data_as(ct.c_void_p))
        except AttributeError:
            return None
        return caps if rc == 0 else None

    def _plan_from_caps(self, prog, caps):
        """plan_stream growth from the native caps record (mirrors the
        numpy plan_stream body exactly)."""
        for lg in (2, 3, 4, 5):
            i = lg - 2
            n_tu = int(caps[i])
            if n_tu == 0:
                continue
            self._grow(f"tu{lg}", n_tu)
            self._grow(f"co{lg}", int(caps[4 + i]))
            self._grow(f"cc{lg}", max(int(caps[45 + i]), 1))
            self._grow(f"cf{lg}", int(caps[49 + i]))
            for c, ch in ((0, "y"), (1, "cb"), (2, "cr")):
                scn = int(caps[8 + i * 3 + c])
                self._grow(f"sc{lg}{ch}", scn)
                if self.use_pallas_mc and scn:
                    self._grow(f"rk{lg}{ch}", int(caps[20 + i * 3 + c]))
        self._grow("pu", len(prog.pus))
        self._grow("slices", len(prog.slice_records))
        self._use_l1 = self._use_l1 or bool(caps[42])
        self._has_inter = self._has_inter or bool(caps[43])
        self._multi = self._multi or bool(
            (len(prog.slice_records) > 1 and
             not np.all(prog.slice_records[:, 9])) or
            not prog.across_tiles)
        if int(caps[34]):
            u = np.unique(prog.intras["cidx"].astype(np.int32) * 8 +
                          prog.intras["log2_size"].astype(np.int32))
            for v in u.tolist():
                self._intra_lgs.add((_PLANE_CLASS[int(v) >> 3], int(v) & 7))
        self._grow("steps", int(caps[35]))
        self._grow("nintra", int(caps[34]))
        for c in range(3):
            self._grow(f"pcm{c}", int(caps[39 + c]))
        if self.use_pallas_mc and len(prog.pus):
            for l in (0, 1):
                self._grow("segk", int(caps[32 + l]))

    def _pack_native(self, prog: FrameProgramData, slot_map, slot_row):
        """Native feed packer: byte-identical to _pack_numpy, built in C++.

        Returns (layout, buf, lgs, n_slices) or None to fall back."""
        import ctypes as ct
        caps = self._native_caps(prog)
        if caps is None:
            return None
        H = prog.height
        n_bands = (H + 3) // 4

        # watermark growth (mirrors the numpy pack path)
        for lg in (2, 3, 4, 5):
            i = lg - 2
            n_tu, n_co = int(caps[i]), int(caps[4 + i])
            if n_tu or self.caps[f"tu{lg}"]:
                self._grow(f"tu{lg}", max(n_tu, 1))
                self._grow(f"co{lg}", max(n_co, 1))
                self._grow(f"cc{lg}", max(int(caps[45 + i]), 1))
                self._grow(f"cf{lg}", int(caps[49 + i]))
            for c, ch in ((0, "y"), (1, "cb"), (2, "cr")):
                cap = self._grow(f"sc{lg}{ch}", int(caps[8 + i * 3 + c]))
                if cap:
                    self._grow(f"rk{lg}{ch}", int(caps[20 + i * 3 + c]))
        self._grow("pu", max(len(prog.pus), 1))
        self._use_l1 = self._use_l1 or bool(caps[42])
        lists = (0, 1) if self._use_l1 else (0,)
        for l in lists:
            self._grow("segk", max(int(caps[32 + l]), 1))
        n_steps = int(caps[35])
        self.caps["steps"] = max(self.caps["steps"],
                                 _pow2(n_steps) if n_steps else 0)
        self._grow("nintra", max(int(caps[34]), 1))
        for c in range(3):
            self._grow(f"pcm{c}", int(caps[39 + c]))
        n_slices = self._grow("slices", max(int(caps[44]), 1))
        if int(caps[34]):
            u = np.unique(prog.intras["cidx"].astype(np.int32) * 8 +
                          prog.intras["log2_size"].astype(np.int32))
            for v in u.tolist():
                self._intra_lgs.add((_PLANE_CLASS[int(v) >> 3], int(v) & 7))
        for (pcls, lg) in self._intra_lgs:
            if self.caps[f"tu{lg}"] == 0:
                self._grow(f"tu{lg}", 1)
                self._grow(f"co{lg}", 1)
        lgs = [lg for lg in (2, 3, 4, 5) if self.caps[f"tu{lg}"] > 0]

        # key -> (native key id, p0, p1, shape); MUST yield exactly the
        # key set and shapes the numpy packer produces.  The table only
        # changes when a watermark grows: cache it on a caps signature
        # (rebuilding it cost ~12 ms/frame at 1080p).
        sig = (tuple(sorted(self.caps.items())), tuple(lists),
               tuple(prog.pu_idx.shape), (prog.ctb_h, prog.ctb_w),
               n_bands, n_slices, tuple(sorted(self._intra_lgs)),
               self._has_ccp)
        cached = getattr(self, "_layout_cache", None)
        if cached is not None and cached[0] == sig:
            layout, earr, n_ent, total = cached[1]
            buf = np.empty(max(total, 1), np.int32)
            aux = np.zeros(25, np.int32)
            for k, v in slot_map.items():
                aux[k + 1] = v
            for i in range(MAX_REFS):
                aux[17 + i] = slot_map.get(i, 0)
            return self._pack_native_fill(prog, layout, earr, n_ent, aux,
                                          buf, total, lgs, n_slices,
                                          slot_map, slot_row)
        shapes = {}
        ids = {}

        def ent(key, kid, p0, p1, shape):
            shapes[key] = shape
            ids[key] = (kid, p0, p1)

        for lg in lgs:
            tcap, ccap = self.caps[f"tu{lg}"], self.caps[f"co{lg}"]
            # TU meta, two per word: qp7 (signed) | flags6<<7 | mid3<<13
            ent(f"bin{lg}.tm", 0, lg, 0, ((tcap + 1) // 2,))
            ent(f"bin{lg}.cv", 3, lg, 0, (ccap,))
            ent(f"bin{lg}.coff", 4, lg, 0, (tcap + 1,))
            if self.caps[f"cf{lg}"]:
                fcap = self.caps[f"cf{lg}"]
                ent(f"bin{lg}.cfx", 5, lg, 0, (fcap,))
                ent(f"bin{lg}.cfv", 8, lg, 0, (fcap,))
            for c, ch in ((0, "y"), (1, "cb"), (2, "cr")):
                if self.caps[f"sc{lg}{ch}"]:
                    kcap = self.caps.get(f"rk{lg}{ch}", 1) or 1
                    ent(f"rs{lg}{ch}.n", 6, lg, c, (n_bands,))
                    ent(f"rs{lg}{ch}.sw", 7, lg, c, (n_bands, kcap))
        segk = self.caps["segk"] or 1
        for l in lists:
            ent(f"sg{l}n", 9, l, 0, (n_bands,))
            # two 16-bit PU indices per word; windows re-derived in-kernel
            ent(f"sg{l}i", 12, l, 0, (n_bands, (segk + 1) // 2))
        ent("irecp", 17, 0, 0, (8, self.caps["nintra"]))
        ent("nsteps", 18, 0, 0, (3,))
        for c in range(3):
            cap = self.caps[f"pcm{c}"]
            ent(f"pcm{c}", 19, c, 0, (cap, 2) if cap else (0, 2))
        ent("slice_recs", 20, 0, 0, (n_slices, 208))
        ent("pu", 21, 0, 0, (self.caps["pu"], 5))
        pb = tuple(prog.pu_idx.shape)
        # p1=2: halfword pairs (qp8|nzc1|dbf4|cu3), pu_idx painted on device
        ent("g4", 23, 0, 2, (pb[0], (pb[1] + 1) // 2))
        sh = (prog.ctb_h, prog.ctb_w)
        ent("slice_idx", 27, 0, 0, sh)
        ent("slice_addr", 28, 0, 0, sh)
        ent("tile_id", 30, 0, 0, sh)
        ent("sao_t", 31, 0, 0, (*sh, 3))
        ent("sao_eo", 32, 0, 0, (*sh, 3))
        ent("sao_band", 33, 0, 0, (*sh, 3))
        ent("sao_off", 34, 0, 0, (*sh, 3, 4))
        # python-filled trivials
        shapes["ref_pocs"] = (2 * MAX_REFS + 1,)
        shapes["mc_on"] = (1,)
        shapes["slot_row"] = (3,)

        layout = []
        total = 0
        earr = np.zeros((len(ids), 8), np.int32)
        n_ent = 0
        for k in sorted(shapes):
            shp = shapes[k]
            layout.append((k, total, tuple(shp)))
            size = 1
            for d in shp:
                size *= int(d)
            if k in ids:
                kid, p0, p1 = ids[k]
                row = earr[n_ent]
                row[0], row[1], row[2], row[3] = kid, p0, p1, total
                for j, d in enumerate(shp[:4]):
                    row[4 + j] = d
                n_ent += 1
            total += size
        layout = tuple(layout)
        self._layout_cache = (sig, (layout, earr, n_ent, total))
        buf = np.empty(max(total, 1), np.int32)
        aux = np.zeros(25, np.int32)
        for k, v in slot_map.items():
            aux[k + 1] = v
        for i in range(MAX_REFS):
            aux[17 + i] = slot_map.get(i, 0)
        return self._pack_native_fill(prog, layout, earr, n_ent, aux, buf,
                                      total, lgs, n_slices, slot_map,
                                      slot_row)

    def _pack_native_fill(self, prog, layout, earr, n_ent, aux, buf, total,
                          lgs, n_slices, slot_map, slot_row):
        import ctypes as ct
        dec, idx = prog.src
        rc = dec._lib.tde265_pack_feed(
            dec._ctx, idx, earr.ctypes.data_as(ct.c_void_p), n_ent,
            aux.ctypes.data_as(ct.c_void_p),
            buf.ctypes.data_as(ct.c_void_p), total)
        if rc != 0:
            return None
        for (k, off, shp) in layout:
            if k == "ref_pocs":
                pocs = np.full(2 * MAX_REFS + 1, NOREF, np.int32)
                for i, poc in enumerate(prog.ref_pocs[:MAX_REFS]):
                    pocs[slot_map.get(i, 2 * MAX_REFS)] = poc
                buf[off:off + pocs.size] = pocs
            elif k == "mc_on":
                buf[off] = 1 if len(prog.pus) else 0
            elif k == "slot_row":
                buf[off:off + 3] = slot_row
        return layout, buf, lgs, n_slices

    def _store(self, poc, planes, prog=None):
        if self.use_pallas_mc and prog is not None:
            self._store_stack(poc, planes, prog)
            return
        self.dpb[poc] = planes
        self._order.append(poc)
        while len(self._order) > 2 * MAX_REFS:
            old = self._order.pop(0)
            if old in self.dpb and old not in self._order:
                del self.dpb[old]
