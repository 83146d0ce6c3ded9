"""Pallas TPU motion-compensation kernel: per-segment DMA windows + fused
separable interpolation.

XLA's generic gather lowers catastrophically on TPU for the per-cell MC
window fetch (measured ~70KB of HBM traffic per gathered element on the
fused-decode path), so this kernel reformulates inter prediction the way the
hardware wants it:

  * A *segment* is the intersection of one inter PU with one 4-luma-row cell
    band: all samples in a segment share one motion vector, one reference
    slot and one filter phase, so the reference window of a whole segment is
    a single contiguous rectangle (<= [11, 71] for luma).
  * Reference pictures live in HBM as one replicate-padded stack
    [R * Hpad, Wpad]; each segment issues ONE aligned async copy (rounded
    down to the (8, 128) tile grid) and the sub-tile offset is fixed up in
    VMEM with static roll ladders.
  * The 8-tap qpel / 4-tap epel separable filters run on [FH, 256] VMEM
    tiles as static shifted multiply-adds (the filter-always formulation:
    the phase-0 filter row [.., 64, ..] makes the copy path bit-exact, so
    there is no branch between copy/h/v/hv).
  * The grid walks cell bands; each program double-buffers segment DMAs and
    read-modify-writes its [OR, Wpad] output stripe (segments of one band
    never overlap, bands never share a stripe: no write races).

Outputs are at the spec's intermediate scale (<< (14 - bd)); the weighted /
bi-prediction merge stays in XLA where it fuses into the rest of the frame
program.  Bit-exact counterpart of ops/mc.py (spec 8.5.4.2.2/8.5.4.2.3) and
of the scalar oracle native/src/recon.cc:309-420.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mc import EPEL_FILTERS, QPEL_FILTERS

# replicate padding of each reference plane inside the HBM stack.
# left pad: a window origin is clamped to >= -(w + taps - 2) >= -70 (w<=64,
# taps<=8); 128 also keeps unpadded x -> padded x+128 lane-aligned.
PADL = 128
PADR = 256          # window reach right of the last column: <= 255 lanes
PADT = 16           # origin clamp >= -(OR + taps - 2) >= -10
FW = 256            # fetched lanes per segment DMA
_SEG_FIELDS = 7     # nseg-indexed scalar fields per segment


def pad_sizes(h: int, w: int):
    """Padded plane size for the HBM reference stack."""
    hp = h + PADT + 48          # bottom: origin<=h-1, +FH rows, align slack
    hp = (hp + 7) & ~7
    wp = (w + PADL + PADR + 127) & ~127
    return hp, wp


@functools.partial(jax.jit, static_argnames=("hp", "wp"))
def pad_plane(plane, hp: int, wp: int):
    """Edge-replicate a decoded plane into its padded DPB layout."""
    h, w = plane.shape
    return jnp.pad(plane, ((PADT, hp - h - PADT), (PADL, wp - w - PADL)),
                   mode="edge")


def plan_segment_indices(pus: np.ndarray, list_idx: int, H: int):
    """Explode the PUs of one reference list into per-cell-band segments,
    shipping only the PU INDEX per segment (the window origin, filter phase
    and output placement are pure functions of (PU record, band) and are
    re-derived in-kernel from the scalar-prefetched PU SoA).

    Returns per-band counts [n_bands], sidx [n_bands, ceil(K/2)] with two
    16-bit PU indices per int32 word (band-major arrival order = PU
    emission order, so overlap resolution matches cell rasterization), and
    K (max segments per band; caller watermarks it).
    """
    n_bands = (H + 3) // 4
    sel = np.nonzero((pus["pred_flags"] & (1 << list_idx)) != 0)[0] \
        if len(pus) else np.zeros(0, np.int64)
    if not len(sel):
        return (np.zeros(n_bands, np.int32),
                np.zeros((n_bands, 1), np.int32), 1)

    p = pus[sel]
    y = p["y"].astype(np.int32)
    rows = p["h"].astype(np.int32) >> 2
    tot = int(rows.sum())
    pidx = np.repeat(sel.astype(np.int32), rows)
    within = np.arange(tot) - np.repeat(np.cumsum(rows) - rows, rows)
    band = np.repeat(y >> 2, rows) + within

    order = np.argsort(band, kind="stable")
    bs = band[order]
    first = np.searchsorted(bs, bs)
    k_of = np.arange(tot) - first
    K = int(k_of.max()) + 1 if tot else 1
    counts = np.zeros(n_bands, np.int32)
    np.add.at(counts, band, 1)

    sw = np.zeros((n_bands, (K + 1) // 2), np.int32)
    np.bitwise_or.at(sw, (bs, k_of >> 1),
                     pidx[order] << (16 * (k_of & 1)))
    return counts, sw, K


def pus_to_wire(pus: np.ndarray, slot_map=None):
    """The 5-word wire PU SoA (matches feedpack.cc kKeyPu): mv0 (x|y<<16),
    mv1, meta (pf | slot0<<2 | slot1<<8 | ridx0<<14 | ridx1<<18), slice,
    geo (x/4 | y/4<<11 | (w/4-1)<<22 | (h/4-1)<<27)."""
    n = len(pus)
    pu = np.zeros((max(n, 1), 5), np.int32)
    if not n:
        return pu
    p = pus
    pu[:n, 0] = (p["mv0x"].astype(np.int32) & 0xFFFF) | \
        (p["mv0y"].astype(np.int32) << 16)
    pu[:n, 1] = (p["mv1x"].astype(np.int32) & 0xFFFF) | \
        (p["mv1y"].astype(np.int32) << 16)
    meta = p["pred_flags"].astype(np.int32) & 3
    for l in (0, 1):
        raw = p[f"ref_dpb{l}"].astype(np.int32)
        if slot_map is not None:
            slot = np.array([slot_map.get(int(v), 0) for v in raw], np.int32)
        else:
            slot = np.maximum(raw, 0)
        meta |= (slot & 63) << (2 + 6 * l)
        meta |= (np.maximum(p[f"ref_idx{l}"].astype(np.int32), 0)
                 & 15) << (14 + 4 * l)
    pu[:n, 2] = meta
    pu[:n, 3] = p["slice"]
    pu[:n, 4] = (p["x"].astype(np.int32) >> 2) | \
        ((p["y"].astype(np.int32) >> 2) << 11) | \
        (((p["w"].astype(np.int32) >> 2) - 1) << 22) | \
        (((p["h"].astype(np.int32) >> 2) - 1) << 27)
    return pu


def _pad8(col):
    """Pad a [Pcap] column to a multiple of 8 entries (fold granularity)."""
    n = col.shape[0]
    return jnp.pad(col, (0, (-n) % 8)) if n % 8 else col


def pack_pu_mc(pu, l: int):
    """Per-list kernel view of the wire PU SoA [Pcap, 5] -> [8, Pcap'/4]
    int32: PU idx's (mv, meta2) pair at rows (idx&3)*2 / (idx&3)*2+1, col
    idx>>2, with meta2 = slot(6) | x4(11)<<6 | (w4-1)(5)<<17.

    Runs on device (cheap XLA ops, the wire is unchanged).  The 8-sublane
    fold exists because Mosaic pads SMEM operands to (8, 128) granularity:
    a [Pcap, 5] table lane-pads 5 -> 128 (25x, 8 MB at 1080p — over the
    1 MB SMEM budget) and [5, Pcap] still sublane-pads 5 -> 8; this layout
    is exact at 8 bytes/PU, so a 64k-PU 4K frame costs 512 KB."""
    mv = _pad8(pu[:, l])
    meta = _pad8(pu[:, 2])
    geo = _pad8(pu[:, 4])
    slot = (meta >> (2 + 6 * l)) & 63
    m2 = slot | ((geo & 0x7FF) << 6) | (((geo >> 22) & 0x1F) << 17)
    x = jnp.stack([mv, m2])                       # [2, P]
    return x.reshape(2, -1, 4).transpose(2, 0, 1).reshape(8, -1)


def pack_pu_geo(pu):
    """Geometry-only kernel view for the pu_idx paint: [Pcap, 5] ->
    [8, Pcap'/8] int32 with g16 = x4(11) | (w4-1)(5)<<11 at
    [idx & 7, idx >> 3] (geometry is list-independent)."""
    geo = _pad8(pu[:, 4])
    g16 = (geo & 0x7FF) | (((geo >> 22) & 0x1F) << 11)
    return g16.reshape(-1, 8).T


def _scalar_coef(frac, table, k):
    """Select filter tap k by the traced fraction via a where-chain."""
    c = table[0][k]
    for f in range(1, len(table)):
        c = jnp.where(frac == f, table[f][k], c)
    return c


def _roll_ladder(win, rem, nbits, axis, size):
    """Shift `win` up by the traced remainder via static power-of-2 rolls."""
    for b in range(nbits):
        sh = 1 << b
        rolled = pltpu.roll(win, shift=size - sh, axis=axis)
        win = jnp.where((rem & sh) != 0, rolled, win)
    return win


def _mc_kernel(nseg, pu, sidx, refs, out, scratch, sem,
               *, OR, T, FH, Hpad, Wout, bd, KMAX, table, G,
               chroma, Hdim, Wdim, sub_x, sub_y):
    # nseg and the 5-word PU SoA are scalar-prefetched (SMEM-resident); the
    # per-band segment PU indices arrive as SMEM blocks (1, ceil(KMAX/2))
    # with two 16-bit indices per word.  Everything else about a segment —
    # window origin, filter phase, output placement — is a pure function of
    # (PU record, band, plane class) and is re-derived here with a handful
    # of scalar ops, so the wire carries 2 bytes per segment instead of 8.
    #
    # Segments are processed G at a time: the per-group filter math runs as
    # a handful of [G*FH, FW] vector ops (the per-segment phase/alignment
    # variation rides in broadcast [G,1,1] vectors + where-selected static
    # rolls), so the serial per-segment cost collapses to one small
    # RMW-merge.  Row rolls on the flattened [G*FH, FW] array wrap a few
    # rows across segment boundaries; those rows are beyond the T-1+OR+7
    # rows the filters read, so the contamination is never consumed.
    band = pl.program_id(0)
    out[0] = jnp.zeros((OR, Wout), jnp.int32)
    n = nseg[band]
    ngroups = (n + G - 1) // G
    shift1 = bd - 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (OR, FW), 1)

    def seg_k(j, i):
        return jnp.minimum(j * G + i, KMAX - 1)

    def seg_params(k):
        """(row, col, fy, fx, xs, w) re-derived from the PU record.
        Mirrors the host planning that plan_segments used to do (clamped
        window origins in padded coords; spec 8.5.4.2.2/8.5.4.2.3)."""
        word = sidx[0, 0, k >> 1]
        idx = (word >> ((k & 1) * 16)) & 0xFFFF
        # per-list packed table [8, Pcap/4] (pack_pu_mc): PU idx's (mv,
        # meta2) pair lives at rows (idx&3)*2 / (idx&3)*2+1, col idx>>2 —
        # the 8-sublane fold keeps Mosaic's SMEM padding exact (a [Pcap,
        # 5] layout lane-pads 5 -> 128 and blows the 1 MB SMEM budget at
        # 1080p; [5, Pcap] still sublane-pads 5 -> 8)
        col = idx >> 2
        r2 = (idx & 3) * 2
        mvw = pu[r2, col]
        m2 = pu[r2 + 1, col]
        mvx = (mvw << 16) >> 16
        mvy = mvw >> 16
        slot = m2 & 63
        x = ((m2 >> 6) & 0x7FF) * 4
        w = (((m2 >> 17) & 0x1F) + 1) * 4
        if not chroma:
            oy = jnp.clip(4 * band + (mvy >> 2) - 3,
                          -(4 + T - 2), Hdim - 1) + PADT
            ox = jnp.clip(x + (mvx >> 2) - 3,
                          -(w + T - 2), Wdim - 1) + PADL
            fy = mvy & 3
            fx = mvx & 3
            xs, ws = x, w
        else:
            shx = 3 if sub_x == 2 else 2
            shy = 3 if sub_y == 2 else 2
            fx = (mvx & 7) if sub_x == 2 else ((mvx & 3) << 1)
            fy = (mvy & 7) if sub_y == 2 else ((mvy & 3) << 1)
            cw = w // sub_x
            oy = jnp.clip((4 // sub_y) * band + (mvy >> shy) - 1,
                          -((4 // sub_y) + T - 2), Hdim - 1) + PADT
            ox = jnp.clip(x // sub_x + (mvx >> shx) - 1,
                          -(cw + T - 2), Wdim - 1) + PADL
            xs, ws = x // sub_x, cw
        return slot * Hpad + oy, ox, fy, fx, xs, ws

    def win_origin(k):
        row, col, *_ = seg_params(k)
        r8 = pl.multiple_of((row // 8) * 8, 8)
        c128 = pl.multiple_of((col // 128) * 128, 128)
        return row, col, r8, c128

    def start_dma(sl, i, k):
        _, _, r8, c128 = win_origin(k)
        return pltpu.make_async_copy(
            refs.at[pl.ds(r8, FH), pl.ds(c128, FW)], scratch.at[sl, i],
            sem.at[sl, i])

    @pl.when(ngroups > 0)
    def _():
        for i in range(G):
            start_dma(0, i, seg_k(0, i)).start()

    def body(j, _):
        sl = j % 2

        @pl.when(j + 1 < ngroups)
        def _():
            for i in range(G):
                start_dma((j + 1) % 2, i, seg_k(j + 1, i)).start()

        # per-segment scalars for this group
        ks = [seg_k(j, i) for i in range(G)]
        rows, win_offs, fys, fxs, offs, bases, ws = \
            [], [], [], [], [], [], []
        for i in range(G):
            start_dma(sl, i, ks[i]).wait()
            row, col, fy, fx, xs, w = seg_params(ks[i])
            r8 = (row // 8) * 8
            c128 = (col // 128) * 128
            rows.append(row - r8)
            win_offs.append(col - c128)
            fys.append(fy)
            fxs.append(fx)
            base = jnp.minimum((xs // 128) * 128, Wout - FW)
            bases.append(base)
            offs.append(xs - base)
            # segments beyond this band's count are index-0 padding: their
            # windows are valid DMAs but must merge nothing
            ws.append(jnp.where(j * G + i < n, w, 0))

        # per-row broadcast of per-segment scalars (Mosaic has no 1-D
        # vector reshape: build [rows, 1] vectors via iota block-selects)
        blk_fh = jax.lax.broadcasted_iota(jnp.int32, (G * FH, 1), 0) // FH
        blk_or = jax.lax.broadcasted_iota(jnp.int32, (G * OR, 1), 0) // OR

        def seg_rows(vals, blk):
            v = jnp.zeros(blk.shape, jnp.int32)
            for i in range(G):
                v = jnp.where(blk == i, vals[i], v)
            return v

        win = scratch[sl].reshape(G * FH, FW)
        # row alignment: static power-of-2 up-rolls, selected per segment
        # (wrapped rows land beyond the rows the filters read)
        rem_rows = seg_rows(rows, blk_fh)
        for b in range(3):
            sh = 1 << b
            rolled = pltpu.roll(win, shift=G * FH - sh, axis=0)
            win = jnp.where((rem_rows & sh) != 0, rolled, win)

        # horizontal filter (filter-always: phase 0 is the copy row)
        fx_rows = seg_rows(fxs, blk_fh)

        def coef(tap, fvec):
            c = jnp.full(fvec.shape, table[0][tap], jnp.int32)
            for f in range(1, len(table)):
                c = jnp.where(fvec == f, table[f][tap], c)
            return c

        th = coef(0, fx_rows) * win
        shp = win
        for k_tap in range(1, T):
            shp = pltpu.roll(shp, shift=FW - 1, axis=1)
            th = th + coef(k_tap, fx_rows) * shp
        th = _wrap16(th >> shift1) if shift1 else _wrap16(th)

        # vertical filter: [G*OR, FW] via per-segment static row slices
        # (segment i's aligned window lives at rows [i*FH, i*FH + FH))
        fy_rows = seg_rows(fys, blk_or)
        tv = jnp.zeros((G * OR, FW), jnp.int32)
        for k_tap in range(T):
            src = jnp.concatenate(
                [th[i * FH + k_tap:i * FH + k_tap + OR] for i in range(G)],
                axis=0)
            tv = tv + coef(k_tap, fy_rows) * src
        pred = _wrap16(tv >> 6)

        # placement: net lane shift per segment (window lane offset folded
        # into the output-column offset), then per-segment RMW merge
        nets = [(FW + win_offs[i] - offs[i]) & (FW - 1) for i in range(G)]
        net_rows = seg_rows(nets, blk_or)
        for b in range(8):
            sh = 1 << b
            rolled = pltpu.roll(pred, shift=FW - sh, axis=1)
            pred = jnp.where((net_rows & sh) != 0, rolled, pred)
        for i in range(G):
            mask = (lane >= offs[i]) & (lane < offs[i] + ws[i])
            base = pl.multiple_of(bases[i], 128)
            cur = out[0, :, pl.ds(base, FW)]
            out[0, :, pl.ds(base, FW)] = jnp.where(
                mask, pred[i * OR:(i + 1) * OR], cur)
        return 0

    jax.lax.fori_loop(0, ngroups, body, 0)


def _wrap16(x):
    """Wrap to int16 range (the spec's 16-bit intermediate storage)."""
    return ((x + (1 << 15)) & 0xFFFF) - (1 << 15)


@functools.partial(jax.jit, static_argnames=("OR", "T", "Hpad", "Wout",
                                             "n_bands", "KMAX", "bd",
                                             "interpret", "G",
                                             "chroma", "Hdim", "Wdim",
                                             "sub_x", "sub_y"))
def mc_stripes(refs2d, nseg, sidx, pu, *, OR: int,
               T: int, Hpad: int, Wout: int, n_bands: int, KMAX: int,
               bd: int, chroma: bool = False, Hdim: int = 0,
               Wdim: int = 0, sub_x: int = 2, sub_y: int = 2,
               interpret: bool = False, G: int = 8):
    """Run the segment MC kernel; returns [n_bands, OR, Wout] stripes at
    intermediate scale.  G segments are processed per loop iteration.

    sidx: [n_bands, ceil(KMAX/2)] packed per-band PU indices (two 16-bit
    indices per word); pu: this list's [8, Pcap'/4] folded kernel table
    (pack_pu_mc — exact SMEM sizing at 8 bytes/PU);
    Hdim/Wdim are THIS plane class's picture dims.
    """
    FH = 24 if T == 8 else 16
    table = tuple(tuple(int(v) for v in row)
                  for row in (QPEL_FILTERS if T == 8 else EPEL_FILTERS))
    kern = functools.partial(_mc_kernel, OR=OR, T=T, FH=FH, Hpad=Hpad,
                             Wout=Wout, bd=bd, KMAX=KMAX, table=table, G=G,
                             chroma=chroma, Hdim=Hdim, Wdim=Wdim,
                             sub_x=sub_x, sub_y=sub_y)
    KP = (KMAX + 1) // 2
    # SMEM blocks must keep their last two dims whole: ship the index table
    # as [n_bands, 1, KP] and block (1, 1, KP)
    seg_spec = pl.BlockSpec((1, 1, KP), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_bands,),
        in_specs=[seg_spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, OR, Wout), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, G, FH, FW), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, G))],
    )
    sidx = sidx[:, :KP]
    if sidx.shape[1] < KP:
        sidx = jnp.pad(sidx, ((0, 0), (0, KP - sidx.shape[1])))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_bands, OR, Wout), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nseg, pu, sidx[:, None, :], refs2d)


def default_interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _paint_kernel(nseg, pu, sidx, out, *, L, W4P, BB):
    """Rasterize the per-4x4-cell PU index map from the segment index feed
    (PUs never overlap in conformant HEVC, so paint order is irrelevant;
    the union over lists covers every inter PU).  BB bands per program —
    Mosaic requires the output block's sublane dim to be 8-divisible."""
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W4P), 1)
    for b8 in range(BB):
        band = g * BB + b8
        row = jnp.full((1, W4P), -1, jnp.int32)
        for l in range(L):
            def body(k, row, l=l, b8=b8):
                word = sidx[b8, l, k >> 1]
                idx = (word >> ((k & 1) * 16)) & 0xFFFF
                g16 = pu[idx & 7, idx >> 3]
                x4 = g16 & 0x7FF
                w4 = ((g16 >> 11) & 0x1F) + 1
                m = (lane >= x4) & (lane < x4 + w4)
                return jnp.where(m, idx, row)
            row = jax.lax.fori_loop(0, nseg[l, band], body, row)
        out[b8] = row[0]


@functools.partial(jax.jit, static_argnames=("n_bands", "W4", "L",
                                             "interpret"))
def paint_pu_idx(nseg2, sidx2, pu, *, n_bands: int, W4: int, L: int,
                 interpret: bool = False):
    """[n_bands, W4] per-cell PU index (-1 = not inter-covered) from the
    per-list segment index feed.  nseg2: [L, n_bands]; sidx2:
    [n_bands, L, KP]; pu: the [8, Pcap/8] folded geometry table
    (pack_pu_geo).

    Replaces shipping pu_idx per cell over the wire (0.26 MB/frame at
    1080p); bit-identical to the native parse-time paint because PUs
    partition CUs (disjoint rectangles)."""
    W4P = max(128, (W4 + 127) & ~127)
    KP = sidx2.shape[2]
    BB = 8
    NB = ((n_bands + BB - 1) // BB) * BB
    nseg2 = jnp.pad(nseg2, ((0, 0), (0, NB - n_bands)))
    sidx2 = jnp.pad(sidx2, ((0, NB - n_bands), (0, 0), (0, 0)))
    kern = functools.partial(_paint_kernel, L=L, W4P=W4P, BB=BB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB // BB,),
        in_specs=[pl.BlockSpec((BB, L, KP), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((BB, W4P), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NB, W4P), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nseg2, pu, sidx2)
    return out[:n_bands, :W4]


# ---------------------------------------------------------------------------
# residual scatter: TU blocks -> band stripes (the same segment pattern)
# ---------------------------------------------------------------------------
#
# XLA lowers the inter-residual scatter-add (`plane.at[iy, ix].add(blocks)`)
# as a generic scatter with the same pathological cost as the MC gathers, so
# the fused decoder routes it through this kernel instead: residual blocks
# are rearranged (dense reshape+pad, cheap) into one 128-lane row per
# (TU x output-band) slice, and each band program RMW-merges its slices into
# a [OR, Wout] stripe.  The caller adds the stripes onto the prediction
# planes with a dense elementwise add.

def plan_residual_segments(sc: np.ndarray, s: int, OR: int):
    """Explode one bin's scatter list [n, 3] (row, x, y) into per-band
    segments.  Returns (srow, x0) arrays [n_seg] plus band ids — the caller
    packs them per band."""
    if len(sc) == 0:
        return (np.zeros(0, np.int32),) * 3
    rows, xs, ys = sc[:, 0], sc[:, 1], sc[:, 2]
    keep = rows >= 0
    rows, xs, ys = rows[keep], xs[keep], ys[keep]
    per = s // OR                     # bands spanned by one TU
    n = len(rows)
    band = (ys[:, None] // OR + np.arange(per)[None, :]).ravel()
    srow = (rows[:, None] * per + np.arange(per)[None, :]).ravel()
    x0 = np.repeat(xs, per)
    return band.astype(np.int32), srow.astype(np.int32), x0.astype(np.int32)


def pack_band_segments(band, srow, x0, n_bands: int):
    """Group segments by band into [n_bands, K] arrays + counts."""
    order = np.argsort(band, kind="stable")
    bs = band[order]
    first = np.searchsorted(bs, bs)
    k_of = np.arange(len(bs)) - first
    K = int(k_of.max()) + 1 if len(bs) else 1
    counts = np.zeros(n_bands, np.int32)
    if len(bs):
        np.add.at(counts, bs, 1)
    out_w = np.zeros((n_bands, K), np.int32)
    out_w[bs, k_of] = (srow[order] & 0xFFFFF) | \
        (((x0[order] >> 1) & 0xFFF) << 20)
    return counts, out_w, K


def _res_kernel(nseg, sw, rows_hbm, out, scratch, sem, *, OR, S, Wout,
                G):
    # nseg scalar-prefetched; srow/x0 arrive as per-band SMEM blocks.
    # G segments per iteration (same batching as _mc_kernel).
    band = pl.program_id(0)
    out[0] = jnp.zeros((OR, Wout), jnp.int32)
    n = nseg[band]
    ngroups = (n + G - 1) // G
    KMAX = sw.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (OR, FW), 1)

    def seg_k(j, i):
        return jnp.minimum(j * G + i, KMAX - 1)

    def start_dma(sl, i, k):
        row0 = (sw[0, 0, k] & 0xFFFFF) * OR
        r8 = pl.multiple_of((row0 // 8) * 8, 8)
        return pltpu.make_async_copy(rows_hbm.at[pl.ds(r8, 16), :],
                                     scratch.at[sl, i], sem.at[sl, i])

    @pl.when(ngroups > 0)
    def _():
        for i in range(G):
            start_dma(0, i, seg_k(0, i)).start()

    def body(j, _):
        sl = j % 2

        @pl.when(j + 1 < ngroups)
        def _():
            for i in range(G):
                start_dma((j + 1) % 2, i, seg_k(j + 1, i)).start()

        ks = [seg_k(j, i) for i in range(G)]
        rems, offs, bases = [], [], []
        for i in range(G):
            start_dma(sl, i, ks[i]).wait()
            w = sw[0, 0, ks[i]]
            row0 = (w & 0xFFFFF) * OR
            rems.append(row0 - (row0 // 8) * 8)
            xs = ((w >> 20) & 0xFFF) * 2
            base = jnp.minimum((xs // 128) * 128, Wout - FW)
            bases.append(base)
            offs.append(xs - base)

        blk16 = jax.lax.broadcasted_iota(jnp.int32, (G * 16, 1), 0) // 16
        blk_or = jax.lax.broadcasted_iota(jnp.int32, (G * OR, 1), 0) // OR

        def seg_rows(vals, blk):
            v = jnp.zeros(blk.shape, jnp.int32)
            for i in range(G):
                v = jnp.where(blk == i, vals[i], v)
            return v

        win = scratch[sl].reshape(G * 16, 128)
        rem_rows = seg_rows(rems, blk16)
        for b in range(3):
            sh = 1 << b
            rolled = pltpu.roll(win, shift=G * 16 - sh, axis=0)
            win = jnp.where((rem_rows & sh) != 0, rolled, win)
        # rows 0..OR-1 of each block hold its [OR, 128-padded] slice
        blk = jnp.concatenate(
            [win[i * 16:i * 16 + OR] for i in range(G)], axis=0)
        blk = jnp.concatenate(
            [blk, jnp.zeros((G * OR, FW - 128), jnp.int32)], axis=1)
        net_rows = seg_rows([(FW - offs[i]) & (FW - 1) for i in range(G)],
                            blk_or)
        for b in range(8):
            sh = 1 << b
            rolled = pltpu.roll(blk, shift=FW - sh, axis=1)
            blk = jnp.where((net_rows & sh) != 0, rolled, blk)
        for i in range(G):
            # mask width is static here, so tail-group padding segments
            # (k >= n) must be explicitly suppressed
            mask = (lane >= offs[i]) & (lane < offs[i] + S) & (j * G + i < n)
            base = pl.multiple_of(bases[i], 128)
            cur = out[0, :, pl.ds(base, FW)]
            out[0, :, pl.ds(base, FW)] = jnp.where(
                mask, blk[i * OR:(i + 1) * OR], cur)
        return 0

    jax.lax.fori_loop(0, ngroups, body, 0)


@functools.partial(jax.jit, static_argnames=("OR", "S", "Wout", "n_bands",
                                             "interpret", "G"))
def residual_stripes(bin_res, nseg, sw, *, OR: int, S: int, Wout: int,
                     n_bands: int, interpret: bool = False, G: int = 8):
    """Scatter one size-bin's TU residuals into [n_bands, OR, Wout] stripes.

    bin_res: [N, S, S] int32 residual blocks (this bin).  The blocks are
    rearranged (dense reshape+pad) to one 128-lane row per residual ROW so
    the kernel needs no sub-lane shuffles: slice j of TU t lives at rows
    [(t*per + j) * OR, ... + OR) of the [M*OR, 128] feed.
    """
    N = bin_res.shape[0]
    per = S // OR
    rows = jnp.pad(bin_res.reshape(N * per, OR, S),
                   ((0, 8), (0, 0), (0, 128 - S)))
    rows = rows.reshape((N * per + 8) * OR, 128)
    kern = functools.partial(_res_kernel, OR=OR, S=S, Wout=Wout, G=G)
    K = sw.shape[1]
    seg_spec = pl.BlockSpec((1, 1, K), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_bands,),
        in_specs=[seg_spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, OR, Wout), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, G, 16, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, G))],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_bands, OR, Wout), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nseg, sw[:, None, :], rows)
