"""Pallas TPU kernel: CSR coefficient list -> dense [N, S, S] level blocks.

The wire-compact feed ships each size-bin's residual coefficients as one
packed CSR stream of 8-bit entries, FOUR per int32 word (little-endian
byte order), positions delta-coded in raster order per TU: a running
position P starts at -1; an entry with val!=0 (4-bit signed, clamped to
+-7) advances P by dpos+1 and emits `val` at P; a zero byte advances P by
15 and emits nothing — so gap bridges and the pad to 4-entry multiples are
plain zeros.  coff holds per-TU ENTRY offsets (multiples of 4).  |val|>7
escapes are fixed downstream by a correction scatter-add
(fused_decode._bin_tus / feedpack.cc bin_tus).

Densifying with `levels.at[crow, y, x].set(val)` lowers through XLA's
generic scatter, which serializes per update on TPU — measured as the
dominant residual-section cost at 1080p (PARITY.md cost model).  This
kernel replaces it with the TPU-native pipeline:

  * one contiguous DMA per G-TU group (CSR rows are adjacent, so a
    group's words are ONE [Lr, 128] HBM window), double-buffered across
    grid steps;
  * per-TU window extraction in VMEM: dynamic sublane slice + the
    binary lane-roll alignment trick (same pattern as mc_pallas
    _res_kernel);
  * position recovery as a lane prefix-sum of the per-entry advance
    (7 masked shift-adds + a tiny static cross-row carry);
  * densification as a BATCHED MXU MATMUL per byte stream:
    out[g, y, x] = sum_j 1[fy[j]==y] * (1[fx[j]==x] * val[j]) —
    positions are unique within a TU, so every output sum has at most
    one nonzero term and f32 accumulation is exact (|val| <= 7).

Reference behavior counterpart: the per-TU coefficient scan in
/root/reference/libde265/slice.cc residual_coding -> transform input;
here the whole frame's TU bins densify in one fused device section.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-bin group size: more TUs per DMA for the small (numerous) bins
_GROUP = {4: 32, 8: 16, 16: 8, 32: 8}


def _densify_kernel(rowstart, starts, cnts, cv_hbm, out, chunk, sem, *,
                    G, S, CAPW, Lr, Rw, ngroups):
    g = pl.program_id(0)

    def dma(slot, grp):
        return pltpu.make_async_copy(
            cv_hbm.at[pl.ds(rowstart[grp], Lr), :], chunk.at[slot],
            sem.at[slot])

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < ngroups)
    def _():
        dma((g + 1) % 2, g + 1).start()

    dma(g % 2, g).wait()
    slot = g % 2
    base = rowstart[g] * 128

    # per-TU word windows at dynamic sublane offsets (starts are in
    # ENTRY units; words = entries/4, runs are padded to 4-multiples).
    # Windows are dynamic-start sublane reads of the VMEM scratch ref
    # (loading the whole chunk and dynamic_slice-ing does not lower).
    wins, ls, cs = [], [], []
    for i in range(G):
        e = (starts[0, 0, i] >> 2) - base
        wins.append(chunk[slot, pl.ds(e // 128, Rw), :])
        ls.append(e % 128)
        cs.append(cnts[0, 0, i])
    w = jnp.stack(wins)  # [G, Rw, 128]

    # lane-align each window: left-rotate row r by l_i (binary rolls)
    blk = w.reshape(G * Rw, 128)
    rowblk = jax.lax.broadcasted_iota(jnp.int32, (G * Rw, 1), 0) // Rw
    lrow = jnp.zeros((G * Rw, 1), jnp.int32)
    lvec = jnp.zeros((G, 1, 1), jnp.int32)
    cvec = jnp.zeros((G, 1, 1), jnp.int32)
    gblk = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
    for i in range(G):
        lrow = jnp.where(rowblk == i, ls[i], lrow)
        lvec = jnp.where(gblk == i, ls[i], lvec)
        cvec = jnp.where(gblk == i, cs[i], cvec)
    for b in range(7):
        sh = 1 << b
        rolled = pltpu.roll(blk, shift=128 - sh, axis=1)
        blk = jnp.where((lrow & sh) != 0, rolled, blk)
    blk = blk.reshape(G, Rw, 128)

    # merge adjacent rotated rows into the contiguous word window
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, Rw - 1, 128), 2)
    words = jnp.where(lane < 128 - lvec, blk[:, :-1, :], blk[:, 1:, :])

    # word index within the TU; entry validity per byte
    widx = jax.lax.broadcasted_iota(jnp.int32, (G, Rw - 1, 128), 1) * 128 + \
        lane

    # per-byte value / advance step (invalid entries advance by 0 so the
    # running position of valid entries is unaffected)
    vals, steps = [], []
    for h in range(4):
        ent = (words >> (8 * h)) & 0xFF
        valid = (4 * widx + h) < cvec
        v = jnp.where(valid, ((ent >> 4) ^ 8) - 8, 0)
        vals.append(v)
        steps.append(jnp.where(
            valid, jnp.where(v == 0, 15, (ent & 0xF) + 1), 0))

    # running position: lane prefix-sum of the per-WORD advance within
    # each window row, plus a static cross-row carry
    word_step = steps[0] + steps[1] + steps[2] + steps[3]
    ps = word_step
    for b in range(7):
        sh = 1 << b
        rolled = pltpu.roll(ps, shift=sh, axis=2)
        ps = ps + jnp.where(lane >= sh, rolled, 0)   # inclusive prefix
    rowsum = jnp.sum(word_step, axis=2, keepdims=True)   # [G, Rw-1, 1]
    parts = []
    run = jnp.zeros((G, 1, 1), jnp.int32)
    for r in range(Rw - 1):
        parts.append(run)
        run = run + rowsum[:, r:r + 1, :]
    rowbase = jnp.concatenate(parts, axis=1) if Rw - 1 > 1 else parts[0]
    p_excl = rowbase + ps - word_step     # position sum before this word

    # sublane iota (1, S, 1): one-hot rows live on sublanes, entries on
    # lanes, so the matmul contracts the natural 128-lane dim
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
    acc = None
    carry = p_excl
    for h in range(4):
        pos = carry + steps[h] - 1        # this entry's position (val!=0)
        carry = carry + steps[h]
        val = vals[h]
        fy = jnp.where(val != 0, pos // S, -1)
        fx = pos & (S - 1)
        # MXU densify: positions unique per TU -> at most one nonzero
        # term per output, f32 exact.  One batched matmul per window row
        # (Mosaic wants a single contracting dim; int-index + trailing
        # None lowers as an unsupported gather, hence slice_in_dim).
        for r in range(Rw - 1):
            fyr = jax.lax.slice_in_dim(fy, r, r + 1, axis=1)   # [G,1,128]
            fxr = jax.lax.slice_in_dim(fx, r, r + 1, axis=1)
            vr = jax.lax.slice_in_dim(val, r, r + 1, axis=1)
            my = (fyr == iy).astype(jnp.float32)               # [G,S,128]
            mxv = (fxr == iy).astype(jnp.float32) * \
                vr.astype(jnp.float32)
            d = jax.lax.dot_general(
                my, mxv, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    out[...] = acc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("N", "S", "CAP", "interpret"))
def densify_bin(cv, coff, *, N: int, S: int, CAP: int,
                interpret: bool = False):
    """Dense [N, S, S] int32 level blocks from the bin's CSR feed.

    cv:   [W] int32, four 8-bit delta entries per word, CSR-ordered.
    coff: [N+1] int32 per-TU ENTRY offsets (multiples of 4; padded rows
          repeat the total).
    CAP:  static max entries per TU (stream watermark; can exceed S*S
          because gap bridges cost extra zero entries).
    """
    if N == 0:
        return jnp.zeros((0, S, S), jnp.int32)
    G = _GROUP[S]
    CAP = max(8, (CAP + 3) & ~3)
    CAPW = CAP // 4
    Np = ((N + G - 1) // G) * G
    ngroups = Np // G
    # window rows per TU; the chunk must cover the worst-case window of
    # the group's LAST TU (start misalignment + full preceding TUs), so
    # a bare (G*CAPW+127)//128+1 would let dynamic_slice clamp and
    # return misaligned rows
    Rw = (CAPW + 127) // 128 + 1
    Lr = (G * CAPW + 127) // 128 + Rw

    coff = jnp.pad(coff, (0, Np + 1 - coff.shape[0]),
                   mode="edge") if coff.shape[0] < Np + 1 else coff
    # SMEM blocks must keep their last two dims whole (TPU lowering rule;
    # same pattern as mc_pallas): ship the per-group tables as
    # [ngroups, 1, G] with (1, 1, G) blocks.
    starts = coff[:Np].reshape(ngroups, 1, G)
    ends = coff[1:Np + 1].reshape(ngroups, 1, G)
    cnts = jnp.minimum(ends - starts, CAP)
    rowstart = (starts[:, 0, 0] >> 2) // 128

    # slack so every group DMA window stays in-bounds
    crows = (cv.shape[0] + 127) // 128 + Lr + 1
    cv2d = jnp.pad(cv, (0, crows * 128 - cv.shape[0])).reshape(crows, 128)

    kern = functools.partial(_densify_kernel, G=G, S=S, CAPW=CAPW, Lr=Lr,
                             Rw=Rw, ngroups=ngroups)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ngroups,),
            in_specs=[
                pl.BlockSpec((1, 1, G), lambda g, rs: (g, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, G), lambda g, rs: (g, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((G, S, S), lambda g, rs: (g, 0, 0)),
            scratch_shapes=[pltpu.VMEM((2, Lr, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((Np, S, S), jnp.int32),
        interpret=interpret,
    )(rowstart, starts, cnts, cv2d)
    return out[:N]


def densify_ref(cv, coff, *, N: int, S: int):
    """Numpy oracle for tests: walk the delta-byte entries, scatter."""
    out = np.zeros((N, S, S), np.int64)
    cv = np.asarray(cv).astype(np.int64)
    coff = np.asarray(coff)
    ent = np.stack([(cv >> (8 * h)) & 0xFF for h in range(4)],
                   axis=1).reshape(-1) if len(cv) else np.zeros(0, np.int64)
    for t in range(N):
        p = -1
        for j in range(int(coff[t]), int(coff[t + 1])):
            e = int(ent[j])
            val = ((e >> 4) ^ 8) - 8
            if val == 0:
                p += 15
                continue
            p += (e & 0xF) + 1
            if 0 <= p < S * S:
                out[t, p // S, p % S] = val
    return out.astype(np.int32)
