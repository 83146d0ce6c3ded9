"""Device-side intra prediction via wavefront batching.

Intra blocks depend on reconstructed neighbors, which serializes them in
decode order.  Everything about that dependence except the pixel *values* is
static metadata, so the host precomputes, per block:

  - border-sample source positions + availability-substitution indices
    (spec 8.4.4.2.2 reduced to two gathers),
  - the smoothing-filter decision (8.4.4.2.3; the strong bilinear condition
    is value-dependent and evaluated on device),
  - per-(mode, size) angular reference/index/weight tables (8.4.4.2.6
    reduced to two gathers + one weighted add),
  - a wavefront level = 1 + max(level of blocks its border reads),

and the device then executes one batched kernel per (wave, size) with every
block in the wave predicted, residual-added and scattered in parallel.

Bit-exact counterpart of ops/intra.py (the host-sequential reference) and
native/src/intra.cc.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .intra import ANGLE, INV_ANGLE, IntraContext

__all__ = ["build_mode_tables", "plan_blocks", "intra_wave_kernel"]


# ---------------------------------------------------------------------------
# host-side planning
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def build_mode_tables(s: int):
    """Per-(mode, size) angular gather tables.

    Returns (P0, P1, W): int32 [35, s*s] — border indices of the two
    reference samples and the interpolation weight for every output pixel.
    Modes 0/1 rows are unused (planar/DC are computed directly).
    """
    n2 = 2 * s
    P0 = np.zeros((35, s * s), dtype=np.int32)
    P1 = np.zeros((35, s * s), dtype=np.int32)
    W = np.zeros((35, s * s), dtype=np.int32)
    for mode in range(2, 35):
        angle = int(ANGLE[mode])
        inv = int(INV_ANGLE[mode])
        vertical = mode >= 18

        def ref_map(i):
            # spec ref[] index -> border[] index
            if i >= 0:
                return (n2 + i) if vertical else (n2 - i)
            off = (i * inv + 128) >> 8
            if vertical:
                return max(n2 - off, 0)
            return min(n2 + off, 4 * s)

        k = np.arange(s)
        idx = ((k + 1) * angle) >> 5
        fact = ((k + 1) * angle) & 31
        p0 = np.zeros((s, s), dtype=np.int32)
        p1 = np.zeros((s, s), dtype=np.int32)
        w = np.zeros((s, s), dtype=np.int32)
        for a in range(s):          # a = y (vertical modes) or x (horizontal)
            for b in range(s):      # b runs along the reference
                i0 = idx[a] + 1 + b
                if vertical:
                    p0[a, b] = ref_map(i0)
                    p1[a, b] = ref_map(i0 + 1)
                    w[a, b] = fact[a]
                else:
                    p0[b, a] = ref_map(i0)
                    p1[b, a] = ref_map(i0 + 1)
                    w[b, a] = fact[a]
        P0[mode] = p0.ravel()
        P1[mode] = p1.ravel()
        W[mode] = w.ravel()
    return P0, P1, W


def border_plan(ctx: IntraContext, x0c, y0c, nT, sub_x, sub_y, H, W):
    """Static border gather plan for one block (mirrors intra.fill_border).

    Returns (pos [4nT+1, 2], subst [4nT+1], all_unavailable).
    """
    n2 = 2 * nT
    n = 4 * nT + 1
    pos = np.zeros((n, 2), dtype=np.int32)
    avail = np.zeros(n, dtype=bool)
    xL, yL = x0c * sub_x, y0c * sub_y

    def savail(xc, yc):
        return ctx.available(xL, yL, xc * sub_x, yc * sub_y)

    for k in range(n2):
        yc = y0c + n2 - 1 - k
        if x0c > 0 and yc < H and savail(x0c - 1, yc):
            pos[k] = (yc, x0c - 1)
            avail[k] = True
    if x0c > 0 and y0c > 0 and savail(x0c - 1, y0c - 1):
        pos[n2] = (y0c - 1, x0c - 1)
        avail[n2] = True
    for k in range(n2):
        xc = x0c + k
        if y0c > 0 and xc < W and savail(xc, y0c - 1):
            pos[n2 + 1 + k] = (y0c - 1, xc)
            avail[n2 + 1 + k] = True

    subst = np.arange(n, dtype=np.int32)
    if not avail.any():
        return pos, subst, True
    if not avail[0]:
        subst[0] = int(np.argmax(avail))
    for i in range(1, n):
        if not avail[i]:
            subst[i] = subst[i - 1]
    return pos, subst, False


def plan_blocks(prog, ctx: IntraContext, residuals):
    """Group the picture's intra ops into wavefront levels.

    Returns {(wave, cidx, log2_size): block-batch dict} in wave order, where
    each batch holds the stacked static inputs for intra_wave_kernel.
    """
    from ..decoder import OP_INTRA, OP_RESIDUAL, TU_INTRA

    tus = prog.tus
    # associate each intra op with its residual TU (same x/y/cidx, the next
    # intra-flagged residual op in decode order)
    blocks = []           # (rec, resid or None)
    pending = {}          # (x, y, cidx) -> block index
    for op in prog.ops:
        if op["kind"] == OP_INTRA:
            rec = prog.intras[op["idx"]]
            key = (int(rec["x"]), int(rec["y"]), int(rec["cidx"]))
            pending[key] = len(blocks)
            blocks.append([rec, None])
        elif op["kind"] == OP_RESIDUAL:
            t = int(op["idx"])
            if not (tus["flags"][t] & TU_INTRA):
                continue
            tu = tus[t]
            key = (int(tu["x"]), int(tu["y"]), int(tu["cidx"]))
            b = pending.get(key)
            if b is not None:
                blocks[b][1] = residuals[t]

    # wavefront levels per channel (4-pel metadata grids)
    grids = {}
    batches = {}
    chroma444 = prog.chroma_width == prog.width and prog.chroma_width > 0
    for rec, resid in blocks:
        c = int(rec["cidx"])
        if c == 0:
            sub_x = sub_y = 1
        else:
            sub_x = prog.width // prog.chroma_width
            sub_y = prog.height // prog.chroma_height
        H = prog.height if c == 0 else prog.chroma_height
        Wd = prog.width if c == 0 else prog.chroma_width
        if c not in grids:
            grids[c] = np.zeros(((H + 3) // 4, (Wd + 3) // 4), dtype=np.int32)
        wmap = grids[c]
        x0, y0 = int(rec["x"]), int(rec["y"])
        lg = int(rec["log2_size"])
        nT = 1 << lg
        pos, subst, unavail = border_plan(ctx, x0, y0, nT, sub_x, sub_y, H, Wd)
        # wave = 1 + max wave of the cells this block's border reads
        if unavail:
            wave = 1
        else:
            have = subst == np.arange(len(subst))  # originally available
            cells = pos[have] >> 2
            wave = 1 + int(wmap[cells[:, 0], cells[:, 1]].max(initial=0))
        wmap[y0 >> 2:(y0 + nT + 3) >> 2, x0 >> 2:(x0 + nT + 3) >> 2] = wave

        mode = int(rec["mode"])
        filt = False
        # smoothing (8.4.4.2.3): luma always eligible; chroma only in 4:4:4
        if (c == 0 or chroma444) and not ctx.smoothing_disabled:
            if mode != 1 and nT != 4:
                mind = min(abs(mode - 26), abs(mode - 10))
                thresh = 7 if nT == 8 else (1 if nT == 16 else 0)
                filt = True if mode == 0 else (mind > thresh)
        strong = filt and ctx.strong_smoothing and c == 0 and nT == 32
        edge = 0
        if c == 0 and nT < 32:
            if mode == 1:
                edge = 1
            elif mode == 26:
                edge = 2
            elif mode == 10:
                edge = 3

        key = (wave, c, lg)
        b = batches.setdefault(key, {
            "pos": [], "subst": [], "unavail": [], "filt": [], "strong": [],
            "mode": [], "edge": [], "resid": [], "y0": [], "x0": []})
        b["pos"].append(pos)
        b["subst"].append(subst)
        b["unavail"].append(unavail)
        b["filt"].append(filt)
        b["strong"].append(strong)
        b["mode"].append(mode)
        b["edge"].append(edge)
        # residuals may be host arrays or device-residual handles (tpu_decode
        # keeps them on device and stacks them per batch later)
        if resid is not None and hasattr(resid, "key"):
            b["resid"].append(resid)
        else:
            b["resid"].append(resid if resid is not None
                              else np.zeros((nT, nT), dtype=np.int32))
        b["y0"].append(y0)
        b["x0"].append(x0)

    out = {}
    for key in sorted(batches):
        b = batches[key]
        handles = None
        if b["resid"] and any(hasattr(r, "key") for r in b["resid"]):
            handles = [r if hasattr(r, "key") else None for r in b["resid"]]
            del b["resid"]
        arrs = {k: np.stack(v) if k in ("pos", "subst", "resid")
                else np.asarray(v) for k, v in b.items()}
        # pad the batch to a power-of-two size so jit traces are reused
        # across waves (padded entries carry valid=False and write back the
        # unmodified plane samples)
        n = len(arrs["mode"])
        cap = 1 << max(0, (n - 1).bit_length())
        arrs["valid"] = np.ones(n, dtype=bool)
        if cap != n:
            pad = cap - n
            for k, v in list(arrs.items()):
                pad_block = np.zeros((pad,) + v.shape[1:], dtype=v.dtype)
                arrs[k] = np.concatenate([v, pad_block])
        if handles is not None:
            arrs["resid_handles"] = handles + [None] * (cap - n)
        out[key] = arrs
    return out


# ---------------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("s", "bit_depth"))
def intra_wave_kernel(plane, pos, subst, unavail, filt, strong, mode, edge,
                      resid, y0, x0, valid, P0, P1, WT, s: int,
                      bit_depth: int = 8):
    """Predict + residual-add one wave of N same-size intra blocks.

    plane: [H, W] int32;  pos [N,4s+1,2], subst [N,4s+1], resid [N,s,s] etc.
    P0/P1/WT: [35, s*s] angular gather tables (build_mode_tables(s)).
    Returns the updated plane.
    """
    N = mode.shape[0]
    n2 = 2 * s
    maxv = (1 << bit_depth) - 1
    lg = s.bit_length() - 1

    b = plane[pos[..., 0], pos[..., 1]]               # [N, 4s+1]
    b = jnp.take_along_axis(b, subst, axis=1)
    b = jnp.where(unavail[:, None], 1 << (bit_depth - 1), b)

    # --- smoothing (8.4.4.2.3) ---
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

    left = filtered[:, n2 - 1 - jnp.arange(n2)]       # [N, 2s]
    top = filtered[:, n2 + 1 + jnp.arange(n2)]
    corner = filtered[:, n2]

    # --- planar (8.4.4.2.4) ---
    xg = jnp.arange(s)[None, None, :]
    yg = jnp.arange(s)[None, :, None]
    planar = (((s - 1 - xg) * left[:, :s, None] +
               (xg + 1) * top[:, s, None, None] +
               (s - 1 - yg) * top[:, None, :s] +
               (yg + 1) * left[:, s, None, None] + s) >> (lg + 1))

    # --- DC (8.4.4.2.5) ---
    dc = (left[:, :s].sum(axis=1) + top[:, :s].sum(axis=1) + s) >> (lg + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (N, s, s))
    if s < 32:
        row0 = (top[:, 1:s] + 3 * dc[:, None] + 2) >> 2
        col0 = (left[:, 1:s] + 3 * dc[:, None] + 2) >> 2
        c00 = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
        dce = dcp.at[:, 0, 1:].set(row0).at[:, 1:, 0].set(col0)
        dce = dce.at[:, 0, 0].set(c00)
        dcp = jnp.where((edge == 1)[:, None, None], dce, dcp)

    # --- angular (8.4.4.2.6): two gathers + weighted add ---
    p0 = P0[mode]                                      # [N, s*s]
    p1 = P1[mode]
    w = WT[mode]
    g0 = jnp.take_along_axis(filtered, p0, axis=1)
    g1 = jnp.take_along_axis(filtered, p1, axis=1)
    ang = (((32 - w) * g0 + w * g1 + 16) >> 5).reshape(N, s, s)
    # vertical/horizontal edge compensation (modes 26/10, luma, nT<32)
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

    out = jnp.clip(pred + resid, 0, maxv)

    # padded batch entries scatter out of bounds and are dropped (a padded
    # entry writing back plane[0:s, 0:s] would race with a real block there)
    rows = jnp.where(valid, y0, 1 << 28)[:, None, None] + \
        jnp.arange(s)[None, :, None]
    cols = x0[:, None, None] + jnp.arange(s)[None, None, :]
    return plane.at[rows, cols].set(out, mode="drop", unique_indices=True)
