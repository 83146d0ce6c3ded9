"""Pallas TPU window-DMA kernels for the intra super-wave plane access.

The wave step's two full-plane operations — the [K, 4s+1] border gather and
the [K, s, s] reconstructed-block scatter — lower catastrophically through
XLA on TPU (generic gather/scatter; together ~75% of the measured ~0.9 ms
step cost at 1080p).  Mosaic stores HBM arrays (8, 128)-tiled, so DMA
windows must be whole-tile aligned: these kernels therefore move only
aligned rectangles and leave every sub-tile placement to cheap vector math.

  * border_gather: per block, ONE [8, 256] window containing the
    corner+top row and ONE [FHL, 128] window containing the left column.
    In-kernel roll ladders compact G=8 blocks into one output tile pair
    (block i's top row on sublane i, its left column on lane i), so the
    HBM round-trip is ~16x smaller than shipping raw windows; the caller
    unpacks with dense XLA ops.
  * window_scatter: reconstructed blocks are grouped by the (row-band,
    lane-tile) window they touch — computed DENSELY in XLA (pairwise
    key ranking + one-hot f32 MXU matmuls, exact for <2^24 pixel values;
    K <= 256, no sort, no scatter) so windows are tile-disjoint by
    construction — then one kernel program per window does an aligned
    read-modify-write with depth-4 DMA pipelining and no ordering hazards.

Alignment facts this leans on: HEVC transform blocks are s-aligned
(x0 % s == y0 % s == 0), and the scan plane is padded by (PAD_T=8,
PAD_L=128) so padded origins keep their alignment; only s=4 blocks can
start mid-tile (y0p % 8 == 4), bounded by a single conditional roll.

Bit-exact counterparts of the gather/scatter lines in
fused_decode._wave_body; reference behavior: border assembly in
/root/reference/libde265/intrapred.cc:255-365.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_T = 8     # top padding keeps y0p on the same mod-8 grid as y0
PAD_L = 128   # left padding keeps x0p on the same mod-128 grid as x0
G = 8         # blocks compacted per gather program / output tile


def scan_pad_sizes(h: int, w: int):
    """Padded scan-plane shape: whole (8, 128) tiles, with enough slack on
    the right/bottom that every window DMA stays in bounds (left windows
    reach y0p + 2*32 rows; top windows reach c128 + 256 lanes)."""
    hp = (h + PAD_T + 2 * 32 + 8 + 7) & ~7
    wp = ((w + PAD_L + 127) // 128 + 2) * 128
    return hp, wp


@functools.partial(jax.jit, static_argnames=("hp", "wp"))
def pad_plane_for_scan(plane, hp: int, wp: int):
    """Zero-pad a plane into its scan layout (padding content is never
    consumed: border positions landing there are substitution-replaced)."""
    h, w = plane.shape
    return jnp.pad(plane, ((PAD_T, hp - h - PAD_T), (PAD_L, wp - w - PAD_L)))


def unpad_plane(padded, h: int, w: int):
    return padded[PAD_T:PAD_T + h, PAD_L:PAD_L + w]


def _up(x, rem, nbits, axis, size):
    """Roll `x` up/left by the traced remainder via static power-of-2
    rolls (element at position rem lands at position 0)."""
    for b in range(nbits):
        sh = 1 << b
        rolled = pltpu.roll(x, shift=size - sh, axis=axis)
        x = jnp.where((rem & sh) != 0, rolled, x)
    return x


def _gather_kernel(n, ty8, tc, trem, tloff, ly8,
                   plane, tout, lout, twin, lwin, sems, *, FHL):
    j = pl.program_id(0)
    na = (n[0] + G - 1) // G

    def top_dma(k, sl, i):
        r8 = pl.multiple_of(ty8[k], 8)
        c = pl.multiple_of(tc[k], 128)
        return pltpu.make_async_copy(
            plane.at[pl.ds(r8, 8), pl.ds(c, 256)], twin.at[sl, i],
            sems.at[0, sl, i])

    def left_dma(k, sl, i):
        r8 = pl.multiple_of(ly8[k], 8)
        c = pl.multiple_of(tc[k], 128)
        return pltpu.make_async_copy(
            plane.at[pl.ds(r8, FHL), pl.ds(c, 128)], lwin.at[sl, i],
            sems.at[1, sl, i])

    def issue(g, sl):
        for i in range(G):
            k = jnp.minimum(g * G + i, n[0] - 1)
            top_dma(k, sl, i).start()
            left_dma(k, sl, i).start()

    @pl.when(j == 0)
    def _():
        issue(0, 0)

    @pl.when(j + 1 < na)
    def _():
        issue(j + 1, (j + 1) % 2)

    @pl.when(j < na)
    def _():
        sl = j % 2
        comb_t = jnp.zeros((8, 256), jnp.int32)
        comb_l = jnp.zeros((FHL, 128), jnp.int32)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 0)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (FHL, 128), 1)
        for i in range(G):
            k = jnp.minimum(j * G + i, n[0] - 1)
            top_dma(k, sl, i).wait()
            left_dma(k, sl, i).wait()
            # top window: target row -> sublane i, corner lane -> lane 0
            tw = _up(twin[sl, i], (trem[k] - i) & 7, 3, 0, 8)
            tw = _up(tw, tloff[k], 8, 1, 256)
            comb_t = jnp.where(row8 == i, tw, comb_t)
            # left window: rows already band-aligned; column lane -> lane i
            lw = _up(lwin[sl, i], (tloff[k] - i) & 127, 7, 1, 128)
            comb_l = jnp.where(lane128 == i, lw, comb_l)
        tout[0] = comb_t
        lout[0] = comb_l


@functools.partial(jax.jit, static_argnames=("s", "interpret"))
def border_gather(padded, y0p, x0p, nvalid, *, s: int,
                  interpret: bool = False):
    """Raw border samples of K same-size blocks from the padded scan plane.

    y0p/x0p: block origins in padded coordinates (valid blocks lead; their
    count is nvalid, a traced scalar).  Returns
    (tops [K, 2s+1]: corner then top row left->right,
     lefts [K, 2s]: left column top->bottom)."""
    K = y0p.shape[0]
    NG = (K + G - 1) // G
    n2 = 2 * s
    FHL = (n2 + (4 if s == 4 else 0) + 7) & ~7
    Hp, Wp = padded.shape

    # aligned window origins + in-window offsets (dense int math).  The
    # corner/top row sits at (y0p-1, x0p-1); the left column shares the
    # corner's lane window.
    ty = jnp.clip(y0p - 1, 0, Hp - 8)
    ty8 = (ty // 8) * 8
    trem = ty - ty8
    tx = jnp.clip(x0p - 1, 0, Wp - 256)
    tc = jnp.minimum((tx // 128) * 128, Wp - 256)
    tloff = tx - tc
    ly = jnp.clip(y0p, 0, Hp - FHL)
    ly8 = jnp.minimum((ly // 8) * 8, Hp - FHL)
    lrem = ly - ly8                      # 0 or 4 (s==4 only), else 0
    n1 = jnp.maximum(nvalid.astype(jnp.int32), 1).reshape(1)

    kern = functools.partial(_gather_kernel, FHL=FHL)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(NG,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, 8, 256), lambda j, n, *_: (
                jnp.minimum(j, (n[0] - 1) // G), 0, 0)),
            pl.BlockSpec((1, FHL, 128), lambda j, n, *_: (
                jnp.minimum(j, (n[0] - 1) // G), 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((2, G, 8, 256), jnp.int32),
                        pltpu.VMEM((2, G, FHL, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, 2, G))],
    )
    tout, lout = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((NG, 8, 256), jnp.int32),
                   jax.ShapeDtypeStruct((NG, FHL, 128), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n1, ty8, tc, trem, tloff, ly8, padded)

    tops = tout.reshape(NG * 8, 256)[:K, :n2 + 1]
    # block i of group g: left column at (rows [lrem, lrem+2s), lane i);
    # lrem is 0 or 4 and only for s == 4, so a select beats a gather
    lo = jnp.transpose(lout[:, :, :G], (0, 2, 1)).reshape(NG * G, FHL)[:K]
    if s == 4:
        lefts = jnp.where((lrem == 4)[:, None], lo[:, 4:4 + n2], lo[:, :n2])
    else:
        lefts = lo[:, :n2]
    return tops, lefts


def _scatter_kernel(nwin, wy, wc, canvas, mask, plane_in, plane_out,
                    win, wm, sems, *, WH, D, NW):
    del plane_in  # aliased with plane_out
    w = pl.program_id(0)
    n = nwin[0]

    def read(ww, sl):
        r8 = pl.multiple_of(wy[jnp.minimum(ww, NW - 1)], 8)
        c = pl.multiple_of(wc[jnp.minimum(ww, NW - 1)], 128)
        return pltpu.make_async_copy(
            plane_out.at[pl.ds(r8, WH), pl.ds(c, 128)], win.at[sl],
            sems.at[0, sl])

    def write(ww, sl):
        r8 = pl.multiple_of(wy[jnp.minimum(ww, NW - 1)], 8)
        c = pl.multiple_of(wc[jnp.minimum(ww, NW - 1)], 128)
        return pltpu.make_async_copy(
            wm.at[sl], plane_out.at[pl.ds(r8, WH), pl.ds(c, 128)],
            sems.at[1, sl])

    @pl.when(w == 0)
    def _():
        for d in range(D):
            @pl.when(d < n)
            def _():
                read(d, d).start()

    @pl.when(w < n)
    def _():
        sl = w % D

        # slot reuse: the write issued D programs ago used wm[sl]
        @pl.when(w >= D)
        def _():
            write(w - D, sl).wait()

        read(w, sl).wait()
        wm[sl] = jnp.where(mask[0] != 0, canvas[0], win[sl])
        write(w, sl).start()

        @pl.when(w + D < n)
        def _():
            read(w + D, sl).start()

        # drain: the last active program waits every write still in flight
        # (writes n-D..n-2 had no slot-reuse wait yet, plus this one)
        @pl.when(w == n - 1)
        def _():
            for d in range(D):
                @pl.when(d < jnp.minimum(n, D))
                def _():
                    ww = n - 1 - d
                    write(ww, ww % D).wait()


@functools.partial(jax.jit, static_argnames=("s", "interpret"),
                   donate_argnums=(0,))
def window_scatter(padded, blocks, y0p, x0p, valid, *, s: int,
                   interpret: bool = False):
    """Write K reconstructed [s, s] blocks into the padded scan plane.

    Blocks are grouped into tile-disjoint aligned [WH, 128] windows with
    dense XLA math, then one kernel program per window does an aligned
    read-modify-write (windows never share a tile, so the DMA pipeline
    needs no ordering fences)."""
    K = blocks.shape[0]
    WH = max(8, s)
    Hp, Wp = padded.shape

    # s >= 8 blocks are 8-row aligned after the PAD_T=8 shift, so the
    # window starts exactly at y0p; only s == 4 can sit mid-tile (rem 4)
    anchor = (y0p // 8) * 8
    rem = y0p - anchor
    c128 = (x0p // 128) * 128
    off = x0p - c128

    # --- tile-disjoint window grouping (dense; K <= 256: no sort/scatter).
    # wid[i] = number of distinct keys below keys[i]; invalid blocks get
    # unique large keys so they rank behind every real window. ---
    ntiles = Wp // 128
    keys = jnp.where(valid, (anchor // 8) * ntiles + x0p // 128,
                     (1 << 28) + jnp.arange(K, dtype=jnp.int32))
    eq = keys[:, None] == keys[None, :]
    tri = jnp.arange(K)[None, :] < jnp.arange(K)[:, None]
    isfirst = ~jnp.any(eq & tri, axis=1)
    lt = keys[None, :] < keys[:, None]
    wid = jnp.sum(isfirst[None, :] & lt, axis=1).astype(jnp.int32)
    nwin = jnp.sum(isfirst & valid).astype(jnp.int32)

    oh = ((wid[:, None] == jnp.arange(K)[None, :]) &
          valid[:, None]).astype(jnp.float32)              # [block, window]
    ohf = oh * isfirst[:, None].astype(jnp.float32)
    wy = jnp.clip(ohf.T @ anchor.astype(jnp.float32),
                  0, Hp - WH).astype(jnp.int32)
    wc = jnp.clip(ohf.T @ c128.astype(jnp.float32),
                  0, Wp - 128).astype(jnp.int32)

    # --- rolled block canvases + coverage masks (f32 matmuls are exact:
    # pixel values < 2^24) ---
    cv = jnp.pad(blocks, ((0, 0), (0, WH - s), (0, 128 - s)))
    for b in range(s.bit_length() - 1, 7):                 # lane ladder
        sh = 1 << b
        cv = jnp.where((off & sh)[:, None, None] != 0,
                       jnp.roll(cv, sh, axis=2), cv)
    if s == 4:
        cv = jnp.where((rem == 4)[:, None, None],
                       jnp.roll(cv, 4, axis=1), cv)
    rr = jnp.arange(WH)[None, :, None]
    ll = jnp.arange(128)[None, None, :]
    mk = ((rr >= rem[:, None, None]) & (rr < (rem + s)[:, None, None]) &
          (ll >= off[:, None, None]) & (ll < (off + s)[:, None, None]) &
          valid[:, None, None])

    canvas = jnp.einsum("kw,kx->wx", oh,
                        cv.reshape(K, -1).astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    mcan = jnp.einsum("kw,kx->wx", oh,
                      mk.reshape(K, -1).astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    canvas = canvas.astype(jnp.int32).reshape(K, WH, 128)
    mcan = mcan.astype(jnp.int32).reshape(K, WH, 128)

    D = 4
    kern = functools.partial(_scatter_kernel, WH=WH, D=D, NW=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, WH, 128), lambda w, n, *_: (
                jnp.minimum(w, n[0] - 1), 0, 0)),
            pl.BlockSpec((1, WH, 128), lambda w, n, *_: (
                jnp.minimum(w, n[0] - 1), 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((D, WH, 128), jnp.int32),
                        pltpu.VMEM((D, WH, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, D))],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.maximum(nwin, 1).reshape(1), wy, wc, canvas, mcan, padded)
