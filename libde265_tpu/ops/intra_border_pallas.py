"""Pallas TPU kernels for the intra super-wave's plane access.

The wave step's two full-plane operations lower catastrophically through
XLA on TPU (measured ~0.4 ms for the [K, 4s+1] border gather and a
similar cost for the [K, s, s] block scatter at 1080p — together most of
the ~0.5 ms/step that makes I-frames slow).  Both are streams of tiny
rectangular copies, which is exactly what the DMA engines want:

  * border_gather: per block, ONE contiguous [1, 2s+1] corner+top-row
    read and ONE strided [2s, 1] left-column read.  Columns land
    lane-minor in a [2s, K] output so the kernel never transposes; the
    caller folds the two pieces into the spec's border vector with a
    couple of cheap XLA ops on [K, ~4s] arrays.
  * block_scatter: per block, one [s, s] VMEM->HBM rectangle write into
    the plane (aliased in/out, so the 8 MB plane is never copied).

The caller runs the scan on a PADDED plane (1 sample left/top, 2s+1
right/bottom) so every border read is in-bounds without per-sample
clamping; out-of-picture samples read padding garbage, which is fine
because the substitution chain (8.4.4.2.2) replaces exactly those.
Bit-exact counterparts of the gather/scatter lines in
fused_decode._wave_body; reference behavior: intrapred.cc border
construction in /root/reference/libde265.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 8        # blocks in flight per DMA group
PAD_LT = 1   # padding left/top of the scan plane
PAD_RB = 72  # padding right/bottom (>= 2*32 + alignment slack)


def pad_plane_for_scan(plane):
    """Pad a recon plane for the in-scan kernels (left/top 1, right and
    bottom PAD_RB).  Content of the padding is never consumed: border
    positions that land there are substitution-replaced."""
    return jnp.pad(plane, ((PAD_LT, PAD_RB), (PAD_LT, PAD_RB)))


def unpad_plane(padded):
    return padded[PAD_LT:-PAD_RB, PAD_LT:-PAD_RB]


def _gather_kernel(y0s, x0s, plane, tops, lefts, sem, *, s, K, Hp, Wp):
    # y0s/x0s are PADDED-plane block origins (>= 1 for real blocks);
    # padded/invalid records are clamped into range — their values are
    # substitution-replaced downstream
    n2 = 2 * s

    def org(k):
        ys = jnp.clip(y0s[k], 0, Hp - n2 - 1)
        xs = jnp.clip(x0s[k], 0, Wp - n2 - 2)
        return ys, xs

    def top_dma(i, k):
        ys, xs = org(k)
        return pltpu.make_async_copy(
            plane.at[pl.ds(ys - 1, 1), pl.ds(xs - 1, n2 + 1)],
            tops.at[pl.ds(k, 1), pl.ds(0, n2 + 1)], sem.at[0, i])

    def left_dma(i, k):
        ys, xs = org(k)
        return pltpu.make_async_copy(
            plane.at[pl.ds(ys, n2), pl.ds(xs - 1, 1)],
            lefts.at[pl.ds(0, n2), pl.ds(k, 1)], sem.at[1, i])

    ngroups = (K + G - 1) // G

    def body(j, _):
        for i in range(G):
            k = jnp.minimum(j * G + i, K - 1)
            top_dma(i, k).start()
            left_dma(i, k).start()
        for i in range(G):
            k = jnp.minimum(j * G + i, K - 1)
            top_dma(i, k).wait()
            left_dma(i, k).wait()
        return 0

    jax.lax.fori_loop(0, ngroups, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("s", "interpret"))
def border_gather(padded, y0p, x0p, *, s: int, interpret: bool = False):
    """Raw border samples of K same-size blocks from the padded plane.

    y0p/x0p: block origins in padded coordinates.  Returns
    (tops [K, 2s+1]: corner then top row left->right,
     lefts [2s, K]: left column top->bottom)."""
    K = y0p.shape[0]
    Hp, Wp = padded.shape
    n2 = 2 * s
    LP = ((n2 + 1 + 127) // 128) * 128
    Kp = ((K + 7) // 8) * 8
    KL = ((K + 127) // 128) * 128
    kern = functools.partial(_gather_kernel, s=s, K=K, Hp=Hp, Wp=Wp)
    tops, lefts = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((2, G))],
        ),
        out_shape=(jax.ShapeDtypeStruct((Kp, LP), jnp.int32),
                   jax.ShapeDtypeStruct((n2, KL), jnp.int32)),
        interpret=interpret,
    )(y0p, x0p, padded)
    return tops[:K, :n2 + 1], lefts[:, :K]


def _scatter_kernel(y0s, x0s, nvalid, blocks, plane_in, plane_out, sem, *,
                    s, K):
    del plane_in  # aliased with plane_out
    n = nvalid[0]

    def dma(i, k):
        return pltpu.make_async_copy(
            blocks.at[k],
            plane_out.at[pl.ds(y0s[k], s), pl.ds(x0s[k], s)],
            sem.at[i])

    ngroups = (K + G - 1) // G

    def body(j, _):
        for i in range(G):
            k = j * G + i

            @pl.when(k < n)
            def _():
                dma(i, jnp.minimum(k, K - 1)).start()
        for i in range(G):
            k = j * G + i

            @pl.when(k < n)
            def _():
                dma(i, jnp.minimum(k, K - 1)).wait()
        return 0

    jax.lax.fori_loop(0, ngroups, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("s", "interpret"),
                   donate_argnums=(0,))
def block_scatter(padded, blocks, y0p, x0p, nvalid, *, s: int,
                  interpret: bool = False):
    """Write the first `nvalid` reconstructed [s, s] blocks into the
    padded plane in place (valid blocks are slot-ordered first in a wave
    step, so a count suffices for the drop semantics)."""
    K = blocks.shape[0]
    Hp, Wp = padded.shape
    kern = functools.partial(_scatter_kernel, s=s, K=K)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((G,))],
        ),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(y0p, x0p, nvalid, blocks, padded)
