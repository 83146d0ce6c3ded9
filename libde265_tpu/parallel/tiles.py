"""Tile-parallel execution of the pixel pipeline over a device mesh.

Design: HEVC tiles exist to give encoders/decoders independent regions; on a
TPU mesh the same independence becomes sharding.  The two deblocking passes
have orthogonal dependence directions:

- vertical-edge pass: every image row is independent  -> shard rows
- horizontal-edge pass: every image column is independent -> shard columns

so a picture is processed as: row-sharded V pass, a resharding constraint
(XLA lowers it to an all-to-all over ICI), column-sharded H pass.  SAO is
elementwise with a 1-sample halo (left replicated inside each shard; exact
cross-shard halos are a round-2 refinement of this module).  TU residual and
MC batches are embarrassingly data-parallel over records.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.deblock import _luma_pass


def make_mesh(n_devices: int | None = None, axis: str = "tiles",
              devices=None) -> Mesh:
    """Build a 1-D device mesh.

    `devices` may be passed explicitly (e.g. ``jax.devices("cpu")``); when it
    is None and the ambient platform cannot supply ``n_devices`` devices, we
    fall back to the host-CPU backend so that multi-chip dry runs work on a
    machine with a single accelerator (or a broken one).
    """
    if devices is None:
        try:
            devices = jax.devices()
        except Exception:
            devices = []
        if n_devices is not None and len(devices) < n_devices:
            try:
                devices = jax.devices("cpu")
            except Exception:
                pass
    n = n_devices or len(devices)
    if len(devices) < n:
        raise RuntimeError(
            f"need {n} devices, have {len(devices)}; set "
            f"JAX_PLATFORMS=cpu with "
            f"--xla_force_host_platform_device_count={n}")
    return Mesh(np.array(devices[:n]), (axis,))


def shard_residual_batch(mesh: Mesh, levels, fact, tskip, use_dst):
    """Place a TU residual batch data-parallel over the mesh."""
    sh = NamedSharding(mesh, P("tiles"))
    return (jax.device_put(levels, sh), jax.device_put(fact, sh),
            jax.device_put(tskip, sh), jax.device_put(use_dst, sh))


def sharded_filter_pipeline(mesh: Mesh):
    """Returns a jitted fn applying V then H deblock passes with tile
    sharding and an explicit resharding collective between them.

    The function signature matches `_luma_pass` twice:
      fn(img_padded, v_params..., h_params...) -> filtered image
    where img_padded is [H, W+8] with the picture at columns [4, W+4).
    """
    row_spec = NamedSharding(mesh, P("tiles", None))
    col_spec = NamedSharding(mesh, P(None, "tiles"))

    def fn(img, bs_v, beta_v, tc_v, nop_v, noq_v, bs_h, beta_h, tc_h, nop_h,
           noq_h):
        img = jax.lax.with_sharding_constraint(img, row_spec)
        v = _luma_pass(img, bs_v, beta_v, tc_v, nop_v, noq_v, bit_depth=8)
        # reshard for the horizontal pass (ICI all-to-all)
        v = jax.lax.with_sharding_constraint(v, col_spec)
        h = _luma_pass(v.T, bs_h, beta_h, tc_h, nop_h, noq_h, bit_depth=8)
        return h.T

    return jax.jit(fn)
