"""tde265_compact_blocks (native sparse-upload compaction) vs numpy oracle.

The fused decoder's _sparse_upload used a numpy blocks.any() reduction
(~15 ms/frame at 1080p); the native scan must be byte-identical.
"""
import ctypes as ct

import numpy as np
import pytest

from libde265_tpu import _native
from libde265_tpu.fused_decode import FusedDecoder, _SPARSE_BLOCK


def _oracle(buf, total, B):
    nb = (total + B - 1) // B
    padded = buf if total == nb * B else np.pad(buf, (0, nb * B - total))
    blocks = padded.reshape(nb, B)
    nz = np.flatnonzero(blocks.any(axis=1))
    M = max(256, -(-len(nz) // 256) * 256)
    return blocks, nz, M


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy(seed):
    L = _native.lib()
    rng = np.random.default_rng(seed)
    for _ in range(20):
        total = int(rng.integers(1, 60000))
        B = int(rng.choice([64, 512, 1000]))
        buf = np.zeros(total, np.int32)
        k = int(rng.integers(0, 40))
        if k:
            buf[rng.integers(0, total, k)] = rng.integers(-9, 9, k)
        nb = (total + B - 1) // B
        cb = np.empty((nb + 256, B), np.int32)
        ix = np.empty(nb + 256, np.int32)
        M = L.tde265_compact_blocks(
            buf.ctypes.data_as(ct.c_void_p), total, B, 256,
            cb.ctypes.data_as(ct.c_void_p), ix.ctypes.data_as(ct.c_void_p),
            nb + 256)
        blocks, nz, Mref = _oracle(buf, total, B)
        assert M == Mref
        assert np.array_equal(cb[:len(nz)], blocks[nz])
        assert np.all(cb[len(nz):M] == 0)
        assert np.array_equal(ix[:len(nz)], nz)
        assert np.all(ix[len(nz):M] == 1 << 30)


def test_cap_overflow_returns_minus_one():
    L = _native.lib()
    buf = np.ones(4096, np.int32)
    cb = np.empty((4, 512), np.int32)
    ix = np.empty(4, np.int32)
    M = L.tde265_compact_blocks(
        buf.ctypes.data_as(ct.c_void_p), 4096, 512, 256,
        cb.ctypes.data_as(ct.c_void_p), ix.ctypes.data_as(ct.c_void_p), 4)
    assert M == -1


def test_pallas_expander_matches_xla():
    """_expand_blocks_pallas (interpret) vs the XLA scatter formulation."""
    from libde265_tpu.fused_decode import (_expand_blocks,
                                           _expand_blocks_pallas)
    import jax.numpy as jnp

    B = _SPARSE_BLOCK
    rng = np.random.default_rng(3)
    for total in (700 * B + 333, 300 * B):
        nb = (total + B - 1) // B
        nz = np.sort(rng.choice(nb, 40, replace=False)).astype(np.int32)
        M = 256
        cb = np.zeros((M, B), np.int32)
        cb[:len(nz)] = rng.integers(-99, 99, (len(nz), B))
        ix = np.full(M, 1 << 30, np.int32)
        ix[:len(nz)] = nz
        inv = np.full(nb, -1, np.int32)
        inv[nz] = np.arange(len(nz))
        ref = np.asarray(_expand_blocks(jnp.asarray(cb), jnp.asarray(ix),
                                        total=total, B=B))
        got = np.asarray(_expand_blocks_pallas(
            jnp.asarray(cb), jnp.asarray(inv), total=total, B=B,
            interpret=True))
        assert np.array_equal(got, ref)


def test_sparse_upload_roundtrip():
    """FusedDecoder._sparse_upload reassembles the exact buffer on device
    through the native compaction path."""
    import jax.numpy as jnp

    fd = FusedDecoder()
    fd._no_native_pack = False
    B = _SPARSE_BLOCK
    rng = np.random.default_rng(7)
    # nb must exceed the 256-block bucket for the expander path to engage
    # (smaller buffers take the dense upload)
    for total in (600 * B + 17, 40 * B):
        buf = np.zeros(total, np.int32)
        buf[rng.integers(0, total, 50)] = rng.integers(1, 99, 50)
        out = np.asarray(fd._sparse_upload(buf))
        assert out.shape == (total,)
        assert np.array_equal(out, buf)
