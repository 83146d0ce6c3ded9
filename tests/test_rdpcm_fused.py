"""RDPCM residuals on the fused device path.

No encoder here emits RDPCM (it is an RExt decode-side feature:
reference sps_range_extension implicit/explicit_rdpcm_enabled,
native/src/residual.cc:166-180), so coverage is by implementation
equivalence: TU_RDPCM flags are injected into a really-decoded program
and the fused in-graph path (masked cumsum over bin_res,
fused_decode has_rdpcm section) must match the host pipeline's explicit
per-TU RDPCM loop (pipeline.compute_residuals) on every plane.
"""
import numpy as np

from libde265_tpu import Decoder, Encoder, pipeline
from libde265_tpu.decoder import (TU_RDPCM, TU_RDPCM_VERTICAL,
                                  TU_TQ_BYPASS, TU_TRANSFORM_SKIP)
from libde265_tpu.fused_decode import FusedDecoder


def _staircase(w=64, h=64):
    y = np.zeros((h, w), int)
    lvl = 20
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            lvl += 3
            y[by:by + 8, bx:bx + 8] = lvl
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    cr = np.full((h // 2, w // 2), 90, np.uint8)
    return y.clip(0, 255).astype(np.uint8), cb, cr


def _prog_with_rdpcm(lossless):
    y, cb, cr = _staircase()
    with Encoder(qp=27) as enc:
        if lossless:
            enc.set_parameter("lossless", True)
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(stream))
    prog = dec.get_program(0)
    tus = prog.tus
    # inject RDPCM onto coded TUs: horizontal on even, vertical on odd;
    # for the lossy stream also force the transform-skip scaling path on
    # the 4x4 bins (explicit RDPCM only ever rides ts/bypass TUs)
    sel = np.nonzero(tus["ncoeff"] > 0)[0]
    assert len(sel) > 8
    for i, t in enumerate(sel[::2]):
        tus["flags"][t] |= TU_RDPCM
        if i % 2:
            tus["flags"][t] |= TU_RDPCM_VERTICAL
        if not lossless and tus["log2_size"][t] == 2:
            tus["flags"][t] |= TU_TRANSFORM_SKIP
    flags = tus["flags"][sel[::2]]
    mask = TU_TQ_BYPASS | TU_TRANSFORM_SKIP
    assert ((flags & TU_RDPCM) != 0).any()
    if lossless:
        assert ((flags & mask) != 0).all()
    return prog


def test_rdpcm_fused_matches_pipeline():
    for lossless in (True, False):
        prog = _prog_with_rdpcm(lossless)
        want = pipeline.reconstruct(prog)
        fd = FusedDecoder()
        assert not fd._exotic(prog)
        fd.plan_stream([prog])
        assert fd._has_rdpcm
        got = fd.decode(prog)
        for c in range(3):
            assert np.array_equal(np.asarray(got[c]), np.asarray(want[c])), \
                (lossless, c)
