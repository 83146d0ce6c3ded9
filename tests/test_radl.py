"""RADL leading pictures (open-GOP b-pyramid, radl=1).

With the `radl` encoder parameter the open-GOP leading picture is a
RADL_R that references ONLY its CRA (forward positive-delta RPS) — spec
7.4.2.2 forbids RADL from referencing anything preceding the IRAP in
decode order.  Unlike RASL, the decoder must decode AND output the RADL
even when playback tunes in at the CRA (reference counterpart: libde265
decctx leading-picture handling; RASL skip does not apply to RADL).
The differential corpus (radl_open_pyramid / radl_tune_in) additionally
diffs both cases against the reference decoder byte-for-byte.
"""
import numpy as np

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder

NAL_CRA, NAL_RADL_R, NAL_RASL_R = 21, 7, 9


def _nals(data):
    out, i = [], 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            return out
        out.append((j, (data[j + 3] >> 1) & 0x3F))
        i = j + 3


def _stream(n=10):
    rng = np.random.default_rng(5)
    h, w = 96, 160
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = ((xx + 5 * t) % 210 +
             rng.integers(0, 12, (h, w))).clip(0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 100 + 5 * t, np.uint8)
        cr = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, cb, cr))
    enc = Encoder(qp=30)
    enc.set_parameter("intra-period", 4)
    enc.set_parameter("b-pyramid", True)
    enc.set_parameter("open-gop", True)
    enc.set_parameter("radl", True)
    enc.set_parameter("sei-hash", True)
    s = b"".join(enc.encode(*f, pts=t) for t, f in enumerate(frames))
    return s + enc.finish(), frames


def test_radl_continuous_decode(native_build):
    s, frames = _stream()
    types = [t for _, t in _nals(s)]
    assert NAL_RADL_R in types and NAL_CRA in types
    assert NAL_RASL_R not in types  # radl=1 replaces the RASL variant
    dec = Decoder(check_hash=True)  # hash-verifies every decoded picture
    pics = list(dec.decode_all(s))
    assert len(pics) == len(frames)
    mids = [int(p.planes[1][0, 0]) for p in pics]
    want = [100 + 5 * t for t in range(len(frames))]
    assert all(abs(a - b) <= 4 for a, b in zip(mids, want)), mids


def test_radl_decoded_on_cra_tune_in(native_build):
    s, frames = _stream()
    head = b""
    for (off, t), (off2, _) in zip(_nals(s), _nals(s)[1:] + [(len(s), 0)]):
        if t in (32, 33, 34):
            head += s[off:off2]
    cra_off = next(off for off, t in _nals(s) if t == NAL_CRA)
    cut = head + s[cra_off:]
    dec = Decoder(check_hash=True)
    pics = list(dec.decode_all(cut))
    pocs_out = sorted(int(p.planes[1][0, 0]) for p in pics)
    # the RADL (display 3 of the cut GOP) MUST appear — it only
    # references the CRA, so tune-in decodes it (contrast test_rasl)
    assert any(abs(v - (100 + 5 * 3)) <= 4 for v in pocs_out), pocs_out
    # GOPs of 4 starting at the CRA: displays 3..9 = 7 pictures
    assert len(pics) == len(frames) - 3
