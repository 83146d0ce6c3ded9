"""Python C-API binding tests: decode girlshy through ctypes and check the
golden MD5 + the FrameProgram tensor export."""
import hashlib

import numpy as np

from libde265_tpu import Decoder

STREAM = "/root/reference/testdata/girlshy.h265"
GOLDEN_MD5 = "b81538fa33a67278e5263e231e43ca98"


def test_decode_all_md5(native_build):
    dec = Decoder()
    data = open(STREAM, "rb").read()
    md5 = hashlib.md5()
    n = 0
    for pic in dec.decode_all(data):
        assert pic.planes[0].shape == (240, 316)
        for p in pic.planes:
            md5.update(p.tobytes())
        n += 1
    assert n == 75
    assert md5.hexdigest() == GOLDEN_MD5


def test_program_export(native_build):
    dec = Decoder(keep_programs=True)
    data = open(STREAM, "rb").read()
    list(dec.decode_all(data))
    assert dec.num_programs() == 75
    p0 = dec.get_program(0)  # the IDR frame
    assert p0.poc == 0
    assert p0.width == 320 and p0.height == 240
    assert len(p0.tus) > 0
    assert len(p0.intras) > 0
    assert len(p0.pus) == 0  # intra-only
    assert p0.coeff_val.shape == p0.coeff_pos.shape
    # ops reference valid records
    assert p0.ops["idx"].max() < max(len(p0.tus), len(p0.intras))
    # an inter frame
    p1 = dec.get_program(1)
    assert len(p1.pus) > 0
    assert len(p1.ref_planes) >= 1
    assert p1.ref_planes[0][0].shape == (240, 320)
    # TU record sanity: sizes within 4..32, channel coords in range
    assert np.all(np.isin(p0.tus["log2_size"], [2, 3, 4, 5]))
    assert p0.tus["x"].max() < 320
