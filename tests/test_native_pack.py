"""Byte-identity of the native C++ feed packer (feedpack.cc) against the
numpy packer: same layout, same buffer bytes, same watermark growth, for
every stream in the feature-matrix corpus plus girlshy.

The fused device program consumes one packed int32 buffer per frame;
the native packer must be indistinguishable from the numpy one or the
device paths would silently diverge."""
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from libde265_tpu import Decoder  # noqa: E402
from libde265_tpu.fused_decode import FusedDecoder  # noqa: E402

STREAMS = [
    "/root/reference/testdata/girlshy.h265",
    "/tmp/tde_corpus/gop_gpb.h265",
    "/tmp/tde_corpus/gop_2ref_tmvp.h265",
    "/tmp/tde_corpus/b_pyramid.h265",
    "/tmp/tde_corpus/weighted_pred.h265",
    "/tmp/tde_corpus/tiles_2x2.h265",
    "/tmp/tde_corpus/wpp.h265",
    "/tmp/tde_corpus/pcm.h265",
    "/tmp/tde_corpus/sao_scaling.h265",
    "/tmp/tde_corpus/lossless.h265",
    "/tmp/tde_corpus/amp_rect.h265",
    "/tmp/tde_corpus/main10.h265",
    "/tmp/tde_corpus/chroma422.h265",
    "/tmp/tde_corpus/slices.h265",
]


def _make_fd(native: bool):
    fd = FusedDecoder()
    fd.use_pallas_mc = True          # pack the production (TPU) layout
    fd._no_native_pack = not native
    return fd


@pytest.mark.parametrize("stream", STREAMS,
                         ids=[pathlib.Path(s).stem for s in STREAMS])
def test_pack_byte_identity(stream, native_build):
    path = pathlib.Path(stream)
    if not path.exists():
        pytest.skip(f"{stream} not generated")
    data = path.read_bytes()
    dec = Decoder(parse_only=True, keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert progs, "no programs decoded"

    fd_np = _make_fd(native=False)
    fd_nat = _make_fd(native=True)
    fd_np.plan_stream(progs)
    fd_nat.plan_stream(progs)
    assert fd_np.caps == fd_nat.caps, "plan_stream watermarks diverge"

    n_checked = 0
    for f, prog in enumerate(progs):
        if fd_np._exotic(prog):
            continue
        nrefs = min(len(prog.ref_pocs), 8)
        slot_map = {i: (i * 3) % 17 for i in range(nrefs)}
        slot_row = np.array([7, 11, 13], np.int32)
        ln, bn, lgs_n, ns_n = fd_np._pack_numpy(prog, slot_map, slot_row)
        pk = fd_nat._pack_native(prog, slot_map, slot_row)
        assert pk is not None, f"native pack unavailable (frame {f})"
        lv, bv, lgs_v, ns_v = pk
        assert lgs_n == lgs_v and ns_n == ns_v, f"frame {f} meta"
        assert ln == lv, f"frame {f} layout diverges"
        if not np.array_equal(bn, bv):
            for (k, off, shp) in ln:
                n = int(np.prod(shp))
                if not np.array_equal(bn[off:off + n], bv[off:off + n]):
                    raise AssertionError(
                        f"frame {f} key {k}: first diff at "
                        f"{np.nonzero(bn[off:off+n] != bv[off:off+n])[0][:5]}")
        assert fd_np.caps == fd_nat.caps, f"frame {f} watermarks diverge"
        assert fd_np._use_l1 == fd_nat._use_l1
        n_checked += 1
    assert n_checked > 0
