"""Which feed sections dominate the sparse-upload wire at 1080p/4K?
Maps nonzero sparse blocks back to layout keys, and estimates the tunnel's
content sensitivity by counting nonzero BYTES too."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from libde265_tpu import Decoder
from libde265_tpu.fused_decode import FusedDecoder, _SPARSE_BLOCK

S = os.environ.get("S", "/tmp/bench1080.h265")
stream = open(S, "rb").read()
dec = Decoder(parse_only=True, keep_programs=True)
list(dec.decode_all(stream))
progs = [dec.get_program(i) for i in range(dec.num_programs())]
fd = FusedDecoder(); fd.use_pallas_mc = True
fd.plan_stream(progs)

B = _SPARSE_BLOCK
agg = {}
tot_blocks = 0
tot_nzbytes = 0
for i, p in enumerate(progs):
    slot = fd._alloc_slot(p.poc)
    refs, slot_map = fd._refs(p)
    dims = fd._stack_dims
    sr = np.array([slot * dims[c][0] for c in range(3)], np.int32)
    pk = fd._pack_native(p, slot_map, sr) or fd._pack_numpy(p, slot_map, sr)
    layout, buf, lgs, ns = pk
    nb = (buf.size + B - 1) // B
    padded = np.pad(buf, (0, nb * B - buf.size))
    blocks = padded.reshape(nb, B)
    nzb = np.flatnonzero(blocks.any(axis=1))
    tot_blocks += len(nzb)
    # nonzero bytes (what a zero-squashing tunnel would move)
    bb = padded.view(np.uint8)
    tot_nzbytes += int(np.count_nonzero(bb))
    # map nonzero blocks to sections
    offs = np.array([off for (k, off, shp) in layout])
    keys = [k for (k, off, shp) in layout]
    sec = np.searchsorted(offs, nzb * B, side="right") - 1
    for s_i in sec:
        k = keys[s_i]
        k = k.split(".")[0]
        agg[k] = agg.get(k, 0) + B * 4
n = len(progs)
print(f"{S}: {n} frames, wire {tot_blocks*B*4/n/1e6:.2f} MB/frame (2KB blocks)"
      f", nonzero bytes {tot_nzbytes/n/1e6:.2f} MB/frame"
      f", stream {len(stream)/n/1e3:.0f} KB/frame")
for k, v in sorted(agg.items(), key=lambda x: -x[1]):
    print(f"  {k:>12}: {v/n/1e6:6.3f} MB/frame")
