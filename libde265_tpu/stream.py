"""Overlapped streaming decode: host CABAC parse || feed pack || device run.

The reference overlaps slice decode with in-loop filtering across a frame
(/root/reference/libde265/decctx.cc:605-650) and parse with execute via its
thread pool.  The TPU-native counterpart has three pipeline stages with
different resources:

  1. native parse (C++, releases the GIL)  -> FrameProgram snapshots
  2. host feed packing (numpy)             -> one packed int32 buffer
  3. device program (async XLA dispatch)   -> HBM-resident planes

Stage 1 runs on a background thread pushing the bitstream through the
parse-only decoder; the main thread drains finished programs as they
appear (the native program list is mutex-guarded), packs and dispatches
them.  Stage 3 is asynchronous by construction — jit dispatch returns
futures — so the device executes frame N while the host packs N+1 and the
parser works further ahead.  Nothing blocks until the caller touches the
returned arrays.

Counterpart of the reference's decode pump + worker threads
(decctx.cc:564-650, 742-961).
"""
from __future__ import annotations

import threading
import time

from .decoder import Decoder
from .fused_decode import FusedDecoder


class PipelinedDecoder:
    """Stream decoder with parse/pack/execute overlap.

    Usage::
        pd = PipelinedDecoder()
        outs = pd.decode_stream(data)      # list of device plane tuples
        pd.warm(data)                      # optional: pre-compile first
    """

    def __init__(self, fused: FusedDecoder | None = None):
        self.fd = fused or FusedDecoder()

    def warm(self, data: bytes):
        """Parse + plan + decode once so the stream program is compiled and
        every capacity watermark is final (single compilation)."""
        dec = Decoder(parse_only=True, keep_programs=True)
        list(dec.decode_all(data))
        progs = [dec.get_program(i) for i in range(dec.num_programs())]
        self.fd.plan_stream(progs)
        for p in progs:
            self.fd.decode(p)
        self.reset()
        return len(progs)

    def reset(self):
        self.fd.dpb.clear()
        self.fd._order.clear()

    def decode_stream(self, data: bytes, chunk: int = 1 << 16,
                      on_frame=None):
        """Decode an Annex-B stream with all three stages overlapped.

        Returns the list of device plane tuples (undispatched only if
        on_frame consumed them).  on_frame(i, planes) is called per frame
        as its program is dispatched (planes are async device arrays).

        On a single-core host the parse thread CONTENDS with feed packing
        instead of overlapping it (BENCH_r04: e2e 8.58 < device 9.75 fps at
        1080p), so the pipeline drops to sequential parse-then-decode there.
        """
        import os
        if (os.cpu_count() or 1) < 2:
            dec = Decoder(parse_only=True, keep_programs=True)
            list(dec.decode_all(data))
            outs = []
            for i in range(dec.num_programs()):
                planes = self.fd.decode(dec.get_program(i))
                if on_frame is not None:
                    on_frame(i, planes)
                else:
                    outs.append(planes)
            return outs
        dec = Decoder(parse_only=True, keep_programs=True)
        done = threading.Event()
        err = []

        def parse():
            import ctypes as ct
            try:
                mv = memoryview(data)
                for off in range(0, len(data), chunk):
                    dec.push(bytes(mv[off:off + chunk]))
                dec.flush()
                # drive the decode pump (parse-only: programs are exported,
                # pictures carry no pixels and are released immediately)
                more = ct.c_int(1)
                while more.value:
                    more.value = 0
                    dec._lib.de265_decode(dec._ctx, ct.byref(more))
                    while dec._lib.de265_peek_next_picture(dec._ctx):
                        dec._lib.de265_release_next_picture(dec._ctx)
            except Exception as e:  # noqa: BLE001 - surfaced to caller
                err.append(e)
            finally:
                done.set()

        t = threading.Thread(target=parse, daemon=True)
        t.start()
        outs = []
        i = 0
        try:
            while True:
                n = dec.num_programs()
                while i < n:
                    prog = dec.get_program(i)
                    planes = self.fd.decode(prog)
                    if on_frame is not None:
                        on_frame(i, planes)
                    else:
                        outs.append(planes)
                    i += 1
                if done.is_set() and i == dec.num_programs():
                    break
                if i >= n:
                    time.sleep(0.0002)
        finally:
            t.join()
        if err:
            raise err[0]
        return outs
