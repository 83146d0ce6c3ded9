"""Segment-(GOP-)level parallel decode across devices.

The reference has NO frame-level parallelism (an explicit TODO at
/root/reference/libde265/decctx.cc:768: threads beyond WPP/tiles emit a
warning).  The TPU-native story: an Annex-B stream is a sequence of
independently-decodable segments delimited by IRAP pictures with closed
prediction (IDR/BLA, optionally CRA when no leading pictures exist), so
for throughput serving the segments fan out across the mesh — one device
decodes one segment with its own HBM DPB ring, all devices running
concurrently (XLA dispatch is async; each segment's work is committed to
its device).  Host-side CABAC parse fans out across threads the same way
(one decoder context per thread, the documented thread-safety contract).

Latency for a single stream is still served by the per-picture fused
program + tile sharding (sharded_decode.py); this module is the
throughput axis, and on a multi-host deployment the segment axis is the
natural DCN dimension (segments never communicate).
"""
from __future__ import annotations

import threading

import jax

from ..decoder import Decoder
from ..fused_decode import FusedDecoder

_IRAP_FIRST = 16        # BLA_W_LP
_IRAP_LAST = 23
_IDR_TYPES = (19, 20)
_BLA_TYPES = (16, 17, 18)
_CRA = 21
_PARAM_SETS = (32, 33, 34)  # VPS/SPS/PPS


def _nal_starts(data: bytes):
    out, i = [], 0
    while True:
        i = data.find(b"\x00\x00\x01", i)
        if i < 0:
            return out
        # include a preceding zero byte (4-byte start code) in the unit
        begin = i - 1 if i > 0 and data[i - 1] == 0 else i
        out.append((begin, i + 3))
        i += 3


def split_segments(data: bytes, split_at_cra: bool = False):
    """Split at closed-prediction IRAP boundaries; each segment is prefixed
    with every parameter set seen so far (so it decodes standalone)."""
    starts = _nal_starts(data)
    if not starts:
        return [data]
    segments = []
    headers = b""
    cur = b""
    for k, (begin, hdr) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else len(data)
        unit = data[begin:end]
        t = (data[hdr] >> 1) & 0x3F
        if t in _PARAM_SETS:
            headers += unit
            cur += unit
            continue
        boundary = t in _IDR_TYPES or t in _BLA_TYPES or \
            (split_at_cra and t == _CRA)
        if boundary and cur.strip(b"\x00"):
            has_vcl = any((cur[h] >> 1) & 0x3F < 32
                          for _, h in _nal_starts(cur))
            if has_vcl:
                segments.append(cur)
                cur = headers
        cur += unit
    if cur.strip(b"\x00") and any((cur[h] >> 1) & 0x3F < 32
                                  for _, h in _nal_starts(cur)):
        segments.append(cur)
    return segments


class GopParallelDecoder:
    """Decode IRAP-delimited segments concurrently, one device per segment
    (round-robin over ``devices``).

    Usage::
        gp = GopParallelDecoder(jax.devices())
        frames = gp.decode_stream(data)   # [(poc_order_index, planes), ...]
    """

    def __init__(self, devices=None, split_at_cra: bool = False):
        self.devices = list(devices) if devices is not None else jax.devices()
        self.split_at_cra = split_at_cra

    def decode_stream(self, data: bytes):
        segs = split_segments(data, self.split_at_cra)
        n = len(segs)
        progs_per_seg = [None] * n

        def parse(i):
            dec = Decoder(parse_only=True, keep_programs=True)
            list(dec.decode_all(segs[i]))
            progs_per_seg[i] = [dec.get_program(k)
                                for k in range(dec.num_programs())]

        threads = [threading.Thread(target=parse, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # dispatch every segment's frame programs, committed to its device;
        # devices execute concurrently (async dispatch)
        outs_per_seg = [None] * n
        for i, progs in enumerate(progs_per_seg):
            dev = self.devices[i % len(self.devices)]
            with jax.default_device(dev):
                fd = FusedDecoder()
                fd.plan_stream(progs)
                outs_per_seg[i] = [fd.decode(p) for p in progs]

        out = []
        for i in range(n):
            out.extend(outs_per_seg[i])
        return out
