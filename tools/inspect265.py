#!/usr/bin/env python3
"""inspect265 — bitstream structure inspector (sherlock265 counterpart).

Decodes a stream and writes per-frame PPM images with overlay layers drawn by
the native visualization API (native/src/visualize.cc): CB/TB/PB grids,
intra modes, motion vectors, QP map, slices, tiles.

Usage:
  tools/inspect265.py stream.h265 --out /tmp/frames --layers cb,pb,mv -f 5
"""
import argparse
import ctypes as ct
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from libde265_tpu._native import lib


LAYERS = {
    "cb": ("tde265_draw_CB_grid", 0x00FF40),
    "tb": ("tde265_draw_TB_grid", 0xFFFF00),
    "pb": ("tde265_draw_PB_grid", 0x00C0FF),
    "intra": ("tde265_draw_intra_pred_modes", 0xFF00FF),
    "slices": ("tde265_draw_Slices", 0xFF0000),
    "tiles": ("tde265_draw_Tiles", 0xFF8000),
}
SPECIAL = {"qp": "tde265_draw_QuantPY", "mv": "tde265_draw_Motion"}


def write_ppm(path, rgb):
    h, w, _ = rgb.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(rgb.tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream")
    ap.add_argument("--out", default="/tmp/inspect265")
    ap.add_argument("--layers", default="cb,mv")
    ap.add_argument("-f", "--frames", type=int, default=4)
    args = ap.parse_args()

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    layers = args.layers.split(",")

    L = lib()
    for name, _ in LAYERS.values():
        getattr(L, name).argtypes = [ct.c_void_p, ct.c_void_p, ct.c_int,
                                     ct.c_uint32]
    for name in SPECIAL.values():
        getattr(L, name).argtypes = [ct.c_void_p, ct.c_void_p, ct.c_int]

    ctx = L.de265_new_decoder()
    data = open(args.stream, "rb").read()
    buf = ct.create_string_buffer(data, len(data))
    L.de265_push_data(ctx, buf, len(data), 0, None)
    L.de265_flush_data(ctx)

    n = 0
    more = ct.c_int(1)
    while more.value and n < args.frames:
        more.value = 0
        L.de265_decode(ctx, ct.byref(more))
        while n < args.frames:
            img = L.de265_peek_next_picture(ctx)
            if not img:
                break
            w = L.de265_get_image_width(img, 0)
            h = L.de265_get_image_height(img, 0)
            stride = ct.c_int()
            yptr = L.de265_get_image_plane(img, 0, ct.byref(stride))
            ybuf = (ct.c_uint8 * (stride.value * h)).from_address(yptr)
            y = np.frombuffer(ybuf, dtype=np.uint8).reshape(h, stride.value)[:, :w]
            rgb = np.repeat(y[:, :, None], 3, axis=2).copy()
            rgb_c = rgb.ctypes.data_as(ct.c_void_p)

            for layer in layers:
                if layer in LAYERS:
                    fn, color = LAYERS[layer]
                    getattr(L, fn)(img, rgb_c, w * 3, color)
                elif layer in SPECIAL:
                    getattr(L, SPECIAL[layer])(img, rgb_c, w * 3)

            path = out / f"frame{n:04d}.ppm"
            write_ppm(path, rgb)
            print(f"wrote {path} ({','.join(layers)})")
            L.de265_release_next_picture(ctx)
            n += 1
    L.de265_free_decoder(ctx)


if __name__ == "__main__":
    main()
