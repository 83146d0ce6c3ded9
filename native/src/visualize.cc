// Bitstream-structure visualization overlays: CB/TB/PB grids, intra modes,
// QP heat map, motion vectors, slice/tile boundaries drawn onto an RGB
// buffer.  Capability counterpart of /root/reference/libde265/visualize.{h,cc}
// (the API used by sherlock265); consumed by tools/inspect265.py.
#include <cstring>

#include "tde265/de265.h"
#include "tde265/decoder.h"

using namespace tde265;

namespace {

inline void set_pixel(u8* rgb, int stride, int x, int y, u32 color) {
  u8* p = rgb + (size_t)y * stride + x * 3;
  p[0] = (u8)(color >> 16);
  p[1] = (u8)(color >> 8);
  p[2] = (u8)color;
}

void draw_rect(u8* rgb, int stride, int w, int h, int x0, int y0, int x1,
               int y1, u32 color) {
  x1 = min_i(x1, w - 1);
  y1 = min_i(y1, h - 1);
  for (int x = x0; x <= x1; x++) {
    set_pixel(rgb, stride, x, y0, color);
    set_pixel(rgb, stride, x, y1, color);
  }
  for (int y = y0; y <= y1; y++) {
    set_pixel(rgb, stride, x0, y, color);
    set_pixel(rgb, stride, x1, y, color);
  }
}

void draw_line(u8* rgb, int stride, int w, int h, int x0, int y0, int x1,
               int y1, u32 color) {
  int dx = abs_i(x1 - x0), dy = -abs_i(y1 - y0);
  int sx = x0 < x1 ? 1 : -1, sy = y0 < y1 ? 1 : -1;
  int err = dx + dy;
  while (true) {
    if (x0 >= 0 && x0 < w && y0 >= 0 && y0 < h)
      set_pixel(rgb, stride, x0, y0, color);
    if (x0 == x1 && y0 == y1) break;
    int e2 = 2 * err;
    if (e2 >= dy) { err += dy; x0 += sx; }
    if (e2 <= dx) { err += dx; y0 += sy; }
  }
}

const Frame* F(const de265_image* img) {
  return reinterpret_cast<const Frame*>(img);
}

// visible (conformance-cropped) luma dimensions — the overlay buffer the
// caller provides is sized to the output picture
void vis_dims(const Frame* f, int* w, int* h) {
  const Sps& s = *f->sps;
  *w = f->width - (s.conf_win_left + s.conf_win_right) * s.sub_width_c;
  *h = f->height - (s.conf_win_top + s.conf_win_bottom) * s.sub_height_c;
}

// Walk the per-4x4 metadata and emit one rectangle per CU (detected as
// maximal runs of equal ct_depth anchored at their top-left).
template <typename Fn>
void for_each_cu(const Frame* f, Fn&& fn) {
  const Sps& sps = *f->sps;
  int min_cb = 1 << sps.log2_min_cb_size;
  for (int y = 0; y < f->height; y += min_cb)
    for (int x = 0; x < f->width; x += min_cb) {
      int depth = f->ct_depth[(y >> 2) * f->pb_w + (x >> 2)];
      int size = sps.ctb_size >> depth;
      if ((x & (size - 1)) == 0 && (y & (size - 1)) == 0) fn(x, y, size);
    }
}

}  // namespace

extern "C" {

LIBDE265_API void tde265_draw_CB_grid(const de265_image* img, uint8_t* rgb,
                                      int stride, uint32_t color) {
  const Frame* f = F(img);
  int vw, vh;
  vis_dims(f, &vw, &vh);
  for_each_cu(f, [&](int x, int y, int size) {
    draw_rect(rgb, stride, vw, vh, x, y, x + size - 1,
              y + size - 1, color);
  });
}

LIBDE265_API void tde265_draw_TB_grid(const de265_image* img, uint8_t* rgb,
                                      int stride, uint32_t color) {
  // TU edges were recorded per 4x4 during parsing (deblock_flags bits 0/1).
  const Frame* f = F(img);
  int vw, vh;
  vis_dims(f, &vw, &vh);
  for (int y4 = 0; y4 < f->pb_h; y4++)
    for (int x4 = 0; x4 < f->pb_w; x4++) {
      u8 fl = f->deblock_flags[y4 * f->pb_w + x4];
      if (fl & 1)
        for (int k = 0; k < 4 && y4 * 4 + k < vh; k++)
          set_pixel(rgb, stride, x4 * 4, y4 * 4 + k, color);
      if (fl & 2)
        for (int k = 0; k < 4 && x4 * 4 + k < vw; k++)
          set_pixel(rgb, stride, x4 * 4 + k, y4 * 4, color);
    }
}

LIBDE265_API void tde265_draw_PB_grid(const de265_image* img, uint8_t* rgb,
                                      int stride, uint32_t color) {
  const Frame* f = F(img);
  int vw, vh;
  vis_dims(f, &vw, &vh);
  for (int y4 = 0; y4 < f->pb_h; y4++)
    for (int x4 = 0; x4 < f->pb_w; x4++) {
      u8 fl = f->deblock_flags[y4 * f->pb_w + x4];
      if (fl & 4)
        for (int k = 0; k < 4 && y4 * 4 + k < vh; k++)
          set_pixel(rgb, stride, x4 * 4, y4 * 4 + k, color);
      if (fl & 8)
        for (int k = 0; k < 4 && x4 * 4 + k < vw; k++)
          set_pixel(rgb, stride, x4 * 4 + k, y4 * 4, color);
    }
}

LIBDE265_API void tde265_draw_intra_pred_modes(const de265_image* img,
                                               uint8_t* rgb, int stride,
                                               uint32_t color) {
  // short direction strokes per intra 8x8 block following the angular mode
  const Frame* f = F(img);
  int vw, vh;
  vis_dims(f, &vw, &vh);
  for (int y4 = 0; y4 < f->pb_h; y4 += 2)
    for (int x4 = 0; x4 < f->pb_w; x4 += 2) {
      if (!(f->cu_info[y4 * f->pb_w + x4] & 1)) continue;
      int mode = f->intra_pred_mode[y4 * f->pb_w + x4];
      int cx = x4 * 4 + 4, cy = y4 * 4 + 4;
      if (mode <= 1) {
        set_pixel(rgb, stride, min_i(cx, vw - 1),
                  min_i(cy, vh - 1), color);
        continue;
      }
      // map mode to a direction (approximate angular direction)
      int a = mode - 18;  // -16..16
      int dx = (a >= 0) ? 4 : -(a + 16) / 4;
      int dy = (a >= 0) ? -(16 - a) / 4 : 4;
      draw_line(rgb, stride, vw, vh, cx, cy, cx + dx, cy + dy,
                color);
    }
}

LIBDE265_API void tde265_draw_QuantPY(const de265_image* img, uint8_t* rgb,
                                      int stride) {
  const Frame* f = F(img);
  int vw, vh;
  vis_dims(f, &vw, &vh);
  for (int y = 0; y < vh; y++)
    for (int x = 0; x < vw; x++) {
      int qp = f->qp_y[(y >> 2) * f->pb_w + (x >> 2)];
      u8 v = (u8)clip3(0, 255, qp * 5);
      set_pixel(rgb, stride, x, y, (u32)(v << 16 | v << 8 | v));
    }
}

LIBDE265_API void tde265_draw_Motion(const de265_image* img, uint8_t* rgb,
                                     int stride) {
  const Frame* f = F(img);
  int vw, vh;
  vis_dims(f, &vw, &vh);
  for (int y4 = 0; y4 < f->pb_h; y4 += 2)
    for (int x4 = 0; x4 < f->pb_w; x4 += 2) {
      const PbMotion& m = f->motion[y4 * f->pb_w + x4];
      if (m.intra) continue;
      int cx = x4 * 4 + 4, cy = y4 * 4 + 4;
      for (int l = 0; l < 2; l++) {
        if (!((m.pred_flags >> l) & 1)) continue;
        u32 color = l == 0 ? 0xFF4040 : 0x4040FF;
        draw_line(rgb, stride, vw, vh, cx, cy,
                  cx + m.mv[l].x / 4, cy + m.mv[l].y / 4, color);
      }
    }
}

LIBDE265_API void tde265_draw_Slices(const de265_image* img, uint8_t* rgb,
                                     int stride, uint32_t color) {
  const Frame* f = F(img);
  int vw, vh;
  vis_dims(f, &vw, &vh);
  int cs = f->sps->ctb_size;
  for (int cy = 0; cy < f->ctb_h; cy++)
    for (int cx = 0; cx < f->ctb_w; cx++) {
      i32 addr = f->slice_addr_rs[cy * f->ctb_w + cx];
      if (cx > 0 && f->slice_addr_rs[cy * f->ctb_w + cx - 1] != addr)
        for (int k = 0; k < cs && cy * cs + k < vh; k++)
          set_pixel(rgb, stride, cx * cs, cy * cs + k, color);
      if (cy > 0 && f->slice_addr_rs[(cy - 1) * f->ctb_w + cx] != addr)
        for (int k = 0; k < cs && cx * cs + k < vw; k++)
          set_pixel(rgb, stride, cx * cs + k, cy * cs, color);
    }
}

LIBDE265_API void tde265_draw_Tiles(const de265_image* img, uint8_t* rgb,
                                    int stride, uint32_t color) {
  const Frame* f = F(img);
  int vw, vh;
  vis_dims(f, &vw, &vh);
  const Pps& pps = *f->pps;
  int cs = f->sps->ctb_size;
  for (size_t i = 1; i + 1 < pps.col_bd.size(); i++)
    for (int y = 0; y < vh; y++)
      set_pixel(rgb, stride, pps.col_bd[i] * cs, y, color);
  for (size_t i = 1; i + 1 < pps.row_bd.size(); i++)
    for (int x = 0; x < vw; x++)
      set_pixel(rgb, stride, x, pps.row_bd[i] * cs, color);
}

}  // extern "C"
