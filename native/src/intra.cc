// Scalar intra-prediction backend (spec 8.4.4.2): reference-sample gathering
// with availability + substitution, smoothing filters, and the DC / planar /
// angular predictors.  Behavior counterpart of
// /root/reference/libde265/intrapred.{h,cc} + fallback-intrapred.cc.
#include <cstring>

#include "tde265/decoder.h"
#include "tde265/syntax.h"

namespace tde265 {

// intraPredAngle for modes 2..34 (spec Table 8-5) and invAngle (Table 8-6).
static const int kAngle[35] = {0,  0,  32,  26,  21,  17,  13,  9,   5,   2,
                               0,  -2, -5,  -9,  -13, -17, -21, -26, -32, -26,
                               -21, -17, -13, -9, -5,  -2,  0,   2,   5,   9,
                               13, 17, 21,  26,  32};
static const int kInvAngle[35] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                                  -4096, -1638, -910, -630, -482, -390, -315,
                                  -256,
                                  -315, -390, -482, -630, -910, -1638, -4096,
                                  0, 0, 0, 0, 0, 0, 0, 0, 0};

// border layout: b[2n] = corner p[-1][-1];
// b[2n-1-k] = left column p[-1][k], k=0..2n-1 (top to bottom);
// b[2n+1+k] = top row p[k][-1], k=0..2n-1.
template <typename pixel_t>
static void fill_border(const Frame& frame, int x0c, int y0c, int nT, int cidx,
                        pixel_t* border) {
  const Sps& sps = *frame.sps;
  int bd = frame.bit_depth[cidx];
  int sub_x = (cidx == 0) ? 1 : sps.sub_width_c;
  int sub_y = (cidx == 0) ? 1 : sps.sub_height_c;
  // luma coordinates of this block
  int xL = x0c * sub_x, yL = y0c * sub_y;
  int w = frame.plane_width(cidx), h = frame.plane_height(cidx);
  int stride = frame.stride[cidx];
  const pixel_t* img = reinterpret_cast<const pixel_t*>(frame.plane[cidx].data());

  const int n2 = 2 * nT;
  bool avail[4 * 64 + 1];  // availability per border sample
  bool any_avail = false;

  bool constrained = frame.pps->constrained_intra_pred;
  auto sample_avail = [&](int xc, int yc) {
    // channel coords -> luma coords for availability
    int xn = xc * sub_x, yn = yc * sub_y;
    if (!z_available(frame, xL, yL, xn, yn)) return false;
    if (constrained) {
      u8 info = frame.cu_info[(yn >> 2) * frame.pb_w + (xn >> 2)];
      if (!(info & 1)) return false;  // neighbor not intra-coded
    }
    return true;
  };

  // left column, bottom-up: border index 0 .. 2n-1 maps to left sample
  // p[-1][2n-1] .. p[-1][0].  Availability is constant per 4-luma-pel run
  // (min-TB granularity), so it is evaluated once per group.
  {
    int group_of = -1;  // (yc * sub_y) >> 2 of the cached decision
    bool ga = false;
    for (int k = 0; k < n2; k++) {
      int yc = y0c + n2 - 1 - k;  // sample row for border index k
      bool a;
      if (x0c <= 0 || yc >= h) {
        a = false;
      } else {
        int g = (yc * sub_y) >> 2;
        if (g != group_of) {
          group_of = g;
          ga = sample_avail(x0c - 1, yc);
        }
        a = ga;
      }
      avail[k] = a;
      if (a) {
        border[k] = img[yc * stride + (x0c - 1)];
        any_avail = true;
      }
    }
  }
  // corner
  {
    bool a = (x0c > 0 && y0c > 0) && sample_avail(x0c - 1, y0c - 1);
    avail[n2] = a;
    if (a) {
      border[n2] = img[(y0c - 1) * stride + (x0c - 1)];
      any_avail = true;
    }
  }
  // top row (availability per 4-luma-pel group, as above)
  {
    int group_of = -1;
    bool ga = false;
    for (int k = 0; k < n2; k++) {
      int xc = x0c + k;
      bool a;
      if (y0c <= 0 || xc >= w) {
        a = false;
      } else {
        int g = (xc * sub_x) >> 2;
        if (g != group_of) {
          group_of = g;
          ga = sample_avail(xc, y0c - 1);
        }
        a = ga;
      }
      avail[n2 + 1 + k] = a;
      if (a) {
        border[n2 + 1 + k] = img[(y0c - 1) * stride + xc];
        any_avail = true;
      }
    }
  }

  // substitution (spec 8.4.4.2.2)
  if (!any_avail) {
    pixel_t fill = (pixel_t)(1 << (bd - 1));
    for (int i = 0; i <= 4 * nT; i++) border[i] = fill;
    return;
  }
  if (!avail[0]) {
    // search upward for first available
    for (int i = 1; i <= 4 * nT; i++) {
      if (avail[i]) {
        border[0] = border[i];
        avail[0] = true;
        break;
      }
    }
  }
  for (int i = 1; i <= 4 * nT; i++) {
    if (!avail[i]) border[i] = border[i - 1];
  }
}

template <typename pixel_t>
static void filter_border(pixel_t* border, int nT, int bd,
                          bool strong_smoothing_enabled) {
  const int n2 = 2 * nT;
  pixel_t corner = border[n2];
  bool bi_int = false;
  if (strong_smoothing_enabled && nT == 32) {
    int threshold = 1 << (bd - 5);
    bool above_flat =
        abs_i((int)corner + border[n2 + 2 * nT] - 2 * border[n2 + nT]) < threshold;
    bool left_flat =
        abs_i((int)corner + border[0] - 2 * border[nT]) < threshold;
    bi_int = above_flat && left_flat;
  }
  pixel_t out[4 * 64 + 1];
  if (bi_int) {
    // bilinear interpolation (spec 8-30..8-34)
    out[n2] = corner;
    pixel_t bl = border[0];         // p[-1][63]
    pixel_t tr = border[4 * nT];    // p[63][-1]
    for (int i = 1; i < n2; i++)
      out[n2 - i] = (pixel_t)(((n2 - i) * (int)corner + i * (int)bl + 32) >> 6);
    out[0] = bl;
    for (int i = 1; i < n2; i++)
      out[n2 + i] = (pixel_t)(((n2 - i) * (int)corner + i * (int)tr + 32) >> 6);
    out[4 * nT] = tr;
  } else {
    // [1 2 1] filter (spec 8-35..8-36)
    out[0] = border[0];
    for (int i = 1; i < 4 * nT; i++)
      out[i] = (pixel_t)((border[i - 1] + 2 * border[i] + border[i + 1] + 2) >> 2);
    out[4 * nT] = border[4 * nT];
  }
  memcpy(border, out, sizeof(pixel_t) * (4 * nT + 1));
}

template <typename pixel_t>
static void predict_dc(pixel_t* dst, int stride, const pixel_t* border, int nT,
                       int cidx, int bd) {
  const int n2 = 2 * nT;
  int sum = 0;
  for (int i = 0; i < nT; i++) sum += border[n2 - 1 - i];  // left
  for (int i = 0; i < nT; i++) sum += border[n2 + 1 + i];  // top
  int dc = (sum + nT) >> (ilog2((u32)nT) + 1);

  for (int y = 0; y < nT; y++)
    for (int x = 0; x < nT; x++) dst[y * stride + x] = (pixel_t)dc;

  if (cidx == 0 && nT < 32) {
    dst[0] = (pixel_t)((border[n2 - 1] + 2 * dc + border[n2 + 1] + 2) >> 2);
    for (int x = 1; x < nT; x++)
      dst[x] = (pixel_t)((border[n2 + 1 + x] + 3 * dc + 2) >> 2);
    for (int y = 1; y < nT; y++)
      dst[y * stride] = (pixel_t)((border[n2 - 1 - y] + 3 * dc + 2) >> 2);
  }
  (void)bd;
}

template <typename pixel_t>
static void predict_planar(pixel_t* dst, int stride, const pixel_t* border,
                           int nT) {
  const int n2 = 2 * nT;
  int lg = ilog2((u32)nT);
  pixel_t tr = border[n2 + 1 + nT];  // p[nT][-1]
  pixel_t bl = border[n2 - 1 - nT];  // p[-1][nT]
  for (int y = 0; y < nT; y++) {
    pixel_t left = border[n2 - 1 - y];
    for (int x = 0; x < nT; x++) {
      pixel_t top = border[n2 + 1 + x];
      dst[y * stride + x] =
          (pixel_t)(((nT - 1 - x) * left + (x + 1) * tr + (nT - 1 - y) * top +
                     (y + 1) * bl + nT) >>
                    (lg + 1));
    }
  }
}

template <typename pixel_t>
static void predict_angular(pixel_t* dst, int stride, const pixel_t* border,
                            int nT, int mode, int cidx, int bd,
                            bool disable_edge_filter) {
  const int n2 = 2 * nT;
  int angle = kAngle[mode];
  pixel_t ref_buf[4 * 64 + 1];
  const pixel_t* ref;  // ref[0] = p[-1][-1] equivalent; indexed ref[x], x>=...

  if (mode >= 18) {
    // vertical-ish: project top row
    pixel_t* r = ref_buf + 2 * 64;
    for (int x = 0; x <= nT; x++) r[x] = border[n2 + x];  // r[0]=corner
    if (angle < 0) {
      int min_idx = (nT * angle) >> 5;
      if (min_idx < -1) {
        for (int x = -1; x >= min_idx; x--) {
          int off = ((x * kInvAngle[mode] + 128) >> 8);
          r[x] = border[n2 - off];  // p[-1][off-1]: border[n2 - off]
        }
      }
    } else {
      for (int x = nT + 1; x <= 2 * nT; x++) r[x] = border[n2 + x];
    }
    ref = r;
    for (int y = 0; y < nT; y++) {
      int idx = ((y + 1) * angle) >> 5;
      int fact = ((y + 1) * angle) & 31;
      for (int x = 0; x < nT; x++) {
        int v;
        if (fact) {
          v = ((32 - fact) * ref[x + idx + 1] + fact * ref[x + idx + 2] + 16) >> 5;
        } else {
          v = ref[x + idx + 1];
        }
        dst[y * stride + x] = (pixel_t)v;
      }
    }
    if (mode == 26 && cidx == 0 && nT < 32 && !disable_edge_filter) {
      for (int y = 0; y < nT; y++) {
        int v = border[n2 + 1] + ((border[n2 - 1 - y] - (int)border[n2]) >> 1);
        dst[y * stride] = (pixel_t)clip_bd(v, bd);
      }
    }
  } else {
    // horizontal-ish: project left column
    pixel_t* r = ref_buf + 2 * 64;
    for (int x = 0; x <= nT; x++) r[x] = border[n2 - x];  // r[0]=corner, r[k]=left k-1
    if (angle < 0) {
      int min_idx = (nT * angle) >> 5;
      if (min_idx < -1) {
        for (int x = -1; x >= min_idx; x--) {
          int off = ((x * kInvAngle[mode] + 128) >> 8);
          r[x] = border[n2 + off];  // p[off-1][-1]
        }
      }
    } else {
      for (int x = nT + 1; x <= 2 * nT; x++) r[x] = border[n2 - x];
    }
    ref = r;
    for (int x = 0; x < nT; x++) {
      int idx = ((x + 1) * angle) >> 5;
      int fact = ((x + 1) * angle) & 31;
      for (int y = 0; y < nT; y++) {
        int v;
        if (fact) {
          v = ((32 - fact) * ref[y + idx + 1] + fact * ref[y + idx + 2] + 16) >> 5;
        } else {
          v = ref[y + idx + 1];
        }
        dst[y * stride + x] = (pixel_t)v;
      }
    }
    if (mode == 10 && cidx == 0 && nT < 32 && !disable_edge_filter) {
      for (int x = 0; x < nT; x++) {
        int v = border[n2 - 1] + ((border[n2 + 1 + x] - (int)border[n2]) >> 1);
        dst[x] = (pixel_t)clip_bd(v, bd);
      }
    }
  }
}

template <typename pixel_t>
static void execute_intra_t(const FrameProgram& prog, const IntraRec& rec) {
  Frame& frame = *prog.frame;
  const Sps& sps = *frame.sps;
  int nT = 1 << rec.log2_size;
  int cidx = rec.cidx;
  int bd = frame.bit_depth[cidx];
  int mode = rec.mode;

  pixel_t border[4 * 64 + 1];
  fill_border<pixel_t>(frame, rec.x, rec.y, nT, cidx, border);

  // smoothing filter decision (spec 8.4.4.2.3)
  bool filter = false;
  if (cidx == 0 && !sps.intra_smoothing_disabled) {
    if (mode != 1 && nT != 4) {
      int min_dist = min_i(abs_i(mode - 26), abs_i(mode - 10));
      int thresh = (nT == 8) ? 7 : (nT == 16) ? 1 : 0;
      filter = (mode == 0) ? true : (min_dist > thresh);
      if (nT == 32 && mode == 0) filter = true;
    }
  } else if (cidx != 0 && sps.chroma_array_type == 3) {
    // 4:4:4 chroma follows luma filtering rules
    if (mode != 1 && nT != 4) {
      int min_dist = min_i(abs_i(mode - 26), abs_i(mode - 10));
      int thresh = (nT == 8) ? 7 : (nT == 16) ? 1 : 0;
      filter = (mode == 0) ? true : (min_dist > thresh);
    }
  }
  if (filter) {
    filter_border(border, nT, bd,
                  sps.strong_intra_smoothing_enabled && cidx == 0);
  }

  pixel_t* dst = reinterpret_cast<pixel_t*>(frame.plane[cidx].data()) +
                 (size_t)rec.y * frame.stride[cidx] + rec.x;
  int stride = frame.stride[cidx];

  // edge filters disabled for high bit depths per spec (disableIntraBoundaryFilter)
  bool disable_edge = false;

  if (mode == 0) {
    predict_planar(dst, stride, border, nT);
  } else if (mode == 1) {
    predict_dc(dst, stride, border, nT, cidx, bd);
  } else {
    predict_angular(dst, stride, border, nT, mode, cidx, bd, disable_edge);
  }
}

void execute_intra_scalar(const FrameProgram& prog, const IntraRec& rec) {
  if (prog.frame->bytes_pp == 1)
    execute_intra_t<u8>(prog, rec);
  else
    execute_intra_t<u16>(prog, rec);
}

}  // namespace tde265
