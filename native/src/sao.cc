// Sample-adaptive-offset filter (spec 8.7.3): band and edge offsets per CTB.
// Behavior counterpart of /root/reference/libde265/sao.cc.  Per-CTB fast
// paths: boundary-safety is resolved by loop-bound clipping and the per-pixel
// slice/tile/lossless checks only run for CTBs that need them.
#include <cstring>
#include <vector>

#include "tde265/decoder.h"

namespace tde265 {

namespace {

// edge-offset neighbor deltas per SaoEoClass
static const int kEoDx[4][2] = {{-1, 1}, {0, 0}, {-1, 1}, {1, -1}};
static const int kEoDy[4][2] = {{0, 0}, {-1, 1}, {-1, 1}, {-1, 1}};
static const int kEdgeCat[5] = {1, 2, 0, 3, 4};

template <typename pixel_t>
void sao_plane(Frame& f, const FrameProgram& prog, int c,
               const std::vector<u8>& src_copy) {
  const Sps& sps = *f.sps;
  const Pps& pps = *f.pps;
  int bd = f.bit_depth[c];
  int maxv = (1 << bd) - 1;
  int w = f.plane_width(c), h = f.plane_height(c);
  int stride = f.stride[c];
  pixel_t* dst = reinterpret_cast<pixel_t*>(f.plane[c].data());
  const pixel_t* src = reinterpret_cast<const pixel_t*>(src_copy.data());

  int sub_x = (c == 0) ? 1 : sps.sub_width_c;
  int sub_y = (c == 0) ? 1 : sps.sub_height_c;
  int ctb_size_x = sps.ctb_size / sub_x;
  int ctb_size_y = sps.ctb_size / sub_y;

  // picture-wide lossless/PCM presence (skip map needed only if any)
  bool any_skip_cu = false;
  for (u8 v : f.cu_info) {
    if ((v & 4) || ((v & 2) && sps.pcm_loop_filter_disable)) {
      any_skip_cu = true;
      break;
    }
  }
  bool multi_slice_or_tiles =
      pps.tiles_enabled || prog.slices.size() > 1;

  for (int ctb_y = 0; ctb_y < f.ctb_h; ctb_y++) {
    for (int ctb_x = 0; ctb_x < f.ctb_w; ctb_x++) {
      int rs = ctb_y * f.ctb_w + ctb_x;
      const SaoParams& sao = f.sao[rs];
      int type = sao.type_idx[c];
      if (type == 0) continue;

      u16 sidx = f.slice_idx[rs];
      if (sidx >= prog.slices.size()) continue;
      const SliceHeader& sh = *prog.slices[sidx];

      int x0 = ctb_x * ctb_size_x, y0 = ctb_y * ctb_size_y;
      int x1 = min_i(x0 + ctb_size_x, w), y1 = min_i(y0 + ctb_size_y, h);

      // does this CTB need the per-pixel checked path?
      bool need_checks = any_skip_cu;
      if (multi_slice_or_tiles) {
        // neighbor CTBs in a different slice/tile with filtering disabled?
        for (int dy = -1; dy <= 1 && !need_checks; dy++)
          for (int dx = -1; dx <= 1; dx++) {
            int nx = ctb_x + dx, ny = ctb_y + dy;
            if (nx < 0 || ny < 0 || nx >= f.ctb_w || ny >= f.ctb_h) continue;
            int nrs = ny * f.ctb_w + nx;
            if (f.slice_addr_rs[nrs] != f.slice_addr_rs[rs]) {
              u16 nidx = f.slice_idx[nrs];
              if (!sh.loop_filter_across_slices ||
                  (nidx < prog.slices.size() &&
                   !prog.slices[nidx]->loop_filter_across_slices)) {
                need_checks = true;
                break;
              }
            }
            if (!pps.loop_filter_across_tiles && !pps.same_tile(rs, nrs)) {
              need_checks = true;
              break;
            }
          }
      }

      if (type == 1) {
        // --- band offset ---
        int shift = bd - 5;
        i16 band_offset[32];
        memset(band_offset, 0, sizeof(band_offset));
        for (int k = 0; k < 4; k++)
          band_offset[(sao.band_pos[c] + k) & 31] = sao.offset[c][k];
        for (int y = y0; y < y1; y++) {
          const pixel_t* s = src + (size_t)y * stride;
          pixel_t* d = dst + (size_t)y * stride;
          for (int x = x0; x < x1; x++) {
            if (need_checks) {
              int xl = x * sub_x, yl = y * sub_y;
              u8 info = f.cu_info[(yl >> 2) * f.pb_w + (xl >> 2)];
              if ((info & 4) || ((info & 2) && sps.pcm_loop_filter_disable))
                continue;
            }
            int off = band_offset[s[x] >> shift];
            if (off) d[x] = (pixel_t)clip3(0, maxv, s[x] + off);
          }
        }
      } else {
        // --- edge offset ---
        int eo = sao.eo_class[c];
        int dx0 = kEoDx[eo][0], dx1 = kEoDx[eo][1];
        int dy0 = kEoDy[eo][0], dy1 = kEoDy[eo][1];
        // clip loop bounds so neighbor reads stay inside the picture
        int xs = max_i(x0, max_i(-dx0, -dx1));
        int xe = min_i(x1, w - max_i(0, max_i(dx0, dx1)));
        int ys = max_i(y0, max_i(-dy0, -dy1));
        int ye = min_i(y1, h - max_i(0, max_i(dy0, dy1)));
        const i16* offs = sao.offset[c];
        // branchless per-edge-index offsets (index 2 = category 0 = no-op);
        // the unconditional store keeps the loop autovectorizable
        const int eo_off[5] = {offs[0], offs[1], 0, offs[2], offs[3]};
        for (int y = ys; y < ye; y++) {
          const pixel_t* s = src + (size_t)y * stride;
          const pixel_t* sa = src + (size_t)(y + dy0) * stride + dx0;
          const pixel_t* sb = src + (size_t)(y + dy1) * stride + dx1;
          pixel_t* d = dst + (size_t)y * stride;
          if (!need_checks) {
            for (int x = xs; x < xe; x++) {
              int v = s[x];
              int edge_idx = 2 + sign3(v - sa[x]) + sign3(v - sb[x]);
              d[x] = (pixel_t)clip3(0, maxv, v + eo_off[edge_idx]);
            }
          } else {
            for (int x = xs; x < xe; x++) {
              int xl = x * sub_x, yl = y * sub_y;
              u8 info = f.cu_info[(yl >> 2) * f.pb_w + (xl >> 2)];
              if ((info & 4) || ((info & 2) && sps.pcm_loop_filter_disable))
                continue;
              auto neighbor_ok = [&](int xn, int yn) {
                int rs_n = ((yn * sub_y) >> sps.log2_ctb_size) * f.ctb_w +
                           ((xn * sub_x) >> sps.log2_ctb_size);
                if (rs_n == rs) return true;
                if (f.slice_addr_rs[rs_n] != f.slice_addr_rs[rs]) {
                  if (!sh.loop_filter_across_slices) return false;
                  u16 nidx = f.slice_idx[rs_n];
                  if (nidx < prog.slices.size() &&
                      !prog.slices[nidx]->loop_filter_across_slices)
                    return false;
                }
                if (!pps.loop_filter_across_tiles && !pps.same_tile(rs, rs_n))
                  return false;
                return true;
              };
              if (!neighbor_ok(x + dx0, y + dy0) ||
                  !neighbor_ok(x + dx1, y + dy1))
                continue;
              int v = s[x];
              int edge_idx = 2 + sign3(v - sa[x]) + sign3(v - sb[x]);
              int cat = kEdgeCat[edge_idx];
              if (cat) d[x] = (pixel_t)clip3(0, maxv, v + offs[cat - 1]);
            }
          }
        }
      }
    }
  }
}

}  // namespace

void apply_sao(FrameProgram& prog) {
  Frame& f = *prog.frame;
  bool any = false;
  for (auto& sh : prog.slices)
    if (sh->sao_luma || sh->sao_chroma) any = true;
  if (!any) return;

  int n_planes = (f.chroma_format == 0) ? 1 : 3;
  // reused scratch: SAO reads pre-filter samples, so it works on a copy of
  // the plane; a thread_local avoids a fresh allocation every picture
  static thread_local std::vector<u8> copy;
  for (int c = 0; c < n_planes; c++) {
    copy.assign(f.plane[c].begin(), f.plane[c].end());
    if (f.bytes_pp == 1)
      sao_plane<u8>(f, prog, c, copy);
    else
      sao_plane<u16>(f, prog, c, copy);
  }
}

}  // namespace tde265
