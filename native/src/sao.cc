// Sample-adaptive-offset filter (spec 8.7.3): band and edge offsets per CTB.
// Behavior counterpart of /root/reference/libde265/sao.cc.
#include <cstring>
#include <vector>

#include "tde265/decoder.h"

namespace tde265 {

namespace {

// edge-offset neighbor deltas per SaoEoClass
static const int kEoDx[4][2] = {{-1, 1}, {0, 0}, {-1, 1}, {1, -1}};
static const int kEoDy[4][2] = {{0, 0}, {-1, 1}, {-1, 1}, {-1, 1}};

template <typename pixel_t>
void sao_plane(Frame& f, const FrameProgram& prog, int c,
               const std::vector<u8>& src_copy) {
  const Sps& sps = *f.sps;
  const Pps& pps = *f.pps;
  int bd = f.bit_depth[c];
  int w = f.plane_width(c), h = f.plane_height(c);
  int stride = f.stride[c];
  pixel_t* dst = reinterpret_cast<pixel_t*>(f.plane[c].data());
  const pixel_t* src = reinterpret_cast<const pixel_t*>(src_copy.data());

  int sub_x = (c == 0) ? 1 : sps.sub_width_c;
  int sub_y = (c == 0) ? 1 : sps.sub_height_c;
  int ctb_size_x = sps.ctb_size / sub_x;
  int ctb_size_y = sps.ctb_size / sub_y;

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

      if (type == 1) {
        // band offset
        int shift = bd - 5;
        i16 band_offset[32];
        memset(band_offset, 0, sizeof(band_offset));
        for (int k = 0; k < 4; k++)
          band_offset[(sao.band_pos[c] + k) & 31] = sao.offset[c][k];
        for (int y = y0; y < y1; y++)
          for (int x = x0; x < x1; x++) {
            // skip samples in lossless / PCM-unfiltered CUs
            int xl = x * sub_x, yl = y * sub_y;
            u8 info = f.cu_info[(yl >> 2) * f.pb_w + (xl >> 2)];
            if ((info & 4) || ((info & 2) && sps.pcm_loop_filter_disable))
              continue;
            pixel_t v = src[(size_t)y * stride + x];
            int off = band_offset[v >> shift];
            if (off)
              dst[(size_t)y * stride + x] = (pixel_t)clip_bd(v + off, bd);
          }
      } else {
        // edge offset
        int eo = sao.eo_class[c];
        int dx0 = kEoDx[eo][0], dx1 = kEoDx[eo][1];
        int dy0 = kEoDy[eo][0], dy1 = kEoDy[eo][1];
        for (int y = y0; y < y1; y++) {
          for (int x = x0; x < x1; x++) {
            int xa = x + dx0, ya = y + dy0;
            int xb = x + dx1, yb = y + dy1;
            if (xa < 0 || ya < 0 || xb < 0 || yb < 0 || xa >= w || xb >= w ||
                ya >= h || yb >= h)
              continue;

            // slice/tile boundary availability for the neighbor samples
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
            if (!neighbor_ok(xa, ya) || !neighbor_ok(xb, yb)) continue;

            int v = src[(size_t)y * stride + x];
            int a = src[(size_t)ya * stride + xa];
            int b = src[(size_t)yb * stride + xb];
            int edge_idx = 2 + sign3(v - a) + sign3(v - b);
            static const int kEdgeCat[5] = {1, 2, 0, 3, 4};
            int cat = kEdgeCat[edge_idx];
            if (cat > 0) {
              dst[(size_t)y * stride + x] =
                  (pixel_t)clip_bd(v + sao.offset[c][cat - 1], bd);
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
  for (int c = 0; c < n_planes; c++) {
    std::vector<u8> copy = f.plane[c];
    if (f.bytes_pp == 1)
      sao_plane<u8>(f, prog, c, copy);
    else
      sao_plane<u16>(f, prog, c, copy);
  }
}

}  // namespace tde265
