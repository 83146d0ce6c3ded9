// Decoded picture storage: pixel planes + per-block metadata grids.
//
// Capability counterpart of /root/reference/libde265/image.{h,cc}; independent
// design: metadata lives in flat per-4x4 / per-CTB SoA grids sized for
// device-tensor export (the TPU pipeline uploads them directly), and there is
// no per-CTB progress-lock lattice — stage ordering is expressed in the
// reconstruction program instead.
#pragma once

#include <memory>
#include <vector>

#include "tde265/common.h"
#include "tde265/params.h"

namespace tde265 { class TaskHandle; }

namespace tde265 {

struct MotionVector {
  i16 x = 0, y = 0;
  bool operator==(const MotionVector& o) const { return x == o.x && y == o.y; }
};

// Per-4x4 motion record.  Reference POCs are resolved at parse time so that
// deblocking-strength and TMVP derivations don't need the ref lists again.
struct PbMotion {
  MotionVector mv[2];
  i8 ref_idx[2] = {-1, -1};
  u8 pred_flags = 0;  // bit0 = L0, bit1 = L1
  i32 ref_poc[2] = {0, 0};
  u8 ref_longterm = 0;  // bit0/bit1
  bool intra = true;    // set false for inter blocks (used by deblock bS)
};

// Per-CTB SAO parameters (decoded from sao() syntax, consumed by the filter).
struct SaoParams {
  u8 type_idx[3] = {0, 0, 0};  // 0 off, 1 band, 2 edge
  u8 eo_class[3] = {0, 0, 0};  // edge offset class 0..3
  u8 band_pos[3] = {0, 0, 0};
  i16 offset[3][4] = {};       // scaled offsets
};

enum class PicState : u8 {
  Unused,
  InProgress,        // being decoded
  ShortTermRef,
  LongTermRef,
  NonRef,            // decoded, not used for reference, pending output
};

struct Frame {
  // --- configuration ---
  std::shared_ptr<const Sps> sps;
  std::shared_ptr<const Pps> pps;
  int width = 0, height = 0;        // luma
  int chroma_width = 0, chroma_height = 0;
  int bit_depth[3] = {8, 8, 8};
  int chroma_format = 1;

  // --- pixels (bytes_pp = 1 for 8-bit, 2 for >8-bit, little-endian) ---
  int bytes_pp = 1;
  std::vector<u8> plane[3];
  int stride[3] = {0, 0, 0};  // in pixels
  void* plane_user_data[3] = {nullptr, nullptr, nullptr};

  // Externally-owned output planes (de265_set_image_plane, reference
  // de265.h:332-368): the embedder supplies pixel memory from its
  // get_buffer hook; the decoder copies the final picture out before it is
  // handed to the application.  Reconstruction itself stays in the
  // SoA-internal planes (reference pictures are read from them).
  u8* ext_plane[3] = {nullptr, nullptr, nullptr};
  int ext_stride[3] = {0, 0, 0};  // in pixels
  bool ext_acquired = false;      // get_buffer succeeded for this picture
  bool ext_copied = false;        // final pixels copied to ext planes

  // --- per-4x4 metadata (luma coords / 4) ---
  int pb_w = 0, pb_h = 0;
  std::vector<PbMotion> motion;        // pb_w * pb_h
  std::vector<i8> qp_y;                // per 4x4, for deblock
  std::vector<u8> nonzero_coeff;       // bit0: luma TU had coded coeffs
  std::vector<u8> deblock_flags;       // bit0 vert edge, bit1 horiz edge,
                                       // bit2/3: edge filtering disabled
  std::vector<u8> intra_pred_mode;     // luma intra mode per 4x4
  std::vector<u8> intra_mode_c;        // chroma intra mode per 4x4 (luma grid)
  std::vector<u8> cu_info;             // bit0 intra, bit1 pcm, bit2 tqbypass,
                                       // bit3 skip
  std::vector<u8> ct_depth;            // coding-quadtree depth (parse ctx)

  // --- per-CTB metadata ---
  int ctb_w = 0, ctb_h = 0;
  std::vector<SaoParams> sao;          // ctb_w * ctb_h
  std::vector<i32> slice_addr_rs;      // SliceAddrRs of CTB (-1 = not decoded)
  std::vector<u16> slice_idx;          // index into the picture's slice list

  // Availability fast path: true while the frame is single-tile and the
  // slice currently being parsed is the one starting at CTB 0 — then
  // z_available() reduces to a raster + Morton compare with no table loads.
  // Set at slice-parse start, cleared when a later slice begins.
  bool fast_avail = false;

  // --- picture-level state ---
  i32 poc = 0;
  i32 poc_lsb = 0;
  PicState state = PicState::Unused;
  bool needed_for_output = false;
  bool is_irap = false;
  bool no_rasl_output = false;
  bool is_long_term = false;
  bool used_by_curr = false;
  i64 pts = 0;
  void* user_data = nullptr;
  int temporal_id = 0;
  int nal_type = 0;
  bool integrity_ok = true;  // false if error-concealed or faulty reference
  u32 decode_order = 0;
  // pixel-program execution pending on the pipeline worker (threads.h):
  // `pending` = the task writing this frame's pixels; `last_use` = the most
  // recent task reading this frame as a reference (guards slot recycling).
  std::shared_ptr<TaskHandle> pending;
  std::shared_ptr<TaskHandle> last_use;

  void alloc(std::shared_ptr<const Sps> sps, std::shared_ptr<const Pps> pps);
  void release();  // back to Unused, keep allocations for reuse
  // Re-clear the per-4x4 / per-CTB parse metadata to alloc() defaults without
  // touching pixels.  Used when an abandoned parallel parse attempt must be
  // retried sequentially: deblock_flags accumulates with |=, so stale bits
  // from the partial attempt would otherwise survive the re-parse.
  void reset_parse_metadata();

  u8* plane_ptr(int c) { return plane[c].data(); }
  const u8* plane_ptr(int c) const { return plane[c].data(); }
  int plane_width(int c) const { return c == 0 ? width : chroma_width; }
  int plane_height(int c) const { return c == 0 ? height : chroma_height; }

  // 8-bit pixel accessors (hot path for Main profile).
  u8* px8(int c, int x, int y) { return plane[c].data() + y * stride[c] + x; }
  const u8* px8(int c, int x, int y) const {
    return plane[c].data() + y * stride[c] + x;
  }
  u16* px16(int c, int x, int y) {
    return reinterpret_cast<u16*>(plane[c].data()) + y * stride[c] + x;
  }
  const u16* px16(int c, int x, int y) const {
    return reinterpret_cast<const u16*>(plane[c].data()) + y * stride[c] + x;
  }

  PbMotion& pb(int x4, int y4) { return motion[y4 * pb_w + x4]; }
  const PbMotion& pb(int x4, int y4) const { return motion[y4 * pb_w + x4]; }
  // Motion info at luma position (x,y).
  const PbMotion& pb_at(int x, int y) const {
    return motion[(y >> 2) * pb_w + (x >> 2)];
  }

  void set_motion(int x0, int y0, int w, int h, const PbMotion& m) {
    for (int y = y0 >> 2; y < (y0 + h) >> 2; y++)
      for (int x = x0 >> 2; x < (x0 + w) >> 2; x++) motion[y * pb_w + x] = m;
  }

  i32 ctb_slice_addr(int ctb_x, int ctb_y) const {
    return slice_addr_rs[ctb_y * ctb_w + ctb_x];
  }
};

}  // namespace tde265
