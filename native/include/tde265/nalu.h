// NAL-unit layer: Annex-B start-code scanning, emulation-prevention removal,
// NAL classification, and the pending-NAL queue.
//
// Capability counterpart of /root/reference/libde265/nal-parser.{h,cc} and
// nal.{h,cc}; independent design: we accumulate raw NAL bytes across push
// boundaries and de-stuff once per completed NAL (recording removed-byte
// offsets for WPP/tiles entry-point fixup), instead of de-stuffing inside the
// scanner state machine.
#pragma once

#include <deque>
#include <memory>
#include <vector>

#include "tde265/common.h"

namespace tde265 {

// Spec Table 7-1 nal_unit_type values.
enum NalType : int {
  NAL_TRAIL_N = 0, NAL_TRAIL_R = 1,
  NAL_TSA_N = 2, NAL_TSA_R = 3,
  NAL_STSA_N = 4, NAL_STSA_R = 5,
  NAL_RADL_N = 6, NAL_RADL_R = 7,
  NAL_RASL_N = 8, NAL_RASL_R = 9,
  NAL_BLA_W_LP = 16, NAL_BLA_W_RADL = 17, NAL_BLA_N_LP = 18,
  NAL_IDR_W_RADL = 19, NAL_IDR_N_LP = 20,
  NAL_CRA = 21,
  NAL_RSV_IRAP_VCL22 = 22, NAL_RSV_IRAP_VCL23 = 23,
  NAL_VPS = 32, NAL_SPS = 33, NAL_PPS = 34,
  NAL_AUD = 35, NAL_EOS = 36, NAL_EOB = 37, NAL_FD = 38,
  NAL_SEI_PREFIX = 39, NAL_SEI_SUFFIX = 40,
};

constexpr bool nal_is_vcl(int t) { return t < 32; }
constexpr bool nal_is_idr(int t) { return t == NAL_IDR_W_RADL || t == NAL_IDR_N_LP; }
constexpr bool nal_is_bla(int t) { return t >= NAL_BLA_W_LP && t <= NAL_BLA_N_LP; }
constexpr bool nal_is_cra(int t) { return t == NAL_CRA; }
constexpr bool nal_is_irap(int t) { return t >= NAL_BLA_W_LP && t <= NAL_RSV_IRAP_VCL23; }
constexpr bool nal_is_rasl(int t) { return t == NAL_RASL_N || t == NAL_RASL_R; }
constexpr bool nal_is_radl(int t) { return t == NAL_RADL_N || t == NAL_RADL_R; }
// Sub-layer non-reference pictures (spec 7.4.2.2: *_N types).
constexpr bool nal_is_sublayer_non_ref(int t) {
  return t == NAL_TRAIL_N || t == NAL_TSA_N || t == NAL_STSA_N ||
         t == NAL_RADL_N || t == NAL_RASL_N || t == 10 || t == 12 || t == 14;
}

struct NalUnit {
  std::vector<u8> data;       // de-stuffed bytes, starting at the 2-byte header
  std::vector<u32> skipped;   // de-stuffed positions: offset in `data` after
                              // which a 0x03 byte was removed from the raw NAL
  i64 pts = 0;
  void* user_data = nullptr;

  // Parsed 2-byte NAL header (spec 7.3.1.2).
  int type = 0;
  int layer_id = 0;
  int temporal_id = 0;  // nuh_temporal_id_plus1 - 1

  bool parse_header();  // fills type/layer_id/temporal_id from data[0..1]

  // Payload view (after the 2-byte header).
  const u8* payload() const { return data.data() + 2; }
  size_t payload_size() const { return data.size() >= 2 ? data.size() - 2 : 0; }

  // Map an offset in the *raw* (stuffed) payload to the de-stuffed offset.
  // Used to fix up entry_point_offset values (spec 7.4.7.1 uses raw offsets).
  u32 destuffed_offset(u32 raw_ofs) const;
};

class NalParser {
 public:
  // Feed Annex-B bytes; complete NALs appear in the queue.
  void push_data(const u8* data, size_t size, i64 pts = 0, void* user_data = nullptr);
  // Feed one complete NAL (no start code, still stuffed).
  void push_nal(const u8* data, size_t size, i64 pts = 0, void* user_data = nullptr);
  // Mark end of current NAL (next pushed byte starts a new NAL).
  void flush_pending();        // a.k.a. push_end_of_NAL
  void mark_end_of_stream() { end_of_stream_ = true; flush_pending(); }
  void mark_end_of_frame() { end_of_frame_ = true; flush_pending(); }

  bool queue_empty() const { return queue_.empty(); }
  size_t queue_size() const { return queue_.size(); }
  size_t pending_input_bytes() const { return pending_.size(); }
  std::unique_ptr<NalUnit> pop();

  bool end_of_stream() const { return end_of_stream_; }
  bool end_of_frame() const { return end_of_frame_; }
  void reset();

  // Security limit (de265_security_limits.max_nal_size_bytes equivalent).
  size_t max_nal_size = 16u * 1024 * 1024;
  bool limit_exceeded = false;

 private:
  void emit_pending(size_t strip_trailing_zeros);

  std::vector<u8> pending_;     // raw bytes of the NAL being scanned
  int zrun_ = 0;                // consecutive 0x00 seen at scan position
  bool in_nal_ = false;         // seen first start code yet?
  bool end_of_stream_ = false;
  bool end_of_frame_ = false;
  i64 cur_pts_ = 0;
  void* cur_user_data_ = nullptr;
  std::deque<std::unique_ptr<NalUnit>> queue_;
};

}  // namespace tde265
