// Decoder orchestration: NAL dispatch, POC derivation, reference-picture-set
// marking, reference list construction, DPB/output queue, and the
// parse->program->execute pipeline.
//
// Capability counterpart of /root/reference/libde265/decctx.{h,cc} and
// dpb.{h,cc}.  Independent design: one class owns the DPB directly; pictures
// are decoded by (1) parsing all slices into a FrameProgram and (2) handing
// the program to a pixel backend (scalar oracle or the TPU pipeline via the
// C API callback).
#pragma once

#include <functional>
#include <memory>
#include <string>
#include <vector>

#include "tde265/frame.h"
#include "tde265/nalu.h"
#include "tde265/params.h"
#include "tde265/program.h"
#include "tde265/sei.h"
#include "tde265/sliceheader.h"
#include "tde265/syntax.h"
#include "tde265/threads.h"

#include <atomic>
#include <mutex>

namespace tde265 {

enum class Warning : int {
  None = 0,
  SkippedUndecodableNAL,
  PrematureEndOfSlice,
  IncorrectEntryPointOffset,
  CtbOutsideImageArea,
  SpsHeaderInvalid,
  PpsHeaderInvalid,
  SliceHeaderInvalid,
  NonexistingPpsReferenced,
  NonexistingSpsReferenced,
  NonexistingReferencePicture,
  ChecksumMismatch,
  InvalidCabacData,
  MaxNumRefPicsExceeded,
  UnsupportedProfile,
  LevelLimitsExceeded,
};

struct SecurityLimits {
  u32 max_image_width = 8192;
  u32 max_image_height = 8192;
  u64 max_image_area = 0;  // 0 = unlimited
  u64 max_nal_size = 16u * 1024 * 1024;
  u32 max_sei_per_au = 256;
};

// Executes the pixel pipeline for one picture.  The default backend is the
// scalar C++ oracle in recon.cc; the Python layer can substitute the
// JAX/Pallas pipeline through the C API.
using PixelBackend = std::function<Err(FrameProgram&)>;

class Decoder {
 public:
  Decoder();
  ~Decoder();

  // --- input ---
  Err push_data(const u8* data, size_t size, i64 pts = 0, void* user_data = nullptr);
  Err push_nal(const u8* data, size_t size, i64 pts = 0, void* user_data = nullptr);
  void push_end_of_nal() { nal_parser_.flush_pending(); }
  void push_end_of_frame() { nal_parser_.mark_end_of_frame(); }
  Err flush_data();  // end of stream
  void reset();

  // --- decode pump: returns OK and sets *more when more work is pending ---
  Err decode(int* more);

  // Enable the parse||execute pipeline: picture pixel programs run on a
  // worker thread while the host parses the next picture's slices.
  void start_worker_threads(int n) {
    requested_threads_ = n;
    if (n > 0 && !keep_programs) {
      pipelined_ = true;
      pipeline_.start();
    }
  }
  // worker count requested via de265_start_worker_threads (tile-parallel
  // slice parse engages at >= 2)
  int requested_threads() const { return requested_threads_; }

  // --- output ---
  Frame* peek_next_picture();
  Frame* get_next_picture();      // like peek; caller must release
  void release_next_picture();
  size_t output_queue_length() const { return output_queue_.size(); }

  size_t pending_input_bytes() const { return nal_parser_.pending_input_bytes(); }
  size_t pending_nal_units() const { return nal_parser_.queue_size(); }

  // --- config ---
  bool check_sei_hash = false;
  bool suppress_faulty_pictures = false;
  bool disable_deblocking = false;
  bool disable_sao = false;
  int limit_tid = 7;              // highest temporal layer to decode
  int framerate_ratio = 100;
  SecurityLimits limits;
  PixelBackend pixel_backend;     // if empty: scalar oracle
  // When set, completed FrameProgram objects are retained (Python pulls them
  // as tensors); the scalar backend is skipped.
  bool keep_programs = false;
  // parse-only: skip pixel reconstruction entirely (programs are consumed by
  // an external backend); implies no SEI-hash verification and no plane
  // copies in the program snapshots
  bool parse_only = false;

  // Image-allocation hook seam (reference de265.h:332-368 semantics,
  // installed by de265_set_image_allocation_functions): on_frame_alloc
  // fires once a new picture's geometry is known (the embedder may attach
  // external planes via de265_set_image_plane); on_frame_release fires
  // when the picture's DPB slot is recycled or the decoder goes away.
  std::function<void(Frame*)> on_frame_alloc;
  std::function<void(Frame*)> on_frame_release;
  void release_ext_buffers();  // fire on_frame_release for every acquired

  // Header-dump file descriptors (de265_set_parameter_int DUMP_*_HEADERS,
  // reference de265.h:402-405): -1 = off.
  int dump_vps_fd = -1, dump_sps_fd = -1, dump_pps_fd = -1,
      dump_slice_fd = -1;

  // --- introspection ---
  std::vector<Warning> warnings;
  Warning get_warning();
  int highest_tid() const;
  int current_tid() const { return current_hightid_; }

  const Vps* vps(int id) const { return id < 16 ? vps_[id].get() : nullptr; }
  std::shared_ptr<const Sps> sps(int id) const { return id < 16 ? sps_[id] : nullptr; }
  std::shared_ptr<const Pps> pps(int id) const { return id < 64 ? pps_[id] : nullptr; }

  // dpb access (for tests/tools)
  int dpb_size() const { return (int)dpb_.size(); }
  Frame* dpb_frame(int i) { return dpb_[i].get(); }

  void add_warning(Warning w) {
    std::lock_guard<std::mutex> lk(warnings_mutex_);
    if (warnings.size() < 20) warnings.push_back(w);
  }

  // --- used by SliceParser ---
  SliceParser::ParseState dependent_slice_state;  // CABAC ctx across segments
  Frame* current_frame() { return cur_frame_; }

 private:
  friend class SliceParser;

  Err decode_nal(std::unique_ptr<NalUnit> nal);
  Err read_vps(BitReader& br);
  Err read_sps(BitReader& br);
  Err read_pps(BitReader& br);
  Err read_sei(BitReader& br, bool suffix);
  Err read_slice(std::unique_ptr<NalUnit> nal);

  // picture-level processing (spec 8.3.x)
  Err start_new_picture(std::shared_ptr<SliceHeader> sh, int nal_type,
                        int temporal_id, i64 pts, void* user_data);
  void compute_poc(SliceHeader& sh, int nal_type, int temporal_id);
  Err process_rps(SliceHeader& sh, int nal_type);
  Err build_ref_lists(SliceHeader& sh);
  Err finish_picture();

  // DPB management
  Frame* alloc_frame();
  Frame* find_poc(i32 poc, bool prefer_short_term);
  Frame* find_poc_lsb(i32 poc_lsb, bool longterm_candidate);
  Frame* generate_concealment_frame(i32 poc);
  void push_to_output_queue(Frame* f);
  void flush_reorder_buffer();
  bool has_free_dpb_slot() const;

  OrderedExecutor pipeline_;
  int requested_threads_ = 0;
  std::mutex warnings_mutex_;
  bool pipelined_ = false;
  std::atomic<bool> async_hash_fail_{false};

  NalParser nal_parser_;
  std::unique_ptr<Vps> vps_[16];
  std::shared_ptr<Sps> sps_[16];
  std::shared_ptr<Pps> pps_[64];

  std::vector<std::unique_ptr<Frame>> dpb_;
  std::vector<Frame*> output_queue_;  // sorted by POC
  std::vector<Frame*> reorder_queue_;

  // current picture state
  Frame* cur_frame_ = nullptr;
  FrameProgram cur_program_;
  std::shared_ptr<SliceHeader> prev_slice_header_;
  int slice_counter_ = 0;

  // POC state (spec 8.3.1)
  i32 prev_tid0_poc_lsb_ = 0;
  i32 prev_tid0_poc_msb_ = 0;
  bool first_picture_ = true;
  bool no_output_of_prior_pics_ = false;

  // RPS state
  std::vector<i32> poc_st_curr_before_, poc_st_curr_after_, poc_st_foll_;
  std::vector<i32> poc_lt_curr_, poc_lt_foll_;
  std::vector<bool> curr_delta_poc_msb_present_, foll_delta_poc_msb_present_;
  std::vector<Frame*> ref_st_curr_before_, ref_st_curr_after_, ref_lt_curr_;

  int current_hightid_ = 7;
  u32 decode_counter_ = 0;
  bool end_of_stream_flushed_ = false;
  // NoRaslOutputFlag-related state
  bool assoc_irap_no_rasl_output_ = false;
  // NoRaslOutputFlag of the most recent IRAP, latched at its FIRST slice
  // (spec 8.1.3: RASL pictures of such an IRAP are not decoded at all)
  bool irap_no_rasl_flag_ = false;
  bool skipping_rasl_ = false;  // suppress the dropped picture's suffix SEI
  SeiDecodedPictureHash cur_hash_;

 public:
  // Executed FrameProgram retention for the tensor API.
  // finished_programs is appended by the parse thread and read through the
  // C API, possibly from another thread (the Python parse||pack pipeline,
  // libde265_tpu/stream.py) — guard the vector's structure with a mutex.
  // Program *contents* are immutable once pushed.
  std::vector<std::unique_ptr<FrameProgram>> finished_programs;
  mutable std::mutex programs_mutex;
};

// The scalar pixel backend (recon.cc): executes a FrameProgram bit-exactly.
Err execute_program_scalar(FrameProgram& prog, bool run_deblock, bool run_sao);

// Loop filters (deblock.cc / sao.cc), exposed for the backend + tests.
void apply_deblocking(FrameProgram& prog);
void apply_sao(FrameProgram& prog);

// Expand all scaling lists to full resolution into an 8160-byte buffer
// (6x16 | 6x64 | 6x256 | 6x1024); see transform.cc.
void expand_all_scaling_lists(const ScalingLists& lists, u8* out);

// Availability helper (spec 6.4.1 z-scan availability), shared between parse
// and reconstruction.
bool z_available(const Frame& frame, int x_curr, int y_curr, int xn, int yn);

}  // namespace tde265
