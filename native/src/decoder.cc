// Decoder orchestration: NAL dispatch, POC (spec 8.3.1), RPS marking (8.3.2),
// reference list construction (8.3.4), DPB/reorder/output management.
// Behavior counterpart of /root/reference/libde265/decctx.cc + dpb.cc.
#include "tde265/decoder.h"

#include <algorithm>
#include <cstring>

#include "tde265/sei.h"

#include "tde265/perf.h"

namespace tde265 {
// intraplan.cc — device intra plan for the fused backend
void build_intra_plan(const FrameProgram& prog, const Frame& f,
                      FrameProgram::Snapshot& snap);
}  // namespace tde265

namespace tde265 {

constexpr int kDpbPoolSize = 32;

Decoder::Decoder() {
  for (int i = 0; i < kDpbPoolSize; i++)
    dpb_.push_back(std::make_unique<Frame>());
  perf::prof_start();
}

Decoder::~Decoder() {
  if (pipelined_) pipeline_.drain();
  pipeline_.stop();
  release_ext_buffers();
  perf::report();
  perf::prof_report();
}

void Decoder::release_ext_buffers() {
  for (auto& f : dpb_) {
    if (!f->ext_acquired) continue;
    if (on_frame_release) on_frame_release(f.get());
    f->ext_acquired = false;
    f->ext_copied = false;
    f->ext_plane[0] = f->ext_plane[1] = f->ext_plane[2] = nullptr;
  }
}

void Decoder::reset() {
  if (pipelined_) pipeline_.drain();
  release_ext_buffers();
  nal_parser_.reset();
  for (auto& f : dpb_) f->release();
  output_queue_.clear();
  reorder_queue_.clear();
  cur_frame_ = nullptr;
  cur_program_.clear();
  prev_slice_header_.reset();
  slice_counter_ = 0;
  first_picture_ = true;
  end_of_stream_flushed_ = false;
  dependent_slice_state.valid = false;
  warnings.clear();
  {
    std::lock_guard<std::mutex> lk(programs_mutex);
    finished_programs.clear();
  }
  cur_hash_ = SeiDecodedPictureHash();
}

Err Decoder::push_data(const u8* data, size_t size, i64 pts, void* user_data) {
  nal_parser_.max_nal_size = limits.max_nal_size;
  nal_parser_.push_data(data, size, pts, user_data);
  if (nal_parser_.limit_exceeded) return Err::LimitExceeded;
  return Err::OK;
}

Err Decoder::push_nal(const u8* data, size_t size, i64 pts, void* user_data) {
  nal_parser_.max_nal_size = limits.max_nal_size;
  nal_parser_.push_nal(data, size, pts, user_data);
  if (nal_parser_.limit_exceeded) return Err::LimitExceeded;
  return Err::OK;
}

Err Decoder::flush_data() {
  nal_parser_.mark_end_of_stream();
  return Err::OK;
}

Warning Decoder::get_warning() {
  if (warnings.empty()) return Warning::None;
  Warning w = warnings.front();
  warnings.erase(warnings.begin());
  return w;
}

int Decoder::highest_tid() const {
  for (int i = 0; i < 16; i++)
    if (sps_[i]) return sps_[i]->max_sub_layers - 1;
  return 6;
}

// ---------------------------------------------------------------------------
// decode pump
// ---------------------------------------------------------------------------
Err Decoder::decode(int* more) {
  if (more) *more = 0;

  if (nal_parser_.queue_empty()) {
    if (nal_parser_.end_of_stream()) {
      if (cur_frame_) {
        Err e = finish_picture();
        if (e != Err::OK) return e;
        if (more) *more = 1;
        return Err::OK;
      }
      if (!end_of_stream_flushed_) {
        flush_reorder_buffer();
        end_of_stream_flushed_ = true;
      }
      if (!output_queue_.empty()) {
        if (more) *more = 1;
        return Err::OK;
      }
      return Err::OK;  // fully drained
    }
    if (more) *more = 0;
    return Err::WaitingForInput;
  }

  // Output-stall protocol (reference decctx.cc:1185-1190): when no DPB slot
  // is free, pause WITHOUT consuming the NAL so the caller can drain the
  // output queue and retry.  Skipped while a picture is in flight (its slices
  // only continue into the already-allocated frame).
  if (!cur_frame_ && !has_free_dpb_slot()) {
    if (more) *more = 1;
    return Err::ImageBufferFull;
  }

  auto nal = nal_parser_.pop();
  if (!nal) return Err::WaitingForInput;
  Err e = decode_nal(std::move(nal));
  if (more) *more = 1;
  return e;
}

Err Decoder::decode_nal(std::unique_ptr<NalUnit> nal) {
  if (nal->layer_id > 0) return Err::OK;  // discard enhancement layers
  if (nal->temporal_id > limit_tid) return Err::OK;
  // RASL pictures of a NoRaslOutput IRAP (stream start / seek / BLA) may
  // reference pictures from before the IRAP: they are not decoded (8.1.3)
  if (nal_is_rasl(nal->type) && irap_no_rasl_flag_) {
    skipping_rasl_ = true;
    return Err::OK;
  }
  if (nal_is_vcl(nal->type)) skipping_rasl_ = false;

  BitReader br(nal->payload(), nal->payload_size());
  switch (nal->type) {
    case NAL_VPS:
      return read_vps(br);
    case NAL_SPS:
      return read_sps(br);
    case NAL_PPS:
      return read_pps(br);
    case NAL_SEI_PREFIX:
      return read_sei(br, false);
    case NAL_SEI_SUFFIX:
      return read_sei(br, true);
    case NAL_EOS:
    case NAL_EOB: {
      if (cur_frame_) {
        Err e = finish_picture();
        if (e != Err::OK) return e;
      }
      first_picture_ = true;  // next CRA gets NoRaslOutputFlag = 1
      return Err::OK;
    }
    case NAL_AUD:
    case NAL_FD:
      return Err::OK;
    default:
      if (nal_is_vcl(nal->type)) return read_slice(std::move(nal));
      return Err::OK;  // reserved/unknown: ignore
  }
}

// Header dumping to user-provided file descriptors
// (DE265_DECODER_PARAM_DUMP_*_HEADERS, reference de265.h:402-405).  The
// text layout is our own; the contract is "a human-readable dump of the
// parsed header arrives on the configured fd".
static void dump_vps(int fd, const Vps& v) {
  dprintf(fd, "----------------- VPS -----------------\n");
  dprintf(fd, "video_parameter_set_id : %d\n", v.vps_id);
  dprintf(fd, "vps_max_sub_layers     : %d\n", v.max_sub_layers);
}

static void dump_sps(int fd, const Sps& s) {
  dprintf(fd, "----------------- SPS -----------------\n");
  dprintf(fd, "seq_parameter_set_id   : %d\n", s.sps_id);
  dprintf(fd, "profile/level          : idc %d / %d\n",
          s.ptl.general_profile_idc, s.ptl.general_level_idc);
  dprintf(fd, "chroma_format_idc      : %d\n", s.chroma_format_idc);
  dprintf(fd, "pic size (luma)        : %dx%d\n",
          s.pic_width_in_luma_samples, s.pic_height_in_luma_samples);
  dprintf(fd, "conformance window     : l%d r%d t%d b%d\n", s.conf_win_left,
          s.conf_win_right, s.conf_win_top, s.conf_win_bottom);
  dprintf(fd, "bit depth (Y/C)        : %d/%d\n", s.bit_depth_luma,
          s.bit_depth_chroma);
  dprintf(fd, "CTB size               : %d\n", 1 << s.log2_ctb_size);
  dprintf(fd, "max_pic_order_cnt_lsb  : %u\n", s.max_pic_order_cnt_lsb);
  dprintf(fd, "sao / amp / pcm        : %d / %d / %d\n", (int)s.sao_enabled,
          (int)s.amp_enabled, (int)s.pcm_enabled);
}

static void dump_pps(int fd, const Pps& p) {
  dprintf(fd, "----------------- PPS -----------------\n");
  dprintf(fd, "pic_parameter_set_id   : %d\n", p.pps_id);
  dprintf(fd, "seq_parameter_set_id   : %d\n", p.sps ? p.sps->sps_id : -1);
  dprintf(fd, "init_qp                : %d\n", p.init_qp);
  dprintf(fd, "cu_qp_delta_enabled    : %d\n", (int)p.cu_qp_delta_enabled);
  dprintf(fd, "tiles                  : %s (%dx%d)\n",
          p.tiles_enabled ? "on" : "off", p.num_tile_columns,
          p.num_tile_rows);
  dprintf(fd, "entropy_coding_sync    : %d\n",
          (int)p.entropy_coding_sync_enabled);
  dprintf(fd, "weighted pred (P/B)    : %d/%d\n", (int)p.weighted_pred,
          (int)p.weighted_bipred);
}

static void dump_slice_header(int fd, const SliceHeader& sh) {
  dprintf(fd, "----------------- Slice -----------------\n");
  dprintf(fd, "slice_segment_address  : %d%s\n", sh.slice_segment_address,
          sh.dependent_slice ? " (dependent)" : "");
  dprintf(fd, "slice_type             : %s\n",
          sh.slice_type == 0 ? "B" : (sh.slice_type == 1 ? "P" : "I"));
  dprintf(fd, "slice_qp               : %d\n", sh.slice_qp_y);
  dprintf(fd, "num_entry_points       : %d\n", sh.num_entry_points);
}

Err Decoder::read_vps(BitReader& br) {
  auto v = std::make_unique<Vps>();
  if (!v->parse(br)) {
    add_warning(Warning::SpsHeaderInvalid);
    return Err::InvalidSyntax;
  }
  if (dump_vps_fd >= 0) dump_vps(dump_vps_fd, *v);
  vps_[v->vps_id] = std::move(v);
  return Err::OK;
}

Err Decoder::read_sps(BitReader& br) {
  auto s = std::make_shared<Sps>();
  if (!s->parse(br)) {
    add_warning(Warning::SpsHeaderInvalid);
    return Err::InvalidSyntax;
  }
  if ((u32)s->pic_width_in_luma_samples > limits.max_image_width ||
      (u32)s->pic_height_in_luma_samples > limits.max_image_height)
    return Err::LimitExceeded;
  if (limits.max_image_area &&
      (u64)s->pic_width_in_luma_samples * s->pic_height_in_luma_samples >
          limits.max_image_area)
    return Err::LimitExceeded;
  // Annex-A capability checks (warn-and-continue, like every stream fault):
  // profiles we implement are Main/Main10/Main Still/RExt (idc 1..4, or a
  // compatibility flag for one of them); a declared level below the
  // picture size is a non-conformant stream worth surfacing.
  {
    const auto& ptl = s->ptl;
    const u32 compat = ptl.general_profile_compatibility_flags;
    const bool known =
        (ptl.general_profile_idc >= 1 && ptl.general_profile_idc <= 4) ||
        (compat & (1u << (31 - 1))) || (compat & (1u << (31 - 2))) ||
        (compat & (1u << (31 - 3))) || (compat & (1u << (31 - 4)));
    if (ptl.general_profile_idc != 0 && !known)
      add_warning(Warning::UnsupportedProfile);
    const i64 max_ps = annex_a_max_luma_ps(ptl.general_level_idc);
    if (ptl.general_level_idc > 0 && max_ps > 0 &&
        (i64)s->pic_width_in_luma_samples * s->pic_height_in_luma_samples >
            max_ps)
      add_warning(Warning::LevelLimitsExceeded);
  }
  if (dump_sps_fd >= 0) dump_sps(dump_sps_fd, *s);
  sps_[s->sps_id] = std::move(s);
  return Err::OK;
}

Err Decoder::read_pps(BitReader& br) {
  auto p = std::make_shared<Pps>();
  // peek sps id: parse() resolves it via the table
  // (Pps::parse takes the sps explicitly; parse ids first)
  BitReader probe = br;
  probe.ue();  // pps_id
  int sid = (int)probe.ue();
  if (sid >= 16 || !sps_[sid]) {
    add_warning(Warning::NonexistingSpsReferenced);
    return Err::MissingSPS;
  }
  if (!p->parse(br, sps_[sid])) {
    add_warning(Warning::PpsHeaderInvalid);
    return Err::InvalidSyntax;
  }
  if (dump_pps_fd >= 0) dump_pps(dump_pps_fd, *p);
  pps_[p->pps_id] = std::move(p);
  return Err::OK;
}

Err Decoder::read_sei(BitReader& br, bool suffix) {
  SeiMessages msgs;
  int planes = 3;
  if (!parse_sei(br, &msgs, planes)) return Err::InvalidSyntax;
  if (msgs.picture_hash.present && !skipping_rasl_) {
    // decoded-picture-hash is a suffix SEI: applies to the current picture
    // (a skipped RASL's hash must not leak onto the preceding picture)
    cur_hash_ = msgs.picture_hash;
  }
  return Err::OK;
}

// ---------------------------------------------------------------------------
// slices
// ---------------------------------------------------------------------------
Err Decoder::read_slice(std::unique_ptr<NalUnit> nal) {
  BitReader br(nal->payload(), nal->payload_size());

  auto sh = std::make_shared<SliceHeader>();
  if (prev_slice_header_) {
    // start from a copy so dependent slices inherit all fields
    *sh = *prev_slice_header_;
    sh->lt = prev_slice_header_->lt;
  }
  std::shared_ptr<const Pps> pps_tab[64];
  for (int i = 0; i < 64; i++) pps_tab[i] = pps_[i];

  if (!sh->parse(br, nal->type, nal->temporal_id, pps_tab, nullptr)) {
    add_warning(Warning::SliceHeaderInvalid);
    return Err::InvalidSyntax;
  }

  if (sh->dependent_slice) {
    if (!prev_slice_header_) {
      add_warning(Warning::SliceHeaderInvalid);
      return Err::InvalidSyntax;
    }
    sh->slice_addr_rs = prev_slice_header_->slice_addr_rs;
  } else {
    sh->slice_addr_rs = sh->slice_segment_address;
  }
  if (dump_slice_fd >= 0) dump_slice_header(dump_slice_fd, *sh);

  // --- picture boundary ---
  if (sh->first_slice_in_pic) {
    if (cur_frame_) {
      Err e = finish_picture();
      if (e != Err::OK) return e;
    }
    Err e = start_new_picture(sh, nal->type, nal->temporal_id, nal->pts,
                              nal->user_data);
    if (e != Err::OK) return e;
  }
  if (!cur_frame_) {
    add_warning(Warning::SkippedUndecodableNAL);
    return Err::OK;  // no picture in progress (e.g. missed first slice)
  }

  if (!sh->dependent_slice) {
    sh->slice_index = slice_counter_++;
    // construct reference picture lists for this slice
    if (sh->slice_type != SLICE_I) {
      Err e = build_ref_lists(*sh);
      if (e != Err::OK) return e;
    }
    dependent_slice_state.valid = false;
  } else {
    sh->slice_index = prev_slice_header_ ? prev_slice_header_->slice_index : 0;
  }

  cur_program_.slices.push_back(sh);
  prev_slice_header_ = sh;

  // --- fix up entry points from raw to de-stuffed offsets ---
  // Slice data begins at the current (aligned) byte of the de-stuffed payload.
  size_t header_bytes = (size_t)(br.bits_consumed() / 8);
  const u8* slice_data = nal->payload() + header_bytes;
  size_t slice_size = nal->payload_size() - header_bytes;
  {
    // nal->skipped holds de-stuffed offsets relative to NAL start (incl. the
    // 2-byte header); slice data starts at header_bytes + 2.
    u32 base = (u32)(header_bytes + 2);
    u32 removed_before = 0;
    for (u32 s : nal->skipped)
      if (s <= base) removed_before++;
    for (auto& ep : sh->entry_points) {
      u32 removed_in_window = 0;
      for (u32 s : nal->skipped) {
        if (s <= base) continue;
        if (s - base <= ep - removed_in_window) removed_in_window++;
      }
      if (removed_in_window > ep) {
        add_warning(Warning::IncorrectEntryPointOffset);
        return Err::InvalidSyntax;
      }
      ep -= removed_in_window;
      if (ep > slice_size) {
        add_warning(Warning::IncorrectEntryPointOffset);
        return Err::InvalidSyntax;
      }
    }
  }

  // --- decode slice data into the frame program ---
  SliceParser parser(this, &cur_program_, cur_frame_, sh);
  Err e;
  {
    perf::Scope ps(perf::kParse);
    e = parser.decode(slice_data, slice_size);
  }
  if (e != Err::OK) {
    add_warning(Warning::InvalidCabacData);
    cur_frame_->integrity_ok = false;
  }
  return Err::OK;
}

// ---------------------------------------------------------------------------
// picture lifecycle
// ---------------------------------------------------------------------------
Frame* Decoder::alloc_frame() {
  for (auto& f : dpb_) {
    if (f->state == PicState::Unused && !f->needed_for_output) {
      if (f->pending) {  // worker may still be writing this slot's pixels
        f->pending->wait();
        f->pending.reset();
      }
      if (f->last_use) {  // ...or reading them as a reference
        f->last_use->wait();
        f->last_use.reset();
      }
      return f.get();
    }
  }
  return nullptr;
}

bool Decoder::has_free_dpb_slot() const {
  for (auto& f : dpb_)
    if (f->state == PicState::Unused && !f->needed_for_output) return true;
  return false;
}

Err Decoder::start_new_picture(std::shared_ptr<SliceHeader> sh, int nal_type,
                               int temporal_id, i64 pts, void* user_data) {
  auto pps = sh->pps;
  auto sps = pps->sps;

  Frame* f = alloc_frame();
  if (!f) {
    // evict oldest non-needed picture as a last resort
    add_warning(Warning::MaxNumRefPicsExceeded);
    for (auto& c : dpb_) {
      if (!c->needed_for_output && c->state != PicState::InProgress) {
        c->release();
        f = c.get();
        break;
      }
    }
    if (!f) return Err::ImageBufferFull;
  }

  // recycled slot: hand the previous external buffer back first
  if (f->ext_acquired) {
    if (on_frame_release) on_frame_release(f);
    f->ext_acquired = false;
    f->ext_copied = false;
    f->ext_plane[0] = f->ext_plane[1] = f->ext_plane[2] = nullptr;
  }

  f->alloc(sps, pps);
  f->pts = pts;
  f->user_data = user_data;
  f->temporal_id = temporal_id;
  f->nal_type = nal_type;
  f->is_irap = nal_is_irap(nal_type);
  f->decode_order = decode_counter_++;
  cur_frame_ = f;
  cur_program_.clear();
  cur_program_.frame = f;
  slice_counter_ = 0;
  cur_hash_ = SeiDecodedPictureHash();
  dependent_slice_state.valid = false;

  // --- POC derivation (spec 8.3.1) ---
  compute_poc(*sh, nal_type, temporal_id);

  // --- RPS processing (spec 8.3.2) ---
  Err e = process_rps(*sh, nal_type);
  if (e != Err::OK) return e;

  f->needed_for_output = sh->pic_output_flag;
  f->state = PicState::InProgress;
  if (on_frame_alloc) on_frame_alloc(f);
  return Err::OK;
}

void Decoder::compute_poc(SliceHeader& sh, int nal_type, int temporal_id) {
  const Sps& sps = *sh.pps->sps;
  i32 max_lsb = (i32)sps.max_pic_order_cnt_lsb;

  bool no_rasl_output = false;
  if (nal_is_idr(nal_type) || nal_is_bla(nal_type)) {
    no_rasl_output = true;
  } else if (nal_is_cra(nal_type)) {
    no_rasl_output = first_picture_;
  }
  cur_frame_->no_rasl_output = no_rasl_output;
  if (nal_is_irap(nal_type)) irap_no_rasl_flag_ = no_rasl_output;

  i32 poc;
  if (nal_is_idr(nal_type)) {
    poc = 0;
    cur_frame_->poc_lsb = 0;
  } else {
    i32 lsb = sh.pic_order_cnt_lsb;
    i32 prev_lsb = prev_tid0_poc_lsb_;
    i32 prev_msb = prev_tid0_poc_msb_;
    i32 msb;
    if (nal_is_irap(nal_type) && no_rasl_output) {
      msb = 0;
    } else if (lsb < prev_lsb && prev_lsb - lsb >= max_lsb / 2) {
      msb = prev_msb + max_lsb;
    } else if (lsb > prev_lsb && lsb - prev_lsb > max_lsb / 2) {
      msb = prev_msb - max_lsb;
    } else {
      msb = prev_msb;
    }
    poc = msb + lsb;
    cur_frame_->poc_lsb = lsb;
  }
  cur_frame_->poc = poc;

  if (temporal_id == 0 && !nal_is_rasl(nal_type) && !nal_is_radl(nal_type) &&
      !nal_is_sublayer_non_ref(nal_type)) {
    prev_tid0_poc_lsb_ = cur_frame_->poc_lsb;
    prev_tid0_poc_msb_ = cur_frame_->poc - cur_frame_->poc_lsb;
  }
  first_picture_ = false;
}

Frame* Decoder::find_poc(i32 poc, bool short_term_only) {
  for (auto& f : dpb_) {
    if (f.get() == cur_frame_) continue;
    if (f->state == PicState::ShortTermRef && f->poc == poc) return f.get();
    if (!short_term_only && f->state == PicState::LongTermRef && f->poc == poc)
      return f.get();
  }
  return nullptr;
}

Frame* Decoder::find_poc_lsb(i32 poc_lsb, bool /*longterm_candidate*/) {
  for (auto& f : dpb_) {
    if (f.get() == cur_frame_) continue;
    if ((f->state == PicState::ShortTermRef || f->state == PicState::LongTermRef) &&
        (f->poc & ((i32)cur_frame_->sps->max_pic_order_cnt_lsb - 1)) == poc_lsb)
      return f.get();
  }
  return nullptr;
}

Frame* Decoder::generate_concealment_frame(i32 poc) {
  add_warning(Warning::NonexistingReferencePicture);
  Frame* f = alloc_frame();
  if (!f) return nullptr;
  if (f->ext_acquired) {  // recycled slot: release the old buffer
    if (on_frame_release) on_frame_release(f);
    f->ext_acquired = false;
    f->ext_copied = false;
    f->ext_plane[0] = f->ext_plane[1] = f->ext_plane[2] = nullptr;
  }
  f->alloc(cur_frame_->sps, cur_frame_->pps);
  if (on_frame_alloc) on_frame_alloc(f);
  // mid-gray
  int n_planes = (f->chroma_format == 0) ? 1 : 3;
  for (int c = 0; c < n_planes; c++) {
    int fill = 1 << (f->bit_depth[c] - 1);
    if (f->bytes_pp == 1) {
      memset(f->plane[c].data(), fill, f->plane[c].size());
    } else {
      u16* p = reinterpret_cast<u16*>(f->plane[c].data());
      for (size_t i = 0; i < f->plane[c].size() / 2; i++) p[i] = (u16)fill;
    }
  }
  // neutral metadata: all-inter zero MVs would be wrong; leave intra defaults
  f->poc = poc;
  f->poc_lsb = poc & ((i32)cur_frame_->sps->max_pic_order_cnt_lsb - 1);
  f->state = PicState::ShortTermRef;
  f->needed_for_output = false;
  f->integrity_ok = false;
  // fill the slice-address grid so z_available sees decoded CTBs
  for (auto& s : f->slice_addr_rs) s = 0;
  return f;
}

Err Decoder::process_rps(SliceHeader& sh, int nal_type) {
  const Sps& sps = *sh.pps->sps;
  i32 max_lsb = (i32)sps.max_pic_order_cnt_lsb;
  i32 poc = cur_frame_->poc;

  poc_st_curr_before_.clear();
  poc_st_curr_after_.clear();
  poc_st_foll_.clear();
  poc_lt_curr_.clear();
  poc_lt_foll_.clear();
  curr_delta_poc_msb_present_.clear();
  foll_delta_poc_msb_present_.clear();

  if (nal_is_idr(nal_type)) {
    // no reference pictures: unmark everything
    for (auto& f : dpb_) {
      if (f.get() == cur_frame_) continue;
      if (f->state == PicState::ShortTermRef || f->state == PicState::LongTermRef)
        f->state = f->needed_for_output ? PicState::NonRef : PicState::Unused;
    }
    ref_st_curr_before_.clear();
    ref_st_curr_after_.clear();
    ref_lt_curr_.clear();
    return Err::OK;
  }

  for (int i = 0; i < sh.strps.num_negative; i++) {
    if (sh.strps.used_s0[i])
      poc_st_curr_before_.push_back(poc + sh.strps.delta_poc_s0[i]);
    else
      poc_st_foll_.push_back(poc + sh.strps.delta_poc_s0[i]);
  }
  for (int i = 0; i < sh.strps.num_positive; i++) {
    if (sh.strps.used_s1[i])
      poc_st_curr_after_.push_back(poc + sh.strps.delta_poc_s1[i]);
    else
      poc_st_foll_.push_back(poc + sh.strps.delta_poc_s1[i]);
  }
  for (auto& e : sh.lt) {
    i32 poc_lt = e.poc_lsb;
    if (e.has_msb) {
      poc_lt += poc - e.delta_poc_msb_cycle * max_lsb - (poc & (max_lsb - 1));
    }
    if (e.used_by_curr) {
      poc_lt_curr_.push_back(poc_lt);
      curr_delta_poc_msb_present_.push_back(e.has_msb);
    } else {
      poc_lt_foll_.push_back(poc_lt);
      foll_delta_poc_msb_present_.push_back(e.has_msb);
    }
  }

  // --- mark long-term refs first (8.3.2 step ordering) ---
  ref_lt_curr_.assign(poc_lt_curr_.size(), nullptr);
  std::vector<Frame*> lt_foll(poc_lt_foll_.size(), nullptr);
  for (size_t i = 0; i < poc_lt_curr_.size(); i++) {
    Frame* f = curr_delta_poc_msb_present_[i]
                   ? find_poc(poc_lt_curr_[i], false)
                   : find_poc_lsb(poc_lt_curr_[i] & (max_lsb - 1), true);
    ref_lt_curr_[i] = f;
  }
  for (size_t i = 0; i < poc_lt_foll_.size(); i++) {
    lt_foll[i] = foll_delta_poc_msb_present_[i]
                     ? find_poc(poc_lt_foll_[i], false)
                     : find_poc_lsb(poc_lt_foll_[i] & (max_lsb - 1), true);
  }

  // --- short-term ---
  ref_st_curr_before_.assign(poc_st_curr_before_.size(), nullptr);
  ref_st_curr_after_.assign(poc_st_curr_after_.size(), nullptr);
  std::vector<Frame*> st_foll(poc_st_foll_.size(), nullptr);
  for (size_t i = 0; i < poc_st_curr_before_.size(); i++)
    ref_st_curr_before_[i] = find_poc(poc_st_curr_before_[i], true);
  for (size_t i = 0; i < poc_st_curr_after_.size(); i++)
    ref_st_curr_after_[i] = find_poc(poc_st_curr_after_[i], true);
  for (size_t i = 0; i < poc_st_foll_.size(); i++)
    st_foll[i] = find_poc(poc_st_foll_[i], true);

  // --- generate concealment frames for missing current refs ---
  for (size_t i = 0; i < ref_st_curr_before_.size(); i++)
    if (!ref_st_curr_before_[i])
      ref_st_curr_before_[i] = generate_concealment_frame(poc_st_curr_before_[i]);
  for (size_t i = 0; i < ref_st_curr_after_.size(); i++)
    if (!ref_st_curr_after_[i])
      ref_st_curr_after_[i] = generate_concealment_frame(poc_st_curr_after_[i]);
  for (size_t i = 0; i < ref_lt_curr_.size(); i++)
    if (!ref_lt_curr_[i])
      ref_lt_curr_[i] = generate_concealment_frame(poc_lt_curr_[i]);

  // --- update marking: anything not referenced becomes unused ---
  auto in_any = [&](Frame* f) {
    for (auto* g : ref_st_curr_before_)
      if (g == f) return 1;
    for (auto* g : ref_st_curr_after_)
      if (g == f) return 1;
    for (auto* g : st_foll)
      if (g == f) return 1;
    for (auto* g : ref_lt_curr_)
      if (g == f) return 2;
    for (auto* g : lt_foll)
      if (g == f) return 2;
    return 0;
  };
  for (auto& f : dpb_) {
    if (f.get() == cur_frame_) continue;
    if (f->state != PicState::ShortTermRef && f->state != PicState::LongTermRef)
      continue;
    int r = in_any(f.get());
    if (r == 0) {
      f->state = f->needed_for_output ? PicState::NonRef : PicState::Unused;
    } else if (r == 1) {
      f->state = PicState::ShortTermRef;
      f->is_long_term = false;
    } else {
      f->state = PicState::LongTermRef;
      f->is_long_term = true;
    }
  }
  return Err::OK;
}

Err Decoder::build_ref_lists(SliceHeader& sh) {
  // spec 8.3.4
  std::vector<Frame*> tmp0, tmp1;
  std::vector<bool> lt0, lt1;

  for (auto* f : ref_st_curr_before_) {
    tmp0.push_back(f);
    lt0.push_back(false);
  }
  for (auto* f : ref_st_curr_after_) {
    tmp0.push_back(f);
    lt0.push_back(false);
  }
  for (auto* f : ref_lt_curr_) {
    tmp0.push_back(f);
    lt0.push_back(true);
  }
  if (sh.slice_type == SLICE_B) {
    for (auto* f : ref_st_curr_after_) {
      tmp1.push_back(f);
      lt1.push_back(false);
    }
    for (auto* f : ref_st_curr_before_) {
      tmp1.push_back(f);
      lt1.push_back(false);
    }
    for (auto* f : ref_lt_curr_) {
      tmp1.push_back(f);
      lt1.push_back(true);
    }
  }

  if (tmp0.empty() && sh.slice_type != SLICE_I) {
    add_warning(Warning::NonexistingReferencePicture);
    // build a concealment ref so decoding can continue
    Frame* c = generate_concealment_frame(cur_frame_->poc > 0 ? cur_frame_->poc - 1 : 0);
    if (!c) return Err::MissingRefPic;
    tmp0.push_back(c);
    lt0.push_back(false);
    if (sh.slice_type == SLICE_B) {
      tmp1.push_back(c);
      lt1.push_back(false);
    }
  }

  for (int i = 0; i < sh.num_ref_idx[0]; i++) {
    int src = sh.ref_pic_list_modification[0] ? sh.list_entry[0][i]
                                              : (i % (int)tmp0.size());
    if (src >= (int)tmp0.size()) src = 0;
    sh.ref_list[0][i] = tmp0[src];
    sh.ref_poc[0][i] = tmp0[src]->poc;
    sh.ref_longterm[0][i] = lt0[src];
  }
  if (sh.slice_type == SLICE_B) {
    for (int i = 0; i < sh.num_ref_idx[1]; i++) {
      int src = sh.ref_pic_list_modification[1] ? sh.list_entry[1][i]
                                                : (i % (int)tmp1.size());
      if (src >= (int)tmp1.size()) src = 0;
      sh.ref_list[1][i] = tmp1[src];
      sh.ref_poc[1][i] = tmp1[src]->poc;
      sh.ref_longterm[1][i] = lt1[src];
    }
  }
  return Err::OK;
}

// ---------------------------------------------------------------------------
// picture completion & output
// ---------------------------------------------------------------------------
Err Decoder::finish_picture() {
  Frame* f = cur_frame_;
  if (!f) return Err::OK;

  // execute the pixel pipeline (async on the worker in pipelined mode)
  Err e = Err::OK;
  if (pipelined_) {
    auto prog = std::make_shared<FrameProgram>(std::move(cur_program_));
    cur_program_.clear();
    auto hash = cur_hash_;
    bool check = check_sei_hash;
    bool deblk = !disable_deblocking, sao = !disable_sao;
    PixelBackend backend = pixel_backend;
    auto* self = this;
    f->pending = pipeline_.submit([prog, f, hash, check, deblk, sao, backend,
                                   self]() {
      Err err = backend ? backend(*prog)
                        : execute_program_scalar(*prog, deblk, sao);
      if (err != Err::OK) f->integrity_ok = false;
      if (check && hash.present && !check_picture_hash(hash, *f)) {
        f->integrity_ok = false;
        self->async_hash_fail_.store(true);
      }
    });
    // guard the reference frames against DPB-slot recycling while in flight
    for (Frame* r : prog->ref_frames) r->last_use = f->pending;
  } else if (parse_only) {
    // Syntax parsing never reads pixel values (CABAC/MV/mode prediction use
    // only metadata grids), so the pixel pipeline can be skipped entirely;
    // reconstruction is delegated to an external backend consuming the
    // exported FrameProgram (the device decode path).
  } else {
    if (pixel_backend) {
      e = pixel_backend(cur_program_);
    } else {
      e = execute_program_scalar(cur_program_, !disable_deblocking, !disable_sao);
    }
    if (e != Err::OK) f->integrity_ok = false;

    // SEI decoded-picture-hash check
    if (check_sei_hash && cur_hash_.present) {
      if (!check_picture_hash(cur_hash_, *f)) {
        add_warning(Warning::ChecksumMismatch);
        f->integrity_ok = false;
        e = Err::ChecksumMismatch;
      }
    }
  }

  if (keep_programs) {
    auto prog = std::make_unique<FrameProgram>();
    *prog = cur_program_;
    auto snap = std::make_shared<FrameProgram::Snapshot>();
    snap->poc = f->poc;
    snap->width = f->width;
    snap->height = f->height;
    snap->chroma_width = f->chroma_width;
    snap->chroma_height = f->chroma_height;
    snap->bytes_pp = f->bytes_pp;
    for (int c = 0; c < 3; c++) {
      snap->bit_depth[c] = f->bit_depth[c];
      if (!parse_only) snap->plane[c] = f->plane[c];
      snap->stride[c] = f->stride[c];
    }
    snap->pb_w = f->pb_w;
    snap->pb_h = f->pb_h;
    snap->ctb_w = f->ctb_w;
    snap->ctb_h = f->ctb_h;
    snap->ctb_size = f->sps->ctb_size;
    snap->pcm_bit_depth[0] = f->sps->pcm_bit_depth_luma;
    snap->pcm_bit_depth[1] = f->sps->pcm_bit_depth_chroma;
    snap->pcm_loop_filter_disable = f->sps->pcm_loop_filter_disable;
    snap->qp_y = f->qp_y;
    snap->nonzero_coeff = f->nonzero_coeff;
    snap->deblock_flags = f->deblock_flags;
    snap->cu_info = f->cu_info;
    snap->sao = f->sao;
    build_intra_plan(cur_program_, *f, *snap);
    snap->pu_idx.assign((size_t)f->pb_w * f->pb_h, -1);
    for (size_t i = 0; i < cur_program_.pus.size(); i++) {
      const PuRec& pu = cur_program_.pus[i];
      int x4 = pu.x >> 2, y4 = pu.y >> 2;
      int x1 = std::min((pu.x + std::max<int>(pu.w, 4)) >> 2, f->pb_w);
      int y1 = std::min((pu.y + std::max<int>(pu.h, 4)) >> 2, f->pb_h);
      for (int yy = y4; yy < y1; yy++)
        for (int xx = x4; xx < x1; xx++)
          snap->pu_idx[(size_t)yy * f->pb_w + xx] = (i32)i;
    }
    for (Frame* r : cur_program_.ref_frames) {
      snap->ref_pocs.push_back(r->poc);
      if (!parse_only)
        for (int c = 0; c < 3; c++) snap->ref_planes.push_back(r->plane[c]);
    }
    snap->slice_idx = f->slice_idx;
    constexpr int L = FrameProgram::Snapshot::kSliceRecordLen;
    snap->slice_records.assign(cur_program_.slices.size() * L, 0);
    for (size_t s = 0; s < cur_program_.slices.size(); s++) {
      const SliceHeader& sh = *cur_program_.slices[s];
      i32* r = &snap->slice_records[s * L];
      r[0] = sh.slice_type;
      r[1] = sh.deblocking_filter_disabled;
      r[2] = sh.beta_offset;
      r[3] = sh.tc_offset;
      r[4] = sh.sao_luma;
      r[5] = sh.sao_chroma;
      r[6] = (sh.slice_type == SLICE_P) ? sh.pps->weighted_pred
                                        : sh.pps->weighted_bipred;
      r[7] = sh.wp.luma_log2_weight_denom;
      r[8] = sh.wp.chroma_log2_weight_denom;
      r[9] = sh.loop_filter_across_slices;
      r[10] = sh.pps->cb_qp_offset;  // deblock chroma QP (spec 8.7.2.5.5)
      r[11] = sh.pps->cr_qp_offset;
      for (int l = 0; l < 2; l++)
        for (int i = 0; i < 16; i++) {
          r[16 + l * 16 + i] = sh.wp.luma_weight[l][i];
          r[48 + l * 16 + i] = sh.wp.luma_offset[l][i];
          for (int c = 0; c < 2; c++) {
            r[80 + (l * 16 + i) * 2 + c] = sh.wp.chroma_weight[l][i][c];
            r[144 + (l * 16 + i) * 2 + c] = sh.wp.chroma_offset[l][i][c];
          }
        }
    }
    snap->slice_addr = f->slice_addr_rs;
    snap->tile_id.resize(f->ctb_w * f->ctb_h);
    for (int rs = 0; rs < f->ctb_w * f->ctb_h; rs++)
      snap->tile_id[rs] = f->pps->tile_id_rs(rs);
    snap->across_tiles = f->pps->loop_filter_across_tiles;
    const Sps& dsps = *f->sps;
    if (dsps.scaling_list_enabled) {
      snap->scaling_enabled = true;
      snap->scaling_factors.resize(6 * (16 + 64 + 256 + 1024));
      const ScalingLists& lists = f->pps->pps_scaling_list_data_present
                                      ? f->pps->scaling_lists
                                      : dsps.scaling_lists;
      expand_all_scaling_lists(lists, snap->scaling_factors.data());
    }
    prog->snapshot = std::move(snap);
    {
      std::lock_guard<std::mutex> lk(programs_mutex);
      finished_programs.push_back(std::move(prog));
    }
  }

  // reference marking for the current picture
  bool is_ref = !nal_is_sublayer_non_ref(f->nal_type);
  f->state = is_ref ? PicState::ShortTermRef : PicState::NonRef;

  // no_output_of_prior_pics handling
  if (nal_is_irap(f->nal_type) && f->no_rasl_output && f->decode_order > 0) {
    auto sh0 = cur_program_.slices.empty() ? nullptr : cur_program_.slices[0];
    bool no_output = sh0 && sh0->no_output_of_prior_pics;
    if (nal_is_cra(f->nal_type)) no_output = true;  // CRA with NoRaslOutput: infer
    if (no_output) {
      for (Frame* q : reorder_queue_) q->needed_for_output = false;
      reorder_queue_.clear();
    } else {
      flush_reorder_buffer();
    }
  }

  // RASL pictures associated with a NoRaslOutput IRAP are not output
  if (nal_is_rasl(f->nal_type) && assoc_irap_no_rasl_output_) {
    f->needed_for_output = false;
  }
  if (nal_is_irap(f->nal_type)) assoc_irap_no_rasl_output_ = f->no_rasl_output;

  if (f->needed_for_output) reorder_queue_.push_back(f);

  cur_frame_ = nullptr;
  prev_slice_header_.reset();

  // bump pictures out of the reorder buffer
  const Sps& sps = *f->sps;
  int max_reorder = sps.max_num_reorder_pics[sps.max_sub_layers - 1];
  while ((int)reorder_queue_.size() > max_reorder) {
    auto it = std::min_element(
        reorder_queue_.begin(), reorder_queue_.end(),
        [](Frame* a, Frame* b) { return a->poc < b->poc; });
    push_to_output_queue(*it);
    reorder_queue_.erase(it);
  }
  return e;
}

void Decoder::push_to_output_queue(Frame* f) { output_queue_.push_back(f); }

void Decoder::flush_reorder_buffer() {
  std::sort(reorder_queue_.begin(), reorder_queue_.end(),
            [](Frame* a, Frame* b) { return a->poc < b->poc; });
  for (Frame* f : reorder_queue_) push_to_output_queue(f);
  reorder_queue_.clear();
}

Frame* Decoder::peek_next_picture() {
  if (output_queue_.empty()) return nullptr;
  Frame* f = output_queue_.front();
  if (f->pending) {  // pixels must be final before the caller sees them
    f->pending->wait();
    f->pending.reset();
  }
  // embedder-owned planes (de265_set_image_plane): the final picture is
  // copied out exactly once, before the application first sees it
  if (f->ext_acquired && !f->ext_copied) {
    for (int c = 0; c < 3; c++) {
      if (!f->ext_plane[c]) continue;
      const size_t rowbytes = (size_t)f->plane_width(c) * f->bytes_pp;
      for (int y = 0; y < f->plane_height(c); y++)
        memcpy(f->ext_plane[c] + (size_t)y * f->ext_stride[c] * f->bytes_pp,
               f->plane[c].data() + (size_t)y * f->stride[c] * f->bytes_pp,
               rowbytes);
    }
    f->ext_copied = true;
  }
  if (async_hash_fail_.exchange(false)) add_warning(Warning::ChecksumMismatch);
  return f;
}

Frame* Decoder::get_next_picture() { return peek_next_picture(); }

void Decoder::release_next_picture() {
  if (output_queue_.empty()) return;
  Frame* f = output_queue_.front();
  output_queue_.erase(output_queue_.begin());
  f->needed_for_output = false;
  if (f->state == PicState::NonRef) f->state = PicState::Unused;
}

}  // namespace tde265
