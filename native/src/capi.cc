// Public C API implementation: de265.h-compatible surface (behavior
// counterpart of /root/reference/libde265/de265.cc) plus the tde265_*
// tensor-export extensions used by the Python/JAX pixel pipeline.
#include <cstring>
#include <memory>
#include <mutex>

#include "tde265/de265.h"
#include "tde265/decoder.h"

using namespace tde265;

// ---------------------------------------------------------------------------
// version
// ---------------------------------------------------------------------------
extern "C" {

const char* de265_get_version(void) { return "tde265 0.1.0 (libde265-compatible 1.1.1)"; }
uint32_t de265_get_version_number(void) { return (1u << 24) | (1u << 16) | (1u << 8); }
int de265_get_version_number_major(void) { return 1; }
int de265_get_version_number_minor(void) { return 1; }
int de265_get_version_number_maintenance(void) { return 1; }

// ---------------------------------------------------------------------------
// errors
// ---------------------------------------------------------------------------
const char* de265_get_error_text(de265_error err) {
  switch (err) {
    case DE265_OK: return "no error";
    case DE265_ERROR_NO_SUCH_FILE: return "no such file";
    case DE265_ERROR_CHECKSUM_MISMATCH: return "SEI checksum mismatch";
    case DE265_ERROR_CODED_PARAMETER_OUT_OF_RANGE: return "coded parameter out of range";
    case DE265_ERROR_IMAGE_BUFFER_FULL: return "DPB/output queue full";
    case DE265_ERROR_WAITING_FOR_INPUT_DATA: return "waiting for input data";
    case DE265_ERROR_OUT_OF_MEMORY: return "out of memory";
    case DE265_ERROR_NOT_IMPLEMENTED_YET: return "not implemented yet";
    case DE265_WARNING_SPS_HEADER_INVALID: return "sps header invalid";
    case DE265_WARNING_PPS_HEADER_INVALID: return "pps header invalid";
    case DE265_WARNING_SLICEHEADER_INVALID: return "slice header invalid";
    case DE265_WARNING_INCORRECT_ENTRY_POINT_OFFSET: return "incorrect entry point offset";
    case DE265_WARNING_NONEXISTING_REFERENCE_PICTURE_ACCESSED: return "non-existing reference picture accessed";
    case DE265_WARNING_MAX_NUM_REF_PICS_EXCEEDED: return "maximum number of reference pictures exceeded";
    case DE265_WARNING_UNSUPPORTED_PROFILE: return "stream declares a profile outside the implemented set";
    case DE265_WARNING_LEVEL_LIMITS_EXCEEDED: return "picture size exceeds the declared level limits";
    default: return "unknown error";
  }
}

int de265_isOK(de265_error err) { return err == DE265_OK || err >= 1000; }
void de265_disable_logging(void) {}
void de265_set_verbosity(int) {}

// ---------------------------------------------------------------------------
// context wrapper
// ---------------------------------------------------------------------------
struct tde265_ctx {
  Decoder dec;
  SecurityLimits limits_storage;
  de265_security_limits limits_c;
  int acceleration = de265_acceleration_AUTO;
  de265_image_allocation alloc_funcs = {nullptr, nullptr};
  void* alloc_userdata = nullptr;
};

static inline tde265_ctx* C(de265_decoder_context* ctx) {
  return reinterpret_cast<tde265_ctx*>(ctx);
}
static inline Frame* F(const de265_image* img) {
  return reinterpret_cast<Frame*>(const_cast<de265_image*>(img));
}

static de265_error map_err(Err e) {
  switch (e) {
    case Err::OK: return DE265_OK;
    case Err::NoSuchFile: return DE265_ERROR_NO_SUCH_FILE;
    case Err::ChecksumMismatch: return DE265_ERROR_CHECKSUM_MISMATCH;
    case Err::ImageBufferFull: return DE265_ERROR_IMAGE_BUFFER_FULL;
    case Err::WaitingForInput: return DE265_ERROR_WAITING_FOR_INPUT_DATA;
    case Err::InvalidSyntax: return DE265_ERROR_CODED_PARAMETER_OUT_OF_RANGE;
    case Err::MissingSPS:
    case Err::MissingPPS: return DE265_ERROR_NO_INITIAL_SLICE_HEADER;
    case Err::LimitExceeded: return DE265_ERROR_CODED_PARAMETER_OUT_OF_RANGE;
    default: return DE265_ERROR_UNSPECIFIED_DECODING_ERROR;
  }
}

de265_error de265_init(void) { return DE265_OK; }
de265_error de265_free(void) { return DE265_OK; }

de265_decoder_context* de265_new_decoder(void) {
  return reinterpret_cast<de265_decoder_context*>(new tde265_ctx());
}

de265_error de265_free_decoder(de265_decoder_context* ctx) {
  // hand external buffers back while the context is fully alive, then
  // detach the hooks so ~Decoder doesn't re-enter them mid-destruction
  C(ctx)->dec.release_ext_buffers();
  C(ctx)->dec.on_frame_alloc = nullptr;
  C(ctx)->dec.on_frame_release = nullptr;
  delete C(ctx);
  return DE265_OK;
}

de265_error de265_start_worker_threads(de265_decoder_context* ctx, int n) {
  // Frame-granular pipeline: the host parses picture N+1 while picture N's
  // pixel program executes on a worker (the TPU-design analogue of the
  // reference's WPP/tile thread pool; intra-picture parallelism comes from
  // the batched kernels).
  C(ctx)->dec.start_worker_threads(n);
  return DE265_OK;
}

void de265_reset(de265_decoder_context* ctx) { C(ctx)->dec.reset(); }

// ---------------------------------------------------------------------------
// input
// ---------------------------------------------------------------------------
de265_error de265_push_data(de265_decoder_context* ctx, const void* data,
                            int length, de265_PTS pts, void* user_data) {
  return map_err(C(ctx)->dec.push_data((const u8*)data, length, pts, user_data));
}

de265_error de265_decode_data(de265_decoder_context* ctx, const void* data, int length) {
  if (length > 0) return de265_push_data(ctx, data, length, 0, nullptr);
  return map_err(C(ctx)->dec.flush_data());
}

de265_error de265_push_NAL(de265_decoder_context* ctx, const void* data,
                           int length, de265_PTS pts, void* user_data) {
  return map_err(C(ctx)->dec.push_nal((const u8*)data, length, pts, user_data));
}

de265_error de265_push_end_of_NAL(de265_decoder_context* ctx) {
  C(ctx)->dec.push_end_of_nal();
  return DE265_OK;
}

de265_error de265_push_end_of_frame(de265_decoder_context* ctx) {
  C(ctx)->dec.push_end_of_frame();
  return DE265_OK;
}

de265_error de265_flush_data(de265_decoder_context* ctx) {
  return map_err(C(ctx)->dec.flush_data());
}

int de265_get_number_of_input_bytes_pending(de265_decoder_context* ctx) {
  return (int)C(ctx)->dec.pending_input_bytes();
}

int de265_get_number_of_NAL_units_pending(de265_decoder_context* ctx) {
  return (int)C(ctx)->dec.pending_nal_units();
}

de265_error de265_decode(de265_decoder_context* ctx, int* more) {
  Err e = C(ctx)->dec.decode(more);
  return map_err(e);
}

// ---------------------------------------------------------------------------
// output
// ---------------------------------------------------------------------------
const de265_image* de265_peek_next_picture(de265_decoder_context* ctx) {
  Frame* f = C(ctx)->dec.peek_next_picture();
  if (f && C(ctx)->dec.suppress_faulty_pictures && !f->integrity_ok) {
    C(ctx)->dec.release_next_picture();
    return de265_peek_next_picture(ctx);
  }
  return reinterpret_cast<const de265_image*>(f);
}

const de265_image* de265_get_next_picture(de265_decoder_context* ctx) {
  // Reference semantics (de265.cc:426-433): get = peek + release.  The
  // returned image stays valid until the next de265 call (its DPB slot is
  // only reused by a later decode).
  const de265_image* img = de265_peek_next_picture(ctx);
  if (img) de265_release_next_picture(ctx);
  return img;
}

void de265_release_next_picture(de265_decoder_context* ctx) {
  C(ctx)->dec.release_next_picture();
}

de265_error de265_get_warning(de265_decoder_context* ctx) {
  Warning w = C(ctx)->dec.get_warning();
  switch (w) {
    case Warning::None: return DE265_OK;
    case Warning::PrematureEndOfSlice: return DE265_WARNING_PREMATURE_END_OF_SLICE_SEGMENT;
    case Warning::IncorrectEntryPointOffset: return DE265_WARNING_INCORRECT_ENTRY_POINT_OFFSET;
    case Warning::CtbOutsideImageArea: return DE265_WARNING_CTB_OUTSIDE_IMAGE_AREA;
    case Warning::SpsHeaderInvalid: return DE265_WARNING_SPS_HEADER_INVALID;
    case Warning::UnsupportedProfile: return DE265_WARNING_UNSUPPORTED_PROFILE;
    case Warning::LevelLimitsExceeded: return DE265_WARNING_LEVEL_LIMITS_EXCEEDED;
    case Warning::PpsHeaderInvalid: return DE265_WARNING_PPS_HEADER_INVALID;
    case Warning::SliceHeaderInvalid: return DE265_WARNING_SLICEHEADER_INVALID;
    case Warning::NonexistingPpsReferenced: return DE265_WARNING_NONEXISTING_PPS_REFERENCED;
    case Warning::NonexistingSpsReferenced: return DE265_WARNING_NONEXISTING_SPS_REFERENCED;
    case Warning::NonexistingReferencePicture: return DE265_WARNING_NONEXISTING_REFERENCE_PICTURE_ACCESSED;
    case Warning::ChecksumMismatch: return DE265_ERROR_CHECKSUM_MISMATCH;
    case Warning::MaxNumRefPicsExceeded: return DE265_WARNING_MAX_NUM_REF_PICS_EXCEEDED;
    default: return DE265_WARNING_SLICEHEADER_INVALID;
  }
}

// ---------------------------------------------------------------------------
// image accessors
// ---------------------------------------------------------------------------
int de265_get_image_width(const de265_image* img, int channel) {
  const Frame* f = F(img);
  const Sps& sps = *f->sps;
  int crop = (sps.conf_win_left + sps.conf_win_right) *
             (channel == 0 ? sps.sub_width_c : 1);
  int w = (channel == 0) ? f->width : f->chroma_width;
  return w - crop;
}

int de265_get_image_height(const de265_image* img, int channel) {
  const Frame* f = F(img);
  const Sps& sps = *f->sps;
  int crop = (sps.conf_win_top + sps.conf_win_bottom) *
             (channel == 0 ? sps.sub_height_c : 1);
  int h = (channel == 0) ? f->height : f->chroma_height;
  return h - crop;
}

enum de265_chroma de265_get_chroma_format(const de265_image* img) {
  return (enum de265_chroma)F(img)->chroma_format;
}

int de265_get_bits_per_pixel(const de265_image* img, int channel) {
  return F(img)->bit_depth[channel < 0 || channel > 2 ? 0 : channel];
}

const uint8_t* de265_get_image_plane(const de265_image* img, int channel,
                                     int* out_stride) {
  Frame* f = F(img);
  const Sps& sps = *f->sps;
  int left = sps.conf_win_left * (channel == 0 ? sps.sub_width_c : 1);
  int top = sps.conf_win_top * (channel == 0 ? sps.sub_height_c : 1);
  // embedder-owned plane (de265_set_image_plane): hand back its memory
  if (f->ext_plane[channel]) {
    if (out_stride) *out_stride = f->ext_stride[channel] * f->bytes_pp;
    return f->ext_plane[channel] +
           ((size_t)top * f->ext_stride[channel] + left) * f->bytes_pp;
  }
  if (out_stride) *out_stride = f->stride[channel] * f->bytes_pp;
  return f->plane_ptr(channel) +
         ((size_t)top * f->stride[channel] + left) * f->bytes_pp;
}

void* de265_get_image_plane_user_data(const de265_image* img, int channel) {
  if (!img || channel < 0 || channel > 2) return nullptr;
  return F(img)->plane_user_data[channel];
}
de265_PTS de265_get_image_PTS(const de265_image* img) { return F(img)->pts; }
void* de265_get_image_user_data(const de265_image* img) { return F(img)->user_data; }
void de265_set_image_user_data(de265_image* img, void* user_data) {
  F(img)->user_data = user_data;
}

void de265_get_image_NAL_header(const de265_image* img, int* nal_unit_type,
                                const char** nal_unit_name, int* nuh_layer_id,
                                int* nuh_temporal_id) {
  const Frame* f = F(img);
  if (nal_unit_type) *nal_unit_type = f->nal_type;
  if (nuh_layer_id) *nuh_layer_id = 0;
  if (nuh_temporal_id) *nuh_temporal_id = f->temporal_id;
  if (nal_unit_name) {
    static const char* names[] = {
        "TRAIL_N", "TRAIL_R", "TSA_N", "TSA_R", "STSA_N", "STSA_R",
        "RADL_N", "RADL_R", "RASL_N", "RASL_R"};
    switch (f->nal_type) {
      case NAL_IDR_W_RADL: *nal_unit_name = "IDR_W_RADL"; break;
      case NAL_IDR_N_LP: *nal_unit_name = "IDR_N_LP"; break;
      case NAL_CRA: *nal_unit_name = "CRA_NUT"; break;
      case NAL_BLA_W_LP: *nal_unit_name = "BLA_W_LP"; break;
      case NAL_BLA_W_RADL: *nal_unit_name = "BLA_W_RADL"; break;
      case NAL_BLA_N_LP: *nal_unit_name = "BLA_N_LP"; break;
      default:
        *nal_unit_name = (f->nal_type >= 0 && f->nal_type < 10)
                             ? names[f->nal_type]
                             : "unknown";
    }
  }
}

int de265_get_image_full_range_flag(const de265_image* img) {
  return F(img)->sps->vui.video_full_range_flag ? 1 : 0;
}
int de265_get_image_colour_primaries(const de265_image* img) {
  return F(img)->sps->vui.colour_primaries;
}
int de265_get_image_transfer_characteristics(const de265_image* img) {
  return F(img)->sps->vui.transfer_characteristics;
}
int de265_get_image_matrix_coefficients(const de265_image* img) {
  return F(img)->sps->vui.matrix_coeffs;
}

// ---------------------------------------------------------------------------
// allocation hooks (reference de265.h:332-368): the embedder's get_buffer
// runs once per picture; planes it attaches via de265_set_image_plane
// receive the final pixels before the picture is handed out.
// Reconstruction itself stays in tde265's internal SoA planes (the device
// feed and reference-picture reads depend on that layout), so embedder
// memory is filled by one copy at output time — the observable contract
// (hook order, buffer ownership, pixel content) matches the reference.
// ---------------------------------------------------------------------------
static de265_image_allocation g_default_alloc = {nullptr, nullptr};

void de265_set_image_allocation_functions(de265_decoder_context* ctx,
                                          de265_image_allocation* af,
                                          void* userdata) {
  tde265_ctx* c = C(ctx);
  if (!af || !af->get_buffer) {  // back to internal allocation
    c->alloc_funcs = {nullptr, nullptr};
    c->dec.on_frame_alloc = nullptr;
    c->dec.on_frame_release = nullptr;
    return;
  }
  c->alloc_funcs = *af;
  c->alloc_userdata = userdata;
  c->dec.on_frame_alloc = [ctx, c](Frame* f) {
    const Sps& sps = *f->sps;
    de265_image_spec spec = {};
    switch (f->chroma_format) {
      case 0: spec.format = de265_image_format_mono8; break;
      case 2: spec.format = de265_image_format_YUV422P8; break;
      case 3: spec.format = de265_image_format_YUV444P8; break;
      default: spec.format = de265_image_format_YUV420P8; break;
    }
    spec.width = f->width;
    spec.height = f->height;
    spec.alignment = 16;
    spec.crop_left = sps.conf_win_left * sps.sub_width_c;
    spec.crop_right = sps.conf_win_right * sps.sub_width_c;
    spec.crop_top = sps.conf_win_top * sps.sub_height_c;
    spec.crop_bottom = sps.conf_win_bottom * sps.sub_height_c;
    spec.visible_width = spec.width - spec.crop_left - spec.crop_right;
    spec.visible_height = spec.height - spec.crop_top - spec.crop_bottom;
    int ok = c->alloc_funcs.get_buffer(ctx, &spec,
                                       reinterpret_cast<de265_image*>(f),
                                       c->alloc_userdata);
    f->ext_acquired = ok != 0;
    f->ext_copied = false;
  };
  c->dec.on_frame_release = [ctx, c](Frame* f) {
    if (c->alloc_funcs.release_buffer)
      c->alloc_funcs.release_buffer(ctx, reinterpret_cast<de265_image*>(f),
                                    c->alloc_userdata);
  };
}
const de265_image_allocation* de265_get_default_image_allocation_functions(void) {
  return &g_default_alloc;
}
void de265_set_image_plane(de265_image* img, int cIdx, void* mem, int stride,
                           void* userdata) {
  if (!img || cIdx < 0 || cIdx > 2) return;
  Frame* f = F(img);
  f->ext_plane[cIdx] = static_cast<u8*>(mem);
  f->ext_stride[cIdx] = stride;  // pixels (== bytes at 8-bit)
  f->plane_user_data[cIdx] = userdata;
}

// Plane (re)allocation on an image, mirroring the reference's
// de265_alloc_image_plane/de265_free_image_plane (image.cc:69-107).  tde265
// keeps pixel ownership inside Frame, so "alloc" (re)initializes the internal
// plane storage at a 16-aligned stride and copies the caller's data in; the
// returned pointer is the live plane base.
void* de265_alloc_image_plane(de265_image* img, int cIdx, void* inputdata,
                              int inputstride, void* userdata) {
  if (!img || cIdx < 0 || cIdx > 2) return nullptr;
  Frame* f = F(img);
  int w = f->plane_width(cIdx);
  int h = f->plane_height(cIdx);
  if (w <= 0 || h <= 0) return nullptr;
  const int alignment = 16;
  int stride_px = (w + alignment - 1) / alignment * alignment;
  f->stride[cIdx] = stride_px;
  size_t stride_bytes = (size_t)stride_px * f->bytes_pp;
  f->plane[cIdx].assign(stride_bytes * h, 0);
  f->plane_user_data[cIdx] = userdata;
  uint8_t* p = f->plane_ptr(cIdx);
  if (inputdata) {
    size_t row_bytes = (size_t)w * f->bytes_pp;
    if (inputstride == (int)stride_bytes) {
      memcpy(p, inputdata, stride_bytes * h);
    } else {
      for (int y = 0; y < h; y++)
        memcpy(p + (size_t)y * stride_bytes,
               (const char*)inputdata + (size_t)y * inputstride, row_bytes);
    }
  }
  return p;
}

void de265_free_image_plane(de265_image* img, int cIdx) {
  if (!img || cIdx < 0 || cIdx > 2) return;
  Frame* f = F(img);
  f->plane[cIdx].clear();
  f->plane[cIdx].shrink_to_fit();
  f->plane_user_data[cIdx] = nullptr;
}

void de265_get_image_spec_from_image(const de265_image* img,
                                     de265_image_spec* spec) {
  if (!img || !spec) return;
  const Frame* f = F(img);
  // format codes follow the reference's de265_image_format enum
  // (de265.h:325-330 there: mono8=1, YUV420P8=2, YUV422P8=3, YUV444P8=4)
  switch (f->chroma_format) {
    case 0: spec->format = de265_image_format_mono8; break;
    case 2: spec->format = de265_image_format_YUV422P8; break;
    case 3: spec->format = de265_image_format_YUV444P8; break;
    default: spec->format = de265_image_format_YUV420P8; break;
  }
  spec->width = f->width;
  spec->height = f->height;
  spec->alignment = 16;
  int cl = 0, cr = 0, ct = 0, cb = 0;
  if (f->sps) {
    cl = f->sps->conf_win_left * f->sps->sub_width_c;
    cr = f->sps->conf_win_right * f->sps->sub_width_c;
    ct = f->sps->conf_win_top * f->sps->sub_height_c;
    cb = f->sps->conf_win_bottom * f->sps->sub_height_c;
  }
  spec->crop_left = cl;
  spec->crop_right = cr;
  spec->crop_top = ct;
  spec->crop_bottom = cb;
  spec->visible_width = f->width - cl - cr;
  spec->visible_height = f->height - ct - cb;
}

// ---------------------------------------------------------------------------
// frame dropping
// ---------------------------------------------------------------------------
int de265_get_highest_TID(de265_decoder_context* ctx) {
  return C(ctx)->dec.highest_tid();
}
int de265_get_current_TID(de265_decoder_context* ctx) {
  return C(ctx)->dec.limit_tid;
}
void de265_set_limit_TID(de265_decoder_context* ctx, int max_tid) {
  C(ctx)->dec.limit_tid = max_tid;
}
void de265_set_framerate_ratio(de265_decoder_context* ctx, int percent) {
  tde265_ctx* c = C(ctx);
  c->dec.framerate_ratio = percent;
  // Map ratio to a TID limit like the reference (decctx.cc:2060-2150):
  int highest = c->dec.highest_tid();
  int tid = highest;
  int p = percent;
  while (tid > 0 && p <= 100 / 2) {
    tid--;
    p *= 2;
  }
  c->dec.limit_tid = tid;
}
int de265_change_framerate(de265_decoder_context* ctx, int more) {
  tde265_ctx* c = C(ctx);
  int tid = c->dec.limit_tid + (more > 0 ? 1 : -1);
  tid = clip3(0, c->dec.highest_tid(), tid);
  c->dec.limit_tid = tid;
  return c->dec.framerate_ratio;
}

// ---------------------------------------------------------------------------
// parameters
// ---------------------------------------------------------------------------
de265_error de265_set_parameter_bool(de265_decoder_context* ctx,
                                     enum de265_param param, int value) {
  Decoder& d = C(ctx)->dec;
  switch (param) {
    case DE265_DECODER_PARAM_BOOL_SEI_CHECK_HASH: d.check_sei_hash = value; break;
    case DE265_DECODER_PARAM_SUPPRESS_FAULTY_PICTURES: d.suppress_faulty_pictures = value; break;
    case DE265_DECODER_PARAM_DISABLE_DEBLOCKING: d.disable_deblocking = value; break;
    case DE265_DECODER_PARAM_DISABLE_SAO: d.disable_sao = value; break;
    default: return DE265_ERROR_PARAMETER_PARSING;
  }
  return DE265_OK;
}

de265_error de265_set_parameter_int(de265_decoder_context* ctx,
                                    enum de265_param param, int value) {
  switch (param) {
    case DE265_DECODER_PARAM_ACCELERATION_CODE:
      C(ctx)->acceleration = value;
      return DE265_OK;
    case DE265_DECODER_PARAM_DUMP_SPS_HEADERS:
      C(ctx)->dec.dump_sps_fd = value;
      return DE265_OK;
    case DE265_DECODER_PARAM_DUMP_VPS_HEADERS:
      C(ctx)->dec.dump_vps_fd = value;
      return DE265_OK;
    case DE265_DECODER_PARAM_DUMP_PPS_HEADERS:
      C(ctx)->dec.dump_pps_fd = value;
      return DE265_OK;
    case DE265_DECODER_PARAM_DUMP_SLICE_HEADERS:
      C(ctx)->dec.dump_slice_fd = value;
      return DE265_OK;
    default:
      return DE265_ERROR_PARAMETER_PARSING;
  }
}

int de265_get_parameter_bool(de265_decoder_context* ctx, enum de265_param param) {
  Decoder& d = C(ctx)->dec;
  switch (param) {
    case DE265_DECODER_PARAM_BOOL_SEI_CHECK_HASH: return d.check_sei_hash;
    case DE265_DECODER_PARAM_SUPPRESS_FAULTY_PICTURES: return d.suppress_faulty_pictures;
    case DE265_DECODER_PARAM_DISABLE_DEBLOCKING: return d.disable_deblocking;
    case DE265_DECODER_PARAM_DISABLE_SAO: return d.disable_sao;
    default: return 0;
  }
}

// ---------------------------------------------------------------------------
// security limits
// ---------------------------------------------------------------------------
static de265_security_limits g_disabled_limits = {0, 0, 0, 0, 0};

const de265_security_limits* de265_get_security_limits(de265_decoder_context* ctx) {
  tde265_ctx* c = C(ctx);
  c->limits_c.max_image_width = c->dec.limits.max_image_width;
  c->limits_c.max_image_height = c->dec.limits.max_image_height;
  c->limits_c.max_image_area = c->dec.limits.max_image_area;
  c->limits_c.max_NAL_size = c->dec.limits.max_nal_size;
  c->limits_c.max_SEI_per_AU = c->dec.limits.max_sei_per_au;
  return &c->limits_c;
}

de265_error de265_set_security_limits(de265_decoder_context* ctx,
                                      const de265_security_limits* limits) {
  if (!limits) return DE265_ERROR_PARAMETER_PARSING;
  tde265_ctx* c = C(ctx);
  c->dec.limits.max_image_width = limits->max_image_width ? limits->max_image_width : 0xFFFFFFFF;
  c->dec.limits.max_image_height = limits->max_image_height ? limits->max_image_height : 0xFFFFFFFF;
  c->dec.limits.max_image_area = limits->max_image_area;
  c->dec.limits.max_nal_size = limits->max_NAL_size ? limits->max_NAL_size : (u64)1 << 40;
  c->dec.limits.max_sei_per_au = limits->max_SEI_per_AU ? limits->max_SEI_per_AU : 0xFFFFFFFF;
  return DE265_OK;
}

const de265_security_limits* de265_get_disabled_security_limits(void) {
  return &g_disabled_limits;
}

// ===========================================================================
// tde265 extensions: FrameProgram tensor export for the Python/JAX pipeline
// ===========================================================================

struct tde265_program_view {
  int32_t poc;
  int32_t width, height, chroma_width, chroma_height;
  int32_t bytes_pp;
  int32_t bit_depth[3];
  uint8_t* plane[3];
  int32_t stride[3];
  int32_t n_ops;
  const uint8_t* op_kind;   // n_ops (strided: sizeof(Op))
  const uint8_t* op_raw;    // raw Op array
  int32_t op_stride;
  int32_t n_tus;
  const uint8_t* tu_raw;    // raw TuRec array
  int32_t tu_stride;
  int32_t n_pus;
  const uint8_t* pu_raw;
  int32_t pu_stride;
  int32_t n_intras;
  const uint8_t* intra_raw;
  int32_t intra_stride;
  int32_t n_coeffs;
  const int16_t* coeff_val;
  const uint16_t* coeff_pos;
  int32_t n_refs;
  uint8_t* ref_plane[16][3];
  int32_t ref_poc[16];
  // per-4x4 metadata for filters
  int32_t pb_w, pb_h;
  const int8_t* qp_y;
  const uint8_t* nonzero_coeff;
  const uint8_t* deblock_flags;
  const uint8_t* cu_info;
  const uint8_t* sao_raw;   // raw SaoParams per CTB
  int32_t sao_stride;
  int32_t ctb_w, ctb_h;
  const uint16_t* slice_idx;      // per CTB
  int32_t n_slices;
  const int32_t* slice_records;   // n_slices x 208 i32 (see program.h)
  int32_t scaling_enabled;        // scaling lists active for this picture
  const uint8_t* scaling_factors; // 6x16|6x64|6x256|6x1024 expanded (or NULL)
  const int32_t* slice_addr;      // per-CTB SliceAddrRs
  const int32_t* tile_id;         // per-CTB tile id
  int32_t across_tiles;           // pps loop_filter_across_tiles
  int32_t ctb_size;               // luma CTB size (16/32/64)
  int32_t n_pcms;
  const uint8_t* pcm_raw;         // raw PcmRec array
  int32_t pcm_stride;
  const uint16_t* pcm_data;       // raw samples (Y,Cb,Cr per block)
  int32_t n_pcm_data;
  int32_t pcm_bit_depth[2];       // luma, chroma
  int32_t pcm_loop_filter_disable;
  const int32_t* pu_idx;          // per-4x4 covering-PU index (-1 = none)
  // device intra plan (intraplan.cc), all length n_intras unless noted
  const int32_t* ip_step;
  const int32_t* ip_slot;
  const int32_t* ip_rrow;
  const uint8_t* ip_flags;
  const uint8_t* ip_edge;
  const int32_t* ip_border_pos;   // ip_n_border entries
  const int32_t* ip_border_sub;
  const uint32_t* ip_border_off;  // n_intras + 1
  int32_t ip_n_border;
};

}  // extern "C"

namespace tde265 {
// Internal accessor for the native feed packer (feedpack.cc).
FrameProgram* internal_program_at(de265_decoder_context* ctx, int idx) {
  Decoder& d = C(ctx)->dec;
  std::lock_guard<std::mutex> lk(d.programs_mutex);
  if (idx < 0 || idx >= (int)d.finished_programs.size()) return nullptr;
  return d.finished_programs[idx].get();
}
}  // namespace tde265

extern "C" {

LIBDE265_API void tde265_set_keep_programs(de265_decoder_context* ctx, int keep) {
  C(ctx)->dec.keep_programs = keep != 0;
}

LIBDE265_API void tde265_set_parse_only(de265_decoder_context* ctx, int on) {
  C(ctx)->dec.parse_only = on != 0;
  if (on) C(ctx)->dec.keep_programs = true;
}

LIBDE265_API int tde265_num_programs(de265_decoder_context* ctx) {
  std::lock_guard<std::mutex> lk(C(ctx)->dec.programs_mutex);
  return (int)C(ctx)->dec.finished_programs.size();
}

LIBDE265_API int tde265_get_program(de265_decoder_context* ctx, int idx,
                                    tde265_program_view* out) {
  Decoder& d = C(ctx)->dec;
  FrameProgram* pp;
  {
    std::lock_guard<std::mutex> lk(d.programs_mutex);
    if (idx < 0 || idx >= (int)d.finished_programs.size()) return -1;
    pp = d.finished_programs[idx].get();
  }
  FrameProgram& p = *pp;
  if (!p.snapshot) return -2;
  FrameProgram::Snapshot& s = *p.snapshot;
  memset(out, 0, sizeof(*out));
  out->poc = s.poc;
  out->width = s.width;
  out->height = s.height;
  out->chroma_width = s.chroma_width;
  out->chroma_height = s.chroma_height;
  out->bytes_pp = s.bytes_pp;
  for (int c = 0; c < 3; c++) {
    out->bit_depth[c] = s.bit_depth[c];
    out->plane[c] = s.plane[c].empty() ? nullptr : s.plane[c].data();
    out->stride[c] = s.stride[c];
  }
  out->n_ops = (int32_t)p.ops.size();
  out->op_raw = reinterpret_cast<const uint8_t*>(p.ops.data());
  out->op_stride = sizeof(Op);
  out->n_tus = (int32_t)p.tus.size();
  out->tu_raw = reinterpret_cast<const uint8_t*>(p.tus.data());
  out->tu_stride = sizeof(TuRec);
  out->n_pus = (int32_t)p.pus.size();
  out->pu_raw = reinterpret_cast<const uint8_t*>(p.pus.data());
  out->pu_stride = sizeof(PuRec);
  out->n_intras = (int32_t)p.intras.size();
  out->intra_raw = reinterpret_cast<const uint8_t*>(p.intras.data());
  out->intra_stride = sizeof(IntraRec);
  out->n_coeffs = (int32_t)p.coeff_val.size();
  out->coeff_val = p.coeff_val.data();
  out->coeff_pos = p.coeff_pos.data();
  out->n_refs = (int32_t)min_i((int)s.ref_pocs.size(), 16);
  for (int r = 0; r < out->n_refs; r++) {
    for (int c = 0; c < 3; c++) {
      // parse-only snapshots carry no reference pixel copies
      if ((size_t)(r * 3 + c) < s.ref_planes.size()) {
        auto& pl = s.ref_planes[r * 3 + c];
        out->ref_plane[r][c] = pl.empty() ? nullptr : pl.data();
      } else {
        out->ref_plane[r][c] = nullptr;
      }
    }
    out->ref_poc[r] = s.ref_pocs[r];
  }
  out->pb_w = s.pb_w;
  out->pb_h = s.pb_h;
  out->qp_y = s.qp_y.data();
  out->nonzero_coeff = s.nonzero_coeff.data();
  out->deblock_flags = s.deblock_flags.data();
  out->cu_info = s.cu_info.data();
  out->sao_raw = reinterpret_cast<const uint8_t*>(s.sao.data());
  out->sao_stride = sizeof(SaoParams);
  out->ctb_w = s.ctb_w;
  out->ctb_h = s.ctb_h;
  out->slice_idx = s.slice_idx.data();
  out->n_slices = (int32_t)(s.slice_records.size() /
                            FrameProgram::Snapshot::kSliceRecordLen);
  out->slice_records = s.slice_records.data();
  out->scaling_enabled = s.scaling_enabled ? 1 : 0;
  out->scaling_factors = s.scaling_enabled ? s.scaling_factors.data() : nullptr;
  out->slice_addr = s.slice_addr.data();
  out->tile_id = s.tile_id.data();
  out->across_tiles = s.across_tiles ? 1 : 0;
  out->ctb_size = s.ctb_size;
  out->n_pcms = (int32_t)p.pcms.size();
  out->pcm_raw = reinterpret_cast<const uint8_t*>(p.pcms.data());
  out->pcm_stride = sizeof(PcmRec);
  out->pcm_data = p.pcm_data.data();
  out->n_pcm_data = (int32_t)p.pcm_data.size();
  out->pcm_bit_depth[0] = s.pcm_bit_depth[0];
  out->pcm_bit_depth[1] = s.pcm_bit_depth[1];
  out->pcm_loop_filter_disable = s.pcm_loop_filter_disable ? 1 : 0;
  out->pu_idx = s.pu_idx.empty() ? nullptr : s.pu_idx.data();
  out->ip_step = s.ip_step.data();
  out->ip_slot = s.ip_slot.data();
  out->ip_rrow = s.ip_rrow.data();
  out->ip_flags = s.ip_flags.data();
  out->ip_edge = s.ip_edge.data();
  out->ip_border_pos = s.ip_border_pos.data();
  out->ip_border_sub = s.ip_border_sub.data();
  out->ip_border_off = s.ip_border_off.data();
  out->ip_n_border = (int32_t)s.ip_border_pos.size();
  return 0;
}

LIBDE265_API void tde265_clear_programs(de265_decoder_context* ctx) {
  {
    std::lock_guard<std::mutex> lk(C(ctx)->dec.programs_mutex);
    C(ctx)->dec.finished_programs.clear();
  }
}

// Re-execute the scalar pixel pipeline on a kept program (oracle for the
// JAX backend tests; operates in place on the frame planes).
LIBDE265_API int tde265_execute_program_scalar(de265_decoder_context* ctx,
                                               int idx, int run_deblock,
                                               int run_sao) {
  Decoder& d = C(ctx)->dec;
  FrameProgram* fpp;
  {
    std::lock_guard<std::mutex> lk(d.programs_mutex);
    if (idx < 0 || idx >= (int)d.finished_programs.size()) return -1;
    fpp = d.finished_programs[idx].get();
  }
  Err e = execute_program_scalar(*fpp, run_deblock != 0,
                                 run_sao != 0);
  return e == Err::OK ? 0 : -1;
}

}  // extern "C"
