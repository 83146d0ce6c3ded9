// en265 C API implementation (counterpart of /root/reference/libde265/
// en265.cc) with a named-parameter registry in the spirit of the reference's
// encoder/configparam system.
#include <cstring>
#include <deque>
#include <memory>
#include <string>
#include <vector>

#include "tde265/de265.h"
#include "tde265/en265.h"
#include "tde265/encoder.h"

using namespace tde265;

struct en265_image_intern {
  int width = 0, height = 0;
  int bytes_pp = 1;  // 1 for 8-bit, 2 for 10-bit (little-endian u16 samples)
  std::vector<u8> planes[3];
  int stride[3] = {};  // in samples
  de265_PTS pts = 0;
  void* userdata = nullptr;
};

namespace {

struct Packet {
  en265_packet pub;
  std::vector<u8> data;
};

struct EncCtx {
  EncoderConfig cfg;
  std::unique_ptr<Encoder> enc;
  std::deque<std::unique_ptr<en265_image_intern>> input_queue;
  std::deque<std::unique_ptr<Packet>> packets;
  bool eof = false;
  int frame_number = 0;
  bool started = false;
  void (*release_func)(en265_encoder_context*, en265_image*,
                       void* userdata) = nullptr;
  void* release_userdata = nullptr;
};

EncCtx* C(en265_encoder_context* ctx) { return reinterpret_cast<EncCtx*>(ctx); }

}  // namespace

extern "C" {

en265_encoder_context* en265_new_encoder(void) {
  return reinterpret_cast<en265_encoder_context*>(new EncCtx());
}

de265_error en265_free_encoder(en265_encoder_context* ctx) {
  delete C(ctx);
  return DE265_OK;
}

de265_error en265_start_encoder(en265_encoder_context* ctx, int) {
  C(ctx)->started = true;
  return DE265_OK;
}

de265_error en265_set_parameter_int(en265_encoder_context* ctx,
                                    const char* param, int value) {
  EncCtx* c = C(ctx);
  std::string p = param ? param : "";
  if (p == "qp" || p == "CB-intra-qp") {
    c->cfg.qp = clip3(1, 51, value);
  } else if (p == "ctb-size" || p == "max-cb-size") {
    if (value != 16 && value != 32 && value != 64)
      return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.ctb_log2 = ilog2((u32)value);
  } else if (p == "min-cb-size") {
    if (value != 8 && value != 16 && value != 32)
      return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.min_cb_log2 = ilog2((u32)value);
  } else if (p == "width") {
    c->cfg.width = value;
  } else if (p == "height") {
    c->cfg.height = value;
  } else if (p == "fps") {
    c->cfg.fps_num = value;
  } else if (p == "intra-period") {
    if (value < 0) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.intra_period = value;
  } else if (p == "pcm-threshold") {
    c->cfg.pcm_sad_threshold = value;
  } else if (p == "num-refs") {
    // up to 15 active refs per list (num_ref_idx_lX_active_minus1 <= 14)
    if (value < 1 || value > 15) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.num_refs = value;
  } else if (p == "me-range") {
    if (value < 1 || value > 64) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.me_range = value;
  } else if (p == "tile-cols") {
    if (value < 1 || value > 64) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.tile_cols = value;
  } else if (p == "tile-rows") {
    if (value < 1 || value > 64) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.tile_rows = value;
  } else if (p == "ctbs-per-slice") {
    if (value < 0) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.ctbs_per_slice = value;
  } else if (p == "cb-qp-offset") {
    if (value < -12 || value > 12) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.cb_qp_offset = value;
  } else if (p == "cr-qp-offset") {
    if (value < -12 || value > 12) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.cr_qp_offset = value;
  } else if (p == "level-idc") {
    if (value != 0 && (value < 30 || value > 186))
      return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.level_idc = value;
  } else if (p == "pyramid-levels") {
    if (value < 1 || value > 2) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.pyramid_levels = value;
  } else if (p == "bit-depth") {
    if (value < 8 || value > 10) return DE265_ERROR_PARAMETER_PARSING;
    c->cfg.bit_depth = value;
  } else {
    return DE265_ERROR_PARAMETER_PARSING;
  }
  return DE265_OK;
}

de265_error en265_set_parameter_bool(en265_encoder_context* ctx,
                                     const char* param, int value) {
  std::string p = param ? param : "";
  if (p == "scaling-lists") C(ctx)->cfg.scaling_lists = (value != 0);
  if (p == "wpp") C(ctx)->cfg.wpp = (value != 0);
  if (p == "pcm") C(ctx)->cfg.pcm = (value != 0);
  if (p == "lossless") C(ctx)->cfg.lossless = (value != 0);
  if (p == "sao") C(ctx)->cfg.sao = (value != 0);
  if (p == "adaptive-qp") C(ctx)->cfg.adaptive_qp = (value != 0);
  if (p == "sei-hash") C(ctx)->cfg.sei_hash = (value != 0);
  if (p == "b-slices") C(ctx)->cfg.use_b_slices = (value != 0);
  if (p == "tmvp") C(ctx)->cfg.tmvp = (value != 0);
  if (p == "lt-ref") C(ctx)->cfg.lt_ref = (value != 0);
  if (p == "weighted-pred") C(ctx)->cfg.weighted_pred = (value != 0);
  if (p == "sign-hiding") C(ctx)->cfg.sign_hiding = (value != 0);
  if (p == "transform-skip") C(ctx)->cfg.transform_skip = (value != 0);
  if (p == "constrained-intra") C(ctx)->cfg.constrained_intra = (value != 0);
  if (p == "ccp") C(ctx)->cfg.ccp = (value != 0);
  if (p == "across-tiles") C(ctx)->cfg.across_tiles = (value != 0);
  if (p == "rect-parts") C(ctx)->cfg.rect_parts = (value != 0);
  if (p == "dependent-slices") C(ctx)->cfg.dependent_slices = (value != 0);
  if (p == "amp") C(ctx)->cfg.amp = (value != 0);
  if (p == "open-gop") C(ctx)->cfg.open_gop = (value != 0);
  if (p == "radl") C(ctx)->cfg.radl = (value != 0);
  if (p == "rdoq") C(ctx)->cfg.rdoq = (value != 0);
  if (p == "b-pyramid") C(ctx)->cfg.b_pyramid = (value != 0);
  if (p == "rext-persistent-rice")
    C(ctx)->cfg.rext_persistent_rice = (value != 0);
  if (p == "rext-ts-rotation") C(ctx)->cfg.rext_ts_rotation = (value != 0);
  if (p == "rext-implicit-rdpcm")
    C(ctx)->cfg.rext_implicit_rdpcm = (value != 0);
  if (p == "rext-explicit-rdpcm")
    C(ctx)->cfg.rext_explicit_rdpcm = (value != 0);
  return DE265_OK;
}

de265_error en265_set_parameter_string(en265_encoder_context*, const char*,
                                       const char*) {
  return DE265_OK;
}

de265_error en265_set_parameter_choice(en265_encoder_context* ctx,
                                       const char* param, const char* value) {
  EncCtx* c = C(ctx);
  std::string p = param ? param : "";
  std::string v = value ? value : "";
  using EC = EncoderConfig;
  if (p == "intra-mode-algo" || p == "TB-IntraPredMode") {
    if (v == "fast-brute") c->cfg.intra_algo = EC::IntraAlgo::kFastBrute;
    else if (v == "brute-force") c->cfg.intra_algo = EC::IntraAlgo::kBrute;
    else if (v == "min-residual") c->cfg.intra_algo = EC::IntraAlgo::kMinSad;
    else return DE265_ERROR_PARAMETER_PARSING;
  } else if (p == "me-algo" || p == "PB-MV-Search") {
    if (v == "diamond") c->cfg.me_algo = EC::MeAlgo::kDiamond;
    else if (v == "full") c->cfg.me_algo = EC::MeAlgo::kFull;
    else if (v == "zero") c->cfg.me_algo = EC::MeAlgo::kZero;
    else return DE265_ERROR_PARAMETER_PARSING;
  } else if (p == "cb-split-algo" || p == "CB-Split") {
    if (v == "fixed-16") c->cfg.split_algo = EC::SplitAlgo::kFixed16;
    else if (v == "min-8") c->cfg.split_algo = EC::SplitAlgo::kMin8;
    else if (v == "rd") c->cfg.split_algo = EC::SplitAlgo::kRd;
    else return DE265_ERROR_PARAMETER_PARSING;
  }
  // unknown choice params accepted for compatibility (e.g. "sop-structure")
  return DE265_OK;
}

const char** en265_list_parameters(en265_encoder_context*) {
  static const char* params[] = {
      "qp",           "width",           "height",
      "fps",          "sop-structure",   "ctb-size",
      "min-cb-size",  "bit-depth",       "intra-period",
      "num-refs",     "me-range",        "tile-cols",
      "tile-rows",    "ctbs-per-slice",  "cb-qp-offset",
      "cr-qp-offset", "pcm-threshold",   "level-idc",
      "scaling-lists", "wpp",            "pcm",
      "lossless",     "sao",             "adaptive-qp",
      "sei-hash",     "b-slices",        "tmvp",
      "lt-ref",       "weighted-pred",   "sign-hiding",
      "transform-skip", "constrained-intra", "ccp",
      "across-tiles", "rect-parts",      "dependent-slices",
      "amp",          "open-gop",        "radl",
      "rdoq",         "rext-persistent-rice", "rext-ts-rotation",
      "rext-implicit-rdpcm", "rext-explicit-rdpcm",
      "b-pyramid",    "pyramid-levels",  "intra-mode-algo", "me-algo",
      "cb-split-algo", nullptr};
  return params;
}

en265_image* en265_allocate_image(en265_encoder_context* ctx, int width,
                                  int height, enum de265_chroma chroma,
                                  de265_PTS pts, void* userdata) {
  if (chroma != de265_chroma_mono && chroma != de265_chroma_420 &&
      chroma != de265_chroma_422 && chroma != de265_chroma_444)
    return nullptr;
  C(ctx)->cfg.chroma_format = (int)chroma;
  int cw = (chroma == de265_chroma_444) ? width
           : (chroma == de265_chroma_mono) ? 0
                                           : width / 2;
  int chh = (chroma == de265_chroma_420)   ? height / 2
            : (chroma == de265_chroma_mono) ? 0
                                            : height;
  auto* img = new en265_image_intern();
  img->width = width;
  img->height = height;
  img->bytes_pp = C(ctx)->cfg.bit_depth > 8 ? 2 : 1;
  img->stride[0] = width;
  img->stride[1] = img->stride[2] = cw;
  size_t bp = img->bytes_pp;
  img->planes[0].assign((size_t)width * height * bp, 0);
  img->planes[1].assign((size_t)cw * chh * bp, 0);
  img->planes[2].assign((size_t)cw * chh * bp, 0);
  if (bp == 1) {
    memset(img->planes[1].data(), 128, img->planes[1].size());
    memset(img->planes[2].data(), 128, img->planes[2].size());
  }
  img->pts = pts;
  img->userdata = userdata;
  return img;
}

uint8_t* en265_get_image_plane(en265_image* img, int cidx, int* out_stride) {
  if (!img || cidx < 0 || cidx > 2) return nullptr;
  if (out_stride) *out_stride = img->stride[cidx];
  return img->planes[cidx].data();
}

de265_error en265_push_image(en265_encoder_context* ctx, en265_image* img) {
  C(ctx)->input_queue.emplace_back(img);
  return DE265_OK;
}

de265_error en265_push_eof(en265_encoder_context* ctx) {
  C(ctx)->eof = true;
  return DE265_OK;
}

de265_error en265_encode(en265_encoder_context* ctx) {
  EncCtx* c = C(ctx);
  while (!c->input_queue.empty()) {
    auto img = std::move(c->input_queue.front());
    c->input_queue.pop_front();

    if (!c->enc) {
      c->cfg.width = img->width;
      c->cfg.height = img->height;
      c->enc = std::make_unique<Encoder>(c->cfg);
    }
    std::vector<u8> bits;
    if (img->bytes_pp == 2) {
      bits = c->enc->encode_frame16(
          reinterpret_cast<const u16*>(img->planes[0].data()), img->stride[0],
          reinterpret_cast<const u16*>(img->planes[1].data()),
          reinterpret_cast<const u16*>(img->planes[2].data()), img->stride[1]);
    } else {
      bits = c->enc->encode_frame(img->planes[0].data(), img->stride[0],
                                  img->planes[1].data(),
                                  img->planes[2].data(), img->stride[1]);
    }
    if (!bits.empty()) {
      // b-pyramid: a buffered (reordered) picture produces no bytes yet
      auto pkt = std::make_unique<Packet>();
      pkt->data = std::move(bits);
      memset(&pkt->pub, 0, sizeof(pkt->pub));
      pkt->pub.version = 1;
      pkt->pub.data = pkt->data.data();
      pkt->pub.length = (int)pkt->data.size();
      pkt->pub.frame_number = c->frame_number++;
      pkt->pub.content_type = EN265_PACKET_SLICE;
      pkt->pub.complete_picture = 1;
      pkt->pub.final_slice = 1;
      pkt->pub.pts = img->pts;
      pkt->pub.user_data = img->userdata;
      c->packets.push_back(std::move(pkt));
    }
    if (c->release_func) c->release_func(ctx, img.get(), c->release_userdata);
  }
  if (c->eof && c->enc) {
    // drain the b-pyramid reorder buffer
    auto tail = c->enc->flush_reorder();
    if (!tail.empty()) {
      auto pkt = std::make_unique<Packet>();
      pkt->data = std::move(tail);
      memset(&pkt->pub, 0, sizeof(pkt->pub));
      pkt->pub.version = 1;
      pkt->pub.data = pkt->data.data();
      pkt->pub.length = (int)pkt->data.size();
      pkt->pub.frame_number = c->frame_number++;
      pkt->pub.content_type = EN265_PACKET_SLICE;
      pkt->pub.complete_picture = 1;
      pkt->pub.final_slice = 1;
      c->packets.push_back(std::move(pkt));
    }
  }
  return DE265_OK;
}

void en265_set_image_release_function(
    en265_encoder_context* ctx,
    void (*release_func)(en265_encoder_context*, en265_image*, void* userdata),
    void* alloc_userdata) {
  EncCtx* c = C(ctx);
  c->release_func = release_func;
  c->release_userdata = alloc_userdata;
}

enum en265_encoder_state en265_get_encoder_state(en265_encoder_context* ctx) {
  EncCtx* c = C(ctx);
  if (!c->packets.empty()) return EN265_STATE_WORKING;
  if (c->eof && c->input_queue.empty()) return EN265_STATE_EOS;
  return EN265_STATE_WAITING_FOR_INPUT;
}

const en265_packet* en265_get_packet(en265_encoder_context* ctx, int) {
  EncCtx* c = C(ctx);
  if (c->packets.empty()) return nullptr;
  return &c->packets.front()->pub;
}

de265_error en265_free_packet(en265_encoder_context* ctx,
                              const en265_packet* pkt) {
  EncCtx* c = C(ctx);
  if (!c->packets.empty() && &c->packets.front()->pub == pkt)
    c->packets.pop_front();
  return DE265_OK;
}

int en265_number_of_queued_packets(en265_encoder_context* ctx) {
  return (int)C(ctx)->packets.size();
}

enum en265_parameter_type en265_get_parameter_type(en265_encoder_context*,
                                                   const char* param) {
  std::string p = param ? param : "";
  if (p == "sop-structure") return en265_parameter_choice;
  if (p == "scaling-lists" || p == "wpp" || p == "pcm" || p == "lossless" ||
      p == "sao" || p == "adaptive-qp" || p == "ccp")
    return en265_parameter_bool;
  return en265_parameter_int;
}

const char** en265_list_parameter_choices(en265_encoder_context*,
                                          const char* param) {
  static const char* sop[] = {"intra", "low-delay", nullptr};
  static const char* none[] = {nullptr};
  if (param && std::string(param) == "sop-structure") return sop;
  return none;
}

de265_error en265_parse_command_line_parameters(en265_encoder_context* ctx,
                                                int* argc, char** argv) {
  // accepts "--name value" pairs for the registered parameters and strips
  // them from argv (counterpart of the reference's configparam CLI layer)
  if (!argc || !argv) return DE265_OK;
  int out = 1;
  for (int i = 1; i < *argc; i++) {
    std::string a = argv[i];
    if (a.size() > 2 && a.rfind("--", 0) == 0 && i + 1 < *argc) {
      std::string name = a.substr(2);
      const char* val = argv[i + 1];
      de265_error err;
      if (en265_get_parameter_type(ctx, name.c_str()) == en265_parameter_bool)
        err = en265_set_parameter_bool(ctx, name.c_str(),
                                       std::string(val) != "0");
      else
        err = en265_set_parameter_int(ctx, name.c_str(), atoi(val));
      if (err == DE265_OK) {
        i++;  // consume the value
        continue;
      }
    }
    argv[out++] = argv[i];
  }
  *argc = out;
  return DE265_OK;
}

void en265_show_parameters(en265_encoder_context* ctx) {
  const char** params = en265_list_parameters(ctx);
  for (int i = 0; params[i]; i++) {
    const char* kind =
        en265_get_parameter_type(ctx, params[i]) == en265_parameter_bool
            ? "bool"
            : "int";
    fprintf(stderr, "  --%s (%s)\n", params[i], kind);
  }
}

void en265_get_image_spec(en265_encoder_context* ctx, int width, int height,
                          enum de265_chroma chroma,
                          struct de265_image_spec* out_spec) {
  (void)ctx;
  if (!out_spec) return;
  memset(out_spec, 0, sizeof(*out_spec));
  switch (chroma) {
    case de265_chroma_mono: out_spec->format = de265_image_format_mono8; break;
    case de265_chroma_422: out_spec->format = de265_image_format_YUV422P8; break;
    case de265_chroma_444: out_spec->format = de265_image_format_YUV444P8; break;
    default: out_spec->format = de265_image_format_YUV420P8; break;
  }
  // encoder pads to coding-block alignment; callers see the visible size
  int pw = (width + 7) & ~7, ph = (height + 7) & ~7;
  out_spec->width = pw;
  out_spec->height = ph;
  out_spec->alignment = 16;
  out_spec->crop_right = pw - width;
  out_spec->crop_bottom = ph - height;
  out_spec->visible_width = width;
  out_spec->visible_height = height;
}

de265_error en265_block_on_input_queue_length(en265_encoder_context* ctx,
                                              int max_pending, int) {
  // synchronous encoder: the queue drains inside en265_encode()
  (void)ctx;
  (void)max_pending;
  return DE265_OK;
}

de265_error en265_trim_input_queue(en265_encoder_context* ctx,
                                   int max_pending) {
  EncCtx* c = C(ctx);
  while ((int)c->input_queue.size() > max_i(0, max_pending))
    c->input_queue.pop_back();
  return DE265_OK;
}

int en265_current_input_queue_length(en265_encoder_context* ctx) {
  return (int)C(ctx)->input_queue.size();
}

}  // extern "C"
