/* tde265 encoder C API — compatible with libde265's en265.h surface
 * (/root/reference/libde265/en265.h): context lifecycle, named parameters,
 * push-image / encode / get-packet loop.  Implemented in en265.cc on top of
 * tde265::Encoder.
 */
#ifndef TDE265_EN265_H
#define TDE265_EN265_H

#include "tde265/de265.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef void en265_encoder_context;

/* === context === */
LIBDE265_API en265_encoder_context* en265_new_encoder(void);
LIBDE265_API de265_error en265_free_encoder(en265_encoder_context*);
LIBDE265_API de265_error en265_start_encoder(en265_encoder_context*, int number_of_threads);

/* === parameters (named registry, like the reference configparam system) === */
LIBDE265_API de265_error en265_set_parameter_bool(en265_encoder_context*,
                                                  const char* param, int value);
LIBDE265_API de265_error en265_set_parameter_int(en265_encoder_context*,
                                                 const char* param, int value);
LIBDE265_API de265_error en265_set_parameter_string(en265_encoder_context*,
                                                    const char* param,
                                                    const char* value);
LIBDE265_API de265_error en265_set_parameter_choice(en265_encoder_context*,
                                                    const char* param,
                                                    const char* value);
LIBDE265_API const char** en265_list_parameters(en265_encoder_context*);

enum en265_parameter_type {
  en265_parameter_bool,
  en265_parameter_int,
  en265_parameter_string,
  en265_parameter_choice
};
LIBDE265_API enum en265_parameter_type en265_get_parameter_type(
    en265_encoder_context*, const char* parametername);
LIBDE265_API const char** en265_list_parameter_choices(
    en265_encoder_context*, const char* parametername);
LIBDE265_API de265_error en265_parse_command_line_parameters(
    en265_encoder_context*, int* argc, char** argv);
LIBDE265_API void en265_show_parameters(en265_encoder_context*);
struct de265_image_spec;
LIBDE265_API void en265_get_image_spec(en265_encoder_context*, int width,
                                       int height, enum de265_chroma chroma,
                                       struct de265_image_spec* out_spec);
LIBDE265_API de265_error en265_block_on_input_queue_length(
    en265_encoder_context*, int max_pending_images, int timeout_ms);
LIBDE265_API de265_error en265_trim_input_queue(en265_encoder_context*,
                                                int max_pending_images);
LIBDE265_API int en265_current_input_queue_length(en265_encoder_context*);

/* === image input === */
struct en265_image_intern;
typedef struct en265_image_intern en265_image;

LIBDE265_API en265_image* en265_allocate_image(en265_encoder_context*, int width,
                                               int height,
                                               enum de265_chroma chroma,
                                               de265_PTS pts, void* userdata);
LIBDE265_API uint8_t* en265_get_image_plane(en265_image*, int cIdx,
                                            int* out_stride);
LIBDE265_API de265_error en265_push_image(en265_encoder_context*, en265_image*);
/* Register a callback invoked when the encoder is done reading a pushed
   image (reference en265.h:45).  The image pointer passed to the callback is
   the en265_image* originally pushed; the encoder still frees the image
   struct itself after the callback returns. */
LIBDE265_API void en265_set_image_release_function(
    en265_encoder_context*,
    void (*release_func)(en265_encoder_context*, en265_image*, void* userdata),
    void* alloc_userdata);
LIBDE265_API de265_error en265_push_eof(en265_encoder_context*);

/* === encoding loop === */
LIBDE265_API de265_error en265_encode(en265_encoder_context*);

enum en265_encoder_state {
  EN265_STATE_IDLE,
  EN265_STATE_WAITING_FOR_INPUT,
  EN265_STATE_WORKING,
  EN265_STATE_OUTPUT_QUEUE_FULL,
  EN265_STATE_EOS
};
LIBDE265_API enum en265_encoder_state en265_get_encoder_state(en265_encoder_context*);

/* === output packets === */
enum en265_packet_content_type {
  EN265_PACKET_VPS = 1,
  EN265_PACKET_SPS = 2,
  EN265_PACKET_PPS = 3,
  EN265_PACKET_SEI = 4,
  EN265_PACKET_SLICE = 5,
  EN265_PACKET_SKIPPED_IMAGE = 6
};

struct en265_packet {
  int version;
  const uint8_t* data;
  int length;
  int frame_number;
  enum en265_packet_content_type content_type;
  char complete_picture;
  char final_slice;
  char dependent_slice;
  de265_PTS pts;
  void* user_data;
  void* input_image;
  void* reconstruction;
};

LIBDE265_API const struct en265_packet* en265_get_packet(en265_encoder_context*, int timeout_ms);
LIBDE265_API de265_error en265_free_packet(en265_encoder_context*, const struct en265_packet*);
LIBDE265_API int en265_number_of_queued_packets(en265_encoder_context*);

#ifdef __cplusplus
}
#endif

#endif /* TDE265_EN265_H */
