// C-API contract tests for embedder-owned image memory
// (de265_set_image_allocation_functions / de265_set_image_plane, reference
// de265.h:332-368) and header dumping to file descriptors
// (DE265_DECODER_PARAM_DUMP_*_HEADERS, reference de265.h:402-405).
#include <fcntl.h>
#include <unistd.h>

#include <array>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "tde265/de265.h"
#include "tde265/md5.h"
#include "test_harness.h"

namespace {

std::vector<unsigned char> load_stream(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return {};
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) buf.clear();
  fclose(f);
  return buf;
}

struct AllocStats {
  int gets = 0;
  int releases = 0;
  int spec_w = 0, spec_h = 0;
  std::vector<void*> live;
};

int my_get_buffer(de265_decoder_context* ctx, de265_image_spec* spec,
                  de265_image* img, void* userdata) {
  (void)ctx;
  AllocStats* st = static_cast<AllocStats*>(userdata);
  st->gets++;
  st->spec_w = spec->width;
  st->spec_h = spec->height;
  // three planes at the coded size; stride padded past the width to prove
  // the decoder honours a caller-chosen stride
  int cw = spec->format == de265_image_format_YUV420P8 ? (spec->width + 1) / 2
                                                       : spec->width;
  int ch = spec->format == de265_image_format_YUV420P8
               ? (spec->height + 1) / 2
               : spec->height;
  for (int c = 0; c < 3; c++) {
    int w = c == 0 ? spec->width : cw;
    int h = c == 0 ? spec->height : ch;
    int stride = w + 32;
    void* mem = malloc((size_t)stride * h);
    st->live.push_back(mem);
    de265_set_image_plane(img, c, mem, stride, userdata);
  }
  return 1;
}

void my_release_buffer(de265_decoder_context* ctx, de265_image* img,
                       void* userdata) {
  (void)ctx;
  (void)img;
  static_cast<AllocStats*>(userdata)->releases++;
}

// md5 over the VISIBLE image as returned by the public accessors
void hash_image(const de265_image* img, unsigned char out[16]) {
  tde265::Md5 md5;
  for (int c = 0; c < 3; c++) {
    int stride = 0;
    const uint8_t* p = de265_get_image_plane(img, c, &stride);
    int w = de265_get_image_width(img, c);
    int h = de265_get_image_height(img, c);
    for (int y = 0; y < h; y++) md5.update(p + (size_t)y * stride, w);
  }
  md5.final(out);
}

int decode_stream(const std::vector<unsigned char>& bits, AllocStats* st,
                  std::vector<std::array<unsigned char, 16>>* hashes) {
  de265_decoder_context* ctx = de265_new_decoder();
  de265_image_allocation af = {my_get_buffer, my_release_buffer};
  if (st) de265_set_image_allocation_functions(ctx, &af, st);
  de265_push_data(ctx, bits.data(), (int)bits.size(), 0, nullptr);
  de265_flush_data(ctx);
  int frames = 0;
  int more = 1;
  while (more) {
    more = 0;
    de265_decode(ctx, &more);
    const de265_image* img;
    while ((img = de265_peek_next_picture(ctx)) != nullptr) {
      std::array<unsigned char, 16> h;
      hash_image(img, h.data());
      hashes->push_back(h);
      frames++;
      de265_release_next_picture(ctx);
    }
  }
  de265_free_decoder(ctx);
  return frames;
}

}  // namespace

TDE_TEST(capi_image_allocation_hooks) {
  auto bits = load_stream("/root/reference/testdata/girlshy.h265");
  TDE_CHECK(!bits.empty());
  if (bits.empty()) return;

  // baseline: internal allocation
  std::vector<std::array<unsigned char, 16>> base_hashes;
  int base_frames = decode_stream(bits, nullptr, &base_hashes);
  TDE_CHECK_EQ(base_frames, 75);

  // embedder-owned memory: hooks observed, pixels bit-exact
  AllocStats st;
  std::vector<std::array<unsigned char, 16>> hook_hashes;
  int frames = decode_stream(bits, &st, &hook_hashes);
  TDE_CHECK_EQ(frames, 75);
  TDE_CHECK(st.gets > 0);
  TDE_CHECK_EQ(st.gets, st.releases);  // every buffer handed back
  TDE_CHECK_EQ(st.spec_w, 320);
  TDE_CHECK_EQ(st.spec_h, 240);
  TDE_CHECK_EQ((int)hook_hashes.size(), (int)base_hashes.size());
  int mismatches = 0;
  for (size_t i = 0; i < base_hashes.size(); i++)
    if (hook_hashes[i] != base_hashes[i]) mismatches++;
  TDE_CHECK_EQ(mismatches, 0);
  for (void* p : st.live) free(p);
}

TDE_TEST(capi_header_dump_fds) {
  auto bits = load_stream("/root/reference/testdata/girlshy.h265");
  TDE_CHECK(!bits.empty());
  if (bits.empty()) return;

  char tmpl[] = "/tmp/tde265_dump_XXXXXX";
  int fd = mkstemp(tmpl);
  TDE_CHECK(fd >= 0);

  de265_decoder_context* ctx = de265_new_decoder();
  de265_set_parameter_int(ctx, DE265_DECODER_PARAM_DUMP_SPS_HEADERS, fd);
  de265_set_parameter_int(ctx, DE265_DECODER_PARAM_DUMP_PPS_HEADERS, fd);
  de265_set_parameter_int(ctx, DE265_DECODER_PARAM_DUMP_SLICE_HEADERS, fd);
  de265_push_data(ctx, bits.data(), (int)bits.size(), 0, nullptr);
  de265_flush_data(ctx);
  int more = 1;
  while (more) {
    more = 0;
    de265_decode(ctx, &more);
    while (de265_peek_next_picture(ctx)) de265_release_next_picture(ctx);
  }
  de265_free_decoder(ctx);

  lseek(fd, 0, SEEK_SET);
  std::string dump;
  char buf[4096];
  ssize_t n;
  while ((n = read(fd, buf, sizeof buf)) > 0) dump.append(buf, n);
  close(fd);
  unlink(tmpl);

  TDE_CHECK(dump.find("SPS") != std::string::npos);
  TDE_CHECK(dump.find("320x240") != std::string::npos);
  TDE_CHECK(dump.find("PPS") != std::string::npos);
  TDE_CHECK(dump.find("Slice") != std::string::npos);
}
