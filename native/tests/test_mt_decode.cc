// Concurrency test (counterpart of /root/reference/dev-tools/mt-decode-test.cc):
// decode the same stream on N concurrent decoder contexts and require
// identical frame counts and identical output hashes on every thread.
#include <atomic>
#include <cstdio>
#include <thread>
#include <vector>

#include "tde265/decoder.h"
#include "tde265/md5.h"
#include "test_harness.h"

using namespace tde265;

namespace {

std::vector<u8> load_stream() {
  FILE* f = fopen("/root/reference/testdata/girlshy.h265", "rb");
  if (!f) return {};
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<u8> buf(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) buf.clear();
  fclose(f);
  return buf;
}

void decode_worker(const std::vector<u8>* stream, int* out_frames,
                   u8 out_md5[16]) {
  Decoder dec;
  dec.push_data(stream->data(), stream->size());
  dec.flush_data();
  Md5 md5;
  int frames = 0;
  int more = 1;
  while (more) {
    more = 0;
    dec.decode(&more);
    while (Frame* f = dec.peek_next_picture()) {
      for (int c = 0; c < 3; c++)
        md5.update(f->plane_ptr(c),
                   (size_t)f->stride[c] * f->plane_height(c) * f->bytes_pp);
      frames++;
      dec.release_next_picture();
    }
  }
  *out_frames = frames;
  md5.final(out_md5);
}

}  // namespace

TDE_TEST(mt_decode_contexts) {
  auto stream = load_stream();
  TDE_CHECK(!stream.empty());
  if (stream.empty()) return;

  constexpr int kThreads = 4;
  int frames[kThreads];
  u8 digests[kThreads][16];
  std::vector<std::thread> threads;
  for (int t = 0; t < kThreads; t++)
    threads.emplace_back(decode_worker, &stream, &frames[t], digests[t]);
  for (auto& th : threads) th.join();

  for (int t = 0; t < kThreads; t++) {
    TDE_CHECK_EQ(frames[t], 75);
    TDE_CHECK(memcmp(digests[t], digests[0], 16) == 0);
  }
}
