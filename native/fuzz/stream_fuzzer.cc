// Stream fuzzer (counterpart of /root/reference/fuzzing/stream_fuzzer.cc):
// pushes arbitrary bytes through the full push-data/decode/pull loop.
// Exposes the libFuzzer entry point; when built standalone (TDE_FUZZ_MAIN),
// runs a deterministic mutation loop over a seed stream — designed to run
// under ASAN/UBSAN (scripts/fuzz.sh).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "tde265/decoder.h"

using namespace tde265;

extern "C" int LLVMFuzzerTestOneInput(const uint8_t* data, size_t size) {
  Decoder dec;
  dec.check_sei_hash = true;
  // tight security limits keep fuzzing memory bounded
  dec.limits.max_image_width = 2048;
  dec.limits.max_image_height = 2048;
  dec.limits.max_nal_size = 1 << 20;

  dec.push_data(data, size);
  dec.flush_data();
  int more = 1;
  int guard = 0;
  while (more && guard++ < 10000) {
    more = 0;
    dec.decode(&more);
    while (dec.peek_next_picture()) dec.release_next_picture();
  }
  return 0;
}

#ifdef TDE_FUZZ_MAIN
namespace {
uint32_t g_seed = 0x12345;
uint32_t rnd() {
  g_seed = g_seed * 1664525 + 1013904223;
  return g_seed >> 8;
}
}  // namespace

int main(int argc, char** argv) {
  int iterations = argc > 1 ? atoi(argv[1]) : 500;
  const char* seed_path =
      argc > 2 ? argv[2] : "/root/reference/testdata/girlshy.h265";
  if (argc > 3) g_seed = (uint32_t)atoi(argv[3]);

  std::vector<uint8_t> seed;
  if (FILE* f = fopen(seed_path, "rb")) {
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    seed.resize(n);
    if (fread(seed.data(), 1, n, f) != (size_t)n) seed.clear();
    fclose(f);
  }

  for (int it = 0; it < iterations; it++) {
    std::vector<uint8_t> input;
    int mode = rnd() % 4;
    if (mode == 0 || seed.empty()) {
      input.resize(rnd() % 4096);
      for (auto& b : input) b = (uint8_t)rnd();
    } else {
      input = seed;
      if (mode == 1) {
        // byte flips
        int flips = 1 + rnd() % 64;
        for (int i = 0; i < flips; i++)
          input[rnd() % input.size()] ^= (uint8_t)rnd();
      } else if (mode == 2) {
        // truncate
        input.resize(1 + rnd() % input.size());
      } else {
        // splice chunks
        size_t a = rnd() % input.size(), b = rnd() % input.size();
        if (a > b) std::swap(a, b);
        input.erase(input.begin() + a, input.begin() + b);
      }
    }
    if (getenv("TDE_FUZZ_DUMP")) {
      FILE* fp = fopen("/tmp/fuzz_last.bin", "wb");
      fwrite(input.data(), 1, input.size(), fp);
      fclose(fp);
    }
    LLVMFuzzerTestOneInput(input.data(), input.size());
    if ((it + 1) % 100 == 0) fprintf(stderr, "fuzz: %d iterations ok\n", it + 1);
  }
  fprintf(stderr, "fuzz: done (%d iterations)\n", iterations);
  return 0;
}
#endif
