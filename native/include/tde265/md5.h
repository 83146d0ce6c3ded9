#pragma once

#include "tde265/common.h"

namespace tde265 {

class Md5 {
 public:
  void update(const u8* data, size_t len);
  void final(u8 out[16]);

 private:
  void process_block(const u8* p);
  u32 h_[4] = {0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476};
  u8 buf_[64];
  size_t buf_len_ = 0;
  u64 total_ = 0;
};

// MD5 over a (possibly strided) pixel plane.
void md5_plane(const u8* data, int width, int height, int stride, int bytes_pp,
               u8 out[16]);

}  // namespace tde265
