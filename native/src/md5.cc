// Self-contained MD5 (RFC 1321) for SEI decoded-picture-hash checking.
// Counterpart of /root/reference/libde265/md5.{h,cc}; standard algorithm,
// independent implementation.
#include "tde265/md5.h"

#include <cstring>

namespace tde265 {

namespace {

inline u32 rotl(u32 x, int c) { return (x << c) | (x >> (32 - c)); }

const u32 K[64] = {
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
    0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
    0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
    0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
    0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
    0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};

const int S[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
                   5, 9,  14, 20, 5, 9,  14, 20, 5, 9,  14, 20, 5, 9,  14, 20,
                   4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
                   6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21};

}  // namespace

void Md5::process_block(const u8* p) {
  u32 m[16];
  for (int i = 0; i < 16; i++)
    m[i] = (u32)p[i * 4] | ((u32)p[i * 4 + 1] << 8) | ((u32)p[i * 4 + 2] << 16) |
           ((u32)p[i * 4 + 3] << 24);
  u32 a = h_[0], b = h_[1], c = h_[2], d = h_[3];
  for (int i = 0; i < 64; i++) {
    u32 f;
    int g;
    if (i < 16) {
      f = (b & c) | (~b & d);
      g = i;
    } else if (i < 32) {
      f = (d & b) | (~d & c);
      g = (5 * i + 1) & 15;
    } else if (i < 48) {
      f = b ^ c ^ d;
      g = (3 * i + 5) & 15;
    } else {
      f = c ^ (b | ~d);
      g = (7 * i) & 15;
    }
    u32 tmp = d;
    d = c;
    c = b;
    b = b + rotl(a + f + K[i] + m[g], S[i]);
    a = tmp;
  }
  h_[0] += a;
  h_[1] += b;
  h_[2] += c;
  h_[3] += d;
}

void Md5::update(const u8* data, size_t len) {
  total_ += len;
  while (len > 0) {
    size_t space = 64 - buf_len_;
    size_t take = len < space ? len : space;
    memcpy(buf_ + buf_len_, data, take);
    buf_len_ += take;
    data += take;
    len -= take;
    if (buf_len_ == 64) {
      process_block(buf_);
      buf_len_ = 0;
    }
  }
}

void Md5::final(u8 out[16]) {
  u64 bits = total_ * 8;
  u8 pad = 0x80;
  update(&pad, 1);
  u8 zero = 0;
  while (buf_len_ != 56) update(&zero, 1);
  u8 len_le[8];
  for (int i = 0; i < 8; i++) len_le[i] = (u8)(bits >> (8 * i));
  // update() would recount; process directly
  memcpy(buf_ + 56, len_le, 8);
  process_block(buf_);
  buf_len_ = 0;
  for (int i = 0; i < 4; i++) {
    out[i * 4] = (u8)h_[i];
    out[i * 4 + 1] = (u8)(h_[i] >> 8);
    out[i * 4 + 2] = (u8)(h_[i] >> 16);
    out[i * 4 + 3] = (u8)(h_[i] >> 24);
  }
}

void md5_plane(const u8* data, int width, int height, int stride, int bytes_pp,
               u8 out[16]) {
  Md5 md5;
  for (int y = 0; y < height; y++)
    md5.update(data + (size_t)y * stride * bytes_pp, (size_t)width * bytes_pp);
  md5.final(out);
}

}  // namespace tde265
