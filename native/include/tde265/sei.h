// SEI message parsing (spec Annex D); only decoded-picture-hash is
// interpreted, matching /root/reference/libde265/sei.{h,cc}.
#pragma once

#include "tde265/bits.h"
#include "tde265/common.h"

namespace tde265 {

struct Frame;

struct SeiDecodedPictureHash {
  bool present = false;
  int hash_type = -1;  // 0 MD5, 1 CRC, 2 checksum
  u8 md5[3][16] = {};
  u16 crc[3] = {};
  u32 checksum[3] = {};
};

struct SeiMessages {
  SeiDecodedPictureHash picture_hash;
};

// Parse all SEI messages in one NAL payload.
bool parse_sei(BitReader& br, SeiMessages* out, int num_planes);

// Verify a decoded picture against the hash; returns true if matching (or no
// hash present).
bool check_picture_hash(const SeiDecodedPictureHash& hash, const Frame& frame);

}  // namespace tde265
