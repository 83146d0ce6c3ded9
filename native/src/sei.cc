// SEI parsing + decoded-picture-hash verification (spec D.2.1 / D.3.19).
// Behavior counterpart of /root/reference/libde265/sei.cc:254-351.
#include "tde265/sei.h"

#include "tde265/frame.h"
#include "tde265/md5.h"

namespace tde265 {

static bool parse_decoded_picture_hash(BitReader& br, SeiDecodedPictureHash* h,
                                       int num_planes) {
  h->present = true;
  h->hash_type = br.u(8);
  for (int c = 0; c < num_planes; c++) {
    switch (h->hash_type) {
      case 0:
        for (int i = 0; i < 16; i++) h->md5[c][i] = (u8)br.u(8);
        break;
      case 1:
        h->crc[c] = (u16)br.u(16);
        break;
      case 2:
        h->checksum[c] = br.u(32);
        break;
      default:
        return false;
    }
  }
  return br.ok();
}

bool parse_sei(BitReader& br, SeiMessages* out, int num_planes) {
  // sei_message loop (spec 7.3.5)
  while (br.bits_remaining() >= 16) {
    int payload_type = 0;
    int b;
    do {
      b = br.u(8);
      payload_type += b;
    } while (b == 0xFF && br.ok());
    int payload_size = 0;
    do {
      b = br.u(8);
      payload_size += b;
    } while (b == 0xFF && br.ok());
    if (!br.ok()) return false;

    i64 start = br.bits_consumed();
    if (payload_type == 132) {
      if (!parse_decoded_picture_hash(br, &out->picture_hash, num_planes))
        return false;
    }
    // skip to payload end
    i64 consumed = br.bits_consumed() - start;
    i64 skip_bits = (i64)payload_size * 8 - consumed;
    if (skip_bits < 0) return false;
    while (skip_bits > 32) {
      br.skip(32);
      skip_bits -= 32;
    }
    br.skip((int)skip_bits);
    if (!br.ok()) return false;
    if (!br.more_rbsp_data()) break;
  }
  return true;
}

// spec D.3.19 CRC / checksum
static u16 compute_crc(const u8* data, int w, int h, int stride, int bytes_pp) {
  u32 crc = 0xFFFF;
  for (int y = 0; y < h; y++) {
    const u8* row = data + (size_t)y * stride * bytes_pp;
    for (int x = 0; x < w * bytes_pp; x++) {
      u8 v = row[x];
      for (int bit = 0; bit < 8; bit++) {
        u32 crc_msb = (crc >> 15) & 1;
        u32 b = (v >> (7 - bit)) & 1;
        crc = ((crc << 1) + b) & 0xFFFF;
        if (crc_msb) crc ^= 0x1021;
      }
    }
  }
  // 16 zero bits
  for (int bit = 0; bit < 16; bit++) {
    u32 crc_msb = (crc >> 15) & 1;
    crc = (crc << 1) & 0xFFFF;
    if (crc_msb) crc ^= 0x1021;
  }
  return (u16)crc;
}

static u32 compute_checksum(const u8* data, int w, int h, int stride, int bytes_pp) {
  u32 sum = 0;
  if (bytes_pp == 1) {
    for (int y = 0; y < h; y++) {
      const u8* row = data + (size_t)y * stride;
      for (int x = 0; x < w; x++) {
        u8 xor_mask = (u8)((x & 0xFF) ^ (y & 0xFF) ^ (x >> 8) ^ (y >> 8));
        sum = (sum + (row[x] ^ xor_mask)) & 0xFFFFFFFF;
      }
    }
  } else {
    for (int y = 0; y < h; y++) {
      const u16* row = reinterpret_cast<const u16*>(data) + (size_t)y * stride;
      for (int x = 0; x < w; x++) {
        u8 xor_mask = (u8)((x & 0xFF) ^ (y & 0xFF) ^ (x >> 8) ^ (y >> 8));
        sum = (sum + ((row[x] & 0xFF) ^ xor_mask)) & 0xFFFFFFFF;
        sum = (sum + ((row[x] >> 8) ^ xor_mask)) & 0xFFFFFFFF;
      }
    }
  }
  return sum;
}

bool check_picture_hash(const SeiDecodedPictureHash& hash, const Frame& frame) {
  if (!hash.present) return true;
  int n_planes = (frame.chroma_format == 0) ? 1 : 3;
  for (int c = 0; c < n_planes; c++) {
    int w = frame.plane_width(c), h = frame.plane_height(c);
    const u8* data = frame.plane_ptr(c);
    switch (hash.hash_type) {
      case 0: {
        u8 digest[16];
        md5_plane(data, w, h, frame.stride[c], frame.bytes_pp, digest);
        for (int i = 0; i < 16; i++)
          if (digest[i] != hash.md5[c][i]) return false;
        break;
      }
      case 1:
        if (compute_crc(data, w, h, frame.stride[c], frame.bytes_pp) != hash.crc[c])
          return false;
        break;
      case 2:
        if (compute_checksum(data, w, h, frame.stride[c], frame.bytes_pp) !=
            hash.checksum[c])
          return false;
        break;
    }
  }
  return true;
}

}  // namespace tde265
