#include "tde265/bits.h"

namespace tde265 {

bool BitReader::more_rbsp_data() const {
  // The RBSP ends with rbsp_stop_one_bit (a single 1) followed by zero bits.
  // There is "more data" iff any bit strictly before the final 1-bit of the
  // payload remains unread.  Scan backwards for the last nonzero byte.
  const u8* last = end_;
  while (last > start_ && last[-1] == 0) last--;
  if (last == start_) return false;  // all zero: malformed, treat as no data
  // Position (in bits) of the final 1 bit within the stream:
  u8 b = last[-1];
  int trailing_zero_bits = 0;
  while (!(b & 1)) { b >>= 1; trailing_zero_bits++; }
  i64 stop_bit_pos = (last - start_) * 8 - trailing_zero_bits - 1;
  return bits_consumed() < stop_bit_pos;
}

}  // namespace tde265
