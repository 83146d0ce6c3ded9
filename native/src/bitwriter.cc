#include "tde265/bitwriter.h"

namespace tde265 {

void append_nal(std::vector<u8>* out, int nal_type, int temporal_id,
                const std::vector<u8>& rbsp) {
  out->push_back(0);
  out->push_back(0);
  out->push_back(0);
  out->push_back(1);
  // nal_unit_header: forbidden_zero(1) type(6) layer(6) tid_plus1(3)
  out->push_back((u8)(nal_type << 1));
  out->push_back((u8)(temporal_id + 1));
  int zrun = 0;
  for (u8 b : rbsp) {
    if (zrun >= 2 && b <= 3) {
      out->push_back(3);  // emulation_prevention_three_byte
      zrun = 0;
    }
    out->push_back(b);
    zrun = (b == 0) ? zrun + 1 : 0;
  }
}

}  // namespace tde265
