#include "tde265/nalu.h"

#include <algorithm>

namespace tde265 {

bool NalUnit::parse_header() {
  if (data.size() < 2) return false;
  // forbidden_zero_bit(1) nal_unit_type(6) nuh_layer_id(6) nuh_temporal_id_plus1(3)
  type = (data[0] >> 1) & 0x3F;
  layer_id = ((data[0] & 1) << 5) | (data[1] >> 3);
  temporal_id = (data[1] & 7) - 1;
  return (data[0] & 0x80) == 0 && temporal_id >= 0;
}

u32 NalUnit::destuffed_offset(u32 raw_ofs) const {
  // Each entry in `skipped` is the de-stuffed offset whose raw position had a
  // 0x03 removed after it; every removed byte before raw_ofs shifts the
  // mapping down by one.
  u32 removed = 0;
  for (u32 s : skipped) {
    if (s + removed + 1 < raw_ofs) removed++;
    else break;
  }
  return raw_ofs - removed;
}

static void destuff(const std::vector<u8>& raw, NalUnit* out) {
  out->data.clear();
  out->data.reserve(raw.size());
  out->skipped.clear();
  size_t n = raw.size();
  for (size_t i = 0; i < n; i++) {
    // 00 00 03 XX with XX <= 03 -> drop the 03 (spec 7.4.1.1)
    if (i + 2 < n && raw[i] == 0 && raw[i + 1] == 0 && raw[i + 2] == 3) {
      out->data.push_back(0);
      out->data.push_back(0);
      out->skipped.push_back((u32)out->data.size());
      i += 2;  // skip the two zeros; loop ++ skips the 0x03
    } else {
      out->data.push_back(raw[i]);
    }
  }
}

void NalParser::push_data(const u8* data, size_t size, i64 pts, void* user_data) {
  cur_pts_ = pts;
  cur_user_data_ = user_data;
  for (size_t i = 0; i < size; i++) {
    u8 b = data[i];
    if (b == 0) {
      zrun_++;
      if (in_nal_) pending_.push_back(0);
      continue;
    }
    if (b == 1 && zrun_ >= 2) {
      // Start code found. Everything accumulated minus the prefix zeros is
      // the previous NAL (if any).
      if (in_nal_) {
        size_t strip = std::min<size_t>(zrun_, pending_.size());
        emit_pending(strip);
      }
      in_nal_ = true;
      pending_.clear();
      zrun_ = 0;
      continue;
    }
    zrun_ = 0;
    if (in_nal_) pending_.push_back(b);
    if (pending_.size() > max_nal_size) {
      limit_exceeded = true;
      pending_.clear();
      in_nal_ = false;
    }
  }
}

void NalParser::push_nal(const u8* data, size_t size, i64 pts, void* user_data) {
  if (size < 2 || size > max_nal_size) {
    if (size > max_nal_size) limit_exceeded = true;
    return;
  }
  auto nal = std::make_unique<NalUnit>();
  std::vector<u8> raw(data, data + size);
  destuff(raw, nal.get());
  nal->pts = pts;
  nal->user_data = user_data;
  if (nal->parse_header()) queue_.push_back(std::move(nal));
}

void NalParser::flush_pending() {
  if (in_nal_ && !pending_.empty()) {
    // Strip trailing zeros (trailing_zero_8bits).
    size_t strip = 0;
    while (strip < pending_.size() && pending_[pending_.size() - 1 - strip] == 0) strip++;
    emit_pending(strip);
  }
  pending_.clear();
  in_nal_ = false;
  zrun_ = 0;
}

void NalParser::emit_pending(size_t strip_trailing_zeros) {
  if (pending_.size() <= strip_trailing_zeros) return;
  pending_.resize(pending_.size() - strip_trailing_zeros);
  if (pending_.size() < 2) return;
  auto nal = std::make_unique<NalUnit>();
  destuff(pending_, nal.get());
  nal->pts = cur_pts_;
  nal->user_data = cur_user_data_;
  if (nal->parse_header()) queue_.push_back(std::move(nal));
}

std::unique_ptr<NalUnit> NalParser::pop() {
  if (queue_.empty()) return nullptr;
  auto nal = std::move(queue_.front());
  queue_.pop_front();
  return nal;
}

void NalParser::reset() {
  pending_.clear();
  queue_.clear();
  zrun_ = 0;
  in_nal_ = false;
  end_of_stream_ = false;
  end_of_frame_ = false;
  limit_exceeded = false;
}

}  // namespace tde265
