// Raw YUV image sources/sinks for the encoder and tools.
// Capability counterpart of /root/reference/libde265/image-io.{h,cc}
// (ImageSource_YUV / ImageSink_YUV / PacketSink).
#pragma once

#include <cstdio>
#include <string>
#include <vector>

#include "tde265/common.h"

namespace tde265 {

// Planar 4:2:0 frame in host memory.
struct RawImage {
  int width = 0, height = 0;
  std::vector<u8> y, cb, cr;
};

class ImageSourceYuv {
 public:
  bool open(const char* path, int width, int height) {
    f_ = fopen(path, "rb");
    w_ = width;
    h_ = height;
    return f_ != nullptr;
  }
  ~ImageSourceYuv() {
    if (f_) fclose(f_);
  }
  bool read(RawImage* img) {
    if (!f_) return false;
    img->width = w_;
    img->height = h_;
    img->y.resize((size_t)w_ * h_);
    img->cb.resize((size_t)w_ * h_ / 4);
    img->cr.resize((size_t)w_ * h_ / 4);
    if (fread(img->y.data(), 1, img->y.size(), f_) != img->y.size()) return false;
    if (fread(img->cb.data(), 1, img->cb.size(), f_) != img->cb.size()) return false;
    if (fread(img->cr.data(), 1, img->cr.size(), f_) != img->cr.size()) return false;
    return true;
  }

 private:
  FILE* f_ = nullptr;
  int w_ = 0, h_ = 0;
};

class ImageSinkYuv {
 public:
  bool open(const char* path) {
    f_ = fopen(path, "wb");
    return f_ != nullptr;
  }
  ~ImageSinkYuv() {
    if (f_) fclose(f_);
  }
  void write_plane(const u8* data, int width, int height, int stride,
                   int bytes_pp) {
    for (int y = 0; y < height; y++)
      fwrite(data + (size_t)y * stride * bytes_pp, bytes_pp, width, f_);
  }

 private:
  FILE* f_ = nullptr;
};

// Collects encoded packets into an Annex-B byte stream (PacketSink).
class PacketSink {
 public:
  void push(const std::vector<u8>& nal_bytes) {
    data_.insert(data_.end(), nal_bytes.begin(), nal_bytes.end());
  }
  bool write(const char* path) const {
    FILE* f = fopen(path, "wb");
    if (!f) return false;
    fwrite(data_.data(), 1, data_.size(), f);
    fclose(f);
    return true;
  }
  const std::vector<u8>& bytes() const { return data_; }

 private:
  std::vector<u8> data_;
};

}  // namespace tde265
