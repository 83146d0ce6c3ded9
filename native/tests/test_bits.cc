#include "tde265/bits.h"
#include "tde265/nalu.h"
#include "test_harness.h"

using namespace tde265;

TDE_TEST(bitreader_basic) {
  const u8 data[] = {0xA5, 0x3C, 0xFF, 0x00};
  BitReader br(data, sizeof(data));
  TDE_CHECK_EQ(br.u(4), 0xA);
  TDE_CHECK_EQ(br.u(4), 0x5);
  TDE_CHECK_EQ(br.u(8), 0x3C);
  TDE_CHECK_EQ(br.u(16), 0xFF00);
  TDE_CHECK(br.ok());
  br.u(1);
  TDE_CHECK(!br.ok());  // overrun
}

TDE_TEST(bitreader_ue_se) {
  // ue: 1 -> 0; 010 -> 1; 011 -> 2; 00100 -> 3 ...
  const u8 data[] = {0b10100110, 0b01000010, 0b10000000};
  BitReader br(data, sizeof(data));
  TDE_CHECK_EQ(br.ue(), 0);   // 1
  TDE_CHECK_EQ(br.ue(), 1);   // 010
  TDE_CHECK_EQ(br.ue(), 2);   // 011
  TDE_CHECK_EQ(br.ue(), 3);   // 00100
  TDE_CHECK_EQ(br.ue(), 4);   // 00101
  // se mapping: k=0 -> 0, k=1 -> +1, k=2 -> -1, k=3 -> +2, k=4 -> -2
  const u8 d2[] = {0b10100110, 0b01000010, 0b10000000};
  BitReader b2(d2, sizeof(d2));
  TDE_CHECK_EQ(b2.se(), 0);
  TDE_CHECK_EQ(b2.se(), 1);
  TDE_CHECK_EQ(b2.se(), -1);
  TDE_CHECK_EQ(b2.se(), 2);
  TDE_CHECK_EQ(b2.se(), -2);
}

TDE_TEST(bitreader_long) {
  // 256 bytes of counter, read back as bytes
  u8 data[256];
  for (int i = 0; i < 256; i++) data[i] = (u8)i;
  BitReader br(data, sizeof(data));
  for (int i = 0; i < 256; i++) TDE_CHECK_EQ(br.u(8), i);
  TDE_CHECK(br.ok());
}

TDE_TEST(nal_scan_and_destuff) {
  // Two NALs with 4- and 3-byte start codes; one contains an emulation seq.
  const u8 stream[] = {
      0x00, 0x00, 0x00, 0x01,  // start
      0x40, 0x01, 0xAA, 0xBB,  // VPS-ish header (type 32)
      0x00, 0x00, 0x01,        // start
      0x42, 0x01, 0x00, 0x00, 0x03, 0x02, 0x55,  // type 33, stuffed
  };
  NalParser p;
  p.push_data(stream, sizeof(stream));
  p.mark_end_of_stream();
  TDE_CHECK_EQ(p.queue_size(), 2);
  auto n1 = p.pop();
  TDE_CHECK_EQ(n1->type, 32);
  TDE_CHECK_EQ(n1->data.size(), 4);
  auto n2 = p.pop();
  TDE_CHECK_EQ(n2->type, 33);
  // de-stuffed: 42 01 00 00 02 55
  TDE_CHECK_EQ(n2->data.size(), 6);
  TDE_CHECK_EQ(n2->data[4], 0x02);
  TDE_CHECK_EQ(n2->skipped.size(), 1);
}

TDE_TEST(nal_split_pushes) {
  // Same stream pushed one byte at a time.
  const u8 stream[] = {
      0x00, 0x00, 0x01, 0x40, 0x01, 0xAA,
      0x00, 0x00, 0x01, 0x42, 0x01, 0xBB,
  };
  NalParser p;
  for (size_t i = 0; i < sizeof(stream); i++) p.push_data(stream + i, 1);
  p.mark_end_of_stream();
  TDE_CHECK_EQ(p.queue_size(), 2);
  auto n1 = p.pop();
  auto n2 = p.pop();
  TDE_CHECK_EQ(n1->type, 32);
  TDE_CHECK_EQ(n2->type, 33);
  TDE_CHECK_EQ(n2->data.size(), 3);
}
