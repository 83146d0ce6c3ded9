// CABAC engine tables (ITU-T H.265 Tables 9-46/9-47) and context
// initialization values (Tables 9-5..9-32, via the layout used in
// /root/reference/libde265/contextmodel.cc:211-276 — these are spec
// constants common to every HEVC codec).
#include "tde265/cabac.h"

#include <cstdio>
#include <cstdlib>

namespace tde265 {

bool g_bin_trace = false;
static struct BinTraceInit {
  BinTraceInit() { g_bin_trace = getenv("TDE_BIN_TRACE") != nullptr; }
} g_bin_trace_init;
void bin_trace(const char* kind, int bin, const void* ctx) {
  if (ctx) {
    const ContextModel* m = (const ContextModel*)ctx;
    printf("BIN %s %d s%d m%d\n", kind, bin, m->sm >> 1, m->sm & 1);
  } else {
    printf("BIN %s %d -\n", kind, bin);
  }
}


// Table 9-46: rangeTabLps[pStateIdx][qRangeIdx]
const u8 kCabacRangeTabLps[64][4] = {
    {128, 176, 208, 240}, {128, 167, 197, 227}, {128, 158, 187, 216},
    {123, 150, 178, 205}, {116, 142, 169, 195}, {111, 135, 160, 185},
    {105, 128, 152, 175}, {100, 122, 144, 166}, {95, 116, 137, 158},
    {90, 110, 130, 150},  {85, 104, 123, 142},  {81, 99, 117, 135},
    {77, 94, 111, 128},   {73, 89, 105, 122},   {69, 85, 100, 116},
    {66, 80, 95, 110},    {62, 76, 90, 104},    {59, 72, 86, 99},
    {56, 69, 81, 94},     {53, 65, 77, 89},     {51, 62, 73, 85},
    {48, 59, 69, 80},     {46, 56, 66, 76},     {43, 53, 63, 72},
    {41, 50, 59, 69},     {39, 48, 56, 65},     {37, 45, 54, 62},
    {35, 43, 51, 59},     {33, 41, 48, 56},     {32, 39, 46, 53},
    {30, 37, 43, 50},     {29, 35, 41, 48},     {27, 33, 39, 45},
    {26, 31, 37, 43},     {24, 30, 35, 41},     {23, 28, 33, 39},
    {22, 27, 32, 37},     {21, 26, 30, 35},     {20, 24, 29, 33},
    {19, 23, 27, 31},     {18, 22, 26, 30},     {17, 21, 25, 28},
    {16, 20, 23, 27},     {15, 19, 22, 25},     {14, 18, 21, 24},
    {14, 17, 20, 23},     {13, 16, 19, 22},     {12, 15, 18, 21},
    {12, 14, 17, 20},     {11, 14, 16, 19},     {11, 13, 15, 18},
    {10, 12, 15, 17},     {10, 12, 14, 16},     {9, 11, 13, 15},
    {9, 11, 12, 14},      {8, 10, 12, 14},      {8, 9, 11, 13},
    {7, 9, 11, 12},       {7, 9, 10, 12},       {7, 8, 10, 11},
    {6, 8, 9, 11},        {6, 7, 9, 10},        {6, 7, 8, 9},
    {2, 2, 2, 2}};

// Table 9-47: transIdxMps / transIdxLps
const u8 kCabacTransIdxMps[64] = {
    1,  2,  3,  4,  5,  6,  7,  8,  9,  10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 62, 63};
const u8 kCabacTransIdxLps[64] = {
    0,  0,  1,  2,  2,  4,  4,  5,  6,  7,  8,  9,  9,  11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63};

// Merged MPS/LPS transition table for the branchless decode_bin fast path:
// index = (is_lps << 6) | state.
const u8 kCabacNextState[128] = {
    // MPS transitions (state + 1, saturating at 62)
    1,  2,  3,  4,  5,  6,  7,  8,  9,  10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 62, 63,
    // LPS transitions (spec Table 9-41; same rows as kCabacTransIdxLps)
    0,  0,  1,  2,  2,  4,  4,  5,  6,  7,  8,  9,  9,  11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
};

// Merged-byte transitions for the single-load/store decode_bin fast path:
// index (is_lps << 7) | (state << 1 | mps); LPS at state 0 flips MPS.
// Generated from kCabacTransIdxMps/kCabacTransIdxLps (Tables 9-41).
const u8 kCabacNextSm[256] = {
      2,   3,   4,   5,   6,   7,   8,   9,  10,  11,  12,  13,  14,  15,  16,  17,
     18,  19,  20,  21,  22,  23,  24,  25,  26,  27,  28,  29,  30,  31,  32,  33,
     34,  35,  36,  37,  38,  39,  40,  41,  42,  43,  44,  45,  46,  47,  48,  49,
     50,  51,  52,  53,  54,  55,  56,  57,  58,  59,  60,  61,  62,  63,  64,  65,
     66,  67,  68,  69,  70,  71,  72,  73,  74,  75,  76,  77,  78,  79,  80,  81,
     82,  83,  84,  85,  86,  87,  88,  89,  90,  91,  92,  93,  94,  95,  96,  97,
     98,  99, 100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 110, 111, 112, 113,
    114, 115, 116, 117, 118, 119, 120, 121, 122, 123, 124, 125, 124, 125, 126, 127,
      1,   0,   0,   1,   2,   3,   4,   5,   4,   5,   8,   9,   8,   9,  10,  11,
     12,  13,  14,  15,  16,  17,  18,  19,  18,  19,  22,  23,  22,  23,  24,  25,
     26,  27,  26,  27,  30,  31,  30,  31,  32,  33,  32,  33,  36,  37,  36,  37,
     38,  39,  38,  39,  42,  43,  42,  43,  44,  45,  44,  45,  46,  47,  48,  49,
     48,  49,  50,  51,  52,  53,  52,  53,  54,  55,  54,  55,  56,  57,  58,  59,
     58,  59,  60,  61,  60,  61,  60,  61,  62,  63,  64,  65,  64,  65,  66,  67,
     66,  67,  66,  67,  68,  69,  68,  69,  70,  71,  70,  71,  70,  71,  72,  73,
     72,  73,  72,  73,  74,  75,  74,  75,  74,  75,  76,  77,  76,  77, 126, 127,
};

// One-load decode_bin table, generated from the two spec tables above at
// startup: lps | (next_sm_mps << 8) | (next_sm_lps << 16), indexed
// (sm << 2) | qRangeIdx.
u32 kCabacPacked[512];
static struct PackedTabInit {
  PackedTabInit() {
    for (int sm = 0; sm < 128; sm++)
      for (int q = 0; q < 4; q++)
        kCabacPacked[(sm << 2) | q] =
            (u32)kCabacRangeTabLps[sm >> 1][q] |
            ((u32)kCabacNextSm[sm] << 8) |
            ((u32)kCabacNextSm[128 | sm] << 16);
  }
} g_packed_tab_init;

// ---------------------------------------------------------------------------
// Context initialization (spec 9.3.2.2).
// ---------------------------------------------------------------------------
namespace {

void init_models(ContextModel* m, const int* init_values, int n, int qp) {
  for (int i = 0; i < n; i++) {
    int slope = (init_values[i] >> 4) * 5 - 45;
    int inter = ((init_values[i] & 15) << 3) - 16;
    int pre = clip3(1, 126, ((slope * clip3(0, 51, qp)) >> 4) + inter);
    int mps = pre > 63 ? 1 : 0;
    int state = mps ? pre - 64 : 63 - pre;
    m[i].sm = (u8)((state << 1) | mps);
  }
}

void init_const(ContextModel* m, int init_value, int n, int qp) {
  for (int i = 0; i < n; i++) init_models(&m[i], &init_value, 1, qp);
}

// Init values per syntax element; rows indexed by initType where applicable.
const int kInitSplitCu[3][3] = {{139, 141, 157}, {107, 139, 126}, {107, 139, 126}};
const int kInitCuSkip[2][3] = {{197, 185, 201}, {197, 185, 201}};
const int kInitPartMode[9] = {184, 154, 139, 154, 154, 154, 139, 154, 154};
const int kInitPrevIntraLumaPred[3] = {184, 154, 183};
const int kInitIntraChromaPredMode[3] = {63, 152, 152};
const int kInitCbfLuma[4] = {111, 141, 153, 111};
const int kInitCbfChroma[12] = {94, 138, 182, 154, 149, 107,
                                167, 154, 149, 92, 167, 154};
const int kInitSplitTransform[9] = {153, 138, 138, 124, 138, 94, 224, 167, 122};
const int kInitLastSigPrefix[54] = {
    110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
    79,  108, 123, 63,  125, 110, 94,  110, 95,  79,  125, 111, 110, 78,
    110, 111, 111, 95,  94,  108, 123, 108, 125, 110, 124, 110, 95,  94,
    125, 111, 111, 79,  125, 126, 111, 111, 79,  108, 123, 93};
const int kInitCodedSubBlock[12] = {91, 171, 134, 141, 121, 140,
                                    61, 154, 121, 140, 61, 154};
const int kInitSigCoeff[3][42] = {
    {111, 111, 125, 110, 110, 94,  124, 108, 124, 107, 125, 141, 179, 153,
     125, 107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125, 140,
     139, 182, 182, 152, 136, 152, 136, 153, 136, 139, 111, 136, 139, 111},
    {155, 154, 139, 153, 139, 123, 123, 63,  153, 166, 183, 140, 136, 153,
     154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
     153, 123, 123, 107, 121, 107, 121, 167, 151, 183, 140, 151, 183, 140},
    {170, 154, 139, 153, 139, 123, 123, 63,  124, 166, 183, 140, 136, 153,
     154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
     153, 138, 138, 122, 121, 122, 121, 167, 151, 183, 140, 151, 183, 140}};
const int kInitSigCoeffSkip[3][2] = {{141, 111}, {140, 140}, {140, 140}};
const int kInitCoeffAbsGt1[72] = {
    140, 92,  137, 138, 140, 152, 138, 139, 153, 74,  149, 92,  139, 107,
    122, 152, 140, 179, 166, 182, 140, 227, 122, 197, 154, 196, 196, 167,
    154, 152, 167, 182, 182, 134, 149, 136, 153, 121, 136, 137, 169, 194,
    166, 167, 154, 167, 137, 182, 154, 196, 167, 167, 154, 152, 167, 182,
    182, 134, 149, 136, 153, 121, 136, 122, 169, 208, 166, 167, 154, 152,
    167, 182};
const int kInitCoeffAbsGt2[18] = {138, 153, 136, 167, 152, 152, 107, 167, 91,
                                  122, 107, 167, 107, 167, 91, 107, 107, 167};
const int kInitSaoMerge[3] = {153, 153, 153};
const int kInitSaoTypeIdx[3] = {200, 185, 160};
const int kInitCuQpDeltaAbs[2] = {154, 154};
const int kInitTransformSkip[2] = {139, 139};
const int kInitMergeFlag[2] = {110, 154};
const int kInitMergeIdx[2] = {122, 137};
const int kInitPredModeFlag[2] = {149, 134};
const int kInitAbsMvdGreater01[4] = {140, 198, 169, 198};
const int kInitMvpLxFlag[1] = {168};
const int kInitRqtRootCbf[1] = {79};
const int kInitRefIdxLx[2] = {153, 153};
const int kInitInterPredIdc[5] = {95, 79, 63, 31, 31};
const int kInitCuTransquantBypass[3] = {154, 154, 154};

}  // namespace

void ContextTable::init(int t, int qp) {
  memset(m, 0, sizeof(m));

  if (t > 0) {
    init_models(m + CTX_CU_SKIP_FLAG, kInitCuSkip[t - 1], 3, qp);
    init_models(m + CTX_PRED_MODE_FLAG, &kInitPredModeFlag[t - 1], 1, qp);
    init_models(m + CTX_MERGE_FLAG, &kInitMergeFlag[t - 1], 1, qp);
    init_models(m + CTX_MERGE_IDX, &kInitMergeIdx[t - 1], 1, qp);
    init_models(m + CTX_INTER_PRED_IDC, kInitInterPredIdc, 5, qp);
    init_models(m + CTX_REF_IDX_LX, kInitRefIdxLx, 2, qp);
    init_models(m + CTX_ABS_MVD_GREATER0, &kInitAbsMvdGreater01[t == 1 ? 0 : 2], 2, qp);
    init_models(m + CTX_MVP_LX_FLAG, kInitMvpLxFlag, 1, qp);
    init_models(m + CTX_RQT_ROOT_CBF, kInitRqtRootCbf, 1, qp);
    init_const(m + CTX_RDPCM_FLAG, 139, 2, qp);
    init_const(m + CTX_RDPCM_DIR, 139, 2, qp);
  }

  init_models(m + CTX_SPLIT_CU_FLAG, kInitSplitCu[t], 3, qp);
  init_models(m + CTX_PART_MODE, &kInitPartMode[t != 2 ? t : 5], 4, qp);
  init_models(m + CTX_PREV_INTRA_LUMA_PRED, &kInitPrevIntraLumaPred[t], 1, qp);
  init_models(m + CTX_INTRA_CHROMA_PRED_MODE, &kInitIntraChromaPredMode[t], 1, qp);
  init_models(m + CTX_CBF_LUMA, &kInitCbfLuma[t == 0 ? 0 : 2], 2, qp);
  init_models(m + CTX_CBF_CHROMA, &kInitCbfChroma[t * 4], 4, qp);
  init_models(m + CTX_SPLIT_TRANSFORM_FLAG, &kInitSplitTransform[t * 3], 3, qp);
  init_models(m + CTX_LAST_SIG_X_PREFIX, &kInitLastSigPrefix[t * 18], 18, qp);
  init_models(m + CTX_LAST_SIG_Y_PREFIX, &kInitLastSigPrefix[t * 18], 18, qp);
  init_models(m + CTX_CODED_SUB_BLOCK_FLAG, &kInitCodedSubBlock[t * 4], 4, qp);
  init_models(m + CTX_SIG_COEFF_FLAG, kInitSigCoeff[t], 42, qp);
  init_models(m + CTX_SIG_COEFF_FLAG + 42, kInitSigCoeffSkip[t], 2, qp);
  init_models(m + CTX_COEFF_ABS_GT1, &kInitCoeffAbsGt1[t * 24], 24, qp);
  init_models(m + CTX_COEFF_ABS_GT2, &kInitCoeffAbsGt2[t * 6], 6, qp);
  init_models(m + CTX_SAO_MERGE_FLAG, &kInitSaoMerge[t], 1, qp);
  init_models(m + CTX_SAO_TYPE_IDX, &kInitSaoTypeIdx[t], 1, qp);
  init_models(m + CTX_CU_QP_DELTA_ABS, kInitCuQpDeltaAbs, 2, qp);
  init_models(m + CTX_TRANSFORM_SKIP_LUMA, kInitTransformSkip, 2, qp);
  init_models(m + CTX_CU_TRANSQUANT_BYPASS, &kInitCuTransquantBypass[t], 1, qp);
  init_const(m + CTX_LOG2_RES_SCALE_ABS, 154, 8, qp);
  init_const(m + CTX_RES_SCALE_SIGN, 154, 2, qp);
  init_const(m + CTX_CU_CHROMA_QP_OFFSET_FLAG, 154, 1, qp);
  init_const(m + CTX_CU_CHROMA_QP_OFFSET_IDX, 154, 1, qp);
}

}  // namespace tde265
