/*
 * C replacements for the symbols that originally came from the nasm
 * .asm sources (this build environment has no nasm/yasm).  Each stub
 * forwards to the corresponding C implementation (or is implemented
 * directly when trivial) so the encoder links and runs without the
 * hand-written assembly tier; all other SIMD tiers (intrinsics .c
 * files) still build at full speed.
 */
#include <stdint.h>
#include <string.h>
#include "EbDefinitions.h"

typedef uint8_t *EbByte;

/* --- aom intra predictors: forward _sse2 -> _c (aom_dsp_rtcd.h) --- */
#define FWD_PRED(name)                                                       \
    void aom_##name##_c(uint8_t *dst, ptrdiff_t stride,                      \
                        const uint8_t *above, const uint8_t *left);          \
    void aom_##name##_sse2(uint8_t *dst, ptrdiff_t stride,                   \
                           const uint8_t *above, const uint8_t *left) {      \
        aom_##name##_c(dst, stride, above, left);                            \
    }

FWD_PRED(dc_128_predictor_16x16)
FWD_PRED(dc_128_predictor_4x4)
FWD_PRED(dc_128_predictor_8x8)
FWD_PRED(dc_left_predictor_16x16)
FWD_PRED(dc_left_predictor_4x4)
FWD_PRED(dc_left_predictor_8x8)
FWD_PRED(dc_predictor_16x16)
FWD_PRED(dc_predictor_4x4)
FWD_PRED(dc_predictor_8x8)
FWD_PRED(dc_top_predictor_16x16)
FWD_PRED(dc_top_predictor_4x4)
FWD_PRED(dc_top_predictor_8x8)
FWD_PRED(h_predictor_16x16)
FWD_PRED(h_predictor_4x4)
FWD_PRED(h_predictor_8x8)
FWD_PRED(v_predictor_16x16)
FWD_PRED(v_predictor_4x4)
FWD_PRED(v_predictor_8x8)

/* 32x32 variants appear in some dispatch tables too; harmless extras */

#define FWD_PRED_HBD(name)                                                   \
    void aom_highbd_##name##_c(uint16_t *dst, ptrdiff_t stride,              \
                               const uint16_t *above, const uint16_t *left,  \
                               int32_t bd);                                  \
    void aom_highbd_##name##_sse2(uint16_t *dst, ptrdiff_t stride,           \
                                  const uint16_t *above,                     \
                                  const uint16_t *left, int32_t bd) {        \
        aom_highbd_##name##_c(dst, stride, above, left, bd);                 \
    }

FWD_PRED_HBD(dc_predictor_4x4)
FWD_PRED_HBD(dc_predictor_8x8)
FWD_PRED_HBD(v_predictor_4x4)
FWD_PRED_HBD(v_predictor_8x8)

/* --- high-bitdepth block variance helpers ------------------------- */
static uint32_t hbd_calc_var(const uint16_t *src, int32_t src_stride,
                             const uint16_t *ref, int32_t ref_stride,
                             uint32_t *sse, int32_t *sum, int n) {
    int64_t s = 0;
    uint64_t ss = 0;
    for (int i = 0; i < n; i++) {
        for (int j = 0; j < n; j++) {
            const int d = src[i * src_stride + j] - ref[i * ref_stride + j];
            s += d;
            ss += (uint64_t)(d * d);
        }
    }
    *sum = (int32_t)s;
    *sse = (uint32_t)ss;
    return (uint32_t)(ss - (uint64_t)((s * s) / (n * n)));
}

uint32_t aom_highbd_calc8x8var_sse2(const uint16_t *src, int32_t src_stride,
                                    const uint16_t *ref, int32_t ref_stride,
                                    uint32_t *sse, int32_t *sum) {
    return hbd_calc_var(src, src_stride, ref, ref_stride, sse, sum, 8);
}

uint32_t aom_highbd_calc16x16var_sse2(const uint16_t *src, int32_t src_stride,
                                      const uint16_t *ref, int32_t ref_stride,
                                      uint32_t *sse, int32_t *sum) {
    return hbd_calc_var(src, src_stride, ref, ref_stride, sse, sum, 16);
}

/* --- coefficient zeroing ------------------------------------------ */
static void zero_out(int16_t *coeff, uint32_t stride, uint32_t origin,
                     uint32_t w, uint32_t h) {
    for (uint32_t i = 0; i < h; i++)
        memset(coeff + origin + i * stride, 0, w * sizeof(int16_t));
}

void zero_out_coeff4x4_sse(int16_t *c, uint32_t s, uint32_t o, uint32_t w,
                           uint32_t h) { zero_out(c, s, o, w, h); }
void zero_out_coeff8x8_sse2(int16_t *c, uint32_t s, uint32_t o, uint32_t w,
                            uint32_t h) { zero_out(c, s, o, w, h); }
void zero_out_coeff16x16_sse2(int16_t *c, uint32_t s, uint32_t o, uint32_t w,
                              uint32_t h) { zero_out(c, s, o, w, h); }
void zero_out_coeff32x32_sse2(int16_t *c, uint32_t s, uint32_t o, uint32_t w,
                              uint32_t h) { zero_out(c, s, o, w, h); }

/* --- picture copy / average --------------------------------------- */
void picture_copy_kernel(EbByte src, uint32_t src_stride, EbByte dst,
                         uint32_t dst_stride, uint32_t w, uint32_t h,
                         uint32_t bytes_per_sample);

void picture_copy_kernel_sse2(EbByte src, uint32_t src_stride, EbByte dst,
                              uint32_t dst_stride, uint32_t w, uint32_t h) {
    picture_copy_kernel(src, src_stride, dst, dst_stride, w, h, 1);
}

void picture_average_kernel_sse2_intrin(EbByte src0, uint32_t src0_stride,
                                        EbByte src1, uint32_t src1_stride,
                                        EbByte dst, uint32_t dst_stride,
                                        uint32_t w, uint32_t h);

void picture_average_kernel_sse2(EbByte src0, uint32_t src0_stride,
                                 EbByte src1, uint32_t src1_stride,
                                 EbByte dst, uint32_t dst_stride,
                                 uint32_t w, uint32_t h) {
    picture_average_kernel_sse2_intrin(src0, src0_stride, src1, src1_stride,
                                       dst, dst_stride, w, h);
}

/* --- misc ---------------------------------------------------------- */
uint32_t Log2f_SSE2(uint32_t x) {
    return x <= 1 ? 0 : (uint32_t)(31 - __builtin_clz(x));
}

void RunEmms(void) {}
