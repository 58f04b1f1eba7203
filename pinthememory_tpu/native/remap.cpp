// Fast label remapping for the data pipeline (ctypes).
//
// Replaces the reference's per-pixel Python loops: GTAV color->trainId
// (datasets/gtav.py:250-256) and id->trainId LUT application.

#include <cstdint>

extern "C" {

// 256-entry LUT remap: out[i] = lut[in[i]]
void remap_u8(const uint8_t* in, const uint8_t* lut, uint8_t* out,
              int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = lut[in[i]];
}

// RGB (HxWx3, interleaved) -> trainId via 2^24 packed LUT
void remap_rgb(const uint8_t* rgb, const uint8_t* lut24, uint8_t* out,
               int64_t npix) {
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* p = rgb + 3 * i;
    uint32_t key = (uint32_t(p[0]) << 16) | (uint32_t(p[1]) << 8) | p[2];
    out[i] = lut24[key];
  }
}

// uint16 high/low decode for Synthia-style masks: out = in & 0xff
void remap_u16_lut(const uint16_t* in, const uint8_t* lut, uint8_t* out,
                   int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    uint16_t v = in[i];
    out[i] = lut[v > 255 ? 255 : v];
  }
}

}  // extern "C"
