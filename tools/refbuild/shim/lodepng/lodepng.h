// Stub for lodepng (vendored submodule absent). PNG IO disabled in this
// throwaway reference build — baseline scenes use EXR/PFM (PNG textures are
// pre-converted to PFM offline).
#pragma once
#include <string>
#include <vector>

typedef unsigned LodePNGColorType;
#define LCT_GREY 0
#define LCT_RGB 2
#define LCT_PALETTE 3
#define LCT_GREY_ALPHA 4
#define LCT_RGBA 6

typedef struct LodePNGColorMode {
    LodePNGColorType colortype;
    unsigned bitdepth;
} LodePNGColorMode;

typedef struct LodePNGInfo {
    LodePNGColorMode color;
} LodePNGInfo;

typedef struct LodePNGState {
    LodePNGInfo info_png;
    LodePNGColorMode info_raw;
} LodePNGState;

inline void lodepng_state_init(LodePNGState *s) {
    s->info_png.color.colortype = LCT_RGB;
    s->info_png.color.bitdepth = 8;
}
inline const char *lodepng_error_text(unsigned) {
    return "PNG support disabled in this build (lodepng submodule absent)";
}
inline unsigned lodepng_inspect(unsigned *w, unsigned *h, LodePNGState *,
                                const unsigned char *, size_t) {
    *w = *h = 0;
    return 1;
}
inline unsigned lodepng_encode_memory(unsigned char **, size_t *,
                                      const unsigned char *, unsigned,
                                      unsigned, LodePNGColorType, unsigned) {
    return 1;
}
inline unsigned lodepng_decode_memory(unsigned char **, unsigned *, unsigned *,
                                      const unsigned char *, size_t,
                                      LodePNGColorType, unsigned) {
    return 1;
}

namespace lodepng {
inline unsigned decode(std::vector<unsigned char> &, unsigned &w, unsigned &h,
                       const unsigned char *, size_t, LodePNGColorType = LCT_RGBA,
                       unsigned = 8) {
    w = h = 0;
    return 1;
}
inline unsigned decode(std::vector<unsigned char> &, unsigned &w, unsigned &h,
                       const std::string &, LodePNGColorType = LCT_RGBA,
                       unsigned = 8) {
    w = h = 0;
    return 1;
}
}  // namespace lodepng
