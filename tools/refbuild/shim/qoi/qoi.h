// Stub for qoi (vendored submodule absent): QOI IO disabled.
#pragma once
#include <cstddef>

typedef struct {
    unsigned int width;
    unsigned int height;
    unsigned char channels;
    unsigned char colorspace;
} qoi_desc;

#define QOI_SRGB 0
#define QOI_LINEAR 1

#ifdef QOI_IMPLEMENTATION
void *qoi_encode(const void *, const qoi_desc *, int *out_len) {
    if (out_len) *out_len = 0;
    return nullptr;
}
void *qoi_decode(const void *, int, qoi_desc *desc, int) {
    if (desc) { desc->width = desc->height = 0; desc->channels = 0; }
    return nullptr;
}
#else
void *qoi_encode(const void *data, const qoi_desc *desc, int *out_len);
void *qoi_decode(const void *data, int size, qoi_desc *desc, int channels);
#endif
