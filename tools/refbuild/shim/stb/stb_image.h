// Stub for stb_image (vendored submodule absent): JPG/TGA/BMP/HDR read
// disabled in this throwaway reference build.
#pragma once
#include <cstdlib>

#ifdef STB_IMAGE_IMPLEMENTATION
extern "C" {
unsigned char *stbi_load(const char *, int *x, int *y, int *n, int) {
    if (x) *x = 0;
    if (y) *y = 0;
    if (n) *n = 0;
    return nullptr;
}
float *stbi_loadf(const char *, int *x, int *y, int *n, int) {
    if (x) *x = 0;
    if (y) *y = 0;
    if (n) *n = 0;
    return nullptr;
}
void stbi_image_free(void *p) { free(p); }
const char *stbi_failure_reason(void) {
    return "stb_image disabled in this build (submodule absent)";
}
int stbi_is_hdr(const char *) { return 0; }
}
#else
extern "C" {
unsigned char *stbi_load(const char *filename, int *x, int *y, int *n, int req);
float *stbi_loadf(const char *filename, int *x, int *y, int *n, int req);
void stbi_image_free(void *p);
const char *stbi_failure_reason(void);
int stbi_is_hdr(const char *filename);
}
#endif
