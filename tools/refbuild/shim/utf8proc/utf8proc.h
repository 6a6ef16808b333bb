// Stub for utf8proc (vendored submodule absent): normalization becomes a
// byte-copy (scene files here are ASCII).
#pragma once
#include <cstdlib>
#include <cstring>

typedef int utf8proc_option_t;
typedef unsigned char utf8proc_uint8_t;
typedef long utf8proc_ssize_t;

#define UTF8PROC_COMPOSE 1
#define UTF8PROC_DECOMPOSE 2
#define UTF8PROC_STABLE 4

inline utf8proc_ssize_t utf8proc_map(const unsigned char *str,
                                     utf8proc_ssize_t strlen_,
                                     utf8proc_uint8_t **dstptr,
                                     utf8proc_option_t) {
    utf8proc_uint8_t *out = (utf8proc_uint8_t *)malloc(strlen_ + 1);
    memcpy(out, str, strlen_);
    out[strlen_] = 0;
    *dstptr = out;
    return strlen_;
}

inline const char *utf8proc_errmsg(utf8proc_ssize_t) {
    return "utf8proc disabled in this build";
}
