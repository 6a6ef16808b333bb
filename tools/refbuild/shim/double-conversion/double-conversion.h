// Minimal shim for the double-conversion API surface used by pbrt's
// parser.cpp and util/print.cpp (the real vendored submodule is absent in
// this checkout). Implements StringToDouble via strtod and
// DoubleToShortest(Single) via snprintf round-trips. Throwaway build aid,
// not part of any shipped artifact.
#pragma once
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <string>

namespace double_conversion {

class StringBuilder {
  public:
    StringBuilder(char *buf, int size) : buf_(buf), size_(size), pos_(0) {}
    char *buffer() { return buf_; }
    int position() const { return pos_; }
    void AddCharacter(char c) {
        if (pos_ + 1 < size_) buf_[pos_++] = c;
    }
    void AddString(const char *s) {
        while (*s) AddCharacter(*s++);
    }
    char *Finalize() {
        buf_[pos_] = '\0';
        return buf_;
    }
    // pbrt uses ToString() on some versions; keep both.
    std::string ToString() {
        buf_[pos_] = '\0';
        return std::string(buf_);
    }
    void Reset() { pos_ = 0; }

  private:
    char *buf_;
    int size_, pos_;
};

class DoubleToStringConverter {
  public:
    enum Flags {
        NO_FLAGS = 0,
        EMIT_POSITIVE_EXPONENT_SIGN = 1,
        EMIT_TRAILING_DECIMAL_POINT = 2,
        EMIT_TRAILING_ZERO_AFTER_POINT = 4,
        UNIQUE_ZERO = 8,
    };
    DoubleToStringConverter(int flags, const char *inf, const char *nan,
                            char exp_char, int lo, int hi, int max_lead,
                            int max_trail)
        : inf_(inf), nan_(nan) {}

    bool ToShortest(double v, StringBuilder *b) const { return emit(v, b, 17); }
    bool ToShortestSingle(float v, StringBuilder *b) const {
        return emit((double)v, b, 9);
    }

  private:
    bool emit(double v, StringBuilder *b, int max_digits) const {
        if (v != v) { b->AddString(nan_); return true; }
        if (v > 1.7976931348623157e308) { b->AddString(inf_); return true; }
        if (v < -1.7976931348623157e308) { b->AddCharacter('-'); b->AddString(inf_); return true; }
        char tmp[64];
        // find the shortest %.{p}g that round-trips
        for (int p = 1; p <= max_digits; ++p) {
            snprintf(tmp, sizeof(tmp), "%.*g", p, v);
            double back = strtod(tmp, nullptr);
            if (max_digits <= 9 ? ((float)back == (float)v) : (back == v))
                break;
        }
        b->AddString(tmp);
        return true;
    }
    const char *inf_, *nan_;
};

class StringToDoubleConverter {
  public:
    enum Flags {
        NO_FLAGS = 0,
        ALLOW_HEX = 1,
        ALLOW_OCTALS = 2,
        ALLOW_TRAILING_JUNK = 4,
        ALLOW_LEADING_SPACES = 8,
        ALLOW_TRAILING_SPACES = 16,
        ALLOW_SPACES_AFTER_SIGN = 32,
    };
    StringToDoubleConverter(int flags, double empty_value, double junk_value,
                            const char *inf_symbol, const char *nan_symbol)
        : empty_(empty_value), junk_(junk_value) {}

    double StringToDouble(const char *buffer, int length,
                          int *processed) const {
        if (length == 0) { *processed = 0; return empty_; }
        char tmp[128];
        int n = length < 127 ? length : 127;
        memcpy(tmp, buffer, n);
        tmp[n] = '\0';
        char *end = nullptr;
        double v = strtod(tmp, &end);
        *processed = (int)(end - tmp);
        if (end == tmp) return junk_;
        return v;
    }
    float StringToFloat(const char *buffer, int length, int *processed) const {
        return (float)StringToDouble(buffer, length, processed);
    }

  private:
    double empty_, junk_;
};

}  // namespace double_conversion
