// Stub for Ptex (vendored submodule absent): ptex textures disabled in this
// throwaway reference build (baseline scenes use none).
#pragma once
#include <cstdint>
#include <string>
#include <ostream>
#include <cstddef>

namespace Ptex {

typedef enum { m_none, m_black, m_periodic, m_clamp } BorderMode;
typedef enum { dt_uint8, dt_uint16, dt_half, dt_float } DataType;

class String {
  public:
    const char *c_str() const { return s_.c_str(); }
    size_t size() const { return s_.size(); }
    const char *data() const { return s_.data(); }
    String &operator=(const char *s) {
        s_ = s;
        return *this;
    }
    std::string s_ = "ptex disabled in this build";
};

inline std::ostream &operator<<(std::ostream &os, const String &s) {
    return os << s.c_str();
}

struct TextureInfo {
    int numFaces = 0;
};

class PtexTexture {
  public:
    int numChannels() const { return 0; }
    int numFaces() const { return 0; }
    TextureInfo getInfo() const { return TextureInfo(); }
    void release() {}
    void getPixel(int, int, int, float *, int, int) {}
};

class PtexFilter {
  public:
    enum FilterType { f_point, f_bilinear, f_box, f_gaussian, f_bicubic, f_bspline, f_catmullrom, f_mitchell };
    struct Options {
        Options(FilterType, bool = false, float = 0.0f, bool = false) {}
    };
    static PtexFilter *getFilter(PtexTexture *, const Options &) { return nullptr; }
    void eval(float *, int, int, int, float, float, float, float, float, float) {}
    void release() {}
};

class PtexCache {
  public:
    struct Stats {
        uint64_t memUsed = 0, peakMemUsed = 0, filesOpen = 0, filesAccessed = 0,
                 fileReopens = 0, blockReads = 0;
    };
    static PtexCache *create(int, size_t, bool, void *, void *) {
        static PtexCache c;
        return &c;
    }
    PtexTexture *get(const char *, String &err) { return nullptr; }
    void getStats(Stats &s) { s = Stats(); }
    void release() {}
    void setSearchPath(const char *) {}
};

}  // namespace Ptex

class PtexErrorHandler {
  public:
    virtual ~PtexErrorHandler() {}
    virtual void reportError(const char *) {}
};
