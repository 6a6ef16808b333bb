// Minimal shim for wjakob/filesystem's path class (vendored submodule absent)
// backed by std::filesystem (C++17). Covers the API surface pbrt's
// util/file.cpp uses. Throwaway build aid.
#pragma once
#include <filesystem>
#include <string>

namespace filesystem {

class path {
  public:
    path() = default;
    path(const std::string &s) : p_(s) {}
    path(const char *s) : p_(s) {}
    path(const std::filesystem::path &p) : p_(p) {}

    bool empty() const { return p_.empty(); }

    bool is_absolute() const { return p_.is_absolute(); }
    bool is_directory() const {
        std::error_code ec;
        return std::filesystem::is_directory(p_, ec);
    }
    bool exists() const {
        std::error_code ec;
        return std::filesystem::exists(p_, ec);
    }
    path parent_path() const { return path(p_.parent_path()); }
    std::string extension() const {
        std::string e = p_.extension().string();
        if (!e.empty() && e[0] == '.') e = e.substr(1);
        return e;
    }
    std::string filename() const { return p_.filename().string(); }
    path make_absolute() const {
        std::error_code ec;
        auto abs = std::filesystem::absolute(p_, ec);
        return path(ec ? p_ : abs);
    }
    std::string str() const { return p_.string(); }
    path operator/(const path &other) const { return path(p_ / other.p_); }

  private:
    std::filesystem::path p_;
};

}  // namespace filesystem
