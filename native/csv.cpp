// Fast CSV parse/serialize for observation traces and result export.
// Native equivalent of the reference's C++ IO layer
// (/root/reference/src/io.cpp and the Rcpp marshalling in run.rcpp.cpp):
// the Python fallback lives in cusmc_tpu/io/data.py; this path avoids
// per-cell Python overhead for large traces.
//
// Exported C ABI (ctypes, see cusmc_tpu/io/native.py):
//   csmc_csv_dims(path, &rows, &cols)       -> 0 ok  (rows excl. header)
//   csmc_csv_read(path, out, rows, cols)    -> 0 ok  (row-major doubles)
//   csmc_csv_write(path, header, data, rows, cols) -> 0 ok

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Read a whole file into a string; returns false on error.
bool slurp(const char* path, std::string& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(&out[0], 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

}  // namespace

extern "C" {

int csmc_csv_dims(const char* path, long* rows, long* cols) {
  std::string buf;
  if (!slurp(path, buf)) return 1;
  long r = 0, c = 1;
  size_t i = 0;
  // Header line determines column count.
  for (; i < buf.size() && buf[i] != '\n'; ++i)
    if (buf[i] == ',') ++c;
  if (i < buf.size()) ++i;  // skip newline
  bool in_line = false;
  for (; i < buf.size(); ++i) {
    if (buf[i] == '\n') { if (in_line) ++r; in_line = false; }
    else if (buf[i] != '\r') in_line = true;
  }
  if (in_line) ++r;  // no trailing newline
  *rows = r;
  *cols = c;
  return 0;
}

int csmc_csv_read(const char* path, double* out, long rows, long cols) {
  std::string buf;
  if (!slurp(path, buf)) return 1;
  const char* p = buf.c_str();
  const char* end = p + buf.size();
  while (p < end && *p != '\n') ++p;  // skip header
  if (p < end) ++p;
  for (long r = 0; r < rows; ++r) {
    for (long c = 0; c < cols; ++c) {
      char* next = nullptr;
      errno = 0;
      double v = std::strtod(p, &next);
      if (next == p) return 2;  // parse failure
      out[r * cols + c] = v;
      p = next;
      while (p < end && (*p == ',' || *p == '\r')) ++p;
    }
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
  return 0;
}

int csmc_csv_write(const char* path, const char* header, const double* data,
                   long rows, long cols) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  if (header && header[0]) std::fprintf(f, "%s\n", header);
  std::vector<char> line;
  line.reserve(static_cast<size_t>(cols) * 32);
  char num[32];
  for (long r = 0; r < rows; ++r) {
    line.clear();
    for (long c = 0; c < cols; ++c) {
      int n = std::snprintf(num, sizeof num, "%.6g", data[r * cols + c]);
      if (c) line.push_back(',');
      line.insert(line.end(), num, num + n);
    }
    line.push_back('\n');
    if (std::fwrite(line.data(), 1, line.size(), f) != line.size()) {
      std::fclose(f);
      return 2;
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
