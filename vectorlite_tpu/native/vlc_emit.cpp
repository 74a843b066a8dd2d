// Native .vlc JSON array emitter — serde_json::to_string_pretty parity.
//
// The Python emitter in persist/vlc.py renders every float through a
// pure-Python ryu-style formatter (~3.6 us/value); a 100Kx384 snapshot
// took 137 s. Here std::to_chars supplies the shortest round-trip
// digits (the same digits ryu produces) and the rendering rule below is
// the exact rule `_emit_f64` implements — ryu's `Buffer::format`
// (pretty d2s), the formatter serde_json::to_string_pretty uses
// (reference: src/persistence.rs:137):
//
//   value = 0.D1D2...Dn x 10^kk, D1 != 0
//   decimal notation while kk in (-5, 16]; otherwise scientific with a
//   bare exponent (`1e308`, `5e-324`) and no trailing `.0` mantissa.
//   Integral decimals end in `.0`; zero prints `0.0` / `-0.0`;
//   non-finite serializes as null (serde_json behavior).
//
// tests/test_vlc_native.py asserts byte equality against the Python
// formatter over the golden edge values and random bit-cast doubles,
// and whole-file byte equality of native-on vs native-off snapshots.
//
// Element mode: each value is rendered as `<pad><text>,\n` (the last
// element of the array drops the comma when last_no_comma is set), so
// Python can stream arbitrarily large arrays through bounded chunks and
// own the surrounding `[\n` / `<pad>]` brackets.

#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// Render one finite double per the rule above. Returns bytes written.
inline int fmt_f64(double x, char* out) {
  if (std::isnan(x) || std::isinf(x)) {
    std::memcpy(out, "null", 4);
    return 4;
  }
  char* p = out;
  if (std::signbit(x)) {
    *p++ = '-';
    x = -x;
  }
  if (x == 0.0) {
    std::memcpy(p, "0.0", 3);
    return int(p - out) + 3;
  }
  // shortest round-trip digits in scientific form: d[.frac]e[+-]dd
  char sci[40];
  auto res = std::to_chars(sci, sci + sizeof(sci), x,
                           std::chars_format::scientific);
  // parse mantissa digits and exponent
  char digits[24];
  int ndig = 0;
  int exp10 = 0;
  {
    const char* q = sci;
    digits[ndig++] = *q++;  // leading digit (never '0' for x > 0)
    if (*q == '.') {
      ++q;
      while (*q != 'e') digits[ndig++] = *q++;
    }
    ++q;  // 'e'
    bool neg = false;
    if (*q == '+' || *q == '-') neg = (*q++ == '-');
    while (q < res.ptr) exp10 = exp10 * 10 + (*q++ - '0');
    if (neg) exp10 = -exp10;
  }
  // shortest form has no trailing zeros, but be safe (keeps >= 1 digit)
  while (ndig > 1 && digits[ndig - 1] == '0') --ndig;
  const int kk = exp10 + 1;  // value = 0.digits x 10^kk
  if (0 < kk && kk <= 16) {
    if (ndig <= kk) {  // integer-valued: pad with zeros, add .0
      std::memcpy(p, digits, ndig);
      p += ndig;
      for (int i = ndig; i < kk; ++i) *p++ = '0';
      *p++ = '.';
      *p++ = '0';
    } else {
      std::memcpy(p, digits, kk);
      p += kk;
      *p++ = '.';
      std::memcpy(p, digits + kk, ndig - kk);
      p += ndig - kk;
    }
  } else if (-5 < kk && kk <= 0) {
    *p++ = '0';
    *p++ = '.';
    for (int i = 0; i < -kk; ++i) *p++ = '0';
    std::memcpy(p, digits, ndig);
    p += ndig;
  } else {  // scientific: D1[.rest]e<kk-1>
    *p++ = digits[0];
    if (ndig > 1) {
      *p++ = '.';
      std::memcpy(p, digits + 1, ndig - 1);
      p += ndig - 1;
    }
    *p++ = 'e';
    int e = kk - 1;
    if (e < 0) {
      *p++ = '-';
      e = -e;
    }
    char eb[8];
    int ne = 0;
    do {
      eb[ne++] = char('0' + e % 10);
      e /= 10;
    } while (e);
    while (ne) *p++ = eb[--ne];
  }
  return int(p - out);
}

inline int fmt_i64(int64_t v, char* out) {
  char* p = out;
  uint64_t u;
  if (v < 0) {
    *p++ = '-';
    u = uint64_t(~v) + 1;  // safe for INT64_MIN
  } else {
    u = uint64_t(v);
  }
  char b[24];
  int n = 0;
  do {
    b[n++] = char('0' + u % 10);
    u /= 10;
  } while (u);
  while (n) *p++ = b[--n];
  return int(p - out);
}

}  // namespace

extern "C" {

// Single-value formatter (exposed for the parity test).
int32_t vlc_fmt_f64(double x, char* out) { return fmt_f64(x, out); }

// Emit n values in element mode at `indent` (2 spaces per level). When
// last_no_comma != 0 the final element omits its comma (it is the last
// element of the JSON array). Returns bytes written, or -1 if out_cap
// could be exceeded (caller sizes via worst case: pad + 24 + 2 bytes
// per element).
int64_t vlc_emit_f64_elems(const double* vals, int64_t n, int32_t indent,
                           int32_t last_no_comma, char* out,
                           int64_t out_cap) {
  const int pad = 2 * indent;
  if (pad > 512) return -1;
  if ((pad + 26) * n > out_cap) return -1;
  char padbuf[512];
  std::memset(padbuf, ' ', pad);
  char* p = out;
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(p, padbuf, pad);
    p += pad;
    p += fmt_f64(vals[i], p);
    if (i + 1 < n || !last_no_comma) *p++ = ',';
    *p++ = '\n';
  }
  return p - out;
}

int64_t vlc_emit_i64_elems(const int64_t* vals, int64_t n, int32_t indent,
                           int32_t last_no_comma, char* out,
                           int64_t out_cap) {
  const int pad = 2 * indent;
  if (pad > 512) return -1;
  if ((pad + 23) * n > out_cap) return -1;
  char padbuf[512];
  std::memset(padbuf, ' ', pad);
  char* p = out;
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(p, padbuf, pad);
    p += pad;
    p += fmt_i64(vals[i], p);
    if (i + 1 < n || !last_no_comma) *p++ = ',';
    *p++ = '\n';
  }
  return p - out;
}

}  // extern "C"
