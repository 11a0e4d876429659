// COCO-compatible RLE codec + mask IoU, C implementation.
//
// Native replacement for the pycocotools `_mask` C extension that the
// reference depends on (SURVEY.md 2.3): RLE encode/decode and pairwise mask
// IoU are the only hot native paths in the evaluation pipeline. Exposed via
// a plain C ABI and loaded with ctypes (no pybind11 in this image).
//
// Format: column-major run lengths starting with a zero-run, serialized as
// base-6-bit ascii with continuation bit 0x20 and deltas from counts[i-2]
// for i > 2 (byte-identical to the COCO codec).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// run-length <-> string
// ---------------------------------------------------------------------------

static void runs_to_string(const std::vector<int64_t>& cnts, std::vector<char>& out) {
  const size_t m = cnts.size();
  for (size_t i = 0; i < m; i++) {
    int64_t x = cnts[i];
    if (i > 2) x -= cnts[i - 2];
    bool more = true;
    while (more) {
      char c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? x != -1 : x != 0;
      if (more) c |= 0x20;
      c += 48;
      out.push_back(c);
    }
  }
}

static void string_to_runs(const char* s, int64_t n, std::vector<int64_t>& cnts) {
  int64_t p = 0;
  while (p < n) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    // bounds-checked: a truncated string whose last byte carries the
    // continuation bit must not read past the buffer; shifts are clamped
    // below 64 bits (>= 64-bit shifts are UB and only reachable on
    // malformed input)
    while (more && p < n) {
      char c = s[p] - 48;
      if (k < 12) x |= (int64_t)(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      p++;
      if (!more && (c & 0x10) && k < 11) x |= -1LL << (5 * k + 5);
      k++;
    }
    if (cnts.size() > 2) x += cnts[cnts.size() - 2];
    cnts.push_back(x);
  }
}

// encode: flat column-major uint8 mask (h*w) -> ascii string.
// Returns length written; out must have capacity >= 6*h*w+6.
int64_t rle_encode(const uint8_t* flat, int64_t h, int64_t w, char* out) {
  const int64_t n = h * w;
  std::vector<int64_t> runs;
  runs.reserve(256);
  uint8_t cur = 0;  // runs start with zeros
  int64_t cnt = 0;
  for (int64_t i = 0; i < n; i++) {
    uint8_t v = flat[i] ? 1 : 0;
    if (v != cur) {
      runs.push_back(cnt);
      cur = v;
      cnt = 1;
    } else {
      cnt++;
    }
  }
  runs.push_back(cnt);
  std::vector<char> buf;
  buf.reserve(runs.size() * 6);
  runs_to_string(runs, buf);
  memcpy(out, buf.data(), buf.size());
  return (int64_t)buf.size();
}

// decode: ascii string -> flat column-major uint8 mask (h*w).
void rle_decode(const char* s, int64_t slen, int64_t h, int64_t w, uint8_t* out) {
  std::vector<int64_t> runs;
  string_to_runs(s, slen, runs);
  const int64_t n = h * w;
  int64_t pos = 0;
  uint8_t v = 0;
  for (size_t i = 0; i < runs.size() && pos < n; i++) {
    int64_t c = runs[i];
    // malformed (negative) run counts must not reach memset: a negative
    // int64 cast to size_t is ~2^64 and segfaults the whole process
    if (c < 0) c = 0;
    if (c > n - pos) c = n - pos;
    memset(out + pos, v, (size_t)c);
    pos += c;
    v = 1 - v;
  }
  if (pos < n) memset(out + pos, 0, (size_t)(n - pos));
}

static int64_t runs_area(const std::vector<int64_t>& r) {
  int64_t a = 0;
  for (size_t i = 1; i < r.size(); i += 2) a += r[i];
  return a;
}

// intersection area of two run-length lists via two-pointer sweep
static int64_t runs_intersect(const std::vector<int64_t>& a, const std::vector<int64_t>& b) {
  int64_t inter = 0;
  size_t ia = 0, ib = 0;
  int64_t ca = a.empty() ? 0 : a[0], cb = b.empty() ? 0 : b[0];
  uint8_t va = 0, vb = 0;
  while (ia < a.size() && ib < b.size()) {
    int64_t step = ca < cb ? ca : cb;
    if (va && vb) inter += step;
    ca -= step;
    cb -= step;
    if (ca == 0) {
      ia++;
      va = !va;
      if (ia < a.size()) ca = a[ia];
    }
    if (cb == 0) {
      ib++;
      vb = !vb;
      if (ib < b.size()) cb = b[ib];
    }
  }
  return inter;
}

// pairwise IoU between ndt and ngt RLE strings.
// dts/gts: concatenated strings; dt_off/gt_off: offsets (len n+1).
void rle_iou(const char* dts, const int64_t* dt_off, int64_t ndt,
             const char* gts, const int64_t* gt_off, int64_t ngt,
             const uint8_t* iscrowd, double* out) {
  std::vector<std::vector<int64_t>> druns(ndt), gruns(ngt);
  std::vector<int64_t> dareas(ndt), gareas(ngt);
  for (int64_t i = 0; i < ndt; i++) {
    string_to_runs(dts + dt_off[i], dt_off[i + 1] - dt_off[i], druns[i]);
    dareas[i] = runs_area(druns[i]);
  }
  for (int64_t j = 0; j < ngt; j++) {
    string_to_runs(gts + gt_off[j], gt_off[j + 1] - gt_off[j], gruns[j]);
    gareas[j] = runs_area(gruns[j]);
  }
  for (int64_t i = 0; i < ndt; i++) {
    for (int64_t j = 0; j < ngt; j++) {
      int64_t inter = runs_intersect(druns[i], gruns[j]);
      double denom = iscrowd && iscrowd[j]
                         ? (double)dareas[i]
                         : (double)(dareas[i] + gareas[j] - inter);
      out[i * ngt + j] = denom > 0 ? (double)inter / denom : 0.0;
    }
  }
}

// raw run-lengths -> COCO LEB string; returns byte count. Lets the host
// build per-query RLE straight from label-map runs (one pass over the
// segmentation instead of one full mask encode per query).
int64_t rle_runs_to_string(const int64_t* runs, int64_t n, char* out) {
  std::vector<int64_t> cnts(runs, runs + n);
  std::vector<char> buf;
  buf.reserve(n * 4);
  runs_to_string(cnts, buf);
  std::copy(buf.begin(), buf.end(), out);
  return static_cast<int64_t>(buf.size());
}

int64_t rle_area(const char* s, int64_t slen) {
  std::vector<int64_t> runs;
  string_to_runs(s, slen, runs);
  return runs_area(runs);
}

}  // extern "C"
