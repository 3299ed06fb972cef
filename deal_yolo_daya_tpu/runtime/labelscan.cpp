// labelscan — native scanner for annotation-JSON label cells.
//
// The datakit pipeline's hottest host loop is "json.loads per row, walk
// objects[].polygon.ptList" (reference pattern: core/processor.py:341-366,
// 392-398). This scanner extracts padded box arrays for whole string columns
// in one C++ pass, multithreaded, without materializing Python object trees.
//
// Schema handled: {"width":W,"height":H,"objects":[{"name":...,
//   "polygon":{"ptList":[{"x":N,"y":N},...]}}, ...]}
// The scanner is a real tokenizer w.r.t. strings (escape-aware), so label
// text containing braces/brackets cannot confuse it. Malformed cells yield
// zero boxes (matching the tolerant Python path).
//
// Exposed C ABI (ctypes):
//   void scan_boxes(const char** rows, int64 n_rows, int two_point_only,
//                   int max_boxes, float* out_boxes /* n*max*4 */,
//                   uint8* out_mask /* n*max */, int32* out_counts /* n */,
//                   float* out_wh /* n*2, -1 if absent */, int n_threads);

#include <cstdint>
#include <cstring>
#include <cctype>
#include <cstdlib>
#include <algorithm>
#include <thread>
#include <vector>
#include <cmath>

namespace {

struct Cursor {
  const char* p;
  const char* end;
  bool eof() const { return p >= end; }
};

inline void skip_ws(Cursor& c) {
  while (!c.eof() && (*c.p == ' ' || *c.p == '\t' || *c.p == '\n' || *c.p == '\r')) ++c.p;
}

// Skip a JSON string assuming c.p points at the opening quote.
inline bool skip_string(Cursor& c) {
  if (c.eof() || *c.p != '"') return false;
  ++c.p;
  while (!c.eof()) {
    if (*c.p == '\\') { c.p += 2; continue; }
    if (*c.p == '"') { ++c.p; return true; }
    ++c.p;
  }
  return false;
}

inline bool parse_number(Cursor& c, double* out) {
  char* endp = nullptr;
  double v = strtod(c.p, &endp);
  if (endp == c.p) return false;
  c.p = endp;
  *out = v;
  return true;
}

// Skip any JSON value (object/array/string/number/literal).
bool skip_value(Cursor& c) {
  skip_ws(c);
  if (c.eof()) return false;
  char ch = *c.p;
  if (ch == '"') return skip_string(c);
  if (ch == '{' || ch == '[') {
    char open = ch, close = (ch == '{') ? '}' : ']';
    int depth = 0;
    while (!c.eof()) {
      char d = *c.p;
      if (d == '"') { if (!skip_string(c)) return false; continue; }
      if (d == open) ++depth;
      else if (d == close) { --depth; if (depth == 0) { ++c.p; return true; } }
      ++c.p;
    }
    return false;
  }
  // number / true / false / null
  while (!c.eof() && *c.p != ',' && *c.p != '}' && *c.p != ']') ++c.p;
  return true;
}

// Match a key name at the cursor (cursor at opening quote). On match the
// cursor advances past `"key"` and the following `:`; else it is restored.
bool match_key(Cursor& c, const char* key) {
  const char* save = c.p;
  if (*c.p != '"') return false;
  ++c.p;
  size_t klen = strlen(key);
  if ((size_t)(c.end - c.p) < klen + 1 || memcmp(c.p, key, klen) != 0 || c.p[klen] != '"') {
    c.p = save;
    return false;
  }
  c.p += klen + 1;
  skip_ws(c);
  if (c.eof() || *c.p != ':') { c.p = save; return false; }
  ++c.p;
  return true;
}

struct Pt { double x, y; bool has_x = false, has_y = false; };

// Parse a ptList array: [{"x":..,"y":..}, ...]. Cursor at '['.
int parse_ptlist(Cursor& c, std::vector<Pt>& pts) {
  pts.clear();
  skip_ws(c);
  if (c.eof() || *c.p != '[') return -1;
  ++c.p;
  while (true) {
    skip_ws(c);
    if (c.eof()) return -1;
    if (*c.p == ']') { ++c.p; break; }
    if (*c.p == ',') { ++c.p; continue; }
    if (*c.p != '{') { if (!skip_value(c)) return -1; continue; }
    // point object
    ++c.p;
    Pt pt;
    while (true) {
      skip_ws(c);
      if (c.eof()) return -1;
      if (*c.p == '}') { ++c.p; break; }
      if (*c.p == ',') { ++c.p; continue; }
      if (*c.p == '"') {
        Cursor probe = c;
        if (match_key(c, "x")) {
          skip_ws(c);
          double v;
          if (*c.p == 'n') { skip_value(c); }            // null
          else if (parse_number(c, &v)) { pt.x = v; pt.has_x = true; }
          else return -1;
        } else if (match_key(c, "y")) {
          skip_ws(c);
          double v;
          if (*c.p == 'n') { skip_value(c); }
          else if (parse_number(c, &v)) { pt.y = v; pt.has_y = true; }
          else return -1;
        } else {
          c = probe;
          if (!skip_string(c)) return -1;                 // key
          skip_ws(c);
          if (c.eof() || *c.p != ':') return -1;
          ++c.p;
          if (!skip_value(c)) return -1;                  // value
        }
      } else {
        return -1;
      }
    }
    pts.push_back(pt);
  }
  return (int)pts.size();
}

// Scan one row. Returns number of boxes written (<= max_boxes).
int scan_row(const char* json, int two_point_only, int max_boxes,
             float* boxes, uint8_t* mask, float* wh) {
  wh[0] = -1.0f; wh[1] = -1.0f;
  if (json == nullptr) return 0;
  Cursor c{json, json + strlen(json)};
  skip_ws(c);
  if (c.eof() || *c.p != '{') return 0;
  ++c.p;

  int n_boxes = 0;
  std::vector<Pt> pts;

  // top-level key loop
  while (!c.eof()) {
    skip_ws(c);
    if (c.eof()) break;
    if (*c.p == '}') break;
    if (*c.p == ',') { ++c.p; continue; }
    if (*c.p != '"') break;

    Cursor probe = c;
    if (match_key(c, "width")) {
      skip_ws(c);
      double v;
      if (parse_number(c, &v)) wh[0] = (float)v; else if (!skip_value(c)) break;
      continue;
    }
    c = probe;
    if (match_key(c, "height")) {
      skip_ws(c);
      double v;
      if (parse_number(c, &v)) wh[1] = (float)v; else if (!skip_value(c)) break;
      continue;
    }
    c = probe;
    if (match_key(c, "objects")) {
      skip_ws(c);
      if (c.eof() || *c.p != '[') { if (!skip_value(c)) break; continue; }
      ++c.p;
      // objects array
      while (true) {
        skip_ws(c);
        if (c.eof()) break;
        if (*c.p == ']') { ++c.p; break; }
        if (*c.p == ',') { ++c.p; continue; }
        if (*c.p != '{') { if (!skip_value(c)) break; continue; }
        // one object: find polygon.ptList
        ++c.p;
        bool got_pts = false;
        int n_pts = 0;
        while (true) {
          skip_ws(c);
          if (c.eof()) break;
          if (*c.p == '}') { ++c.p; break; }
          if (*c.p == ',') { ++c.p; continue; }
          if (*c.p != '"') { break; }
          Cursor oprobe = c;
          if (match_key(c, "polygon")) {
            skip_ws(c);
            if (c.eof() || *c.p != '{') { if (!skip_value(c)) break; continue; }
            ++c.p;
            while (true) {
              skip_ws(c);
              if (c.eof()) break;
              if (*c.p == '}') { ++c.p; break; }
              if (*c.p == ',') { ++c.p; continue; }
              if (*c.p != '"') break;
              Cursor pprobe = c;
              if (match_key(c, "ptList")) {
                n_pts = parse_ptlist(c, pts);
                got_pts = n_pts >= 0;
              } else {
                c = pprobe;
                if (!skip_string(c)) break;
                skip_ws(c);
                if (c.eof() || *c.p != ':') break;
                ++c.p;
                if (!skip_value(c)) break;
              }
            }
          } else {
            c = oprobe;
            if (!skip_string(c)) break;
            skip_ws(c);
            if (c.eof() || *c.p != ':') break;
            ++c.p;
            if (!skip_value(c)) break;
          }
        }
        // finalize box for this object
        if (got_pts && n_boxes < max_boxes) {
          if (two_point_only) {
            // IoU-filter semantics: exactly 2 complete points
            if ((int)pts.size() == 2 && pts[0].has_x && pts[0].has_y
                && pts[1].has_x && pts[1].has_y) {
              float x1 = (float)std::min(pts[0].x, pts[1].x);
              float y1 = (float)std::min(pts[0].y, pts[1].y);
              float x2 = (float)std::max(pts[0].x, pts[1].x);
              float y2 = (float)std::max(pts[0].y, pts[1].y);
              float* b = boxes + n_boxes * 4;
              b[0] = x1; b[1] = y1; b[2] = x2; b[3] = y2;
              mask[n_boxes] = 1;
              ++n_boxes;
            }
          } else {
            // poly->bbox semantics: x and y extents accumulate independently
            // (a half-null point still contributes its present coordinate,
            // matching the Python parser)
            double minx = 1e300, miny = 1e300, maxx = -1e300, maxy = -1e300;
            bool any_x = false, any_y = false;
            for (const Pt& p : pts) {
              if (p.has_x) { any_x = true; minx = std::min(minx, p.x); maxx = std::max(maxx, p.x); }
              if (p.has_y) { any_y = true; miny = std::min(miny, p.y); maxy = std::max(maxy, p.y); }
            }
            bool any = any_x && any_y;
            if (any) {
              float* b = boxes + n_boxes * 4;
              b[0] = (float)minx; b[1] = (float)miny;
              b[2] = (float)maxx; b[3] = (float)maxy;
              mask[n_boxes] = 1;
              ++n_boxes;
            }
          }
        }
      }
      continue;
    }
    // other top-level key
    c = probe;
    if (!skip_string(c)) break;
    skip_ws(c);
    if (c.eof() || *c.p != ':') break;
    ++c.p;
    if (!skip_value(c)) break;
  }
  return n_boxes;
}

}  // namespace

extern "C" {

void scan_boxes(const char** rows, int64_t n_rows, int two_point_only,
                int max_boxes, float* out_boxes, uint8_t* out_mask,
                int32_t* out_counts, float* out_wh, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  auto work = [&](int64_t start, int64_t end) {
    for (int64_t i = start; i < end; ++i) {
      float* b = out_boxes + i * (int64_t)max_boxes * 4;
      uint8_t* m = out_mask + i * (int64_t)max_boxes;
      memset(b, 0, sizeof(float) * max_boxes * 4);
      memset(m, 0, max_boxes);
      out_counts[i] = scan_row(rows[i], two_point_only, max_boxes, b, m,
                               out_wh + i * 2);
    }
  };
  if (n_threads == 1 || n_rows < 1024) {
    work(0, n_rows);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t s = t * chunk, e = std::min<int64_t>(s + chunk, n_rows);
    if (s >= e) break;
    threads.emplace_back(work, s, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
