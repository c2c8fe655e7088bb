// Native host-side kernels for ocrs_tpu.
//
// The TPU owns the per-pixel work; these are the latency-critical host loops
// that sit between device stages (the counterpart of the reference's
// compiled-Rust layout analysis): Breuel max-empty-rects block separators,
// greedy line chaining, and batch CTC collapse. Python falls back to the
// numpy implementations in ocrs_tpu.layout / ocrs_tpu.ops.ctc when this
// library is unavailable; semantics here must match those exactly.
//
// Build: g++ -O3 -shared -fPIC ocrs_native.cpp -o libocrs_native.so
// Interface: plain C ABI consumed via ctypes (no pybind11 dependency).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <functional>
#include <limits>
#include <queue>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

struct Tlbr {
  double t, l, b, r;
};

// Shafait tall-rect score (layout_analysis.rs:127-135).
double shafait_score(const Tlbr& x) {
  double w = x.r - x.l;
  double h = x.b - x.t;
  double aspect = h / w;
  double la = aspect > 0 ? std::fabs(std::log2(aspect))
                         : std::numeric_limits<double>::infinity();
  double weight = la < 3.0 ? 0.5 : (la < 5.0 ? 1.5 : la);
  return std::sqrt(std::max(w, 0.0) * std::max(h, 0.0) * weight);
}

double iou(const Tlbr& a, const Tlbr& b) {
  double it = std::max(a.t, b.t), il = std::max(a.l, b.l);
  double ib = std::min(a.b, b.b), ir = std::min(a.r, b.r);
  double iw = ir - il, ih = ib - it;
  double ia = (iw > 0 && ih > 0) ? iw * ih : 0.0;
  double ua = std::max(a.r - a.l, 0.0) * std::max(a.b - a.t, 0.0) +
              std::max(b.r - b.l, 0.0) * std::max(b.b - b.t, 0.0) - ia;
  return ua > 0 ? ia / ua : 0.0;
}

struct Partition {
  double score;
  uint64_t seq;  // FIFO tie-break (matches the Python heap ordering)
  Tlbr rect;
  std::vector<Tlbr> obstacles;
};

struct PartitionLess {
  bool operator()(const Partition& a, const Partition& b) const {
    if (a.score != b.score) return a.score < b.score;  // max-heap by score
    return a.seq > b.seq;                              // earlier seq first
  }
};

// Segment intersection (touching counts), matching
// ocrs_tpu.geometry.Line.intersects / layout._segments_intersect_matrix.
bool segments_intersect(double px, double py, double qx, double qy,
                        double ax, double ay, double bx, double by) {
  double dx = qx - px, dy = qy - py;
  double ex = bx - ax, ey = by - ay;
  double qpx = ax - px, qpy = ay - py;
  double denom = dx * ey - dy * ex;
  double t_num = qpx * ey - qpy * ex;
  double u_num = qpx * dy - qpy * dx;
  if (denom != 0.0) {
    double t = t_num / denom;
    double u = u_num / denom;
    return t >= 0.0 && t <= 1.0 && u >= 0.0 && u <= 1.0;
  }
  if (u_num != 0.0) return false;  // parallel, non-collinear
  double rr = dx * dx + dy * dy;
  if (rr == 0.0) return std::fabs(qpx) < 1e-12 && std::fabs(qpy) < 1e-12;
  double t0 = (qpx * dx + qpy * dy) / rr;
  double t1 = t0 + (ex * dx + ey * dy) / rr;
  double lo = std::min(t0, t1), hi = std::max(t0, t1);
  return hi >= 0.0 && lo <= 1.0;
}

// Core of oc_find_separators, reusable from oc_find_text_lines.
std::vector<Tlbr> find_separators_impl(std::vector<Tlbr> all,
                                       const Tlbr& bound, double min_w,
                                       double min_h, double iou_thresh,
                                       int max_out) {
  std::priority_queue<Partition, std::vector<Partition>, PartitionLess> queue;
  if (bound.r - bound.l > 0 && bound.b - bound.t > 0) {
    queue.push(Partition{shafait_score(bound), 0, bound, std::move(all)});
  }
  uint64_t seq = 1;
  std::vector<Tlbr> found;
  while (!queue.empty() && (int)found.size() < max_out) {
    Partition part = queue.top();
    queue.pop();
    if (part.obstacles.empty()) {
      bool overlapping = false;
      for (const Tlbr& f : found)
        if (iou(f, part.rect) >= iou_thresh) {
          overlapping = true;
          break;
        }
      if (!overlapping) found.push_back(part.rect);
      continue;
    }
    const Tlbr pivot = part.obstacles[part.obstacles.size() / 2];
    const Tlbr& b = part.rect;
    const Tlbr subs[4] = {
        {b.t, b.l, pivot.t, b.r},  // top
        {b.t, b.l, b.b, pivot.l},  // left
        {pivot.b, b.l, b.b, b.r},  // bottom
        {b.t, pivot.r, b.b, b.r},  // right
    };
    for (const Tlbr& sr : subs) {
      double w = sr.r - sr.l, h = sr.b - sr.t;
      if (std::max(w, 0.0) < min_w || std::max(h, 0.0) < min_h || w <= 0 ||
          h <= 0)
        continue;
      std::vector<Tlbr> sub_obs;
      sub_obs.reserve(part.obstacles.size());
      for (const Tlbr& o : part.obstacles)
        if (std::min(o.b, sr.b) > std::max(o.t, sr.t) &&
            std::min(o.r, sr.r) > std::max(o.l, sr.l))
          sub_obs.push_back(o);
      queue.push(Partition{shafait_score(sr), seq++, sr, std::move(sub_obs)});
    }
  }
  return found;
}

// Core of oc_group_lines, reusable from oc_find_text_lines.
int group_lines_impl(const double* feat, int n, const double* seps, int S,
                     double overlap_threshold, double max_h_overlap,
                     int32_t* out_line, int32_t* out_rank) {
  const auto F = [&](int i, int j) { return feat[i * 9 + j]; };
  // Stable sort by integer bleft (ties keep input order).
  std::vector<int> order(n);
  for (int i = 0; i < n; i++) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return (long long)F(a, 2) < (long long)F(b, 2);
  });
  std::vector<char> alive(n, 1);
  int n_alive = n;
  int cursor = 0;
  int line_id = 0;
  while (n_alive) {
    while (!alive[order[cursor]]) cursor++;
    int seed = order[cursor];
    alive[seed] = 0;
    n_alive--;
    int rank = 0;
    out_line[seed] = line_id;
    out_rank[seed] = rank++;
    int last = seed;
    while (n_alive) {
      int best = -1;
      long long best_cx = 0;
      for (int oi = cursor + 1; oi < n; oi++) {
        int i = order[oi];
        if (!alive[i]) continue;
        if (!(F(i, 0) > F(last, 0))) continue;
        if (!(F(i, 3) - F(last, 6) >= -max_h_overlap)) continue;
        double ov = std::min(F(last, 8), F(i, 5)) - std::max(F(last, 7), F(i, 4));
        if (!(ov >= overlap_threshold)) continue;
        bool blocked = false;
        for (int s = 0; s < S; s++) {
          if (segments_intersect(F(last, 0), F(last, 1), F(i, 0), F(i, 1),
                                 seps[s * 4], seps[s * 4 + 1], seps[s * 4 + 2],
                                 seps[s * 4 + 3])) {
            blocked = true;
            break;
          }
        }
        if (blocked) continue;
        long long cx = (long long)F(i, 0);
        if (best < 0 || cx < best_cx) {
          best = i;
          best_cx = cx;
        }
      }
      if (best < 0) break;
      alive[best] = 0;
      n_alive--;
      out_line[best] = line_id;
      out_rank[best] = rank++;
      last = best;
    }
    line_id++;
  }
  return line_id;
}

}  // namespace

extern "C" {

// Breuel max-empty-rects with Shafait score + IoU overlap filter
// (empty_rects.rs:86-229, layout_analysis.rs:137-155). `obs` is K x 4
// (t,l,b,r), PRE-SORTED by (int)center.x then (int)center.y. Returns the
// number of rects written to `out` (up to max_out rows of t,l,b,r).
int oc_find_separators(const double* obs, int K, const double* boundary,
                       double min_w, double min_h, double iou_thresh,
                       int max_out, double* out) {
  std::vector<Tlbr> all(K);
  for (int i = 0; i < K; i++)
    all[i] = Tlbr{obs[i * 4], obs[i * 4 + 1], obs[i * 4 + 2], obs[i * 4 + 3]};
  Tlbr bound{boundary[0], boundary[1], boundary[2], boundary[3]};
  std::vector<Tlbr> found = find_separators_impl(std::move(all), bound, min_w,
                                                 min_h, iou_thresh, max_out);
  for (size_t i = 0; i < found.size(); i++) {
    out[i * 4] = found[i].t;
    out[i * 4 + 1] = found[i].l;
    out[i * 4 + 2] = found[i].b;
    out[i * 4 + 3] = found[i].r;
  }
  return (int)found.size();
}

// Greedy left-to-right line chaining (layout_analysis.rs:19-71).
// feat: n x 9 [cx, cy, bleft, lcx, ly0, ly1, rcx, ry0, ry1]
// seps: S x 4 [x1, y1, x2, y2]
// out_line[i]: line id of word i (line ids in creation order)
// out_rank[i]: position of word i within its line
// Returns the number of lines.
int oc_group_lines(const double* feat, int n, const double* seps, int S,
                   double overlap_threshold, double max_h_overlap,
                   int32_t* out_line, int32_t* out_rank) {
  return group_lines_impl(feat, n, seps, S, overlap_threshold, max_h_overlap,
                          out_line, out_rank);
}

// Full layout analysis (layout_analysis.rs:83-232): separator discovery +
// separator-aware line chaining + reading-order paragraph clustering — the
// complete find_text_lines in one host call (the Python glue between the
// three kernels measured comparable to the kernels themselves on the
// single-core hosts this runs on).
//
// feat: n x 9 (as oc_group_lines); boxes: n x 4 (t,l,b,r) word bounding
// boxes; median_height: round(height of word n/2 in input order).
// Outputs: out_word[p] = word index at reading-order position p (p in
// [0, n)); out_line[p] = 0-based line id (consecutive, increasing in
// reading order) of that position. Returns the number of lines.
int oc_find_text_lines(const double* feat, const double* boxes, int n,
                       double median_height, double overlap_threshold,
                       double max_h_overlap, int32_t* out_word,
                       int32_t* out_line) {
  if (n == 0) return 0;
  std::vector<int32_t> line_of(n), rank(n);

  // 1. Separator-free grouping for spacing statistics.
  int n_lines0 =
      group_lines_impl(feat, n, nullptr, 0, overlap_threshold, max_h_overlap,
                       line_of.data(), rank.data());
  std::vector<std::vector<int>> lines0(n_lines0);
  {
    std::vector<int> count(n_lines0, 0);
    for (int i = 0; i < n; i++) count[line_of[i]]++;
    for (int l = 0; l < n_lines0; l++) lines0[l].resize(count[l]);
    for (int i = 0; i < n; i++) lines0[line_of[i]][rank[i]] = i;
  }
  std::vector<long long> spacings;
  for (const auto& li : lines0)
    for (size_t k = 1; k < li.size(); k++) {
      double s = std::max(boxes[li[k] * 4 + 1] - boxes[li[k - 1] * 4 + 3], 0.0);
      // Match Python int(round(s)): round-half-even.
      spacings.push_back((long long)std::nearbyint(s));
    }
  std::sort(spacings.begin(), spacings.end());
  long long median_spacing =
      spacings.empty() ? 10 : spacings[spacings.size() / 2];

  // 2. Separators from max-empty-rects over integral word boxes.
  Tlbr page{std::floor(boxes[0]), std::floor(boxes[1]), std::ceil(boxes[2]),
            std::ceil(boxes[3])};
  std::vector<Tlbr> obs(n);
  for (int i = 0; i < n; i++) {
    obs[i] = Tlbr{std::floor(boxes[i * 4]), std::floor(boxes[i * 4 + 1]),
                  std::ceil(boxes[i * 4 + 2]), std::ceil(boxes[i * 4 + 3])};
    page.t = std::min(page.t, std::floor(boxes[i * 4]));
    page.l = std::min(page.l, std::floor(boxes[i * 4 + 1]));
    page.b = std::max(page.b, std::ceil(boxes[i * 4 + 2]));
    page.r = std::max(page.r, std::ceil(boxes[i * 4 + 3]));
  }
  std::stable_sort(obs.begin(), obs.end(), [](const Tlbr& a, const Tlbr& b) {
    long long ax = (long long)((a.l + a.r) / 2), bx = (long long)((b.l + b.r) / 2);
    if (ax != bx) return ax < bx;
    return (long long)((a.t + a.b) / 2) < (long long)((b.t + b.b) / 2);
  });
  std::vector<Tlbr> seps = find_separators_impl(
      obs, page, (double)(median_spacing * 3),
      3.0 * std::max(median_height, 0.0), 0.5, 80);

  // 3. Line chaining with vertical separator centre-lines.
  std::vector<double> vseps(seps.size() * 4);
  for (size_t s = 0; s < seps.size(); s++) {
    double cx = (seps[s].l + seps[s].r) / 2.0;
    vseps[s * 4] = cx;
    vseps[s * 4 + 1] = seps[s].t;
    vseps[s * 4 + 2] = cx;
    vseps[s * 4 + 3] = seps[s].b;
  }
  int n_lines =
      group_lines_impl(feat, n, vseps.data(), (int)seps.size(),
                       overlap_threshold, max_h_overlap, line_of.data(),
                       rank.data());
  std::vector<std::vector<int>> lines(n_lines);
  {
    std::vector<int> count(n_lines, 0);
    for (int i = 0; i < n; i++) count[line_of[i]]++;
    for (int l = 0; l < n_lines; l++) lines[l].resize(count[l]);
    for (int i = 0; i < n; i++) lines[line_of[i]][rank[i]] = i;
  }

  // 4. Line mid-segments (first word's left edge centre -> last word's
  // right edge centre, layout_analysis.rs:182-189), sorted by vertical
  // midpoint (stable).
  std::vector<std::array<double, 4>> mid(n_lines);  // x0, y0, x1, y1
  for (int l = 0; l < n_lines; l++) {
    const double* f = boxes + lines[l].front() * 4;
    const double* la = boxes + lines[l].back() * 4;
    mid[l] = {f[1], (f[0] + f[2]) / 2.0, la[3], (la[0] + la[2]) / 2.0};
  }
  std::vector<int> order(n_lines);
  for (int l = 0; l < n_lines; l++) order[l] = l;
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return (long long)std::trunc((mid[a][1] + mid[a][3]) / 2.0) <
           (long long)std::trunc((mid[b][1] + mid[b][3]) / 2.0);
  });

  // 5. Greedy paragraph clustering (layout_analysis.rs:205-226).
  std::vector<char> alive(n_lines, 1);
  std::vector<int> result;
  result.reserve(n_lines);
  int remaining = n_lines, cursor = 0;
  while (remaining) {
    while (!alive[cursor]) cursor++;
    int seed = cursor;
    alive[seed] = 0;
    remaining--;
    result.push_back(seed);
    const std::array<double, 4>* prev = &mid[order[seed]];
    for (int i = seed + 1; i < n_lines; i++) {
      if (!alive[i]) continue;
      const std::array<double, 4>& cand = mid[order[i]];
      double lo = std::max(std::min((*prev)[0], (*prev)[2]),
                           std::min(cand[0], cand[2]));
      double hi = std::min(std::max((*prev)[0], (*prev)[2]),
                           std::max(cand[0], cand[2]));
      if (hi - lo <= 0.0) continue;
      bool separated = false;
      double px = ((*prev)[0] + (*prev)[2]) / 2.0;
      double py = ((*prev)[1] + (*prev)[3]) / 2.0;
      double qx = (cand[0] + cand[2]) / 2.0;
      double qy = (cand[1] + cand[3]) / 2.0;
      for (const Tlbr& s : seps) {
        double cy = (s.t + s.b) / 2.0;
        if (segments_intersect(px, py, qx, qy, s.l, cy, s.r, cy)) {
          separated = true;
          break;
        }
      }
      if (separated) continue;
      alive[i] = 0;
      remaining--;
      result.push_back(i);
      prev = &cand;
    }
  }

  // 6. Flatten to reading order.
  int p = 0;
  for (int out_l = 0; out_l < (int)result.size(); out_l++) {
    for (int w : lines[order[result[out_l]]]) {
      out_word[p] = w;
      out_line[p] = out_l;
      p++;
    }
  }
  return n_lines;
}

// Run-table connected components + exact min-area rects.
//
// The device reduces each page's detection mask to two row-run tables (see
// ocrs_tpu/ops/rects.py:runs_tables): ORIG runs of the raw thresholded mask
// (full resolution — these carry the exact pixel extents) and CONN runs of
// the connectivity mask (3x3-closed and optionally 2x2-pooled). This kernel
// replaces the on-device union-find + dense angle-scan rect fit
// (detection.rs:41-62 territory): union-find over conn runs (8-connected),
// map orig runs into conn runs by containment, then fit each component's
// min-area rect with convex hull + rotating calipers — exact, unlike the
// device angle scan's ~0.9 deg resolution. At ~800 runs/page this is
// microseconds of host work per page.
//
// runs: int16 [B, 6, K]; channels 0-2 = orig (row, xs, xe), 3-5 = conn
//   (row, xs, xe); entries with row < 0 are padding. Both tables are in
//   raster order (ascending row, then xs). Conn coordinates are at full
//   resolution divided by `pool` (1 or 2).
// out: double [B, 9, C]: valid, count, dropped, cx, cy, ux, uy, w, h
//   (the PACK_FIELDS layout of ocrs_tpu.ops.rects). `dropped` counts
//   components beyond max_components plus orig runs that failed to map.
void oc_runs_to_rects(const int16_t* runs, int B, int K, int pool,
                      int max_components, double* out) {
  const int C = max_components;
  std::vector<int> parent, row_begin, comp_of_root, order;
  std::vector<double> pts;
  for (int b = 0; b < B; b++) {
    const int16_t* tb = runs + (size_t)b * 6 * K;
    const int16_t* o_row = tb + 0 * K;
    const int16_t* o_xs = tb + 1 * K;
    const int16_t* o_xe = tb + 2 * K;
    const int16_t* c_row = tb + 3 * K;
    const int16_t* c_xs = tb + 4 * K;
    const int16_t* c_xe = tb + 5 * K;
    int n_conn = 0;
    while (n_conn < K && c_row[n_conn] >= 0) n_conn++;
    int n_orig = 0;
    while (n_orig < K && o_row[n_orig] >= 0) n_orig++;

    // Union-find over conn runs.
    parent.assign(n_conn, 0);
    for (int i = 0; i < n_conn; i++) parent[i] = i;
    std::function<int(int)> find = [&](int x) {
      while (parent[x] != x) {
        parent[x] = parent[parent[x]];
        x = parent[x];
      }
      return x;
    };
    auto unite = [&](int a, int bb) {
      a = find(a);
      bb = find(bb);
      if (a != bb) parent[std::max(a, bb)] = std::min(a, bb);
    };
    // 8-connectivity between a run and the previous row's runs: x-intervals
    // dilated by 1 overlap. Two-pointer over the (raster-sorted) table.
    int max_row = n_conn ? c_row[n_conn - 1] : -1;
    row_begin.assign(max_row + 2, n_conn);
    for (int i = n_conn - 1; i >= 0; i--) row_begin[c_row[i]] = i;
    for (int r = max_row; r >= 1; r--)
      if (row_begin[r] == n_conn) row_begin[r] = row_begin[r + 1];
    for (int i = 0; i < n_conn; i++) {
      int r = c_row[i];
      if (r == 0) continue;
      int j = row_begin[r - 1];
      int jend = row_begin[r];
      for (; j < jend && c_row[j] == r - 1; j++) {
        if (c_xe[j] + 1 < c_xs[i] - 1) continue;
        if (c_xs[j] - 1 > c_xe[i] + 1) break;
        unite(i, j);
      }
    }

    // Map each orig run to its conn component (containment after /pool).
    // Components are numbered by first appearance in orig raster order.
    comp_of_root.assign(n_conn, -1);
    order.clear();  // root conn-run id per component
    std::vector<int> comp_of_orig(n_orig, -1);
    int dropped_runs = 0;
    for (int i = 0; i < n_orig; i++) {
      int r = o_row[i] / pool;
      int x = o_xs[i] / pool;
      if (r > max_row) {
        dropped_runs++;
        continue;
      }
      int lo = row_begin[r];
      int hi = (r + 1 <= max_row + 1) ? row_begin[r + 1] : n_conn;
      // Binary search for the conn run with xs <= x <= xe in row r.
      int found = -1;
      while (lo < hi) {
        int mid = (lo + hi) / 2;
        if (c_row[mid] != r || c_xs[mid] > x)
          hi = mid;
        else if (c_xe[mid] < x)
          lo = mid + 1;
        else {
          found = mid;
          break;
        }
      }
      if (found < 0) {
        dropped_runs++;  // conn table overflow lost this run's cover
        continue;
      }
      int root = find(found);
      if (comp_of_root[root] < 0) {
        comp_of_root[root] = (int)order.size();
        order.push_back(root);
      }
      comp_of_orig[i] = comp_of_root[root];
    }

    int n_comp = (int)order.size();
    int n_keep = std::min(n_comp, C);
    // Gather each kept component's run-endpoint points.
    std::vector<std::vector<double>> comp_pts(n_keep);
    std::vector<int> comp_count(n_keep, 0);
    for (int i = 0; i < n_orig; i++) {
      int c = comp_of_orig[i];
      if (c < 0 || c >= n_keep) continue;
      auto& v = comp_pts[c];
      v.push_back((double)o_xs[i]);
      v.push_back((double)o_row[i]);
      v.push_back((double)o_xe[i]);
      v.push_back((double)o_row[i]);
      comp_count[c] += 2;
    }

    double* ob = out + (size_t)b * 9 * C;
    for (int f = 0; f < 9; f++)
      for (int c = 0; c < C; c++) ob[f * C + c] = 0.0;
    double dropped = (double)(n_comp - n_keep + dropped_runs);
    for (int c = 0; c < C; c++) ob[2 * C + c] = dropped;

    for (int c = 0; c < n_keep; c++) {
      const auto& v = comp_pts[c];
      int np = (int)v.size() / 2;
      if (np == 0) continue;
      // Convex hull (monotone chain) over unique points.
      pts = v;
      std::vector<std::pair<double, double>> P(np);
      for (int i = 0; i < np; i++) P[i] = {pts[2 * i], pts[2 * i + 1]};
      std::sort(P.begin(), P.end());
      P.erase(std::unique(P.begin(), P.end()), P.end());
      int m = (int)P.size();
      double cx, cy, ux, uy, w, h;
      if (m == 1) {
        cx = P[0].first;
        cy = P[0].second;
        ux = 0.0;
        uy = -1.0;
        w = h = 0.0;
      } else if (m == 2) {
        double dx = P[1].first - P[0].first, dy = P[1].second - P[0].second;
        double n = std::hypot(dx, dy);
        cx = (P[0].first + P[1].first) / 2.0;
        cy = (P[0].second + P[1].second) / 2.0;
        // up = rot90(dir) = (-dy, dx)/n; width along dir, height 0.
        ux = -dy / n;
        uy = dx / n;
        w = n;
        h = 0.0;
      } else {
        std::vector<std::pair<double, double>> hull;
        hull.reserve(2 * m);
        auto cross_ok = [&](const std::pair<double, double>& o,
                            const std::pair<double, double>& a,
                            const std::pair<double, double>& p) {
          return (a.first - o.first) * (p.second - o.second) -
                     (a.second - o.second) * (p.first - o.first) <=
                 0;
        };
        for (int pass = 0; pass < 2; pass++) {
          size_t start = hull.size();
          for (int ii = 0; ii < m; ii++) {
            const auto& p = pass == 0 ? P[ii] : P[m - 1 - ii];
            while (hull.size() >= start + 2 &&
                   cross_ok(hull[hull.size() - 2], hull.back(), p))
              hull.pop_back();
            hull.push_back(p);
          }
          hull.pop_back();
        }
        int nh = (int)hull.size();
        double best_area = std::numeric_limits<double>::infinity();
        cx = cy = w = h = 0.0;
        ux = 0.0;
        uy = -1.0;
        for (int i = 0; i < nh; i++) {
          double ex = hull[(i + 1) % nh].first - hull[i].first;
          double ey = hull[(i + 1) % nh].second - hull[i].second;
          double n = std::hypot(ex, ey);
          if (n == 0) continue;
          ex /= n;
          ey /= n;
          // perpendicular = rot90(e) = (-ey, ex)
          double px = -ey, py = ex;
          double mn_x = 1e300, mx_x = -1e300, mn_y = 1e300, mx_y = -1e300;
          for (const auto& q : hull) {
            double a = q.first * ex + q.second * ey;
            double bq = q.first * px + q.second * py;
            mn_x = std::min(mn_x, a);
            mx_x = std::max(mx_x, a);
            mn_y = std::min(mn_y, bq);
            mx_y = std::max(mx_y, bq);
          }
          double ww = mx_x - mn_x, hh = mx_y - mn_y;
          if (ww * hh < best_area) {
            best_area = ww * hh;
            double ccx = (mx_x + mn_x) / 2.0, ccy = (mx_y + mn_y) / 2.0;
            cx = ccx * ex + ccy * px;
            cy = ccx * ey + ccy * py;
            ux = px;
            uy = py;
            w = ww;
            h = hh;
          }
        }
      }
      ob[0 * C + c] = 1.0;                       // valid
      ob[1 * C + c] = (double)comp_count[c];     // count
      ob[3 * C + c] = cx;
      ob[4 * C + c] = cy;
      ob[5 * C + c] = ux;
      ob[6 * C + c] = uy;
      ob[7 * C + c] = w;
      ob[8 * C + c] = h;
    }
  }
}

// Batch CTC greedy collapse: remove repeats then blanks (label 0).
// labels: N x T. out_pos/out_lab: N x T. out_count[i]: number of steps.
void oc_ctc_collapse(const int32_t* labels, int N, int T, int32_t* out_pos,
                     int32_t* out_lab, int32_t* out_count) {
  for (int i = 0; i < N; i++) {
    const int32_t* row = labels + (size_t)i * T;
    int32_t* pos = out_pos + (size_t)i * T;
    int32_t* lab = out_lab + (size_t)i * T;
    int count = 0;
    int32_t prev = 0;
    for (int t = 0; t < T; t++) {
      int32_t v = row[t];
      if (v != 0 && v != prev) {
        pos[count] = t;
        lab[count] = v;
        count++;
      }
      prev = v;
    }
    out_count[i] = count;
  }
}

// Batch CTC prefix beam search (role of rten::ctc::CtcDecoder::decode_beam,
// recognition.rs:517-520; numerically mirrors the Python oracle
// ocrs_tpu/ops/ctc.py beam_decode: double logaddexp accumulation, top
// max(W,8) candidate classes per frame, stable prune to width W).
//
// Input is the per-frame TOP-K candidate list, not the full class axis: the
// oracle prunes to the top max(W,8) classes anyway, so a device-side
// lax.top_k makes the device->host copy K/C the size (8/97 for the shipped
// alphabet) with bit-identical results. vals/idx: N x T x K candidate
// log-probs (descending) and class ids; entries with val == -inf are
// padding and ignored.
//
// Prefixes live in a per-line trie: node = (parent, label, frame pos); a
// beam entry is (node id, p_blank, p_nonblank). No hashing anywhere: beam
// entries are unique prefixes by construction, a "stay" (blank / repeat)
// write targets the entry's own slot, and every extension creates a prefix
// that ends at THIS frame — which no surviving prefix does — so extension
// keys can never collide either (the oracle keys prefixes by (frame, label)
// pairs; its dict accumulation only ever sees first-writes too). This drops
// the per-frame work to pure appends plus one small sort, ~6x faster than
// the dict-of-prefixes formulation it is numerically identical to.
//
// out_pos / out_lab: N x T int32 (a collapsed sequence can't exceed T
// steps); out_count[i] = steps for line i.
//
// Threshold pruning (exact): without it, wide beams explode — W=100 x K=97
// built and sorted ~10k entries per frame (284x the greedy wall, VERDICT
// r04). A size-W min-heap tracks the running W-th-best finalized total in
// `next`; an extension whose total is <= that threshold is never created.
// This is provably identical to prune-after-the-fact: the heap holds totals
// of entries created EARLIER in `next`, so a candidate with total <= the
// heap minimum sorts (stably, descending) at index >= W and would be cut.
// Because candidate values arrive descending (device top-k order), once a
// beam entry's best remaining extension mass (its total + fv[ci]) falls
// under the threshold — and the blank and repeat candidates that accumulate
// into the "stay" entry have already been passed — the whole candidate loop
// breaks. Per-frame work drops from O(W*K + W*K log(W*K)) to
// O(W * survivors + W log W).
void oc_ctc_beam(const float* vals, const int32_t* idx, int N, int T, int K,
                 int W, int32_t* out_pos, int32_t* out_lab,
                 int32_t* out_count) {
  const double NEG = -std::numeric_limits<double>::infinity();
  const auto logaddexp = [&](double a, double b) {
    if (a == NEG) return b;
    if (b == NEG) return a;
    double m = std::max(a, b);
    double d = std::min(a, b) - m;
    // exp(d) < 2^-53 for d < -37: exp(d) + 1.0 rounds to exactly 1.0 and
    // log(1.0) == 0, so the full expression returns exactly m — skip the
    // exp/log (bit-identical to the oracle, not an approximation).
    if (d < -37.0) return m;
    return m + std::log(std::exp(d) + 1.0);
  };
  struct Node {
    int32_t parent;  // -1 for root
    int32_t label;
    int32_t pos;
  };
  struct Entry {
    int32_t node;
    double p_b, p_nb;
    double total;  // logaddexp(p_b, p_nb), filled before the prune sort
  };
  std::vector<Node> nodes;
  std::vector<Entry> beams, next;
  std::vector<std::pair<double, int32_t>> keys;
  std::vector<double> heap;  // size<=W min-heap of finalized totals in next
  std::vector<int32_t> cls_rank;  // class id -> candidate rank this frame
  std::vector<int32_t> ext_c(K);  // non-blank candidates this frame
  std::vector<double> ext_p(K);

  const auto heap_push = [&](double v) {
    if ((int)heap.size() < W) {
      heap.push_back(v);
      std::push_heap(heap.begin(), heap.end(), std::greater<double>());
    } else if (v > heap.front()) {
      std::pop_heap(heap.begin(), heap.end(), std::greater<double>());
      heap.back() = v;
      std::push_heap(heap.begin(), heap.end(), std::greater<double>());
    }
  };

  for (int i = 0; i < N; i++) {
    const float* line_v = vals + (size_t)i * T * K;
    const int32_t* line_i = idx + (size_t)i * T * K;
    nodes.clear();
    beams.assign(1, Entry{-1, 0.0, NEG, 0.0});

    int32_t maxc = 0;
    for (size_t j = 0; j < (size_t)T * K; j++) maxc = std::max(maxc, line_i[j]);
    if ((int32_t)cls_rank.size() < maxc + 1) cls_rank.resize(maxc + 1, -1);

    for (int t = 0; t < T; t++) {
      const float* fv = line_v + (size_t)t * K;
      const int32_t* fi = line_i + (size_t)t * K;
      int n_cand = K;
      while (n_cand > 0 &&
             fv[n_cand - 1] == -std::numeric_limits<float>::infinity())
        n_cand--;

      if (n_cand == 0) continue;  // degenerate frame: keep current beams

      // Blank-only frame fast path (the common case for trained recognizers
      // once the device masks candidates more than GAP below the frame max:
      // most frames emit only blank). Every beam entry maps to exactly its
      // own stay with p_b = total + p, p_nb = -inf, total' = total + p — a
      // uniform shift that preserves order, creates no extensions, and
      // needs no heap, sort, or logaddexp. O(W) in place. (Runs before any
      // cls_rank write so there is nothing to reset on this path.)
      if (n_cand == 1 && fi[0] == 0) {
        const double p = fv[0];
        for (Entry& e : beams) {
          e.p_b = e.total + p;
          e.p_nb = NEG;
          e.total += p;
        }
        continue;
      }

      for (int ci = 0; ci < n_cand; ci++) cls_rank[fi[ci]] = ci;
      const int32_t rank_blank = cls_rank[0];
      const double blank_p = rank_blank >= 0 ? (double)fv[rank_blank] : 0.0;
      // Non-blank candidates, still descending (the extension loop never
      // extends by blank; hoisting the test out of the W x K hot loop).
      int n_ext = 0;
      for (int ci = 0; ci < n_cand; ci++)
        if (fi[ci] != 0) {
          ext_c[n_ext] = fi[ci];
          ext_p[n_ext] = fv[ci];
          n_ext++;
        }

      next.clear();
      heap.clear();
      for (const Entry& e : beams) {
        double total = e.total;
        int32_t last_label = e.node >= 0 ? nodes[e.node].label : -1;
        const int32_t rank_last = last_label >= 0 ? cls_rank[last_label] : -1;

        // The "stay" (same-prefix) entry needs only two candidate lookups
        // (blank rank and repeated-label rank), both O(1) via cls_rank — no
        // candidate scan. Its accumulated mass can beat the threshold even
        // when every extension from this entry cannot.
        if (rank_blank >= 0 || rank_last >= 0) {
          Entry s{e.node, NEG, NEG, NEG};
          if (rank_blank >= 0) s.p_b = total + blank_p;
          if (rank_last >= 0) s.p_nb = e.p_nb + fv[rank_last];
          // logaddexp(a, b) <= max(a, b) + ln 2: when even that upper bound
          // cannot reach the running threshold the stay is provably pruned
          // later — skip the logaddexp and the entry entirely (exact).
          const double ub = std::max(s.p_b, s.p_nb) + 0.6931471805599453;
          if ((int)heap.size() < W || ub > heap.front()) {
            s.total = logaddexp(s.p_b, s.p_nb);
            if ((int)heap.size() < W || s.total > heap.front()) {
              next.push_back(s);
              heap_push(s.total);
            }
          }
        }

        // Extensions: the best possible one is total + ext_p[0] (the repeat
        // case uses e.p_b <= total), so a weak beam entry skips the whole
        // candidate loop — on peaked (trained-model) frames most of the W
        // entries take this O(1) path.
        if (n_ext == 0 ||
            ((int)heap.size() == W && total + ext_p[0] <= heap.front()))
          continue;
        for (int ci = 0; ci < n_ext; ci++) {
          int c = ext_c[ci];
          double p = ext_p[ci];
          // Repeat without blank extends the stay (handled above); after a
          // blank it starts a new character — mass e.p_b, not total.
          double ext_mass = c == last_label ? e.p_b : total;
          const bool heap_full = (int)heap.size() == W;
          if (ext_mass != NEG && !(heap_full && ext_mass + p <= heap.front())) {
            int32_t cn = (int32_t)nodes.size();
            nodes.push_back(Node{e.node, c, t});
            next.push_back(Entry{cn, NEG, ext_mass + p, ext_mass + p});
            heap_push(ext_mass + p);
          }
          // Early out: remaining candidates have fv <= fv[ci], so every
          // remaining extension total is under the threshold too.
          if (heap_full && total + p <= heap.front()) break;
        }
      }
      for (int ci = 0; ci < n_cand; ci++) cls_rank[fi[ci]] = -1;

      // Degenerate frame (every candidate -inf, e.g. all classes excluded):
      // keep the current beams rather than emptying the set.
      if (next.empty()) continue;

      // Stable prune to width W by total probability (descending). The heap
      // already knows the W-th-best total (every entry in `next` was pushed
      // exactly once), so select the survivors with a linear scan — all
      // entries above the threshold, then first-come ties at it — and sort
      // only those W, not all of `next`. Identical result to stable-sorting
      // everything: ties keep insertion order in both.
      // (total desc, index asc) pairs under plain sort == stable sort by
      // total desc, on 16-byte PODs instead of indirect Entry compares.
      keys.clear();
      if ((int)next.size() > W) {
        const double thresh = heap.front();
        for (size_t j = 0; j < next.size(); j++)
          if (next[j].total > thresh)
            keys.push_back({next[j].total, (int32_t)j});
        for (size_t j = 0; j < next.size() && (int)keys.size() < W; j++)
          if (next[j].total == thresh)
            keys.push_back({next[j].total, (int32_t)j});
      } else {
        for (size_t j = 0; j < next.size(); j++)
          keys.push_back({next[j].total, (int32_t)j});
      }
      std::sort(keys.begin(), keys.end(),
                [](const std::pair<double, int32_t>& a,
                   const std::pair<double, int32_t>& b) {
                  return a.first > b.first ||
                         (a.first == b.first && a.second < b.second);
                });
      beams.clear();
      for (const auto& kv : keys) beams.push_back(next[kv.second]);
    }

    const Entry* best = &beams[0];
    double best_p = NEG;
    for (const Entry& e : beams) {
      double p = logaddexp(e.p_b, e.p_nb);
      if (p > best_p) {
        best_p = p;
        best = &e;
      }
    }
    // Walk the prefix chain (reversed), then emit forward.
    int count = 0;
    for (int32_t n = best->node; n >= 0; n = nodes[n].parent) count++;
    int32_t* pos = out_pos + (size_t)i * T;
    int32_t* lab = out_lab + (size_t)i * T;
    int k = count;
    for (int32_t n = best->node; n >= 0; n = nodes[n].parent) {
      k--;
      pos[k] = nodes[n].pos;
      lab[k] = nodes[n].label;
    }
    out_count[i] = count;
  }
}

}  // extern "C"

// --- low-bandwidth transport kernels ---------------------------------------
//
// On hosts whose device link is slow (this environment's ~53 MB/s relay vs
// PCIe), uploading full-resolution pages caps e2e throughput at ~6 pages/s
// no matter how the compute overlaps (BENCH r03). These kernels reduce the
// bytes that must cross the link to exactly what the device needs:
//
//   * oc_resize_pages: page -> detector-input resolution on host (the device
//     would immediately resize to this anyway; detection.rs:131-142
//     semantics via the same pad-then-half-pixel-bilinear law as
//     ocrs_tpu.ops.resize). 8.7 MB/page u8 -> 0.49 MB.
//   * oc_extract_lines: after layout, extract + resize each text line to the
//     recognizer height on host from the full-res page that never left host
//     RAM — uploading only [N, 64, width] u8 crops (same sampling law as
//     ocrs_tpu.ops.warp._extract_impl; the polygon band mask stays on
//     device, it needs only the tiny geometry arrays).
//
// Both can pack two 4-bit pixels per byte (pack4) for another 2x.

namespace {

// Precompute 2-tap half-pixel bilinear taps for one axis (the exact kernel
// of ops/resize._interp_matrix: ONNX Resize half_pixel + edge clamp).
inline void bilinear_taps(int in_size, int out_size, int32_t* i0, int32_t* i1,
                          float* w1) {
  for (int o = 0; o < out_size; o++) {
    double src = (o + 0.5) * ((double)in_size / out_size) - 0.5;
    double lo = std::floor(src);
    double frac = src - lo;
    int l = (int)lo;
    i0[o] = std::min(std::max(l, 0), in_size - 1);
    i1[o] = std::min(std::max(l + 1, 0), in_size - 1);
    w1[o] = (float)frac;
  }
}

inline void pack_row_4bit(const float* vals, int n, uint8_t* out) {
  for (int x = 0; x < n; x += 2) {
    int hi = (int)(vals[x] + 0.5f) >> 4;
    int lo_v = (x + 1 < n) ? ((int)(vals[x + 1] + 0.5f) >> 4) : 0;
    out[x >> 1] = (uint8_t)((hi << 4) | lo_v);
  }
}

}  // namespace

extern "C" {

// Pages [B, H, W] u8 -> detector inputs [B, outH, outW] u8 (pack4: the last
// axis is (outW+1)/2 packed bytes). Matches the pipeline's device path:
// virtually pad bottom/right with 0 (u8 0 == normalized BLACK_VALUE) to at
// least (outH, outW), then 2-tap half-pixel bilinear resize.
void oc_resize_pages(const uint8_t* pages, int B, int H, int W, int outH,
                     int outW, int pack4, uint8_t* out) {
  int padH = std::max(H, outH);
  int padW = std::max(W, outW);
  std::vector<int32_t> y0(outH), y1(outH), x0(outW), x1(outW);
  std::vector<float> wy(outH), wx(outW);
  bilinear_taps(padH, outH, y0.data(), y1.data(), wy.data());
  bilinear_taps(padW, outW, x0.data(), x1.data(), wx.data());
  std::vector<float> row(padW), vert(outW);
  int out_stride = pack4 ? (outW + 1) / 2 : outW;
  std::vector<uint8_t> zero_row(W, 0);
  for (int b = 0; b < B; b++) {
    const uint8_t* page = pages + (size_t)b * H * W;
    uint8_t* dst = out + (size_t)b * outH * out_stride;
    for (int oy = 0; oy < outH; oy++) {
      const uint8_t* r0 = y0[oy] < H ? page + (size_t)y0[oy] * W : zero_row.data();
      const uint8_t* r1 = y1[oy] < H ? page + (size_t)y1[oy] * W : zero_row.data();
      float fy = wy[oy];
      // Vertical blend into a float row (padded cols beyond W read as 0).
      for (int x = 0; x < W && x < padW; x++)
        row[x] = (1.0f - fy) * r0[x] + fy * r1[x];
      for (int x = W; x < padW; x++) row[x] = 0.0f;
      for (int ox = 0; ox < outW; ox++)
        vert[ox] = (1.0f - wx[ox]) * row[x0[ox]] + wx[ox] * row[x1[ox]];
      if (pack4) {
        pack_row_4bit(vert.data(), outW, dst + (size_t)oy * out_stride);
      } else {
        uint8_t* orow = dst + (size_t)oy * out_stride;
        for (int ox = 0; ox < outW; ox++)
          orow[ox] = (uint8_t)std::min(std::max((int)(vert[ox] + 0.5f), 0), 255);
      }
    }
  }
}

// Text-line crops: pages [B, H, W] u8, geom [6, N] f32 (top, left, height,
// width, resized_width, page_index — the exact layout
// parallel/pipeline._run_pooled_batch packs), out [N, outH, outW] u8
// (pack4: last axis (outW+1)/2). Sampling law mirrors
// ops/warp._extract_impl: output (r, c) bilinearly samples page position
//   y = top + clip((r+0.5)*h/outH - 0.5, 0, h-1)
//   x = left + clip((c+0.5)*w/max(rw,1) - 0.5, 0, w-1)
// with gather indices clipped to the page (the device-side band/in-page
// mask blacks out-of-polygon pixels afterwards, identically to the
// all-device path). Columns >= resized_width are 0 (BLACK padding).
void oc_extract_lines(const uint8_t* pages, int B, int H, int W,
                      const float* geom, int N, int outH, int outW, int pack4,
                      uint8_t* out) {
  (void)B;
  int out_stride = pack4 ? (outW + 1) / 2 : outW;
  std::vector<float> vert;       // [outH, W] vertical pass (lazy columns)
  std::vector<int32_t> x0(outW), x1(outW);
  std::vector<float> wx(outW), orow(outW);
  for (int i = 0; i < N; i++) {
    float top = geom[0 * N + i], left = geom[1 * N + i];
    float h = geom[2 * N + i], w = geom[3 * N + i];
    float rw = geom[4 * N + i];
    int page_idx = (int)geom[5 * N + i];
    const uint8_t* page = pages + (size_t)page_idx * H * W;
    uint8_t* dst = out + (size_t)i * outH * out_stride;
    int n_cols = std::min((int)rw, outW);
    if (n_cols <= 0) {
      std::fill(dst, dst + (size_t)outH * out_stride, 0);
      continue;
    }
    // Horizontal taps for this line (page-x coordinates, clipped).
    float denom = std::max(rw, 1.0f);
    int min_x0 = W, max_x1 = -1;
    for (int c = 0; c < n_cols; c++) {
      float sx = (c + 0.5f) * (w / denom) - 0.5f;
      sx = std::min(std::max(sx, 0.0f), std::max(w - 1.0f, 0.0f));
      float in_x = left + sx;
      float fl = std::floor(in_x);
      wx[c] = in_x - fl;
      int l = (int)fl;
      x0[c] = std::min(std::max(l, 0), W - 1);
      x1[c] = std::min(std::max(l + 1, 0), W - 1);
      min_x0 = std::min(min_x0, x0[c]);
      max_x1 = std::max(max_x1, x1[c]);
    }
    int span = max_x1 - min_x0 + 1;
    vert.resize((size_t)span);
    for (int r = 0; r < outH; r++) {
      float sy = (r + 0.5f) * (h / outH) - 0.5f;
      sy = std::min(std::max(sy, 0.0f), std::max(h - 1.0f, 0.0f));
      float in_y = top + sy;
      float fl = std::floor(in_y);
      float fy = in_y - fl;
      int yl = (int)fl;
      int yi0 = std::min(std::max(yl, 0), H - 1);
      int yi1 = std::min(std::max(yl + 1, 0), H - 1);
      const uint8_t* r0 = page + (size_t)yi0 * W + min_x0;
      const uint8_t* r1 = page + (size_t)yi1 * W + min_x0;
      for (int x = 0; x < span; x++)
        vert[x] = (1.0f - fy) * r0[x] + fy * r1[x];
      for (int c = 0; c < n_cols; c++)
        orow[c] = (1.0f - wx[c]) * vert[x0[c] - min_x0] +
                  wx[c] * vert[x1[c] - min_x0];
      for (int c = n_cols; c < outW; c++) orow[c] = 0.0f;
      if (pack4) {
        pack_row_4bit(orow.data(), outW, dst + (size_t)r * out_stride);
      } else {
        uint8_t* od = dst + (size_t)r * out_stride;
        for (int c = 0; c < outW; c++)
          od[c] = (uint8_t)std::min(std::max((int)(orow[c] + 0.5f), 0), 255);
      }
    }
  }
}

// Deskewing (rotated-rect) line crops for the low-bandwidth transport: the
// host twin of ops/warp.extract_line_batch_rotated. geom [10, N] f32:
// ox, oy (page coords of the rect's top-left corner), rx, ry (unit axis
// along the text), dx, dy (unit axis down the glyphs), w, h (extents),
// rwidth (resized content width), page index. Output pixel (r, c) samples
//   (ox, oy) + lx*(rx, ry) + ly*(dx, dy),
//   lx = clip((c+0.5)*w/max(rw,1) - 0.5, 0, max(w-1, 0)), ly likewise,
// 4-tap bilinear with clipped gather indices; samples outside the page and
// columns >= rwidth are 0 (u8 BLACK). No polygon band mask (the rotated
// rect is the tight region), so the device side only normalizes.
void oc_extract_lines_rotated(const uint8_t* pages, int B, int H, int W,
                              const float* geom, int N, int outH, int outW,
                              int pack4, uint8_t* out) {
  (void)B;
  int out_stride = pack4 ? (outW + 1) / 2 : outW;
  std::vector<float> orow(outW);
  for (int i = 0; i < N; i++) {
    float ox = geom[0 * N + i], oy = geom[1 * N + i];
    float rx = geom[2 * N + i], ry = geom[3 * N + i];
    float dx = geom[4 * N + i], dy = geom[5 * N + i];
    float w = geom[6 * N + i], h = geom[7 * N + i];
    float rw = geom[8 * N + i];
    const uint8_t* page = pages + (size_t)(int)geom[9 * N + i] * H * W;
    uint8_t* dst = out + (size_t)i * outH * out_stride;
    int n_cols = std::min((int)rw, outW);
    if (n_cols <= 0) {
      std::fill(dst, dst + (size_t)outH * out_stride, 0);
      continue;
    }
    float denom = std::max(rw, 1.0f);
    for (int r = 0; r < outH; r++) {
      float ly = (r + 0.5f) * (h / outH) - 0.5f;
      ly = std::min(std::max(ly, 0.0f), std::max(h - 1.0f, 0.0f));
      for (int c = 0; c < n_cols; c++) {
        float lx = (c + 0.5f) * (w / denom) - 0.5f;
        lx = std::min(std::max(lx, 0.0f), std::max(w - 1.0f, 0.0f));
        float px = ox + lx * rx + ly * dx;
        float py = oy + lx * ry + ly * dy;
        if (px < 0.0f || px > W - 1.0f || py < 0.0f || py > H - 1.0f) {
          orow[c] = 0.0f;
          continue;
        }
        float fx = std::floor(px), fy = std::floor(py);
        int x0 = std::min(std::max((int)fx, 0), W - 1);
        int x1 = std::min(x0 + 1, W - 1);
        int y0 = std::min(std::max((int)fy, 0), H - 1);
        int y1 = std::min(y0 + 1, H - 1);
        float wx = px - fx, wy = py - fy;
        const uint8_t* r0 = page + (size_t)y0 * W;
        const uint8_t* r1 = page + (size_t)y1 * W;
        orow[c] = (1.0f - wy) * ((1.0f - wx) * r0[x0] + wx * r0[x1]) +
                  wy * ((1.0f - wx) * r1[x0] + wx * r1[x1]);
      }
      for (int c = n_cols; c < outW; c++) orow[c] = 0.0f;
      if (pack4) {
        pack_row_4bit(orow.data(), outW, dst + (size_t)r * out_stride);
      } else {
        uint8_t* od = dst + (size_t)r * out_stride;
        for (int c = 0; c < outW; c++)
          od[c] = (uint8_t)std::min(std::max((int)(orow[c] + 0.5f), 0), 255);
      }
    }
  }
}

// Strip-packed text-line crops: like oc_extract_lines, but each line is
// written at ITS OWN resized width into a shared [outH, totalW] strip at
// column offset offs[i] instead of being padded to the batch-max width.
// On the low-bandwidth transport the batch-max padding is ~48% of the
// crop bytes on dense 300-dpi pages (measured, bench pages) — the strip
// halves the recognition upload losslessly; the device side gathers each
// line's window back out of the strip and applies the identical polygon
// band / width mask (ops/warp.strip_gather), so decoded text is unchanged.
//
// Caller contract: offs[i] ascending; line i owns columns
// [offs[i], offs[i] + seg_i) with seg_i = offs[i+1] - offs[i] (last line:
// totalW - offs[i]), seg_i >= max(min((int)rw_i, seg_i), 0) content columns
// and, when pack4 is set, offs[i] and totalW even (segments never share a
// packed byte). Unowned/padding columns are 0 (BLACK).
void oc_extract_lines_strip(const uint8_t* pages, int B, int H, int W,
                            const float* geom, const int32_t* offs, int N,
                            int outH, int totalW, int pack4, uint8_t* out) {
  (void)B;
  int out_stride = pack4 ? (totalW + 1) / 2 : totalW;
  std::fill(out, out + (size_t)outH * out_stride, 0);
  std::vector<float> vert;
  std::vector<int32_t> x0, x1;
  std::vector<float> wx, orow;
  for (int i = 0; i < N; i++) {
    int off = offs[i];
    int seg = (i + 1 < N ? offs[i + 1] : totalW) - off;
    float top = geom[0 * N + i], left = geom[1 * N + i];
    float h = geom[2 * N + i], w = geom[3 * N + i];
    float rw = geom[4 * N + i];
    int page_idx = (int)geom[5 * N + i];
    const uint8_t* page = pages + (size_t)page_idx * H * W;
    int n_cols = std::min((int)rw, seg);
    if (n_cols <= 0) continue;  // strip pre-zeroed
    x0.resize(seg);
    x1.resize(seg);
    wx.resize(seg);
    orow.resize(seg);
    float denom = std::max(rw, 1.0f);
    int min_x0 = W, max_x1 = -1;
    for (int c = 0; c < n_cols; c++) {
      float sx = (c + 0.5f) * (w / denom) - 0.5f;
      sx = std::min(std::max(sx, 0.0f), std::max(w - 1.0f, 0.0f));
      float in_x = left + sx;
      float fl = std::floor(in_x);
      wx[c] = in_x - fl;
      int l = (int)fl;
      x0[c] = std::min(std::max(l, 0), W - 1);
      x1[c] = std::min(std::max(l + 1, 0), W - 1);
      min_x0 = std::min(min_x0, x0[c]);
      max_x1 = std::max(max_x1, x1[c]);
    }
    int span = max_x1 - min_x0 + 1;
    vert.resize((size_t)span);
    for (int r = 0; r < outH; r++) {
      float sy = (r + 0.5f) * (h / outH) - 0.5f;
      sy = std::min(std::max(sy, 0.0f), std::max(h - 1.0f, 0.0f));
      float in_y = top + sy;
      float fl = std::floor(in_y);
      float fy = in_y - fl;
      int yl = (int)fl;
      int yi0 = std::min(std::max(yl, 0), H - 1);
      int yi1 = std::min(std::max(yl + 1, 0), H - 1);
      const uint8_t* r0 = page + (size_t)yi0 * W + min_x0;
      const uint8_t* r1 = page + (size_t)yi1 * W + min_x0;
      for (int x = 0; x < span; x++)
        vert[x] = (1.0f - fy) * r0[x] + fy * r1[x];
      for (int c = 0; c < n_cols; c++)
        orow[c] = (1.0f - wx[c]) * vert[x0[c] - min_x0] +
                  wx[c] * vert[x1[c] - min_x0];
      for (int c = n_cols; c < seg; c++) orow[c] = 0.0f;
      if (pack4) {
        // off is even by contract, so the segment starts on a byte edge.
        pack_row_4bit(orow.data(), seg, out + (size_t)r * out_stride + off / 2);
      } else {
        uint8_t* od = out + (size_t)r * out_stride + off;
        for (int c = 0; c < seg; c++)
          od[c] = (uint8_t)std::min(std::max((int)(orow[c] + 0.5f), 0), 255);
      }
    }
  }
}

}  // extern "C"
