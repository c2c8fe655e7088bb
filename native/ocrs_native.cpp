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
#include <cmath>
#include <cstdint>
#include <queue>
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

}  // namespace

extern "C" {

// Breuel max-empty-rects with Shafait score + IoU overlap filter
// (empty_rects.rs:86-229, layout_analysis.rs:137-155). `obs` is K x 4
// (t,l,b,r), PRE-SORTED by (int)center.x then (int)center.y. Returns the
// number of rects written to `out` (up to max_out rows of t,l,b,r).
int oc_find_separators(const double* obs, int K, const double* boundary,
                       double min_w, double min_h, double iou_thresh,
                       int max_out, double* out) {
  std::priority_queue<Partition, std::vector<Partition>, PartitionLess> queue;
  Tlbr bound{boundary[0], boundary[1], boundary[2], boundary[3]};
  if (bound.r - bound.l > 0 && bound.b - bound.t > 0) {
    std::vector<Tlbr> all(K);
    for (int i = 0; i < K; i++)
      all[i] = Tlbr{obs[i * 4], obs[i * 4 + 1], obs[i * 4 + 2], obs[i * 4 + 3]};
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

}  // extern "C"
