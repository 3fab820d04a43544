// AdvShadow-TPU native GrabCut: GMM color models + Dinic max-flow/min-cut,
// exposed through a C ABI for ctypes.
//
// Re-implements the algorithm behind cv2.grabCut (the only native
// component the reference depends on, ref: mask_for_dataset.py:69-80)
// with OpenCV mask semantics: 0=BGD, 1=FGD, 2=PR_BGD, 3=PR_FGD, mask
// updated in place, mode GC_INIT_WITH_MASK.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libadvshadow_grabcut.so grabcut.cpp
//
// Structure:
//   Gmm        - K=5 full-covariance 3-D Gaussian mixture (FG and BG)
//   Graph      - 8-connected grid, Dinic blocking-flow max-flow
//   grabcut()  - iterate: assign components -> learn GMMs -> build graph
//                -> min-cut -> update probable labels

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

constexpr int GC_BGD = 0;
constexpr int GC_FGD = 1;
constexpr int GC_PR_BGD = 2;
constexpr int GC_PR_FGD = 3;
constexpr int K = 5;  // GMM components (OpenCV default)

inline bool is_bg(uint8_t m) { return m == GC_BGD || m == GC_PR_BGD; }

// ---------------------------------------------------------------------------
// Gaussian mixture model over RGB triples, full 3x3 covariance.
// ---------------------------------------------------------------------------
struct Gmm {
  double weight[K] = {};
  double mean[K][3] = {};
  double cov[K][3][3] = {};
  double inv_cov[K][3][3] = {};
  double cov_det[K] = {};

  // accumulation state
  double sum[K][3] = {};
  double prod[K][3][3] = {};
  int count[K] = {};
  int total = 0;

  void init_learning() {
    std::memset(sum, 0, sizeof(sum));
    std::memset(prod, 0, sizeof(prod));
    std::memset(count, 0, sizeof(count));
    total = 0;
  }

  void add_sample(int k, const double c[3]) {
    for (int i = 0; i < 3; i++) {
      sum[k][i] += c[i];
      for (int j = 0; j < 3; j++) prod[k][i][j] += c[i] * c[j];
    }
    count[k]++;
    total++;
  }

  void end_learning() {
    constexpr double kVar = 0.01;  // covariance regularizer (OpenCV parity)
    for (int k = 0; k < K; k++) {
      if (count[k] == 0) {
        weight[k] = 0;
        continue;
      }
      double n = count[k];
      weight[k] = n / total;
      for (int i = 0; i < 3; i++) mean[k][i] = sum[k][i] / n;
      for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++)
          cov[k][i][j] = prod[k][i][j] / n - mean[k][i] * mean[k][j];
      double det = determinant(cov[k]);
      if (det <= std::numeric_limits<double>::epsilon()) {
        // add white noise to avoid singularity (OpenCV does the same)
        cov[k][0][0] += kVar;
        cov[k][1][1] += kVar;
        cov[k][2][2] += kVar;
        det = determinant(cov[k]);
      }
      cov_det[k] = det;
      invert(cov[k], det, inv_cov[k]);
    }
  }

  static double determinant(const double c[3][3]) {
    return c[0][0] * (c[1][1] * c[2][2] - c[1][2] * c[2][1]) -
           c[0][1] * (c[1][0] * c[2][2] - c[1][2] * c[2][0]) +
           c[0][2] * (c[1][0] * c[2][1] - c[1][1] * c[2][0]);
  }

  static void invert(const double c[3][3], double det, double out[3][3]) {
    double inv_det = 1.0 / det;
    out[0][0] = (c[1][1] * c[2][2] - c[1][2] * c[2][1]) * inv_det;
    out[1][0] = -(c[1][0] * c[2][2] - c[1][2] * c[2][0]) * inv_det;
    out[2][0] = (c[1][0] * c[2][1] - c[1][1] * c[2][0]) * inv_det;
    out[0][1] = -(c[0][1] * c[2][2] - c[0][2] * c[2][1]) * inv_det;
    out[1][1] = (c[0][0] * c[2][2] - c[0][2] * c[2][0]) * inv_det;
    out[2][1] = -(c[0][0] * c[2][1] - c[0][1] * c[2][0]) * inv_det;
    out[0][2] = (c[0][1] * c[1][2] - c[0][2] * c[1][1]) * inv_det;
    out[1][2] = -(c[0][0] * c[1][2] - c[0][2] * c[1][0]) * inv_det;
    out[2][2] = (c[0][0] * c[1][1] - c[0][1] * c[1][0]) * inv_det;
  }

  // likelihood of color under component k
  double component_pdf(int k, const double c[3]) const {
    if (weight[k] <= 0) return 0.0;
    double d[3] = {c[0] - mean[k][0], c[1] - mean[k][1], c[2] - mean[k][2]};
    double m = 0;
    for (int i = 0; i < 3; i++) {
      double r = 0;
      for (int j = 0; j < 3; j++) r += d[j] * inv_cov[k][j][i];
      m += r * d[i];
    }
    return 1.0 / std::sqrt(cov_det[k]) * std::exp(-0.5 * m);
  }

  double pdf(const double c[3]) const {
    double p = 0;
    for (int k = 0; k < K; k++)
      if (weight[k] > 0) p += weight[k] * component_pdf(k, c);
    return p;
  }

  int which_component(const double c[3]) const {
    int best = 0;
    double best_p = -1;
    for (int k = 0; k < K; k++) {
      double p = component_pdf(k, c);
      if (p > best_p) {
        best_p = p;
        best = k;
      }
    }
    return best;
  }
};

// k-means-style init: split samples by intensity quantile per label set
void init_gmms(const std::vector<double>& colors,
               const std::vector<uint8_t>& mask, Gmm& bgd, Gmm& fgd) {
  // simple k-means (few iterations) per label group
  size_t n = mask.size();
  auto run_kmeans = [&](bool bg, Gmm& gmm) {
    std::vector<size_t> idx;
    for (size_t i = 0; i < n; i++)
      if (is_bg(mask[i]) == bg) idx.push_back(i);
    if (idx.empty()) return;
    // init centers spread over samples
    double centers[K][3];
    for (int k = 0; k < K; k++) {
      size_t i = idx[(idx.size() - 1) * k / (K - 1 > 0 ? K - 1 : 1)];
      for (int j = 0; j < 3; j++) centers[k][j] = colors[3 * i + j];
    }
    std::vector<int> assign(idx.size(), 0);
    for (int it = 0; it < 10; it++) {
      // assign
      for (size_t a = 0; a < idx.size(); a++) {
        const double* c = &colors[3 * idx[a]];
        int best = 0;
        double bd = 1e300;
        for (int k = 0; k < K; k++) {
          double d = 0;
          for (int j = 0; j < 3; j++) {
            double t = c[j] - centers[k][j];
            d += t * t;
          }
          if (d < bd) {
            bd = d;
            best = k;
          }
        }
        assign[a] = best;
      }
      // update
      double sums[K][3] = {};
      int cnt[K] = {};
      for (size_t a = 0; a < idx.size(); a++) {
        for (int j = 0; j < 3; j++) sums[assign[a]][j] += colors[3 * idx[a] + j];
        cnt[assign[a]]++;
      }
      for (int k = 0; k < K; k++)
        if (cnt[k])
          for (int j = 0; j < 3; j++) centers[k][j] = sums[k][j] / cnt[k];
    }
    gmm.init_learning();
    for (size_t a = 0; a < idx.size(); a++)
      gmm.add_sample(assign[a], &colors[3 * idx[a]]);
    gmm.end_learning();
  };
  run_kmeans(true, bgd);
  run_kmeans(false, fgd);
}

// ---------------------------------------------------------------------------
// Max-flow via Dinic's algorithm with a super source/sink.
// Simple, predictable, and fast on 8-connected grid graphs.
// ---------------------------------------------------------------------------
class Graph {
 public:
  explicit Graph(int num_nodes)
      : n_(num_nodes + 2), src_(num_nodes), snk_(num_nodes + 1),
        first_arc_(n_, -1), level_(n_), iter_(n_) {}

  void add_tweights(int i, double cap_source, double cap_sink) {
    if (cap_source > 0) add_edge(src_, i, cap_source, 0);
    if (cap_sink > 0) add_edge(i, snk_, cap_sink, 0);
  }

  void add_edge(int i, int j, double cap, double rev_cap) {
    arcs_.push_back({j, first_arc_[i], cap});
    first_arc_[i] = (int)arcs_.size() - 1;
    arcs_.push_back({i, first_arc_[j], rev_cap});
    first_arc_[j] = (int)arcs_.size() - 1;
  }

  double maxflow() {
    double flow = 0;
    while (bfs()) {
      iter_ = first_arc_;
      double f;
      while ((f = dfs(src_, 1e300)) > 1e-12) flow += f;
    }
    // final reachability defines the source segment
    bfs();
    return flow;
  }

  bool in_source_segment(int i) const { return level_[i] >= 0; }

 private:
  struct Arc {
    int head;
    int next;
    double cap;
  };

  bool bfs() {
    std::fill(level_.begin(), level_.end(), -1);
    std::queue<int> q;
    level_[src_] = 0;
    q.push(src_);
    while (!q.empty()) {
      int u = q.front();
      q.pop();
      for (int a = first_arc_[u]; a != -1; a = arcs_[a].next) {
        if (arcs_[a].cap > 1e-12 && level_[arcs_[a].head] < 0) {
          level_[arcs_[a].head] = level_[u] + 1;
          q.push(arcs_[a].head);
        }
      }
    }
    return level_[snk_] >= 0;
  }

  double dfs(int u, double f) {
    if (u == snk_) return f;
    for (int& a = iter_[u]; a != -1; a = arcs_[a].next) {
      Arc& e = arcs_[a];
      if (e.cap > 1e-12 && level_[e.head] == level_[u] + 1) {
        double d = dfs(e.head, std::min(f, e.cap));
        if (d > 1e-12) {
          e.cap -= d;
          arcs_[a ^ 1].cap += d;
          return d;
        }
      }
    }
    return 0;
  }

  int n_, src_, snk_;
  std::vector<Arc> arcs_;
  std::vector<int> first_arc_;
  std::vector<int> level_;
  std::vector<int> iter_;
};

}  // namespace

extern "C" {

// img: h*w*3 uint8 (any consistent channel order); mask: h*w uint8 with
// OpenCV GC_* values, updated in place. Returns 0 on success.
int advshadow_grabcut(const uint8_t* img, int h, int w, uint8_t* mask,
                      int iter_count, double gamma) {
  const int n = h * w;
  if (n <= 0) return 1;
  std::vector<double> colors(3 * n);
  for (int i = 0; i < n; i++)
    for (int j = 0; j < 3; j++) colors[3 * i + j] = (double)img[3 * i + j];
  std::vector<uint8_t> m(mask, mask + n);

  // beta = 1 / (2 * mean ||z_i - z_j||^2) over all neighbor pairs
  double beta_acc = 0;
  long long beta_cnt = 0;
  auto sqdiff = [&](int a, int b) {
    double s = 0;
    for (int j = 0; j < 3; j++) {
      double d = colors[3 * a + j] - colors[3 * b + j];
      s += d * d;
    }
    return s;
  };
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      int i = y * w + x;
      if (x > 0) { beta_acc += sqdiff(i, i - 1); beta_cnt++; }
      if (y > 0) { beta_acc += sqdiff(i, i - w); beta_cnt++; }
      if (x > 0 && y > 0) { beta_acc += sqdiff(i, i - w - 1); beta_cnt++; }
      if (x < w - 1 && y > 0) { beta_acc += sqdiff(i, i - w + 1); beta_cnt++; }
    }
  double beta = beta_acc <= 0 ? 0 : 1.0 / (2.0 * beta_acc / beta_cnt);
  const double inv_sqrt2 = 1.0 / std::sqrt(2.0);
  const double max_weight = 8 * gamma + 1;  // "infinite" t-link

  Gmm bgd, fgd;
  init_gmms(colors, m, bgd, fgd);

  std::vector<int> comp(n, 0);
  for (int it = 0; it < iter_count; it++) {
    // 1. assign components
    for (int i = 0; i < n; i++) {
      const double* c = &colors[3 * i];
      comp[i] = is_bg(m[i]) ? bgd.which_component(c) : fgd.which_component(c);
    }
    // 2. learn GMMs
    bgd.init_learning();
    fgd.init_learning();
    for (int i = 0; i < n; i++) {
      if (is_bg(m[i])) bgd.add_sample(comp[i], &colors[3 * i]);
      else fgd.add_sample(comp[i], &colors[3 * i]);
    }
    bgd.end_learning();
    fgd.end_learning();

    // 3. build graph
    Graph g(n);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        int i = y * w + x;
        const double* c = &colors[3 * i];
        double from_src, to_snk;
        if (m[i] == GC_BGD) {
          from_src = 0;
          to_snk = max_weight;
        } else if (m[i] == GC_FGD) {
          from_src = max_weight;
          to_snk = 0;
        } else {
          from_src = -std::log(std::max(bgd.pdf(c), 1e-30));
          to_snk = -std::log(std::max(fgd.pdf(c), 1e-30));
        }
        g.add_tweights(i, from_src, to_snk);
        auto nlink = [&](int jj, double dist_w) {
          double wgt = gamma * dist_w * std::exp(-beta * sqdiff(i, jj));
          g.add_edge(i, jj, wgt, wgt);
        };
        if (x > 0) nlink(i - 1, 1.0);
        if (y > 0) nlink(i - w, 1.0);
        if (x > 0 && y > 0) nlink(i - w - 1, inv_sqrt2);
        if (x < w - 1 && y > 0) nlink(i - w + 1, inv_sqrt2);
      }

    // 4. min cut, 5. update probable labels (early-exit when converged,
    // mirroring OpenCV's fixed-point behavior)
    g.maxflow();
    int changed = 0;
    for (int i = 0; i < n; i++) {
      if (m[i] == GC_BGD || m[i] == GC_FGD) continue;
      uint8_t next = g.in_source_segment(i) ? GC_PR_FGD : GC_PR_BGD;
      changed += (next != m[i]);
      m[i] = next;
    }
    if (changed == 0 && it > 0) break;
  }
  std::memcpy(mask, m.data(), n);
  return 0;
}

const char* advshadow_grabcut_version() { return "advshadow-grabcut-1.0"; }

}  // extern "C"
