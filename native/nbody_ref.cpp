// Native golden-reference N-body engine (C++17, f64).
//
// Re-implements the physics of the Rust reference from its semantics (not
// its source): the additive-epsilon force law of sim/mod.rs:22-37, the
// semi-implicit Euler integrator of direct.rs:8-24, and the Barnes-Hut
// octree with the reference's exact quirks — size_sq is the x-extent only
// (tree.rs:138,214), opening criterion theta^2*d^2 < size^2 (mod.rs:64-67),
// d^2 == 0 skip (mod.rs:59-62), massless bodies excluded from the tree
// (tree.rs:124-131), octant index by (pos < center) bit tests
// (tree.rs:157-163).
//
// Role in the TPU framework: the f64 oracle for golden tests at body counts
// where a Python loop oracle is unusable, and a threaded host-side fallback
// engine (thread count = ceil(N/2000) capped at 20, matching the
// reference's rayon pool policy, constants.rs:17-19 / sim/mod.rs:40-43).
//
// Exposed as a plain C ABI for ctypes; built by native/Makefile.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr int kSofteningRef = 0;
constexpr int kSofteningPlummer = 1;

struct V3 {
  double x = 0, y = 0, z = 0;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

// Pairwise kernel: out += rel * m * g * w(r^2)
inline void accumulate(const V3& rel, double mass, double g, double eps,
                       int softening, V3* out) {
  const double r2 = dot(rel, rel);
  double w;
  if (softening == kSofteningRef) {
    const double denom = r2 * std::sqrt(r2) + eps;
    w = denom > 0 ? 1.0 / denom : 0.0;
  } else {
    const double d2 = r2 + eps * eps;
    w = d2 > 0 ? 1.0 / (d2 * std::sqrt(d2)) : 0.0;
  }
  const double s = mass * g * w;
  out->x += rel.x * s;
  out->y += rel.y * s;
  out->z += rel.z * s;
}

int target_threads(int64_t n) {
  // ceil(N / 2000) capped at 20: the reference pool policy.
  int64_t t = (n + 1999) / 2000;
  t = std::min<int64_t>(t, 20);
  t = std::min<int64_t>(t, std::max(1u, std::thread::hardware_concurrency()));
  return static_cast<int>(std::max<int64_t>(t, 1));
}

void parallel_for(int64_t n, int n_threads, const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// ---- Octree (reference-semantics Barnes-Hut) ----

struct Node {
  V3 com;            // mass-weighted centre
  double mass = 0;
  double size_sq = 0;  // x-extent squared (the reference quirk)
  int32_t children[8] = {-1, -1, -1, -1, -1, -1, -1, -1};
  bool internal = false;
};

struct Region {
  double xr[2], yr[2], zr[2];
  V3 center() const {
    return {(xr[0] + xr[1]) / 2, (yr[0] + yr[1]) / 2, (zr[0] + zr[1]) / 2};
  }
};

struct Tree {
  std::vector<Node> nodes;

  int32_t build(const std::vector<V3>& pos, const std::vector<double>& mass,
                std::vector<int32_t>& index, int64_t lo, int64_t hi,
                const Region& region) {
    if (lo >= hi) return -1;
    const int32_t id = static_cast<int32_t>(nodes.size());
    nodes.emplace_back();
    // aggregate COM / mass
    V3 com{};
    double m_tot = 0;
    for (int64_t k = lo; k < hi; ++k) {
      const V3& p = pos[index[k]];
      const double m = mass[index[k]];
      com.x += p.x * m;
      com.y += p.y * m;
      com.z += p.z * m;
      m_tot += m;
    }
    nodes[id].com = {com.x / m_tot, com.y / m_tot, com.z / m_tot};
    nodes[id].mass = m_tot;
    nodes[id].size_sq = (region.xr[1] - region.xr[0]) * (region.xr[1] - region.xr[0]);

    // all at the same position? -> external node
    bool all_same = true;
    for (int64_t k = lo + 1; k < hi && all_same; ++k) {
      const V3& a = pos[index[k - 1]];
      const V3& b = pos[index[k]];
      all_same = a.x == b.x && a.y == b.y && a.z == b.z;
    }
    if (all_same) return id;

    nodes[id].internal = true;
    const V3 c = region.center();
    // partition the index range into the 8 octants (stable, in place)
    auto octant_of = [&](int32_t i) {
      const V3& p = pos[i];
      return (p.x < c.x ? 1 : 0) | (p.y < c.y ? 2 : 0) | (p.z < c.z ? 4 : 0);
    };
    std::vector<int32_t> buckets[8];
    for (int64_t k = lo; k < hi; ++k) buckets[octant_of(index[k])].push_back(index[k]);
    int64_t cursor = lo;
    int64_t starts[9];
    for (int o = 0; o < 8; ++o) {
      starts[o] = cursor;
      for (int32_t v : buckets[o]) index[cursor++] = v;
    }
    starts[8] = hi;

    for (int o = 0; o < 8; ++o) {
      Region r;
      // octant o bit set means coordinate < center (tree.rs:191-213)
      if (o & 1) { r.xr[0] = region.xr[0]; r.xr[1] = c.x; }
      else       { r.xr[0] = c.x;          r.xr[1] = region.xr[1]; }
      if (o & 2) { r.yr[0] = region.yr[0]; r.yr[1] = c.y; }
      else       { r.yr[0] = c.y;          r.yr[1] = region.yr[1]; }
      if (o & 4) { r.zr[0] = region.zr[0]; r.zr[1] = c.z; }
      else       { r.zr[0] = c.z;          r.zr[1] = region.zr[1]; }
      const int32_t child = build(pos, mass, index, starts[o], starts[o + 1], r);
      nodes[id].children[o] = child;
    }
    return id;
  }
};

void tree_force(const Tree& tree, const V3& p, double theta_sq, double g,
                double eps, int softening, V3* out) {
  if (tree.nodes.empty()) return;
  std::vector<int32_t> stack;
  stack.push_back(0);
  while (!stack.empty()) {
    const int32_t id = stack.back();
    stack.pop_back();
    if (id < 0) continue;
    const Node& node = tree.nodes[id];
    const V3 rel = sub(node.com, p);
    const double d2 = dot(rel, rel);
    if (d2 == 0.0) continue;  // self / coincident skip (mod.rs:59-62)
    if (node.internal && theta_sq * d2 < node.size_sq) {
      for (int o = 0; o < 8; ++o) stack.push_back(node.children[o]);
    } else {
      accumulate(rel, node.mass, g, eps, softening, out);
    }
  }
}

}  // namespace

extern "C" {

// Direct all-pairs acceleration. pos: n*3, mass: n, out: n*3 (overwritten).
void nbody_acc_direct(const double* pos, const double* mass, int64_t n,
                      double g, double eps, int softening, double* out) {
  const int threads = target_threads(n);
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      V3 acc{};
      const V3 pi{pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
      for (int64_t j = 0; j < n; ++j) {
        if (j == i) continue;
        const V3 pj{pos[3 * j], pos[3 * j + 1], pos[3 * j + 2]};
        accumulate(sub(pj, pi), mass[j], g, eps, softening, &acc);
      }
      out[3 * i] = acc.x;
      out[3 * i + 1] = acc.y;
      out[3 * i + 2] = acc.z;
    }
  });
}

// Barnes-Hut acceleration with the reference's exact tree semantics.
void nbody_acc_barnes_hut(const double* pos, const double* mass, int64_t n,
                          double theta, double g, double eps, int softening,
                          double* out) {
  std::vector<V3> p(n);
  std::vector<double> m_massive;
  std::vector<V3> p_massive;
  Region region{{1e300, -1e300}, {1e300, -1e300}, {1e300, -1e300}};
  for (int64_t i = 0; i < n; ++i) {
    p[i] = {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
    region.xr[0] = std::min(region.xr[0], p[i].x);
    region.xr[1] = std::max(region.xr[1], p[i].x);
    region.yr[0] = std::min(region.yr[0], p[i].y);
    region.yr[1] = std::max(region.yr[1], p[i].y);
    region.zr[0] = std::min(region.zr[0], p[i].z);
    region.zr[1] = std::max(region.zr[1], p[i].z);
    if (mass[i] > 0) {  // massless bodies never enter the tree
      p_massive.push_back(p[i]);
      m_massive.push_back(mass[i]);
    }
  }
  for (int64_t i = 0; i < 3 * n; ++i) out[i] = 0;
  if (p_massive.empty()) return;  // empty-tree early-out (mod.rs:19-21)

  Tree tree;
  std::vector<int32_t> index(p_massive.size());
  for (size_t k = 0; k < index.size(); ++k) index[k] = static_cast<int32_t>(k);
  tree.build(p_massive, m_massive, index, 0,
             static_cast<int64_t>(p_massive.size()), region);

  const double theta_sq = theta * theta;
  const int threads = target_threads(n);
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      V3 acc{};
      tree_force(tree, p[i], theta_sq, g, eps, softening, &acc);
      out[3 * i] = acc.x;
      out[3 * i + 1] = acc.y;
      out[3 * i + 2] = acc.z;
    }
  });
}

// Semi-implicit Euler rollout in place (direct.rs:8-24 semantics):
// for each step: acc pass, vel += acc*dt, pos += vel*dt.
// algorithm: 0 = direct, 1 = barnes-hut(theta).
void nbody_rollout(double* pos, double* vel, const double* mass, int64_t n,
                   double dt, int64_t steps, double g, double eps,
                   int softening, int algorithm, double theta) {
  std::vector<double> acc(3 * n);
  for (int64_t s = 0; s < steps; ++s) {
    if (algorithm == 1) {
      nbody_acc_barnes_hut(pos, mass, n, theta, g, eps, softening, acc.data());
    } else {
      nbody_acc_direct(pos, mass, n, g, eps, softening, acc.data());
    }
    const int threads = target_threads(n);
    parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) {
        for (int c = 0; c < 3; ++c) {
          vel[3 * i + c] += acc[3 * i + c] * dt;
          pos[3 * i + c] += vel[3 * i + c] * dt;
        }
      }
    });
  }
}

// Total energy (kinetic + pairwise potential), for drift validation.
double nbody_total_energy(const double* pos, const double* vel,
                          const double* mass, int64_t n, double g,
                          double eps, int softening) {
  double ke = 0;
  for (int64_t i = 0; i < n; ++i) {
    const double v2 = vel[3 * i] * vel[3 * i] + vel[3 * i + 1] * vel[3 * i + 1] +
                      vel[3 * i + 2] * vel[3 * i + 2];
    ke += 0.5 * mass[i] * v2;
  }
  double pe = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = i + 1; j < n; ++j) {
      const V3 rel{pos[3 * j] - pos[3 * i], pos[3 * j + 1] - pos[3 * i + 1],
                   pos[3 * j + 2] - pos[3 * i + 2]};
      double d2 = dot(rel, rel);
      if (softening == kSofteningPlummer) d2 += eps * eps;
      if (d2 > 0) pe -= g * mass[i] * mass[j] / std::sqrt(d2);
    }
  }
  return ke + pe;
}

}  // extern "C"
