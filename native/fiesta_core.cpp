// fiesta_native: clean-room C++17 implementation of the incremental ESDF
// algorithm family (Han et al., IROS 2019) used by the reference.
//
// Role in this framework (host-side native runtime component):
//   * fast exact oracle for the TPU implementation's parity tests (the
//     Python queue oracle is ~1000x slower);
//   * self-measured CPU baseline: BASELINE.md directs benchmarking the
//     reference algorithm's timings on the same workloads as the TPU path.
//
// Written from the algorithm description (SURVEY.md C6): dual insert/delete
// FIFO queues feed a BFS over a configurable neighbor stencil; each voxel
// tracks its closest obstacle; per-obstacle membership lists (intrusive
// doubly-linked) let deletions enumerate exactly the affected voxels.
// No code is taken from the reference; structure and naming are our own.
//
// Exposed as a C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>

namespace {

constexpr int32_t kNone = -1;
constexpr int64_t kInf = int64_t(1) << 60;

struct Vec3 {
  int32_t x, y, z;
};

// 24-neighbor stencil: 6 faces, 12 edges, 6 two-step faces (the active
// configuration in the reference; SURVEY.md C7).
const Vec3 kStencil24[] = {
    {-1, 0, 0}, {1, 0, 0},  {0, -1, 0}, {0, 1, 0},  {0, 0, -1}, {0, 0, 1},
    {-1, -1, 0}, {1, 1, 0}, {0, -1, -1}, {0, 1, 1}, {-1, 0, -1}, {1, 0, 1},
    {-1, 1, 0}, {1, -1, 0}, {0, -1, 1}, {0, 1, -1}, {1, 0, -1}, {-1, 0, 1},
    {-2, 0, 0}, {2, 0, 0},  {0, -2, 0}, {0, 2, 0},  {0, 0, -2}, {0, 0, 2},
};

class IncrementalEsdf {
 public:
  IncrementalEsdf(int32_t nx, int32_t ny, int32_t nz)
      : nx_(nx), ny_(ny), nz_(nz), total_(int64_t(nx) * ny * nz) {
    occ_.assign(total_, 0);
    dist2_.assign(total_, kInf);
    closest_.assign(total_, kNone);
    bucket_head_.assign(total_, kNone);
    link_prev_.assign(total_, kNone);
    link_next_.assign(total_, kNone);
    in_bucket_.assign(total_, 0);
  }

  int64_t index_of(int32_t x, int32_t y, int32_t z) const {
    return (int64_t(x) * ny_ + y) * nz_ + z;
  }
  Vec3 coords_of(int64_t i) const {
    const int32_t z = int32_t(i % nz_);
    const int64_t xy = i / nz_;
    return Vec3{int32_t(xy / ny_), int32_t(xy % ny_), z};
  }
  bool inside(int32_t x, int32_t y, int32_t z) const {
    return x >= 0 && x < nx_ && y >= 0 && y < ny_ && z >= 0 && z < nz_;
  }

  static int64_t sq_dist(const Vec3& a, const Vec3& b) {
    const int64_t dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
    return dx * dx + dy * dy + dz * dz;
  }

  // Batched occupancy changes; flips enqueue ESDF work.
  void set_occupancy(int64_t n, const int32_t* vox_xyz, const uint8_t* occ) {
    for (int64_t k = 0; k < n; ++k) {
      const int32_t x = vox_xyz[3 * k], y = vox_xyz[3 * k + 1],
                    z = vox_xyz[3 * k + 2];
      if (!inside(x, y, z)) continue;
      const int64_t i = index_of(x, y, z);
      const uint8_t v = occ[k] ? 1 : 0;
      if (occ_[i] == v) continue;
      occ_[i] = v;
      if (v) insert_queue_.push(i);
      else   delete_queue_.push(i);
    }
  }

  // Drain queues: seed inserts, re-seed deletion buckets, run BFS to the
  // relaxation fixpoint.  Returns the number of BFS node expansions.
  int64_t update() {
    int64_t expanded = 0;

    while (!insert_queue_.empty()) {
      const int64_t i = insert_queue_.front();
      insert_queue_.pop();
      if (!occ_[i]) continue;  // flipped back before the update
      unlink(i);
      closest_[i] = i;
      dist2_[i] = 0;
      link_into(i, i);
      bfs_queue_.push({i, 0});
    }

    while (!delete_queue_.empty()) {
      const int64_t gone = delete_queue_.front();
      delete_queue_.pop();
      if (occ_[gone]) continue;
      // Every voxel whose closest obstacle was `gone` must re-seed.
      int64_t m = bucket_head_[gone];
      bucket_head_[gone] = kNone;
      while (m != kNone) {
        const int64_t next = link_next_[m];
        link_prev_[m] = link_next_[m] = kNone;
        in_bucket_[m] = 0;

        const Vec3 v = coords_of(m);
        int64_t best = kInf;
        int64_t best_obs = kNone;
        for (const auto& d : kStencil24) {
          const int32_t x = v.x + d.x, y = v.y + d.y, z = v.z + d.z;
          if (!inside(x, y, z)) continue;
          const int64_t nb = index_of(x, y, z);
          const int64_t obs = closest_[nb];
          if (obs == kNone || !occ_[obs]) continue;
          const int64_t cand = sq_dist(v, coords_of(obs));
          if (cand < best) { best = cand; best_obs = obs; }
        }
        closest_[m] = best_obs;
        dist2_[m] = (best_obs == kNone) ? kInf : best;
        if (best_obs != kNone) {
          link_into(best_obs, m);
          bfs_queue_.push({m, best});
        }
        m = next;
      }
    }

    while (!bfs_queue_.empty()) {
      const auto [i, stamp] = bfs_queue_.front();
      bfs_queue_.pop();
      if (stamp != dist2_[i]) continue;  // stale entry
      ++expanded;
      const Vec3 v = coords_of(i);

      // Pull a better obstacle from any neighbor.
      bool improved = false;
      for (const auto& d : kStencil24) {
        const int32_t x = v.x + d.x, y = v.y + d.y, z = v.z + d.z;
        if (!inside(x, y, z)) continue;
        const int64_t obs = closest_[index_of(x, y, z)];
        if (obs == kNone) continue;
        const int64_t cand = sq_dist(v, coords_of(obs));
        if (cand < dist2_[i]) {
          dist2_[i] = cand;
          unlink(i);
          closest_[i] = obs;
          link_into(obs, i);
          improved = true;
        }
      }
      if (improved) {
        bfs_queue_.push({i, dist2_[i]});
        continue;
      }

      // Push our obstacle to improvable neighbors.
      const int64_t obs = closest_[i];
      const Vec3 oc = coords_of(obs);
      for (const auto& d : kStencil24) {
        const int32_t x = v.x + d.x, y = v.y + d.y, z = v.z + d.z;
        if (!inside(x, y, z)) continue;
        const int64_t nb = index_of(x, y, z);
        const int64_t cand = sq_dist(Vec3{x, y, z}, oc);
        if (cand < dist2_[nb]) {
          dist2_[nb] = cand;
          unlink(nb);
          closest_[nb] = obs;
          link_into(obs, nb);
          bfs_queue_.push({nb, cand});
        }
      }
    }
    return expanded;
  }

  void get_dist2(int64_t* out) const {
    for (int64_t i = 0; i < total_; ++i)
      out[i] = (dist2_[i] >= kInf) ? -1 : dist2_[i];
  }
  void get_closest(int64_t* out) const {
    std::memcpy(out, closest_.data(), sizeof(int64_t) * total_);
  }

 private:
  void link_into(int64_t obstacle, int64_t member) {
    link_prev_[member] = kNone;
    link_next_[member] = bucket_head_[obstacle];
    if (bucket_head_[obstacle] != kNone)
      link_prev_[bucket_head_[obstacle]] = member;
    bucket_head_[obstacle] = member;
    in_bucket_[member] = 1;
  }
  void unlink(int64_t member) {
    if (!in_bucket_[member]) return;
    const int64_t owner = closest_[member];
    if (link_prev_[member] != kNone)
      link_next_[link_prev_[member]] = link_next_[member];
    else if (owner != kNone)
      bucket_head_[owner] = link_next_[member];
    if (link_next_[member] != kNone)
      link_prev_[link_next_[member]] = link_prev_[member];
    link_prev_[member] = link_next_[member] = kNone;
    in_bucket_[member] = 0;
  }

  int32_t nx_, ny_, nz_;
  int64_t total_;
  std::vector<uint8_t> occ_;
  std::vector<int64_t> dist2_;
  std::vector<int64_t> closest_;
  std::vector<int64_t> bucket_head_, link_prev_, link_next_;
  std::vector<uint8_t> in_bucket_;
  std::queue<int64_t> insert_queue_, delete_queue_;
  std::queue<std::pair<int64_t, int64_t>> bfs_queue_;
};

}  // namespace

extern "C" {

void* fiesta_esdf_create(int32_t nx, int32_t ny, int32_t nz) {
  return new IncrementalEsdf(nx, ny, nz);
}
void fiesta_esdf_destroy(void* h) {
  delete static_cast<IncrementalEsdf*>(h);
}
void fiesta_esdf_set_occupancy(void* h, int64_t n, const int32_t* vox,
                               const uint8_t* occ) {
  static_cast<IncrementalEsdf*>(h)->set_occupancy(n, vox, occ);
}
int64_t fiesta_esdf_update(void* h) {
  return static_cast<IncrementalEsdf*>(h)->update();
}
void fiesta_esdf_get_dist2(void* h, int64_t* out) {
  static_cast<IncrementalEsdf*>(h)->get_dist2(out);
}
void fiesta_esdf_get_closest(void* h, int64_t* out) {
  static_cast<IncrementalEsdf*>(h)->get_closest(out);
}

}  // extern "C"
