// HSPS (hyperspectral patch store) native reader.
//
// The training hot path needs clean patches gathered into a contiguous
// pinned batch at HBM-feed rate. This mmap-based reader does the gather in
// C++ with a worker pool, off the Python GIL (role analogue of the
// reference's LMDB + DataLoader-worker input path,
// utils/dataset_utils.py:39-100, and of its vendored native extensions).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
//
// Format (written by mp_hsir_tpu/data/patch_store.py):
//   data.bin       raw float32 patches back to back
//   meta_info.txt  "<idx> (h,w,c) source_file=<name>" per line
//   offsets.npy    optional; offsets are recomputed from meta here.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct PatchMeta {
  int64_t offset;  // bytes into data.bin
  int32_t c, h, w;
};

struct Store {
  int fd = -1;
  const float* base = nullptr;
  size_t bytes = 0;
  std::vector<PatchMeta> meta;
};

bool parse_meta_line(const char* line, int32_t* h, int32_t* w, int32_t* c) {
  // "<idx> (h,w,c) source_file=<name>"
  const char* p = strchr(line, '(');
  if (!p) return false;
  return sscanf(p, "(%d,%d,%d)", h, w, c) == 3;
}

}  // namespace

extern "C" {

void* hsps_open(const char* dir) {
  std::string d(dir);
  std::string meta_path = d + "/meta_info.txt";
  FILE* f = fopen(meta_path.c_str(), "r");
  if (!f) return nullptr;

  auto* s = new Store();
  char line[1024];
  int64_t offset = 0;
  while (fgets(line, sizeof(line), f)) {
    int32_t h, w, c;
    if (!parse_meta_line(line, &h, &w, &c)) continue;
    s->meta.push_back({offset, c, h, w});
    offset += static_cast<int64_t>(c) * h * w * sizeof(float);
  }
  fclose(f);

  std::string bin_path = d + "/data.bin";
  s->fd = open(bin_path.c_str(), O_RDONLY);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  struct stat st;
  fstat(s->fd, &st);
  s->bytes = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, s->bytes, PROT_READ, MAP_PRIVATE, s->fd, 0);
  if (m == MAP_FAILED) {
    close(s->fd);
    delete s;
    return nullptr;
  }
  madvise(m, s->bytes, MADV_WILLNEED);
  s->base = static_cast<const float*>(m);
  return s;
}

int64_t hsps_count(void* handle) {
  return static_cast<Store*>(handle)->meta.size();
}

// c, h, w of patch i (Python-style index wrap)
void hsps_shape(void* handle, int64_t i, int32_t* chw) {
  auto* s = static_cast<Store*>(handle);
  const int64_t count = static_cast<int64_t>(s->meta.size());
  if (count == 0) { chw[0] = chw[1] = chw[2] = 0; return; }
  const auto& m = s->meta[((i % count) + count) % count];
  chw[0] = m.c;
  chw[1] = m.h;
  chw[2] = m.w;
}

// Gather n same-shaped patches into out (n, c, h, w), multithreaded.
// Returns 0 on success, -1 on shape mismatch / bad index.
int hsps_gather(void* handle, const int64_t* idxs, int64_t n, float* out,
                int32_t n_threads) {
  auto* s = static_cast<Store*>(handle);
  if (n == 0) return 0;
  const int64_t count = static_cast<int64_t>(s->meta.size());
  if (count == 0) return -1;
  // Python-style wrap: C++ % keeps the sign, so normalize to [0, count)
  auto wrap = [count](int64_t i) { return ((i % count) + count) % count; };
  const auto& first = s->meta[wrap(idxs[0])];
  const size_t patch_elems =
      static_cast<size_t>(first.c) * first.h * first.w;

  std::atomic<int> bad{0};
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t j = lo; j < hi; ++j) {
      const auto& m = s->meta[wrap(idxs[j])];
      // exact (c, h, w) match — equal element counts with different dims
      // would silently reinterpret the layout
      if (m.c != first.c || m.h != first.h || m.w != first.w) {
        bad.store(1);
        return;
      }
      const size_t end = static_cast<size_t>(m.offset) + patch_elems * sizeof(float);
      if (end > s->bytes) {  // truncated data.bin: fail instead of SIGBUS
        bad.store(1);
        return;
      }
      memcpy(out + j * patch_elems,
             s->base + m.offset / sizeof(float),
             patch_elems * sizeof(float));
    }
  };

  if (n_threads <= 1 || n < 4) {
    worker(0, n);
  } else {
    int t = n_threads;
    std::vector<std::thread> pool;
    int64_t chunk = (n + t - 1) / t;
    for (int k = 0; k < t; ++k) {
      int64_t lo = k * chunk;
      int64_t hi = lo + chunk < n ? lo + chunk : n;
      if (lo >= hi) break;
      pool.emplace_back(worker, lo, hi);
    }
    for (auto& th : pool) th.join();
  }
  return bad.load() ? -1 : 0;
}

void hsps_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (s->base) munmap(const_cast<float*>(s->base), s->bytes);
  if (s->fd >= 0) close(s->fd);
  delete s;
}

}  // extern "C"
