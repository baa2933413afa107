// Standalone benchmark + thread-scaling harness for the native H.264
// entropy parser (entropy.cc).  No Python, no GIL: measures the pure C++
// per-core rate and its scaling across threads, the numbers PERF.md's
// host-entropy model is built from.
//
// Usage: bench_parse <prefix> <mode> <threads> <iters>
//   <prefix>  .meta/.blob pair from tools/gen_slice_meta.py
//   <mode>    0 classic raster buffers, 1 slab records, 2 device layout
//   <threads> worker threads, each with PRIVATE buffers (frame-parallel,
//             exactly like the production pool)
//   <iters>   frames parsed PER THREAD
// Output: one line "mode=M threads=T frames=N wall=S fps=F ms/frame=MS".
//
// Build: g++ -O3 -march=native -std=c++17 -o /tmp/bench_parse \
//          tools/bench_parse.cc minivideo_tpu/native/src/entropy.cc

#include <sys/resource.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int64_t mv_parse_slice(const uint8_t*, int64_t, int64_t, int32_t, int32_t,
                       int32_t, int32_t, int32_t, int32_t, void**);
int64_t mv_parse_slice_slab(const uint8_t*, int64_t, int64_t, int32_t,
                            int32_t, int32_t, int32_t, int32_t, int32_t,
                            int32_t, void**);
int64_t mv_parse_slice_slab2(const uint8_t*, int64_t, int64_t, int32_t,
                             int32_t, int32_t, int32_t, int32_t, int32_t,
                             int32_t, int32_t, int32_t, int32_t, int32_t,
                             void**);
}

struct SliceRef {
  int64_t off, len, bitoff, first_mb, qp;
};

struct Meta {
  int wmb, hmb, cabac, t8, cb_off, cr_off;
  std::vector<SliceRef> slices;
  std::vector<uint8_t> blob;
};

static bool load(const char* prefix, Meta& m) {
  FILE* f = std::fopen((std::string(prefix) + ".meta").c_str(), "r");
  if (!f) return false;
  int n = 0;
  if (std::fscanf(f, "%d %d %d %d %d %d %d", &m.wmb, &m.hmb, &m.cabac,
                  &m.t8, &m.cb_off, &m.cr_off, &n) != 7) return false;
  m.slices.resize(n);
  for (auto& s : m.slices)
    if (std::fscanf(f, "%lld %lld %lld %lld %lld", (long long*)&s.off,
                    (long long*)&s.len, (long long*)&s.bitoff,
                    (long long*)&s.first_mb, (long long*)&s.qp) != 5)
      return false;
  std::fclose(f);
  f = std::fopen((std::string(prefix) + ".blob").c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  m.blob.resize((size_t)sz);
  if (std::fread(m.blob.data(), 1, (size_t)sz, f) != (size_t)sz)
    return false;
  std::fclose(f);
  return true;
}

// per-thread buffer set; layout mirrors native/__init__.py _FIELDS
struct Bufs {
  std::vector<std::vector<uint8_t>> store;
  std::vector<void*> ptr;
  void add(size_t bytes) {
    store.emplace_back(bytes, 0);
    ptr.push_back(store.back().data());
  }
  Bufs(int wmb, int hmb, int mode) {
    size_t n = (size_t)wmb * hmb;
    const size_t classic[22] = {
        n, n * 4, n, n, n * 16, n * 4, n, n,
        n * 16 * 4, n * 256 * 4, n * 256 * 4, n * 8 * 4, n * 128 * 4,
        n * 16 * 2, n * 8 * 2, n, n * 16, n * 4, n * 2, n * 8, n, n};
    for (size_t b : classic) add(b);
    if (mode >= 1) {
      int W = 2 * (hmb - 1) + wmb;
      int maxw = std::min(hmb, (wmb + 1) / 2 + 1);
      size_t slots = (size_t)W * maxw;
      add(slots * 256 * 2);              // luma_slab
      add(slots * 128 * 2);              // chroma_slab
      add(slots * 32 * 2);               // dc_slab
      if (mode == 2) add(slots * 40 * 4);  // meta_slab (META_ROWS=40)
    }
  }
};

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: bench_parse <prefix> <mode 0|1|2> <threads> "
                 "<iters-per-thread>\n");
    return 2;
  }
  Meta m;
  if (!load(argv[1], m)) {
    std::fprintf(stderr, "failed to load %s.{meta,blob}\n", argv[1]);
    return 2;
  }
  int mode = std::atoi(argv[2]);
  int threads = std::atoi(argv[3]);
  int iters = std::atoi(argv[4]);
  int maxw = std::min(m.hmb, (m.wmb + 1) / 2 + 1);

  auto worker = [&](int tid, int64_t* parsed) {
    Bufs b(m.wmb, m.hmb, mode);
    int64_t total = 0;
    for (int it = 0; it < iters; ++it) {
      const SliceRef& s = m.slices[(tid + it) % m.slices.size()];
      const uint8_t* rbsp = m.blob.data() + s.off;
      // fresh-frame invariant: the parser assumes zeroed per-MB state
      // (parsed/total_coeff/cbf/transform8x8 feed neighbor derivations
      // and are only written when coded); production gets this from
      // fresh zero-page staging.  Buffers 13..21 are the small per-MB
      // metadata arrays (~0.7 MB at 1080p, ~30 us to clear).
      for (int bi = 13; bi <= 21; ++bi)
        std::memset(b.ptr[bi], 0, b.store[bi].size());
      int64_t got = 0;
      if (mode == 0) {
        got = mv_parse_slice(rbsp, s.len, s.bitoff, m.wmb, m.hmb,
                             (int32_t)s.first_mb, (int32_t)s.qp, m.cabac,
                             m.t8, b.ptr.data());
      } else if (mode == 1) {
        got = mv_parse_slice_slab(rbsp, s.len, s.bitoff, m.wmb, m.hmb,
                                  (int32_t)s.first_mb, (int32_t)s.qp,
                                  m.cabac, m.t8, maxw, b.ptr.data());
      } else {
        got = mv_parse_slice_slab2(rbsp, s.len, s.bitoff, m.wmb, m.hmb,
                                   (int32_t)s.first_mb, (int32_t)s.qp,
                                   m.cabac, m.t8, maxw, 1, 0, m.cb_off,
                                   m.cr_off, b.ptr.data());
      }
      if (got <= 0) {
        std::fprintf(stderr, "parse error %lld (thread %d iter %d)\n",
                     (long long)got, tid, it);
        std::exit(1);
      }
      total += got;
    }
    *parsed = total;
  };

  // warmup (page-fault the buffers, warm the LUTs)
  {
    int64_t dummy;
    int save = iters;
    iters = 1;
    worker(0, &dummy);
    iters = save;
  }

  std::vector<std::thread> pool;
  std::vector<int64_t> parsed(threads, 0);
  struct rusage ru0, ru1;
  getrusage(RUSAGE_SELF, &ru0);
  auto t0 = std::chrono::steady_clock::now();
  for (int t = 0; t < threads; ++t)
    pool.emplace_back(worker, t, &parsed[t]);
  for (auto& th : pool) th.join();
  auto t1 = std::chrono::steady_clock::now();
  getrusage(RUSAGE_SELF, &ru1);
  double wall = std::chrono::duration<double>(t1 - t0).count();
  // user-CPU ms/frame is robust to other tenants on a shared VM; at 1T
  // it is the per-core cost the scaling model multiplies out
  double user = (ru1.ru_utime.tv_sec - ru0.ru_utime.tv_sec)
              + (ru1.ru_utime.tv_usec - ru0.ru_utime.tv_usec) * 1e-6;
  int64_t frames = (int64_t)threads * iters;
  std::printf("mode=%d threads=%d frames=%lld wall=%.3f fps=%.1f "
              "ms/frame=%.2f user_ms/frame=%.2f\n",
              mode, threads, (long long)frames, wall, frames / wall,
              wall * 1000.0 / frames, user * 1000.0 / frames);
  return 0;
}
