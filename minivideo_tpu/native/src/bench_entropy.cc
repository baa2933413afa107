// Standalone profiling/benchmark harness for mv_parse_slice.
// Usage: bench_entropy <stream.264> <data_bit_offset> <first_mb> <qp>
//        <cabac 0|1> <t8 0|1> <wmb> <hmb> <iters>
// Reads the FIRST IDR slice payload boundaries from argv (precomputed by
// tools/probe_entropy_native.py) and parses it `iters` times.
// Build: g++ -O3 -pg -std=c++17 bench_entropy.cc entropy_obj.o

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <chrono>

extern "C" int64_t mv_parse_slice(
    const char* rbsp, int64_t nbytes, int64_t data_bit_offset,
    int32_t wmb, int32_t hmb, int32_t first_mb, int32_t slice_qp,
    int32_t cabac, int32_t t8, void** bufs);

int main(int argc, char** argv) {
  if (argc < 10) {
    fprintf(stderr, "args: file off first_mb qp cabac t8 wmb hmb iters\n");
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> data(n);
  if (fread(data.data(), 1, n, f) != (size_t)n) return 2;
  fclose(f);

  int64_t off = atoll(argv[2]);
  int first_mb = atoi(argv[3]);
  int qp = atoi(argv[4]);
  int cabac = atoi(argv[5]);
  int t8 = atoi(argv[6]);
  int wmb = atoi(argv[7]);
  int hmb = atoi(argv[8]);
  int iters = atoi(argv[9]);
  size_t nmb = (size_t)wmb * hmb;

  // buffer order matches native/__init__.py _FIELDS
  struct B { size_t bytes; };
  B sizes[22] = {
      {nmb},            // mb_kind i8
      {nmb * 4},        // qpy i32
      {nmb},            // i16_mode
      {nmb},            // chroma_mode
      {nmb * 16},       // luma4x4_modes
      {nmb * 4},        // luma8x8_modes
      {nmb},            // cbp_luma
      {nmb},            // cbp_chroma
      {nmb * 16 * 4},   // luma_dc i32
      {nmb * 256 * 4},  // luma_ac
      {nmb * 256 * 4},  // luma8x8_coeff
      {nmb * 8 * 4},    // chroma_dc
      {nmb * 128 * 4},  // chroma_ac
      {nmb * 16 * 2},   // total_coeff_luma i16
      {nmb * 8 * 2},    // total_coeff_chroma
      {nmb},            // cbf_luma_dc
      {nmb * 16},       // cbf_luma
      {nmb * 4},        // cbf_luma8x8
      {nmb * 2},        // cbf_chroma_dc
      {nmb * 8},        // cbf_chroma
      {nmb},            // transform8x8
      {nmb},            // parsed
  };
  void* bufs[22];
  for (int i = 0; i < 22; i++) bufs[i] = calloc(1, sizes[i].bytes);

  auto t0 = std::chrono::steady_clock::now();
  int64_t got = 0;
  for (int it = 0; it < iters; it++) {
    for (int i = 0; i < 22; i++) memset(bufs[i], 0, sizes[i].bytes);
    got = mv_parse_slice(data.data(), n, off, wmb, hmb, first_mb, qp,
                         cabac, t8, bufs);
  }
  auto t1 = std::chrono::steady_clock::now();
  double s = std::chrono::duration<double>(t1 - t0).count();
  printf("parsed %lld MBs x %d iters in %.3fs -> %.1f slices/s\n",
         (long long)got, iters, s, iters / s);
  return got > 0 ? 0 : 1;
}
