// Sanitizer smoke driver: decode a BAM with N threads, print a checksum of
// every batch column so ASan/TSan runs exercise the full pipeline
// (tests/test_bamdecode.py builds and runs this when sanitizers are enabled).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "bamdecode.cpp"

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s file.bam [threads]\n", argv[0]);
    return 2;
  }
  int threads = argc > 2 ? atoi(argv[2]) : 4;
  // "-" reads a BGZF stream from stdin through the streaming (pipe) path —
  // sanitizer runs then exercise the reader thread + compressed ring too
  void* h = (argv[1][0] == '-' && argv[1][1] == 0)
                ? bd_open_fd(0, 1 << 12, threads, kFlagDropMask, kMinMapq,
                             kMinGapAsJunction, 3, 1, -1)
                : bd_open(argv[1], 1 << 12, threads);
  if (bd_error(h)[0]) {
    fprintf(stderr, "open error: %s\n", bd_error(h));
    bd_close(h);
    return 1;
  }
  int n = bd_n_refs(h);
  std::vector<int32_t> lut(n);
  for (int i = 0; i < n; i++) lut[i] = i;
  bd_set_chrom_lut(h, lut.data(), n);
  uint64_t sum = 0;
  int64_t batches = 0;
  BdBatchView v;
  int rc;
  while ((rc = bd_next_batch(h, &v)) == 1) {
    batches++;
    for (int64_t i = 0; i < v.n_blocks; i++)
      sum = sum * 1315423911u + v.blk_chrom[i] + v.blk_start[i] + v.blk_end[i];
    for (int64_t i = 0; i < v.n_gaps; i++)
      sum = sum * 1315423911u + v.gap_start[i] + v.gap_end[i];
    for (int64_t i = 0; i < v.n_frags; i++)
      sum = sum * 1315423911u + v.frag_refid[i] + v.frag_strand[i];
  }
  if (rc < 0) {
    fprintf(stderr, "decode error: %s\n", bd_error(h));
    bd_close(h);
    return 1;
  }
  int64_t st[6];
  bd_stats(h, st);
  printf("batches=%lld checksum=%llu total=%lld admitted=%lld frags=%lld\n",
         (long long)batches, (unsigned long long)sum, (long long)st[0],
         (long long)st[1], (long long)st[2]);
  bd_close(h);
  return 0;
}
