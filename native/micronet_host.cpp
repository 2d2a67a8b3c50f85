// micronet_tpu native host runtime: data loading + batch assembly.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the
// host-side hot loops around it (the role torch's C++ DataLoader plays
// for the reference, which itself ships no native code — SURVEY.md §2.9):
//
//  - mn_load_cifar_bin: parse the CIFAR-10 binary batches
//    (cifar-10-batches-bin: 10000 records of [label][3072 CHW bytes]) into
//    NHWC uint8, multi-threaded per file.
//  - mn_gather_u8: multi-threaded fancy-gather of shuffled sample indices
//    into a contiguous batch buffer (the per-step host work of an input
//    pipeline; keeps the feed thread off the GIL).
//
// Exposed with plain C linkage for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Gather rows: dst[i] = src[idx[i]] for i in [0, n_idx), row = item_bytes.
// Returns 0 on success.
int mn_gather_u8(const uint8_t* src, int64_t n_src, const int64_t* idx,
                 int64_t n_idx, int64_t item_bytes, uint8_t* dst,
                 int n_threads) {
  if (!src || !idx || !dst || item_bytes <= 0) return 1;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  std::atomic<int> bad{0};
  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const int64_t j = idx[i];
      if (j < 0 || j >= n_src) {
        bad.store(1, std::memory_order_relaxed);
        return;
      }
      std::memcpy(dst + i * item_bytes, src + j * item_bytes,
                  static_cast<size_t>(item_bytes));
    }
  };
  if (n_idx < 1024 || n_threads == 1) {
    worker(0, n_idx);
  } else {
    std::vector<std::thread> ts;
    const int64_t chunk = (n_idx + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      const int64_t b = t * chunk;
      const int64_t e = std::min(n_idx, b + chunk);
      if (b >= e) break;
      ts.emplace_back(worker, b, e);
    }
    for (auto& t : ts) t.join();
  }
  return bad.load() ? 2 : 0;
}

// Parse one CIFAR binary file (n records of [1 label][3072 CHW u8]) into
// NHWC images + labels at the given offsets. Returns records parsed, or
// -1 on IO error.
static int64_t parse_cifar_file(const char* path, uint8_t* images,
                                uint8_t* labels, int64_t offset,
                                int64_t max_records) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  constexpr int64_t kRec = 1 + 3 * 32 * 32;
  std::vector<uint8_t> buf(kRec);
  int64_t n = 0;
  while (n < max_records &&
         std::fread(buf.data(), 1, kRec, f) == static_cast<size_t>(kRec)) {
    labels[offset + n] = buf[0];
    uint8_t* out = images + (offset + n) * 3 * 32 * 32;
    // CHW -> HWC
    const uint8_t* chw = buf.data() + 1;
    for (int h = 0; h < 32; ++h)
      for (int w = 0; w < 32; ++w)
        for (int c = 0; c < 3; ++c)
          out[(h * 32 + w) * 3 + c] = chw[c * 1024 + h * 32 + w];
    ++n;
  }
  std::fclose(f);
  return n;
}

// Load the five train batches + test batch from a cifar-10-batches-bin
// dir. images buffers must hold n*3072 bytes, labels n bytes
// (n = 50000 train, 10000 test). Returns 0 on success.
int mn_load_cifar_bin(const char* dir, uint8_t* train_images,
                      uint8_t* train_labels, uint8_t* test_images,
                      uint8_t* test_labels) {
  std::vector<std::thread> ts;
  std::atomic<int> err{0};
  for (int i = 0; i < 5; ++i) {
    ts.emplace_back([&, i]() {
      const std::string p =
          std::string(dir) + "/data_batch_" + std::to_string(i + 1) + ".bin";
      if (parse_cifar_file(p.c_str(), train_images, train_labels,
                           int64_t(i) * 10000, 10000) != 10000)
        err.store(1);
    });
  }
  ts.emplace_back([&]() {
    const std::string p = std::string(dir) + "/test_batch.bin";
    if (parse_cifar_file(p.c_str(), test_images, test_labels, 0, 10000) !=
        10000)
      err.store(1);
  });
  for (auto& t : ts) t.join();
  return err.load();
}

}  // extern "C"
