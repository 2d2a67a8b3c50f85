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

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>


// Entropy (KL) calibration threshold search — the engine-build hot loop
// (quant/calibrate.py::kl_threshold, TRT IInt8EntropyCalibrator2 algo).
// O(bins^2) per tensor in tight C++ instead of a numpy Python loop;
// parallel across tensors. MUST stay numerically identical to the Python
// reference (same eps smoothing, same strict < tie-break): the test
// suite asserts agreement.
static double kl_one(const double* counts, int64_t bins, double absmax,
                     int nq) {
  double total = 0.0;
  for (int64_t i = 0; i < bins; ++i) total += counts[i];
  if (absmax <= 0.0 || total <= 0.0) return absmax;
  if (bins <= nq) return absmax;
  const double width = absmax / static_cast<double>(bins);
  std::vector<double> suffix(bins + 1, 0.0);
  for (int64_t i = bins - 1; i >= 0; --i) suffix[i] = suffix[i + 1] + counts[i];
  std::vector<double> p(bins), q(bins), gm(nq), gs(nq);
  double best_kl = 1e300;
  int64_t best_i = bins;
  const double eps = 1e-4;
  for (int64_t i = nq; i <= bins; ++i) {
    // P: kept bins with the tail clipped into the last one
    double p_sum = 0.0;
    for (int64_t j = 0; j < i; ++j) { p[j] = counts[j]; }
    p[i - 1] += suffix[i];
    for (int64_t j = 0; j < i; ++j) p_sum += p[j];
    // Q: quantize i bins into nq groups, expand over nonzero support
    std::fill(gm.begin(), gm.end(), 0.0);
    std::fill(gs.begin(), gs.end(), 0.0);
    for (int64_t j = 0; j < i; ++j) {
      int g = static_cast<int>(j * nq / i);
      gm[g] += counts[j];
      if (counts[j] > 0) gs[g] += 1.0;
    }
    double q_sum = 0.0;
    for (int64_t j = 0; j < i; ++j) {
      int g = static_cast<int>(j * nq / i);
      q[j] = (gs[g] > 0 && counts[j] > 0) ? gm[g] / gs[g] : 0.0;
      q_sum += q[j];
    }
    if (q_sum <= 0.0) continue;
    // normalize + eps-smooth both (mirror _smooth_distribution)
    int64_t pz = 0, qz = 0;
    for (int64_t j = 0; j < i; ++j) {
      p[j] /= p_sum;
      q[j] /= q_sum;
      if (p[j] == 0.0) ++pz;
      if (q[j] == 0.0) ++qz;
    }
    const int64_t pn = i - pz, qn = i - qz;
    if (pn == 0 || qn == 0) continue;
    const double peps1 = eps * static_cast<double>(pz) / pn;
    const double qeps1 = eps * static_cast<double>(qz) / qn;
    bool bad = false;
    if (pz > 0) {
      for (int64_t j = 0; j < i && !bad; ++j)
        if (p[j] != 0.0 && p[j] <= peps1) bad = true;
    }
    if (qz > 0) {
      for (int64_t j = 0; j < i && !bad; ++j)
        if (q[j] != 0.0 && q[j] <= qeps1) bad = true;
    }
    if (bad) continue;
    double kl = 0.0;
    for (int64_t j = 0; j < i; ++j) {
      const double pj = (p[j] == 0.0) ? eps : (pz ? p[j] - peps1 : p[j]);
      const double qj = (q[j] == 0.0) ? eps : (qz ? q[j] - qeps1 : q[j]);
      kl += pj * std::log(pj / qj);
    }
    if (kl < best_kl) { best_kl = kl; best_i = i; }
  }
  double thr = (static_cast<double>(best_i) + 0.5) * width;
  return thr < absmax ? thr : absmax;
}

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


// Batch KL threshold search: counts is n_tensors x bins row-major.
int mn_kl_thresholds(const double* counts, const double* absmax,
                     int64_t n_tensors, int64_t bins, int num_quantized_bins,
                     double* out, int n_threads) {
  if (n_tensors <= 0 || bins <= 0 || num_quantized_bins <= 0) return 1;
  int workers = n_threads > 0
                    ? n_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  if (workers < 1) workers = 1;
  if (workers > n_tensors) workers = static_cast<int>(n_tensors);
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      int64_t t = next.fetch_add(1);
      if (t >= n_tensors) break;
      out[t] = kl_one(counts + t * bins, bins, absmax[t], num_quantized_bins);
    }
  };
  std::vector<std::thread> pool;
  for (int w = 1; w < workers; ++w) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
