// loader — host-side batch gather + shuffle + prefetch core.
//
// TPU-native replacement for the reference's DataLoader worker processes
// (train.py:80-84: 4 Python workers decoding + transforming per sample).
// On TPU the transforms run on device, so the host's only job is feeding
// batches: this module does threaded strided memcpy gathers from a packed
// (N, itemsize) dataset into batch buffers, with an epoch shuffler
// (Fisher-Yates, SplitMix64) and a background prefetch ring so batch t+1 is
// gathered while batch t is in flight.
//
// C ABI for ctypes (build: make -C native).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// SplitMix64 — tiny deterministic shuffler PRNG.
inline uint64_t splitmix64(uint64_t& state) {
  uint64_t z = (state += 0x9E3779B97f4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

struct Prefetcher {
  const uint8_t* data = nullptr;   // (n, itemsize) packed
  uint64_t n = 0, itemsize = 0, batch = 0;
  std::vector<uint64_t> perm;
  uint64_t cursor = 0;

  // double-buffered ring
  std::vector<uint8_t> buf[2];
  uint64_t buf_count[2] = {0, 0};
  int ready_slot = -1;
  bool stop = false;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_ready, cv_taken;

  void gather(int slot) {
    uint64_t take = std::min<uint64_t>(batch, n - cursor);
    uint8_t* out = buf[slot].data();
    for (uint64_t i = 0; i < take; i++) {
      memcpy(out + i * itemsize, data + perm[cursor + i] * itemsize,
             itemsize);
    }
    buf_count[slot] = take;
    cursor += take;
  }

  void run() {
    int slot = 0;
    while (true) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_taken.wait(lk, [&] { return stop || ready_slot == -1; });
        if (stop) return;
      }
      if (cursor >= n) {
        std::lock_guard<std::mutex> lk(mu);
        buf_count[slot] = 0;  // epoch end marker
        ready_slot = slot;
        cv_ready.notify_one();
        return;
      }
      gather(slot);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready_slot = slot;
        cv_ready.notify_one();
      }
      slot ^= 1;
    }
  }
};

}  // namespace

extern "C" {

// One-shot threaded gather: out[i] = data[indices[i]] for i < batch.
// nthreads <= 0 uses the hardware concurrency.
void ld_gather(const uint8_t* data, uint64_t itemsize,
               const uint64_t* indices, uint64_t batch, uint8_t* out,
               int nthreads) {
  if (nthreads <= 0) {
    nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 1;
  }
  nthreads = std::min<int>(nthreads, static_cast<int>(batch ? batch : 1));
  if (nthreads <= 1) {
    for (uint64_t i = 0; i < batch; i++)
      memcpy(out + i * itemsize, data + indices[i] * itemsize, itemsize);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  for (int t = 0; t < nthreads; t++) {
    ts.emplace_back([=] {
      for (uint64_t i = t; i < batch; i += nthreads)
        memcpy(out + i * itemsize, data + indices[i] * itemsize, itemsize);
    });
  }
  for (auto& t : ts) t.join();
}

// Deterministic Fisher-Yates permutation of [0, n) into out.
void ld_permutation(uint64_t n, uint64_t seed, uint64_t* out) {
  for (uint64_t i = 0; i < n; i++) out[i] = i;
  uint64_t s = seed ^ 0xD1B54A32D192ED03ull;
  for (uint64_t i = n; i > 1; i--) {
    uint64_t j = splitmix64(s) % i;
    uint64_t tmp = out[i - 1];
    out[i - 1] = out[j];
    out[j] = tmp;
  }
}

// Background prefetcher over a packed (n, itemsize) dataset.
void* pf_start(const uint8_t* data, uint64_t n, uint64_t itemsize,
               uint64_t batch, uint64_t seed, int shuffle) {
  auto* p = new Prefetcher;
  p->data = data;
  p->n = n;
  p->itemsize = itemsize;
  p->batch = batch;
  p->perm.resize(n);
  if (shuffle) {
    ld_permutation(n, seed, p->perm.data());
  } else {
    for (uint64_t i = 0; i < n; i++) p->perm[i] = i;
  }
  p->buf[0].resize(batch * itemsize);
  p->buf[1].resize(batch * itemsize);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until the next batch is gathered; copies it to out and returns the
// number of records (0 = epoch finished).
uint64_t pf_next(void* handle, uint8_t* out) {
  auto* p = static_cast<Prefetcher*>(handle);
  int slot;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_ready.wait(lk, [&] { return p->ready_slot != -1; });
    slot = p->ready_slot;
  }
  uint64_t count = p->buf_count[slot];
  if (count) memcpy(out, p->buf[slot].data(), count * p->itemsize);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->ready_slot = -1;
    p->cv_taken.notify_one();
  }
  return count;
}

void pf_stop(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv_taken.notify_one();
  }
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
