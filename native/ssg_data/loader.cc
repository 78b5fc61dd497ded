// Threaded batch assembly + background-prefetching loader.
//
// Replaces the reference's torch DataLoader worker processes (SURVEY.md §2
// #12 "Data plumbing"): a thread pool decodes/resizes images straight into
// the caller's batch buffer, and ssg_loader prefetches whole batches into a
// bounded queue so host decode overlaps TPU compute.
#include "ssg_data.h"

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Decode items [0, n) of `paths` into `out`, striding work over `threads`
// workers. Records failed indices (zero-filled rows) into `failed`.
int load_batch_into(const std::vector<std::string>& paths, int n, int h, int w,
                    uint8_t* out, int threads, std::vector<int>* failed) {
  const size_t row = static_cast<size_t>(h) * w * 3;
  std::atomic<int> next(0);
  std::mutex fail_mu;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = ssg_decode_resize(paths[i].c_str(), h, w, out + row * i);
      if (rc != SSG_OK) {
        std::memset(out + row * i, 0, row);
        std::lock_guard<std::mutex> g(fail_mu);
        if (failed) failed->push_back(i);
      }
    }
  };
  int nt = threads > 0 ? threads : hw_threads();
  if (nt > n) nt = n;
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed ? static_cast<int>(failed->size()) : 0;
}

}  // namespace

extern "C" int ssg_load_batch(const char** paths, int n, int out_h, int out_w,
                              uint8_t* out, int num_threads, int* err_idx) {
  if (!paths || !out || n <= 0 || out_h <= 0 || out_w <= 0) return -SSG_ERR_ARG;
  std::vector<std::string> owned(paths, paths + n);
  std::vector<int> failed;
  int nfail = load_batch_into(owned, n, out_h, out_w, out, num_threads, &failed);
  if (err_idx) {
    int k = 0;
    for (; k < nfail && k < n; ++k) err_idx[k] = failed[k];
    if (k < n) err_idx[k] = -1;
  }
  return nfail;
}

// ---- prefetching loader ----------------------------------------------------

struct Batch {
  std::vector<uint8_t> data;
  int valid = 0;
};

struct ssg_loader {
  std::vector<std::string> paths;
  int batch_size, h, w, threads, prefetch;
  size_t row_bytes;

  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::deque<Batch> queue;
  int next_batch = 0;   // producer cursor (batch index)
  int total_batches = 0;
  int consumed = 0;     // consumer cursor
  bool stop = false;
  int epoch = 0;        // bumped by reset; producer re-syncs
  std::thread producer;

  void produce() {
    std::unique_lock<std::mutex> lk(mu);
    int my_epoch = epoch;
    for (;;) {
      if (stop) return;
      if (my_epoch != epoch) {  // reset happened
        my_epoch = epoch;
      }
      if (next_batch >= total_batches) {
        // Epoch fully produced; wait for reset or stop.
        cv_put.wait(lk, [&] { return stop || epoch != my_epoch; });
        continue;
      }
      if (static_cast<int>(queue.size()) >= prefetch) {
        cv_put.wait(lk, [&] {
          return stop || epoch != my_epoch ||
                 static_cast<int>(queue.size()) < prefetch;
        });
        continue;
      }
      int b = next_batch++;
      lk.unlock();
      Batch out;
      out.data.assign(row_bytes * batch_size, 0);
      int start = b * batch_size;
      int n = static_cast<int>(paths.size()) - start;
      if (n > batch_size) n = batch_size;
      std::vector<std::string> slice(paths.begin() + start, paths.begin() + start + n);
      load_batch_into(slice, n, h, w, out.data.data(), threads, nullptr);
      out.valid = n;
      lk.lock();
      if (my_epoch == epoch) {  // drop stale batches after reset
        queue.push_back(std::move(out));
        cv_get.notify_one();
      }
    }
  }
};

extern "C" ssg_loader* ssg_loader_create(const char** paths, int n, int batch_size,
                                         int out_h, int out_w, int num_threads,
                                         int prefetch) {
  if (!paths || n <= 0 || batch_size <= 0 || out_h <= 0 || out_w <= 0) return nullptr;
  auto* L = new ssg_loader();
  L->paths.assign(paths, paths + n);
  L->batch_size = batch_size;
  L->h = out_h;
  L->w = out_w;
  L->threads = num_threads;
  L->prefetch = prefetch > 0 ? prefetch : 2;
  L->row_bytes = static_cast<size_t>(out_h) * out_w * 3;
  L->total_batches = (n + batch_size - 1) / batch_size;
  L->producer = std::thread([L] { L->produce(); });
  return L;
}

extern "C" int ssg_loader_next(ssg_loader* L, uint8_t* out, int* valid) {
  if (!L || !out) return 0;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->consumed >= L->total_batches) return 0;
  L->cv_get.wait(lk, [&] { return L->stop || !L->queue.empty(); });
  if (L->stop || L->queue.empty()) return 0;
  Batch b = std::move(L->queue.front());
  L->queue.pop_front();
  L->consumed++;
  L->cv_put.notify_one();
  lk.unlock();
  std::memcpy(out, b.data.data(), b.data.size());
  if (valid) *valid = b.valid;
  return 1;
}

extern "C" void ssg_loader_reset(ssg_loader* L) {
  if (!L) return;
  std::lock_guard<std::mutex> g(L->mu);
  L->queue.clear();
  L->next_batch = 0;
  L->consumed = 0;
  L->epoch++;
  L->cv_put.notify_all();
}

extern "C" void ssg_loader_destroy(ssg_loader* L) {
  if (!L) return;
  {
    std::lock_guard<std::mutex> g(L->mu);
    L->stop = true;
    L->cv_put.notify_all();
    L->cv_get.notify_all();
  }
  if (L->producer.joinable()) L->producer.join();
  delete L;
}
