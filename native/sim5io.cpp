// sim5io -- native asynchronous IO runtime for sim5_tpu.
//
// Long spectral-table sweeps and image-stack renders interleave device
// compute with host persistence; this small C++ runtime provides a
// background writer thread pool so checkpoint writes (CRC-stamped,
// atomic rename) overlap with the next batch of raytracing instead of
// blocking the dispatch loop.  Exposed to Python via a plain C ABI
// (ctypes; see sim5_tpu/native/__init__.py).
//
// This is new code; the reference library has no IO runtime (its FITS
// writer blocks in Python, python/sim5fitstable.py:143-162).

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

// -- CRC32 (IEEE 802.3 polynomial, table-driven) ------------------------

struct Crc32Table {
    uint32_t t[256];
    Crc32Table() {
        for (uint32_t i = 0; i < 256; i++) {
            uint32_t c = i;
            for (int k = 0; k < 8; k++)
                c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
            t[i] = c;
        }
    }
};

uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
    static const Crc32Table table;
    crc = ~crc;
    for (size_t i = 0; i < len; i++)
        crc = table.t[(crc ^ buf[i]) & 0xFF] ^ (crc >> 8);
    return ~crc;
}

// -- async writer -------------------------------------------------------

struct Job {
    std::string path;
    std::vector<uint8_t> data;
};

struct Writer {
    std::deque<Job> queue;
    std::mutex mu;
    std::condition_variable cv;       // queue became non-empty
    std::condition_variable cv_done;  // queue drained
    std::vector<std::thread> threads;
    std::atomic<int> in_flight{0};
    std::atomic<uint64_t> bytes_written{0};
    std::atomic<uint64_t> errors{0};
    std::atomic<uint64_t> tmp_seq{0};
    bool stop = false;

    explicit Writer(int n_threads) {
        for (int i = 0; i < n_threads; i++)
            threads.emplace_back([this] { run(); });
    }

    ~Writer() {
        {
            std::lock_guard<std::mutex> lock(mu);
            stop = true;
        }
        cv.notify_all();
        for (auto& t : threads) t.join();
    }

    void submit(const char* path, const void* data, size_t n) {
        Job job;
        job.path = path;
        job.data.assign(static_cast<const uint8_t*>(data),
                        static_cast<const uint8_t*>(data) + n);
        {
            std::lock_guard<std::mutex> lock(mu);
            queue.push_back(std::move(job));
        }
        cv.notify_one();
    }

    int pending() {
        std::lock_guard<std::mutex> lock(mu);
        return static_cast<int>(queue.size()) + in_flight.load();
    }

    void flush() {
        std::unique_lock<std::mutex> lock(mu);
        cv_done.wait(lock, [this] {
            return queue.empty() && in_flight.load() == 0;
        });
    }

    void run() {
        for (;;) {
            Job job;
            {
                std::unique_lock<std::mutex> lock(mu);
                cv.wait(lock, [this] { return stop || !queue.empty(); });
                if (stop && queue.empty()) return;
                job = std::move(queue.front());
                queue.pop_front();
                in_flight.fetch_add(1);
            }
            write_atomic(job);
            in_flight.fetch_sub(1);
            cv_done.notify_all();
        }
    }

    void write_atomic(const Job& job) {
        // write to <path>.s5tmp<seq> then rename -- a crash never corrupts
        // the previous checkpoint, and the per-job unique suffix keeps two
        // in-flight flushes of the SAME path from interleaving bytes in a
        // shared tmp file before their renames (rename itself is atomic,
        // so the path always holds one complete, CRC-valid snapshot)
        std::string tmp = job.path + ".s5tmp"
            + std::to_string(tmp_seq.fetch_add(1));
        FILE* f = std::fopen(tmp.c_str(), "wb");
        if (!f) { errors.fetch_add(1); return; }
        size_t n = std::fwrite(job.data.data(), 1, job.data.size(), f);
        std::fclose(f);
        if (n != job.data.size() ||
            std::rename(tmp.c_str(), job.path.c_str()) != 0) {
            errors.fetch_add(1);
            std::remove(tmp.c_str());
            return;
        }
        bytes_written.fetch_add(n);
    }
};

}  // namespace

extern "C" {

void* s5_writer_create(int n_threads) {
    if (n_threads < 1) n_threads = 1;
    return new Writer(n_threads);
}

void s5_writer_destroy(void* w) {
    delete static_cast<Writer*>(w);
}

void s5_writer_submit(void* w, const char* path, const void* data,
                      uint64_t nbytes) {
    static_cast<Writer*>(w)->submit(path, data, nbytes);
}

int s5_writer_pending(void* w) {
    return static_cast<Writer*>(w)->pending();
}

void s5_writer_flush(void* w) {
    static_cast<Writer*>(w)->flush();
}

uint64_t s5_writer_bytes(void* w) {
    return static_cast<Writer*>(w)->bytes_written.load();
}

uint64_t s5_writer_errors(void* w) {
    return static_cast<Writer*>(w)->errors.load();
}

uint32_t s5_crc32(const void* data, uint64_t nbytes) {
    return crc32_update(0, static_cast<const uint8_t*>(data), nbytes);
}

}  // extern "C"
