// Native batched feature-row gather for the sharded columnar feature store.
//
// The loader's prefetch thread assembles whole batches; with 5 encoders x
// B images x 2 arrays per image, per-row Python np.memmap slicing spends its
// time in the interpreter and holds the GIL. This reader performs one C call
// per (shard, block): n pread()s fanned over a small thread pool, straight
// into the caller's preallocated output buffer — GIL-free from ctypes.
//
// TPU-native replacement for the IO half of the reference's BlobFetcher
// (dataloader.py:395-624: a multiprocessing.Pool(8) of per-image np.load
// calls over 123k-file directories). Here rows live in consolidated shard
// files and a gather is a batch of positioned reads.
//
// C ABI (ctypes):
//   gather_rows(path, offsets, n, row_bytes, out, n_threads) -> 0 | -errno
//     offsets: n byte offsets into the file at `path`
//     out:     n * row_bytes bytes, row i written at out + i*row_bytes

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <system_error>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

// Read exactly `len` bytes at `off`, tolerating short reads.
int read_full(int fd, char* dst, int64_t len, int64_t off) {
    while (len > 0) {
        ssize_t got = pread(fd, dst, static_cast<size_t>(len), off);
        if (got < 0) {
            if (errno == EINTR) continue;
            return -errno;
        }
        if (got == 0) return -EIO;  // unexpected EOF: offset table is wrong
        dst += got;
        off += got;
        len -= got;
    }
    return 0;
}

}  // namespace

extern "C" {

int gather_rows(const char* path, const int64_t* offsets, int64_t n,
                int64_t row_bytes, char* out, int n_threads) {
    if (n <= 0) return 0;
    if (row_bytes <= 0 || !path || !offsets || !out) return -EINVAL;
    // O_CLOEXEC: the loader's prefetch thread gathers while other threads
    // may fork/exec (e.g. metric subprocesses) — don't leak shard fds
    int fd = open(path, O_RDONLY | O_CLOEXEC);
    if (fd < 0) return -errno;

    if (n_threads < 1) n_threads = 1;
    int64_t max_threads = (n + 15) / 16;  // >=16 rows per thread
    if (n_threads > max_threads) n_threads = static_cast<int>(max_threads);

    std::atomic<int> status{0};
    auto worker = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi && status.load(std::memory_order_relaxed) == 0;
             ++i) {
            int rc = read_full(fd, out + i * row_bytes, row_bytes, offsets[i]);
            if (rc != 0) {
                int expected = 0;
                status.compare_exchange_strong(expected, rc);
                return;
            }
        }
    };

    if (n_threads == 1) {
        worker(0, n);
    } else {
        std::vector<std::thread> pool;
        pool.reserve(n_threads);
        int64_t chunk = (n + n_threads - 1) / n_threads;
        int64_t spawned_hi = 0;  // rows covered by successfully spawned threads
        for (int t = 0; t < n_threads; ++t) {
            int64_t lo = t * chunk;
            int64_t hi = lo + chunk < n ? lo + chunk : n;
            if (lo >= hi) break;
            // a std::system_error here (thread exhaustion) must not cross
            // the C ABI into ctypes — that would std::terminate the whole
            // Python process; run the remaining rows inline instead
            try {
                pool.emplace_back(worker, lo, hi);
                spawned_hi = hi;
            } catch (const std::system_error&) {
                break;
            }
        }
        if (spawned_hi < n) worker(spawned_hi, n);
        for (auto& th : pool) th.join();
    }
    close(fd);
    return status.load();
}

}  // extern "C"
