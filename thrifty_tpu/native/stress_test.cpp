// Sanitizer stress harness for libthrifty_io's concurrent surfaces.
//
// Built and run by `make -C thrifty_tpu/native stress` (TSan) and
// `make -C thrifty_tpu/native stress-asan` (ASan+UBSan), and by
// tests/test_native.py when the toolchain is present.  The reference
// ships no race detection at all (SURVEY.md section 5 -- its known
// circbuf race is a documented FIXME); this harness pins our ring /
// batch-decode / MT-scan threading under the real sanitizers:
//
//   1. ring producer/consumer: one writer (alternating plain write and
//      reserve/commit spans -- the StreamPump readinto pattern), one
//      reader (alternating read and read_unfold with a multi-thread
//      row copy), data integrity checked against a rolling byte
//      pattern; close() mid-stream from a third thread.
//   2. concurrent b64 batch decodes from several host threads, each
//      itself fanning out workers (exercises the once-only table init
//      and the per-batch thread pool).
//   3. concurrent multithreaded .card scans over one shared text.
//
// Exit code 0 = all checks passed (sanitizer reports fail the build's
// exit code by themselves with halt_on_error).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int ttpu_b64_decode(const char*, int64_t, uint8_t*, int64_t);
int ttpu_b64_encode(const uint8_t*, int64_t, char*, int64_t);
int64_t ttpu_b64_decode_batch(const char*, const int64_t*, const int64_t*,
                              int64_t, uint8_t*, int64_t, uint8_t*, int);
int64_t ttpu_count_newlines(const char*, int64_t);
int64_t ttpu_card_scan_mt(const char*, int64_t, double*, int64_t*,
                          int64_t*, int64_t*, int64_t, int);
void ttpu_raw_to_iq(const uint8_t*, float*, int64_t, int);
void ttpu_unfold(const uint8_t*, int64_t, uint8_t*, int64_t, int64_t,
                 int64_t, uint8_t);
void ttpu_copy_rows(const uint8_t*, uint8_t*, int64_t, int64_t, int64_t,
                    int);
void* ttpu_ring_new(int64_t);
void ttpu_ring_free(void*);
void ttpu_ring_close(void*);
int64_t ttpu_ring_write(void*, const uint8_t*, int64_t);
int64_t ttpu_ring_write_reserve(void*, int64_t, int64_t*);
void ttpu_ring_write_commit(void*, int64_t);
uint8_t* ttpu_ring_base(void*);
int64_t ttpu_ring_read(void*, uint8_t*, int64_t);
int64_t ttpu_ring_read_unfold(void*, uint8_t*, int64_t, int64_t,
                              int64_t, int64_t*, int);
uint64_t ttpu_ring_overflows(void*);
void ttpu_ring_histogram(void*, uint64_t*);
}

static std::atomic<int> failures(0);

#define CHECK(cond, msg)                                                   \
    do {                                                                   \
        if (!(cond)) {                                                     \
            std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__,   \
                         msg);                                             \
            failures.fetch_add(1);                                         \
        }                                                                  \
    } while (0)

// --- 1. ring producer/consumer with integrity pattern ----------------------

static void ring_stress() {
    const int64_t kTotal = 8 << 20;  // 8 MB through a 256 KB ring
    const int64_t kCap = 256 << 10;
    void* ring = ttpu_ring_new(kCap);

    std::thread producer([&] {
        uint8_t chunk[4096];
        int64_t sent = 0;
        unsigned seed = 1;
        bool reserve_mode = false;
        while (sent < kTotal) {
            int64_t n = 1 + (seed = seed * 1103515245u + 12345u) % 4096;
            if (sent + n > kTotal) n = kTotal - sent;
            if (reserve_mode) {
                int64_t off;
                int64_t got = ttpu_ring_write_reserve(ring, n, &off);
                if (got <= 0) break;  // closed
                uint8_t* span = ttpu_ring_base(ring) + off;
                for (int64_t i = 0; i < got; ++i)
                    span[i] = (uint8_t)((sent + i) & 0xFF);
                ttpu_ring_write_commit(ring, got);
                sent += got;
            } else {
                for (int64_t i = 0; i < n; ++i)
                    chunk[i] = (uint8_t)((sent + i) & 0xFF);
                int64_t got = ttpu_ring_write(ring, chunk, n);
                sent += got;
                if (got < n) break;  // closed
            }
            reserve_mode = !reserve_mode;
        }
        ttpu_ring_close(ring);
    });

    std::thread stats([&] {
        uint64_t h[8];
        for (int i = 0; i < 200; ++i) {
            ttpu_ring_histogram(ring, h);
            (void)ttpu_ring_overflows(ring);
        }
    });

    // Consumer: alternate plain reads and unfold reads; verify the
    // rolling pattern across both (unfold rows repeat history bytes).
    const int64_t kBlock = 6144, kHist = 2048;
    const int64_t kNew = kBlock - kHist;
    std::vector<uint8_t> plain(3 * kNew);
    std::vector<uint8_t> rows(4 * kBlock);
    int64_t pos = 0;  // absolute stream offset consumed so far
    bool unfold_mode = false;
    bool corrupt = false;  // NEVER return early: the producer blocks on
                           // a full ring and unjoined threads terminate
    while (!corrupt) {
        if (unfold_mode) {
            int64_t got_bytes = 0;
            int64_t blocks = ttpu_ring_read_unfold(
                ring, rows.data(), kBlock, kHist, 4, &got_bytes, 3);
            if (blocks == 0) break;
            for (int64_t b = 0; b < blocks && !corrupt; ++b) {
                // Row b spans stream [pos + b*new - hist, pos + b*new
                // + new).  Row 0's history precedes this batch's ring
                // span (the Python pump overwrites it with its carried
                // tail), so start checking at the new bytes there.
                for (int64_t i = (b == 0 ? kHist : 0); i < kBlock; ++i) {
                    int64_t abs = pos + b * kNew - kHist + i;
                    uint8_t want = (uint8_t)(abs & 0xFF);
                    if (rows[b * kBlock + i] != want) {
                        CHECK(false, "ring unfold pattern mismatch");
                        corrupt = true;
                        break;
                    }
                }
            }
            pos += blocks * kNew;
        } else {
            int64_t got = ttpu_ring_read(ring, plain.data(),
                                         (int64_t)plain.size());
            for (int64_t i = 0; i < got; ++i) {
                uint8_t want = (uint8_t)((pos + i) & 0xFF);
                if (plain[i] != want) {
                    CHECK(false, "ring read pattern mismatch");
                    corrupt = true;
                    break;
                }
            }
            pos += got;
            if (got < (int64_t)plain.size()) break;  // closed + drained
        }
        unfold_mode = !unfold_mode;
    }
    if (!corrupt)
        CHECK(pos >= kTotal - kBlock, "consumer drained less than produced");

    // Unblock + reap the helper threads on every path (incl. failure).
    ttpu_ring_close(ring);
    producer.join();
    stats.join();
    ttpu_ring_free(ring);
}

// --- 2. concurrent b64 batch decodes ---------------------------------------

static void b64_stress() {
    const int kRows = 64, kBytes = 3000;
    std::vector<uint8_t> raw(kRows * kBytes);
    for (size_t i = 0; i < raw.size(); ++i) raw[i] = (uint8_t)(i * 7);
    std::string text;
    std::vector<int64_t> offsets(kRows), lens(kRows);
    std::vector<char> enc(4 * kBytes / 3 + 8);
    for (int r = 0; r < kRows; ++r) {
        int n = ttpu_b64_encode(raw.data() + r * kBytes, kBytes,
                                enc.data(), (int64_t)enc.size());
        offsets[r] = (int64_t)text.size();
        lens[r] = n;
        text.append(enc.data(), n);
        text.push_back('\n');
    }
    std::vector<std::thread> threads;
    for (int t = 0; t < 4; ++t) {
        threads.emplace_back([&, t] {
            std::vector<uint8_t> out(kRows * kBytes);
            std::vector<uint8_t> status(kRows);
            for (int iter = 0; iter < 8; ++iter) {
                int64_t bad = ttpu_b64_decode_batch(
                    text.c_str(), offsets.data(), lens.data(), kRows,
                    out.data(), kBytes, status.data(), 2 + t % 2);
                CHECK(bad == 0, "b64 batch reported bad rows");
                CHECK(std::memcmp(out.data(), raw.data(), raw.size())
                      == 0, "b64 batch roundtrip mismatch");
            }
        });
    }
    for (auto& th : threads) th.join();
}

// --- 3. concurrent MT card scans -------------------------------------------

static void card_scan_stress() {
    std::string text;
    const int kRows = 20000;
    for (int r = 0; r < kRows; ++r) {
        char line[64];
        std::snprintf(line, sizeof line, "%d.25 %d QUJDRA==\n", r, r);
        text += line;
        if (r % 997 == 0) text += "# comment line\njunk !!\n";
    }
    std::vector<std::thread> threads;
    for (int t = 0; t < 3; ++t) {
        threads.emplace_back([&] {
            int64_t cap = ttpu_count_newlines(text.c_str(),
                                              (int64_t)text.size()) + 1;
            std::vector<double> ts(cap);
            std::vector<int64_t> idx(cap), offs(cap), lens(cap);
            for (int iter = 0; iter < 4; ++iter) {
                int64_t n = ttpu_card_scan_mt(
                    text.c_str(), (int64_t)text.size(), ts.data(),
                    idx.data(), offs.data(), lens.data(), cap, 3);
                CHECK(n == kRows, "card scan row count");
                CHECK(idx[0] == 0 && idx[n - 1] == kRows - 1,
                      "card scan indices");
            }
        });
    }
    for (auto& th : threads) th.join();
}

// --- 4. concurrent raw->IQ conversions (first-use LUT init race) -----------

static void raw_to_iq_stress() {
    const int64_t kBytes = 1 << 16;
    std::vector<uint8_t> raw(kBytes);
    for (int64_t i = 0; i < kBytes; ++i) raw[i] = (uint8_t)(i * 13);
    std::vector<std::thread> threads;
    for (int t = 0; t < 4; ++t) {
        threads.emplace_back([&, t] {
            std::vector<float> out(kBytes);
            ttpu_raw_to_iq(raw.data(), out.data(), kBytes, 1 + t % 3);
            for (int64_t i = 0; i < kBytes; ++i) {
                float want = ((float)raw[i] - 127.4f) * (1.0f / 128.0f);
                if (out[i] != want) {
                    CHECK(false, "raw_to_iq value mismatch (LUT race?)");
                    break;
                }
            }
        });
    }
    for (auto& th : threads) th.join();
}

int main() {
    // raw_to_iq first: the LUT-init race only exists before ANY thread
    // has completed the first conversion in this process.
    std::thread d(raw_to_iq_stress);
    std::thread a(ring_stress);
    std::thread b(b64_stress);
    std::thread c(card_scan_stress);
    d.join();
    a.join();
    b.join();
    c.join();
    if (failures.load()) {
        std::fprintf(stderr, "%d check(s) failed\n", failures.load());
        return 1;
    }
    std::puts("native stress: all checks passed");
    return 0;
}
