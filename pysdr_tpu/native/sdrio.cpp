// Native host runtime for pysdr_tpu: lock-free SPSC ring buffer,
// background .dat file streamer, and sample-format converters.
//
// This is the TPU-native equivalent of the reference's native base:
// SoapySDR's C++ streaming core feeding Python-side ring buffers
// (reference receiver.py:538-631 read_chunk over the C++ readStream;
// ring buffers from the external sig_proc lib; CS8/int16 conversion at
// receiver.py:614-617). Here the hot host path — file/device bytes ->
// float32 IQ pairs in a prefetch ring — runs in C++ with a reader thread,
// so the Python executive only does a single memcpy per block before
// jax.device_put.
//
// C ABI for ctypes (no pybind11 in this image). Complex samples are
// float32 interleaved re,im ("packed pairs", matching ops/cplx.py).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>

// ---------------- SPSC lock-free ring buffer ----------------
// One producer, one consumer; capacity in complex samples.

struct Ring {
    float* buf;                 // 2*capacity floats
    size_t capacity;            // samples
    std::atomic<uint64_t> head; // written samples (producer)
    std::atomic<uint64_t> tail; // read samples (consumer)
    std::atomic<uint64_t> overflow_drops;

    explicit Ring(size_t cap)
        : capacity(cap), head(0), tail(0), overflow_drops(0) {
        buf = static_cast<float*>(std::malloc(sizeof(float) * 2 * cap));
    }
    ~Ring() { std::free(buf); }

    size_t count() const {
        return static_cast<size_t>(head.load(std::memory_order_acquire) -
                                   tail.load(std::memory_order_acquire));
    }
    size_t free_space() const { return capacity - count(); }

    // push up to n samples; returns samples accepted (drops excess —
    // the producer side never blocks, like the reference's non-blocking
    // readStream pump, utils.py:98-120)
    size_t push(const float* data, size_t n) {
        size_t space = free_space();
        if (n > space) {
            overflow_drops.fetch_add(n - space, std::memory_order_relaxed);
            n = space;
        }
        uint64_t h = head.load(std::memory_order_relaxed);
        size_t pos = static_cast<size_t>(h % capacity);
        size_t first = std::min(n, capacity - pos);
        std::memcpy(buf + 2 * pos, data, sizeof(float) * 2 * first);
        if (n > first)
            std::memcpy(buf, data + 2 * first, sizeof(float) * 2 * (n - first));
        head.store(h + n, std::memory_order_release);
        return n;
    }

    // pull up to n samples; returns samples delivered
    size_t pull(float* out, size_t n) {
        size_t avail = count();
        if (n > avail) n = avail;
        uint64_t t = tail.load(std::memory_order_relaxed);
        size_t pos = static_cast<size_t>(t % capacity);
        size_t first = std::min(n, capacity - pos);
        std::memcpy(out, buf + 2 * pos, sizeof(float) * 2 * first);
        if (n > first)
            std::memcpy(out + 2 * first, buf, sizeof(float) * 2 * (n - first));
        tail.store(t + n, std::memory_order_release);
        return n;
    }
};

// ---------------- .dat file streamer ----------------
// Parses the pysdr-tpu v1 container (io/datfile.py): magic "PSDRTPU1",
// u32 JSON header length, JSON header with fs/fc/nchan/dtype, then raw
// samples. A reader thread keeps the ring full (double buffering).

struct Streamer {
    FILE* f = nullptr;
    Ring* ring = nullptr;
    std::thread reader;
    std::atomic<bool> stop{false};
    std::atomic<bool> eof{false};
    bool loop = false;
    long data_start = 0;
    double fs = 0.0, fc = 0.0;
    int nchan = 1;
    int dtype = 0;  // 0=complex64, 1=cs16, 2=cs8, 3=cu8
    size_t chunk = 1 << 16;

    bool parse_header() {
        char magic[8];
        if (std::fread(magic, 1, 8, f) != 8) return false;
        if (std::memcmp(magic, "PSDRTPU1", 8) != 0) return false;
        uint32_t hlen = 0;
        if (std::fread(&hlen, 4, 1, f) != 1 || hlen > 65536) return false;
        std::string hdr(hlen, '\0');
        if (std::fread(&hdr[0], 1, hlen, f) != hlen) return false;
        auto num = [&](const char* key, double dflt) {
            size_t p = hdr.find(key);
            if (p == std::string::npos) return dflt;
            p = hdr.find(':', p);
            if (p == std::string::npos) return dflt;
            return std::atof(hdr.c_str() + p + 1);
        };
        fs = num("\"fs\"", 0.0);
        fc = num("\"fc\"", 0.0);
        nchan = static_cast<int>(num("\"nchan\"", 1.0));
        if (hdr.find("\"complex64\"") != std::string::npos) dtype = 0;
        else if (hdr.find("\"int16\"") != std::string::npos) dtype = 1;
        else if (hdr.find("\"int8\"") != std::string::npos) dtype = 2;
        else if (hdr.find("\"uint8\"") != std::string::npos) dtype = 3;
        data_start = std::ftell(f);
        return true;
    }

    size_t sample_bytes() const {
        switch (dtype) {
            case 0: return 8;  // complex64
            case 1: return 4;  // interleaved int16 pairs
            default: return 2; // interleaved 8-bit pairs
        }
    }

    void reader_loop() {
        std::string raw(chunk * sample_bytes(), '\0');
        std::string conv(chunk * 2 * sizeof(float), '\0');
        while (!stop.load(std::memory_order_relaxed)) {
            size_t want = std::min(chunk, ring->free_space());
            if (want < chunk / 4) {  // ring nearly full: back off
                std::this_thread::sleep_for(std::chrono::microseconds(200));
                continue;
            }
            size_t got = std::fread(&raw[0], sample_bytes(), want, f);
            if (got == 0) {
                if (loop) { std::fseek(f, data_start, SEEK_SET); continue; }
                eof.store(true);
                return;
            }
            const float* out;
            if (dtype == 0) {
                out = reinterpret_cast<const float*>(raw.data());
            } else {
                float* o = reinterpret_cast<float*>(&conv[0]);
                if (dtype == 1) {
                    const int16_t* in =
                        reinterpret_cast<const int16_t*>(raw.data());
                    for (size_t i = 0; i < 2 * got; ++i)
                        o[i] = in[i] * (1.0f / 32768.0f);
                } else if (dtype == 2) {
                    const int8_t* in =
                        reinterpret_cast<const int8_t*>(raw.data());
                    for (size_t i = 0; i < 2 * got; ++i)
                        o[i] = in[i] * (1.0f / 128.0f);
                } else {
                    const uint8_t* in =
                        reinterpret_cast<const uint8_t*>(raw.data());
                    for (size_t i = 0; i < 2 * got; ++i)
                        o[i] = (in[i] - 127.5f) * (1.0f / 127.5f);
                }
                out = o;
            }
            size_t pushed = 0;
            while (pushed < got && !stop.load(std::memory_order_relaxed)) {
                pushed += ring->push(out + 2 * pushed, got - pushed);
                if (pushed < got)
                    std::this_thread::sleep_for(
                        std::chrono::microseconds(200));
            }
        }
    }
};

extern "C" {

// ---- ring buffer ----
void* psdr_rb_create(size_t capacity) { return new Ring(capacity); }
void psdr_rb_destroy(void* r) { delete static_cast<Ring*>(r); }
size_t psdr_rb_push(void* r, const float* d, size_t n) {
    return static_cast<Ring*>(r)->push(d, n);
}
size_t psdr_rb_pull(void* r, float* o, size_t n) {
    return static_cast<Ring*>(r)->pull(o, n);
}
size_t psdr_rb_count(void* r) { return static_cast<Ring*>(r)->count(); }
size_t psdr_rb_capacity(void* r) { return static_cast<Ring*>(r)->capacity; }
uint64_t psdr_rb_overflows(void* r) {
    return static_cast<Ring*>(r)->overflow_drops.load();
}

// ---- format converters (standalone; compiler autovectorizes) ----
void psdr_convert_cs16(const int16_t* in, float* out, size_t n2,
                       float scale) {
    for (size_t i = 0; i < n2; ++i) out[i] = in[i] * scale;
}
void psdr_convert_cs8(const int8_t* in, float* out, size_t n2, float scale) {
    for (size_t i = 0; i < n2; ++i) out[i] = in[i] * scale;
}
void psdr_convert_cu8(const uint8_t* in, float* out, size_t n2) {
    for (size_t i = 0; i < n2; ++i)
        out[i] = (in[i] - 127.5f) * (1.0f / 127.5f);
}

// ---- file streamer ----
void* psdr_streamer_open(const char* path, size_t ring_samples, int loop) {
    Streamer* s = new Streamer();
    s->f = std::fopen(path, "rb");
    if (!s->f || (s->ring = new Ring(ring_samples), !s->parse_header())) {
        if (s->f) std::fclose(s->f);
        delete s->ring;
        delete s;
        return nullptr;
    }
    s->loop = loop != 0;
    s->reader = std::thread(&Streamer::reader_loop, s);
    return s;
}
// Pull exactly n samples (blocks until available or EOF); returns samples
// delivered (short only at EOF).
size_t psdr_streamer_read(void* sp, float* out, size_t n) {
    Streamer* s = static_cast<Streamer*>(sp);
    size_t got = 0;
    while (got < n) {
        got += s->ring->pull(out + 2 * got, n - got);
        if (got < n) {
            if (s->eof.load() && s->ring->count() == 0) break;
            std::this_thread::sleep_for(std::chrono::microseconds(100));
        }
    }
    return got;
}
size_t psdr_streamer_available(void* sp) {
    return static_cast<Streamer*>(sp)->ring->count();
}
double psdr_streamer_fs(void* sp) { return static_cast<Streamer*>(sp)->fs; }
double psdr_streamer_fc(void* sp) { return static_cast<Streamer*>(sp)->fc; }
int psdr_streamer_eof(void* sp) {
    Streamer* s = static_cast<Streamer*>(sp);
    return (s->eof.load() && s->ring->count() == 0) ? 1 : 0;
}
void psdr_streamer_close(void* sp) {
    Streamer* s = static_cast<Streamer*>(sp);
    s->stop.store(true);
    if (s->reader.joinable()) s->reader.join();
    std::fclose(s->f);
    delete s->ring;
    delete s;
}

}  // extern "C"
