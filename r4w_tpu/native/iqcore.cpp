// iqcore — native host-side runtime for r4w_tpu.
//
// Fills the performance role of the reference's native Rust runtime
// pieces (SURVEY.md §2.8): interleaved IQ format conversion
// (io/format.rs hot loops), a lock-free SPSC ring buffer
// (rt/ringbuffer.rs), and UDP IQ packet framing (udp_source_sink.rs).
// The TPU compute path stays in XLA/Pallas; this library keeps the
// host I/O path off the Python interpreter.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libiqcore.so iqcore.cpp
// ABI: plain C, consumed via ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

extern "C" {

// ---------------------------------------------------------------------
// IQ format conversion: interleaved f32 <-> i16/i8/u8 with scaling.
// The loops are written so the compiler auto-vectorizes them.
// ---------------------------------------------------------------------

void iq_f32_to_i16(const float* in, int16_t* out, int64_t n, float scale) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i] * scale;
        if (v > 32767.f) v = 32767.f;
        if (v < -32768.f) v = -32768.f;
        out[i] = (int16_t)(v >= 0 ? v + 0.5f : v - 0.5f);
    }
}

void iq_i16_to_f32(const int16_t* in, float* out, int64_t n, float inv_scale) {
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * inv_scale;
}

void iq_f32_to_i8(const float* in, int8_t* out, int64_t n, float scale) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i] * scale;
        if (v > 127.f) v = 127.f;
        if (v < -128.f) v = -128.f;
        out[i] = (int8_t)(v >= 0 ? v + 0.5f : v - 0.5f);
    }
}

void iq_i8_to_f32(const int8_t* in, float* out, int64_t n, float inv_scale) {
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * inv_scale;
}

void iq_f32_to_u8(const float* in, uint8_t* out, int64_t n,
                  float scale, float offset) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i] * scale + offset;
        if (v > 255.f) v = 255.f;
        if (v < 0.f) v = 0.f;
        out[i] = (uint8_t)(v + 0.5f);
    }
}

void iq_u8_to_f32(const uint8_t* in, float* out, int64_t n,
                  float inv_scale, float offset) {
    for (int64_t i = 0; i < n; ++i) out[i] = (in[i] - offset) * inv_scale;
}

// split complex (re[i], im[i]) <-> interleaved (re0, im0, re1, im1, ...)
void iq_interleave(const float* re, const float* im, float* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        out[2 * i] = re[i];
        out[2 * i + 1] = im[i];
    }
}

void iq_deinterleave(const float* in, float* re, float* im, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        re[i] = in[2 * i];
        im[i] = in[2 * i + 1];
    }
}

// ---------------------------------------------------------------------
// Lock-free SPSC ring buffer over float pairs (rt/ringbuffer.rs role).
// Capacity is rounded up to a power of two; one slot reserved.
// ---------------------------------------------------------------------

struct RingBuffer {
    float* data;
    uint64_t capacity;   // in floats, power of two
    uint64_t mask;
    std::atomic<uint64_t> head;  // write index
    std::atomic<uint64_t> tail;  // read index
};

void* ring_create(uint64_t capacity_floats) {
    uint64_t cap = 1;
    while (cap < capacity_floats + 1) cap <<= 1;
    RingBuffer* rb = new (std::nothrow) RingBuffer;
    if (!rb) return nullptr;
    rb->data = new (std::nothrow) float[cap];
    if (!rb->data) { delete rb; return nullptr; }
    rb->capacity = cap;
    rb->mask = cap - 1;
    rb->head.store(0, std::memory_order_relaxed);
    rb->tail.store(0, std::memory_order_relaxed);
    return rb;
}

void ring_destroy(void* p) {
    RingBuffer* rb = (RingBuffer*)p;
    if (!rb) return;
    delete[] rb->data;
    delete rb;
}

uint64_t ring_available_read(void* p) {
    RingBuffer* rb = (RingBuffer*)p;
    return rb->head.load(std::memory_order_acquire)
         - rb->tail.load(std::memory_order_acquire);
}

uint64_t ring_available_write(void* p) {
    RingBuffer* rb = (RingBuffer*)p;
    return rb->capacity - 1 - ring_available_read(p);
}

// returns floats actually written (producer side)
uint64_t ring_write(void* p, const float* src, uint64_t n) {
    RingBuffer* rb = (RingBuffer*)p;
    uint64_t can = ring_available_write(p);
    if (n > can) n = can;
    uint64_t head = rb->head.load(std::memory_order_relaxed);
    for (uint64_t i = 0; i < n; ++i)
        rb->data[(head + i) & rb->mask] = src[i];
    rb->head.store(head + n, std::memory_order_release);
    return n;
}

// returns floats actually read (consumer side)
uint64_t ring_read(void* p, float* dst, uint64_t n) {
    RingBuffer* rb = (RingBuffer*)p;
    uint64_t can = ring_available_read(p);
    if (n > can) n = can;
    uint64_t tail = rb->tail.load(std::memory_order_relaxed);
    for (uint64_t i = 0; i < n; ++i)
        dst[i] = rb->data[(tail + i) & rb->mask];
    rb->tail.store(tail + n, std::memory_order_release);
    return n;
}

// ---------------------------------------------------------------------
// UDP IQ packet framing (udp_source_sink.rs wire format):
// [seq u32 LE][interleaved f32 LE...]
// ---------------------------------------------------------------------

int64_t udp_frame_packet(uint32_t seq, const float* samples,
                         int64_t n_floats, uint8_t* out,
                         int64_t out_capacity) {
    int64_t need = 4 + n_floats * 4;
    if (out_capacity < need) return -1;
    std::memcpy(out, &seq, 4);
    std::memcpy(out + 4, samples, (size_t)n_floats * 4);
    return need;
}

int64_t udp_parse_packet(const uint8_t* in, int64_t n_bytes,
                         uint32_t* seq, float* samples,
                         int64_t samples_capacity) {
    if (n_bytes < 4) return -1;
    std::memcpy(seq, in, 4);
    int64_t nf = (n_bytes - 4) / 4;
    if (nf > samples_capacity) return -1;
    std::memcpy(samples, in + 4, (size_t)nf * 4);
    return nf;
}

int iqcore_abi_version() { return 1; }

}  // extern "C"
