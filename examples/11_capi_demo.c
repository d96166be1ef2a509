/* examples/11_capi_demo.c — the C face of the framework.
 *
 * A plain C program (no Python runtime) that uses libr4w.so to:
 *   1. modulate a LoRa payload to IQ,
 *   2. push it through the AWGN helper,
 *   3. demodulate the payload back (preamble stripped),
 *   4. FFT a tone and find its peak,
 *   5. stream samples through the lock-free SPSC ring.
 *
 * Role parity with the reference's r4w-ffi usage examples
 * (crates/r4w-ffi/src/lib.rs:27-52). Built + executed by
 * tests/test_capi.py::test_c_example_compiles_and_runs.
 *
 * Build:
 *   g++ -O2 -shared -fPIC -o libr4w.so r4w_tpu/native/r4w_capi.cpp
 *   gcc -O2 -o capi_demo examples/11_capi_demo.c \
 *       -I r4w_tpu/native -L . -lr4w -lm -Wl,-rpath,'$ORIGIN'
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "r4w_capi.h"

static int fail(const char *what) {
    fprintf(stderr, "FAIL: %s\n", what);
    return 1;
}

int main(void) {
    if (r4w_init() != R4W_OK) return fail("init");
    printf("libr4w %s (abi %d)\n", r4w_version(), r4w_abi_version());

    /* --- LoRa modulate -> AWGN -> demodulate ------------------- */
    const uint8_t msg[] = "hello from C";
    const size_t msg_len = sizeof(msg) - 1;
    r4w_waveform_t *wf = r4w_waveform_lora_new(7, 125000, 125000.0);
    if (!wf) return fail("lora_new");

    size_t cap = r4w_waveform_modulate_size(wf, msg_len);
    r4w_complex_t *iq = malloc(cap * sizeof *iq);
    size_t n = 0;
    if (r4w_waveform_modulate(wf, msg, msg_len, iq, cap, &n) != R4W_OK)
        return fail("modulate");
    printf("modulated %zu bytes -> %zu IQ samples\n", msg_len, n);

    if (r4w_add_awgn(iq, n, 20.0) != R4W_OK) return fail("awgn");

    /* strip the preamble: 8 up + 2 sync + 2.25 down chirps */
    size_t sps = r4w_waveform_samples_per_symbol(wf);
    size_t pre = 8 * sps + 2 * sps + 2 * sps + sps / 4;
    uint8_t out[64] = {0};
    size_t got = 0;
    if (r4w_waveform_demodulate(wf, iq + pre, n - pre, out,
                                sizeof out, &got) != R4W_OK)
        return fail("demodulate");
    if (got < msg_len || memcmp(out, msg, msg_len) != 0)
        return fail("payload mismatch after AWGN");
    printf("demodulated: \"%.*s\"\n", (int)msg_len, out);

    /* --- FFT + peak ------------------------------------------- */
    const size_t N = 256;
    r4w_complex_t *tone = malloc(N * sizeof *tone);
    r4w_generate_tone(37.0, (double)N, tone, N);  /* bin 37 */
    r4w_fft_t *fft = r4w_fft_new(N);
    if (r4w_fft_forward(fft, tone, N) != R4W_OK) return fail("fft");
    size_t bin;
    double mag, ph;
    r4w_fft_find_peak(tone, N, &bin, &mag, &ph);
    if (bin != 37) return fail("fft peak bin");
    printf("tone peak at bin %zu, |X| = %.1f\n", bin, mag);

    /* --- SPSC ring --------------------------------------------- */
    r4w_ringbuffer_t *rb = r4w_ringbuffer_new(1024);
    size_t pushed = r4w_ringbuffer_push_slice(rb, iq, 500);
    r4w_complex_t back[500];
    size_t popped = r4w_ringbuffer_pop_slice(rb, back, 500);
    if (pushed != 500 || popped != 500 || back[0].re != iq[0].re)
        return fail("ringbuffer roundtrip");
    printf("ring roundtrip ok (%zu samples)\n", popped);

    r4w_ringbuffer_free(rb);
    r4w_fft_free(fft);
    r4w_waveform_free(wf);
    free(tone);
    free(iq);
    printf("OK\n");
    return 0;
}
