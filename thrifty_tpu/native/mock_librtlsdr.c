/* Mock librtlsdr: exercises the in-process USB binding without hardware.
 *
 * Implements the subset of the librtlsdr ABI that
 * thrifty_tpu/io/rtlsdr.py binds (the calls the reference makes in
 * fastcard/rtlsdr_reader.c:243-294 plus the async read loop), replaying
 * deterministic sample data so tests can assert actual detections:
 *
 *   - rtlsdr_read_async streams $MOCK_RTLSDR_FILE to the callback in
 *     buf_len-sized chunks (8 chunks of 0x80 "silence" when unset),
 *     honouring rtlsdr_cancel_async between chunks, then returns 0;
 *     $MOCK_RTLSDR_FAIL makes it return -5 after one chunk (the
 *     premature-exit error path, rtlsdr_reader.c:108-113).
 *   - The tuner gain table {0, 87, 197, 297, 496} deliberately differs
 *     from the published R820T table, so a test passing gain 25.0 dB
 *     can prove nearest-gain resolution queried the DEVICE
 *     (expect 197), not a baked-in table.
 *   - Every setter records its argument in an exported mock_last_*
 *     global for ctypes inspection.
 *
 * Build: make -C thrifty_tpu/native mock-rtlsdr  ->  mock_librtlsdr.so
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct rtlsdr_dev {
    uint32_t index;
    volatile int cancel;
} rtlsdr_dev_t;

typedef void (*rtlsdr_read_async_cb_t)(unsigned char *buf, uint32_t len,
                                       void *ctx);

/* Exported inspection state (read via ctypes in tests). */
uint32_t mock_last_sample_rate = 0;
uint32_t mock_last_center_freq = 0;
int mock_last_gain_mode = -1;
int mock_last_gain = -1;
int mock_last_ppm = -1000000;
int mock_last_bias_tee = -1;
int mock_reset_buffer_calls = 0;

static rtlsdr_dev_t g_dev;

uint32_t rtlsdr_get_device_count(void) {
    const char *env = getenv("MOCK_RTLSDR_COUNT");
    return env ? (uint32_t)atoi(env) : 1u;
}

const char *rtlsdr_get_device_name(uint32_t index) {
    (void)index;
    return "Mock RTL2838UHIDIR";
}

int rtlsdr_open(rtlsdr_dev_t **out, uint32_t index) {
    if (index >= rtlsdr_get_device_count()) return -1;
    g_dev.index = index;
    g_dev.cancel = 0;
    *out = &g_dev;
    return 0;
}

int rtlsdr_close(rtlsdr_dev_t *dev) { (void)dev; return 0; }

int rtlsdr_set_sample_rate(rtlsdr_dev_t *dev, uint32_t rate) {
    (void)dev; mock_last_sample_rate = rate; return 0;
}

int rtlsdr_set_center_freq(rtlsdr_dev_t *dev, uint32_t freq) {
    (void)dev; mock_last_center_freq = freq; return 0;
}

int rtlsdr_set_freq_correction(rtlsdr_dev_t *dev, int ppm) {
    (void)dev;
    if (ppm == mock_last_ppm) return -2;  /* librtlsdr "unchanged" code */
    mock_last_ppm = ppm;
    return 0;
}

int rtlsdr_set_tuner_gain_mode(rtlsdr_dev_t *dev, int manual) {
    (void)dev; mock_last_gain_mode = manual; return 0;
}

int rtlsdr_get_tuner_type(rtlsdr_dev_t *dev) {
    (void)dev; return 5;  /* RTLSDR_TUNER_R820T */
}

static const int k_gains[] = {0, 87, 197, 297, 496};

int rtlsdr_get_tuner_gains(rtlsdr_dev_t *dev, int *gains) {
    (void)dev;
    int count = (int)(sizeof(k_gains) / sizeof(k_gains[0]));
    if (gains) memcpy(gains, k_gains, sizeof(k_gains));
    return count;
}

int rtlsdr_set_tuner_gain(rtlsdr_dev_t *dev, int gain) {
    (void)dev;
    /* Real librtlsdr rejects unsupported gains at the tuner layer;
     * enforcing table membership here catches a client that skipped
     * nearest-gain resolution. */
    for (size_t i = 0; i < sizeof(k_gains) / sizeof(k_gains[0]); ++i) {
        if (k_gains[i] == gain) {
            mock_last_gain = gain;
            return 0;
        }
    }
    return -1;
}

int rtlsdr_set_bias_tee(rtlsdr_dev_t *dev, int on) {
    (void)dev; mock_last_bias_tee = on; return 0;
}

int rtlsdr_reset_buffer(rtlsdr_dev_t *dev) {
    (void)dev; ++mock_reset_buffer_calls; return 0;
}

int rtlsdr_read_async(rtlsdr_dev_t *dev, rtlsdr_read_async_cb_t cb,
                      void *ctx, uint32_t buf_num, uint32_t buf_len) {
    (void)buf_num;
    if (buf_len == 0) buf_len = 16 * 32 * 512;  /* librtlsdr default */
    unsigned char *buf = malloc(buf_len);
    if (!buf) return -1;

    int fail = getenv("MOCK_RTLSDR_FAIL") != NULL;
    const char *path = getenv("MOCK_RTLSDR_FILE");
    if (path) {
        FILE *f = fopen(path, "rb");
        if (!f) { free(buf); return -3; }
        size_t n;
        int chunks = 0;
        while (!dev->cancel && (n = fread(buf, 1, buf_len, f)) > 0) {
            cb(buf, (uint32_t)n, ctx);
            if (fail && ++chunks >= 1) { fclose(f); free(buf); return -5; }
        }
        fclose(f);
    } else {
        memset(buf, 0x80, buf_len);  /* zero-amplitude I/Q */
        for (int i = 0; i < 8 && !dev->cancel; ++i) {
            cb(buf, buf_len, ctx);
            if (fail) { free(buf); return -5; }
        }
    }
    free(buf);
    return 0;
}

int rtlsdr_cancel_async(rtlsdr_dev_t *dev) {
    dev->cancel = 1;
    return 0;
}
