#!/bin/bash
# Build the reference C implementation (fastcard + fastdet,
# /root/reference) against the minimal self-written FFT/volk shims
# described in scripts/make_fastdet_goldens.sh, into $WORK/bin.
#
# Canonical builder shared by make_fastdet_goldens.sh (golden
# generation) and scripts/validation_sweep.py --suite fastdet (the
# near-threshold differential campaign): one set of build flags, so
# every differential comparison runs against the same binaries that
# produced the committed goldens.
#
# Usage: scripts/build_fastdet_shim.sh [REFERENCE_DIR] WORK_DIR
set -euo pipefail

REF=${1:-/root/reference}
WORK=${2:?usage: build_fastdet_shim.sh REFERENCE_DIR WORK_DIR}
mkdir -p "$WORK"

SRC="$WORK/src"
INC="$WORK/include"
mkdir -p "$SRC/fastcard/lib" "$SRC/fastdet" "$SRC/shim" \
         "$INC/fastcard" "$INC/volk" "$WORK/bin" "$WORK/run"

cp "$REF"/fastcard/*.c "$REF"/fastcard/*.h "$SRC/fastcard/"
cp "$REF"/fastcard/lib/base64.c "$REF"/fastcard/lib/base64.h \
   "$SRC/fastcard/lib/"
cp "$REF"/fastdet/*.cpp "$REF"/fastdet/*.h "$SRC/fastdet/"
rm "$SRC/fastcard/old_fastcard.c" "$SRC/fastcard/rtlsdr_reader.c"
cp "$SRC/fastcard/"*.h "$INC/fastcard/"
cp "$SRC/fastcard/lib/base64.h" "$INC/fastcard/base64.h"

# --- configuration.h (cmake-generated upstream) ---
for d in "$SRC/fastcard" "$SRC/fastdet"; do
    cat > "$d/configuration.h" <<'EOF'
#define VERSION_MAJOR 0
#define VERSION_MINOR 0
#define VERSION_STRING "0.0-shim"
#define USE_FFTW
EOF
done

# --- fftw3.h shim: minimal API surface fastcard/fft.c consumes ---
cat > "$INC/fftw3.h" <<'EOF'
/* Minimal FFTW-compatible shim (own implementation; see
 * scripts/make_fastdet_goldens.sh).  Power-of-two c2c 1-D only. */
#ifndef FFTW3_SHIM_H
#define FFTW3_SHIM_H
#include <stddef.h>
#ifdef __cplusplus
extern "C" {
#endif
typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;
#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_MEASURE (0)
#define FFTW_ESTIMATE (1U << 6)
void *fftwf_malloc(size_t n);
void fftwf_free(void *p);
fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags);
void fftwf_execute(fftwf_plan p);
void fftwf_destroy_plan(fftwf_plan p);
int fftwf_import_wisdom_from_filename(const char *fn);
int fftwf_export_wisdom_to_filename(const char *fn);
#ifdef __cplusplus
}
#endif
#endif
EOF

cat > "$SRC/shim/fftw_shim.c" <<'EOF'
/* Own radix-2 DIT FFT behind the fftwf_* API (unnormalized, matching
 * FFTW's convention).  Butterflies run in double; in/out are float. */
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <fftw3.h>

struct fftwf_plan_s {
    int n;
    int sign;            /* -1 forward, +1 backward */
    fftwf_complex *in;
    fftwf_complex *out;
    double *tw;          /* n/2 twiddles for the chosen direction */
    double *work;        /* 2n doubles */
};

void *fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }
int fftwf_import_wisdom_from_filename(const char *fn) { (void)fn; return 1; }
int fftwf_export_wisdom_to_filename(const char *fn) { (void)fn; return 1; }

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags) {
    (void)flags;
    if (n <= 0 || (n & (n - 1)) != 0) return NULL;  /* power of two only */
    struct fftwf_plan_s *p = malloc(sizeof *p);
    if (!p) return NULL;
    p->n = n; p->sign = sign; p->in = in; p->out = out;
    p->tw = malloc(sizeof(double) * n);       /* n/2 complex */
    p->work = malloc(sizeof(double) * 2 * n);
    if (!p->tw || !p->work) { free(p->tw); free(p->work); free(p); return NULL; }
    for (int k = 0; k < n / 2; ++k) {
        double ang = (double)sign * 2.0 * M_PI * k / n;
        p->tw[2 * k] = cos(ang);
        p->tw[2 * k + 1] = sin(ang);
    }
    return p;
}

void fftwf_execute(fftwf_plan p) {
    const int n = p->n;
    double *w = p->work;
    /* bit-reversed load */
    for (int i = 0, j = 0; i < n; ++i) {
        w[2 * j] = p->in[i][0];
        w[2 * j + 1] = p->in[i][1];
        int bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j |= bit;
    }
    for (int len = 2; len <= n; len <<= 1) {
        int step = n / len;
        for (int i = 0; i < n; i += len) {
            for (int k = 0; k < len / 2; ++k) {
                const double wr = p->tw[2 * k * step];
                const double wi = p->tw[2 * k * step + 1];
                double *a = w + 2 * (i + k);
                double *b = w + 2 * (i + k + len / 2);
                const double tr = b[0] * wr - b[1] * wi;
                const double ti = b[0] * wi + b[1] * wr;
                b[0] = a[0] - tr; b[1] = a[1] - ti;
                a[0] += tr;       a[1] += ti;
            }
        }
    }
    for (int i = 0; i < n; ++i) {
        p->out[i][0] = (float)w[2 * i];
        p->out[i][1] = (float)w[2 * i + 1];
    }
}

void fftwf_destroy_plan(fftwf_plan p) {
    if (p) { free(p->tw); free(p->work); free(p); }
}
EOF

# --- volk shim: the seven kernels the reference consumes ---
cat > "$INC/volk/volk.h" <<'EOF'
/* Minimal volk-compatible shim: scalar kernels with generic-volk
 * semantics (see scripts/make_fastdet_goldens.sh). */
#ifndef VOLK_SHIM_H
#define VOLK_SHIM_H
#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>
#ifdef __cplusplus
#include <complex>
typedef std::complex<float> lv_32fc_t;
extern "C" {
#else
#include <complex.h>
typedef float _Complex lv_32fc_t;
#endif

static inline size_t volk_get_alignment(void) { return 32; }
static inline void *volk_malloc(size_t size, size_t alignment) {
    void *p = NULL;
    if (posix_memalign(&p, alignment, size ? size : alignment)) return NULL;
    return p;
}
static inline void volk_free(void *p) { free(p); }

static inline void volk_32fc_magnitude_squared_32f_a(
        float *out, const lv_32fc_t *in, unsigned int n) {
    const float *f = (const float *)in;
    for (unsigned int i = 0; i < n; ++i)
        out[i] = f[2 * i] * f[2 * i] + f[2 * i + 1] * f[2 * i + 1];
}
static inline void volk_32fc_magnitude_squared_32f_u(
        float *out, const lv_32fc_t *in, unsigned int n) {
    volk_32fc_magnitude_squared_32f_a(out, in, n);
}
static inline void volk_32fc_magnitude_squared_32f(
        float *out, const lv_32fc_t *in, unsigned int n) {
    volk_32fc_magnitude_squared_32f_a(out, in, n);
}
static inline void volk_32f_accumulator_s32f(
        float *result, const float *in, unsigned int n) {
    double acc = 0.0;
    for (unsigned int i = 0; i < n; ++i) acc += in[i];
    *result = (float)acc;
}
static inline void volk_32f_index_max_16u(
        uint16_t *target, const float *src, uint32_t n) {
    float m = src[0];
    uint16_t mi = 0;
    for (uint32_t i = 1; i < n; ++i)
        if (src[i] > m) { m = src[i]; mi = (uint16_t)i; }
    *target = mi;
}
static inline void volk_32fc_x2_multiply_32fc(
        lv_32fc_t *out, const lv_32fc_t *a, const lv_32fc_t *b,
        unsigned int n) {
    const float *fa = (const float *)a, *fb = (const float *)b;
    float *fo = (float *)out;
    for (unsigned int i = 0; i < n; ++i) {
        const float ar = fa[2 * i], ai = fa[2 * i + 1];
        const float br = fb[2 * i], bi = fb[2 * i + 1];
        fo[2 * i] = ar * br - ai * bi;
        fo[2 * i + 1] = ar * bi + ai * br;
    }
}
static inline void volk_32fc_conjugate_32fc(
        lv_32fc_t *out, const lv_32fc_t *in, unsigned int n) {
    const float *fi = (const float *)in;
    float *fo = (float *)out;
    for (unsigned int i = 0; i < n; ++i) {
        fo[2 * i] = fi[2 * i];
        fo[2 * i + 1] = -fi[2 * i + 1];
    }
}
#ifdef __cplusplus
}
#endif
#endif
EOF

# --- rtlsdr reader stub (inputs are files; never invoked) ---
cat > "$SRC/shim/rtlsdr_stub.c" <<'EOF'
#include <stdio.h>
#include <stddef.h>
#include "rtlsdr_reader.h"
reader_t *rtlsdr_reader_new(reader_settings_t reader_settings,
                            rtlsdr_settings_t *rtl_settings) {
    (void)reader_settings; (void)rtl_settings;
    fprintf(stderr, "rtlsdr support not built (shim)\n");
    return NULL;
}
void rtlsdr_reader_print_histogram(reader_t *reader, FILE *output) {
    (void)reader; (void)output;
}
EOF

# --- compile ---
CFLAGS="-O2 -std=gnu11 -I$INC -I$SRC/fastcard"
# -include cinttypes: upstream relied on inttypes.h exposing PRId64 to
# C++ (pre-C++11-era toolchain); inject the header instead of editing
# the reference source.
CXXFLAGS="-O2 -std=gnu++11 -I$INC -I$SRC/fastcard \
          -D__STDC_FORMAT_MACROS -include cinttypes"
cd "$SRC/fastcard"
for f in fastcard.c fft.c cardet.c rawconv.c parse.c reader.c \
         raw_reader.c card_reader.c circbuf.c fargs.c lib/base64.c; do
    gcc $CFLAGS -c "$f" -o "$WORK/$(basename "$f" .c).o"
done
gcc $CFLAGS -c fastcard_cli.c -o "$WORK/fastcard_cli.o"
gcc $CFLAGS -c "$SRC/shim/fftw_shim.c" -o "$WORK/fftw_shim.o"
gcc $CFLAGS -c "$SRC/shim/rtlsdr_stub.c" -o "$WORK/rtlsdr_stub.o"
cd "$SRC/fastdet"
g++ $CXXFLAGS -c corr_detector.cpp -o "$WORK/corr_detector.o"
g++ $CXXFLAGS -c fastcard_wrappers.cpp -o "$WORK/fastcard_wrappers.o"
g++ $CXXFLAGS -c fastdet.cpp -o "$WORK/fastdet.o"

CORE="fastcard.o fft.o cardet.o rawconv.o parse.o reader.o raw_reader.o \
      card_reader.o circbuf.o base64.o fftw_shim.o rtlsdr_stub.o fargs.o"
cd "$WORK"
gcc -o bin/fastcard fastcard_cli.o $CORE -lm -lpthread
g++ -o bin/fastdet fastdet.o corr_detector.o fastcard_wrappers.o $CORE \
    -lm -lpthread
echo "built: $WORK/bin/fastcard, $WORK/bin/fastdet"
