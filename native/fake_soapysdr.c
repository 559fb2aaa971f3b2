/* Fake SoapySDR — a test double implementing exactly the SoapySDR 0.8
 * C-ABI symbols airjax/sdr.py binds via ctypes, so the whole FFI path
 * (every argtype/restype declaration) executes under pytest without SDR
 * hardware (reference path: src/sdr.rs:4-45 + src/adsb.rs:27-73).
 *
 * Behavior:
 *  - enumerates one fake "rtlsdr" device;
 *  - records every configuration call (gain element, frequency, sample
 *    rate, stream format) to the file named by $AIRJAX_FAKE_SOAPY_LOG so
 *    tests can assert values survived the ctypes marshalling intact;
 *  - readStream serves deterministic CS16 IQ from the .c16 file named by
 *    $AIRJAX_FAKE_SOAPY_C16 (raw little-endian i16 I,Q pairs), cycling
 *    from the start when exhausted; zeros if unset.
 *
 * Build: make -C native libfake_soapysdr.so
 * Load:  AIRJAX_SOAPY_LIB=native/libfake_soapysdr.so (sdr.py override)
 */

#include <stdarg.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef struct {
    int configured;
} FakeDevice;

typedef struct {
    int16_t *data;    /* interleaved I,Q */
    size_t n_samples; /* complex samples available */
    size_t pos;       /* next sample index (cycles) */
    size_t reads;     /* readStream call count */
} FakeStream;

static void log_line(const char *fmt, ...) {
    const char *path = getenv("AIRJAX_FAKE_SOAPY_LOG");
    if (!path) return;
    FILE *f = fopen(path, "a");
    if (!f) return;
    va_list ap;
    va_start(ap, fmt);
    vfprintf(f, fmt, ap);
    va_end(ap);
    fputc('\n', f);
    fclose(f);
}

/* --- enumeration ------------------------------------------------------- */

void *SoapySDRDevice_enumerate(const void *args, size_t *length) {
    (void)args;
    *length = 1;
    log_line("enumerate -> 1 device (driver=rtlsdr)");
    /* Opaque non-NULL token; airjax only checks count then clears. */
    return malloc(1);
}

void SoapySDRKwargsList_clear(void *args, size_t length) {
    log_line("kwargslist_clear len=%zu", length);
    free(args);
}

/* --- device lifecycle --------------------------------------------------- */

void *SoapySDRDevice_makeStrArgs(const char *args) {
    log_line("makeStrArgs args=\"%s\"", args ? args : "");
    FakeDevice *dev = calloc(1, sizeof(FakeDevice));
    return dev;
}

int SoapySDRDevice_unmake(void *device) {
    log_line("unmake");
    free(device);
    return 0;
}

/* --- configuration ------------------------------------------------------ */

int SoapySDRDevice_setGainElement(void *device, int direction, size_t channel,
                                  const char *name, double value) {
    (void)device;
    log_line("setGainElement dir=%d chan=%zu name=%s value=%.2f", direction,
             channel, name, value);
    if (strcmp(name, "TUNER") != 0) return -1; /* rtlsdr's only element */
    return 0;
}

int SoapySDRDevice_setFrequency(void *device, int direction, size_t channel,
                                double frequency, const void *args) {
    (void)device;
    (void)args;
    log_line("setFrequency dir=%d chan=%zu freq=%.1f", direction, channel,
             frequency);
    return 0;
}

int SoapySDRDevice_setSampleRate(void *device, int direction, size_t channel,
                                 double rate) {
    (void)device;
    log_line("setSampleRate dir=%d chan=%zu rate=%.1f", direction, channel,
             rate);
    return 0;
}

/* --- streaming ---------------------------------------------------------- */

void *SoapySDRDevice_setupStream(void *device, int direction,
                                 const char *format, const size_t *channels,
                                 size_t numChans, const void *args) {
    (void)device;
    (void)args;
    log_line("setupStream dir=%d format=%s chan0=%zu nchans=%zu", direction,
             format, channels ? channels[0] : (size_t)-1, numChans);
    if (strcmp(format, "CS16") != 0) return NULL;
    FakeStream *s = calloc(1, sizeof(FakeStream));
    const char *path = getenv("AIRJAX_FAKE_SOAPY_C16");
    if (path) {
        FILE *f = fopen(path, "rb");
        if (f) {
            fseek(f, 0, SEEK_END);
            long bytes = ftell(f);
            fseek(f, 0, SEEK_SET);
            s->data = malloc((size_t)bytes);
            if (s->data && fread(s->data, 1, (size_t)bytes, f) == (size_t)bytes)
                s->n_samples = (size_t)bytes / (2 * sizeof(int16_t));
            fclose(f);
        }
    }
    return s;
}

size_t SoapySDRDevice_getStreamMTU(void *device, void *stream) {
    (void)device;
    (void)stream;
    return 20000; /* match the reference playback chunk size */
}

int SoapySDRDevice_activateStream(void *device, void *stream, int flags,
                                  long long timeNs, size_t numElems) {
    (void)device;
    (void)stream;
    log_line("activateStream flags=%d timeNs=%lld numElems=%zu", flags, timeNs,
             numElems);
    return 0;
}

int SoapySDRDevice_readStream(void *device, void *stream, void *const *buffs,
                              size_t numElems, int *flags, long long *timeNs,
                              long timeoutUs) {
    (void)device;
    FakeStream *s = stream;
    int16_t *out = buffs[0];
    *flags = 0;
    *timeNs = (long long)s->reads * 10000000LL;
    s->reads += 1;
    if (s->reads == 3) return -1; /* one injected timeout: must be skipped */
    (void)timeoutUs;
    /* Pace roughly like real hardware (20k samples @ 2 MS/s = 10 ms) so a
     * wall-clock-bounded capture loop doesn't accumulate gigabytes. */
    struct timespec ts = {0, 2000000}; /* 2 ms */
    nanosleep(&ts, NULL);
    if (!s->data || s->n_samples == 0) {
        memset(out, 0, numElems * 2 * sizeof(int16_t));
        return (int)numElems;
    }
    for (size_t i = 0; i < numElems; i++) {
        out[2 * i] = s->data[2 * s->pos];
        out[2 * i + 1] = s->data[2 * s->pos + 1];
        s->pos = (s->pos + 1) % s->n_samples;
    }
    return (int)numElems;
}

int SoapySDRDevice_deactivateStream(void *device, void *stream, int flags,
                                    long long timeNs) {
    (void)device;
    (void)stream;
    log_line("deactivateStream flags=%d timeNs=%lld", flags, timeNs);
    return 0;
}

int SoapySDRDevice_closeStream(void *device, void *stream) {
    (void)device;
    FakeStream *s = stream;
    log_line("closeStream reads=%zu", s ? s->reads : 0);
    if (s) free(s->data);
    free(s);
    return 0;
}
