/* C client for the ssw-tpu alignment engine.
 *
 * Mirrors the reference C library's public surface (ref: src/ssw.h:86-140 —
 * ssw_init / init_destroy / ssw_align / align_destroy and the s_profile /
 * s_align structures) so a C program written against libssw can switch by
 * relinking.  The engine itself is TPU-resident Python/JAX, so the client
 * speaks the same JSON-lines bridge protocol the Java binding uses
 * (ssw_tpu/bridge.py) to a worker subprocess; call ssw_client_configure()
 * first if the defaults (python3, current working directory) are wrong.
 */
#ifndef SSW_CLIENT_H
#define SSW_CLIENT_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Alignment result; field-for-field the reference's s_align
 * (ref: src/ssw.h:55-66).  cigar is BAM-encoded: high 28 bits length,
 * low 4 bits op (0=M 1=I 2=D); cigar == NULL / cigarLen == 0 when the
 * path is unavailable.  flag: 0 accurate, 1 banded traceback failed,
 * 2 path may miss a small part. */
typedef struct {
    uint16_t score1;
    uint16_t score2;
    int32_t ref_begin1;
    int32_t ref_end1;
    int32_t read_begin1;
    int32_t read_end1;
    int32_t ref_end2;
    uint32_t *cigar;
    int32_t cigarLen;
    uint16_t flag;
} s_align;

/* Opaque query profile (the reference's s_profile; here it holds the
 * encoded read + matrix so every ssw_align call can ship them to the
 * worker). */
typedef struct s_profile s_profile;

/* Optional: set the python executable and the ssw-tpu repo directory the
 * worker runs in.  Pass NULL to keep a setting.  Must be called before the
 * first ssw_init/ssw_align; returns 0 on success. */
int ssw_client_configure(const char *python_exe, const char *repo_dir);

/* Start the worker subprocess eagerly (otherwise the first align starts
 * it).  Returns 0 on success, -1 on failure. */
int ssw_client_start(void);

/* Shut the worker down (sent a shutdown op, then reaped). */
void ssw_client_stop(void);

/* ref: src/ssw.h:86 — build a query profile from an encoded read (numbers
 * < n) and an n x n substitution matrix.  score_size: 0 byte, 1 word,
 * 2 auto (overflow rerun), same semantics as the reference. */
s_profile *ssw_init(const int8_t *read, int32_t readLen, const int8_t *mat,
                    int32_t n, int8_t score_size);

/* ref: src/ssw.h:91 */
void init_destroy(s_profile *p);

/* ref: src/ssw.h:134 — align the profiled query against an encoded target.
 * Returns NULL on worker failure or where the reference returns NULL
 * (score_size 0 overflow). */
s_align *ssw_align(const s_profile *prof, const int8_t *ref, int32_t refLen,
                   const uint8_t weight_gapO, const uint8_t weight_gapE,
                   const uint8_t flag, const uint16_t filters,
                   const int32_t filterd, const int32_t maskLen);

/* ref: src/ssw.h:139 */
void align_destroy(s_align *a);

#ifdef __cplusplus
}
#endif

#endif /* SSW_CLIENT_H */
