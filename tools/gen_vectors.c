/* Test-vector generator: drives the REFERENCE SSW C API (ssw.h, built from
 * /root/reference in a scratch dir) over a deterministic set of random
 * alignment problems and dumps inputs + expected outputs as JSON lines.
 *
 * The emitted vectors are committed under tests/vectors/ and are the parity
 * target for the TPU-native implementation. This file is original harness
 * code (only the reference's public API is used); it is kept in tools/ for
 * reproducibility and is NOT part of the shipped framework.
 *
 * Build (x86 host):
 *   cc -O2 -o gen_vectors gen_vectors.c ssw.c -lm   # alongside reference src copies
 * Run:
 *   ./gen_vectors > tests/vectors/ssw_vectors.jsonl
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "ssw.h"

/* deterministic 64-bit LCG so vectors are reproducible across platforms */
static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t rng_next(void) {
    rng_state = rng_state * 6364136223846793005ull + 1442695040888963407ull;
    return rng_state >> 11;
}
static uint32_t rnd(uint32_t n) { return (uint32_t)(rng_next() % n); }

/* 5x5 DNA matrix in the same layout main.c builds (row/col 4 = ambiguous, 0) */
static void dna_matrix(int8_t *mat, int match, int mismatch) {
    int k = 0;
    for (int i = 0; i < 4; ++i) {
        for (int j = 0; j < 4; ++j) mat[k++] = (int8_t)(i == j ? match : -mismatch);
        mat[k++] = 0;
    }
    for (int j = 0; j < 5; ++j) mat[k++] = 0;
}

/* BLOSUM50, 24x24, copied from the published NCBI matrix (public data) */
static const int8_t blosum50[] = {
     5,-2,-1,-2,-1,-1,-1, 0,-2,-1,-2,-1,-1,-3,-1, 1, 0,-3,-2, 0,-2,-1,-1,-5,
    -2, 7,-1,-2,-4, 1, 0,-3, 0,-4,-3, 3,-2,-3,-3,-1,-1,-3,-1,-3,-1, 0,-1,-5,
    -1,-1, 7, 2,-2, 0, 0, 0, 1,-3,-4, 0,-2,-4,-2, 1, 0,-4,-2,-3, 5, 0,-1,-5,
    -2,-2, 2, 8,-4, 0, 2,-1,-1,-4,-4,-1,-4,-5,-1, 0,-1,-5,-3,-4, 6, 1,-1,-5,
    -1,-4,-2,-4,13,-3,-3,-3,-3,-2,-2,-3,-2,-2,-4,-1,-1,-5,-3,-1,-3,-3,-1,-5,
    -1, 1, 0, 0,-3, 7, 2,-2, 1,-3,-2, 2, 0,-4,-1, 0,-1,-1,-1,-3, 0, 4,-1,-5,
    -1, 0, 0, 2,-3, 2, 6,-3, 0,-4,-3, 1,-2,-3,-1,-1,-1,-3,-2,-3, 1, 5,-1,-5,
     0,-3, 0,-1,-3,-2,-3, 8,-2,-4,-4,-2,-3,-4,-2, 0,-2,-3,-3,-4,-1,-2,-1,-5,
    -2, 0, 1,-1,-3, 1, 0,-2,10,-4,-3, 0,-1,-1,-2,-1,-2,-3, 2,-4, 0, 0,-1,-5,
    -1,-4,-3,-4,-2,-3,-4,-4,-4, 5, 2,-3, 2, 0,-3,-3,-1,-3,-1, 4,-4,-3,-1,-5,
    -2,-3,-4,-4,-2,-2,-3,-4,-3, 2, 5,-3, 3, 1,-4,-3,-1,-2,-1, 1,-4,-3,-1,-5,
    -1, 3, 0,-1,-3, 2, 1,-2, 0,-3,-3, 6,-2,-4,-1, 0,-1,-3,-2,-3, 0, 1,-1,-5,
    -1,-2,-2,-4,-2, 0,-2,-3,-1, 2, 3,-2, 7, 0,-3,-2,-1,-1, 0, 1,-3,-1,-1,-5,
    -3,-3,-4,-5,-2,-4,-3,-4,-1, 0, 1,-4, 0, 8,-4,-3,-2, 1, 4,-1,-4,-4,-1,-5,
    -1,-3,-2,-1,-4,-1,-1,-2,-2,-3,-4,-1,-3,-4,10,-1,-1,-4,-3,-3,-2,-1,-1,-5,
     1,-1, 1, 0,-1, 0,-1, 0,-1,-3,-3, 0,-2,-3,-1, 5, 2,-4,-2,-2, 0, 0,-1,-5,
     0,-1, 0,-1,-1,-1,-1,-2,-2,-1,-1,-1,-1,-2,-1, 2, 5,-3,-2, 0, 0,-1,-1,-5,
    -3,-3,-4,-5,-5,-1,-3,-3,-3,-3,-2,-3,-1, 1,-4,-4,-3,15, 2,-3,-5,-2,-1,-5,
    -2,-1,-2,-3,-3,-1,-2,-3, 2,-1,-1,-2, 0, 4,-3,-2,-2, 2, 8,-1,-3,-2,-1,-5,
     0,-3,-3,-4,-1,-3,-3,-4,-4, 4, 1,-3, 1,-1,-3,-2, 0,-3,-1, 5,-3,-3,-1,-5,
    -2,-1, 5, 6,-3, 0, 1,-1, 0,-4,-4, 0,-3,-4,-2, 0, 0,-5,-3,-3, 6, 1,-1,-5,
    -1, 0, 0, 1,-3, 4, 5,-2, 0,-3,-3, 1,-1,-4,-1, 0,-1,-2,-2,-3, 1, 5,-1,-5,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-5,
    -5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5,-5, 1
};

static void rand_seq(int8_t *s, int len, int n_letters, const int8_t *tmpl,
                     int tmpl_len, int mut_pct) {
    /* with a template: copy with mut_pct% point mutations + rare indel shifts */
    if (tmpl) {
        int ti = 0;
        for (int i = 0; i < len; ++i) {
            if (rnd(100) < (uint32_t)mut_pct || ti >= tmpl_len)
                s[i] = (int8_t)rnd(n_letters);
            else s[i] = tmpl[ti];
            ti++;
            if (rnd(100) < 3) ti += rnd(3);      /* deletion in read */
            if (rnd(100) < 3 && ti > 0) ti -= 1; /* insertion in read */
        }
    } else {
        for (int i = 0; i < len; ++i) s[i] = (int8_t)rnd(n_letters);
    }
}

static void emit_case(const int8_t *ref, int refLen, const int8_t *read,
                      int readLen, const int8_t *mat, int n, int gapO,
                      int gapE, int score_size, int flag, int filters,
                      int filterd, int maskLen, const char *tag) {
    s_profile *p = ssw_init(read, readLen, mat, n, (int8_t)score_size);
    s_align *a = ssw_align(p, ref, refLen, (uint8_t)gapO, (uint8_t)gapE,
                           (uint8_t)flag, (uint16_t)filters, filterd, maskLen);
    printf("{\"tag\":\"%s\",\"n\":%d,\"gapO\":%d,\"gapE\":%d,\"score_size\":%d,"
           "\"flag\":%d,\"filters\":%d,\"filterd\":%d,\"maskLen\":%d,",
           tag, n, gapO, gapE, score_size, flag, filters, filterd, maskLen);
    printf("\"mat\":[");
    for (int i = 0; i < n * n; ++i) printf("%s%d", i ? "," : "", mat[i]);
    printf("],\"ref\":[");
    for (int i = 0; i < refLen; ++i) printf("%s%d", i ? "," : "", ref[i]);
    printf("],\"read\":[");
    for (int i = 0; i < readLen; ++i) printf("%s%d", i ? "," : "", read[i]);
    printf("],");
    if (!a) {
        printf("\"null_result\":true}\n");
    } else {
        printf("\"score1\":%d,\"score2\":%d,\"ref_begin1\":%d,\"ref_end1\":%d,"
               "\"read_begin1\":%d,\"read_end1\":%d,\"ref_end2\":%d,\"aflag\":%d,"
               "\"cigar\":\"",
               a->score1, a->score2, a->ref_begin1, a->ref_end1, a->read_begin1,
               a->read_end1, a->ref_end2, a->flag);
        for (int i = 0; i < a->cigarLen; ++i)
            printf("%u%c", cigar_int_to_len(a->cigar[i]),
                   cigar_int_to_op(a->cigar[i]));
        printf("\"}\n");
        align_destroy(a);
    }
    init_destroy(p);
}

int main(void) {
    int8_t mat[25];
    int8_t ref[4096], read[1024];
    /* regime sweep: (match,mismatch,gapO,gapE) */
    const int dna_params[][4] = {
        {2, 2, 3, 1}, {1, 3, 5, 2}, {2, 2, 2, 2}, {1, 1, 1, 1}, {3, 2, 5, 1},
    };
    for (int pi = 0; pi < 5; ++pi) {
        dna_matrix(mat, dna_params[pi][0], dna_params[pi][1]);
        for (int c = 0; c < 30; ++c) {
            int refLen = 20 + rnd(400);
            int readLen = 5 + rnd(200);
            if (readLen > refLen) readLen = refLen;
            rand_seq(ref, refLen, 4, NULL, 0, 0);
            /* read derived from a random ref window most of the time */
            if (c % 3 != 0) {
                int off = rnd(refLen - readLen + 1);
                rand_seq(read, readLen, 4, ref + off, refLen - off, 10);
            } else rand_seq(read, readLen, 4, NULL, 0, 0);
            int maskLen = (c % 4 == 0) ? readLen / 2 : 15;
            emit_case(ref, refLen, read, readLen, mat, 5, dna_params[pi][2],
                      dna_params[pi][3], 2, 0x0f, 0, 32767, maskLen, "dna");
        }
    }
    /* long high-identity reads to force the word (16-bit) path: score>=255-bias */
    dna_matrix(mat, 2, 2);
    for (int c = 0; c < 12; ++c) {
        int refLen = 600 + rnd(3000);
        int readLen = 200 + rnd(600);
        if (readLen > refLen) readLen = refLen;
        rand_seq(ref, refLen, 4, NULL, 0, 0);
        int off = rnd(refLen - readLen + 1);
        rand_seq(read, readLen, 4, ref + off, refLen - off, 2);
        emit_case(ref, refLen, read, readLen, mat, 5, 3, 1, 2, 0x0f, 0, 32767,
                  readLen / 2, "dna_word");
    }
    /* protein / BLOSUM50 */
    for (int c = 0; c < 25; ++c) {
        int refLen = 20 + rnd(300);
        int readLen = 5 + rnd(150);
        if (readLen > refLen) readLen = refLen;
        rand_seq(ref, refLen, 23, NULL, 0, 0);
        if (c % 3 != 0) {
            int off = rnd(refLen - readLen + 1);
            rand_seq(read, readLen, 23, ref + off, refLen - off, 15);
        } else rand_seq(read, readLen, 23, NULL, 0, 0);
        emit_case(ref, refLen, read, readLen, blosum50, 24, 3, 1, 2, 0x0f, 0,
                  32767, readLen / 2, "prot");
    }
    /* flag / filter semantics sweep on a fixed dna pair */
    dna_matrix(mat, 2, 2);
    {
        int refLen = 150, readLen = 60;
        rand_seq(ref, refLen, 4, NULL, 0, 0);
        rand_seq(read, readLen, 4, ref + 30, refLen - 30, 8);
        const int flags[] = {0, 1, 2, 4, 8, 3, 6, 7, 15};
        for (int fi = 0; fi < 9; ++fi) {
            emit_case(ref, refLen, read, readLen, mat, 5, 3, 1, 2, flags[fi],
                      40, 30, 15, "flags");
            emit_case(ref, refLen, read, readLen, mat, 5, 3, 1, 2, flags[fi],
                      2000, 5, 15, "flags_strict");
        }
        /* score_size 0 and 1 */
        emit_case(ref, refLen, read, readLen, mat, 5, 3, 1, 0, 15, 0, 32767, 15, "ss0");
        emit_case(ref, refLen, read, readLen, mat, 5, 3, 1, 1, 15, 0, 32767, 15, "ss1");
        /* maskLen < 15: no score2 */
        emit_case(ref, refLen, read, readLen, mat, 5, 3, 1, 2, 15, 0, 32767, 5, "masklt15");
    }
    /* tiny / degenerate */
    dna_matrix(mat, 2, 2);
    {
        int8_t r1[] = {0}, q1[] = {0};
        emit_case(r1, 1, q1, 1, mat, 5, 3, 1, 2, 15, 0, 32767, 15, "tiny_match");
        int8_t r2[] = {0}, q2[] = {1};
        emit_case(r2, 1, q2, 1, mat, 5, 3, 1, 2, 15, 0, 32767, 15, "tiny_mismatch");
        int8_t r3[] = {4, 4, 4, 4}, q3[] = {4, 4};
        emit_case(r3, 4, q3, 2, mat, 5, 3, 1, 2, 15, 0, 32767, 15, "all_ambig");
    }
    return 0;
}
