/* C-API example: aligns the reference example's pair through the ssw-tpu
 * client and prints the result block (ref: src/example.c:105-156 aligns the
 * same pair with the same parameters; the expected values are score1=21,
 * score2=8, target 9..22, query 1..15, cigar 4=1X4=1I5=).
 *
 * Build:  gcc -O2 -o example_c example_c.c ssw_client.c
 * Run (from the ssw-tpu repo root, or pass the repo dir as argv[1]):
 *   ./example_c [repo_dir] [python_exe]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "ssw_client.h"

static const char MAPSTR[] = "MIDNSHP=X";

int main(int argc, char *const argv[]) {
    static const char ref_seq[] = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA";
    static const char read_seq[] = "CTGAGCCGGTAAATC";
    int8_t nt_table[128];
    int8_t mat[25];
    int8_t num[64], ref_num[64];
    int i, j, k;
    s_profile *profile;
    s_align *result;

    if (argc > 1) ssw_client_configure(argc > 2 ? argv[2] : NULL, argv[1]);

    for (i = 0; i < 128; ++i) nt_table[i] = 4;
    nt_table['A'] = nt_table['a'] = 0;
    nt_table['C'] = nt_table['c'] = 1;
    nt_table['G'] = nt_table['g'] = 2;
    nt_table['T'] = nt_table['t'] = 3;

    for (i = k = 0; i < 4; ++i) {
        for (j = 0; j < 4; ++j) mat[k++] = i == j ? 2 : -2;
        mat[k++] = 0;
    }
    for (j = 0; j < 5; ++j) mat[k++] = 0;

    for (i = 0; read_seq[i]; ++i) num[i] = nt_table[(int)read_seq[i]];
    for (i = 0; ref_seq[i]; ++i) ref_num[i] = nt_table[(int)ref_seq[i]];

    profile = ssw_init(num, (int32_t)strlen(read_seq), mat, 5, 2);
    if (!profile) { fprintf(stderr, "ssw_init failed\n"); return 1; }
    /* flag=1: always return begins + cigar, like the reference example */
    result = ssw_align(profile, ref_num, (int32_t)strlen(ref_seq), 3, 1, 1,
                       0, 0, 15);
    if (!result) { fprintf(stderr, "ssw_align failed\n"); return 1; }

    printf("optimal_alignment_score: %d\tsub-optimal_alignment_score: %d\t",
           result->score1, result->score2);
    printf("target_begin: %d\ttarget_end: %d\t", result->ref_begin1 + 1,
           result->ref_end1 + 1);
    printf("query_begin: %d\tquery_end: %d\n", result->read_begin1 + 1,
           result->read_end1 + 1);
    printf("cigar: ");
    for (i = 0; i < result->cigarLen; ++i)
        printf("%u%c", result->cigar[i] >> 4,
               MAPSTR[result->cigar[i] & 0xf]);
    printf("\n");

    align_destroy(result);
    init_destroy(profile);
    ssw_client_stop();
    return 0;
}
