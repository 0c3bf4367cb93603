/* ssw_client: the C face of the ssw-tpu engine.
 *
 * One worker subprocess (`python -m ssw_tpu.bridge`) serves JSON-lines
 * requests over a stdin/stdout pipe — the same wire protocol the Java
 * binding uses (ssw_tpu/bridge.py docstring).  Requests are sequential
 * (one outstanding at a time), which matches the reference C API's
 * synchronous ssw_align (ref: src/ssw.h:134).
 */
#define _POSIX_C_SOURCE 200809L

#include "ssw_client.h"

#include <errno.h>
#include <signal.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/wait.h>
#include <unistd.h>

struct s_profile {
    int8_t *read;
    int32_t readLen;
    int8_t *mat;
    int32_t n;
    int8_t score_size;
};

static pid_t g_pid = -1;
static FILE *g_to = NULL;   /* worker stdin */
static FILE *g_from = NULL; /* worker stdout */
static long g_id = 0;
static char g_python[512] = "python3";
static char g_repo[1024] = "";

int ssw_client_configure(const char *python_exe, const char *repo_dir) {
    if (g_pid >= 0) return -1; /* already running */
    if (python_exe) {
        if (strlen(python_exe) >= sizeof(g_python)) return -1;
        strcpy(g_python, python_exe);
    }
    if (repo_dir) {
        if (strlen(repo_dir) >= sizeof(g_repo)) return -1;
        strcpy(g_repo, repo_dir);
    }
    return 0;
}

int ssw_client_start(void) {
    int in_pipe[2], out_pipe[2];
    if (g_pid >= 0) return 0;
    if (pipe(in_pipe) != 0 || pipe(out_pipe) != 0) return -1;
    g_pid = fork();
    if (g_pid < 0) return -1;
    if (g_pid == 0) {
        dup2(in_pipe[0], 0);
        dup2(out_pipe[1], 1);
        close(in_pipe[0]); close(in_pipe[1]);
        close(out_pipe[0]); close(out_pipe[1]);
        if (g_repo[0] && chdir(g_repo) != 0) _exit(127);
        execlp(g_python, g_python, "-m", "ssw_tpu.bridge", (char *)NULL);
        _exit(127);
    }
    close(in_pipe[0]);
    close(out_pipe[1]);
    g_to = fdopen(in_pipe[1], "w");
    g_from = fdopen(out_pipe[0], "r");
    if (!g_to || !g_from) { ssw_client_stop(); return -1; }
    signal(SIGPIPE, SIG_IGN);
    return 0;
}

void ssw_client_stop(void) {
    if (g_to) {
        fputs("{\"op\": \"shutdown\"}\n", g_to);
        fflush(g_to);
        fclose(g_to);
        g_to = NULL;
    }
    if (g_from) { fclose(g_from); g_from = NULL; }
    if (g_pid >= 0) {
        int st;
        waitpid(g_pid, &st, 0);
        g_pid = -1;
    }
}

/* ---- tiny growable string buffer for the request line ---- */

typedef struct { char *p; size_t len, cap; } buf_t;

static int buf_put(buf_t *b, const char *s) {
    size_t n = strlen(s);
    if (b->len + n + 1 > b->cap) {
        size_t cap = b->cap ? b->cap * 2 : 4096;
        while (cap < b->len + n + 1) cap *= 2;
        char *q = realloc(b->p, cap);
        if (!q) return -1;
        b->p = q;
        b->cap = cap;
    }
    memcpy(b->p + b->len, s, n + 1);
    b->len += n;
    return 0;
}

static int buf_put_long(buf_t *b, long v) {
    char tmp[32];
    snprintf(tmp, sizeof tmp, "%ld", v);
    return buf_put(b, tmp);
}

static int buf_put_i8_array(buf_t *b, const int8_t *a, int32_t n) {
    int32_t i;
    if (buf_put(b, "[") != 0) return -1;
    for (i = 0; i < n; ++i) {
        if (i && buf_put(b, ",") != 0) return -1;
        if (buf_put_long(b, a[i]) != 0) return -1;
    }
    return buf_put(b, "]");
}

/* ---- minimal response-line field extraction ----
 * The bridge emits flat json.dumps output; keys are unique per line
 * ("cigar" is matched as "cigar": [ so "cigar_string" cannot shadow it). */

static const char *jfind(const char *line, const char *key) {
    char pat[64];
    snprintf(pat, sizeof pat, "\"%s\":", key);
    return strstr(line, pat);
}

static long jlong(const char *line, const char *key, long dflt) {
    const char *p = jfind(line, key);
    if (!p) return dflt;
    return strtol(p + strlen(key) + 3, NULL, 10);
}

s_profile *ssw_init(const int8_t *read, int32_t readLen, const int8_t *mat,
                    int32_t n, int8_t score_size) {
    s_profile *p = calloc(1, sizeof *p);
    if (!p) return NULL;
    p->read = malloc(readLen > 0 ? (size_t)readLen : 1);
    p->mat = malloc((size_t)n * n);
    if (!p->read || !p->mat) {
        free(p->read); free(p->mat); free(p);
        return NULL;
    }
    memcpy(p->read, read, (size_t)readLen);
    memcpy(p->mat, mat, (size_t)n * n);
    p->readLen = readLen;
    p->n = n;
    p->score_size = score_size;
    return p;
}

void init_destroy(s_profile *p) {
    if (!p) return;
    free(p->read);
    free(p->mat);
    free(p);
}

s_align *ssw_align(const s_profile *prof, const int8_t *ref, int32_t refLen,
                   const uint8_t weight_gapO, const uint8_t weight_gapE,
                   const uint8_t flag, const uint16_t filters,
                   const int32_t filterd, const int32_t maskLen) {
    buf_t b = {0};
    char *line = NULL;
    size_t linecap = 0;
    long id;
    s_align *a = NULL;
    const char *res;

    if (!prof || g_pid < 0 && ssw_client_start() != 0) return NULL;
    id = g_id++;
    if (buf_put(&b, "{\"id\": ") || buf_put_long(&b, id) ||
        buf_put(&b, ", \"read\": ") ||
        buf_put_i8_array(&b, prof->read, prof->readLen) ||
        buf_put(&b, ", \"ref\": ") || buf_put_i8_array(&b, ref, refLen) ||
        buf_put(&b, ", \"matrix\": ") ||
        buf_put_i8_array(&b, prof->mat, prof->n * prof->n) ||
        buf_put(&b, ", \"n\": ") || buf_put_long(&b, prof->n) ||
        buf_put(&b, ", \"gap_open\": ") || buf_put_long(&b, weight_gapO) ||
        buf_put(&b, ", \"gap_extend\": ") || buf_put_long(&b, weight_gapE) ||
        buf_put(&b, ", \"flag\": ") || buf_put_long(&b, flag) ||
        buf_put(&b, ", \"filter_score\": ") || buf_put_long(&b, filters) ||
        buf_put(&b, ", \"filter_distance\": ") || buf_put_long(&b, filterd) ||
        buf_put(&b, ", \"mask_len\": ") || buf_put_long(&b, maskLen) ||
        buf_put(&b, ", \"score_size\": ") ||
        buf_put_long(&b, prof->score_size) || buf_put(&b, "}\n")) {
        free(b.p);
        return NULL;
    }
    if (fputs(b.p, g_to) == EOF || fflush(g_to) != 0) {
        free(b.p);
        return NULL;
    }
    free(b.p);

    /* read lines until our id answers (the worker may interleave nothing
     * else, but be tolerant of stray non-JSON noise on stdout) */
    for (;;) {
        ssize_t got = getline(&line, &linecap, g_from);
        if (got < 0) { free(line); return NULL; }
        if (line[0] != '{') continue;
        if (jlong(line, "id", -1) == id) break;
    }
    if (jfind(line, "error") || !(res = jfind(line, "result"))) {
        free(line);
        return NULL;
    }
    if (strncmp(res + 9, " null", 5) == 0 || strncmp(res + 9, "null", 4) == 0) {
        free(line); /* reference returns NULL (score_size 0 overflow) */
        return NULL;
    }
    a = calloc(1, sizeof *a);
    if (!a) { free(line); return NULL; }
    a->score1 = (uint16_t)jlong(line, "score1", 0);
    a->score2 = (uint16_t)jlong(line, "score2", 0);
    a->ref_begin1 = (int32_t)jlong(line, "ref_begin1", -1);
    a->ref_end1 = (int32_t)jlong(line, "ref_end1", -1);
    a->read_begin1 = (int32_t)jlong(line, "read_begin1", -1);
    a->read_end1 = (int32_t)jlong(line, "read_end1", -1);
    a->ref_end2 = (int32_t)jlong(line, "ref_end2", -1);
    a->flag = (uint16_t)jlong(line, "flag", 0);
    {
        const char *c = jfind(line, "cigar");
        if (c) {
            const char *q = strchr(c, '[');
            int32_t cap = 16, k = 0;
            uint32_t *cig = malloc(cap * sizeof *cig);
            if (q && cig) {
                ++q;
                while (*q && *q != ']') {
                    char *end;
                    unsigned long v = strtoul(q, &end, 10);
                    if (end == q) break;
                    if (k == cap) {
                        uint32_t *t =
                            realloc(cig, (cap *= 2) * sizeof *cig);
                        if (!t) break;
                        cig = t;
                    }
                    cig[k++] = (uint32_t)v;
                    q = end;
                    while (*q == ',' || *q == ' ') ++q;
                }
            }
            if (k > 0) {
                a->cigar = cig;
                a->cigarLen = k;
            } else {
                free(cig);
            }
        }
    }
    free(line);
    return a;
}

void align_destroy(s_align *a) {
    if (!a) return;
    free(a->cigar);
    free(a);
}
