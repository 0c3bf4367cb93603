// Buffered FASTA/FASTQ reader with kseq-compatible record semantics
// (behavioral spec: /root/reference/src/kseq.h:139-221 — skip bytes until a
// '>'/'@' line start; name to first whitespace, comment is the line rest;
// sequence lines until '>'/'@'/'+' at line start; '+' opens a quality block
// read until the quality length reaches the sequence length).  Gzip input is
// handled through zlib like the reference's KSEQ_INIT(gzFile, gzread).
//
// Batch-oriented C ABI: records stream into one arena per batch so Python
// pays one ctypes round-trip per thousands of records.

#include <zlib.h>

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
    gzFile gz = nullptr;
    std::string buf;       // current line buffer
    bool has_pending = false;
    std::string pending;   // header line carried over ('>' or '@' line)
    bool eof = false;

    // batch arena
    std::string arena;                 // name\0comment\0seq\0qual\0 packed
    std::vector<int64_t> offsets;      // 8 per record: off/len x 4 fields
    int64_t n_records = 0;

    bool getline_raw(std::string& out) {
        out.clear();
        char tmp[65536];
        for (;;) {
            if (gzgets(gz, tmp, sizeof(tmp)) == Z_NULL) {
                return !out.empty();
            }
            size_t got = std::strlen(tmp);
            out.append(tmp, got);
            if (!out.empty() && out.back() == '\n') {
                out.pop_back();
                if (!out.empty() && out.back() == '\r') out.pop_back();
                return true;
            }
        }
    }
};

void push_field(Reader* r, const std::string& s) {
    r->offsets.push_back(int64_t(r->arena.size()));
    r->offsets.push_back(int64_t(s.size()));
    r->arena.append(s);
}

// read one record into the arena; returns false at EOF
bool next_record(Reader* r) {
    std::string line;
    if (!r->has_pending) {
        for (;;) {
            if (!r->getline_raw(line)) return false;
            if (!line.empty() && (line[0] == '>' || line[0] == '@')) break;
        }
    } else {
        line = r->pending;
        r->has_pending = false;
    }
    // header
    std::string name, comment;
    size_t ws = 1;
    while (ws < line.size() && !std::isspace((unsigned char)line[ws])) ++ws;
    name = line.substr(1, ws - 1);
    size_t cs = ws;
    while (cs < line.size() && std::isspace((unsigned char)line[cs])) ++cs;
    comment = line.substr(cs);

    std::string seq, qual;
    bool saw_plus = false;
    for (;;) {
        if (!r->getline_raw(line)) break;
        if (!line.empty() && (line[0] == '>' || line[0] == '@')) {
            r->pending = line;
            r->has_pending = true;
            break;
        }
        if (!line.empty() && line[0] == '+') {
            saw_plus = true;
            break;
        }
        seq += line;
    }
    if (saw_plus) {
        while (qual.size() < seq.size()) {
            if (!r->getline_raw(line)) break;
            qual += line;
        }
    }
    push_field(r, name);
    push_field(r, comment);
    push_field(r, seq);
    if (saw_plus) {
        push_field(r, qual);
    } else {
        r->offsets.push_back(-1);  // qual absent marker
        r->offsets.push_back(0);
    }
    ++r->n_records;
    return true;
}

}  // namespace

extern "C" {

void* sswtpu_fastx_open(const char* path) {
    gzFile gz = gzopen(path, "rb");
    if (!gz) return nullptr;
    gzbuffer(gz, 1 << 20);
    Reader* r = new Reader();
    r->gz = gz;
    return r;
}

// Parse up to max_records; returns number parsed (0 = EOF).  The arena and
// offsets stay valid until the next call on this handle.
int64_t sswtpu_fastx_batch(void* h, int64_t max_records) {
    Reader* r = static_cast<Reader*>(h);
    r->arena.clear();
    r->offsets.clear();
    r->n_records = 0;
    while (r->n_records < max_records) {
        if (!next_record(r)) break;
    }
    return r->n_records;
}

const char* sswtpu_fastx_arena(void* h) {
    return static_cast<Reader*>(h)->arena.data();
}

int64_t sswtpu_fastx_arena_size(void* h) {
    return int64_t(static_cast<Reader*>(h)->arena.size());
}

const int64_t* sswtpu_fastx_offsets(void* h) {
    return static_cast<Reader*>(h)->offsets.data();
}

void sswtpu_fastx_close(void* h) {
    Reader* r = static_cast<Reader*>(h);
    if (r->gz) gzclose(r->gz);
    delete r;
}

}  // extern "C"
