// Native one-line FASTQ/FASTA parser: raw (decompressed) buffer ->
// padded code/qual/ascii batches.
//
// The Python per-record loop in io/fastq.py pays ~11 us/record of
// numpy-call overhead (6 small-array ops per read), which made file
// decode the LARGEST cost of the contig and map_pair stages at E. coli
// scale.  This engine walks the buffer once per pass at memory speed and
// writes straight into the caller's preallocated numpy arrays.
//
// Record-selection parity with io/fastq.py:_records_from_lines (itself
// mirroring DBGgraph.cpp:246-258): lines are newline-separated segments
// (a trailing segment without '\n' is a line); a record starts at a line
// whose FIRST byte is the lead char ('@' fastq / '>' fasta) and consumes
// 4 (2) lines unconditionally; a record whose last line would start at
// or beyond the line count is dropped; other lines are skipped.

#include <cstdint>
#include <cstring>

namespace fastqn {

struct Line { const uint8_t* p; int64_t len; };

// iterate lines of [data, data+n): calls fn(line) for each
template <typename F>
static inline void for_lines(const uint8_t* data, int64_t n, F&& fn) {
    int64_t i = 0;
    while (i < n) {
        const uint8_t* nl =
            (const uint8_t*)memchr(data + i, '\n', (size_t)(n - i));
        int64_t end = nl ? (int64_t)(nl - data) : n;
        fn(Line{data + i, end - i});
        i = end + 1;
    }
    // data ending exactly with '\n' contributes NO extra empty line here;
    // python's split("\n") yields one, but an empty trailing line can
    // never start a record and never be consumed as seq/qual of a
    // COMPLETE record... except as the final qual line.  To match
    // python exactly we append the empty line when data ends with '\n'.
    if (n > 0 && data[n - 1] == '\n') fn(Line{data + n, 0});
}

static uint8_t LUT_KMER[256];
static uint8_t LUT_STRICT[256];

static void lut_init() {
    // map_pair.py decodes the two mates of a pair from two threads
    // concurrently (ctypes releases the GIL); a C++11 magic static makes
    // the one-time LUT fill thread-safe (guard initialization is
    // synchronized by the runtime).
    static const bool done = [] {
        memset(LUT_KMER, 0, 256);          // N/n and unknown -> 0
        memset(LUT_STRICT, 4, 256);        // N/n and unknown -> 4
        const char* b = "AaCcGgTt";
        for (int i = 0; i < 8; i++) {
            LUT_KMER[(uint8_t)b[i]] = (uint8_t)(i / 2);
            LUT_STRICT[(uint8_t)b[i]] = (uint8_t)(i / 2);
        }
        return true;
    }();
    (void)done;
}

}  // namespace fastqn

extern "C" {

// Pass 1: count records and the max sequence length.
void fastq_scan(const uint8_t* data, int64_t n, int fq,
                int64_t* out_n_records, int64_t* out_max_len) {
    using namespace fastqn;
    uint8_t lead = fq ? '@' : '>';
    int span = fq ? 4 : 2;
    // collect lines lazily: we need lookahead, so buffer line descriptors
    // in a small ring is awkward — instead do a two-scan approach: first
    // count lines and store nothing; simplest correct approach: walk with
    // an explicit index over an offsets pass.  For typical files the
    // extra pass is cheap (memchr at ~GB/s).
    int64_t n_lines = 0;
    for_lines(data, n, [&](Line) { n_lines++; });
    int64_t rec = 0, maxlen = 0;
    int64_t li = 0;      // current line index
    int64_t skip = 0;    // lines still to consume for current record
    int64_t seq_at = -1; // line index of pending record's seq line
    for_lines(data, n, [&](Line L) {
        if (skip > 0) {
            if (li == seq_at && L.len > maxlen) maxlen = L.len;
            skip--;
        } else if (L.len > 0 && L.p[0] == lead) {
            if (li + span - 1 < n_lines) {
                rec++;
                seq_at = li + 1;
                skip = span - 1;
            }
        }
        li++;
    });
    *out_n_records = rec;
    *out_max_len = maxlen;
}

// Pass 2: fill caller-allocated arrays.
//   codes  [n_records, Lmax] u8   (pad 4)
//   quals  [n_records, Lmax] u8   (pad 0) — may be null
//   ascii  [n_records, Lmax] u8   (pad 0) — may be null
//   lengths[n_records] i32        = min(seq_len, Lmax)
//   head_off/head_len [n_records] i64 byte ranges of the header lines
void fastq_fill(const uint8_t* data, int64_t n, int fq, int64_t Lmax,
                int strict_n, uint8_t* codes, uint8_t* quals,
                uint8_t* ascii_arr, int32_t* lengths, int64_t* head_off,
                int64_t* head_len) {
    using namespace fastqn;
    lut_init();
    const uint8_t* lut = strict_n ? LUT_STRICT : LUT_KMER;
    uint8_t lead = fq ? '@' : '>';
    int span = fq ? 4 : 2;
    int64_t n_lines = 0;
    for_lines(data, n, [&](Line) { n_lines++; });
    int64_t rec = 0;
    int64_t li = 0;
    int64_t skip = 0;
    int64_t seq_at = -1, qual_at = -1;
    for_lines(data, n, [&](Line L) {
        if (skip > 0) {
            if (li == seq_at) {
                int64_t len = L.len < Lmax ? L.len : Lmax;
                lengths[rec - 1] = (int32_t)len;
                uint8_t* crow = codes + (rec - 1) * Lmax;
                for (int64_t j = 0; j < len; j++) crow[j] = lut[L.p[j]];
                if (len < Lmax) memset(crow + len, 4, (size_t)(Lmax - len));
                if (ascii_arr) {
                    uint8_t* arow = ascii_arr + (rec - 1) * Lmax;
                    memcpy(arow, L.p, (size_t)len);
                    if (len < Lmax)
                        memset(arow + len, 0, (size_t)(Lmax - len));
                }
            } else if (li == qual_at && quals) {
                // python: qarr[i, :min(len(q), L)] = q; rest stays 0;
                // an EMPTY qual line leaves the row zero ("if q:")
                int64_t L_seq = lengths[rec - 1];
                int64_t len = L.len < L_seq ? L.len : L_seq;
                uint8_t* qrow = quals + (rec - 1) * Lmax;
                memcpy(qrow, L.p, (size_t)len);
                if (len < Lmax) memset(qrow + len, 0, (size_t)(Lmax - len));
            }
            skip--;
        } else if (L.len > 0 && L.p[0] == lead) {
            if (li + span - 1 < n_lines) {
                head_off[rec] = (int64_t)(L.p - data);
                head_len[rec] = L.len;
                rec++;
                seq_at = li + 1;
                qual_at = fq ? li + 3 : -1;
                skip = span - 1;
            }
        }
        li++;
    });
}

}  // extern "C"
