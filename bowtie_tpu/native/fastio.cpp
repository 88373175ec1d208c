// Native I/O runtime for bowtie_tpu: batched FASTQ/FASTA parsing and
// SAM record formatting.
//
// The reference implements its read-input layer in C++ (pat.h/pat.cpp:
// locked nextBatch + lock-free parse) because dozens of threads contend
// for the parser.  Here the consumer is a single batched device
// pipeline, so the native layer's job is raw parse throughput: turn a
// byte buffer into read records (name/seq/qual offsets + 2-bit codes)
// in one pass, and format SAM lines without Python string overhead.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
// image).  All functions are thread-safe (no global state).
#include <cstdint>
#include <cstring>
#include <cstdio>

extern "C" {

// Parse a FASTQ buffer. For each record i (up to max_reads):
//   name_off[i]/name_len[i]: read name (after '@', up to first space
//                            if trunc_names)
//   seq_off[i]/seq_len[i]:   sequence bytes
//   qual_off[i]:             quality bytes (length == seq_len[i])
//   codes[codes_stride*i+j]: 2-bit-ish code of base j (A0 C1 G2 T3 N4)
// Returns the number of records parsed; *consumed is the number of
// buffer bytes consumed through the last complete record.
int64_t parse_fastq(const uint8_t* buf, int64_t len,
                    int64_t max_reads, int64_t codes_stride,
                    int64_t* name_off, int32_t* name_len,
                    int64_t* seq_off, int32_t* seq_len,
                    int64_t* qual_off,
                    uint8_t* codes,
                    int64_t* consumed)
{
    static uint8_t lut[256];
    static bool lut_init = false;
    if (!lut_init) {
        memset(lut, 4, sizeof(lut));
        lut['A'] = lut['a'] = 0; lut['C'] = lut['c'] = 1;
        lut['G'] = lut['g'] = 2; lut['T'] = lut['t'] = 3;
        lut_init = true;
    }
    int64_t i = 0, n = 0;
    *consumed = 0;
    while (n < max_reads) {
        // skip blank lines
        while (i < len && (buf[i] == '\n' || buf[i] == '\r')) i++;
        if (i >= len || buf[i] != '@') break;
        int64_t rec_start = i;
        i++;                                   // past '@'
        int64_t ns = i;
        while (i < len && buf[i] != '\n') i++;
        if (i >= len) { i = rec_start; break; }
        int64_t ne = i; i++;
        while (ne > ns && buf[ne-1] == '\r') ne--;
        int64_t ss = i;
        while (i < len && buf[i] != '\n') i++;
        if (i >= len) { i = rec_start; break; }
        int64_t se = i; i++;
        while (se > ss && buf[se-1] == '\r') se--;
        if (i >= len || buf[i] != '+') { i = rec_start; break; }
        while (i < len && buf[i] != '\n') i++;
        if (i >= len) { i = rec_start; break; }
        i++;
        int64_t qs = i;
        int64_t want = se - ss;
        if (i + want > len) { i = rec_start; break; }
        i += want;
        // trailing newline(s) handled on next iteration
        name_off[n] = ns; name_len[n] = (int32_t)(ne - ns);
        seq_off[n]  = ss; seq_len[n]  = (int32_t)(se - ss);
        qual_off[n] = qs;
        uint8_t* c = codes + n * codes_stride;
        int64_t m = se - ss;
        if (m > codes_stride) m = codes_stride;
        for (int64_t j = 0; j < m; j++) c[j] = lut[buf[ss + j]];
        n++;
        *consumed = i;
    }
    return n;
}

// Parse a FASTA buffer (whole-buffer; multi-line sequences).
int64_t parse_fasta(const uint8_t* buf, int64_t len,
                    int64_t max_seqs,
                    int64_t* name_off, int32_t* name_len,
                    int64_t* seq_starts,  // filled with concat offsets
                    int64_t* seq_lens,
                    uint8_t* seq_out,     // concatenated codes
                    int64_t seq_out_cap)
{
    static uint8_t lut[256];
    static bool lut_init = false;
    if (!lut_init) {
        memset(lut, 4, sizeof(lut));
        lut['A'] = lut['a'] = 0; lut['C'] = lut['c'] = 1;
        lut['G'] = lut['g'] = 2; lut['T'] = lut['t'] = 3;
        lut_init = true;
    }
    int64_t i = 0, n = 0, out = 0;
    while (i < len && n < max_seqs) {
        while (i < len && buf[i] != '>') i++;
        if (i >= len) break;
        i++;
        int64_t ns = i;
        while (i < len && buf[i] != '\n') i++;
        int64_t ne = i;
        while (ne > ns && buf[ne-1] == '\r') ne--;
        if (i < len) i++;
        name_off[n] = ns; name_len[n] = (int32_t)(ne - ns);
        seq_starts[n] = out;
        while (i < len && buf[i] != '>') {
            uint8_t ch = buf[i++];
            if (ch == '\n' || ch == '\r') continue;
            if (out < seq_out_cap) seq_out[out++] = lut[ch];
        }
        seq_lens[n] = out - seq_starts[n];
        n++;
    }
    return n;
}

// Format one aligned SAM record into out (cap bytes); returns length.
// All string args are (ptr, len) pairs; mm fields describe the MD run.
int64_t format_sam_hit(
    const uint8_t* name, int32_t name_len,
    int32_t flags,
    const uint8_t* rname, int32_t rname_len,
    int64_t pos1,             // 1-based POS
    int32_t mapq,
    int32_t cigar_len,        // emitted as "<len>M"
    const uint8_t* rnext, int32_t rnext_len,
    int64_t pnext1, int64_t tlen,
    const uint8_t* seq, int32_t seq_len,
    const uint8_t* qual, int32_t qual_len,
    int32_t stratum,
    const uint8_t* md, int32_t md_len,
    int32_t nm, int32_t xm,
    uint8_t* out, int64_t cap)
{
    int64_t k = 0;
    #define PUT_BYTES(p, l) do { \
        if (k + (l) > cap) return -1; \
        memcpy(out + k, (p), (l)); k += (l); } while (0)
    #define PUT_CH(c) do { if (k >= cap) return -1; out[k++] = (c); } while (0)
    #define PUT_INT(v) do { \
        char tmp[24]; int tl = snprintf(tmp, sizeof(tmp), "%lld", \
                                        (long long)(v)); \
        PUT_BYTES(tmp, tl); } while (0)
    PUT_BYTES(name, name_len); PUT_CH('\t');
    PUT_INT(flags); PUT_CH('\t');
    PUT_BYTES(rname, rname_len); PUT_CH('\t');
    PUT_INT(pos1); PUT_CH('\t');
    PUT_INT(mapq); PUT_CH('\t');
    PUT_INT(cigar_len); PUT_CH('M'); PUT_CH('\t');
    PUT_BYTES(rnext, rnext_len); PUT_CH('\t');
    PUT_INT(pnext1); PUT_CH('\t');
    PUT_INT(tlen); PUT_CH('\t');
    PUT_BYTES(seq, seq_len); PUT_CH('\t');
    PUT_BYTES(qual, qual_len); PUT_CH('\t');
    PUT_BYTES("XA:i:", 5); PUT_INT(stratum); PUT_CH('\t');
    PUT_BYTES("MD:Z:", 5); PUT_BYTES(md, md_len); PUT_CH('\t');
    PUT_BYTES("NM:i:", 5); PUT_INT(nm);
    if (xm > 0) { PUT_CH('\t'); PUT_BYTES("XM:i:", 5); PUT_INT(xm); }
    PUT_CH('\n');
    #undef PUT_BYTES
    #undef PUT_CH
    #undef PUT_INT
    return k;
}

}  // extern "C"
