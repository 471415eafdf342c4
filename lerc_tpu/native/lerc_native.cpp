// Native runtime helpers for the TPU LERC engine.
//
// The Lerc2 tile stream is a serial byte-cursor format: each micro-block
// record's length depends on its header bytes, so finding record offsets is
// an inherently sequential scan (Lerc2.cpp:1672-1713). Everything AFTER the
// scan (bit-unpack, dequantize, scatter) is embarrassingly parallel and runs
// on the TPU; this scanner runs at ~1 ns/record on the host and feeds the
// device kernels with per-record descriptors.
//
// Build: g++ -O3 -shared -fPIC -o liblerc_native.so lerc_native.cpp
//
// Wire-format constants follow /root/reference/src/LercLib (BitStuffer2,
// Lerc2 ReadTile); implementation is original.

#include <cstdint>
#include <cstring>

extern "C" {

struct RecordDesc {
  int64_t payload_pos;   // absolute byte offset of the bit-stuffed payload (mode 1/4) or raw values (mode 0)
  double offset;         // block offset (zMin) for modes 1/3/4
  int32_t mode;          // 0 raw, 1 stuff, 2 const0, 3 const-offset, 4 stuff-LUT, +8 if diff-encoded
  int32_t num_bits;      // bits per element (mode 1); bits per LUT entry (mode 4)
  int32_t num_elements;  // stuffed element count
  int64_t lut_pos;       // absolute offset of LUT table bytes (mode 4)
  int32_t n_lut;         // LUT size w/o the 0 (mode 4)
  int32_t nbits_lut;     // bits per index (mode 4)
};

// dt codes: 0 char,1 byte,2 short,3 ushort,4 int,5 uint,6 float,7 double
static const int DT_SIZE_TBL[8] = {1, 1, 2, 2, 4, 4, 4, 8};

static inline int dt_used(int dt, int tc) {
  switch (dt) {
    case 2: case 4: return dt - tc;
    case 3: case 5: return dt - 2 * tc;
    case 6: return tc == 0 ? 6 : (tc == 1 ? 2 : 1);
    case 7: return tc == 0 ? 7 : (7 - 2 * tc + 1);
    default: return dt;
  }
}

static inline double read_val(const uint8_t* p, int dtu) {
  switch (dtu) {
    case 0: return (double)(int8_t)p[0];
    case 1: return (double)p[0];
    case 2: { int16_t v; memcpy(&v, p, 2); return v; }
    case 3: { uint16_t v; memcpy(&v, p, 2); return v; }
    case 4: { int32_t v; memcpy(&v, p, 4); return v; }
    case 5: { uint32_t v; memcpy(&v, p, 4); return v; }
    case 6: { float v; memcpy(&v, p, 4); return v; }
    default: { double v; memcpy(&v, p, 8); return v; }
  }
}

static inline int bit_len_u32(uint32_t x) {
  int n = 0;
  while (x >> n) n++;
  return n;
}

// Scan the tile stream starting at buf[0]. Returns bytes consumed, or -1 on
// corruption. cnts[] has the per-BLOCK valid count; records iterate blocks
// outer, depth inner. j0s[] has the per-block j0 for the integrity check.
int64_t lerc_tile_scan(
    const uint8_t* buf, int64_t buf_len,
    const int32_t* cnts, const int32_t* j0s,
    int32_t n_blocks, int32_t n_depth,
    int32_t dt, int32_t version,
    RecordDesc* out) {
  const int size_t_ = DT_SIZE_TBL[dt];
  const bool dt_int = dt < 6;
  int64_t pos = 0;
  const int pattern = version >= 5 ? 14 : 15;
  for (int32_t b = 0; b < n_blocks; b++) {
    const int32_t cnt = cnts[b];
    for (int32_t d = 0; d < n_depth; d++) {
      RecordDesc& r = out[(int64_t)b * n_depth + d];
      if (pos >= buf_len) return -1;
      const uint8_t flag = buf[pos++];
      const bool bdiff = (version >= 5) && (flag & 4);
      if (((flag >> 2) & pattern) != ((j0s[b] >> 3) & pattern)) return -1;
      const int code = flag & 3;
      const int bits67 = flag >> 6;
      r.mode = code + (bdiff ? 8 : 0);
      r.num_bits = 0; r.num_elements = 0; r.offset = 0;
      r.payload_pos = 0; r.lut_pos = 0; r.n_lut = 0; r.nbits_lut = 0;
      if (code == 2) continue;                      // const 0
      if (code == 0) {                              // raw
        r.payload_pos = pos;
        pos += (int64_t)cnt * size_t_;
        if (pos > buf_len) return -1;
        continue;
      }
      // codes 1 and 3: offset in reduced dtype
      const int base_dt = (bdiff && dt_int) ? 4 : dt;
      const int dtu = dt_used(base_dt, bits67);
      const int w = DT_SIZE_TBL[dtu];
      if (pos + w > buf_len) return -1;
      r.offset = read_val(buf + pos, dtu);
      pos += w;
      if (code == 3) { r.mode = 3 + (bdiff ? 8 : 0); continue; }
      // code 1: bit-stuffed section (BitStuffer2::Decode header)
      if (pos >= buf_len) return -1;
      const uint8_t nbb = buf[pos++];
      const int cw_code = nbb >> 6;
      const int cw = cw_code == 0 ? 4 : 3 - cw_code;
      const bool lut = nbb & (1 << 5);
      const int nb = nbb & 31;
      if (pos + cw > buf_len) return -1;
      uint32_t n_elem = 0;
      memcpy(&n_elem, buf + pos, cw);  // little-endian, low bytes
      pos += cw;
      if ((int64_t)n_elem > 64LL * 64) return -1;
      r.num_elements = (int32_t)n_elem;
      r.num_bits = nb;
      if (!lut) {
        r.mode = 1 + (bdiff ? 8 : 0);
        r.payload_pos = pos;
        pos += ((int64_t)n_elem * nb + 7) >> 3;
        if (pos > buf_len) return -1;
      } else {
        if (nb == 0 || pos >= buf_len) return -1;
        const int n_lut = buf[pos++] - 1;
        r.mode = 4 + (bdiff ? 8 : 0);
        r.n_lut = n_lut;
        r.lut_pos = pos;
        pos += ((int64_t)n_lut * nb + 7) >> 3;
        const int nbits_lut = bit_len_u32((uint32_t)n_lut);
        if (nbits_lut == 0) return -1;
        r.nbits_lut = nbits_lut;
        r.payload_pos = pos;
        pos += ((int64_t)n_elem * nbits_lut + 7) >> 3;
        if (pos > buf_len) return -1;
      }
    }
  }
  return pos;
}

// ---------------------------------------------------------------------------
// Fast canonical Huffman decode (serial, host) for the 8-bit image modes.
// codes/lengths indexed by symbol (size 256); stream is MSB-first in
// little-endian uint32 words. Returns bytes consumed (incl. the read-ahead
// pad word) or -1.
int64_t lerc_huffman_decode(
    const uint8_t* buf, int64_t buf_len,
    const int32_t* lengths, const uint32_t* codes, int32_t table_size,
    int32_t n_symbols, int32_t* out_symbols) {
  // build 12-bit LUT + per-length first-code tables
  int max_len = 0;
  for (int i = 0; i < table_size; i++)
    if (lengths[i] > max_len) max_len = lengths[i];
  if (max_len <= 0 || max_len > 32) return -1;
  const int lut_bits = max_len < 12 ? max_len : 12;
  const int lut_size = 1 << lut_bits;
  int16_t* lut_len = new int16_t[lut_size]();
  int16_t* lut_sym = new int16_t[lut_size];
  // long-code tables: for each length, first code and symbol list
  uint32_t first_code[33] = {0};
  int32_t first_rank[33];
  int32_t count_len[33] = {0};
  for (int i = 0; i < 33; i++) first_rank[i] = -1;
  // canonical order: length desc, index asc -> ranks
  int32_t* rank_sym = new int32_t[table_size];
  {
    int rank = 0;
    for (int len = max_len; len >= 1; len--) {
      for (int i = 0; i < table_size; i++) {
        if (lengths[i] == len) {
          if (first_rank[len] < 0) { first_rank[len] = rank; first_code[len] = codes[i]; }
          count_len[len]++;
          rank_sym[rank++] = i;
        }
      }
    }
  }
  for (int i = 0; i < table_size; i++) {
    const int len = lengths[i];
    if (len > 0 && len <= lut_bits) {
      const uint32_t base = codes[i] << (lut_bits - len);
      const uint32_t span = 1u << (lut_bits - len);
      for (uint32_t k = 0; k < span; k++) {
        lut_len[base + k] = (int16_t)len;
        lut_sym[base + k] = (int16_t)i;
      }
    }
  }
  // bit cursor
  int64_t bitpos = 0;
  const int64_t total_bits = (buf_len / 4) * 32;
  auto read_window = [&](int64_t p, int n) -> uint32_t {
    // read n (<=32) bits MSB-first starting at bit p over LE uint32 words
    uint32_t acc = 0;
    int64_t word = p >> 5;
    int off = (int)(p & 31);
    uint32_t w0, w1 = 0;
    memcpy(&w0, buf + word * 4, 4);
    if ((word + 2) * 4 <= buf_len) memcpy(&w1, buf + (word + 1) * 4, 4);
    uint64_t both = ((uint64_t)w0 << 32) | w1;
    acc = (uint32_t)((both << off) >> (64 - n));
    return acc;
  };
  bool ok = true;
  for (int32_t s = 0; s < n_symbols; s++) {
    if (bitpos + lut_bits > total_bits) { ok = false; break; }
    const uint32_t win = read_window(bitpos, lut_bits);
    int len = lut_len[win];
    if (len > 0) {
      out_symbols[s] = lut_sym[win];
      bitpos += len;
      continue;
    }
    // long code
    uint32_t code = win;
    len = lut_bits;
    bool found = false;
    while (len < max_len) {
      len++;
      code = read_window(bitpos, len);
      if (first_rank[len] >= 0) {
        const uint32_t fc = first_code[len];
        if (code >= fc && code < fc + (uint32_t)count_len[len]) {
          out_symbols[s] = rank_sym[first_rank[len] + (code - fc)];
          bitpos += len;
          found = true;
          break;
        }
      }
    }
    if (!found) { ok = false; break; }
  }
  delete[] lut_len; delete[] lut_sym; delete[] rank_sym;
  if (!ok) return -1;
  const int64_t words = (bitpos + 31) / 32;
  return words * 4 + 4;  // + read-ahead pad word
}

// ---------------------------------------------------------------------------
// RLE codec (mask sections). Run-segmentation formulation of the wire's
// greedy rules, mirroring the Python codec in lerc_tpu/codec/rle.py: a
// maximal equal-byte run becomes a repeat segment iff it spans >= 5 bytes
// AND starts with lookahead room (start + 5 < n); bytes between repeat
// segments form one literal stretch; counts chunk at +/-32767; int16
// -32768 terminates the stream. Byte-identical to the reference encoder
// (verified against the oracle in tests/test_format_core.py).
int64_t lerc_rle_compress(const uint8_t* src, int64_t n, uint8_t* dst) {
  if (n <= 0) return -1;
  const int64_t kMinRepeat = 5, kCap = 32767;
  uint8_t* out = dst;
  auto put_count = [&](int16_t c) { memcpy(out, &c, 2); out += 2; };

  int64_t lit_from = 0;  // start of the pending literal stretch
  auto flush_literal = [&](int64_t end) {
    for (int64_t p = lit_from; p < end;) {
      int64_t take = (end - p < kCap) ? end - p : kCap;
      put_count((int16_t)take);
      memcpy(out, src + p, (size_t)take);
      out += take;
      p += take;
    }
  };

  for (int64_t i = 0; i < n;) {
    int64_t run = 1;
    while (i + run < n && src[i + run] == src[i]) run++;
    if (run >= kMinRepeat && i + kMinRepeat < n) {
      flush_literal(i);
      int64_t left = run;
      for (; left > kCap; left -= kCap) {
        put_count((int16_t)-kCap);
        *out++ = src[i];
      }
      put_count((int16_t)-left);
      *out++ = src[i];
      lit_from = i + run;
    }
    i += run;
  }
  flush_literal(n);
  put_count((int16_t)-32768);
  return out - dst;
}

int64_t lerc_rle_decompress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap) {
  int64_t pos = 0, o = 0;
  while (true) {
    if (pos + 2 > n) return -1;
    int16_t c;
    memcpy(&c, src + pos, 2);
    pos += 2;
    if (c == -32768) break;
    if (c > 0) {
      if (pos + c > n || o + c > cap) return -1;
      memcpy(dst + o, src + pos, c);
      pos += c; o += c;
    } else {
      if (pos + 1 > n || o - c > cap) return -1;
      memset(dst + o, src[pos], -c);
      pos += 1; o += -c;
    }
  }
  return o;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fletcher32 checksum, Lerc2 wire flavor: the message is read as big-endian
// 16-bit words (an odd trailing byte acts as b << 8), both running sums are
// seeded with 0xffff, and a single mod-65535 fold happens after every block
// of 359 words (the largest count that cannot overflow 32-bit accumulators)
// plus once at the end. Must be bit-identical to the reference checksum for
// interop; only the word/fold schedule above is wire-relevant.
extern "C" uint32_t lerc_fletcher32(const uint8_t* data, int64_t len) {
  uint64_t lo = 0xffff, hi = 0xffff;
  const int64_t kFoldEvery = 359;
  int64_t n_words = len >> 1;
  for (int64_t w = 0; w < n_words;) {
    int64_t stop = (n_words - w > kFoldEvery) ? w + kFoldEvery : n_words;
    for (; w < stop; ++w) {
      lo += ((uint32_t)data[2 * w] << 8) | data[2 * w + 1];
      hi += lo;
    }
    lo = (lo & 0xffff) + (lo >> 16);
    hi = (hi & 0xffff) + (hi >> 16);
  }
  if (len & 1) {
    lo += (uint32_t)data[len - 1] << 8;
    hi += lo;
  }
  lo = (lo & 0xffff) + (lo >> 16);
  hi = (hi & 0xffff) + (hi >> 16);
  return (uint32_t)((hi << 16) | lo);
}
