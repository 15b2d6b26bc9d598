// lancet_tpu native I/O plane: streaming BGZF/BAM/BAI reader + faidx-style
// FASTA slicer, C++17, zlib only.
//
// This is the TPU framework's equivalent of the reference's vendored
// native I/O libraries (bamtools-2.5.2 BamReader/BamAlignment and htslib
// faidx; SURVEY.md §2.2 rows I1/I2) — written from the SAM/BAM/BAI specs,
// no reference code. Exposed to Python via a flat extern "C" API consumed
// with ctypes (lancet_tpu/native/__init__.py). Unlike the pure-Python
// io.bam reader (whole-file in memory), this one streams: BAI-guided
// virtual-offset seeks per region, block-at-a-time BGZF inflation, and
// record decode (nibble sequence unpack, qual re-offset) in native code.
//
// Packed record wire format returned by lbam_fetch (little-endian):
//   int32 pos; int32 end;            // 0-based leftmost, half-open end
//   uint16 flag; uint8 mapq; uint8 has_qual;
//   uint16 n_cigar; uint16 l_name;   // name length WITHOUT the nul
//   int32 l_seq; int32 l_tags;
//   char name[l_name];
//   uint32 cigar[n_cigar];           // (len<<4)|op as in BAM
//   char seq[l_seq];                 // ASCII bases
//   char qual[has_qual ? l_seq : 0]; // phred+33 ASCII
//   uint8 tags[l_tags];              // raw BAM aux blob
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// BGZF stream: seekable virtual-offset reader over blocked gzip members.
// ---------------------------------------------------------------------------

struct BgzfStream {
  FILE* f = nullptr;
  int64_t file_size = 0;
  int64_t block_coffset = -1;  // compressed offset of the cached block
  int64_t next_coffset = 0;    // compressed offset of the block after it
  std::vector<uint8_t> block;  // inflated payload of the cached block
  size_t within = 0;           // cursor within the cached block

  bool open(const char* path) {
    f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    file_size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    return true;
  }
  void close() {
    if (f) std::fclose(f);
    f = nullptr;
  }

  // Inflate the BGZF block starting at compressed offset `coffset`.
  bool load_block(int64_t coffset) {
    if (coffset == block_coffset) return true;
    if (coffset >= file_size) return false;
    uint8_t hdr[18];
    std::fseek(f, (long)coffset, SEEK_SET);
    if (std::fread(hdr, 1, 18, f) != 18) return false;
    if (hdr[0] != 0x1f || hdr[1] != 0x8b) return false;
    uint16_t xlen;
    std::memcpy(&xlen, hdr + 10, 2);
    std::vector<uint8_t> extra(xlen);
    std::fseek(f, (long)(coffset + 12), SEEK_SET);
    if (std::fread(extra.data(), 1, xlen, f) != xlen) return false;
    int bsize = -1;
    for (size_t ep = 0; ep + 4 <= extra.size();) {
      uint8_t si1 = extra[ep], si2 = extra[ep + 1];
      uint16_t slen;
      std::memcpy(&slen, extra.data() + ep + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t bs;
        std::memcpy(&bs, extra.data() + ep + 4, 2);
        bsize = (int)bs + 1;
      }
      ep += 4 + slen;
    }
    if (bsize < 0) return false;
    int cdata_len = bsize - 12 - xlen - 8;
    std::vector<uint8_t> cdata(cdata_len);
    std::fseek(f, (long)(coffset + 12 + xlen), SEEK_SET);
    if (std::fread(cdata.data(), 1, cdata_len, f) != (size_t)cdata_len)
      return false;
    uint32_t isize;
    std::fseek(f, (long)(coffset + bsize - 4), SEEK_SET);
    if (std::fread(&isize, 4, 1, f) != 1) return false;
    block.resize(isize);
    if (isize > 0) {
      z_stream zs;
      std::memset(&zs, 0, sizeof zs);
      if (inflateInit2(&zs, -15) != Z_OK) return false;
      zs.next_in = cdata.data();
      zs.avail_in = cdata_len;
      zs.next_out = block.data();
      zs.avail_out = isize;
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END) return false;
    }
    block_coffset = coffset;
    next_coffset = coffset + bsize;
    return true;
  }

  bool seek_virtual(uint64_t voffset) {
    int64_t co = (int64_t)(voffset >> 16);
    size_t wo = (size_t)(voffset & 0xffff);
    if (!load_block(co)) return false;
    if (wo > block.size()) return false;
    within = wo;
    return true;
  }

  uint64_t tell_virtual() const {
    // At a block boundary the canonical voffset points at the next block.
    if (within == block.size() && block_coffset >= 0)
      return (uint64_t)next_coffset << 16;
    return ((uint64_t)block_coffset << 16) | (uint64_t)within;
  }

  bool at_eof() {
    if (within < block.size()) return false;
    return next_coffset >= file_size;
  }

  // Read exactly n bytes across block boundaries; false at clean EOF start.
  bool read(uint8_t* dst, size_t n) {
    size_t got = 0;
    while (got < n) {
      if (within >= block.size()) {
        if (next_coffset >= file_size) return false;
        if (!load_block(next_coffset)) return false;
        within = 0;
        if (block.empty()) continue;  // EOF marker block
      }
      size_t take = std::min(n - got, block.size() - within);
      std::memcpy(dst + got, block.data() + within, take);
      within += take;
      got += take;
    }
    return true;
  }
};

// ---------------------------------------------------------------------------
// BAI index
// ---------------------------------------------------------------------------

struct Chunk {
  uint64_t beg, end;
};

struct RefIndex {
  std::map<uint32_t, std::vector<Chunk>> bins;
  std::vector<uint64_t> ioffsets;  // 16kb linear index
};

constexpr uint32_t kPseudoBin = 37450;

bool load_bai(const std::string& path, std::vector<RefIndex>& out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  auto rd = [&](void* p, size_t n) { return std::fread(p, 1, n, f) == n; };
  char magic[4];
  int32_t n_ref;
  if (!rd(magic, 4) || std::memcmp(magic, "BAI\x01", 4) != 0 ||
      !rd(&n_ref, 4)) {
    std::fclose(f);
    return false;
  }
  out.resize(n_ref);
  for (int r = 0; r < n_ref; ++r) {
    int32_t n_bin;
    if (!rd(&n_bin, 4)) goto fail;
    for (int b = 0; b < n_bin; ++b) {
      uint32_t bin;
      int32_t n_chunk;
      if (!rd(&bin, 4) || !rd(&n_chunk, 4)) goto fail;
      std::vector<Chunk> chunks(n_chunk);
      for (int c = 0; c < n_chunk; ++c)
        if (!rd(&chunks[c].beg, 8) || !rd(&chunks[c].end, 8)) goto fail;
      if (bin != kPseudoBin) out[r].bins[bin] = std::move(chunks);
    }
    int32_t n_intv;
    if (!rd(&n_intv, 4)) goto fail;
    out[r].ioffsets.resize(n_intv);
    for (int i = 0; i < n_intv; ++i)
      if (!rd(&out[r].ioffsets[i], 8)) goto fail;
  }
  std::fclose(f);
  return true;
fail:
  std::fclose(f);
  return false;
}

// Bins overlapping the 0-based half-open interval [beg, end).
void reg2bins(int64_t beg, int64_t end, std::vector<uint32_t>& bins) {
  if (beg >= end) return;
  end -= 1;
  bins.push_back(0);
  for (int64_t k = 1 + (beg >> 26); k <= 1 + (end >> 26); ++k)
    bins.push_back((uint32_t)k);
  for (int64_t k = 9 + (beg >> 23); k <= 9 + (end >> 23); ++k)
    bins.push_back((uint32_t)k);
  for (int64_t k = 73 + (beg >> 20); k <= 73 + (end >> 20); ++k)
    bins.push_back((uint32_t)k);
  for (int64_t k = 585 + (beg >> 17); k <= 585 + (end >> 17); ++k)
    bins.push_back((uint32_t)k);
  for (int64_t k = 4681 + (beg >> 14); k <= 4681 + (end >> 14); ++k)
    bins.push_back((uint32_t)k);
}

// ---------------------------------------------------------------------------
// BAM reader
// ---------------------------------------------------------------------------

const char kSeqNt[17] = "=ACMGRSVTWYHKDBN";

struct BamFile {
  BgzfStream bgzf;
  std::string header_text;
  std::vector<std::string> ref_names;
  std::vector<int64_t> ref_lens;
  std::vector<RefIndex> index;
  bool has_index = false;
  uint64_t first_rec_voffset = 0;
  std::vector<uint8_t> fetch_buf;  // packed result of the last fetch
  int64_t fetch_n = 0;

  bool open(const char* path) {
    if (!bgzf.open(path)) return false;
    uint8_t magic[4];
    if (!bgzf.seek_virtual(0) || !bgzf.read(magic, 4) ||
        std::memcmp(magic, "BAM\x01", 4) != 0)
      return false;
    int32_t l_text;
    if (!bgzf.read((uint8_t*)&l_text, 4)) return false;
    header_text.resize(l_text);
    if (l_text && !bgzf.read((uint8_t*)header_text.data(), l_text))
      return false;
    while (!header_text.empty() && header_text.back() == '\0')
      header_text.pop_back();
    int32_t n_ref;
    if (!bgzf.read((uint8_t*)&n_ref, 4)) return false;
    for (int i = 0; i < n_ref; ++i) {
      int32_t l_name, l_ref;
      if (!bgzf.read((uint8_t*)&l_name, 4)) return false;
      std::string nm(l_name, '\0');
      if (!bgzf.read((uint8_t*)nm.data(), l_name)) return false;
      while (!nm.empty() && nm.back() == '\0') nm.pop_back();
      if (!bgzf.read((uint8_t*)&l_ref, 4)) return false;
      ref_names.push_back(nm);
      ref_lens.push_back(l_ref);
    }
    first_rec_voffset = bgzf.tell_virtual();
    has_index = load_bai(std::string(path) + ".bai", index) &&
                index.size() == ref_names.size();
    return true;
  }
};

// Decode one raw BAM record body into the packed wire format (appended to
// `out`). Returns the record's (refid, pos, end).
struct RecMeta {
  int32_t refid, pos, end;
};

RecMeta pack_record(const std::vector<uint8_t>& rec,
                    std::vector<uint8_t>* out) {
  RecMeta meta{};
  int32_t pos, l_seq;
  uint32_t flag_nc, bin_mq_nl;
  std::memcpy(&meta.refid, rec.data() + 0, 4);
  std::memcpy(&pos, rec.data() + 4, 4);
  std::memcpy(&bin_mq_nl, rec.data() + 8, 4);
  std::memcpy(&flag_nc, rec.data() + 12, 4);
  std::memcpy(&l_seq, rec.data() + 16, 4);
  uint8_t l_read_name = bin_mq_nl & 0xff;
  uint8_t mapq = (bin_mq_nl >> 8) & 0xff;
  uint16_t n_cigar = flag_nc & 0xffff;
  uint16_t flag = flag_nc >> 16;
  size_t q = 32;
  const char* name = (const char*)rec.data() + q;
  uint16_t l_name = l_read_name ? (uint16_t)(l_read_name - 1) : 0;
  q += l_read_name;
  const uint8_t* cigar = rec.data() + q;
  // half-open end position: pos + sum of M/D/N/=/X op lengths
  int64_t span = 0;
  for (int c = 0; c < n_cigar; ++c) {
    uint32_t v;
    std::memcpy(&v, cigar + 4 * c, 4);
    uint32_t op = v & 0xf;
    // ops M(0) D(2) N(3) =(7) X(8) consume reference
    if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) span += v >> 4;
  }
  q += 4ull * n_cigar;
  const uint8_t* seq4 = rec.data() + q;
  q += (l_seq + 1) / 2;
  const uint8_t* qual = rec.data() + q;
  q += l_seq;
  const uint8_t* tags = rec.data() + q;
  int32_t l_tags = (int32_t)(rec.size() - q);
  uint8_t has_qual = (l_seq > 0 && qual[0] != 0xff) ? 1 : 0;
  meta.pos = pos;
  meta.end = (int32_t)(pos + span);

  if (out) {
    size_t base = out->size();
    size_t total = 24 + l_name + 4ull * n_cigar + (size_t)l_seq +
                   (has_qual ? (size_t)l_seq : 0) + (size_t)l_tags;
    out->resize(base + total);
    uint8_t* w = out->data() + base;
    std::memcpy(w + 0, &meta.pos, 4);
    std::memcpy(w + 4, &meta.end, 4);
    std::memcpy(w + 8, &flag, 2);
    w[10] = mapq;
    w[11] = has_qual;
    std::memcpy(w + 12, &n_cigar, 2);
    std::memcpy(w + 14, &l_name, 2);
    std::memcpy(w + 16, &l_seq, 4);
    std::memcpy(w + 20, &l_tags, 4);
    w += 24;
    std::memcpy(w, name, l_name);
    w += l_name;
    std::memcpy(w, cigar, 4ull * n_cigar);
    w += 4ull * n_cigar;
    for (int i = 0; i < l_seq; ++i)
      w[i] = kSeqNt[(i & 1) ? (seq4[i >> 1] & 0xf) : (seq4[i >> 1] >> 4)];
    w += l_seq;
    if (has_qual) {
      for (int i = 0; i < l_seq; ++i) w[i] = (uint8_t)(qual[i] + 33);
      w += l_seq;
    }
    std::memcpy(w, tags, l_tags);
  }
  return meta;
}

bool read_record(BgzfStream& s, std::vector<uint8_t>& rec) {
  int32_t block_size;
  if (!s.read((uint8_t*)&block_size, 4)) return false;
  if (block_size <= 0 || block_size > (1 << 28)) return false;
  rec.resize(block_size);
  return s.read(rec.data(), block_size);
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

void* lbam_open(const char* path) {
  auto* b = new BamFile();
  if (!b->open(path)) {
    b->bgzf.close();
    delete b;
    return nullptr;
  }
  return b;
}

void lbam_close(void* h) {
  auto* b = (BamFile*)h;
  b->bgzf.close();
  delete b;
}

const char* lbam_header_text(void* h) {
  return ((BamFile*)h)->header_text.c_str();
}

int lbam_nrefs(void* h) { return (int)((BamFile*)h)->ref_names.size(); }

const char* lbam_ref_name(void* h, int i) {
  return ((BamFile*)h)->ref_names[i].c_str();
}

long lbam_ref_len(void* h, int i) {
  return (long)((BamFile*)h)->ref_lens[i];
}

int lbam_has_index(void* h) { return ((BamFile*)h)->has_index ? 1 : 0; }

// Fetch records on refid with pos <= end && end_position >= beg
// (0-based inclusive [beg, end]; same superset contract as the Python
// reader: containment filtering is the caller's job, mirroring the
// reference's SetRegion + in-loop checks, Microassembler.cc:498-500).
// Returns a malloc'd packed buffer; *out_n records, *out_size bytes.
uint8_t* lbam_fetch(void* h, int refid, long beg, long end, long* out_n,
                    long* out_size) {
  auto* b = (BamFile*)h;
  b->fetch_buf.clear();
  b->fetch_n = 0;
  std::vector<Chunk> chunks;
  if (b->has_index && refid >= 0 && refid < (int)b->index.size()) {
    const RefIndex& ri = b->index[refid];
    uint64_t min_off = 0;
    size_t intv = (size_t)(beg >> 14);
    if (intv < ri.ioffsets.size()) min_off = ri.ioffsets[intv];
    std::vector<uint32_t> bins;
    reg2bins(beg, end + 1, bins);
    for (uint32_t bin : bins) {
      auto it = ri.bins.find(bin);
      if (it == ri.bins.end()) continue;
      for (const Chunk& c : it->second)
        if (c.end > min_off) chunks.push_back(c);
    }
    std::sort(chunks.begin(), chunks.end(),
              [](const Chunk& a, const Chunk& c) { return a.beg < c.beg; });
    // merge overlapping/adjacent chunks
    std::vector<Chunk> merged;
    for (const Chunk& c : chunks) {
      if (!merged.empty() && c.beg <= merged.back().end)
        merged.back().end = std::max(merged.back().end, c.end);
      else
        merged.push_back(c);
    }
    chunks = std::move(merged);
  } else {
    chunks.push_back({b->first_rec_voffset, (uint64_t)b->bgzf.file_size << 16});
  }

  std::vector<uint8_t> rec;
  for (const Chunk& c : chunks) {
    if (!b->bgzf.seek_virtual(c.beg)) continue;
    while (b->bgzf.tell_virtual() < c.end && !b->bgzf.at_eof()) {
      if (!read_record(b->bgzf, rec)) break;
      RecMeta m = pack_record(rec, nullptr);
      if (m.refid != refid) {
        if (b->has_index) continue;  // chunked: shouldn't happen, skip
        if (m.refid > refid) break;  // coordinate-sorted full scan
        continue;
      }
      if (m.pos > end) break;  // sorted within chunk run
      if (m.end >= beg) {
        pack_record(rec, &b->fetch_buf);
        b->fetch_n++;
      }
    }
  }
  *out_n = b->fetch_n;
  *out_size = (long)b->fetch_buf.size();
  if (b->fetch_buf.empty()) return nullptr;
  auto* out = (uint8_t*)std::malloc(b->fetch_buf.size());
  std::memcpy(out, b->fetch_buf.data(), b->fetch_buf.size());
  return out;
}

// First record in the file (packed), for header/tag probes.
uint8_t* lbam_first(void* h, long* out_n, long* out_size) {
  auto* b = (BamFile*)h;
  *out_n = 0;
  *out_size = 0;
  std::vector<uint8_t> rec;
  if (!b->bgzf.seek_virtual(b->first_rec_voffset)) return nullptr;
  if (b->bgzf.at_eof() || !read_record(b->bgzf, rec)) return nullptr;
  std::vector<uint8_t> buf;
  pack_record(rec, &buf);
  *out_n = 1;
  *out_size = (long)buf.size();
  auto* out = (uint8_t*)std::malloc(buf.size());
  std::memcpy(out, buf.data(), buf.size());
  return out;
}

void lbam_free(uint8_t* p) { std::free(p); }

// ---------------------------------------------------------------------------
// FASTA + .fai
// ---------------------------------------------------------------------------

struct FaEntry {
  std::string name;
  int64_t length, offset, linebases, linewidth;
};

struct FaFile {
  FILE* f = nullptr;
  std::vector<FaEntry> entries;
  std::map<std::string, size_t> by_name;
};

void* lfa_open(const char* path) {
  std::string fai = std::string(path) + ".fai";
  FILE* idx = std::fopen(fai.c_str(), "rb");
  if (!idx) return nullptr;
  auto* fa = new FaFile();
  char line[4096];
  while (std::fgets(line, sizeof line, idx)) {
    FaEntry e;
    char name[2048];
    long long len, off, lb, lw;
    if (std::sscanf(line, "%2047s\t%lld\t%lld\t%lld\t%lld", name, &len, &off,
                    &lb, &lw) == 5) {
      e.name = name;
      e.length = len;
      e.offset = off;
      e.linebases = lb;
      e.linewidth = lw;
      fa->by_name[e.name] = fa->entries.size();
      fa->entries.push_back(e);
    }
  }
  std::fclose(idx);
  fa->f = std::fopen(path, "rb");
  if (!fa->f) {
    delete fa;
    return nullptr;
  }
  return fa;
}

void lfa_close(void* h) {
  auto* fa = (FaFile*)h;
  if (fa->f) std::fclose(fa->f);
  delete fa;
}

long lfa_nseqs(void* h) { return (long)((FaFile*)h)->entries.size(); }

const char* lfa_name(void* h, long i) {
  return ((FaFile*)h)->entries[i].name.c_str();
}

long lfa_len(void* h, long i) {
  return (long)((FaFile*)h)->entries[i].length;
}

// 1-based inclusive fetch, clamped to [1, length]; caller frees.
char* lfa_fetch(void* h, const char* chrom, long start, long end,
                long* out_len) {
  auto* fa = (FaFile*)h;
  *out_len = 0;
  auto it = fa->by_name.find(chrom);
  if (it == fa->by_name.end()) return nullptr;
  const FaEntry& e = fa->entries[it->second];
  if (start < 1) start = 1;
  if (end > e.length) end = (long)e.length;
  if (end < start) return nullptr;
  int64_t s0 = start - 1, e0 = end;
  int64_t byte_start =
      e.offset + (s0 / e.linebases) * e.linewidth + (s0 % e.linebases);
  int64_t byte_end = e.offset + ((e0 - 1) / e.linebases) * e.linewidth +
                     ((e0 - 1) % e.linebases) + 1;
  std::vector<char> raw(byte_end - byte_start);
  std::fseek(fa->f, (long)byte_start, SEEK_SET);
  size_t got = std::fread(raw.data(), 1, raw.size(), fa->f);
  auto* out = (char*)std::malloc(e0 - s0 + 1);
  long n = 0;
  for (size_t i = 0; i < got; ++i)
    if (raw[i] != '\n' && raw[i] != '\r') out[n++] = raw[i];
  out[n] = '\0';
  *out_len = n;
  return out;
}

void lfa_free(char* p) { std::free(p); }

}  // extern "C"
