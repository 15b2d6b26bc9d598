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

// ---------------------------------------------------------------------------
// Colored-DBG build kernel (host compute plane).
//
// Native equivalent of engine/fastbuild.py's numpy passes (which themselves
// replace the reference's per-character k-mer stream, Graph.cc:119-349):
// canonical-mer grouping, per-node coverage / min-quality counters, status
// colors, first-occurrence creation order, directed edge list ordered by
// first event time, the mate-overlap dedup replay (std::binary_search over
// push-ordered name vectors — here run natively, exactly the reference's
// call, Graph.cc:232-317 / Node.cc:638-671), reference-mer membership, and
// the fused removeLowCov prune decision (Graph.cc:2790-2827).
//
// Input is the concatenated post-trim read bytes/qualities with K+1-byte
// 0xFF gaps (same layout fastbuild builds); outputs are flat arrays the
// Python side materializes into Node objects. Equality with the numpy path
// (and transitively the oracle engine) is asserted by tests.
// ---------------------------------------------------------------------------

#include <string_view>
#include <unordered_map>
#include <unordered_set>

namespace lgb {

struct Out {
  int64_t n_nodes = 0, n_edges = 0;
  uint8_t* mers = nullptr;      // n_nodes*K canonical bytes, creation order
  int32_t* cov = nullptr;       // 4*n_nodes: fwd_t, rev_t, fwd_n, rev_n
  int32_t* mq = nullptr;        // 4*n_nodes*K: mqf_t, mqr_t, mqf_n, mqr_n
  uint8_t* flags = nullptr;     // bit0 tumor, bit1 normal, bit2 in_ref,
                                // bit3 low, bit4..7 seen f/r tumor, f/r normal
  int32_t* mincov_qv = nullptr; // n_nodes
  int32_t* tot_cov = nullptr;   // n_nodes
  int32_t* esrc = nullptr;      // surviving edges, event-time order
  int32_t* edst = nullptr;
  uint8_t* edir = nullptr;      // 0=FF 1=FR 2=RF 3=RR
};

constexpr uint8_t F_TUMOR = 1, F_NORMAL = 2, F_INREF = 4, F_LOW = 8,
                  F_SEENF_T = 16, F_SEENR_T = 32, F_SEENF_N = 64,
                  F_SEENR_N = 128;

struct SvHash {
  size_t operator()(std::string_view s) const noexcept {
    return std::hash<std::string_view>{}(s);
  }
};

inline void comp_table(uint8_t* t) {
  std::memset(t, 0, 256);
  const char* a = "ACGTacgtNn";
  const char* b = "TGCAtgcaNn";
  for (int i = 0; i < 10; ++i) t[(uint8_t)a[i]] = (uint8_t)b[i];
}

}  // namespace lgb

extern "C" {

// Build the window's colored DBG arrays. See Out for the result layout.
// sample: TMR=4 NML=5 (REF pseudo-read = 3); strand: FWD=1 REV=2.
void* lgb_build(const uint8_t* cat, const uint8_t* qcat, int64_t tot,
                int64_t n_reads, const int64_t* starts, const int32_t* lens,
                const int32_t* sample, const int32_t* strand,
                const int32_t* order, const int64_t* name_off,
                const uint8_t* name_blob, int K, int minq, double avgcov,
                int low_cov_threshold, double min_cov_ratio,
                const uint8_t* refseq, int64_t reflen) {
  auto* out = new lgb::Out();
  uint8_t comp[256];
  lgb::comp_table(comp);

  // reverse complement of the whole concatenated stream: the revcomp of the
  // K-window at offset o is rc_cat[tot - o - K .. tot - o).
  std::vector<uint8_t> rc_cat(tot);
  for (int64_t i = 0; i < tot; ++i) rc_cat[i] = comp[cat[tot - 1 - i]];

  // per-mer visit tables ----------------------------------------------------
  int64_t n_mers = 0;
  for (int64_t r = 0; r < n_reads; ++r) n_mers += lens[r] - K + 1;
  std::vector<int32_t> nid(n_mers);        // node id (first-occurrence order)
  std::vector<uint8_t> orif(n_mers);       // canonical orientation forward?
  std::vector<int32_t> vread(n_mers);      // read index
  std::vector<int32_t> vpos(n_mers);       // mer offset within read
  std::vector<const uint8_t*> canon(n_mers);

  // quality prefix: ok(o) == no byte in qcat[o..o+K] below minq (gap bytes
  // are 0, always below, so cross-read windows self-mask)
  std::vector<int32_t> qbad(tot + 1, 0);
  for (int64_t i = 0; i < tot; ++i)
    qbad[i + 1] = qbad[i] + (qcat[i] < minq ? 1 : 0);
  auto pair_ok_at = [&](int64_t o) {
    if (o + K >= tot) return false;
    return qbad[o + K + 1] - qbad[o] == 0;
  };

  std::unordered_map<std::string_view, int32_t, lgb::SvHash> node_of;
  node_of.reserve((size_t)n_mers * 2);
  std::vector<const uint8_t*> rep;  // canonical bytes per node
  rep.reserve(1024);

  int64_t g = 0;
  for (int64_t r = 0; r < n_reads; ++r) {
    const int32_t nm = lens[r] - K + 1;
    const int64_t base = starts[r];
    for (int32_t p = 0; p < nm; ++p, ++g) {
      const int64_t o = base + p;
      const uint8_t* fw = cat + o;
      const uint8_t* rc = rc_cat.data() + (tot - o - K);
      const int c = std::memcmp(fw, rc, K);
      const bool isF = c < 0;  // palindrome (c==0) orients R, like the oracle
      const uint8_t* cn = isF ? fw : rc;
      auto [it, inserted] = node_of.try_emplace(
          std::string_view((const char*)cn, K), (int32_t)rep.size());
      if (inserted) rep.push_back(cn);
      nid[g] = it->second;
      orif[g] = isF;
      vread[g] = (int32_t)r;
      vpos[g] = p;
      canon[g] = cn;
    }
  }
  const int64_t n_nodes = (int64_t)rep.size();

  // mate-overlap dedup replay (paired, non-ref visits only): per pair p
  // (mer p non-last) the reference pushes u then v, probes u iff pos==0,
  // then probes v — std::binary_search over the OTHER mate-order's
  // push-ordered (unsorted) vector.
  std::vector<uint8_t> skip(n_mers, 0);
  {
    std::vector<std::vector<std::string_view>> mate1(n_nodes), mate2(n_nodes);
    bool any_paired = false;
    for (int64_t r = 0; r < n_reads; ++r)
      if (order[r] > 0) { any_paired = true; break; }
    if (any_paired) {
      auto name_of = [&](int32_t r) {
        return std::string_view((const char*)name_blob + name_off[r],
                                (size_t)(name_off[r + 1] - name_off[r]));
      };
      for (int64_t i = 0; i < n_mers; ++i) {
        const int32_t r = vread[i];
        const int32_t o = order[r];
        if (o == 0 || sample[r] == 3) continue;
        const int32_t last = lens[r] - K;  // pos of final mer
        if (vpos[i] == last) continue;     // pairs exist for non-last mers
        const std::string_view nm = name_of(r);
        auto& self_u = (o == 1) ? mate1[nid[i]] : mate2[nid[i]];
        auto& self_v = (o == 1) ? mate1[nid[i + 1]] : mate2[nid[i + 1]];
        self_u.push_back(nm);
        self_v.push_back(nm);
        if (vpos[i] == 0) {
          auto& other = (o == 1) ? mate2[nid[i]] : mate1[nid[i]];
          if (std::binary_search(other.begin(), other.end(), nm)) skip[i] = 1;
        }
        auto& other_v = (o == 1) ? mate2[nid[i + 1]] : mate1[nid[i + 1]];
        if (std::binary_search(other_v.begin(), other_v.end(), nm))
          skip[i + 1] = 1;
      }
    }
  }

  // counters / flags ----------------------------------------------------
  out->n_nodes = n_nodes;
  out->mers = (uint8_t*)std::malloc((size_t)n_nodes * K);
  for (int64_t n = 0; n < n_nodes; ++n)
    std::memcpy(out->mers + n * K, rep[n], K);
  out->cov = (int32_t*)std::calloc((size_t)n_nodes * 4, 4);
  out->mq = (int32_t*)std::calloc((size_t)n_nodes * 4 * K, 4);
  out->flags = (uint8_t*)std::calloc(n_nodes, 1);
  out->mincov_qv = (int32_t*)std::malloc((size_t)n_nodes * 4);
  out->tot_cov = (int32_t*)std::malloc((size_t)n_nodes * 4);
  int32_t* cov = out->cov;
  int32_t* mq = out->mq;
  uint8_t* flags = out->flags;

  for (int64_t i = 0; i < n_mers; ++i) {
    const int32_t r = vread[i];
    const int32_t sm = sample[r];
    if (sm == 3) continue;  // ref pseudo-read: no coverage, no colors
    const int64_t n = nid[i];
    if (sm == 5) flags[n] |= lgb::F_NORMAL;  // unconditional, incl. skipped
    // tumor color: quality-clean (K+1)-window pair, u and v side
    if (sm == 4 && vpos[i] != lens[r] - K) {
      const int64_t o = starts[r] + vpos[i];
      if (pair_ok_at(o)) {
        flags[n] |= lgb::F_TUMOR;
        flags[nid[i + 1]] |= lgb::F_TUMOR;
      }
    }
    if (skip[i]) continue;  // dedup-skipped coverage visit
    const bool fwd = strand[r] == 1;
    const int col = (sm == 4 ? 0 : 2) + (fwd ? 0 : 1);
    cov[n * 4 + col] += 1;
    flags[n] |= (uint8_t)(lgb::F_SEENF_T << col);
    // per-base min-quality counts in canonical orientation
    const int64_t o = starts[r] + vpos[i];
    int32_t* row = mq + ((int64_t)col * n_nodes + n) * K;
    if (orif[i]) {
      const uint8_t* q = qcat + o;
      for (int j = 0; j < K; ++j) row[j] += (q[j] >= minq);
    } else {
      const uint8_t* q = qcat + o + K - 1;
      for (int j = 0; j < K; ++j) row[j] += (q[-j] >= minq);
    }
  }

  // reference-window mer membership (markRefNodes at k-mer stage): the
  // per-k index covers offsets [0, reflen-K) of the *trimmed* window seq
  // (final mer excluded, Ref.cc:51).
  {
    std::vector<uint8_t> rc_ref(reflen);
    for (int64_t i = 0; i < reflen; ++i) rc_ref[i] = comp[refseq[reflen - 1 - i]];
    std::unordered_set<std::string_view, lgb::SvHash> refset;
    const int64_t nref = reflen - K;  // final mer excluded
    for (int64_t i = 0; i < nref; ++i) {
      const uint8_t* fw = refseq + i;
      const uint8_t* rc = rc_ref.data() + (reflen - i - K);
      const uint8_t* cn = std::memcmp(fw, rc, K) < 0 ? fw : rc;
      refset.insert(std::string_view((const char*)cn, K));
    }
    for (int64_t n = 0; n < n_nodes; ++n)
      if (refset.count(std::string_view((const char*)rep[n], K)))
        flags[n] |= lgb::F_INREF;
  }

  // prune decision (removeLowCov semantics fused at k-mer stage) ---------
  std::vector<uint8_t> low(n_nodes, 0);
  for (int64_t n = 0; n < n_nodes; ++n) {
    int32_t mqv = INT32_MAX;
    for (int j = 0; j < K; ++j) {
      int32_t s = 0;
      for (int c = 0; c < 4; ++c) s += mq[((int64_t)c * n_nodes + n) * K + j];
      if (s < mqv) mqv = s;
    }
    const int32_t ft = cov[n * 4 + 0], rt = cov[n * 4 + 1];
    const int32_t fn = cov[n * 4 + 2], rn = cov[n * 4 + 3];
    out->mincov_qv[n] = mqv;
    out->tot_cov[n] = ft + rt + fn + rn;
    if (mqv <= low_cov_threshold || (double)mqv <= min_cov_ratio * avgcov ||
        (ft + rt == 1 && fn + rn == 1)) {
      low[n] = 1;
      flags[n] |= lgb::F_LOW;
    }
  }

  // edges: per pair two directed edges with event times 2p / 2p+1; unique
  // (src,dst,dir) keeps min time; output = survivors sorted by that time
  // (times are globally distinct, so no tie-break is ever consulted).
  {
    std::unordered_map<uint64_t, int64_t> emin;
    emin.reserve((size_t)n_mers * 2);
    for (int64_t i = 0; i < n_mers; ++i) {
      const int32_t r = vread[i];
      if (vpos[i] == lens[r] - K) continue;
      const int64_t u = nid[i], v = nid[i + 1];
      if (low[u] || low[v]) continue;
      const bool uF = orif[i], vF = orif[i + 1];
      const uint8_t fd = uF ? (vF ? 0 : 1) : (vF ? 2 : 3);
      const uint8_t rd = uF ? (vF ? 3 : 1) : (vF ? 2 : 0);
      const uint64_t kf = ((uint64_t)u << 34) | ((uint64_t)v << 2) | fd;
      const uint64_t kr = ((uint64_t)v << 34) | ((uint64_t)u << 2) | rd;
      auto [itf, insf] = emin.try_emplace(kf, 2 * i);
      if (!insf && itf->second > 2 * i) itf->second = 2 * i;
      auto [itr, insr] = emin.try_emplace(kr, 2 * i + 1);
      if (!insr && itr->second > 2 * i + 1) itr->second = 2 * i + 1;
    }
    std::vector<std::pair<int64_t, uint64_t>> es;  // (time, key)
    es.reserve(emin.size());
    for (auto& kv : emin) es.emplace_back(kv.second, kv.first);
    std::sort(es.begin(), es.end());
    out->n_edges = (int64_t)es.size();
    out->esrc = (int32_t*)std::malloc(es.size() * 4);
    out->edst = (int32_t*)std::malloc(es.size() * 4);
    out->edir = (uint8_t*)std::malloc(es.size());
    for (size_t e = 0; e < es.size(); ++e) {
      out->esrc[e] = (int32_t)(es[e].second >> 34);
      out->edst[e] = (int32_t)((es[e].second >> 2) & ((1u << 30) - 1));
      out->edir[e] = (uint8_t)(es[e].second & 3);
    }
  }
  return out;
}

int64_t lgb_n_nodes(void* h) { return ((lgb::Out*)h)->n_nodes; }
int64_t lgb_n_edges(void* h) { return ((lgb::Out*)h)->n_edges; }
const uint8_t* lgb_mers(void* h) { return ((lgb::Out*)h)->mers; }
const int32_t* lgb_cov(void* h) { return ((lgb::Out*)h)->cov; }
const int32_t* lgb_mq(void* h) { return ((lgb::Out*)h)->mq; }
const uint8_t* lgb_flags(void* h) { return ((lgb::Out*)h)->flags; }
const int32_t* lgb_mincov_qv(void* h) { return ((lgb::Out*)h)->mincov_qv; }
const int32_t* lgb_tot_cov(void* h) { return ((lgb::Out*)h)->tot_cov; }
const int32_t* lgb_esrc(void* h) { return ((lgb::Out*)h)->esrc; }
const int32_t* lgb_edst(void* h) { return ((lgb::Out*)h)->edst; }
const uint8_t* lgb_edir(void* h) { return ((lgb::Out*)h)->edir; }

void lgb_result_free(void* h) {
  auto* o = (lgb::Out*)h;
  std::free(o->mers);
  std::free(o->cov);
  std::free(o->mq);
  std::free(o->flags);
  std::free(o->mincov_qv);
  std::free(o->tot_cov);
  std::free(o->esrc);
  std::free(o->edst);
  std::free(o->edir);
  delete o;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Repeat scans (host fallback of the device gate kernels; ref util.cc
// semantics — see engine/seqs.py docstrings for the exact loop bounds).
// ---------------------------------------------------------------------------

extern "C" {

// exact duplicate k-mer among offsets [0, L-k) (final k-mer excluded)
int lsq_is_repeat(const uint8_t* s, int64_t L, int k) {
  const int64_t n_off = L - k;
  if (n_off <= 1) return 0;
  std::unordered_set<std::string_view, lgb::SvHash> seen;
  seen.reserve((size_t)n_off * 2);
  for (int64_t off = 0; off < n_off; ++off)
    if (!seen.insert(std::string_view((const char*)s + off, k)).second)
      return 1;
  return 0;
}

// near-duplicate (k+1)-length window with <= maxmm mismatches between
// pattern offset p and candidate start i > p, both in [0, L-k-1].
// Pigeonhole filter: split the (k+1)-window into maxmm+1 contiguous
// chunks; any pair within the mismatch budget must share at least one
// aligned chunk exactly, so only bucket collisions need verification.
int lsq_is_almost_repeat(const uint8_t* s, int64_t L, int k, int maxmm) {
  const int64_t maxp = L - k - 1;
  if (maxp < 1) return 0;
  const int w = k + 1;
  const int parts = maxmm + 1;
  if (w < parts) {  // degenerate: chunks would be empty; brute force
    for (int64_t p = 0; p <= maxp; ++p)
      for (int64_t i = p + 1; i <= maxp; ++i) {
        int mm = 0;
        for (int j = 0; j < w && mm <= maxmm; ++j) mm += s[p + j] != s[i + j];
        if (mm <= maxmm) return 1;
      }
    return 0;
  }
  auto verify = [&](int64_t p, int64_t i) {
    int mm = 0;
    for (int j = 0; j < w; ++j) {
      mm += s[p + j] != s[i + j];
      if (mm > maxmm) return false;
    }
    return true;
  };
  std::unordered_map<std::string_view, std::vector<int32_t>, lgb::SvHash>
      buckets;
  buckets.reserve((size_t)(maxp + 1) * 2);
  for (int t = 0; t < parts; ++t) {
    const int ot = (int)((int64_t)w * t / parts);
    const int lt = (int)((int64_t)w * (t + 1) / parts) - ot;
    buckets.clear();
    for (int64_t p = 0; p <= maxp; ++p) {
      auto& v = buckets[std::string_view((const char*)s + p + ot, lt)];
      for (int32_t q : v)
        if (verify(q, p)) return 1;
      v.push_back((int32_t)p);
    }
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Full per-k graph pipeline (host compute plane).
//
// Native transliteration of engine/graph.py + node.py + path.py (which are
// themselves the behavior-exact re-expression of the reference's
// Graph.cc/Node.cc/Path.cc): connected components, source/sink anchoring
// with CLIP_REF_ENDS, cycle DFS, unitig compression, low-cov/tip/short-link
// cleanup, graph-path repeat gate, and the Edmonds-Karp-style best-new-edge
// path cover. The node table is a real libstdc++ unordered_map<string,...>,
// so the reference's iteration order (which decides compression survivor
// choice and coverage-row donation) holds natively instead of via the
// cpp_hash emulation. Output is a batch of PathJob records (path sequence,
// per-base coverage, tumor-span mask, DP-needed flag) plus the reference
// coverage projection and the window-seq trim state; Python runs the
// device-batched alignment and the transcript/variant stages.
//
// Any internal inconsistency throws; lgp_run catches and returns status 3,
// and the caller falls back to the Python engine for that window.
// ---------------------------------------------------------------------------

#include <cmath>
#include <deque>
#include <memory>
#include <stdexcept>

namespace lgp {

using Dir = uint8_t;               // node orientation: 0=F 1=R
using EDir = uint8_t;              // edge dir: 0=FF 1=FR 2=RF 3=RR
constexpr Dir F = 0, R = 1;
inline Dir ed_start(EDir d) { return d <= 1 ? F : R; }
inline Dir ed_dest(EDir d) { return (d == 0 || d == 2) ? F : R; }
inline EDir flipme(EDir d) { constexpr EDir t[4] = {2, 3, 0, 1}; return t[d]; }
inline EDir fliplink(EDir d) { constexpr EDir t[4] = {3, 1, 2, 0}; return t[d]; }

struct GEdge {
  std::string nodeid;
  EDir dir;
  int flag = 0;
};

struct GN {
  std::string id, str;
  std::string status;              // cov_status bytes
  double ctf = 0, ctr = 0, cnf = 0, cnr = 0;
  bool is_ref = false, is_tumor = false, is_normal = false;
  bool is_source = false, is_sink = false, dead = false;
  int component = 0;
  bool touch_ref = false;
  int color = 0;
  int32_t mincov = 0, mincov_qv = 0;
  std::vector<int32_t> covT, covN;  // [L*4]: fwd, rev, mqf, mqr per base
  std::vector<GEdge> edges;

  bool is_special() const { return is_sink || is_source || is_ref; }
  int64_t strlen_() const { return is_special() ? 0 : (int64_t)str.size(); }
  double tot_tmr() const { return ctf + ctr; }
  double tot_nml() const { return cnf + cnr; }
  double tot_cov() const { return ctf + ctr + cnf + cnr; }

  bool is_tandem() const {
    for (const auto& e : edges)
      if (e.nodeid == id) return true;
    return false;
  }
  int get_buddy(Dir ori) const {  // (node.py get_buddy)
    if (is_special()) return -1;
    int ret = -1;
    for (size_t i = 0; i < edges.size(); ++i)
      if (ed_start(edges[i].dir) == ori) {
        if (ret != -1) return -1;
        ret = (int)i;
      }
    if (ret != -1 && edges[ret].nodeid == id) return -1;
    return ret;
  }
  void remove_edge(const std::string& nid, EDir d) {
    for (size_t i = 0; i < edges.size(); ++i)
      if (edges[i].nodeid == nid && edges[i].dir == d) {
        edges.erase(edges.begin() + i);
        return;
      }
    throw std::runtime_error("remove_edge missing");
  }
  void update_edge(const std::string& oldid, EDir olddir,
                   const std::string& newid, EDir newdir) {
    for (auto& e : edges)
      if (e.nodeid == oldid && e.dir == olddir) {
        e.nodeid = newid;
        e.dir = newdir;
        return;
      }
    throw std::runtime_error("update_edge missing");
  }
  void compute_min_cov() {  // over 4-col rows (node.py compute_min_cov)
    const int64_t L = (int64_t)covT.size() / 4;
    if (L == 0) { mincov = mincov_qv = 10000000; return; }
    int32_t mc = INT32_MAX, mq = INT32_MAX;
    for (int64_t i = 0; i < L; ++i) {
      const int32_t tot = covT[i * 4] + covT[i * 4 + 1] + covN[i * 4] +
                          covN[i * 4 + 1];
      const int32_t totq = covT[i * 4 + 2] + covT[i * 4 + 3] +
                           covN[i * 4 + 2] + covN[i * 4 + 3];
      if (tot < mc) mc = tot;
      if (totq < mq) mq = totq;
    }
    mincov = mc;
    mincov_qv = mq;
  }
  bool is_status_cnt_T(int K) const {  // node.py is_status_cnt(ord('T'))
    int64_t n = 0, cnt = 0;
    for (size_t i = K - 1; i < status.size(); ++i) {
      ++n;
      if (status[i] == 'T') ++cnt;
    }
    if (n == 0) return false;
    return (double)cnt / (double)n > 0.8;
  }
};

struct Job {
  std::string pathseq;
  std::vector<int32_t> covT, covN;  // L*4
  std::vector<uint8_t> span;        // L+1 tumor_span
  int64_t src_off = 0, ref_dist = 0;
  int32_t trim5 = -1;
  uint8_t needs_dp = 0;
};

struct Result {
  int status = 0;  // 0 ok, 1 cycle, 2 repeat-in-path, 3 internal error
  int32_t trim5 = -1, trim3 = -1;
  int seq_set = 0;
  int64_t seq_off = 0, seq_len = 0;
  std::vector<int32_t> refcov;  // 4*rawlen: t_fwd, t_rev, n_fwd, n_rev
  std::vector<Job> jobs;
};

struct PPath {  // path.py Path
  std::vector<GN*> nodes;
  std::vector<GEdge*> edges;
  std::vector<EDir> edgedir;
  Dir dir = F;
  int64_t len_m = 0;
  int has_cycle_m = 0;
  int score = 0;
  int flag = 1;
};

struct Graph {
  std::unordered_map<std::string, GN*> nodes;  // the real libstdc++ map
  std::vector<std::unique_ptr<GN>> pool;
  GN* source = nullptr;
  GN* sink = nullptr;
  int K;
  uint8_t comp[256];

  ~Graph() = default;
  GN* alloc(const std::string& id) {
    pool.emplace_back(new GN());
    GN* n = pool.back().get();
    n->id = id;
    n->str = id;
    n->status.assign(id.size(), 'E');
    n->covT.assign(id.size() * 4, 0);
    n->covN.assign(id.size() * 4, 0);
    return n;
  }
  GN* get(const std::string& id) const {
    auto it = nodes.find(id);
    return it == nodes.end() ? nullptr : it->second;
  }
  GN* edge_node(const GEdge& e) const { return get(e.nodeid); }

  std::string rc(const std::string& s) const {
    std::string out(s.size(), 0);
    for (size_t i = 0; i < s.size(); ++i)
      out[i] = (char)comp[(uint8_t)s[s.size() - 1 - i]];
    return out;
  }
  // canonical of an arbitrary-length window (mer.py: palindromes orient R)
  std::pair<std::string, Dir> canonical(const std::string& s) const {
    std::string r = rc(s);
    if (s < r) return {s, F};
    return {std::move(r), R};
  }
};

inline std::vector<int32_t> rev_rows(const std::vector<int32_t>& v) {
  const int64_t L = (int64_t)v.size() / 4;
  std::vector<int32_t> out(v.size());
  for (int64_t i = 0; i < L; ++i)
    for (int c = 0; c < 4; ++c) out[i * 4 + c] = v[(L - 1 - i) * 4 + c];
  return out;
}

inline std::vector<int32_t> rows_from(const std::vector<int32_t>& v,
                                      int64_t row) {
  return std::vector<int32_t>(v.begin() + row * 4, v.end());
}

}  // namespace lgp

namespace lgp {

inline void add_edge(GN* n, const std::string& nid, EDir d) {
  for (auto& e : n->edges)
    if (e.nodeid == nid && e.dir == d) return;
  n->edges.push_back({nid, d, 0});
}

// --- connected components (graph.py mark_connected_components) ------------
int mark_connected_components(Graph& g) {
  for (auto& kv : g.nodes) kv.second->component = 0;
  int comp = 0;
  for (auto& kv : g.nodes) {
    GN* n = kv.second;
    if (n->component != 0) continue;
    ++comp;
    std::deque<GN*> q{n};
    while (!q.empty()) {
      GN* cur = q.front();
      q.pop_front();
      if (cur == nullptr) continue;
      if (cur->component == 0) {
        cur->component = comp;
        for (auto& e : cur->edges) q.push_back(g.edge_node(e));
      }
    }
  }
  return comp;
}

// --- source/sink anchoring (graph.py mark_ref_ends) ------------------------
void mark_ref_ends(Graph& g, int compid, const uint8_t* rawseq,
                   int64_t rawlen, double cov_threshold, Result& res) {
  const int K = g.K;
  res.trim5 = -1;
  res.trim3 = -1;
  g.source = nullptr;
  g.sink = nullptr;
  const std::string raw((const char*)rawseq, (size_t)rawlen);

  GN* source_node = nullptr;
  std::string source_mer;
  Dir source_ori = F;
  int64_t source_offset = -1;
  for (int64_t off = 0; off < rawlen; ++off) {
    auto [cmer, ori] = g.canonical(raw.substr(off, K));
    GN* cand = g.get(cmer);
    if (cand && cand->tot_cov() >= cov_threshold &&
        cand->component == compid) {
      if (source_node == nullptr) {
        source_node = cand;
        source_mer = cmer;
        source_ori = ori;
        source_offset = off;
      } else if (source_node == cand) {
        return;  // ambiguous
      }
    }
  }
  if (!source_node) return;

  GN* sink_node = nullptr;
  std::string sink_mer;
  Dir sink_ori = F;
  int64_t sink_offset = -1;
  for (int64_t off = rawlen - K; off >= 0; --off) {
    auto [cmer, ori] = g.canonical(raw.substr(off, K));
    GN* cand = g.get(cmer);
    if (cand && cand->tot_cov() >= cov_threshold &&
        cand->component == compid) {
      if (sink_node == nullptr) {
        sink_node = cand;
        sink_mer = cmer;
        sink_ori = ori;
        sink_offset = off;
      } else if (sink_node == cand) {
        return;  // ambiguous
      }
    }
  }
  if (!sink_node) return;

  const int64_t ref_dist = sink_offset - source_offset + K;
  sink_offset = rawlen - sink_offset - K;
  res.seq_set = 1;
  res.seq_off = source_offset;
  res.seq_len = ref_dist;
  res.trim5 = (int32_t)source_offset;
  res.trim3 = (int32_t)sink_offset;

  // fake source node + CLIP_REF_ENDS
  GN* newsource = g.alloc("source" + std::to_string(compid));
  newsource->component = compid;
  const EDir sourcedir = (source_ori == F) ? 0 : 1;  // FF : FR
  for (int64_t i = (int64_t)source_node->edges.size() - 1; i >= 0; --i) {
    GEdge e = source_node->edges[i];
    if (ed_start(e.dir) == (source_ori == F ? R : F)) {
      GN* other = g.edge_node(e);
      if (other != nullptr && other != source_node) {
        other->remove_edge(source_node->id, fliplink(e.dir));
        source_node->edges.erase(source_node->edges.begin() + i);
      }
    }
  }
  add_edge(newsource, source_mer, sourcedir);
  newsource->is_source = true;
  add_edge(source_node, newsource->id, fliplink(sourcedir));
  g.source = newsource;
  g.nodes[newsource->id] = newsource;

  GN* newsink = g.alloc("sink" + std::to_string(compid));
  newsink->component = compid;
  const EDir sinkdir = (sink_ori == F) ? 3 : 0;  // RR : FF
  for (int64_t i = (int64_t)sink_node->edges.size() - 1; i >= 0; --i) {
    GEdge e = sink_node->edges[i];
    if (ed_start(e.dir) == sink_ori) {
      GN* other = g.edge_node(e);
      if (other != nullptr && other != sink_node) {
        other->remove_edge(sink_node->id, fliplink(e.dir));
        sink_node->edges.erase(sink_node->edges.begin() + i);
      }
    }
  }
  add_edge(newsink, sink_mer, sinkdir);
  newsink->is_sink = true;
  add_edge(sink_node, newsink->id, fliplink(sinkdir));
  g.sink = newsink;
  g.nodes[newsink->id] = newsink;
}

// --- cycle DFS (graph.py has_cycle / _cycle_dfs) ----------------------------
constexpr int WHITE = 1, GREY = 2, BLACK = 3;

bool cycle_dfs(Graph& g, GN* start, Dir d) {
  struct Frame { GN* node; Dir nd; size_t ei; };
  std::vector<Frame> stack{{start, d, 0}};
  start->color = GREY;
  while (!stack.empty()) {
    Frame& f = stack.back();
    if (f.ei >= f.node->edges.size()) {
      f.node->color = BLACK;
      stack.pop_back();
      continue;
    }
    GEdge& edge = f.node->edges[f.ei];
    f.ei += 1;
    if (ed_start(edge.dir) != f.nd) continue;
    GN* other = g.edge_node(edge);
    if (other == nullptr || other->is_special()) continue;
    if (other->color == GREY) {
      for (auto& fr : stack) fr.node->color = BLACK;
      return true;
    }
    if (other->color == WHITE) {
      other->color = GREY;
      stack.push_back({other, ed_dest(edge.dir), 0});
    }
  }
  return false;
}

bool has_cycle(Graph& g) {
  if (g.source == nullptr || g.sink == nullptr) return false;
  for (auto& kv : g.nodes) {
    if (kv.second->is_special()) continue;
    kv.second->color = WHITE;
  }
  return cycle_dfs(g, g.source, F) || cycle_dfs(g, g.source, R);
}

// --- compression (graph.py compress_node / compress) ------------------------
void clean_dead(Graph& g) {
  std::vector<std::string> dead;
  for (auto& kv : g.nodes)
    if (kv.second->dead) dead.push_back(kv.first);
  std::sort(dead.begin(), dead.end());
  for (auto& k : dead) g.nodes.erase(k);
}

void compress_node(Graph& g, GN* node, Dir d) {
  const int K = g.K;
  std::deque<std::string> str_segs{node->str};
  std::deque<std::vector<int32_t>> cov_segs_t{node->covT};
  std::deque<std::vector<int32_t>> cov_segs_n{node->covN};
  std::vector<std::string> status_tail;
  int64_t cur_len = (int64_t)node->str.size();
  bool merged = false;

  while (true) {
    const int uniqueid = node->get_buddy(d);
    if (uniqueid == -1) break;
    if (node->is_tandem()) break;
    const EDir edir = node->edges[uniqueid].dir;
    const Dir bdir = (edir == 0 || edir == 2) ? R : F;  // FF/RF -> R
    GN* buddy = g.edge_node(node->edges[uniqueid]);
    if (buddy == nullptr || buddy->dead)
      throw std::runtime_error("compress: dead buddy");
    if (buddy->is_tandem()) break;
    const int buniqueid = buddy->get_buddy(bdir);
    if (buniqueid == -1) break;
    if (buddy->edges[buniqueid].nodeid != node->id)
      throw std::runtime_error("compress: buddy back-edge mismatch");

    merged = true;
    const bool dest_r = ed_dest(edir) == R;
    const std::string bstr = dest_r ? g.rc(buddy->str) : buddy->str;
    const std::vector<int32_t> bcov_t =
        dest_r ? rev_rows(buddy->covT) : buddy->covT;
    const std::vector<int32_t> bcov_n =
        dest_r ? rev_rows(buddy->covN) : buddy->covN;

    const int64_t amerlen = cur_len - K + 1;
    const int64_t bmerlen = (int64_t)bstr.size() - K + 1;

    if (d == R) {
      // reversed segment prepends (graph.py dir==R dance)
      str_segs.push_front(g.rc(bstr.substr(K - 1)));
      cov_segs_t.push_front(rev_rows(rows_from(bcov_t, K - 1)));
      cov_segs_n.push_front(rev_rows(rows_from(bcov_n, K - 1)));
    } else {
      str_segs.push_back(bstr.substr(K - 1));
      cov_segs_t.push_back(rows_from(bcov_t, K - 1));
      cov_segs_n.push_back(rows_from(bcov_n, K - 1));
    }
    status_tail.push_back(buddy->status.substr(K - 1));

    const int64_t tot = amerlen + bmerlen;
    node->ctf = (node->ctf * amerlen + buddy->ctf * bmerlen) / tot;
    node->cnf = (node->cnf * amerlen + buddy->cnf * bmerlen) / tot;
    node->ctr = (node->ctr * amerlen + buddy->ctr * bmerlen) / tot;
    node->cnr = (node->cnr * amerlen + buddy->cnr * bmerlen) / tot;

    cur_len = cur_len + (int64_t)bstr.size() - K + 1;

    buddy->dead = true;
    if (buddy->is_ref) node->is_ref = true;
    if (buddy->is_normal) node->is_normal = true;
    if (buddy->is_tumor) node->is_tumor = true;

    node->edges.erase(node->edges.begin() + uniqueid);
    for (size_t i = 0; i < buddy->edges.size(); ++i) {
      if ((int)i == buniqueid) continue;
      const GEdge& be = buddy->edges[i];
      GEdge ne = be;  // copies flag
      if (edir == 1 || edir == 2) ne.dir = flipme(ne.dir);  // FR/RF
      GN* other = g.get(ne.nodeid);
      if (other == nullptr) throw std::runtime_error("compress: null other");
      if (other == buddy) {
        ne.nodeid = node->id;
        node->edges.push_back(ne);
      } else {
        node->edges.push_back(ne);
        other->update_edge(buddy->id, fliplink(be.dir), node->id,
                           fliplink(ne.dir));
      }
    }
  }

  if (merged) {
    node->str.clear();
    for (auto& s : str_segs) node->str += s;
    std::vector<int32_t> ct, cn;
    for (auto& v : cov_segs_t) ct.insert(ct.end(), v.begin(), v.end());
    for (auto& v : cov_segs_n) cn.insert(cn.end(), v.begin(), v.end());
    node->covT = std::move(ct);
    node->covN = std::move(cn);
    for (auto& s : status_tail) node->status += s;
    node->compute_min_cov();
  }
}

void compress(Graph& g, int compid) {
  for (auto& kv : g.nodes) {
    GN* n = kv.second;
    if (n->component == compid) {
      if (n->dead || n->is_special()) continue;
      compress_node(g, n, F);
      compress_node(g, n, R);
    }
  }
  clean_dead(g);
}

// --- removals (graph.py remove_node / remove_low_cov / tips / links) -------
void remove_node(Graph& g, GN* node) {
  if (node->dead) throw std::runtime_error("remove_node: already dead");
  node->dead = true;
  for (auto& e : node->edges) {
    GN* nn = g.edge_node(e);
    if (nn != nullptr && nn != node) nn->remove_edge(node->id, fliplink(e.dir));
  }
}

void remove_low_cov(Graph& g, bool docompression, int compid, double avgcov,
                    int low_cov_threshold, double min_cov_ratio) {
  for (auto& kv : g.nodes) {
    GN* node = kv.second;
    if (node->component != compid || node->dead) continue;
    if (node->is_special()) continue;
    if (node->mincov_qv <= low_cov_threshold ||
        (double)node->mincov_qv <= min_cov_ratio * avgcov ||
        (node->tot_tmr() == 1 && node->tot_nml() == 1)) {
      remove_node(g, node);
    }
  }
  clean_dead(g);
  if (docompression) compress(g, compid);
}

void remove_tips(Graph& g, int compid, int max_tip_len) {
  while (true) {
    int tips = 0;
    for (auto& kv : g.nodes) {
      GN* cur = kv.second;
      if (cur->component != compid || cur->dead) continue;
      if (cur->is_special()) continue;
      const int64_t deg = (int64_t)cur->edges.size();
      const int64_t ln = cur->strlen_() - g.K + 1;
      if (deg <= 1 && ln < max_tip_len) {
        remove_node(g, cur);
        ++tips;
      }
    }
    if (tips)
      compress(g, compid);
    else
      break;
  }
}

// find_tandems (engine/seqs.py; remove_short_links needs only the length)
int64_t find_tandems_len(const std::string& seq, int max_unit_len,
                         int min_report_units, int min_report_len,
                         int dist_from_str, int64_t pos) {
  const int64_t L = (int64_t)seq.size();
  int64_t out_len = 0;
  std::vector<std::vector<int64_t>> offsets(max_unit_len + 1);
  for (int m = 0; m <= max_unit_len; ++m) {
    offsets[m].assign(max_unit_len + 2, 0);
    for (int p = 0; p < m; ++p) offsets[m][p] = p;
  }
  for (int64_t i = 0; i < L; ++i) {
    for (int merlen = 1; merlen <= max_unit_len; ++merlen) {
      const int64_t phase = i % merlen;
      const int64_t offset = offsets[merlen][phase];
      int64_t j = 0;
      while (j < merlen && i + j < L && seq[i + j] == seq[offset + j]) ++j;
      if (j != merlen || (i + j + 1 == L)) {
        const char left = offset > 0 ? seq[offset - 1] : '\0';
        if (left != seq[offset + merlen - 1]) {
          if ((i - offset) / merlen >= min_report_units &&
              i - offset >= min_report_len) {
            int64_t ml = 1;
            while (ml < merlen) {
              const int64_t units = (i - offset + j) / ml;
              bool allmatch = true;
              for (int64_t index = 1; index < units; ++index)
                if (seq.compare(offset, ml, seq, offset + index * ml, ml) !=
                    0) {
                  allmatch = false;
                  break;
                }
              if (!allmatch)
                ++ml;
              else
                break;
            }
            if (ml == merlen) {
              const int64_t start = offset, end = i + j;
              if (pos >= start - dist_from_str && pos <= end + dist_from_str)
                out_len = end - start;
            }
          }
        }
        offsets[merlen][phase] = i;
      }
    }
  }
  return out_len;
}

void remove_short_links(Graph& g, int compid, int max_link_len, double avgcov,
                        int max_unit_len, int min_report_units,
                        int min_report_len, int dist_from_str) {
  int links = 0;
  const double thr = std::floor(std::sqrt(avgcov));
  for (auto& kv : g.nodes) {
    GN* cur = kv.second;
    if (cur->component != compid || cur->dead) continue;
    if (cur->is_special()) continue;
    const int64_t deg = (int64_t)cur->edges.size();
    const int64_t ln = (int64_t)cur->str.size() - g.K + 1;
    if (deg >= 2 && ln < max_link_len && (double)cur->mincov <= thr) {
      const int64_t L = find_tandems_len(cur->str, max_unit_len,
                                         min_report_units, min_report_len,
                                         dist_from_str, g.K - 1);
      if (L == 0) {
        remove_node(g, cur);
        ++links;
      }
    }
  }
  if (links) compress(g, compid);
}

}  // namespace lgp

namespace lgp {

// --- path enumeration (graph.py bfs / eka) ----------------------------------
std::unique_ptr<PPath> bfs(Graph& g, GN* source, GN* sink, Dir d,
                           int64_t reflen, int64_t dfs_limit,
                           int max_indel_len) {
  int64_t visit = 0;
  int complete = 0;
  std::deque<PPath> q;
  PPath p0;
  p0.nodes.push_back(source);
  p0.dir = d;
  p0.len_m = g.K;
  std::unique_ptr<PPath> best;
  q.push_back(std::move(p0));
  while (!q.empty()) {
    ++visit;
    if (dfs_limit && visit > dfs_limit) break;
    PPath path = std::move(q.front());
    q.pop_front();
    GN* cur = path.nodes.back();
    if (cur == sink && path.flag == 0) {
      ++complete;
      if (!best || path.score > best->score) best.reset(new PPath(path));
    } else if (path.len_m > reflen + max_indel_len) {
      // too long
    } else {
      for (auto& edge : cur->edges) {
        if (ed_start(edge.dir) != path.dir) continue;
        GN* other = g.edge_node(edge);
        if (other == nullptr) throw std::runtime_error("bfs: null edge node");
        if (!path.has_cycle_m) {
          for (GN* n : path.nodes)
            if (n == other) {
              path.has_cycle_m = 1;
              break;
            }
        }
        PPath np(path);
        np.nodes.push_back(other);
        np.edges.push_back(&edge);
        np.edgedir.push_back(edge.dir);
        np.dir = ed_dest(edge.dir);
        np.len_m = path.len_m + other->strlen_() - g.K + 1;
        np.flag = path.flag * edge.flag;
        if (edge.flag == 0) np.score = path.score + 1;
        q.push_back(std::move(np));
      }
    }
  }
  if (complete == 0) best.reset();
  return best;
}

// --- path -> sequence / coverage / span (path.py, extract.py) ---------------
std::string path_str(Graph& g, const PPath& p) {
  std::string ret;
  int64_t retlen = 0;
  Dir d = ed_start(p.edgedir[0]);
  for (size_t i = 0; i < p.nodes.size(); ++i) {
    GN* n = p.nodes[i];
    std::string nstr = n->str;
    if (d == R) nstr = g.rc(nstr);
    if (!n->is_special()) {
      if (retlen > 0) {
        ret += nstr.substr(g.K - 1);
        retlen += (int64_t)nstr.size() - g.K + 1;
      } else {
        ret += nstr;
        retlen = (int64_t)nstr.size();
      }
    }
    if (i < p.edgedir.size()) d = ed_dest(p.edgedir[i]);
  }
  return ret;
}

std::vector<int32_t> path_cov(Graph& g, const PPath& p, bool tumor) {
  std::vector<int32_t> out;
  int64_t total = 0;
  Dir d = ed_start(p.edgedir[0]);
  for (size_t i = 0; i < p.nodes.size(); ++i) {
    GN* n = p.nodes[i];
    const std::vector<int32_t>& C = tumor ? n->covT : n->covN;
    std::vector<int32_t> nc = (d == R) ? rev_rows(C) : C;
    if (!n->is_special()) {
      if (total == 0) {
        out.insert(out.end(), nc.begin(), nc.end());
        total = (int64_t)nc.size() / 4;
      } else {
        out.insert(out.end(), nc.begin() + (g.K - 1) * 4, nc.end());
        total += (int64_t)nc.size() / 4 - (g.K - 1);
      }
    }
    if (i < p.edgedir.size()) d = ed_dest(p.edgedir[i]);
  }
  return out;
}

std::vector<uint8_t> tumor_span(Graph& g, const PPath& p, int64_t L) {
  // extract.py make_path_job: node i covers (hi_{i-1}, hi_i]
  std::vector<uint8_t> span(L + 1, 0);
  int64_t cur = 0, prev_hi = -1;
  for (GN* n : p.nodes) {
    if (n->is_special()) continue;
    const int64_t sp = (int64_t)n->str.size();
    const int64_t hi = cur + sp;
    const int64_t lo = std::max<int64_t>(prev_hi + 1, 0);
    const int64_t hi_c = std::min<int64_t>(hi, L);
    if (lo <= hi_c) {
      if (n->is_status_cnt_T(g.K))
        for (int64_t x = lo; x <= hi_c; ++x) span[x] = 1;
    }
    prev_hi = hi;
    cur += sp - g.K + 1;
    if (prev_hi >= L) break;
  }
  return span;
}

void eka(Graph& g, GN* source, GN* sink, Dir d, const uint8_t* rawseq,
         int64_t reflen, int64_t dfs_limit, int max_indel_len,
         int64_t src_off, int64_t ref_dist, int32_t trim5, Result& res) {
  while (true) {
    auto path = bfs(g, source, sink, d, reflen, dfs_limit, max_indel_len);
    if (!path) break;
    Job j;
    j.pathseq = path_str(g, *path);
    j.covT = path_cov(g, *path, true);
    j.covN = path_cov(g, *path, false);
    j.span = tumor_span(g, *path, (int64_t)j.covN.size() / 4);
    j.src_off = src_off;
    j.ref_dist = ref_dist;
    j.trim5 = trim5;
    // hamming vs the (just-trimmed) ref seq; -1 on length mismatch
    int64_t hd = -1;
    if ((int64_t)j.pathseq.size() == ref_dist) {
      hd = 0;
      for (int64_t i = 0; i < ref_dist; ++i)
        hd += (uint8_t)j.pathseq[i] != rawseq[src_off + i];
    }
    j.needs_dp = (hd == -1 || hd > 5);
    res.jobs.push_back(std::move(j));
    for (GEdge* e : path->edges) e->flag = 1;
  }
}

bool find_repeats_in_graph_paths(Graph& g, int K, int max_mismatch,
                                 int64_t reflen, int64_t dfs_limit,
                                 int max_indel_len) {
  if (g.source == nullptr || g.sink == nullptr) return false;
  bool answer = false;
  std::vector<GEdge*> touched;
  while (true) {
    auto path = bfs(g, g.source, g.sink, F, reflen, dfs_limit, max_indel_len);
    if (!path) break;
    const std::string ps = path_str(g, *path);
    if (lsq_is_almost_repeat((const uint8_t*)ps.data(), (int64_t)ps.size(), K,
                             max_mismatch)) {
      answer = true;
      break;
    }
    for (GEdge* e : path->edges) {
      e->flag = 1;
      touched.push_back(e);
    }
  }
  for (GEdge* e : touched) e->flag = 0;
  return answer;
}

}  // namespace lgp

extern "C" {

// Full per-k pipeline: colored-DBG build (via lgb_build) then components,
// anchoring, cycle gate, compression, cleanup, graph-path repeat gate, and
// the best-new-edge path cover. Returns a Result handle.
void* lgp_run(const uint8_t* cat, const uint8_t* qcat, int64_t tot,
              int64_t n_reads, const int64_t* starts, const int32_t* lens,
              const int32_t* sample, const int32_t* strand,
              const int32_t* order, const int64_t* name_off,
              const uint8_t* name_blob, int K, int minq, double avgcov,
              int low_cov_threshold, double min_cov_ratio,
              const uint8_t* idxseq, int64_t idxlen, const uint8_t* rawseq,
              int64_t rawlen, double cov_threshold, int max_tip_len,
              int max_link_len, int64_t dfs_limit, int max_indel_len,
              int max_mismatch, int max_unit_len, int min_report_units,
              int min_report_len, int dist_from_str) {
  auto* res = new lgp::Result();
  lgb::Out* out = nullptr;
  try {
    out = (lgb::Out*)lgb_build(cat, qcat, tot, n_reads, starts, lens, sample,
                               strand, order, name_off, name_blob, K, minq,
                               avgcov, low_cov_threshold, min_cov_ratio,
                               idxseq, idxlen);
    const int64_t n_nodes = out->n_nodes;

    // reference coverage projection (ref.py compute_coverage, pre-prune
    // node counts; nonzero only where the mer is in the seq-based index)
    res->refcov.assign(4 * rawlen, 0);
    {
      std::unordered_map<std::string_view, int64_t, lgb::SvHash> node_of;
      node_of.reserve((size_t)n_nodes * 2);
      for (int64_t n = 0; n < n_nodes; ++n)
        node_of.emplace(
            std::string_view((const char*)out->mers + n * K, K), n);
      uint8_t comp[256];
      lgb::comp_table(comp);
      std::vector<uint8_t> rc_raw(rawlen);
      for (int64_t i = 0; i < rawlen; ++i)
        rc_raw[i] = comp[rawseq[rawlen - 1 - i]];
      const int64_t n_off = rawlen - K;  // final mer excluded
      for (int64_t i = 0; i < n_off; ++i) {
        const uint8_t* fw = rawseq + i;
        const uint8_t* rc = rc_raw.data() + (rawlen - i - K);
        const uint8_t* cn = std::memcmp(fw, rc, K) < 0 ? fw : rc;
        int32_t vals[4] = {0, 0, 0, 0};
        auto it = node_of.find(std::string_view((const char*)cn, K));
        if (it != node_of.end()) {
          const int64_t n = it->second;
          const uint8_t fl = out->flags[n];
          if (fl & lgb::F_INREF) {
            if (fl & lgb::F_SEENF_T) vals[0] = out->cov[n * 4 + 0];
            if (fl & lgb::F_SEENR_T) vals[1] = out->cov[n * 4 + 1];
            if (fl & lgb::F_SEENF_N) vals[2] = out->cov[n * 4 + 2];
            if (fl & lgb::F_SEENR_N) vals[3] = out->cov[n * 4 + 3];
          }
        }
        if (i == 0) {
          for (int64_t p = 0; p < K && p < rawlen; ++p)
            for (int c = 0; c < 4; ++c) res->refcov[c * rawlen + p] = vals[c];
        } else {
          for (int c = 0; c < 4; ++c)
            res->refcov[c * rawlen + (i + K - 1)] = vals[c];
        }
      }
    }

    // materialize the node map in creation order, then erase low nodes
    // (reference insert-all-then-removeLowCov sequence; bucket layout of
    // the real libstdc++ unordered_map IS the reference's iteration order)
    lgp::Graph g;
    g.K = K;
    lgb::comp_table(g.comp);
    std::vector<lgp::GN*> by_id(n_nodes, nullptr);
    for (int64_t n = 0; n < n_nodes; ++n) {
      const std::string mer((const char*)out->mers + n * K, K);
      const uint8_t fl = out->flags[n];
      if (fl & lgb::F_LOW) {
        g.nodes[mer] = nullptr;
        continue;
      }
      lgp::GN* node = g.alloc(mer);
      node->ctf = out->cov[n * 4 + 0];
      node->ctr = out->cov[n * 4 + 1];
      node->cnf = out->cov[n * 4 + 2];
      node->cnr = out->cov[n * 4 + 3];
      node->is_tumor = fl & lgb::F_TUMOR;
      node->is_normal = fl & lgb::F_NORMAL;
      node->touch_ref = fl & lgb::F_INREF;
      node->mincov = out->tot_cov[n];
      node->mincov_qv = out->mincov_qv[n];
      const char st = (node->is_tumor && node->is_normal) ? 'B'
                      : node->is_tumor                    ? 'T'
                      : node->is_normal                   ? 'N'
                                                          : 'E';
      node->status.assign(K, st);
      for (int64_t j = 0; j < K; ++j) {
        node->covT[j * 4 + 0] = out->cov[n * 4 + 0];
        node->covT[j * 4 + 1] = out->cov[n * 4 + 1];
        node->covT[j * 4 + 2] = out->mq[(0 * n_nodes + n) * K + j];
        node->covT[j * 4 + 3] = out->mq[(1 * n_nodes + n) * K + j];
        node->covN[j * 4 + 0] = out->cov[n * 4 + 2];
        node->covN[j * 4 + 1] = out->cov[n * 4 + 3];
        node->covN[j * 4 + 2] = out->mq[(2 * n_nodes + n) * K + j];
        node->covN[j * 4 + 3] = out->mq[(3 * n_nodes + n) * K + j];
      }
      g.nodes[mer] = node;
      by_id[n] = node;
    }
    for (int64_t n = 0; n < n_nodes; ++n)
      if (out->flags[n] & lgb::F_LOW)
        g.nodes.erase(std::string((const char*)out->mers + n * K, K));
    const char* dirs = nullptr;
    (void)dirs;
    for (int64_t e = 0; e < out->n_edges; ++e) {
      lgp::GN* src = by_id[out->esrc[e]];
      if (src == nullptr) throw std::runtime_error("edge from low node");
      src->edges.push_back(
          {std::string((const char*)out->mers + (int64_t)out->edst[e] * K, K),
           (lgp::EDir)out->edir[e], 0});
    }
    lgb_result_free(out);
    out = nullptr;

    // --- per-component stages (micro.py process_graph inner loop) ---------
    const int numcomp = lgp::mark_connected_components(g);
    for (int c = 1; c <= numcomp; ++c) {
      lgp::mark_ref_ends(g, c, rawseq, rawlen, cov_threshold, *res);
      if (lgp::has_cycle(g)) {
        res->status = 1;
        return res;
      }
      lgp::compress(g, c);
      lgp::remove_low_cov(g, true, c, avgcov, low_cov_threshold,
                          min_cov_ratio);
      lgp::remove_tips(g, c, max_tip_len);
      lgp::remove_short_links(g, c, max_link_len, avgcov, max_unit_len,
                              min_report_units, min_report_len,
                              dist_from_str);
      const int64_t reflen = res->seq_set ? res->seq_len : idxlen;
      if (lgp::has_cycle(g)) {
        res->status = 1;
        return res;
      }
      if (lgp::find_repeats_in_graph_paths(g, K, max_mismatch, reflen,
                                           dfs_limit, max_indel_len)) {
        res->status = 2;
        return res;
      }
      if (g.source != nullptr && g.sink != nullptr)
        lgp::eka(g, g.source, g.sink, lgp::F, rawseq, reflen, dfs_limit,
                 max_indel_len, res->seq_off, res->seq_len, res->trim5, *res);
    }
    res->status = 0;
    return res;
  } catch (const std::exception&) {
    if (out) lgb_result_free(out);
    res->status = 3;
    res->jobs.clear();
    return res;
  }
}

int lgp_status(void* h) { return ((lgp::Result*)h)->status; }
int lgp_trim5(void* h) { return ((lgp::Result*)h)->trim5; }
int lgp_trim3(void* h) { return ((lgp::Result*)h)->trim3; }
int lgp_seq_set(void* h) { return ((lgp::Result*)h)->seq_set; }
long lgp_seq_off(void* h) { return (long)((lgp::Result*)h)->seq_off; }
long lgp_seq_len(void* h) { return (long)((lgp::Result*)h)->seq_len; }
const int32_t* lgp_refcov(void* h) { return ((lgp::Result*)h)->refcov.data(); }
long lgp_n_jobs(void* h) { return (long)((lgp::Result*)h)->jobs.size(); }
long lgp_job_len(void* h, long i) {
  return (long)((lgp::Result*)h)->jobs[i].pathseq.size();
}
const char* lgp_job_seq(void* h, long i) {
  return ((lgp::Result*)h)->jobs[i].pathseq.c_str();
}
const int32_t* lgp_job_covT(void* h, long i) {
  return ((lgp::Result*)h)->jobs[i].covT.data();
}
const int32_t* lgp_job_covN(void* h, long i) {
  return ((lgp::Result*)h)->jobs[i].covN.data();
}
const uint8_t* lgp_job_span(void* h, long i) {
  return ((lgp::Result*)h)->jobs[i].span.data();
}
long lgp_job_src_off(void* h, long i) {
  return (long)((lgp::Result*)h)->jobs[i].src_off;
}
long lgp_job_dist(void* h, long i) {
  return (long)((lgp::Result*)h)->jobs[i].ref_dist;
}
int lgp_job_trim5(void* h, long i) {
  return ((lgp::Result*)h)->jobs[i].trim5;
}
int lgp_job_needs_dp(void* h, long i) {
  return ((lgp::Result*)h)->jobs[i].needs_dp;
}
void lgp_free(void* h) { delete (lgp::Result*)h; }

}  // extern "C"
