// Native k-mer ingest: streaming canonical chop + open-addressing
// aggregation for the CPU backend.
//
// The TPU path chops/aggregates with fused vector ops + sort + segment
// reduce (contig/graph.py); this engine is its host-side twin for
// environments where the compute devices are CPU (scale validation,
// file-fed runs behind a slow device link).  Same aggregate semantics:
// canonical k-mer = min(fwd, rc) (DBGgraph.cpp:80-89 rule), strand-adjusted
// left/right neighbor-base counters, first-occurrence stream index.
//
// The table is a power-of-two open-addressing hash with nodes stored
// INLINE in the slot array (count == 0 marks an empty slot), so a probe
// and the counter update touch one cache line — the earlier
// slot-index -> node-vector indirection paid two random accesses per
// probe and dominated ingest wall time.  (Own design; the reference uses
// a prime-size CAS table — we only need the aggregate, not its layout,
// which RefAssembler emulates separately from first_idx.)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

namespace ingest {

struct Node {
    uint64_t kmer;
    int64_t first_idx;
    int32_t count;       // occurrence count; 0 = slot empty
    uint32_t l;          // 4x8-bit saturating edge counters (byte b =
    uint32_t r;          // base b) — the reference's own counter format
                         // (BitAddVal, DBGgraph.cpp:93-96); 32-byte node
                         // = one probe+update per cache line
};

struct Table {
    std::vector<Node> slots;   // open addressing, nodes inline
    uint64_t mask;             // slots.size() - 1
    uint64_t n_nodes;
    int k;
    uint64_t kmask;
    int64_t n_valid_total;

    static uint64_t hash(uint64_t kk) {
        // 64-bit mix (splitmix64 finalizer)
        kk += 0x9E3779B97F4A7C15ULL;
        kk = (kk ^ (kk >> 30)) * 0xBF58476D1CE4E5B9ULL;
        kk = (kk ^ (kk >> 27)) * 0x94D049BB133111EBULL;
        return kk ^ (kk >> 31);
    }

    void init(int k_, uint64_t cap) {
        k = k_;
        kmask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
        uint64_t s = 1024;
        while (s < cap * 2) s <<= 1;
        slots.assign(s, Node{0, 0, 0, 0, 0});
        mask = s - 1;
        n_nodes = 0;
        n_valid_total = 0;
    }

    void grow() {
        uint64_t ns = (mask + 1) << 1;
        std::vector<Node> fresh(ns, Node{0, 0, 0, 0, 0});
        uint64_t nm = ns - 1;
        for (uint64_t i = 0; i <= mask; i++) {
            if (slots[i].count == 0) continue;
            uint64_t hc = hash(slots[i].kmer) & nm;
            while (fresh[hc].count) hc = (hc + 1) & nm;
            fresh[hc] = slots[i];
        }
        slots.swap(fresh);
        mask = nm;
    }

    inline Node* upsert(uint64_t key, int64_t sidx) {
        if ((n_nodes + 1) * 10 > (mask + 1) * 7) grow();
        uint64_t hc = hash(key) & mask;
        while (true) {
            Node* nd = &slots[hc];
            if (nd->count == 0) {
                nd->kmer = key;
                nd->first_idx = sidx;
                n_nodes++;
                return nd;
            }
            if (nd->kmer == key) return nd;
            hc = (hc + 1) & mask;
        }
    }

    // chop one batch of padded reads and aggregate
    void add(const uint8_t* codes, int64_t N, int L,
             const int32_t* lengths, int64_t base_index) {
        int kk = k;
        int P = L - kk + 1;
        uint64_t head_shift = 2ULL * (kk - 1);
        for (int64_t r = 0; r < N; r++) {
            const uint8_t* row = codes + r * L;
            int len = lengths[r];
            if (len > L) len = L;
            int np = len - kk + 1;
            if (np <= 0) continue;
            uint64_t fwd = 0, rc = 0;
            for (int i = 0; i < kk; i++) {
                fwd = (fwd << 2) | row[i];
                rc = rc | ((uint64_t)(3 - row[i]) << (2 * i));
            }
            int64_t sbase = base_index + r * P;
            for (int j = 0; j < np; j++) {
                if (j > 0) {
                    uint64_t b = row[j + kk - 1];
                    fwd = ((fwd << 2) | b) & kmask;
                    rc = (rc >> 2) | ((3ULL - b) << head_shift);
                }
                bool use_fwd = fwd <= rc;
                uint64_t can = use_fwd ? fwd : rc;
                int left, right;
                int has_left = j > 0;
                int has_right = j < len - kk;
                if (use_fwd) {
                    left = has_left ? row[j - 1] : 4;
                    right = has_right ? row[j + kk] : 4;
                } else {
                    left = has_right ? 3 - row[j + kk] : 4;
                    right = has_left ? 3 - row[j - 1] : 4;
                }
                Node* nd = upsert(can, sbase + j);
                nd->count++;
                if (left < 4 && ((nd->l >> (8 * left)) & 0xFFu) < 255u)
                    nd->l += 1u << (8 * left);
                if (right < 4 && ((nd->r >> (8 * right)) & 0xFFu) < 255u)
                    nd->r += 1u << (8 * right);
            }
            n_valid_total += np;
        }
    }

    // occupied slot indices sorted by k-mer value
    std::vector<uint64_t> sorted_occupied() const {
        std::vector<uint64_t> order;
        order.reserve(n_nodes);
        for (uint64_t i = 0; i <= mask; i++)
            if (slots[i].count) order.push_back(i);
        std::sort(order.begin(), order.end(),
                  [&](uint64_t a, uint64_t b) {
                      return slots[a].kmer < slots[b].kmer;
                  });
        return order;
    }
};

}  // namespace ingest

extern "C" {

void* ingest_create(int k, uint64_t capacity_hint) {
    ingest::Table* t = new ingest::Table();
    t->init(k, capacity_hint ? capacity_hint : 1 << 20);
    return t;
}

void ingest_add(void* h, const uint8_t* codes, int64_t N, int L,
                const int32_t* lengths, int64_t base_index) {
    ((ingest::Table*)h)->add(codes, N, L, lengths, base_index);
}

int64_t ingest_size(void* h) {
    return (int64_t)((ingest::Table*)h)->n_nodes;
}

int64_t ingest_total(void* h) {
    return ((ingest::Table*)h)->n_valid_total;
}

// extract sorted-by-kmer arrays; buffers sized by ingest_size()
void ingest_extract(void* h, uint64_t* kmers, int32_t* lcnt, int32_t* rcnt,
                    int64_t* first_idx) {
    ingest::Table* t = (ingest::Table*)h;
    std::vector<uint64_t> order = t->sorted_occupied();
    for (uint64_t i = 0; i < order.size(); i++) {
        const ingest::Node& nd = t->slots[order[i]];
        kmers[i] = nd.kmer;
        first_idx[i] = nd.first_idx;
        for (int j = 0; j < 4; j++) {
            lcnt[4 * i + j] = (int32_t)((nd.l >> (8 * j)) & 0xFFu);
            rcnt[4 * i + j] = (int32_t)((nd.r >> (8 * j)) & 0xFFu);
        }
    }
}

// everything in one pass (single sort); buffers sized by ingest_size()
void ingest_extract_full(void* h, uint64_t* kmers, int32_t* lcnt,
                         int32_t* rcnt, int64_t* first_idx,
                         int32_t* counts) {
    ingest::Table* t = (ingest::Table*)h;
    std::vector<uint64_t> order = t->sorted_occupied();
    for (uint64_t i = 0; i < order.size(); i++) {
        const ingest::Node& nd = t->slots[order[i]];
        kmers[i] = nd.kmer;
        first_idx[i] = nd.first_idx;
        counts[i] = nd.count;
        for (int j = 0; j < 4; j++) {
            lcnt[4 * i + j] = (int32_t)((nd.l >> (8 * j)) & 0xFFu);
            rcnt[4 * i + j] = (int32_t)((nd.r >> (8 * j)) & 0xFFu);
        }
    }
}

// counts-only extraction (kmerfreq path); buffers sized by ingest_size()
void ingest_extract_counts(void* h, uint64_t* kmers, int32_t* counts) {
    ingest::Table* t = (ingest::Table*)h;
    std::vector<uint64_t> order = t->sorted_occupied();
    for (uint64_t i = 0; i < order.size(); i++) {
        const ingest::Node& nd = t->slots[order[i]];
        kmers[i] = nd.kmer;
        counts[i] = nd.count;
    }
}

void ingest_free(void* h) {
    delete (ingest::Table*)h;
}

}  // extern "C"
