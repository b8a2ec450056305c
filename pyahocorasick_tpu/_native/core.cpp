// Native host core for pyahocorasick_tpu.
//
// The TPU-native framework splits work as: device (JAX/Pallas) executes the
// dense-DFA scans; this C++ core executes the *host* runtime around it — the
// mutable trie (the reference implements this as a CPython extension,
// src/trienode.c / src/trie.c), BFS export for the vectorized table compiler,
// and the sequential scan paths used by the Python iterator APIs on small
// inputs (including iter_long's exact replay).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Values are int64 slots: Python maps slots to arbitrary objects for
// STORE_ANY, or stores the integer directly for STORE_INTS/STORE_LENGTH.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <deque>
#include <thread>
#include <vector>

#if defined(__linux__)
#include <sys/mman.h>
#endif

namespace {

// ---- counted allocation fault injection (test instrumentation) ------------
// The host-runtime analog of the reference's MEMORY_DEBUG ALLOC_FAIL sweep
// (reference runtest.sh:156-215, src/utils.c:13-61): aho's allocation points
// call alloc_guard(); when armed, the Nth call throws std::bad_alloc, which
// the Python binding's guarded() wrapper surfaces as MemoryError.  Always
// compiled in — one predictable branch per allocation event — so the shipped
// extension is sweepable without a rebuild.  Only arm through the Python
// binding (its entry points catch the exception); the raw C ABI does not.
// Atomics: alloc_guard() runs at call sites with the GIL released
// (aho_build_tables / aho_build_delta), so concurrent builds would race on
// plain globals.  Relaxed ordering keeps the per-allocation cost negligible;
// the exchange() makes the armed fault fire exactly once even under races.
std::atomic<long long> g_alloc_counter{0};
std::atomic<long long> g_alloc_fail_at{-1};

inline void alloc_guard() {
    long long c = g_alloc_counter.fetch_add(1, std::memory_order_relaxed) + 1;
    long long f = g_alloc_fail_at.load(std::memory_order_relaxed);
    if (f >= 0 && c >= f) {
        // one-shot: the retry after MemoryError works
        if (g_alloc_fail_at.exchange(-1, std::memory_order_relaxed) >= 0)
            throw std::bad_alloc();
    }
}

struct Edge {
    uint32_t letter;
    int32_t child;
};

// Node with the first edge stored inline: the vast majority of trie nodes
// have degree <= 1 (word tails), so this avoids a heap allocation per node
// and keeps the walk cache-friendly.  Insertion order is preserved (parity
// with the reference's append-only edge arrays, src/trienode.c:124-147):
// the inline edge is the first-inserted, spill holds the rest in order.
struct Node {
    int64_t value = 0;
    std::vector<Edge>* spill = nullptr;
    uint32_t letter0 = 0;
    int32_t child0 = -1;
    bool eow = false;
    bool dead = false;

    Node() = default;
    Node(const Node&) = delete;
    Node& operator=(const Node&) = delete;
    Node(Node&& o) noexcept
        : value(o.value), spill(o.spill), letter0(o.letter0), child0(o.child0),
          eow(o.eow), dead(o.dead) {
        o.spill = nullptr;
    }
    Node& operator=(Node&& o) noexcept {
        if (this != &o) {
            delete spill;
            value = o.value; spill = o.spill; letter0 = o.letter0;
            child0 = o.child0; eow = o.eow; dead = o.dead;
            o.spill = nullptr;
        }
        return *this;
    }
    ~Node() { delete spill; }

    int32_t find(uint32_t letter) const {
        if (child0 >= 0 && letter0 == letter) return child0;
        if (spill)
            for (const Edge& e : *spill)
                if (e.letter == letter) return e.child;
        return -1;
    }

    size_t degree() const {
        return (child0 >= 0 ? 1 : 0) + (spill ? spill->size() : 0);
    }

    void add_edge(uint32_t letter, int32_t child) {
        if (child0 < 0 && !spill) {
            letter0 = letter;
            child0 = child;
            return;
        }
        if (child0 < 0) {  // inline slot empty but spill exists: keep order
            alloc_guard();
            spill->push_back({letter, child});
            return;
        }
        alloc_guard();
        if (!spill) spill = new std::vector<Edge>();
        spill->push_back({letter, child});
    }

    void erase_edge(uint32_t letter) {
        if (child0 >= 0 && letter0 == letter) {
            if (spill && !spill->empty()) {
                letter0 = (*spill)[0].letter;
                child0 = (*spill)[0].child;
                spill->erase(spill->begin());
                if (spill->empty()) { delete spill; spill = nullptr; }
            } else {
                child0 = -1;
            }
            return;
        }
        if (spill) {
            for (size_t i = 0; i < spill->size(); i++) {
                if ((*spill)[i].letter == letter) {
                    spill->erase(spill->begin() + (long)i);
                    if (spill->empty()) { delete spill; spill = nullptr; }
                    return;
                }
            }
        }
    }

    template <typename F>
    void for_each_edge(F&& f) const {
        if (child0 >= 0) f(letter0, child0);
        if (spill)
            for (const Edge& e : *spill) f(e.letter, e.child);
    }

    void clear_edges() {
        delete spill;
        spill = nullptr;
        child0 = -1;
    }
};

struct Trie {
    std::vector<Node> nodes;     // arena; index 0 = root once created
    std::vector<int32_t> freelist;
    bool has_root = false;
    bool last_new = false;

    int32_t alloc() {
        alloc_guard();
        if (!freelist.empty()) {
            int32_t id = freelist.back();
            freelist.pop_back();
            nodes[id] = Node();
            return id;
        }
        nodes.emplace_back();
        return (int32_t)nodes.size() - 1;
    }

    void ensure_root() {
        if (!has_root) {
            alloc_guard();
            nodes.clear();
            freelist.clear();
            nodes.emplace_back();
            has_root = true;
        }
    }
};

}  // namespace

extern "C" {

// Arm the counted allocation fault: the n'th allocation event from now
// throws std::bad_alloc (one-shot).  n < 0 disarms.  Returns the event
// count since the last arm call.  Test instrumentation only — call through
// the Python binding so the exception is mapped to MemoryError.
long long aho_alloc_fail_arm(long long n) {
    long long prev = g_alloc_counter.exchange(0, std::memory_order_relaxed);
    g_alloc_fail_at.store(n, std::memory_order_relaxed);
    return prev;
}

long long aho_alloc_calls() {
    return g_alloc_counter.load(std::memory_order_relaxed);
}

void* aho_trie_new() { return new Trie(); }

void aho_trie_free(void* h) { delete static_cast<Trie*>(h); }

void aho_trie_clear(void* h) {
    Trie* t = static_cast<Trie*>(h);
    t->nodes.clear();
    t->freelist.clear();
    t->has_root = false;
}

// Insert a word; returns the terminal node id.  aho_trie_last_new() reports
// whether the word was new (mirrors trie_add_word, reference src/trie.c:14-63).
int64_t aho_trie_add_word(void* h, const uint32_t* w, int64_t n) {
    Trie* t = static_cast<Trie*>(h);
    t->ensure_root();
    int32_t cur = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t child = t->nodes[cur].find(w[i]);
        if (child < 0) {
            child = t->alloc();
            t->nodes[cur].add_edge(w[i], child);
        }
        cur = child;
    }
    Node& node = t->nodes[cur];
    t->last_new = !node.eow;
    node.eow = true;
    // slot convention: a node's value slot is its own id (Python keeps the
    // actual objects in a dict keyed by it); setting it here saves the
    // binding layer a second set_value call per insertion
    node.value = cur;
    return cur;
}

// Exact lookup that also requires end-of-word: returns the node id when the
// key is a stored word, else -1.  One call serves get()/exists()
// (reference src/Automaton.c:420-457 + trie_find, src/trie.c:139-155).
int64_t aho_trie_find_eow(void* h, const uint32_t* w, int64_t n) {
    Trie* t = static_cast<Trie*>(h);
    if (!t->has_root) return -1;
    int32_t cur = 0;
    for (int64_t i = 0; i < n; i++) {
        cur = t->nodes[cur].find(w[i]);
        if (cur < 0) return -1;
    }
    return t->nodes[cur].eow ? cur : -1;
}

int aho_trie_last_new(void* h) { return static_cast<Trie*>(h)->last_new ? 1 : 0; }

// Remove with last-multiway tail pruning (reference src/trie.c:66-136).
// Returns 1 + old value via *old_value, or 0 when absent.
int aho_trie_remove_word(void* h, const uint32_t* w, int64_t n, int64_t* old_value) {
    Trie* t = static_cast<Trie*>(h);
    if (!t->has_root || n <= 0) return 0;

    int32_t cur = 0;
    int32_t last_multiway = 0;
    int64_t last_multiway_index = 0;
    std::vector<int32_t> path((size_t)n);
    for (int64_t i = 0; i < n; i++) {
        int32_t child = t->nodes[cur].find(w[i]);
        if (child < 0) return 0;
        path[(size_t)i] = child;
        cur = child;
        const Node& nd = t->nodes[cur];
        size_t deg = nd.degree();
        if (deg > 1 || (deg == 1 && nd.eow)) {
            last_multiway = cur;
            last_multiway_index = i + 1;
        }
    }
    Node& terminal = t->nodes[cur];
    if (!terminal.eow) return 0;
    *old_value = terminal.value;

    if (terminal.degree() == 0) {
        // unlink the tail from last_multiway and free the chain
        Node& lm = t->nodes[last_multiway];
        lm.erase_edge(w[last_multiway_index]);
        for (int64_t i = last_multiway_index; i < n; i++) {
            int32_t id = path[(size_t)i];
            t->nodes[id].dead = true;
            t->nodes[id].clear_edges();
            t->freelist.push_back(id);
        }
    } else {
        terminal.eow = false;
        terminal.value = 0;
    }
    return 1;
}

int64_t aho_trie_find(void* h, const uint32_t* w, int64_t n) {
    Trie* t = static_cast<Trie*>(h);
    if (!t->has_root) return -1;
    int32_t cur = 0;
    for (int64_t i = 0; i < n; i++) {
        cur = t->nodes[cur].find(w[i]);
        if (cur < 0) return -1;
    }
    return cur;
}

int aho_trie_node_eow(void* h, int64_t id) {
    return static_cast<Trie*>(h)->nodes[(size_t)id].eow ? 1 : 0;
}

int64_t aho_trie_node_value(void* h, int64_t id) {
    return static_cast<Trie*>(h)->nodes[(size_t)id].value;
}

void aho_trie_set_value(void* h, int64_t id, int64_t v) {
    static_cast<Trie*>(h)->nodes[(size_t)id].value = v;
}

int64_t aho_trie_longest_prefix(void* h, const uint32_t* w, int64_t n) {
    Trie* t = static_cast<Trie*>(h);
    if (!t->has_root) return 0;
    int32_t cur = 0;
    int64_t len = 0;
    for (int64_t i = 0; i < n; i++) {
        cur = t->nodes[cur].find(w[i]);
        if (cur < 0) break;
        len++;
    }
    return len;
}

int aho_trie_has_root(void* h) { return static_cast<Trie*>(h)->has_root ? 1 : 0; }

// Live (reachable) node count via BFS (vector-based frontier walk).
int64_t aho_trie_bfs_size(void* h) {
    Trie* t = static_cast<Trie*>(h);
    if (!t->has_root) return 0;
    std::vector<int32_t> order;
    alloc_guard();
    order.reserve(t->nodes.size() - t->freelist.size());
    order.push_back(0);
    for (size_t qi = 0; qi < order.size(); qi++) {
        t->nodes[(size_t)order[qi]].for_each_edge(
            [&](uint32_t, int32_t child) { order.push_back(child); });
    }
    return (int64_t)order.size();
}

// BFS-export the live trie into parallel arrays (size = aho_trie_bfs_size).
// parent[i] < i for all i > 0; root is index 0.  This is the wire/compile
// form shared with serialization.py and compiler.py.
void aho_trie_bfs_export(void* h, uint32_t* parent, uint32_t* letter, uint8_t* eow,
                         int64_t* value) {
    Trie* t = static_cast<Trie*>(h);
    if (!t->has_root) return;
    std::vector<int32_t> order;
    alloc_guard();
    order.reserve(t->nodes.size() - t->freelist.size());
    order.push_back(0);
    std::vector<int32_t> newid(t->nodes.size(), -1);
    newid[0] = 0;
    parent[0] = 0;
    letter[0] = 0;
    eow[0] = t->nodes[0].eow ? 1 : 0;
    value[0] = t->nodes[0].value;
    for (size_t qi = 0; qi < order.size(); qi++) {
        int32_t id = order[qi];
        t->nodes[(size_t)id].for_each_edge([&](uint32_t lt, int32_t ch) {
            int64_t nid = (int64_t)order.size();
            newid[(size_t)ch] = nid;
            parent[nid] = (uint32_t)newid[(size_t)id];
            letter[nid] = lt;
            const Node& c = t->nodes[(size_t)ch];
            eow[nid] = c.eow ? 1 : 0;
            value[nid] = c.value;
            order.push_back(ch);
        });
    }
}

int64_t aho_trie_node_degree(void* h, int64_t id) {
    return (int64_t)static_cast<Trie*>(h)->nodes[(size_t)id].degree();
}

void aho_trie_node_edges(void* h, int64_t id, uint32_t* letters, int64_t* children) {
    const Node& nd = static_cast<Trie*>(h)->nodes[(size_t)id];
    size_t i = 0;
    nd.for_each_edge([&](uint32_t lt, int32_t ch) {
        letters[i] = lt;
        children[i] = ch;
        i++;
    });
}

// Bulk-construct from BFS arrays (deserialization fast path).  Node ids equal
// BFS indices; eow nodes get value slots equal to their own id, matching the
// Python-side slot convention.
void aho_trie_import(void* h, const uint32_t* parent, const uint32_t* letter,
                     const uint8_t* eow, int64_t S) {
    Trie* t = static_cast<Trie*>(h);
    t->nodes.clear();
    t->freelist.clear();
    t->has_root = S > 0;
    if (S <= 0) return;
    alloc_guard();
    t->nodes.resize((size_t)S);
    for (int64_t i = 0; i < S; i++) {
        t->nodes[(size_t)i].eow = eow[i] != 0;
        t->nodes[(size_t)i].value = i;
    }
    for (int64_t i = 1; i < S; i++) {
        t->nodes[(size_t)parent[i]].add_edge(letter[i], (int32_t)i);
    }
}

// DFS stats (reference get_stats_aux, src/Automaton.c:1044-1071).
void aho_trie_stats(void* h, int64_t* nodes_count, int64_t* words_count,
                    int64_t* links_count, int64_t* depth_max, int64_t* total_size) {
    Trie* t = static_cast<Trie*>(h);
    *nodes_count = *words_count = *links_count = *depth_max = *total_size = 0;
    if (!t->has_root) return;
    std::vector<std::pair<int32_t, int64_t>> stack{{0, 0}};
    while (!stack.empty()) {
        auto [id, depth] = stack.back();
        stack.pop_back();
        const Node& nd = t->nodes[(size_t)id];
        (*nodes_count)++;
        *words_count += nd.eow ? 1 : 0;
        *links_count += (int64_t)nd.degree();
        *total_size += 32 + 8 * (int64_t)nd.degree();
        if (depth > *depth_max) *depth_max = depth;
        nd.for_each_edge(
            [&](uint32_t, int32_t child) { stack.push_back({child, depth + 1}); });
    }
}

// ---------------------------------------------------------------------------
// Dense DFA construction from BFS arrays (the hot part of make_automaton's
// lowering; level-phased so copied fail rows are always final — mirrors the
// vectorized numpy construction in compiler.py, reference BFS:
// src/Automaton.c:560-649).
// ---------------------------------------------------------------------------

// delta must be zero-initialized by the caller ([S*K] int32).  Returns the
// total number of CSR output entries (so the caller can allocate out_ids and
// call aho_fill_out_ids).
int64_t aho_build_tables(const uint32_t* parent, const int32_t* cls,
                         const uint8_t* eow, int64_t S, int32_t K,
                         const int64_t* level_starts, int64_t nlevels,
                         int32_t* delta, int32_t* fail, int32_t* depth,
                         int32_t* word_id, int32_t* match_count) {
    // note: MADV_HUGEPAGE was tried here and removed — on the target VMs
    // huge-page faulting is far slower than 4K faulting (compaction stalls)
    fail[0] = 0;
    depth[0] = 0;
    std::vector<int64_t> by_src;
    for (int64_t d = 0; d < nlevels; d++) {
        int64_t lo = level_starts[d], hi = level_starts[d + 1];
        if (d > 0) {
            // copy rows in ascending source-row order: the reads then stream
            // the (already final) shallower region mostly sequentially
            // instead of thrashing TLB/cache with random rows
            by_src.clear();
            alloc_guard();
            by_src.reserve((size_t)(hi - lo));
            for (int64_t i = lo; i < hi; i++)
                by_src.push_back(((int64_t)fail[i] << 28) | (i - lo));
            std::sort(by_src.begin(), by_src.end());
            const int64_t kIdxMask = (1LL << 28) - 1;
            for (size_t k = 0; k < by_src.size(); k++) {
                int64_t i = lo + (by_src[k] & kIdxMask);
                if (k + 8 < by_src.size())
                    __builtin_prefetch(
                        delta + (by_src[k + 8] >> 28) * K, 0, 1);
                memcpy(delta + i * K, delta + (by_src[k] >> 28) * K,
                       (size_t)K * 4);
                depth[i] = (int32_t)d;
            }
        }
        if (d + 1 < nlevels) {
            int64_t clo = level_starts[d + 1], chi = level_starts[d + 2];
            for (int64_t j = clo; j < chi; j++) {
                int64_t p = parent[j];
                fail[j] = (d == 0) ? 0 : delta[(int64_t)fail[p] * K + cls[j]];
                delta[p * K + cls[j]] = (int32_t)j;
            }
        }
    }
    int32_t next_pid = 0;
    int64_t total = 0;
    for (int64_t i = 0; i < S; i++) {
        word_id[i] = eow[i] ? next_pid++ : -1;
        match_count[i] = (int32_t)(eow[i] != 0) + match_count[fail[i]];
        total += match_count[i];
    }
    return total;
}

// ---------------------------------------------------------------------------
// Sparse construction: fail links by fail-chain walking over the BFS arrays —
// the same algorithm (and cost) as the reference's make_automaton BFS
// (src/Automaton.c:560-649) — so make_automaton no longer pays for the dense
// table; that is built lazily by aho_build_delta when a bulk/device scan
// first needs it.
//
// Children of BFS node p occupy the contiguous index range
// [child_off[p], child_off[p+1]) and a child's id IS its BFS index, so the
// goto function is a linear scan of a (typically tiny) run.
// ---------------------------------------------------------------------------

// Sparse goto for a non-root state; -1 when the edge is absent.
static inline int32_t sparse_goto(const int32_t* cls, const int64_t* child_off,
                                  int32_t s, int32_t c) {
    int64_t lo = child_off[s], hi = child_off[s + 1];
    for (int64_t j = lo; j < hi; j++)
        if (cls[j] == c) return (int32_t)j;
    return -1;
}

// Computes fail/depth/word_id/match_count/out_link without the dense table.
// Returns the total number of CSR output entries.  root_goto [K] must be
// zero-initialized; it is filled as a side product for the sparse scans.
// Within a BFS level every node's fail link depends only on strictly
// shallower (already final) links, so each level parallelizes.
int64_t aho_fail_links(const uint32_t* parent, const int32_t* cls,
                       const uint8_t* eow, int64_t S, int32_t K,
                       const int64_t* level_starts, int64_t nlevels,
                       const int64_t* child_off, int32_t* root_goto,
                       int32_t* fail, int32_t* depth, int32_t* word_id,
                       int32_t* match_count, int32_t* out_link,
                       int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    fail[0] = 0;
    depth[0] = 0;
    out_link[0] = 0;
    for (int64_t j = child_off[0]; j < child_off[1]; j++)
        root_goto[cls[j]] = (int32_t)j;
    for (int64_t d = 1; d < nlevels; d++) {
        int64_t lo = level_starts[d], hi = level_starts[d + 1];
        auto run = [&](int64_t a, int64_t b) {
            for (int64_t i = a; i < b; i++) {
                depth[i] = (int32_t)d;
                int32_t f = 0;
                if (d > 1) {
                    int32_t s = fail[parent[i]];
                    int32_t c = cls[i];
                    for (;;) {
                        if (s == 0) {
                            f = root_goto[c];  // 0 when absent; never i
                            break;
                        }
                        int32_t t = sparse_goto(cls, child_off, s, c);
                        if (t >= 0) {
                            f = t;
                            break;
                        }
                        s = fail[s];
                    }
                }
                fail[i] = f;
                // nearest strict fail-ancestor that is a word (0 = none);
                // f is strictly shallower, so its out_link is final
                out_link[i] = eow[f] ? f : out_link[f];
            }
        };
        int64_t n = hi - lo;
        int nt = (int)std::min<int64_t>(nthreads, std::max<int64_t>(n / 8192, 1));
        if (nt <= 1) {
            run(lo, hi);
        } else {
            std::vector<std::thread> ts;
            int64_t per = (n + nt - 1) / nt;
            for (int t = 0; t < nt; t++)
                ts.emplace_back(run, lo + t * per, std::min(hi, lo + (t + 1) * per));
            for (auto& th : ts) th.join();
        }
    }
    int32_t next_pid = 0;
    int64_t total = 0;
    for (int64_t i = 0; i < S; i++) {
        word_id[i] = eow[i] ? next_pid++ : -1;
        match_count[i] = (int32_t)(eow[i] != 0) + match_count[fail[i]];
        total += match_count[i];
    }
    return total;
}

// Dense DFA table from precomputed fail links (the deferred half of the old
// aho_build_tables).  Level-phased: a level's rows start as copies of their
// (strictly shallower, already final) fail rows, then the level's goto edges
// are scattered on top.  Both phases are parallel within a level.
void aho_build_delta(const uint32_t* parent, const int32_t* cls,
                     const int32_t* fail, int64_t S, int32_t K,
                     const int64_t* level_starts, int64_t nlevels,
                     int32_t* delta, int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    {
        // pre-fault the table with parallel sequential writes: on the target
        // VMs first-touch page faults cost far more than the writes, and the
        // build's own (random-row) touch order is the worst case for them
        int nt = (int)std::min<int64_t>(nthreads, std::max<int64_t>(S / 65536, 1));
        int64_t total = S * (int64_t)K;
        auto touch = [&](int64_t a, int64_t b) {
            if (b > a) memset(delta + a, 0, (size_t)(b - a) * 4);
        };
        if (nt <= 1) {
            touch(0, total);
        } else {
            std::vector<std::thread> ts;
            int64_t per = (total + nt - 1) / nt;
            for (int t = 0; t < nt; t++)
                ts.emplace_back(touch, t * per, std::min(total, (t + 1) * per));
            for (auto& th : ts) th.join();
        }
    }
    std::vector<int64_t> by_src;
    const int64_t kIdxMask = (1LL << 28) - 1;
    for (int64_t d = 0; d < nlevels; d++) {
        int64_t lo = level_starts[d], hi = level_starts[d + 1];
        if (d > 0) {
            // ascending source-row order: reads stream the shallower region
            by_src.clear();
            alloc_guard();
            by_src.reserve((size_t)(hi - lo));
            for (int64_t i = lo; i < hi; i++)
                by_src.push_back(((int64_t)fail[i] << 28) | (i - lo));
            std::sort(by_src.begin(), by_src.end());
            int64_t n = (int64_t)by_src.size();
            int nt = (int)std::min<int64_t>(nthreads, std::max<int64_t>(n / 4096, 1));
            auto copy_range = [&](int64_t a, int64_t b) {
                for (int64_t k = a; k < b; k++) {
                    int64_t i = lo + (by_src[(size_t)k] & kIdxMask);
                    if (k + 8 < b)
                        __builtin_prefetch(delta + (by_src[(size_t)k + 8] >> 28) * K, 0, 1);
                    memcpy(delta + i * K, delta + (by_src[(size_t)k] >> 28) * K,
                           (size_t)K * 4);
                }
            };
            if (nt <= 1) {
                copy_range(0, n);
            } else {
                std::vector<std::thread> ts;
                int64_t per = (n + nt - 1) / nt;
                for (int t = 0; t < nt; t++)
                    ts.emplace_back(copy_range, t * per,
                                    std::min(n, (t + 1) * per));
                for (auto& th : ts) th.join();
            }
        }
        if (d + 1 < nlevels) {
            int64_t clo = level_starts[d + 1], chi = level_starts[d + 2];
            // goto edges write distinct (parent,cls) cells: parallel-safe
            int64_t n = chi - clo;
            int nt = (int)std::min<int64_t>(nthreads, std::max<int64_t>(n / 65536, 1));
            auto scatter_range = [&](int64_t a, int64_t b) {
                for (int64_t j = a; j < b; j++)
                    delta[(int64_t)parent[j] * K + cls[j]] = (int32_t)j;
            };
            if (nt <= 1) {
                scatter_range(clo, chi);
            } else {
                std::vector<std::thread> ts;
                int64_t per = (n + nt - 1) / nt;
                for (int t = 0; t < nt; t++)
                    ts.emplace_back(scatter_range, clo + t * per,
                                    std::min(chi, clo + (t + 1) * per));
                for (auto& th : ts) th.join();
            }
        }
    }
}

// Sequential scan + emission over the SPARSE automaton (goto via child runs +
// fail chains, exactly the reference's search loop shape, src/trie.c:177-194).
// Used by the host iterators before the dense table exists.
int64_t aho_scan_emit_sparse(const int32_t* cls_nodes, const int64_t* child_off,
                             const int32_t* fail, const int32_t* root_goto,
                             const int32_t* match_count,
                             const int64_t* out_offsets, const int32_t* out_ids,
                             const int32_t* cls, int64_t n, int32_t s0,
                             int64_t base, int64_t* out_pos, int32_t* out_pid,
                             int64_t cap, int32_t* final_state) {
    int32_t s = s0;
    int64_t written = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t c = cls[i];
        for (;;) {
            if (s == 0) {
                s = root_goto[c];
                break;
            }
            int32_t t = sparse_goto(cls_nodes, child_off, s, c);
            if (t >= 0) {
                s = t;
                break;
            }
            s = fail[s];
        }
        int32_t mc = match_count[s];
        if (mc) {
            int64_t off = out_offsets[s];
            for (int32_t j = 0; j < mc; j++) {
                if (out_pos && written < cap) {
                    out_pos[written] = base + i;
                    out_pid[written] = out_ids[off + j];
                }
                written++;
            }
        }
    }
    if (final_state) *final_state = s;
    return written;
}

// Deep-episode patch for the hot/cold engine (ops/hotcold.py).  The hot scan
// runs a depth-truncated projection automaton; each flagged group [p, p+span)
// may contain transitions into depth > d ("cold" states the hot table cannot
// represent).  Re-scan those episodes with the sparse full automaton,
// emitting only matches longer than d (shorter ones are exact in the hot
// scan), until the state depth returns to <= d.  Correctness: a match of
// length l ending at q inside an episode entered at p satisfies
// l <= depth(q) <= d+1 + (q-p), so it starts at >= p-d; scanning from
// max(p-d, done+1) with a root start therefore finds exactly the deep
// matches (projection argument in ops/hotcold.py).  Positions <= `done` are
// fully accounted for, which both dedupes overlapping groups and keeps the
// emitted stream position-sorted.
int64_t aho_patch_deep(const int32_t* cls_nodes, const int64_t* child_off,
                       const int32_t* fail, const int32_t* root_goto,
                       const int32_t* depth, const int32_t* match_count,
                       const int64_t* out_offsets, const int32_t* out_ids,
                       const int32_t* wlen, const int32_t* cls, int64_t n,
                       const int64_t* groups, int64_t n_groups, int32_t span,
                       int32_t d, int32_t warm, int64_t base, int64_t* out_pos,
                       int32_t* out_pid, int64_t cap) {
    int64_t written = 0;
    int64_t done = -1;  // every position <= done is fully accounted for
    for (int64_t g = 0; g < n_groups; g++) {
        int64_t p = groups[g];
        int64_t q = p > done ? p : done + 1;
        int64_t gend = p + span;
        if (q >= gend || q >= n) continue;
        int64_t a = q - warm;  // warm >= longest_word: exact for ANY
        if (a < 0) a = 0;      // boundary state, deep or not
        int32_t s = 0;
        for (int64_t i = a; i < q; i++) {  // warmup: no emission
            int32_t c = cls[i];
            for (;;) {
                if (s == 0) {
                    s = root_goto[c];
                    break;
                }
                int32_t t = sparse_goto(cls_nodes, child_off, s, c);
                if (t >= 0) {
                    s = t;
                    break;
                }
                s = fail[s];
            }
        }
        for (int64_t i = q; i < n; i++) {
            int32_t c = cls[i];
            for (;;) {
                if (s == 0) {
                    s = root_goto[c];
                    break;
                }
                int32_t t = sparse_goto(cls_nodes, child_off, s, c);
                if (t >= 0) {
                    s = t;
                    break;
                }
                s = fail[s];
            }
            done = i;
            if (depth[s] > d) {
                int32_t mc = match_count[s];
                if (mc) {
                    int64_t off = out_offsets[s];
                    for (int32_t j = 0; j < mc; j++) {
                        int32_t pid = out_ids[off + j];
                        if (wlen[pid] > d) {
                            if (out_pos && written < cap) {
                                out_pos[written] = base + i;
                                out_pid[written] = pid;
                            }
                            written++;
                        }
                    }
                }
            } else if (i >= gend - 1) {
                break;  // past the group and back in the hot set
            }
        }
    }
    return written;
}

// Hot/cold stride-table composition (ops/hotcold.py): O = B после A —
// O[s, i*Kb + j] = B[A_state[s,i], j], flag bitmasks concatenated (B's bits
// shifted up by spanA).  One parallel streaming pass instead of numpy's
// multiple giant fancy-index temporaries (the tables reach ~2 GB).
void aho_hotcold_compose(const int32_t* stA, const uint8_t* amA,
                         const uint8_t* dpA, int64_t Ka, const int32_t* stB,
                         const uint8_t* amB, const uint8_t* dpB, int64_t Kb,
                         int64_t S, int32_t spanA, int32_t* stO, uint8_t* amO,
                         uint8_t* dpO, int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    auto run = [&](int64_t lo, int64_t hi) {
        for (int64_t s = lo; s < hi; s++) {
            const int32_t* ra = stA + s * Ka;
            const uint8_t* aa = amA + s * Ka;
            const uint8_t* da = dpA + s * Ka;
            int32_t* ro = stO + s * Ka * Kb;
            uint8_t* ao = amO + s * Ka * Kb;
            uint8_t* dpo = dpO + s * Ka * Kb;
            for (int64_t i = 0; i < Ka; i++) {
                int64_t mid = ra[i];
                const int32_t* rb = stB + mid * Kb;
                const uint8_t* ab = amB + mid * Kb;
                const uint8_t* db = dpB + mid * Kb;
                uint8_t a0 = aa[i], d0 = da[i];
                int32_t* o = ro + i * Kb;
                uint8_t* ao2 = ao + i * Kb;
                uint8_t* do2 = dpo + i * Kb;
                for (int64_t j = 0; j < Kb; j++) {
                    o[j] = rb[j];
                    ao2[j] = (uint8_t)(a0 | (ab[j] << spanA));
                    do2[j] = (uint8_t)(d0 | (db[j] << spanA));
                }
            }
        }
    };
    if (nthreads == 1 || S < 256) {
        run(0, S);
    } else {
        std::vector<std::thread> ts;
        int64_t per = (S + nthreads - 1) / nthreads;
        for (int t = 0; t < nthreads; t++)
            ts.emplace_back(run, t * per, std::min(S, (t + 1) * per));
        for (auto& th : ts) th.join();
    }
}

// Pack composed hot/cold entries: state | am << 20 | deep << (20 + span).
void aho_hotcold_pack(const int32_t* st, const uint8_t* am, const uint8_t* dp,
                      int64_t n, int32_t span, int32_t* out,
                      int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    auto run = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++)
            out[i] = st[i] | ((int32_t)am[i] << 20) |
                     ((int32_t)dp[i] << (20 + span));
    };
    if (nthreads == 1 || n < (1 << 20)) {
        run(0, n);
    } else {
        std::vector<std::thread> ts;
        int64_t per = (n + nthreads - 1) / nthreads;
        for (int t = 0; t < nthreads; t++)
            ts.emplace_back(run, t * per, std::min(n, (t + 1) * per));
        for (auto& th : ts) th.join();
    }
}

// CSR output lists in fail-chain order, from a precomputed out_link (the
// fused aho_fail_links computes it in the same pass as fail itself).
void aho_fill_out_ids_linked(const uint8_t* eow, const int32_t* out_link,
                             const int32_t* word_id, const int32_t* match_count,
                             int64_t S, int64_t* out_offsets, int32_t* out_ids) {
    out_offsets[0] = 0;
    for (int64_t i = 0; i < S; i++)
        out_offsets[i + 1] = out_offsets[i] + match_count[i];
    for (int64_t i = 0; i < S; i++) {
        int32_t mc = match_count[i];
        if (!mc) continue;
        int64_t off = out_offsets[i];
        int64_t cur = eow[i] ? i : out_link[i];
        for (int32_t t = 0; t < mc; t++) {
            out_ids[off + t] = word_id[cur];
            cur = out_link[cur];
        }
    }
}

// CSR output lists in fail-chain order.  out_offsets [S+1] and out_ids
// [total] are caller-allocated; out_link scratch is internal.
void aho_fill_out_ids(const uint8_t* eow, const int32_t* fail,
                      const int32_t* word_id, const int32_t* match_count,
                      int64_t S, int64_t* out_offsets, int32_t* out_ids) {
    std::vector<int32_t> out_link((size_t)S, 0);
    for (int64_t i = 1; i < S; i++) {
        int32_t f = fail[i];
        out_link[(size_t)i] = eow[f] ? f : out_link[(size_t)f];
    }
    out_offsets[0] = 0;
    for (int64_t i = 0; i < S; i++)
        out_offsets[i + 1] = out_offsets[i] + match_count[i];
    for (int64_t i = 0; i < S; i++) {
        int32_t mc = match_count[i];
        if (!mc) continue;
        int64_t off = out_offsets[i];
        int64_t cur = eow[i] ? i : out_link[(size_t)i];
        for (int32_t t = 0; t < mc; t++) {
            out_ids[off + t] = word_id[cur];
            cur = out_link[(size_t)cur];
        }
    }
}

// ---------------------------------------------------------------------------
// Sequential scans over the compiled dense tables (host fast path).
// ---------------------------------------------------------------------------

// states[i] = state after consuming cls[i]; returns final state.
int32_t aho_scan_states(const int32_t* delta, int32_t K, const int32_t* cls,
                        int64_t n, int32_t s0, int32_t* out) {
    int32_t s = s0;
    for (int64_t i = 0; i < n; i++) {
        s = delta[(int64_t)s * K + cls[i]];
        if (out) out[i] = s;
    }
    return s;
}

// Lane-blocked scan: the same halo decomposition the TPU kernels use, on the
// host — NLANES independent chains per pass hide DRAM latency (the serial
// scan is one ~100ns cache miss per character; interleaved lanes overlap
// them).  Exact by the halo property (see ops/cpu.py).
void aho_scan_states_blocked(const int32_t* delta, int32_t K, const int32_t* cls,
                             int64_t n, int32_t H, int32_t* out) {
    constexpr int64_t NL = 16;
    if (n < NL * 64) {  // tiny inputs: plain scan
        int32_t s = 0;
        for (int64_t i = 0; i < n; i++) {
            s = delta[(int64_t)s * K + cls[i]];
            out[i] = s;
        }
        return;
    }
    if (H < 1) H = 1;
    int64_t B = (n + NL - 1) / NL;
    int64_t starts[NL], ends[NL];
    int32_t st[NL];
    // halo warmup: lane l starts scanning at starts[l]-H from root
    for (int64_t l = 0; l < NL; l++) {
        starts[l] = l * B;
        ends[l] = std::min(starts[l] + B, n);
        st[l] = 0;
    }
    for (int64_t t = -H; t < 0; t++) {
        for (int64_t l = 0; l < NL; l++) {
            int64_t p = starts[l] + t;
            if (p >= 0 && starts[l] < n)
                st[l] = delta[(int64_t)st[l] * K + cls[p]];
        }
    }
    for (int64_t t = 0; t < B; t++) {
        for (int64_t l = 0; l < NL; l++) {
            int64_t p = starts[l] + t;
            if (p < ends[l]) {
                st[l] = delta[(int64_t)st[l] * K + cls[p]];
                out[p] = st[l];
            }
        }
    }
}

// Emission from precomputed states (two-pass: cap=0 counts).
int64_t aho_emit_from_states(const int32_t* match_count,
                             const int64_t* out_offsets, const int32_t* out_ids,
                             const int32_t* states, int64_t n, int64_t base,
                             int64_t* out_pos, int32_t* out_pid, int64_t cap) {
    int64_t written = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t mc = match_count[states[i]];
        if (mc) {
            int64_t off = out_offsets[states[i]];
            for (int32_t j = 0; j < mc; j++) {
                if (out_pos && written < cap) {
                    out_pos[written] = base + i;
                    out_pid[written] = out_ids[off + j];
                }
                written++;
            }
        }
    }
    return written;
}

// Full match emission in reference order.  Returns the number of matches
// written (<= cap; call with cap=0/out=null to count).  *final_state is
// updated for streaming.
int64_t aho_scan_emit(const int32_t* delta, int32_t K, const int32_t* match_count,
                      const int64_t* out_offsets, const int32_t* out_ids,
                      const int32_t* cls, int64_t n, int32_t s0, int64_t base,
                      int64_t* out_pos, int32_t* out_pid, int64_t cap,
                      int32_t* final_state) {
    int32_t s = s0;
    int64_t written = 0;
    for (int64_t i = 0; i < n; i++) {
        s = delta[(int64_t)s * K + cls[i]];
        int32_t mc = match_count[s];
        if (mc) {
            int64_t off = out_offsets[s];
            for (int32_t j = 0; j < mc; j++) {
                if (out_pos && written < cap) {
                    out_pos[written] = base + i;
                    out_pid[written] = out_ids[off + j];
                }
                written++;
            }
        }
    }
    if (final_state) *final_state = s;
    return written;
}

// Resolve DFA states at sparse positions: state(pos) equals a root-started
// scan of the last H = longest_word characters (the halo property used by
// the blocked device kernels), so each match position found by the device
// flag pass is resolved with <= H host transitions.
void aho_resolve_states(const int32_t* delta, int32_t K, const int32_t* cls,
                        int64_t n, const int64_t* pos, int64_t m, int32_t H,
                        int32_t* out_states) {
    for (int64_t i = 0; i < m; i++) {
        int64_t p = pos[i];
        int64_t start = p - H + 1;
        if (start < 0) start = 0;
        int32_t s = 0;
        for (int64_t j = start; j <= p && j < n; j++)
            s = delta[(int64_t)s * K + cls[j]];
        out_states[i] = s;
    }
}

// 3-gram-code histogram over positions >= max(start, 2): the host half of
// the cascade engine's hybrid mode (ops/cascade.py) — one cache-hot pass
// (~2 ns/char) so the l<=3 counts overlap the device flag pipeline instead
// of paying the TPU's ~7 ns/char scatter.  hist must hold K^3 zeroed bins.
void aho_hist3(const int32_t* cls, int64_t n, int32_t K, int64_t start,
               int64_t* hist) {
    const int64_t K2 = (int64_t)K * K;
    int64_t i = start < 2 ? 2 : start;
    for (; i < n; i++)
        hist[(int64_t)cls[i - 2] * K2 + (int64_t)cls[i - 1] * K + cls[i]]++;
}

// iter_long exact replay on the dense DFA
// (reference src/AutomatonSearchIterLong.c:100-152; see iterators.py for the
// depth-delta derivation of "a goto edge was taken").  Scans cls[index+1:end],
// appends (pos, pid) pairs, and returns the machine state for streaming.
struct IterLongState {
    int32_t state;
    int64_t index;       // last processed position
    int32_t last_pid;    // -1 = none
    int64_t last_index;
};

int64_t aho_iter_long_scan(const int32_t* delta, int32_t K, const int32_t* depth,
                           const int32_t* word_id, const int32_t* fail,
                           const int32_t* cls, int64_t end, IterLongState* st,
                           int64_t* out_pos, int32_t* out_pid, int64_t cap) {
    int32_t state = st->state;
    int64_t index = st->index + 1;
    int32_t last_pid = st->last_pid;
    int64_t last_index = st->last_index;
    int64_t written = 0;

    auto emit = [&]() {
        if (written < cap) {
            out_pos[written] = last_index;
            out_pid[written] = last_pid;
        }
        written++;
        state = 0;
        index = last_index + 1;
        last_pid = -1;
        last_index = -1;
    };

    for (;;) {
        while (index < end) {
            int32_t c = cls[index];
            int32_t nxt = delta[(int64_t)state * K + c];
            bool direct = depth[nxt] == depth[state] + 1;
            if (!direct && last_pid != -1) {
                emit();
                continue;
            }
            if (nxt == 0) {  // no fail-chain node has this edge: consume it
                state = 0;
                index++;
                continue;
            }
            if (word_id[nxt] != -1) {
                last_pid = word_id[nxt];
                last_index = index;
            } else {
                int32_t f = fail[nxt];
                if (f != 0 && word_id[f] != -1) {
                    last_pid = word_id[f];
                    last_index = index;
                    emit();
                    continue;
                }
            }
            state = nxt;
            index++;
        }
        if (last_pid != -1) {
            // end-of-input flush; the restart (index = last_index + 1) may
            // re-expose tail matches, so keep scanning
            emit();
            continue;
        }
        break;
    }
    st->state = state;
    st->index = index - 1;
    st->last_pid = last_pid;
    st->last_index = last_index;
    return written;
}

// Short-pattern (length <= 3) match emission for the cascade hybrid: a
// length-l match at end i is exactly a hit in the K^l id LUT, so one linear
// pass finds every short match (the host analog of the device's exact
// bitmap path; overlaps the device l>=4 windows).  Null luts = no patterns
// of that length.  Order within a position: length descending, which is the
// reference's fail-chain emission order (src/AutomatonSearchIter.c:157-197).
int64_t aho_emit_short_count(const int32_t* cls, int64_t n, int32_t K,
                             int64_t vstart, const int32_t* lut1,
                             const int32_t* lut2, const int32_t* lut3) {
    int64_t cnt = 0;
    const int64_t K2 = (int64_t)K * K;
    for (int64_t i = vstart > 0 ? vstart : 0; i < n; ++i) {
        const int32_t c0 = cls[i];
        if (lut3 && i >= 2 &&
            lut3[(int64_t)cls[i - 2] * K2 + (int64_t)cls[i - 1] * K + c0] >= 0)
            ++cnt;
        if (lut2 && i >= 1 && lut2[(int64_t)cls[i - 1] * K + c0] >= 0) ++cnt;
        if (lut1 && lut1[c0] >= 0) ++cnt;
    }
    return cnt;
}

// cap = allocated capacity of out_pos/out_id; the fill stops there even if
// the underlying cls buffer was mutated between the count and fill passes
// (both run with the GIL released), so the passes can never overflow the
// caller's buffers.  Returns the number of entries written.
int64_t aho_emit_short_fill(const int32_t* cls, int64_t n, int32_t K,
                            int64_t vstart, const int32_t* lut1,
                            const int32_t* lut2, const int32_t* lut3,
                            int64_t* out_pos, int32_t* out_id, int64_t cap) {
    int64_t k = 0;
    const int64_t K2 = (int64_t)K * K;
    for (int64_t i = vstart > 0 ? vstart : 0; i < n && k < cap; ++i) {
        const int32_t c0 = cls[i];
        if (lut3 && i >= 2 && k < cap) {
            int32_t id =
                lut3[(int64_t)cls[i - 2] * K2 + (int64_t)cls[i - 1] * K + c0];
            if (id >= 0) { out_pos[k] = i; out_id[k] = id; ++k; }
        }
        if (lut2 && i >= 1 && k < cap) {
            int32_t id = lut2[(int64_t)cls[i - 1] * K + c0];
            if (id >= 0) { out_pos[k] = i; out_id[k] = id; ++k; }
        }
        if (lut1 && k < cap) {
            int32_t id = lut1[c0];
            if (id >= 0) { out_pos[k] = i; out_id[k] = id; ++k; }
        }
    }
    return k;
}

// Threaded short-emit (round-5): each position's l1/l2/l3 tests read only
// cls[i-2..i], so chunks are independent and chunk-order concatenation IS
// the global order.  Count and fill share one chunk geometry; per-chunk
// fill caps at the counted size (a concurrently mutated cls buffer cannot
// overflow or overlap), and rare under-fills are compacted by the caller
// using the returned per-chunk written[] vector.
static void emit_short_geometry(int64_t n, int64_t vstart, int64_t nchunks,
                                int64_t* lo, int64_t* hi) {
    int64_t start = vstart > 0 ? vstart : 0;
    if (start > n) start = n;
    int64_t span = n - start;
    int64_t per = nchunks > 0 ? (span + nchunks - 1) / nchunks : 0;
    for (int64_t c = 0; c < nchunks; ++c) {
        lo[c] = start + c * per;
        if (lo[c] > n) lo[c] = n;
        hi[c] = lo[c] + per;
        if (hi[c] > n) hi[c] = n;
    }
}

// L1-resident hit bitmaps over the LUT domains: the l3 LUT is K^3 * 4 B
// (~600 KB at K=53) and the scan is load-latency-bound on this box; the
// bitmap is K^3 / 8 bytes (~19 KB) so the common no-match test stays in
// L1 and the LUT is only touched on (rare) hits.
static void emit_short_bitmap(const int32_t* lut, int64_t size,
                              uint64_t* bm) {
    std::memset(bm, 0, (size_t)((size + 63) / 64) * 8);
    for (int64_t i = 0; i < size; ++i)
        if (lut[i] >= 0) bm[i >> 6] |= (uint64_t)1 << (i & 63);
}

#if defined(__AVX512F__)
#include <immintrin.h>
// Vectorized l3-only fast path (the common shape: dictionaries with no
// length-1/2 patterns): compute 16 g3 codes at once and test the hit
// bitmap with a gather; positions with a set bit fall out to scalar
// emission via the lane mask.  ~2-3x the scalar scan on this box.
// Returns the 16-lane hit mask for chars [i, i+16).
static inline uint16_t emit_short_l3_mask16(const int32_t* cls, int64_t i,
                                            int64_t K, int64_t K2,
                                            const uint64_t* bm) {
    const __m512i c0 = _mm512_loadu_si512(cls + i);
    const __m512i c1 = _mm512_loadu_si512(cls + i - 1);
    const __m512i c2 = _mm512_loadu_si512(cls + i - 2);
    const __m512i vK = _mm512_set1_epi32((int32_t)K);
    const __m512i vK2 = _mm512_set1_epi32((int32_t)K2);
    __m512i g3 = _mm512_add_epi32(
        _mm512_add_epi32(_mm512_mullo_epi32(c2, vK2),
                         _mm512_mullo_epi32(c1, vK)),
        c0);
    // bitmap test: word = bm32[g3 >> 5] (view the u64 bitmap as u32
    // words — little-endian lane order matches), bit = g3 & 31
    __m512i widx = _mm512_srli_epi32(g3, 5);
    __m512i words = _mm512_i32gather_epi32(widx, (const int*)bm, 4);
    __m512i bit = _mm512_and_si512(g3, _mm512_set1_epi32(31));
    __m512i v = _mm512_and_si512(_mm512_srlv_epi32(words, bit),
                                 _mm512_set1_epi32(1));
    return (uint16_t)_mm512_cmpneq_epi32_mask(v, _mm512_setzero_si512());
}
#endif

int64_t aho_emit_short_count_mt(const int32_t* cls, int64_t n, int32_t K,
                                int64_t vstart, const int32_t* lut1,
                                const int32_t* lut2, const int32_t* lut3,
                                int64_t* chunk_counts, int64_t nchunks) {
    std::vector<int64_t> lo(nchunks), hi(nchunks);
    emit_short_geometry(n, vstart, nchunks, lo.data(), hi.data());
    const int64_t K2 = (int64_t)K * K;
    std::vector<uint64_t> bm3(lut3 ? (size_t)((K2 * K + 63) / 64) : 0);
    std::vector<uint64_t> bm2(lut2 ? (size_t)((K2 + 63) / 64) : 0);
    if (lut3) emit_short_bitmap(lut3, K2 * K, bm3.data());
    if (lut2) emit_short_bitmap(lut2, K2, bm2.data());
    const uint64_t* b3 = lut3 ? bm3.data() : NULL;
    const uint64_t* b2 = lut2 ? bm2.data() : NULL;
    auto work = [&](int64_t c) {
        int64_t cnt = 0;
        int64_t i = lo[c];
#if defined(__AVX512F__)
        if (b3 && !b2 && !lut1) {  // l3-only: vector fast path
            while (i < hi[c] && i < 2) {
                ++i;  // lanes would read before the stream
            }
            for (; i + 16 <= hi[c]; i += 16)
                cnt += __builtin_popcount(
                    emit_short_l3_mask16(cls, i, K, K2, b3));
        }
#endif
        for (; i < hi[c]; ++i) {
            const int32_t c0 = cls[i];
            if (b3 && i >= 2) {
                int64_t g3 =
                    (int64_t)cls[i - 2] * K2 + (int64_t)cls[i - 1] * K + c0;
                if ((b3[g3 >> 6] >> (g3 & 63)) & 1) ++cnt;
            }
            if (b2 && i >= 1) {
                int64_t g2 = (int64_t)cls[i - 1] * K + c0;
                if ((b2[g2 >> 6] >> (g2 & 63)) & 1) ++cnt;
            }
            if (lut1 && lut1[c0] >= 0) ++cnt;
        }
        chunk_counts[c] = cnt;
    };
    if (nchunks <= 1) {
        if (nchunks == 1) work(0);
    } else {
        std::vector<std::thread> ts;
        for (int64_t c = 0; c < nchunks; ++c)
            ts.emplace_back(work, c);
        for (auto& t : ts) t.join();
    }
    int64_t total = 0;
    for (int64_t c = 0; c < nchunks; ++c) total += chunk_counts[c];
    return total;
}

int64_t aho_emit_short_fill_mt(const int32_t* cls, int64_t n, int32_t K,
                               int64_t vstart, const int32_t* lut1,
                               const int32_t* lut2, const int32_t* lut3,
                               const int64_t* chunk_counts, int64_t nchunks,
                               int64_t* out_pos, int32_t* out_id,
                               int64_t* written) {
    std::vector<int64_t> lo(nchunks), hi(nchunks), off(nchunks);
    emit_short_geometry(n, vstart, nchunks, lo.data(), hi.data());
    int64_t acc = 0;
    for (int64_t c = 0; c < nchunks; ++c) {
        off[c] = acc;
        acc += chunk_counts[c];
    }
    const int64_t K2 = (int64_t)K * K;
    std::vector<uint64_t> bm3(lut3 ? (size_t)((K2 * K + 63) / 64) : 0);
    std::vector<uint64_t> bm2(lut2 ? (size_t)((K2 + 63) / 64) : 0);
    if (lut3) emit_short_bitmap(lut3, K2 * K, bm3.data());
    if (lut2) emit_short_bitmap(lut2, K2, bm2.data());
    const uint64_t* b3 = lut3 ? bm3.data() : NULL;
    const uint64_t* b2 = lut2 ? bm2.data() : NULL;
    auto work = [&](int64_t c) {
        int64_t k = 0;
        const int64_t cap = chunk_counts[c];
        int64_t* op = out_pos + off[c];
        int32_t* oi = out_id + off[c];
        int64_t i = lo[c];
#if defined(__AVX512F__)
        if (b3 && !b2 && !lut1) {  // l3-only: vector detect, scalar emit
            while (i < hi[c] && i < 2) ++i;
            for (; i + 16 <= hi[c] && k + 16 <= cap; i += 16) {
                uint16_t m = emit_short_l3_mask16(cls, i, K, K2, b3);
                while (m) {
                    const int j = __builtin_ctz(m);
                    m = (uint16_t)(m & (m - 1));
                    const int64_t p = i + j;
                    const int64_t g3 = (int64_t)cls[p - 2] * K2 +
                                       (int64_t)cls[p - 1] * K + cls[p];
                    op[k] = p;
                    oi[k] = lut3[g3];
                    ++k;
                }
            }
        }
#endif
        for (; i < hi[c] && k < cap; ++i) {
            const int32_t c0 = cls[i];
            if (b3 && i >= 2 && k < cap) {
                int64_t g3 =
                    (int64_t)cls[i - 2] * K2 + (int64_t)cls[i - 1] * K + c0;
                if ((b3[g3 >> 6] >> (g3 & 63)) & 1) {
                    op[k] = i;
                    oi[k] = lut3[g3];
                    ++k;
                }
            }
            if (b2 && i >= 1 && k < cap) {
                int64_t g2 = (int64_t)cls[i - 1] * K + c0;
                if ((b2[g2 >> 6] >> (g2 & 63)) & 1) {
                    op[k] = i;
                    oi[k] = lut2[g2];
                    ++k;
                }
            }
            if (lut1 && k < cap) {
                int32_t id = lut1[c0];
                if (id >= 0) { op[k] = i; oi[k] = id; ++k; }
            }
        }
        written[c] = k;
    };
    if (nchunks <= 1) {
        if (nchunks == 1) work(0);
    } else {
        std::vector<std::thread> ts;
        for (int64_t c = 0; c < nchunks; ++c)
            ts.emplace_back(work, c);
        for (auto& t : ts) t.join();
    }
    // compact interior gaps (only possible if cls was mutated between the
    // count and fill passes): move each chunk's entries up against the
    // previous chunk's tail, sequentially
    int64_t w = written[0];
    for (int64_t c = 1; c < nchunks; ++c) {
        if (off[c] != w && written[c]) {
            std::memmove(out_pos + w, out_pos + off[c],
                         written[c] * sizeof(int64_t));
            std::memmove(out_id + w, out_id + off[c],
                         written[c] * sizeof(int32_t));
        }
        w += written[c];
    }
    return w;
}

}  // extern "C"
