// Native host runtime for iqtree2_tpu: the CPU-side components that the
// reference implements in C/C++ and that dominate HOST time at scale —
// alignment pattern compression (reference: Alignment::buildPattern,
// alignment/alignment.cpp:1725), bit-parallel Fitch parsimony
// (tree/phylotreepars.cpp:32), and the streaming-kernel schedule planner
// (the TPU-side analog of the traversal scheduler,
// tree/phylokernelnew.h:1150 + memslot allocation, tree/memslot.h:44).
//
// Exposed through a plain C ABI consumed by iqtree2_tpu/native.py via
// ctypes; every entry point is pure (caller-allocated buffers, no global
// state) so the Python fallbacks remain drop-in equivalent.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <string>
#include <algorithm>
#include <queue>

extern "C" {

// ---------------------------------------------------------------------
// Pattern compression: site columns -> unique patterns + weights.
// codes: [L * nsites] int32 (taxon-major rows); outputs:
//   out_patterns [L * nsites] (only the first n_pat columns valid),
//   out_weights [nsites], out_site2pat [nsites].
// Returns the number of unique patterns.
int64_t it2_compress_patterns(const int32_t* codes, int64_t L,
                              int64_t nsites, int32_t* out_patterns,
                              double* out_weights,
                              int32_t* out_site2pat) {
    std::unordered_map<std::string, int64_t> seen;
    seen.reserve(static_cast<size_t>(nsites) * 2);
    std::string key(static_cast<size_t>(L) * sizeof(int32_t), '\0');
    std::vector<int32_t> col(L);
    int64_t n_pat = 0;
    for (int64_t s = 0; s < nsites; s++) {
        for (int64_t t = 0; t < L; t++) col[t] = codes[t * nsites + s];
        std::memcpy(&key[0], col.data(), key.size());
        auto it = seen.find(key);
        if (it == seen.end()) {
            int64_t p = n_pat++;
            seen.emplace(key, p);
            for (int64_t t = 0; t < L; t++)
                out_patterns[t * nsites + p] = col[t];
            out_weights[p] = 1.0;
            out_site2pat[s] = static_cast<int32_t>(p);
        } else {
            out_weights[it->second] += 1.0;
            out_site2pat[s] = static_cast<int32_t>(it->second);
        }
    }
    return n_pat;
}

// ---------------------------------------------------------------------
// Bit-parallel weighted Fitch score over a postorder schedule.
// masks: [L * P] uint64 state bitmasks; w: [P] weights;
// child_src: [n_int * 2] unified child rows (tips < L, internal L+i).
// Scratch: sets [(L + n_int) * P] uint64 is caller-allocated.
double it2_fitch_score(const uint64_t* masks, const double* w,
                       const int32_t* child_src, int64_t n_int,
                       int64_t L, int64_t P, uint64_t* sets) {
    std::memcpy(sets, masks,
                static_cast<size_t>(L) * P * sizeof(uint64_t));
    double cost = 0.0;
    for (int64_t i = 0; i < n_int; i++) {
        const uint64_t* a = sets + static_cast<int64_t>(
            child_src[2 * i]) * P;
        const uint64_t* b = sets + static_cast<int64_t>(
            child_src[2 * i + 1]) * P;
        uint64_t* o = sets + (L + i) * P;
        for (int64_t p = 0; p < P; p++) {
            uint64_t inter = a[p] & b[p];
            if (inter) {
                o[p] = inter;
            } else {
                o[p] = a[p] | b[p];
                cost += w[p];
            }
        }
    }
    return cost;
}

// ---------------------------------------------------------------------
// Streaming-kernel schedule planner (plan2 phases 1 + 2).
// Inputs: child_src [n_int * 2] (unified rows), L, G.
// Outputs (caller-allocated, sizes in the Python wrapper):
//   step_of [n_int], slot_of [n_int], src_blk [n_steps_cap * 2],
//   dst_row [n_int] (CS-pitch applied by Python), dst_sc [n_int].
// Returns (n_steps << 32) | ring_blocks, or -1 on failure.
int64_t it2_plan_stream(const int32_t* child_src, int64_t n_int,
                        int64_t L, int64_t G,
                        int32_t* step_of, int32_t* slot_of,
                        int32_t* src_blk, int64_t src_blk_cap,
                        int32_t* dst_blk, int32_t* dst_slot) {
    std::vector<int32_t> n_left(n_int, 0);
    std::vector<int32_t> parent(n_int, -1), pside(n_int, 0);
    for (int64_t i = 0; i < n_int; i++) {
        for (int k = 0; k < 2; k++) {
            int64_t s = child_src[2 * i + k];
            if (s >= L) {
                n_left[i]++;
                parent[s - L] = static_cast<int32_t>(i);
                pside[s - L] = k;
            }
        }
    }
    // ready heap: (consume-live-first, postorder index)
    using Pr = std::pair<int, int64_t>;
    std::priority_queue<Pr, std::vector<Pr>, std::greater<Pr>> ready;
    for (int64_t i = 0; i < n_int; i++)
        if (n_left[i] == 0)
            ready.push({child_src[2 * i] >= L ||
                        child_src[2 * i + 1] >= L ? 0 : 1, i});
    int64_t done = 0, n_steps = 0;
    std::vector<std::vector<int64_t>> steps;
    while (done < n_int) {
        std::vector<int64_t> cur;
        while (!ready.empty() && static_cast<int64_t>(cur.size()) < G) {
            cur.push_back(ready.top().second);
            ready.pop();
        }
        if (cur.empty()) return -1;
        for (size_t g = 0; g < cur.size(); g++) {
            step_of[cur[g]] = static_cast<int32_t>(n_steps);
            slot_of[cur[g]] = static_cast<int32_t>(g);
        }
        done += static_cast<int64_t>(cur.size());
        for (int64_t i : cur) {
            int32_t p = parent[i];
            if (p >= 0 && --n_left[p] == 0)
                ready.push({child_src[2 * p] >= L ||
                            child_src[2 * p + 1] >= L ? 0 : 1, p});
        }
        steps.push_back(std::move(cur));
        n_steps++;
    }
    if (n_steps * 2 > src_blk_cap) return -1;

    // interval coloring of (step, side) RHS blocks
    std::vector<int32_t> first_write(n_steps * 2, -1);
    for (int64_t i = 0; i < n_int; i++) {
        int32_t p = parent[i];
        if (p < 0) continue;
        int64_t slot2 = static_cast<int64_t>(step_of[p]) * 2 + pside[i];
        if (first_write[slot2] < 0 || step_of[i] < first_write[slot2])
            first_write[slot2] = step_of[i];
    }
    struct Iv { int32_t start, end, s, side; };
    std::vector<Iv> ivs;
    for (int64_t s = 0; s < n_steps; s++)
        for (int side = 0; side < 2; side++)
            if (first_write[s * 2 + side] >= 0)
                ivs.push_back({first_write[s * 2 + side],
                               static_cast<int32_t>(s),
                               static_cast<int32_t>(s), side});
    // identical tuple order to the Python planner (start, end, s, side)
    std::sort(ivs.begin(), ivs.end(),
              [](const Iv& a, const Iv& b) {
                  if (a.start != b.start) return a.start < b.start;
                  if (a.end != b.end) return a.end < b.end;
                  if (a.s != b.s) return a.s < b.s;
                  return a.side < b.side;
              });
    for (int64_t i = 0; i < n_steps * 2; i++) src_blk[i] = 0;
    std::priority_queue<Pr, std::vector<Pr>, std::greater<Pr>> active;
    std::vector<int32_t> freed;
    int32_t next_blk = 1;
    for (const Iv& iv : ivs) {
        while (!active.empty() &&
               active.top().first <= iv.start) {
            freed.push_back(static_cast<int32_t>(active.top().second));
            active.pop();
        }
        int32_t b;
        if (!freed.empty()) {
            b = freed.back();
            freed.pop_back();
        } else {
            b = next_blk++;
        }
        src_blk[static_cast<int64_t>(iv.s) * 2 + iv.side] = b;
        active.push({iv.end, b});
    }
    // destination block/slot per node
    for (int64_t i = 0; i < n_int; i++) {
        int32_t p = parent[i];
        if (p < 0) {
            dst_blk[i] = -2;
            dst_slot[i] = -1;
        } else {
            dst_blk[i] = src_blk[static_cast<int64_t>(step_of[p]) * 2 +
                                 pside[i]];
            dst_slot[i] = slot_of[p];
        }
    }
    int64_t ring_blocks = std::max<int64_t>(next_blk, 2);
    return (n_steps << 32) | ring_blocks;
}

}  // extern "C"
