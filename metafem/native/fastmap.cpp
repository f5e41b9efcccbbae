// Native host kernels for metafem's setup pipeline.
//
// The assembly setup inverts contribution->slot maps over O(100M)
// entries; numpy's comparison argsort costs O(N log N) with large
// constants (~minutes at cylinder-flow scale).  These counting-sort
// passes are O(N) and memory-bandwidth bound (~1 s at the same scale).
//
// Built on demand with g++ -O3 -shared (see native/__init__.py), called
// through ctypes — no extension-module build step required.

#include <cstdint>
#include <cstring>

extern "C" {

// Pass 1: per-slot counts.  slots: [n] in [0, num).
void count_slots(const int64_t* slots, int64_t n, int64_t num,
                 int64_t* counts) {
    std::memset(counts, 0, sizeof(int64_t) * num);
    for (int64_t i = 0; i < n; ++i) counts[slots[i]]++;
}

// Pass 2: fill the padded gather map (gmap[num*cap], sentinel = n) and
// the overflow COO (indices into the data vector + destination slots).
// cursor: scratch [num] (zero-initialized by caller or reused).
// Returns the number of overflow entries written.
int64_t fill_gather_map(const int64_t* slots, int64_t n, int64_t num,
                        int32_t cap, int32_t* gmap, int64_t* cursor,
                        int32_t* of_src, int32_t* of_dst) {
    for (int64_t s = 0; s < num * (int64_t)cap; ++s) gmap[s] = (int32_t)n;
    std::memset(cursor, 0, sizeof(int64_t) * num);
    int64_t n_of = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t s = slots[i];
        const int64_t k = cursor[s]++;
        if (k < cap) {
            gmap[s * cap + k] = (int32_t)i;
        } else {
            of_src[n_of] = (int32_t)i;
            of_dst[n_of] = (int32_t)s;
            ++n_of;
        }
    }
    return n_of;
}

// Dedup of packed int64 keys (pair-key dedup for the sparsity pattern):
// counting by bucketed radix would need key range; here keys are
// ci * n_cp + cj < n_cp^2 which can reach 1e12, so we instead assign
// group ids with a two-pass scheme over the *per-row* structure:
// key = ci * n_cp + cj; rows ci < n_cp are small, so bucket by ci.
// uniq_out must have capacity n; inv_out [n].
// Returns the number of unique keys.
int64_t unique_pairs(const int64_t* ci, const int64_t* cj, int64_t n,
                     int64_t n_cp, int64_t* row_counts /* scratch n_cp+1 */,
                     int64_t* row_starts /* scratch n_cp+1 */,
                     int64_t* scratch_idx /* scratch n */,
                     int64_t* uniq_ci, int64_t* uniq_cj,
                     int64_t* inv_out) {
    // bucket contributions by row ci
    std::memset(row_counts, 0, sizeof(int64_t) * (n_cp + 1));
    for (int64_t i = 0; i < n; ++i) row_counts[ci[i]]++;
    row_starts[0] = 0;
    for (int64_t r = 0; r < n_cp; ++r)
        row_starts[r + 1] = row_starts[r] + row_counts[r];
    // place indices row-major
    int64_t* cursor = row_counts;  // reuse as cursors
    for (int64_t r = 0; r < n_cp; ++r) cursor[r] = row_starts[r];
    for (int64_t i = 0; i < n; ++i) scratch_idx[cursor[ci[i]]++] = i;
    // per-row: sort by cj (insertion into small per-row set via simple
    // counting over a local map is overkill; rows are ~10-100 wide, use
    // in-place insertion sort on the row slice)
    int64_t n_uniq = 0;
    for (int64_t r = 0; r < n_cp; ++r) {
        const int64_t lo = row_starts[r], hi = row_starts[r + 1];
        // insertion sort of scratch_idx[lo:hi] by cj value
        for (int64_t a = lo + 1; a < hi; ++a) {
            const int64_t v = scratch_idx[a];
            const int64_t key = cj[v];
            int64_t b = a - 1;
            while (b >= lo && cj[scratch_idx[b]] > key) {
                scratch_idx[b + 1] = scratch_idx[b];
                --b;
            }
            scratch_idx[b + 1] = v;
        }
        int64_t prev = -1;
        for (int64_t a = lo; a < hi; ++a) {
            const int64_t v = scratch_idx[a];
            if (cj[v] != prev) {
                uniq_ci[n_uniq] = r;
                uniq_cj[n_uniq] = cj[v];
                prev = cj[v];
                ++n_uniq;
            }
            inv_out[v] = n_uniq - 1;
        }
    }
    return n_uniq;
}

}  // extern "C"
