// scenecore: native host-side runtime components for paperrenderer_tpu.
//
// The reference's runtime is C++ end-to-end; the pieces that remain
// host-side in the TPU build (allocation bookkeeping, staging delta packing,
// spatial sorting for topology rebuilds) are implemented here and exposed
// through a plain C ABI consumed via ctypes (core/native.py).
//
// Components:
//   1. FragmentableArena — offset allocator with best-fit free-list reuse and
//      compaction planning. Behavioral parity with the reference's
//      FragmentableBuffer (src/PaperRenderer/VulkanResources.cpp:332-542):
//      stack allocation, removeFromRange fragments, best-fit reuse by size,
//      compact() producing relocation records.
//   2. DeltaPacker — packs dirty instance SoA rows into dense staging
//      batches (the hot loop of Scene.flush for large host-driven scenes;
//      parity: RendererStagingBuffer batch copies, StagingBuffer.cpp:73-151).
//   3. morton3d — 63-bit morton codes for host-side spatial sorts
//      (static-mapping builds).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <vector>

#define API extern "C" __attribute__((visibility("default")))

// ---------------------------------------------------------------------------
// 1. FragmentableArena
// ---------------------------------------------------------------------------

namespace {

struct Fragment {
    uint64_t offset;
    uint64_t size;
};

struct FragmentableArena {
    uint64_t capacity;
    uint64_t stack_top;                 // high-water mark
    uint64_t alignment;
    // free fragments ordered by size for best-fit (multiset-by-size parity
    // with the reference's std::multiset keyed on fragment size)
    std::multimap<uint64_t, uint64_t> free_by_size;  // size -> offset
    std::map<uint64_t, uint64_t> live;               // offset -> size
};

uint64_t align_up(uint64_t v, uint64_t a) { return (v + a - 1) / a * a; }

}  // namespace

API FragmentableArena* arena_create(uint64_t capacity, uint64_t alignment) {
    auto* a = new FragmentableArena();
    a->capacity = capacity;
    a->stack_top = 0;
    a->alignment = alignment ? alignment : 1;
    return a;
}

API void arena_destroy(FragmentableArena* a) { delete a; }

// Returns the allocated offset, or UINT64_MAX when out of memory
// (the caller grows + retries — the reference's OUT_OF_MEMORY contract,
// VulkanResources.cpp:371-403).
API uint64_t arena_alloc(FragmentableArena* a, uint64_t size) {
    size = align_up(size, a->alignment);
    // best-fit over freed fragments first
    auto it = a->free_by_size.lower_bound(size);
    if (it != a->free_by_size.end()) {
        uint64_t frag_size = it->first;
        uint64_t offset = it->second;
        a->free_by_size.erase(it);
        if (frag_size > size) {
            // return the tail of the fragment to the free list
            a->free_by_size.emplace(frag_size - size, offset + size);
        }
        a->live.emplace(offset, size);
        return offset;
    }
    // stack path
    if (a->stack_top + size > a->capacity) return UINT64_MAX;
    uint64_t offset = a->stack_top;
    a->stack_top += size;
    a->live.emplace(offset, size);
    return offset;
}

API int arena_free(FragmentableArena* a, uint64_t offset) {
    auto it = a->live.find(offset);
    if (it == a->live.end()) return -1;
    uint64_t size = it->second;
    a->live.erase(it);
    if (offset + size == a->stack_top) {
        a->stack_top = offset;  // top-of-stack free shrinks directly
    } else {
        a->free_by_size.emplace(size, offset);
    }
    return 0;
}

API uint64_t arena_stack_top(const FragmentableArena* a) { return a->stack_top; }
API uint64_t arena_live_bytes(const FragmentableArena* a) {
    uint64_t s = 0;
    for (auto& kv : a->live) s += kv.second;
    return s;
}
API uint64_t arena_live_count(const FragmentableArena* a) { return a->live.size(); }

// Compaction: shift live ranges down to close every gap. Emits relocation
// triplets (old_offset, new_offset, size) into the caller's buffers (capacity
// given by max_moves); returns the number of moves, and writes the new dense
// stack top to *new_top. Mirrors FragmentableBuffer::compact's relocation
// callback (VulkanResources.cpp:424-542).
API int64_t arena_compact(FragmentableArena* a,
                          uint64_t* old_offsets, uint64_t* new_offsets,
                          uint64_t* sizes, int64_t max_moves,
                          uint64_t* new_top) {
    int64_t n = 0;
    uint64_t cursor = 0;
    std::map<uint64_t, uint64_t> relocated;
    for (auto& kv : a->live) {
        uint64_t off = kv.first, size = kv.second;
        if (off != cursor) {
            if (n >= max_moves) return -1;  // caller must pass enough room
            old_offsets[n] = off;
            new_offsets[n] = cursor;
            sizes[n] = size;
            ++n;
        }
        relocated.emplace(cursor, size);
        cursor += size;
    }
    a->live.swap(relocated);
    a->free_by_size.clear();
    a->stack_top = cursor;
    if (new_top) *new_top = cursor;
    return n;
}

// ---------------------------------------------------------------------------
// 2. DeltaPacker — dirty-row packing for instance SoA staging
// ---------------------------------------------------------------------------

namespace {

struct DeltaPacker {
    int64_t capacity;
    std::vector<float> pos;      // [cap*3]
    std::vector<float> scale;    // [cap*3]
    std::vector<float> quat;     // [cap*4]
    std::vector<int32_t> model;  // [cap]
    std::vector<uint8_t> dirty;  // bitset-as-bytes
    std::vector<int32_t> dirty_list;  // insertion-ordered unique indices
};

}  // namespace

API DeltaPacker* packer_create(int64_t capacity) {
    auto* p = new DeltaPacker();
    p->capacity = capacity;
    p->pos.assign(capacity * 3, 0.f);
    p->scale.assign(capacity * 3, 1.f);
    p->quat.assign(capacity * 4, 0.f);
    for (int64_t i = 0; i < capacity; ++i) p->quat[i * 4] = 1.f;
    p->model.assign(capacity, -1);
    p->dirty.assign(capacity, 0);
    return p;
}

API void packer_destroy(DeltaPacker* p) { delete p; }
API int64_t packer_capacity(const DeltaPacker* p) { return p->capacity; }

API void packer_grow(DeltaPacker* p, int64_t new_capacity) {
    if (new_capacity <= p->capacity) return;
    p->pos.resize(new_capacity * 3, 0.f);
    p->scale.resize(new_capacity * 3, 1.f);
    p->quat.resize(new_capacity * 4, 0.f);
    for (int64_t i = p->capacity; i < new_capacity; ++i) p->quat[i * 4] = 1.f;
    p->model.resize(new_capacity, -1);
    p->dirty.resize(new_capacity, 0);
    p->capacity = new_capacity;
}

// Direct SoA views for zero-copy full uploads (numpy frombuffer).
API float* packer_pos(DeltaPacker* p) { return p->pos.data(); }
API float* packer_scale(DeltaPacker* p) { return p->scale.data(); }
API float* packer_quat(DeltaPacker* p) { return p->quat.data(); }
API int32_t* packer_model(DeltaPacker* p) { return p->model.data(); }

API void packer_set(DeltaPacker* p, int64_t i, const float* pos3,
                    const float* scale3, const float* quat4, int32_t model_id,
                    int32_t set_model) {
    if (i < 0 || i >= p->capacity) return;
    if (pos3) std::memcpy(&p->pos[i * 3], pos3, 3 * sizeof(float));
    if (scale3) std::memcpy(&p->scale[i * 3], scale3, 3 * sizeof(float));
    if (quat4) std::memcpy(&p->quat[i * 4], quat4, 4 * sizeof(float));
    if (set_model) p->model[i] = model_id;
    if (!p->dirty[i]) {
        p->dirty[i] = 1;
        p->dirty_list.push_back((int32_t)i);
    }
}

// swap-remove: moves row `last` into slot `i`, marks both dirty
// (addObject/removeObject parity, PaperRenderer.cpp:255-306)
API void packer_swap_remove(DeltaPacker* p, int64_t i, int64_t last) {
    if (i < 0 || last < 0 || i >= p->capacity || last >= p->capacity) return;
    if (i != last) {
        std::memcpy(&p->pos[i * 3], &p->pos[last * 3], 3 * sizeof(float));
        std::memcpy(&p->scale[i * 3], &p->scale[last * 3], 3 * sizeof(float));
        std::memcpy(&p->quat[i * 4], &p->quat[last * 4], 4 * sizeof(float));
        p->model[i] = p->model[last];
        if (!p->dirty[i]) { p->dirty[i] = 1; p->dirty_list.push_back((int32_t)i); }
    }
    p->model[last] = -1;
    if (!p->dirty[last]) { p->dirty[last] = 1; p->dirty_list.push_back((int32_t)last); }
}

API int64_t packer_dirty_count(const DeltaPacker* p) {
    return (int64_t)p->dirty_list.size();
}

// Pack up to max_rows dirty rows into dense output arrays and clear their
// dirty bits; returns rows packed. Out arrays: idx[max], pos[max*3],
// scale[max*3], quat[max*4], model[max].
API int64_t packer_pack(DeltaPacker* p, int64_t max_rows, int32_t* idx,
                        float* pos, float* scale, float* quat, int32_t* model) {
    int64_t n = std::min<int64_t>(max_rows, (int64_t)p->dirty_list.size());
    for (int64_t j = 0; j < n; ++j) {
        int32_t i = p->dirty_list[j];
        idx[j] = i;
        std::memcpy(&pos[j * 3], &p->pos[i * 3], 3 * sizeof(float));
        std::memcpy(&scale[j * 3], &p->scale[i * 3], 3 * sizeof(float));
        std::memcpy(&quat[j * 4], &p->quat[i * 4], 4 * sizeof(float));
        model[j] = p->model[i];
        p->dirty[i] = 0;
    }
    p->dirty_list.erase(p->dirty_list.begin(), p->dirty_list.begin() + n);
    return n;
}

API void packer_clear_dirty(DeltaPacker* p) {
    for (int32_t i : p->dirty_list) p->dirty[i] = 0;
    p->dirty_list.clear();
}

// ---------------------------------------------------------------------------
// 3. morton3d — 63-bit morton codes (21 bits/axis) over an AABB
// ---------------------------------------------------------------------------

namespace {
inline uint64_t spread21(uint64_t v) {
    v &= 0x1fffff;
    v = (v | (v << 32)) & 0x1f00000000ffffULL;
    v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
    v = (v | (v << 8)) & 0x100f00f00f00f00fULL;
    v = (v | (v << 4)) & 0x10c30c30c30c30c3ULL;
    v = (v | (v << 2)) & 0x1249249249249249ULL;
    return v;
}
}  // namespace

API void morton3d(const float* points, int64_t n, const float* lo,
                  const float* hi, uint64_t* out) {
    float ext[3];
    for (int k = 0; k < 3; ++k) {
        ext[k] = hi[k] - lo[k];
        if (ext[k] < 1e-12f) ext[k] = 1e-12f;
    }
    for (int64_t i = 0; i < n; ++i) {
        uint64_t g[3];
        for (int k = 0; k < 3; ++k) {
            float q = (points[i * 3 + k] - lo[k]) / ext[k];
            if (q < 0.f) q = 0.f;
            if (q > 1.f) q = 1.f;
            uint64_t gi = (uint64_t)(q * 2097151.0f);
            if (gi > 2097151) gi = 2097151;
            g[k] = gi;
        }
        out[i] = (spread21(g[0]) << 2) | (spread21(g[1]) << 1) | spread21(g[2]);
    }
}
