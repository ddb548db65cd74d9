"""Two-level acceleration structure: persistent BLAS + per-frame TLAS.

Reference parity: the reference builds one BLAS per model at creation
(src/PaperRenderer/Model.cpp:59-74), and per frame only rewrites dirty TLAS
instance records on-device and rebuilds the instance-level TLAS
(src/PaperRenderer/AccelerationStructure.cpp:618-650, TLASInstBuild.comp).
Round-1 of this framework re-transformed every vertex of every instance and
rebuilt a world BVH each RT frame; this module is the TPU-native two-level
redesign:

  * **BLAS** — per model (or per unique-geometry instance): an implicit
    morton BVH over its LOD-0 triangles in OBJECT space, built once at
    registration time (host numpy; models are immutable, Model.h:130-157).
  * **TLAS** — per frame, per ray-trace pass: an implicit morton BVH over
    the *instances'* world AABBs. Cost is O(N) vector math + one N-key sort
    — no vertex transforms (the updateTLAS analogue).

Both levels live in ONE unified node table ``f32[*, 16]``:

    [min0(3) max0(3) min1(3) max1(3) code0 code1 pad pad]

where ``code`` is a bitcast int32 tagged pointer:

    bit 30          object-space flag (the row's boxes are in BLAS space)
    bits 29..28     type: 0 = box row, 1 = BLAS leaf, 2 = instance
    bits 27..0      payload (row index / leaf row / instance slot)

so traversal is a single pointer-chasing machine: popping an *instance* code
gathers that instance's inverse TRS (stored as a node row too), switches the
ray into object space, and pushes the instance's BLAS root; ray ``t`` is
shared across spaces because the object-space direction is NOT normalized.
BLAS leaves pack K triangles' object-space vertices + uvs + tagged prim ids
into exactly 128 floats, so a leaf visit costs ONE row gather.

Multiple TLASes (reference RayTrace.h:50-56 addNewTLAS) are just multiple
row blocks appended after the shared BLAS/instance rows, each with its own
root code. Unique-geometry animation (Model.cpp:398-404) gives an instance
its own BLAS whose leaf/node rows are refit in-graph each frame.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scene import InstanceArrays
from ..core.transforms import quat_to_mat3, transform_aabb, trs_to_mat34
from .bvh import morton_codes

K = 8                      # triangles per BLAS leaf
LEAF_ROW = K * 15          # 120: K*9 positions + K*6 uvs (f32 leaf row)
_POS = 0                   # leaf row layout offsets
_UV = K * 9                # 72
# Tagged prim ids and child codes live in SEPARATE i32 arrays, never bitcast
# into f32 rows: TPU data movement (concatenate and friends) flushes f32
# denormals to zero, and small int bit patterns (< 0x00800000) ARE denormals
# — instance self-ids silently became 0 when stored that way.

TYPE_BOX = 0
TYPE_LEAF = 1
TYPE_INST = 2
OBJ_FLAG = 1 << 30
_TYPE_SHIFT = 28
_PAYLOAD_MASK = (1 << 28) - 1


def _code(typ: int, payload, obj: bool = False):
    base = (typ << _TYPE_SHIFT) | (OBJ_FLAG if obj else 0)
    return base | payload


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length() if n > 1 else 1


# ---------------------------------------------------------------------------
# BLAS build (host, numpy — models are immutable and registered rarely)
# ---------------------------------------------------------------------------

def _morton30_np(p: np.ndarray) -> np.ndarray:
    lo = p.min(axis=0)
    ext = np.maximum(p.max(axis=0) - lo, 1e-12)
    q = np.clip((p - lo) / ext * 1023.0, 0, 1023).astype(np.uint32)

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x249249249249)
        return v

    return (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) | spread(q[:, 2])


def _median_order(centroid: np.ndarray, slots: int) -> np.ndarray:
    """Leaf-slot permutation by recursive widest-axis median splits.

    The BLAS is an implicit complete binary tree over ``slots``/K leaves, so
    tree TOPOLOGY is fixed and quality is set entirely by the leaf ORDER.
    Raw morton order (the classic LBVH) leaves straddle-split boxes on
    irregular geometry; recursive median partition over triangle centroids
    gives object-median-BVH boxes with the same implicit build/refit
    machinery. Partial populations left-pack: dead slots (-1) keep inf/-inf
    leaf boxes that every slab test rejects.

    Replaces the driver's BLAS builder quality knob
    (vkGetAccelerationStructureBuildSizesKHR PREFER_FAST_TRACE,
    reference AccelerationStructure.cpp:218-271)."""
    t = centroid.shape[0]
    out = np.full(slots, -1, np.int64)
    stack = [(np.arange(t, dtype=np.int64), 0, slots)]
    while stack:
        ids, base, n = stack.pop()
        if len(ids) == 0:
            continue
        if n <= K:
            out[base:base + len(ids)] = ids
            continue
        half = n // 2
        k = min(half, len(ids))
        c = centroid[ids]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        if k < len(ids):
            part = np.argpartition(c[:, ax], k - 1)
            left, right = ids[part[:k]], ids[part[k:]]
        else:
            left, right = ids, ids[:0]
        stack.append((right, base + half, n - half))
        stack.append((left, base, half))
    return out


@dataclasses.dataclass
class _BLASBuild:
    """One BLAS's host-side build products (pre-offset-fixup)."""

    num_leaves: int          # L (power of two for implicit builds)
    leaf_order: np.ndarray   # i64[L*K] arena tri id per leaf slot (-1 pad)
    leaf_rows: np.ndarray    # f32[L, 120] positions + uvs
    leaf_nrm: np.ndarray     # f32[L, 72] object-space vertex normals
    leaf_prim: np.ndarray    # i32[L, K] tagged prim ids ((slot<<24)|tri, -1 pad)
    node_min: np.ndarray     # f32[2L-1, 3] (explicit builds: [L-1, 3], root=0)
    node_max: np.ndarray     # f32[2L-1, 3]
    depth: int
    # explicit-topology (SAH) builds: per-node child boxes + local child
    # links; None -> implicit complete tree over the leaf slots
    node_rows: np.ndarray = None    # f32[L-1, 12] child boxes
    child_kind: np.ndarray = None   # i8[L-1, 2] 0=box child, 1=leaf child
    child_idx: np.ndarray = None    # i32[L-1, 2] local child indices


def _build_blas_host(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,   # f32[T, 3] object space
    uv0: np.ndarray, uv1: np.ndarray, uv2: np.ndarray,  # f32[T, 2]
    prim_tagged: np.ndarray,                           # i32[T] (slot<<24)|tri
    n0: np.ndarray = None, n1: np.ndarray = None, n2: np.ndarray = None,
) -> _BLASBuild:
    t = v0.shape[0]
    centroid = (v0 + v1 + v2) / 3.0
    l = _next_pow2(-(-t // K))
    slots = l * K

    leaf_order = _median_order(centroid, slots)
    lo = np.full((slots, 3), np.inf, np.float32)
    hi = np.full((slots, 3), -np.inf, np.float32)
    rows = np.zeros((l, LEAF_ROW), np.float32)

    vs = np.concatenate([v0, v1, v2], axis=-1).astype(np.float32)   # [T, 9]
    uvs = np.concatenate([uv0, uv1, uv2], axis=-1).astype(np.float32)  # [T, 6]
    if n0 is None:
        ns = np.tile(np.asarray([0, 0, 1] * 3, np.float32), (t, 1))
    else:
        ns = np.concatenate([n0, n1, n2], axis=-1).astype(np.float32)  # [T, 9]
    pos9 = np.zeros((slots, 9), np.float32)
    uv6 = np.zeros((slots, 6), np.float32)
    nrm9 = np.zeros((slots, 9), np.float32)
    prim = np.full(slots, -1, np.int32)
    live = leaf_order >= 0        # dead slots interleave (left-packed runs)
    src = leaf_order[live]
    pos9[live] = vs[src]
    uv6[live] = uvs[src]
    nrm9[live] = ns[src]
    prim[live] = prim_tagged[src]
    tri_min = np.minimum(np.minimum(pos9[:, 0:3], pos9[:, 3:6]), pos9[:, 6:9])
    tri_max = np.maximum(np.maximum(pos9[:, 0:3], pos9[:, 3:6]), pos9[:, 6:9])
    lo[live] = tri_min[live]
    hi[live] = tri_max[live]

    # leaf rows store (a, e1=b-a, e2=c-a): Möller-Trumbore consumes the
    # edges directly, dropping 6 scalar subtractions per triangle test from
    # every traversal kernel's leaf step (AABBs above use the vertices)
    pos9[:, 3:6] -= pos9[:, 0:3]
    pos9[:, 6:9] -= pos9[:, 0:3]
    rows[:, _POS:_UV] = pos9.reshape(l, K * 9)
    rows[:, _UV:LEAF_ROW] = uv6.reshape(l, K * 6)

    leaf_min = lo.reshape(l, K, 3).min(axis=1)
    leaf_max = hi.reshape(l, K, 3).max(axis=1)
    levels_min = [leaf_min]
    levels_max = [leaf_max]
    while levels_min[0].shape[0] > 1:
        cur_min, cur_max = levels_min[0], levels_max[0]
        levels_min.insert(0, np.minimum(cur_min[0::2], cur_min[1::2]))
        levels_max.insert(0, np.maximum(cur_max[0::2], cur_max[1::2]))
    node_min = np.concatenate(levels_min, axis=0)
    node_max = np.concatenate(levels_max, axis=0)
    return _BLASBuild(
        num_leaves=l, leaf_order=leaf_order, leaf_rows=rows,
        leaf_nrm=nrm9.reshape(l, K * 9),
        leaf_prim=prim.reshape(l, K),
        node_min=node_min, node_max=node_max, depth=l.bit_length() - 1,
    )


def _sah_leaf_arrays(leaves, vs, uvs, ns, prim_tagged):
    """Pack per-leaf triangle id lists into the [L, K*...] leaf tables."""
    l = len(leaves)
    pos9 = np.zeros((l * K, 9), np.float32)
    uv6 = np.zeros((l * K, 6), np.float32)
    nrm9 = np.zeros((l * K, 9), np.float32)
    prim = np.full(l * K, -1, np.int32)
    order = np.full(l * K, -1, np.int64)
    for li, ids in enumerate(leaves):
        n = len(ids)
        s = li * K
        pos9[s:s + n] = vs[ids]
        uv6[s:s + n] = uvs[ids]
        nrm9[s:s + n] = ns[ids]
        prim[s:s + n] = prim_tagged[ids]
        order[s:s + n] = ids
    rows = np.zeros((l, LEAF_ROW), np.float32)
    # leaf rows store (a, e1=b-a, e2=c-a) — see _build_blas_host
    pos9[:, 3:6] -= pos9[:, 0:3]
    pos9[:, 6:9] -= pos9[:, 0:3]
    rows[:, _POS:_UV] = pos9.reshape(l, K * 9)
    rows[:, _UV:LEAF_ROW] = uv6.reshape(l, K * 6)
    return rows, nrm9.reshape(l, K * 9), prim.reshape(l, K), order


def _build_blas_host_sah(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
    uv0: np.ndarray, uv1: np.ndarray, uv2: np.ndarray,
    prim_tagged: np.ndarray,
    n0: np.ndarray = None, n1: np.ndarray = None, n2: np.ndarray = None,
    *,
    bins: int = 16,
    depth_cap: int = 48,
) -> _BLASBuild:
    """Top-down binned-SAH BLAS with EXPLICIT topology.

    The driver's PREFER_FAST_TRACE builder quality
    (AccelerationStructure.cpp:218-271 queues driver builds; quality there
    is the vendor's SAH builder): at each node, 16 centroid bins per axis,
    split minimizing SA(L)*N_L + SA(R)*N_R; median-count fallback on
    degenerate extents and past ``depth_cap`` (stack safety). Leaves hold
    up to K triangles. Static BLASes never refit, so arbitrary topology is
    free — the child CODE table is explicit (``_emit_blas_node_rows``);
    only animated BLASes need the implicit refit-friendly layout."""
    t = v0.shape[0]
    centroid = ((v0 + v1 + v2) / 3.0).astype(np.float32)
    tri_min = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tri_max = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    vs = np.concatenate([v0, v1, v2], axis=-1).astype(np.float32)
    uvs = np.concatenate([uv0, uv1, uv2], axis=-1).astype(np.float32)
    if n0 is None:
        ns = np.tile(np.asarray([0, 0, 1] * 3, np.float32), (t, 1))
    else:
        ns = np.concatenate([n0, n1, n2], axis=-1).astype(np.float32)

    leaves: List[np.ndarray] = []
    nodes: List[list] = []       # [kind0, idx0, kind1, idx1] (preorder)
    node_box: List[tuple] = []   # (lo, hi) per node, same order
    max_depth = [1]

    def area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    def build(ids, depth):
        """-> (kind, idx, lo, hi); kind 1 = leaf, 0 = box node."""
        max_depth[0] = max(max_depth[0], depth)
        lo = tri_min[ids].min(axis=0)
        hi = tri_max[ids].max(axis=0)
        if len(ids) <= K:
            leaves.append(ids)
            return 1, len(leaves) - 1, lo, hi
        c = centroid[ids]
        split = None
        if depth < depth_cap:
            best_cost = np.inf
            for ax in range(3):
                cl, ch = c[:, ax].min(), c[:, ax].max()
                if ch <= cl:
                    continue
                b = np.minimum(
                    ((c[:, ax] - cl) * (bins / (ch - cl))).astype(np.int64),
                    bins - 1)
                cnt = np.bincount(b, minlength=bins)
                blo = np.full((bins, 3), np.inf, np.float32)
                bhi = np.full((bins, 3), -np.inf, np.float32)
                np.minimum.at(blo, b, tri_min[ids])
                np.maximum.at(bhi, b, tri_max[ids])
                # prefix/suffix box areas + counts over split positions
                plo = np.minimum.accumulate(blo, axis=0)
                phi = np.maximum.accumulate(bhi, axis=0)
                slo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
                shi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
                pcnt = np.cumsum(cnt)
                for i in range(bins - 1):
                    nl = pcnt[i]
                    nr = len(ids) - nl
                    if nl == 0 or nr == 0:
                        continue
                    cost = (area(plo[i], phi[i]) * nl
                            + area(slo[i + 1], shi[i + 1]) * nr)
                    if cost < best_cost:
                        best_cost = cost
                        split = (ax, cl, ch, i)
        if split is not None:
            ax, cl, ch, i = split
            b = np.minimum(
                ((c[:, ax] - cl) * (bins / (ch - cl))).astype(np.int64),
                bins - 1)
            mask = b <= i
            left, right = ids[mask], ids[~mask]
        else:
            # degenerate extents or depth cap: median-count split on the
            # widest axis (keeps the tree balanced from here down)
            ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            half = len(ids) // 2
            part = np.argpartition(c[:, ax], half - 1)
            left, right = ids[part[:half]], ids[part[half:]]
        me = len(nodes)
        nodes.append(None)
        node_box.append((lo, hi))
        k0, i0, _, _ = build(left, depth + 1)
        k1, i1, _, _ = build(right, depth + 1)
        nodes[me] = [k0, i0, k1, i1]
        return 0, me, lo, hi

    import sys as _sys

    old_limit = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(old_limit, depth_cap * 4 + 10000))
    try:
        build(np.arange(t, dtype=np.int64), 1)
    finally:
        _sys.setrecursionlimit(old_limit)

    rows, nrm, prim, order = _sah_leaf_arrays(leaves, vs, uvs, ns,
                                              prim_tagged)
    l = len(leaves)
    nn = len(nodes)
    assert nn == l - 1 or (l == 1 and nn == 0)
    node_rows = np.zeros((nn, 12), np.float32)
    child_kind = np.zeros((nn, 2), np.int8)
    child_idx = np.zeros((nn, 2), np.int32)
    leaf_lo = np.zeros((l, 3), np.float32)
    leaf_hi = np.zeros((l, 3), np.float32)
    for li, ids in enumerate(leaves):
        leaf_lo[li] = tri_min[ids].min(axis=0)
        leaf_hi[li] = tri_max[ids].max(axis=0)
    for ni, ch in enumerate(nodes):
        k0, i0, k1, i1 = ch
        b0 = (leaf_lo[i0], leaf_hi[i0]) if k0 else node_box[i0]
        b1 = (leaf_lo[i1], leaf_hi[i1]) if k1 else node_box[i1]
        node_rows[ni, 0:3] = b0[0]
        node_rows[ni, 3:6] = b0[1]
        node_rows[ni, 6:9] = b1[0]
        node_rows[ni, 9:12] = b1[1]
        child_kind[ni] = (k0, k1)
        child_idx[ni] = (i0, i1)
    if nn:
        node_min = np.stack([b[0] for b in node_box])
        node_max = np.stack([b[1] for b in node_box])
    else:
        node_min, node_max = leaf_lo, leaf_hi
    return _BLASBuild(
        num_leaves=l, leaf_order=order, leaf_rows=rows, leaf_nrm=nrm,
        leaf_prim=prim, node_min=node_min, node_max=node_max,
        depth=max_depth[0], node_rows=node_rows, child_kind=child_kind,
        child_idx=child_idx,
    )


def _emit_blas_node_rows(
    b: _BLASBuild, node_off: int, leaf_off: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Internal node rows (f32[L-1, 12] child boxes, i32[L-1, 2] child codes)
    with the codes at global row offsets."""
    l = b.num_leaves
    if l <= 1:
        return np.zeros((0, 12), np.float32), np.zeros((0, 2), np.int32)
    if b.node_rows is not None:
        # explicit topology (SAH build): codes straight from child links
        codes = np.where(
            b.child_kind == 1,
            _code(TYPE_LEAF, leaf_off + b.child_idx, obj=True),
            _code(TYPE_BOX, node_off + b.child_idx, obj=True),
        ).astype(np.int32)
        return b.node_rows, codes
    rows = np.zeros((l - 1, 12), np.float32)
    i = np.arange(l - 1)
    c0 = 2 * i + 1
    c1 = 2 * i + 2
    rows[:, 0:3] = b.node_min[c0]
    rows[:, 3:6] = b.node_max[c0]
    rows[:, 6:9] = b.node_min[c1]
    rows[:, 9:12] = b.node_max[c1]

    def codes(c):
        internal = c < l - 1
        leaf_k = c - (l - 1)
        return np.where(
            internal,
            _code(TYPE_BOX, node_off + c, obj=True),
            _code(TYPE_LEAF, leaf_off + np.maximum(leaf_k, 0), obj=True),
        ).astype(np.int32)

    return rows, np.stack([codes(c0), codes(c1)], axis=-1)


# --- BLAS chunking (round 5): arbitrary-size models on the paged path ------
# A model whose BLAS exceeds BL_LEAVES leaf rows is decomposed into subtree
# CHUNKS streamed HBM->SMEM on pop (exactly the TLAS-chunk mechanism, in
# object space): the cut-line subtrees (<= BL_LEAVES leaves each) become
# chunk blocks; the rows above the cuts stay static with TYPE_CHUNK|OBJ
# children. One BLAS-chunk scratch block suffices by the same LIFO argument
# as TLAS chunks (a chunk's subtree is fully traversed before any sibling).
# Replaces the 620 KiB all-BLAS-resident cap (round-4 trace_paged.py:50) —
# matches the reference's HBM-sized BLAS envelope
# (src/PaperRenderer/AccelerationStructure.cpp:139-216).
BL_LEAVES = 256             # leaf rows per BLAS chunk (= 2048 triangles)
# chunking threshold: models whose leaf data could never be SMEM-resident
# anyway (rows * ~800 B vs the ~620 KiB budget). Models below it keep the
# resident fast path; above it they page at full packet speed.
BL_THRESH = 512
BL_NROWS = 2 * BL_LEAVES    # node-row region size (clip-safe: BROWS)
BCH_NODE = BL_NROWS * 12    # f32 per chunk node block (6144)
BCH_CODE = BL_NROWS * 2     # i32 per chunk code block (1024)
BCH_POS = BL_LEAVES * 72    # f32 per chunk leaf-position block (18432)
BCH_PRIM = BL_LEAVES * K    # i32 per chunk prim block (2048)
BCH_UV = BL_LEAVES * 48     # f32 per chunk uv block (12288)
BCH_NRM = BL_LEAVES * 72    # f32 per chunk normal block (18432)


def _chunk_blas_host(b: "_BLASBuild", first_chunk: int):
    """Cut one big explicit-topology BLAS into subtree chunks.

    Returns (top_rows, top_codes_fn, chunks) where ``chunks`` is a list of
    dicts with local node rows/codes + leaf rows/nrm/prim, and
    ``top_codes_fn(node_off)`` emits the static top rows' child codes
    (TYPE_BOX|obj at global offsets above the cuts, TYPE_CHUNK|obj at
    cut children). ``first_chunk`` is the global chunk index of this
    BLAS's first chunk."""
    l = b.num_leaves
    nn = l - 1
    counts = np.zeros(nn, np.int64)

    def leaf_count(kind, idx):
        return 1 if kind == 1 else counts[idx]

    # children precede parents nowhere in particular — compute by post-order
    order = []
    stack = [(0, False)]
    while stack:
        ni, seen = stack.pop()
        if seen:
            order.append(ni)
            continue
        stack.append((ni, True))
        for k in range(2):
            if b.child_kind[ni, k] == 0:
                stack.append((int(b.child_idx[ni, k]), False))
    for ni in order:
        c = 0
        for k in range(2):
            c += leaf_count(b.child_kind[ni, k], int(b.child_idx[ni, k]))
        counts[ni] = c

    chunks = []

    def cut(kind, idx):
        """Collect the subtree at (kind, idx) into a chunk; return chunk id."""
        nodes, leaves = [], []

        def walk(kind, idx):
            if kind == 1:
                leaves.append(int(idx))
                return (1, len(leaves) - 1)
            me = len(nodes)
            nodes.append(None)
            links = []
            for k in range(2):
                links.append(walk(int(b.child_kind[idx, k]),
                                  int(b.child_idx[idx, k])))
            nodes[me] = (int(idx), links)
            return (0, me)

        import sys as _sys
        old = _sys.getrecursionlimit()
        _sys.setrecursionlimit(old + 4 * BL_LEAVES + 100)
        try:
            walk(kind, idx)
        finally:
            _sys.setrecursionlimit(old)
        n_rows = np.zeros((BL_NROWS, 12), np.float32)
        n_codes = np.zeros((BL_NROWS, 2), np.int32)
        for li, (src, links) in enumerate(nodes):
            n_rows[li] = b.node_rows[src]
            for k, (ck, ci) in enumerate(links):
                if ck == 1:
                    n_codes[li, k] = _code(TYPE_LEAF, ci, obj=True) | LOCAL_FLAG
                else:
                    n_codes[li, k] = _code(TYPE_BOX, ci, obj=True) | LOCAL_FLAG
        lp = np.zeros((BL_LEAVES, LEAF_ROW), np.float32)
        ln = np.zeros((BL_LEAVES, K * 9), np.float32)
        pr = np.full((BL_LEAVES, K), -1, np.int32)
        for li, src in enumerate(leaves):
            lp[li] = b.leaf_rows[src]
            ln[li] = b.leaf_nrm[src]
            pr[li] = b.leaf_prim[src]
        # single-leaf chunk: the local root must still be a BOX row — wrap
        # the leaf in a degenerate one-child node
        if not nodes:
            # child 0 box: permissive (the chunk pop's own AABB already
            # gated entry); child 1 dead (min > max)
            n_rows[0, 0:3] = -3.0e38
            n_rows[0, 3:6] = 3.0e38
            n_rows[0, 6:9] = 1.0   # dead child 1 (min > max)
            n_rows[0, 9:12] = -1.0
            n_codes[0, 0] = _code(TYPE_LEAF, 0, obj=True) | LOCAL_FLAG
            n_codes[0, 1] = _code(TYPE_LEAF, 0, obj=True) | LOCAL_FLAG
        chunks.append(dict(nodes=n_rows, codes=n_codes, lpos=lp, lnrm=ln,
                           lprim=pr))
        return first_chunk + len(chunks) - 1

    # top tree: nodes with > BL_LEAVES leaves stay static; their children
    # with <= BL_LEAVES leaves are cut into chunks
    top_ids = [ni for ni in range(nn) if counts[ni] > BL_LEAVES]
    # the root must be in the top (callers push root_code = global box row)
    if not top_ids:
        top_ids = [0]
    remap = {ni: i for i, ni in enumerate(sorted(top_ids))}
    t = len(remap)
    top_rows = np.zeros((t, 12), np.float32)
    top_kind = np.zeros((t, 2), np.int8)   # 0=box(top) 2=chunk
    top_link = np.zeros((t, 2), np.int32)
    for ni, i in remap.items():
        top_rows[i] = b.node_rows[ni]
        for k in range(2):
            ck, ci = int(b.child_kind[ni, k]), int(b.child_idx[ni, k])
            if ck == 0 and ci in remap:
                top_kind[i, k] = 0
                top_link[i, k] = remap[ci]
            else:
                top_kind[i, k] = 2
                top_link[i, k] = cut(ck, ci)

    def top_codes(node_off: int) -> np.ndarray:
        return np.where(
            top_kind == 0,
            _code(TYPE_BOX, node_off + top_link, obj=True),
            _code(TYPE_CHUNK, top_link, obj=True),
        ).astype(np.int32)

    return top_rows, top_codes, chunks


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BLASSet:
    """All static BLASes packed (device pytree). Row offsets are baked into
    the child codes, so these arrays concatenate directly into the frame's
    unified node table (static BLAS rows come first). Big models' rows
    live in the ``bch_*`` chunk blocks instead (see _chunk_blas_host)."""

    nodes: jax.Array      # f32[NB, 12] internal rows (child boxes)
    codes: jax.Array      # i32[NB, 2] child codes
    leaf_rows: jax.Array  # f32[LB, 120] positions + uvs
    leaf_nrm: jax.Array   # f32[LB, 72] object-space vertex normals
    leaf_prim: jax.Array  # i32[LB, K] tagged prim ids
    bch_nodes: jax.Array  # f32[NBC * BCH_NODE] flat BLAS-chunk node blocks
    bch_codes: jax.Array  # i32[NBC * BCH_CODE]
    bch_lpos: jax.Array   # f32[NBC * BCH_POS]
    bch_lprim: jax.Array  # i32[NBC * BCH_PRIM]
    bch_luv: jax.Array    # f32[NBC * BCH_UV]
    bch_lnrm: jax.Array   # f32[NBC * BCH_NRM]
    root_min: jax.Array   # f32[B, 3] object-space root AABBs
    root_max: jax.Array   # f32[B, 3]
    root_code: jax.Array  # i32[B]


@dataclasses.dataclass
class AnimBLAS:
    """Rest-pose data for one unique-geometry instance's BLAS; its node and
    leaf rows are refit in-graph each frame (Model.cpp:398-404 +
    example BasicAnimation.comp -> BLAS rebuild, main.cpp:908-921)."""

    blas_id: int
    instance_index: int       # scene instance slot at build time
    node_off: int             # rows within the anim-node region
    node_count: int           # L-1
    leaf_off: int             # rows within the anim-leaf region
    num_leaves: int
    rest_rows: np.ndarray     # f32[L, 120] rest-pose leaf rows
    rest_prim: np.ndarray     # i32[L, K] tagged prim ids (static)
    node_codes: np.ndarray    # i32[L-1, 2] static child codes
    phase: float = 0.0        # per-instance animation phase offset


@dataclasses.dataclass
class BLASSetMeta:
    """Host-side metadata for a BLASSet (static across frames)."""

    blas_of_model: np.ndarray        # i32[M] model id -> blas id
    max_depth: int
    num_static_nodes: int
    num_static_leaves: int
    anim: List[AnimBLAS]
    num_anim_nodes: int
    num_anim_leaves: int
    num_blas: int
    anim_node_codes: np.ndarray = None   # i32[NA, 2] (static per topology)
    anim_leaf_prim: np.ndarray = None    # i32[LA, K]
    anim_leaf_nrm: np.ndarray = None     # f32[LA, K*9] rest normals
    num_bchunks: int = 0                 # BLAS chunks (big models; paged-only)

    @property
    def total_nodes(self) -> int:
        return self.num_static_nodes + self.num_anim_nodes


def build_blas_set(scene):
    """Build all models' BLASes + per-unique-instance BLASes.

    Returns (blasset, meta, anim_rest_leaves f32[LA, 128],
    anim_rest_nodes f32[NA, 16]). Reference:
    AccelerationStructureBuilder::queueBLAS at model creation
    (Model.cpp:59-74); geometry is always LOD 0
    (AccelerationStructure.cpp:335-377).
    """
    arena = scene.arena
    builds: List[_BLASBuild] = []
    blas_of_model = np.zeros(max(1, len(scene.models)), np.int32)

    def model_tris(model):
        """Object-space LOD-0 triangle data + tagged prim ids for a model."""
        v0s, v1s, v2s, u0s, u1s, u2s, prims = [], [], [], [], [], [], []
        n0s, n1s, n2s = [], [], []
        for mm in model.lods[0].meshes:
            h = mm.handle
            # tagged prim id = (slot << 24) | arena tri id in one i32: slots
            # >= 128 or tri ids >= 2^24 would flip the sign bit and the
            # triangle would be silently dropped as dead padding
            if not (0 <= mm.material_slot < 128):
                raise ValueError(
                    f"material slot {mm.material_slot} out of the tagged-prim "
                    "range [0, 128) (widen the tag to a second i32 plane to "
                    "lift this)")
            if h.tri_offset + h.tri_count >= (1 << 24):
                raise ValueError(
                    "geometry arena exceeds 2^24 triangles — tagged prim ids "
                    "cannot address it")
            idx = arena._idx[h.tri_offset : h.tri_offset + h.tri_count]
            tri_ids = np.arange(h.tri_offset, h.tri_offset + h.tri_count)
            v0s.append(arena._pos[idx[:, 0]])
            v1s.append(arena._pos[idx[:, 1]])
            v2s.append(arena._pos[idx[:, 2]])
            u0s.append(arena._uv[idx[:, 0]])
            u1s.append(arena._uv[idx[:, 1]])
            u2s.append(arena._uv[idx[:, 2]])
            n0s.append(arena._nrm[idx[:, 0]])
            n1s.append(arena._nrm[idx[:, 1]])
            n2s.append(arena._nrm[idx[:, 2]])
            prims.append(
                (np.int32(mm.material_slot) << 24) | tri_ids.astype(np.int32)
            )
        cat = lambda xs: np.concatenate(xs, axis=0)
        return (cat(v0s), cat(v1s), cat(v2s), cat(u0s), cat(u1s), cat(u2s),
                cat(prims), cat(n0s), cat(n1s), cat(n2s))

    for model in scene.models:
        blas_of_model[model.model_id] = len(builds)
        # static BLASes never refit -> free to use the explicit binned-SAH
        # topology (driver PREFER_FAST_TRACE quality); animated BLASes below
        # keep the implicit complete tree the in-graph refit depends on
        builds.append(_build_blas_host_sah(*model_tris(model)))

    num_models_blas = len(builds)
    anim: List[AnimBLAS] = []
    anim_instances = [i for i in scene.instances if i.unique_geometry]
    for inst in anim_instances:
        builds.append(_build_blas_host(*model_tris(inst.model)))

    # --- chunk big static BLASes (round 5: paged-path BLAS streaming) ------
    chunked = {}       # build index -> (top_rows, top_codes_fn, chunks)
    all_bchunks = []
    for bi in range(num_models_blas):
        b = builds[bi]
        if b.num_leaves > BL_THRESH and b.node_rows is not None:
            top_rows, top_codes_fn, chunks = _chunk_blas_host(
                b, len(all_bchunks))
            chunked[bi] = (top_rows, top_codes_fn)
            all_bchunks.extend(chunks)

    # --- assign global row offsets (static rows first, then anim rows) -----
    node_offs, leaf_offs = [], []
    no = lo = 0
    static_no = static_lo = 0
    for bi, b in enumerate(builds):
        node_offs.append(no)
        leaf_offs.append(lo)
        if bi in chunked:
            no += chunked[bi][0].shape[0]       # top rows only; leaves paged
        else:
            no += max(b.num_leaves - 1, 0)
            lo += b.num_leaves
        if bi < num_models_blas:
            static_no, static_lo = no, lo

    node_rows = [np.zeros((0, 12), np.float32)]
    node_codes = [np.zeros((0, 2), np.int32)]
    leaf_rows = [np.zeros((0, LEAF_ROW), np.float32)]
    leaf_nrms = [np.zeros((0, K * 9), np.float32)]
    leaf_prims = [np.zeros((0, K), np.int32)]
    root_min = np.zeros((len(builds), 3), np.float32)
    root_max = np.zeros((len(builds), 3), np.float32)
    root_code = np.zeros(len(builds), np.int32)
    for bi, b in enumerate(builds):
        if bi in chunked:
            top_rows, top_codes_fn = chunked[bi]
            node_rows.append(top_rows)
            node_codes.append(top_codes_fn(node_offs[bi]))
        else:
            rows, codes = _emit_blas_node_rows(b, node_offs[bi], leaf_offs[bi])
            node_rows.append(rows)
            node_codes.append(codes)
            leaf_rows.append(b.leaf_rows)
            leaf_nrms.append(b.leaf_nrm)
            leaf_prims.append(b.leaf_prim)
        root_min[bi] = np.where(np.isfinite(b.node_min[0]), b.node_min[0], 0.0)
        root_max[bi] = np.where(np.isfinite(b.node_max[0]), b.node_max[0], 0.0)
        root_code[bi] = (
            _code(TYPE_BOX, node_offs[bi], obj=True)
            if b.num_leaves > 1
            else _code(TYPE_LEAF, leaf_offs[bi], obj=True)
        )

    for ai, inst in enumerate(anim_instances):
        bi = num_models_blas + ai
        b = builds[bi]
        _, codes = _emit_blas_node_rows(b, node_offs[bi], leaf_offs[bi])
        anim.append(
            AnimBLAS(
                blas_id=bi,
                instance_index=inst.index,
                node_off=node_offs[bi] - static_no,
                node_count=max(b.num_leaves - 1, 0),
                leaf_off=leaf_offs[bi] - static_lo,
                num_leaves=b.num_leaves,
                rest_rows=b.leaf_rows,
                rest_prim=b.leaf_prim,
                node_codes=codes,
                phase=float(getattr(inst, "anim_phase", 0.0)),
            )
        )

    all_nodes = np.concatenate(node_rows, axis=0)
    all_codes = np.concatenate(node_codes, axis=0)
    all_leaves = np.concatenate(leaf_rows, axis=0)
    all_nrms = np.concatenate(leaf_nrms, axis=0)
    all_prims = np.concatenate(leaf_prims, axis=0)
    meta = BLASSetMeta(
        blas_of_model=blas_of_model,
        max_depth=max((b.depth for b in builds), default=0),
        num_static_nodes=static_no,
        num_static_leaves=static_lo,
        anim=anim,
        num_anim_nodes=no - static_no,
        num_anim_leaves=lo - static_lo,
        num_blas=len(builds),
        anim_node_codes=all_codes[static_no:],
        anim_leaf_prim=all_prims[static_lo:],
        anim_leaf_nrm=all_nrms[static_lo:],
        num_bchunks=len(all_bchunks),
    )
    nbc = len(all_bchunks)
    if nbc:
        bch_nodes = np.stack([c["nodes"] for c in all_bchunks])
        bch_codes = np.stack([c["codes"] for c in all_bchunks])
        bch_lp = np.stack([c["lpos"] for c in all_bchunks])
        bch_nr = np.stack([c["lnrm"] for c in all_bchunks])
        bch_pr = np.stack([c["lprim"] for c in all_bchunks])
    else:
        bch_nodes = np.zeros((0, BL_NROWS, 12), np.float32)
        bch_codes = np.zeros((0, BL_NROWS, 2), np.int32)
        bch_lp = np.zeros((0, BL_LEAVES, LEAF_ROW), np.float32)
        bch_nr = np.zeros((0, BL_LEAVES, K * 9), np.float32)
        bch_pr = np.zeros((0, BL_LEAVES, K), np.int32)
    blasset = BLASSet(
        nodes=jnp.asarray(all_nodes[:static_no]),
        codes=jnp.asarray(all_codes[:static_no]),
        leaf_rows=jnp.asarray(all_leaves[:static_lo]),
        leaf_nrm=jnp.asarray(all_nrms[:static_lo]),
        leaf_prim=jnp.asarray(all_prims[:static_lo]),
        bch_nodes=jnp.asarray(bch_nodes.reshape(-1)),
        bch_codes=jnp.asarray(bch_codes.reshape(-1)),
        bch_lpos=jnp.asarray(bch_lp[:, :, :_UV].reshape(-1)),
        bch_lprim=jnp.asarray(bch_pr.reshape(-1)),
        bch_luv=jnp.asarray(bch_lp[:, :, _UV:].reshape(-1)),
        bch_lnrm=jnp.asarray(bch_nr.reshape(-1)),
        root_min=jnp.asarray(root_min),
        root_max=jnp.asarray(root_max),
        root_code=jnp.asarray(root_code),
    )
    anim_rest = jnp.asarray(all_leaves[static_lo:])        # f32[LA, 120]
    anim_rest_nodes = jnp.asarray(all_nodes[static_no:])   # f32[NA, 12]
    return blasset, meta, anim_rest, anim_rest_nodes


# ---------------------------------------------------------------------------
# Per-frame: anim BLAS refit + TLAS build + unified node table assembly
# ---------------------------------------------------------------------------

def refit_anim_blases(
    meta: BLASSetMeta,
    anim_rest: jax.Array,     # f32[LA, 128] rest-pose leaf rows
    time: jax.Array,
    animate: Callable,        # f(v f32[..., 3], time) -> f32[..., 3]
    anim_prim: Optional[jax.Array] = None,  # i32[LA, K] (resplit-permuted)
):
    """Animate unique-geometry vertices and refit their BLAS rows in-graph.

    Returns (anim_node_rows f32[NA, 12], anim_leaf_rows f32[LA, 120],
    root_lo f32[A, 3], root_hi f32[A, 3]). The morton ordering is the rest
    pose's (refit keeps topology — TLAS::updateTLAS refit semantics). Child
    codes are static (meta.anim_node_codes) — nothing integer flows through
    the f32 refit math. ``anim_prim`` supplies the leaf-validity mask when
    the caller permuted the leaf order (``resplit_anim_tables``); the
    implicit complete tree pairs ADJACENT leaves, so box quality tracks
    whatever order the rows arrive in."""
    if not meta.anim:
        z = jnp.zeros((0, 12), jnp.float32)
        return (z, jnp.zeros((0, LEAF_ROW), jnp.float32),
                jnp.zeros((0, 3), jnp.float32), jnp.zeros((0, 3), jnp.float32))

    node_parts = []
    leaf_parts = []
    roots_lo, roots_hi = [], []
    for a in meta.anim:
        rows = anim_rest[a.leaf_off : a.leaf_off + a.num_leaves]
        # rest rows hold (a, e1, e2) — reconstruct vertices, animate each
        # independently, then re-derive the edges for the refit rows
        rest9 = rows[:, _POS:_UV].reshape(a.num_leaves, K, 9)
        a0 = rest9[..., 0:3]
        verts = jnp.concatenate(
            [a0, a0 + rest9[..., 3:6], a0 + rest9[..., 6:9]], axis=-1)
        pos = verts.reshape(-1, 3)                             # [L*K*3, 3]
        pos = animate(pos, time + a.phase)
        pos9 = pos.reshape(a.num_leaves, K, 9)
        edges9 = jnp.concatenate(
            [pos9[..., 0:3],
             pos9[..., 3:6] - pos9[..., 0:3],
             pos9[..., 6:9] - pos9[..., 0:3]], axis=-1)
        rows = rows.at[:, _POS:_UV].set(edges9.reshape(a.num_leaves, K * 9))
        leaf_parts.append(rows)

        if anim_prim is not None:
            ok = (anim_prim[a.leaf_off : a.leaf_off + a.num_leaves]
                  >= 0)[..., None]                              # [L, K, 1]
        else:
            ok = jnp.asarray(a.rest_prim >= 0)[..., None]       # [L, K, 1]
        tri_min = jnp.minimum(
            jnp.minimum(pos9[..., 0:3], pos9[..., 3:6]), pos9[..., 6:9])
        tri_max = jnp.maximum(
            jnp.maximum(pos9[..., 0:3], pos9[..., 3:6]), pos9[..., 6:9])
        leaf_min = jnp.where(ok, tri_min, jnp.inf).min(axis=1)   # [L, 3]
        leaf_max = jnp.where(ok, tri_max, -jnp.inf).max(axis=1)

        levels_min = [leaf_min]
        levels_max = [leaf_max]
        while levels_min[0].shape[0] > 1:
            cm, cx = levels_min[0], levels_max[0]
            levels_min.insert(0, jnp.minimum(cm[0::2], cm[1::2]))
            levels_max.insert(0, jnp.maximum(cx[0::2], cx[1::2]))
        node_min = jnp.concatenate(levels_min, axis=0)
        node_max = jnp.concatenate(levels_max, axis=0)
        l = a.num_leaves
        roots_lo.append(jnp.where(jnp.isfinite(node_min[0]), node_min[0], 0.0))
        roots_hi.append(jnp.where(jnp.isfinite(node_max[0]), node_max[0], 0.0))
        if l > 1:
            c0 = jnp.arange(1, 2 * l - 1, 2)
            c1 = c0 + 1
            rows12 = jnp.concatenate(
                [node_min[c0], node_max[c0], node_min[c1], node_max[c1]],
                axis=-1,
            )
            node_parts.append(rows12)

    nodes = (jnp.concatenate(node_parts, axis=0) if node_parts
             else jnp.zeros((0, 12), jnp.float32))
    return (nodes, jnp.concatenate(leaf_parts, axis=0),
            jnp.stack(roots_lo), jnp.stack(roots_hi))


def _median_perm(cen: jax.Array, valid: jax.Array,
                 stop_seg: int = 1) -> jax.Array:
    """Slot permutation by recursive widest-axis median splits, in-graph.

    The implicit complete tree over L (power-of-two) slots makes
    median-split reordering a sequence of SEGMENTED sorts: level l sorts
    within each of the 2^l nested segments along that segment's widest
    centroid axis, which is exactly ``_median_order``'s recursion expressed
    as static-shape [segments, seg_len] argsorts (no host loop over data).
    Invalid (pad) slots sink to each segment's right. ``stop_seg`` stops the
    recursion once segments reach that size (= K for triangle->leaf
    grouping, where within-leaf order is irrelevant)."""
    L = cen.shape[0]
    assert L & (L - 1) == 0, "slot count must be a power of two"
    perm = jnp.arange(L, dtype=jnp.int32)
    levels = max(L // max(stop_seg, 1) - 1, 1).bit_length() - 1
    for lvl in range(levels):
        seg = L >> lvl
        c = cen[perm].reshape(-1, seg, 3)
        v = valid[perm].reshape(-1, seg)
        lo = jnp.where(v[..., None], c, jnp.inf).min(axis=1)
        hi = jnp.where(v[..., None], c, -jnp.inf).max(axis=1)
        ext = hi - lo
        ext = jnp.where(jnp.isfinite(ext), ext, 0.0)
        ax = jnp.argmax(ext, axis=-1)                      # [S]
        key = jnp.take_along_axis(c, ax[:, None, None], axis=-1)[..., 0]
        key = jnp.where(v, key, jnp.inf)                   # pads sink right
        order = jnp.argsort(key, axis=1)                   # [S, seg]
        perm = jnp.take_along_axis(
            perm.reshape(-1, seg), order, axis=1).reshape(L)
    return perm


def resplit_anim_tables(
    meta: BLASSetMeta,
    anim_rest: jax.Array,     # f32[LA, 128] rest-pose leaf rows
    time: jax.Array,
    animate: Callable,
):
    """In-graph RE-SPLIT of the anim BLAS leaf order at the ANIMATED pose.
    Returns permuted (anim_rest, anim_prim i32[LA, K], anim_nrm f32[LA, K*9]).

    ``refit_anim_blases`` keeps the rest pose's leaf order forever, so box
    quality (and traversal cost) degrades under large deformation. The
    reference instead re-queues a full BLAS *build* on the animated vertices
    every frame (example/src/main.cpp:908-921). TPU equivalent: re-partition
    each model's leaves by recursive widest-axis median splits of their
    animated centroids (``_median_perm`` — the same quality scheme the host
    build uses, NOT raw morton, which measurably loses to the host order) —
    log2(L) small segmented argsorts + row gathers in-graph, no host
    rebuild, no recompile — and let the refit build its implicit-tree boxes
    over the new adjacency. Feed the outputs to
    ``assemble_scene(..., resplit=True)`` / ``refit_anim_blases(anim_prim=)``.
    """
    prim = jnp.asarray(meta.anim_leaf_prim)
    nrm = jnp.asarray(meta.anim_leaf_nrm)
    rest_parts, prim_parts, nrm_parts = [], [], []
    for a in meta.anim:
        sl = slice(a.leaf_off, a.leaf_off + a.num_leaves)
        L = a.num_leaves
        rows = anim_rest[sl]
        # TRIANGLE-level regroup (not just leaf reorder): leaf CONTENT is
        # what a rebuild improves — a deformation that separates a leaf's K
        # rest-neighbors fattens its box no matter how leaves are ordered
        pos = rows[:, _POS:_UV].reshape(L * K, 9)       # rest (a, e1, e2)
        uv = rows[:, _UV:].reshape(L * K, 6)
        nr = nrm[sl].reshape(L * K, 9)
        pr = prim[sl].reshape(L * K)
        a0 = pos[:, 0:3]
        verts = jnp.concatenate(
            [a0, a0 + pos[:, 3:6], a0 + pos[:, 6:9]], axis=-1)
        pos9 = animate(verts.reshape(-1, 3),
                       time + a.phase).reshape(L * K, 9)
        valid = pr >= 0
        cen = (pos9[:, 0:3] + pos9[:, 3:6] + pos9[:, 6:9]) / 3.0
        order = _median_perm(cen, valid, stop_seg=K)
        rest_parts.append(jnp.concatenate(
            [pos[order].reshape(L, K * 9), uv[order].reshape(L, K * 6)],
            axis=-1))
        prim_parts.append(pr[order].reshape(L, K))
        nrm_parts.append(nr[order].reshape(L, K * 9))
    return (jnp.concatenate(rest_parts, axis=0),
            jnp.concatenate(prim_parts, axis=0),
            jnp.concatenate(nrm_parts, axis=0))


def build_tlas_rows(
    instances: InstanceArrays,
    inst_blas: jax.Array,     # i32[N] blas id per instance slot
    root_min: jax.Array,      # f32[B, 3] per-blas object root AABBs
    root_max: jax.Array,      # f32[B, 3]
    mask: jax.Array,          # bool[N] membership in this TLAS
    *,
    node_offset: int,         # global row offset of this TLAS's rows
    inst_offset: int,         # global row offset of the instance-row block
):
    """Per-frame TLAS over instance world AABBs -> (node rows f32[Lt-1, 12],
    child codes i32[Lt-1, 2], forward mats).

    The TLASInstBuild.comp + vkCmdBuildAccelerationStructuresKHR(TOP_LEVEL)
    analogue: O(N) matrix/AABB math + one morton sort. Leaves are single
    instances; their world AABB is tested by the parent row, so a leaf pop
    goes straight to the instance switch."""
    n = instances.capacity
    l = _next_pow2(n)
    alive = instances.alive & mask
    mats = trs_to_mat34(instances.pos, instances.scale, instances.quat)
    bid = jnp.clip(inst_blas, 0, root_min.shape[0] - 1)
    wlo, whi = transform_aabb(mats, root_min[bid], root_max[bid])

    inf = jnp.float32(jnp.inf)
    blo = jnp.where(alive[:, None], wlo, inf)
    bhi = jnp.where(alive[:, None], whi, -inf)
    centroid = jnp.where(alive[:, None], (wlo + whi) * 0.5, 0.0)
    scene_lo = jnp.min(blo, axis=0)
    scene_hi = jnp.max(bhi, axis=0)
    codes = morton_codes(centroid, scene_lo, scene_hi)
    codes = jnp.where(alive, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes).astype(jnp.int32)

    perm = jnp.full((l,), -1, jnp.int32).at[:n].set(
        jnp.where(alive[order], order, -1))
    leaf_min = jnp.full((l, 3), inf, jnp.float32).at[:n].set(blo[order])
    leaf_max = jnp.full((l, 3), -inf, jnp.float32).at[:n].set(bhi[order])

    levels_min = [leaf_min]
    levels_max = [leaf_max]
    while levels_min[0].shape[0] > 1:
        cm, cx = levels_min[0], levels_max[0]
        levels_min.insert(0, jnp.minimum(cm[0::2], cm[1::2]))
        levels_max.insert(0, jnp.maximum(cx[0::2], cx[1::2]))
    node_min = jnp.concatenate(levels_min, axis=0)
    node_max = jnp.concatenate(levels_max, axis=0)

    c0 = jnp.arange(1, 2 * l - 1, 2)
    c1 = c0 + 1

    def codes_of(c):
        internal = c < l - 1
        leaf_k = jnp.maximum(c - (l - 1), 0)
        inst = jnp.maximum(perm[leaf_k], 0) + inst_offset
        return jnp.where(
            internal,
            _code(TYPE_BOX, 0) + node_offset + c,
            _code(TYPE_INST, 0) + inst,
        ).astype(jnp.int32)

    rows = jnp.concatenate(
        [
            jnp.nan_to_num(node_min[c0], posinf=1e30),
            jnp.nan_to_num(node_max[c0], neginf=-1e30),
            jnp.nan_to_num(node_min[c1], posinf=1e30),
            jnp.nan_to_num(node_max[c1], neginf=-1e30),
        ],
        axis=-1,
    )
    codes = jnp.stack([codes_of(c0), codes_of(c1)], axis=-1)   # i32[l-1, 2]
    # dead leaves/subtrees: make the slab test unpassable (min > max; the
    # slab tests reject inverted boxes explicitly)
    dead0 = rows[:, 3:6] < rows[:, 0:3]
    dead1 = rows[:, 9:12] < rows[:, 6:9]
    rows = rows.at[:, 0:3].set(jnp.where(dead0, 1e30, rows[:, 0:3]))
    rows = rows.at[:, 3:6].set(jnp.where(dead0, -1e30, rows[:, 3:6]))
    rows = rows.at[:, 6:9].set(jnp.where(dead1, 1e30, rows[:, 6:9]))
    rows = rows.at[:, 9:12].set(jnp.where(dead1, -1e30, rows[:, 9:12]))
    return rows, codes, mats


INST_ID_MASK = 0x007FFFFF    # self-id bits of the instance record word
INST_OPAQUE_BIT = 1 << 23    # force-opaque flag (skip any-hit alpha test)
#                              bits 24-31: the 8-bit visibility mask


def make_instance_rows(
    instances: InstanceArrays,
    mats: jax.Array,          # f32[N, 3, 4] forward TRS
    inst_blas: jax.Array,     # i32[N]
    root_code: jax.Array,     # i32[B]
    inst_mask: Optional[jax.Array] = None,   # i32[N] 8-bit, default 0xFF
    inst_opaque: Optional[jax.Array] = None,  # bool[N] force-opaque
) -> Tuple[jax.Array, jax.Array]:
    """Instance rows for the unified node table: (inverse 3x4 f32[N, 12],
    codes i32[N, 2] = [blas root code, instance record word]). Popping an
    instance code gathers this row, switches the ray to object space, and
    pushes the root code (the per-instance BLAS address in the reference's
    VkAccelerationStructureInstanceKHR record, TLASInstBuild.comp:45-71).

    The record word packs [mask:8 | force_opaque:1 | self id:23] — the
    reference's ``AccelerationStructureInstanceData{customIndex:24, mask:8,
    flags}`` (RayTrace.h:19-35): traversal skips the instance when
    ``mask & cull_mask == 0`` and the any-hit alpha test is skipped when the
    opaque bit is set (VK_GEOMETRY_INSTANCE_FORCE_OPAQUE parity)."""
    # inverse TRS directly from components: M = T R S -> M^-1 = S^-1 R^T T^-1
    rot = quat_to_mat3(instances.quat)                   # [N, 3, 3]
    inv_s = 1.0 / jnp.maximum(jnp.abs(instances.scale), 1e-12) * jnp.sign(
        jnp.where(instances.scale == 0.0, 1.0, instances.scale))
    a_inv = rot.transpose(0, 2, 1) * inv_s[:, :, None]   # S^-1 R^T
    t_inv = -jnp.einsum("nij,nj->ni", a_inv, instances.pos)
    inv12 = jnp.concatenate([a_inv, t_inv[:, :, None]], axis=-1).reshape(-1, 12)
    n = inv12.shape[0]
    assert n <= INST_ID_MASK + 1, "instance capacity exceeds the 23-bit id"
    bid = jnp.clip(inst_blas, 0, root_code.shape[0] - 1)
    rec = jnp.arange(n, dtype=jnp.int32)
    m8 = (jnp.full((n,), 0xFF, jnp.int32) if inst_mask is None
          else jnp.asarray(inst_mask, jnp.int32) & 0xFF)
    rec = rec | (m8 << 24)
    if inst_opaque is not None:
        rec = rec | jnp.where(jnp.asarray(inst_opaque, bool),
                              jnp.int32(INST_OPAQUE_BIT), 0)
    codes = jnp.stack([root_code[bid], rec], axis=-1)
    return inv12, codes


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RTScene:
    """Frame-assembled unified traversal scene (device pytree)."""

    nodes: jax.Array       # f32[*, 12]: [blas | anim | instance | tlas...] rows
    codes: jax.Array       # i32[*, 2]: child codes / [root, self id] per row
    leaf_rows: jax.Array   # f32[*, 120]: [static | anim] leaf pos+uv rows
    leaf_nrm: jax.Array    # f32[*, 72]: object-space vertex normals per leaf
    leaf_prim: jax.Array   # i32[*, K]: tagged prim ids per leaf
    fwd_rows: jax.Array    # f32[N, 12] forward matrices (resolve positions)
    inv_rows: jax.Array    # f32[N, 12] inverse matrices (resolve normals:
    #                        world n = (M^-1)^T n_obj, hitcommon.glsl:128)
    tri_attr: jax.Array    # f32[Ta, 16] obj normals(9) + uv(6) + slot(1)


def assemble_scene(
    blasset: BLASSet,
    meta: BLASSetMeta,
    anim_rest: jax.Array,        # f32[LA, 128] rest leaf rows
    anim_rest_nodes: jax.Array,  # f32[NA, 16] rest node rows
    instances: InstanceArrays,
    inst_blas: jax.Array,
    tlas_masks: Sequence[jax.Array],
    tri_attr: jax.Array,
    *,
    time: Optional[jax.Array] = None,
    animate: Optional[Callable] = None,
    inst_mask: Optional[jax.Array] = None,    # i32[N] 8-bit visibility masks
    inst_opaque: Optional[jax.Array] = None,  # bool[N] force-opaque flags
    resplit: bool = False,
) -> Tuple[RTScene, List[int]]:
    """Assemble the unified node table for one frame.

    Row layout: [static BLAS | anim BLAS | instance rows | TLAS 0 | TLAS 1...].
    Returns (scene, [root codes per TLAS]). All offsets are static python
    ints (shapes are capacities), so root codes are jit-static.

    ``resplit=True`` re-sorts anim leaf order at the animated pose before the
    refit (``resplit_anim_tables`` — the reference's per-frame BLAS rebuild
    quality, main.cpp:908-921)."""
    assert meta.num_bchunks == 0, (
        "scene has chunked big-model BLASes — use assemble_scene_paged "
        "(prefer_paged routes these scenes to the paged layout)")
    n = instances.capacity
    l = _next_pow2(n)
    nb = meta.num_static_nodes
    na = meta.num_anim_nodes
    inst_off = nb + na

    rs_prim = rs_nrm = None
    if meta.anim and animate is not None and time is not None:
        if resplit:
            anim_rest, rs_prim, rs_nrm = resplit_anim_tables(
                meta, anim_rest, time, animate)
        anim_nodes, anim_leaves, a_lo, a_hi = refit_anim_blases(
            meta, anim_rest, time, animate, anim_prim=rs_prim)
        root_min = jnp.concatenate(
            [blasset.root_min[: meta.num_blas - len(meta.anim)], a_lo], axis=0)
        root_max = jnp.concatenate(
            [blasset.root_max[: meta.num_blas - len(meta.anim)], a_hi], axis=0)
    else:
        anim_nodes = anim_rest_nodes
        anim_leaves = anim_rest
        root_min, root_max = blasset.root_min, blasset.root_max

    na_codes = (jnp.asarray(meta.anim_node_codes)
                if meta.anim_node_codes is not None and
                len(meta.anim_node_codes)
                else jnp.zeros((anim_nodes.shape[0], 2), jnp.int32))
    na_prim = rs_prim if rs_prim is not None else (
        jnp.asarray(meta.anim_leaf_prim)
        if meta.anim_leaf_prim is not None and len(meta.anim_leaf_prim)
        else jnp.zeros((anim_leaves.shape[0], K), jnp.int32))
    na_nrm = rs_nrm if rs_nrm is not None else (
        jnp.asarray(meta.anim_leaf_nrm)
        if meta.anim_leaf_nrm is not None and len(meta.anim_leaf_nrm)
        else jnp.zeros((anim_leaves.shape[0], K * 9), jnp.float32))
    parts = [blasset.nodes, anim_nodes]
    code_parts = [blasset.codes, na_codes]
    mats = None
    root_codes: List[int] = []
    tlas_off = inst_off + n
    tlas_parts = []
    tlas_code_parts = []
    for mask in tlas_masks:
        rows, codes, mats = build_tlas_rows(
            instances, inst_blas, root_min, root_max, mask,
            node_offset=tlas_off, inst_offset=inst_off,
        )
        tlas_parts.append(rows)
        tlas_code_parts.append(codes)
        root_codes.append(_code(TYPE_BOX, tlas_off))
        tlas_off += rows.shape[0]

    inst_rows, inst_codes = make_instance_rows(
        instances, mats, inst_blas, blasset.root_code,
        inst_mask=inst_mask, inst_opaque=inst_opaque)
    nodes = jnp.concatenate(parts + [inst_rows] + tlas_parts, axis=0)
    codes = jnp.concatenate(
        code_parts + [inst_codes] + tlas_code_parts, axis=0)
    leaf_rows = jnp.concatenate([blasset.leaf_rows, anim_leaves], axis=0)
    leaf_nrm = jnp.concatenate([blasset.leaf_nrm, na_nrm], axis=0)
    leaf_prim = jnp.concatenate([blasset.leaf_prim, na_prim], axis=0)
    fwd = mats.reshape(-1, 12)
    return RTScene(nodes=nodes, codes=codes, leaf_rows=leaf_rows,
                   leaf_nrm=leaf_nrm, leaf_prim=leaf_prim, fwd_rows=fwd,
                   inv_rows=inst_rows, tri_attr=tri_attr), root_codes


# ---------------------------------------------------------------------------
# Paged scene: chunked TLAS for scenes past the SMEM budget (10k+ instances)
# ---------------------------------------------------------------------------

CHUNK = 256                 # instances per TLAS chunk (fixed: block sizes
#                             must be 1024-element multiples for flat DMA
#                             slicing against TPU 1-D tiling)
BROWS = 2 * CHUNK           # block rows: CH-1 box rows, CH inst rows, 1 pad
LOCAL_FLAG = 1 << 27        # code bit: payload indexes the CURRENT chunk
_PAYLOAD_MASK_P = (1 << 27) - 1   # paged-kernel payload (27 bits)
TYPE_CHUNK = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedScene:
    """Chunked-TLAS traversal scene (device pytree).

    The flat RTScene keeps every node row SMEM-resident, which caps traced
    scenes at ~3k instances (VERDICT r2: the packet tracer died at ~700 KiB).
    Here the TLAS is split into CHUNK-instance blocks streamed HBM->SMEM by
    the kernel at traversal time (one ~28 KiB DMA per chunk VISIT — measured
    0.1-0.3 us chained on v5e, scripts/probe_smem_dma2.py), so scene size is
    HBM-bound like the reference's arbitrarily-sized TLAS
    (AccelerationStructure.cpp:479-616).

    SMEM-resident: BLAS rows (shared by all instances) + the root BVH over
    chunk AABBs. HBM: per-chunk blocks [box rows | instance inverse rows]
    plus the chunk's slot->material table (so slot_materials never needs
    SMEM residency either).
    """

    static_nodes: jax.Array   # f32[Ns, 12]: [static blas | anim blas | root]
    static_codes: jax.Array   # i32[Ns, 2]
    chunk_boxes: jax.Array    # f32[NC * BROWS * 12] flat blocks
    chunk_codes: jax.Array    # i32[NC * BROWS * 2]
    chunk_smat: jax.Array     # i32[NC * SMAT_BLK] per-chunk material tables
    leaf_rows: jax.Array      # f32[*, 120] (as RTScene)
    leaf_nrm: jax.Array       # f32[*, 72]
    leaf_prim: jax.Array      # i32[*, K]
    fwd_rows: jax.Array       # f32[N, 12] forward mats (XLA resolve)
    inv_rows: jax.Array       # f32[N, 12] inverse mats (XLA resolve)
    tri_attr: jax.Array       # f32[Ta, 16]
    # BLAS chunks (big models; see _chunk_blas_host) — streamed HBM->SMEM
    # on TYPE_CHUNK|OBJ pops, in their own scratch regions (object space)
    bch_nodes: jax.Array      # f32[NBC * BCH_NODE]
    bch_codes: jax.Array      # i32[NBC * BCH_CODE]
    bch_lpos: jax.Array       # f32[NBC * BCH_POS]
    bch_lprim: jax.Array      # i32[NBC * BCH_PRIM]
    bch_luv: jax.Array        # f32[NBC * BCH_UV]
    bch_lnrm: jax.Array       # f32[NBC * BCH_NRM]


def smat_block(n_slots: int) -> int:
    """Per-chunk slot-material block length (1024-multiple for DMA)."""
    return -(-CHUNK * n_slots // 1024) * 1024


def _chunk_local_codes() -> np.ndarray:
    """Static chunk-interior child codes i32[CH-1, 2]: implicit binary tree
    over CH instance leaves, payloads relative to the chunk block."""
    ch = CHUNK
    i = np.arange(ch - 1)
    c0 = 2 * i + 1
    c1 = c0 + 1

    def code(c):
        internal = c < ch - 1
        inst_row = (ch - 1) + (c - (ch - 1))   # leaf k -> block row CH-1+k
        return np.where(
            internal,
            _code(TYPE_BOX, 0) | LOCAL_FLAG | c,
            _code(TYPE_INST, 0) | LOCAL_FLAG | inst_row,
        ).astype(np.int32)

    return np.stack([code(c0), code(c1)], axis=-1)


def assemble_scene_paged(
    blasset: BLASSet,
    meta: BLASSetMeta,
    anim_rest: jax.Array,
    anim_rest_nodes: jax.Array,
    instances: InstanceArrays,
    inst_blas: jax.Array,
    mask: jax.Array,            # bool[N] (single TLAS; multi-TLAS scenes of
    #                             this size fall back to the flat path)
    slot_materials: jax.Array,  # i32[N, S]
    tri_attr: jax.Array,
    *,
    time: Optional[jax.Array] = None,
    animate: Optional[Callable] = None,
    inst_mask: Optional[jax.Array] = None,    # i32[N] 8-bit visibility masks
    inst_opaque: Optional[jax.Array] = None,  # bool[N] force-opaque flags
    resplit: bool = False,
    order_override: Optional[jax.Array] = None,  # i32[N]: custom instance
    #   order for chunk assignment (e.g. a host-built balanced k-d
    #   partition for static scenes); None = in-graph morton sort. Dead
    #   instances must sort last, exactly as the morton path does.
) -> Tuple[PagedScene, int]:
    """Chunked-TLAS frame assembly. Returns (scene, root_code).

    Same per-frame cost class as assemble_scene (O(N) math + one sort +
    O(N)-row gathers); the output TLAS is chunk blocks in HBM instead of
    one SMEM-resident row table."""
    n = instances.capacity
    ch = CHUNK
    l = max(_next_pow2(n), ch)
    nc = l // ch
    nc_pad = _next_pow2(nc)
    nb = meta.num_static_nodes
    na = meta.num_anim_nodes
    root_off = nb + na

    # --- anim BLAS refit (same as assemble_scene) --------------------------
    rs_prim = rs_nrm = None
    if meta.anim and animate is not None and time is not None:
        if resplit:
            anim_rest, rs_prim, rs_nrm = resplit_anim_tables(
                meta, anim_rest, time, animate)
        anim_nodes, anim_leaves, a_lo, a_hi = refit_anim_blases(
            meta, anim_rest, time, animate, anim_prim=rs_prim)
        root_min = jnp.concatenate(
            [blasset.root_min[: meta.num_blas - len(meta.anim)], a_lo], axis=0)
        root_max = jnp.concatenate(
            [blasset.root_max[: meta.num_blas - len(meta.anim)], a_hi], axis=0)
    else:
        anim_nodes = anim_rest_nodes
        anim_leaves = anim_rest
        root_min, root_max = blasset.root_min, blasset.root_max

    na_codes = (jnp.asarray(meta.anim_node_codes)
                if meta.anim_node_codes is not None
                and len(meta.anim_node_codes)
                else jnp.zeros((anim_nodes.shape[0], 2), jnp.int32))
    na_prim = rs_prim if rs_prim is not None else (
        jnp.asarray(meta.anim_leaf_prim)
        if meta.anim_leaf_prim is not None and len(meta.anim_leaf_prim)
        else jnp.zeros((anim_leaves.shape[0], K), jnp.int32))
    na_nrm = rs_nrm if rs_nrm is not None else (
        jnp.asarray(meta.anim_leaf_nrm)
        if meta.anim_leaf_nrm is not None and len(meta.anim_leaf_nrm)
        else jnp.zeros((anim_leaves.shape[0], K * 9), jnp.float32))

    # --- instance world AABBs + morton order (build_tlas_rows math) --------
    alive = instances.alive & mask
    mats = trs_to_mat34(instances.pos, instances.scale, instances.quat)
    bid = jnp.clip(inst_blas, 0, root_min.shape[0] - 1)
    wlo, whi = transform_aabb(mats, root_min[bid], root_max[bid])
    inf = jnp.float32(jnp.inf)
    blo = jnp.where(alive[:, None], wlo, inf)
    bhi = jnp.where(alive[:, None], whi, -inf)
    centroid = jnp.where(alive[:, None], (wlo + whi) * 0.5, 0.0)
    from .bvh import morton_codes

    if order_override is not None:
        order = order_override.astype(jnp.int32)
    else:
        codes_m = morton_codes(centroid, jnp.min(blo, axis=0),
                               jnp.max(bhi, axis=0))
        codes_m = jnp.where(alive, codes_m, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(codes_m).astype(jnp.int32)

    perm = jnp.full((l,), -1, jnp.int32).at[:n].set(
        jnp.where(alive[order], order, -1))
    leaf_min = jnp.full((l, 3), inf, jnp.float32).at[:n].set(blo[order])
    leaf_max = jnp.full((l, 3), -inf, jnp.float32).at[:n].set(bhi[order])

    # --- per-chunk implicit BVHs (vectorized over chunks) ------------------
    cmin = [leaf_min.reshape(nc, ch, 3)]
    cmax = [leaf_max.reshape(nc, ch, 3)]
    while cmin[0].shape[1] > 1:
        a, b = cmin[0], cmax[0]
        cmin.insert(0, jnp.minimum(a[:, 0::2], a[:, 1::2]))
        cmax.insert(0, jnp.maximum(b[:, 0::2], b[:, 1::2]))
    node_min = jnp.concatenate(cmin, axis=1)      # [NC, 2CH-1, 3]
    node_max = jnp.concatenate(cmax, axis=1)
    c0 = jnp.arange(1, 2 * ch - 1, 2)
    c1 = c0 + 1
    rows12 = jnp.concatenate(
        [jnp.nan_to_num(node_min[:, c0], posinf=1e30),
         jnp.nan_to_num(node_max[:, c0], neginf=-1e30),
         jnp.nan_to_num(node_min[:, c1], posinf=1e30),
         jnp.nan_to_num(node_max[:, c1], neginf=-1e30)],
        axis=-1,
    )                                              # [NC, CH-1, 12]
    # dead children (padded slots): make the slab test unpassable
    dead0 = rows12[..., 3:6] < rows12[..., 0:3]
    dead1 = rows12[..., 9:12] < rows12[..., 6:9]
    rows12 = rows12.at[..., 0:3].set(
        jnp.where(dead0, 1e30, rows12[..., 0:3]))
    rows12 = rows12.at[..., 3:6].set(
        jnp.where(dead0, -1e30, rows12[..., 3:6]))
    rows12 = rows12.at[..., 6:9].set(
        jnp.where(dead1, 1e30, rows12[..., 6:9]))
    rows12 = rows12.at[..., 9:12].set(
        jnp.where(dead1, -1e30, rows12[..., 9:12]))

    # --- instance inverse rows + codes, gathered into chunk order ----------
    inv12, icodes = make_instance_rows(
        instances, mats, inst_blas, blasset.root_code,
        inst_mask=inst_mask, inst_opaque=inst_opaque)    # [N,12], [N,2]
    safe = jnp.maximum(perm, 0)
    inst_rows = jnp.where(
        (perm >= 0)[:, None], inv12[safe], 0.0).reshape(nc, ch, 12)
    inst_codes = jnp.where(
        (perm >= 0)[:, None], icodes[safe], 0).reshape(nc, ch, 2)

    # blocks: [CH-1 box rows | CH inst rows | 1 pad]
    pad_box = jnp.zeros((nc, 1, 12), jnp.float32)
    blocks_f = jnp.concatenate([rows12, inst_rows, pad_box], axis=1)
    local = jnp.tile(jnp.asarray(_chunk_local_codes())[None], (nc, 1, 1))
    pad_code = jnp.zeros((nc, 1, 2), jnp.int32)
    blocks_i = jnp.concatenate([local, inst_codes, pad_code], axis=1)

    # per-chunk slot->material table in chunk order
    s = slot_materials.shape[1]
    sblk = smat_block(s)
    smat = jnp.where(
        (perm >= 0)[:, None],
        slot_materials.astype(jnp.int32)[safe], 0).reshape(nc, ch * s)
    smat = jnp.pad(smat, ((0, 0), (0, sblk - ch * s)))

    # --- root BVH over chunk AABBs ------------------------------------------
    ch_lo = [jnp.concatenate(
        [node_min[:, 0], jnp.full((nc_pad - nc, 3), inf)], axis=0)]
    ch_hi = [jnp.concatenate(
        [node_max[:, 0], jnp.full((nc_pad - nc, 3), -inf)], axis=0)]
    while ch_lo[0].shape[0] > 1:
        a, b = ch_lo[0], ch_hi[0]
        ch_lo.insert(0, jnp.minimum(a[0::2], a[1::2]))
        ch_hi.insert(0, jnp.maximum(b[0::2], b[1::2]))
    r_min = jnp.concatenate(ch_lo, axis=0)         # [2*NCP-1, 3]
    r_max = jnp.concatenate(ch_hi, axis=0)
    if nc_pad > 1:
        rc0 = jnp.arange(1, 2 * nc_pad - 1, 2)
        rc1 = rc0 + 1
        rrows = jnp.concatenate(
            [jnp.nan_to_num(r_min[rc0], posinf=1e30),
             jnp.nan_to_num(r_max[rc0], neginf=-1e30),
             jnp.nan_to_num(r_min[rc1], posinf=1e30),
             jnp.nan_to_num(r_max[rc1], neginf=-1e30)],
            axis=-1,
        )                                          # [NCP-1, 12]
        d0 = rrows[:, 3:6] < rrows[:, 0:3]
        d1 = rrows[:, 9:12] < rrows[:, 6:9]
        rrows = rrows.at[:, 0:3].set(jnp.where(d0, 1e30, rrows[:, 0:3]))
        rrows = rrows.at[:, 3:6].set(jnp.where(d0, -1e30, rrows[:, 3:6]))
        rrows = rrows.at[:, 6:9].set(jnp.where(d1, 1e30, rrows[:, 6:9]))
        rrows = rrows.at[:, 9:12].set(jnp.where(d1, -1e30, rrows[:, 9:12]))

        def rcode(c):
            internal = c < nc_pad - 1
            return np.where(
                internal,
                _code(TYPE_BOX, 0) + root_off + c,
                _code(TYPE_CHUNK, 0) + np.maximum(c - (nc_pad - 1), 0),
            ).astype(np.int32)

        rc0n = np.arange(1, 2 * nc_pad - 1, 2)
        rcodes = jnp.asarray(
            np.stack([rcode(rc0n), rcode(rc0n + 1)], axis=-1))
        root_code = _code(TYPE_BOX, root_off)
    else:
        rrows = jnp.zeros((0, 12), jnp.float32)
        rcodes = jnp.zeros((0, 2), jnp.int32)
        root_code = _code(TYPE_CHUNK, 0)

    static_nodes = jnp.concatenate([blasset.nodes, anim_nodes, rrows], axis=0)
    static_codes = jnp.concatenate(
        [blasset.codes, na_codes, rcodes], axis=0)
    assert static_nodes.shape[0] < (1 << 27), "static rows exceed paged payload"

    scene = PagedScene(
        static_nodes=static_nodes,
        static_codes=static_codes,
        chunk_boxes=blocks_f.reshape(-1),
        chunk_codes=blocks_i.reshape(-1),
        chunk_smat=smat.reshape(-1),
        leaf_rows=jnp.concatenate([blasset.leaf_rows, anim_leaves], axis=0),
        leaf_nrm=jnp.concatenate([blasset.leaf_nrm, na_nrm], axis=0),
        leaf_prim=jnp.concatenate([blasset.leaf_prim, na_prim], axis=0),
        fwd_rows=mats.reshape(-1, 12),
        inv_rows=inv12,
        tri_attr=tri_attr,
        bch_nodes=blasset.bch_nodes,
        bch_codes=blasset.bch_codes,
        bch_lpos=blasset.bch_lpos,
        bch_lprim=blasset.bch_lprim,
        bch_luv=blasset.bch_luv,
        bch_lnrm=blasset.bch_lnrm,
    )
    return scene, root_code


def prefer_paged(meta: BLASSetMeta, capacity: int, n_slots: int = 1) -> bool:
    """Host-side (static) choice: chunked-TLAS paging when the flat scene
    would overflow the resident packet kernels' SMEM budget (the old
    behavior was a silent fall-back to the XLA lockstep path)."""
    if meta.num_bchunks > 0:
        # chunked big-model BLASes exist ONLY in the paged layout
        return True
    l = _next_pow2(capacity)
    nn = meta.total_nodes + capacity + max(l - 1, 0)
    nl = meta.num_static_leaves + meta.num_anim_leaves
    resolve_bytes = (nn * 14 * 4 + nl * (72 + K + 48 + 72) * 4
                     + capacity * n_slots * 4)
    return resolve_bytes > 640 * 1024


def make_scene_tracer(
    blasset: BLASSet,
    meta: BLASSetMeta,
    anim_rest: jax.Array,
    anim_rest_nodes: jax.Array,
    instances: InstanceArrays,
    inst_blas: jax.Array,
    masks: Sequence[jax.Array],
    tri_attr: jax.Array,
    slot_materials: jax.Array,
    materials,
    *,
    tlas_index: int,
    stack_size: int,
    leaf_cutout: bool = False,
    use_pallas: bool = False,
    paged: bool = False,
    textures=None,
    time: Optional[jax.Array] = None,
    animate: Optional[Callable] = None,
    image_shape=None,
    wide: bool = False,
    pack: int = 1,
    inst_mask: Optional[jax.Array] = None,    # i32[N] 8-bit visibility masks
    inst_opaque: Optional[jax.Array] = None,  # bool[N] force-opaque flags
    resplit: bool = False,
):
    """Assemble this frame's acceleration structure and return a tracer.

    ``paged`` (a STATIC host decision, see ``prefer_paged``) selects the
    chunked-TLAS layout + PagedSceneTracer; otherwise the flat RTScene +
    SceneTracer. Shared by the RT, hybrid, and sharded frame factories.
    ``resplit`` re-sorts anim BLAS leaf order at the animated pose
    (reference per-frame-rebuild quality, main.cpp:908-921)."""
    if paged:
        scene, root = assemble_scene_paged(
            blasset, meta, anim_rest, anim_rest_nodes, instances, inst_blas,
            masks[tlas_index], slot_materials, tri_attr,
            time=time, animate=animate,
            inst_mask=inst_mask, inst_opaque=inst_opaque, resplit=resplit,
        )
        return PagedSceneTracer(
            scene, slot_materials, materials,
            root_code=root, stack_size=stack_size,
            leaf_cutout=leaf_cutout, use_pallas=use_pallas,
            textures=textures, image_shape=image_shape, wide=wide,
            pack=pack,
        )
    rt_scene, roots = assemble_scene(
        blasset, meta, anim_rest, anim_rest_nodes, instances, inst_blas,
        list(masks), tri_attr, time=time, animate=animate,
        inst_mask=inst_mask, inst_opaque=inst_opaque, resplit=resplit,
    )
    return SceneTracer(
        rt_scene, slot_materials, materials,
        root_code=roots[tlas_index], stack_size=stack_size,
        leaf_cutout=leaf_cutout, use_pallas=use_pallas,
        textures=textures, image_shape=image_shape, wide=wide, pack=pack,
    )


def paged_to_flat(scene: PagedScene) -> Tuple[RTScene, Callable]:
    """Flatten a PagedScene into an equivalent RTScene (XLA lockstep path,
    CPU fallback, and the correctness reference for the paged kernel).

    Chunk blocks append after the static rows; chunk-local payloads remap to
    absolute row indices; root-region CHUNK codes become BOX codes at each
    chunk's local root row. Returns (flat_scene, remap_root) where
    remap_root(root_code) maps the paged root code."""
    ns = scene.static_nodes.shape[0]
    nc = scene.chunk_boxes.shape[0] // (BROWS * 12)
    nbc = scene.bch_codes.shape[0] // BCH_CODE
    l0 = scene.leaf_rows.shape[0]      # static + anim leaf rows
    bnode0 = ns + nc * BROWS           # first BLAS-chunk node row (flat)
    blocks_f = scene.chunk_boxes.reshape(nc, BROWS, 12)
    blocks_i = scene.chunk_codes.reshape(nc, BROWS, 2)

    base = ns + jnp.arange(nc, dtype=jnp.int32)[:, None, None] * BROWS

    def remap(c):
        typ = (c >> _TYPE_SHIFT) & 3
        local = ((c >> 27) & 1) == 1
        pay = c & _PAYLOAD_MASK_P
        is_chunk = typ == TYPE_CHUNK
        # chunk-local -> absolute row in the appended block region
        c2 = jnp.where(
            local & ~is_chunk,
            (c & ~jnp.int32(LOCAL_FLAG | _PAYLOAD_MASK_P)) + base + pay,
            c,
        )
        # CHUNK k -> BOX row at block k's local root (row 0)
        c2 = jnp.where(
            is_chunk,
            jnp.int32(_code(TYPE_BOX, 0)) + ns + pay * BROWS,
            c2,
        )
        return c2

    flat_codes = remap(blocks_i)
    # instance record words (rows CH-1..2CH-2, col 1) are NOT codes — they
    # pack [mask:8 | opaque:1 | id:23] (make_instance_rows), and remap would
    # misread the mask bits as type/locality flags; restore them verbatim
    flat_codes = flat_codes.at[:, CHUNK - 1 : 2 * CHUNK - 1, 1].set(
        blocks_i[:, CHUNK - 1 : 2 * CHUNK - 1, 1])
    # static rows may themselves hold CHUNK codes: world-space (TLAS root
    # region) -> box at the block's local root; object-space (big-model top
    # trees, round 5) -> box at the BLAS chunk's local root row
    def remap_static(c):
        typ = (c >> _TYPE_SHIFT) & 3
        obj = (c >> 30) & 1
        pay = c & _PAYLOAD_MASK_P
        c2 = jnp.where(
            (typ == TYPE_CHUNK) & (obj == 0),
            jnp.int32(_code(TYPE_BOX, 0)) + ns + pay * BROWS,
            c,
        )
        return jnp.where(
            (typ == TYPE_CHUNK) & (obj == 1),
            jnp.int32(_code(TYPE_BOX, 0, obj=True)) + bnode0
            + pay * BL_NROWS,
            c2,
        )

    # BLAS chunk blocks: local box codes -> appended node rows, local leaf
    # codes -> appended leaf rows (after the static+anim leaves)
    if nbc:
        bcodes = scene.bch_codes.reshape(nbc, BL_NROWS, 2)
        bnb = bnode0 + jnp.arange(nbc, dtype=jnp.int32)[:, None, None] \
            * BL_NROWS
        blb = l0 + jnp.arange(nbc, dtype=jnp.int32)[:, None, None] \
            * BL_LEAVES

        def remap_b(c):
            typ = (c >> _TYPE_SHIFT) & 3
            pay = c & _PAYLOAD_MASK_P
            strip = c & ~jnp.int32(LOCAL_FLAG | _PAYLOAD_MASK_P)
            c2 = jnp.where(typ == TYPE_BOX, strip + bnb + pay, c)
            return jnp.where(typ == TYPE_LEAF, strip + blb + pay, c2)

        b_nodes = scene.bch_nodes.reshape(-1, 12)
        b_codes = remap_b(bcodes).reshape(-1, 2)
        b_leaf_rows = jnp.concatenate(
            [scene.bch_lpos.reshape(nbc * BL_LEAVES, _UV),
             scene.bch_luv.reshape(nbc * BL_LEAVES, LEAF_ROW - _UV)], axis=1)
        b_leaf_nrm = scene.bch_lnrm.reshape(-1, K * 9)
        b_leaf_prim = scene.bch_lprim.reshape(-1, K)
    else:
        b_nodes = jnp.zeros((0, 12), jnp.float32)
        b_codes = jnp.zeros((0, 2), jnp.int32)
        b_leaf_rows = jnp.zeros((0, LEAF_ROW), jnp.float32)
        b_leaf_nrm = jnp.zeros((0, K * 9), jnp.float32)
        b_leaf_prim = jnp.zeros((0, K), jnp.int32)

    nodes = jnp.concatenate(
        [scene.static_nodes, blocks_f.reshape(-1, 12), b_nodes], axis=0)
    codes = jnp.concatenate(
        [remap_static(scene.static_codes), flat_codes.reshape(-1, 2),
         b_codes], axis=0)
    flat = RTScene(
        nodes=nodes, codes=codes,
        leaf_rows=jnp.concatenate([scene.leaf_rows, b_leaf_rows], axis=0),
        leaf_nrm=jnp.concatenate([scene.leaf_nrm, b_leaf_nrm], axis=0),
        leaf_prim=jnp.concatenate([scene.leaf_prim, b_leaf_prim], axis=0),
        fwd_rows=scene.fwd_rows,
        inv_rows=scene.inv_rows, tri_attr=scene.tri_attr,
    )

    def remap_root(root_code: int) -> int:
        typ = (root_code >> _TYPE_SHIFT) & 3
        if typ == TYPE_CHUNK:
            return _code(TYPE_BOX, ns + (root_code & _PAYLOAD_MASK_P) * BROWS)
        return root_code

    return flat, remap_root


def build_tri_attr(scene) -> jax.Array:
    """Arena-wide packed object-space attribute rows f32[Ta, 16]:
    [n0 n1 n2 (9) | uv0 uv1 uv2 (6) | material slot (1)]. One gather per ray
    at resolve time (the hitcommon.glsl getHitInfo BDA walk analogue)."""
    arena = scene.arena
    idx = arena._idx
    ta = idx.shape[0]
    out = np.zeros((ta, 16), np.float32)
    nrm = arena._nrm[idx]                     # [Ta, 3, 3]
    uv = arena._uv[idx]                       # [Ta, 3, 2]
    out[:, 0:9] = nrm.reshape(ta, 9)
    out[:, 9:15] = uv.reshape(ta, 6)
    slot = np.zeros(ta, np.float32)
    for model in scene.models:
        for lod in model.lods:
            for mm in lod.meshes:
                h = mm.handle
                slot[h.tri_offset : h.tri_offset + h.tri_count] = mm.material_slot
    out[:, 15] = slot
    return jnp.asarray(out)


def required_stack_size(meta: BLASSetMeta, capacity: int) -> int:
    """Traversal stack bound: one pending far-child per level of each tree +
    one instance entry + slack, rounded to a vector-friendly multiple."""
    d1 = max(1, _next_pow2(capacity).bit_length() - 1)
    bch = 1 if meta.num_bchunks else 0   # BLAS-chunk pop pushes a local root
    return -(-(d1 + meta.max_depth + 8 + bch) // 8) * 8


# ---------------------------------------------------------------------------
# Two-level traversal (XLA lockstep; the Pallas packet kernel is the perf path)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord2:
    t: jax.Array       # f32[R] — inf when miss
    prim: jax.Array    # i32[R] arena triangle id, -1 when miss
    inst: jax.Array    # i32[R] instance slot, -1 when miss
    bary: jax.Array    # f32[R, 2]

    @property
    def hit(self) -> jax.Array:
        return self.prim >= 0


def _slab2(o, inv_d, t_max, bmin0, bmax0, bmin1, bmax1):
    """Slab-test two child boxes; returns (hit0, hit1, tn0, tn1).

    Dead children are marked min > max (build_tlas_rows); the per-axis
    min/max normalization would turn that inverted interval into an
    always-hit box, so inverted boxes are rejected explicitly (one axis
    suffices — dead boxes invert all three)."""
    def one(bmin, bmax):
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tn = jnp.minimum(t0, t1).max(axis=-1)
        tf = jnp.maximum(t0, t1).min(axis=-1)
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= t_max)
        return hit & (bmin[..., 0] <= bmax[..., 0]), tn

    h0, tn0 = one(bmin0, bmax0)
    h1, tn1 = one(bmin1, bmax1)
    return h0, h1, tn0, tn1


def trace_scene(
    scene: RTScene,
    ray_o: jax.Array,    # f32[R, 3] world
    ray_d: jax.Array,    # f32[R, 3] world
    t_max: jax.Array,    # f32[R]
    *,
    root_code: int,      # static: this pass's TLAS root
    stack_size: int,     # static: 2*(tlas_depth + max_blas_depth) + 6
    t_min: float = 1e-3,
    any_hit: bool = False,
    active: Optional[jax.Array] = None,
    alpha_test=None,     # fn(prim i32[R,K], slot i32[R,K], inst i32[R], u, v) -> bool[R,K]
    cull_mask: int = 0xFF,   # per-trace 8-bit cull mask (traceRayEXT param)
) -> HitRecord2:
    """Unified two-level traversal (replaces vkCmdTraceRaysKHR's driver
    TLAS->BLAS walk, RayTrace.cpp:34-95). Lockstep over rays: each step pops
    one tagged code per ray and handles box rows / instance switches / leaf
    tests by masking. Object-space direction is unnormalized so ``t`` is the
    world parameter in both spaces."""
    r = ray_o.shape[0]
    nn = scene.nodes.shape[0]
    nl = scene.leaf_rows.shape[0]
    s = stack_size

    rzf = ray_o[:, 0] * 0.0 + ray_d[:, 0] * 0.0
    rz = rzf.astype(jnp.int32)
    stack = rz[:, None] + jnp.zeros((1, s), jnp.int32)
    stack = stack.at[:, 0].set(root_code)
    sp0 = rz + 1
    if active is not None:
        sp0 = jnp.where(active, sp0, 0)

    state = (
        sp0, stack,
        jnp.asarray(t_max, jnp.float32) + rzf,       # best_t
        rz - 1,                                       # best_prim
        rz - 1,                                       # best_inst
        rzf[:, None] + jnp.zeros((1, 2), jnp.float32),  # best_bary
        rzf[:, None] + ray_o,                         # o_obj
        rzf[:, None] + ray_d,                         # d_obj
        rz,                                           # cur_inst
    )

    cols = jnp.arange(s, dtype=jnp.int32)[None, :]

    def cond(st):
        return jnp.any(st[0] > 0)

    def body(st):
        (sp, stack, best_t, best_prim, best_inst, best_bary,
         o_obj, d_obj, cur_inst) = st
        live = sp > 0
        top = jnp.maximum(sp - 1, 0)
        code = jnp.sum(jnp.where(cols == top[:, None], stack, 0), axis=1)
        code = jnp.where(live, code, 0)
        sp = jnp.where(live, sp - 1, sp)

        typ = (code >> _TYPE_SHIFT) & 3
        payload = code & _PAYLOAD_MASK
        obj = (code >> 30) & 1
        is_box = live & (typ == TYPE_BOX)
        is_leaf = live & (typ == TYPE_LEAF)
        is_inst = live & (typ == TYPE_INST)

        # ---- unified node-row gather (box rows AND instance rows) ---------
        safe_p = jnp.clip(payload, 0, nn - 1)
        row = scene.nodes[safe_p]                                # [R, 12]
        cpair = scene.codes[safe_p]                              # [R, 2]

        # ---- instance switch: world ray -> object ray, push BLAS root -----
        inv = row[:, :12]
        o2 = jnp.stack(
            [inv[:, 4 * i] * ray_o[:, 0] + inv[:, 4 * i + 1] * ray_o[:, 1]
             + inv[:, 4 * i + 2] * ray_o[:, 2] + inv[:, 4 * i + 3]
             for i in range(3)], axis=-1)
        d2 = jnp.stack(
            [inv[:, 4 * i] * ray_d[:, 0] + inv[:, 4 * i + 1] * ray_d[:, 1]
             + inv[:, 4 * i + 2] * ray_d[:, 2]
             for i in range(3)], axis=-1)
        o_obj = jnp.where(is_inst[:, None], o2, o_obj)
        d_obj = jnp.where(is_inst[:, None], d2, d_obj)
        cur_inst = jnp.where(is_inst, cpair[:, 1], cur_inst)  # record word
        rootc = cpair[:, 0]
        # 8-bit visibility: skip instances whose mask misses the ray's cull
        # mask (VkAccelerationStructureInstanceKHR.mask semantics)
        mask_ok = ((cpair[:, 1] >> 24) & cull_mask) != 0

        def push(sp, stack, val, do):
            sel = (cols == sp[:, None]) & do[:, None]
            stack = jnp.where(sel, val[:, None], stack)
            sp = jnp.where(do, sp + 1, sp)
            return sp, stack

        sp, stack = push(sp, stack, rootc, is_inst & mask_ok)

        # ---- box row: slab-test both children in the row's space ----------
        use_obj = (obj == 1) & is_box
        ot = jnp.where(use_obj[:, None], o_obj, ray_o)
        dt = jnp.where(use_obj[:, None], d_obj, ray_d)
        inv_d = 1.0 / jnp.where(jnp.abs(dt) < 1e-12, 1e-12, dt)
        h0, h1, tn0, tn1 = _slab2(
            ot, inv_d, best_t,
            row[:, 0:3], row[:, 3:6], row[:, 6:9], row[:, 9:12])
        h0 &= is_box
        h1 &= is_box
        c0 = cpair[:, 0]
        c1 = cpair[:, 1]
        first_is_0 = tn0 <= tn1
        near = jnp.where(first_is_0, c0, c1)
        far = jnp.where(first_is_0, c1, c0)
        near_hit = jnp.where(first_is_0, h0, h1)
        far_hit = jnp.where(first_is_0, h1, h0)
        sp, stack = push(sp, stack, far, far_hit)
        sp, stack = push(sp, stack, near, near_hit)

        # ---- leaf: one row gather tests K triangles ------------------------
        safe_l = jnp.clip(payload, 0, nl - 1)
        lrow = scene.leaf_rows[safe_l]                           # [R, 120]
        tri = lrow[:, _POS:_UV].reshape(r, K, 9)
        prim_tag = scene.leaf_prim[safe_l]                       # [R, K] i32
        prim = prim_tag & 0x00FFFFFF
        slot = jnp.where(prim_tag >= 0, prim_tag >> 24, 0)
        from .bvh import moller_trumbore_edges

        # leaf rows store (a, e1, e2)
        t, u, v, hit = moller_trumbore_edges(
            o_obj[:, None, :], d_obj[:, None, :],
            tri[..., 0:3], tri[..., 3:6], tri[..., 6:9], t_min=t_min,
        )
        cand = is_leaf[:, None] & hit & (prim_tag >= 0) & (t < best_t[:, None])
        inst_id = cur_inst & INST_ID_MASK
        if alpha_test is not None:
            # force-opaque instances skip the any-hit test entirely
            # (VK_GEOMETRY_INSTANCE_FORCE_OPAQUE_BIT semantics)
            opq = (cur_inst & INST_OPAQUE_BIT) != 0
            cand &= (alpha_test(jnp.maximum(prim, 0), slot, inst_id, u, v)
                     | opq[:, None])
        t_m = jnp.where(cand, t, jnp.inf)
        best_k = jnp.argmin(t_m, axis=1)
        sel = jax.lax.broadcasted_iota(jnp.int32, (r, K), 1) == best_k[:, None]
        any_win = jnp.any(cand, axis=1)
        t_new = jnp.min(t_m, axis=1)
        prim_new = jnp.sum(jnp.where(sel, prim, 0), axis=1)
        u_new = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
        v_new = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
        best_t = jnp.where(any_win, t_new, best_t)
        best_prim = jnp.where(any_win, prim_new, best_prim)
        best_inst = jnp.where(any_win, inst_id, best_inst)
        best_bary = jnp.where(
            any_win[:, None], jnp.stack([u_new, v_new], axis=-1), best_bary)
        if any_hit:
            sp = jnp.where(any_win, 0, sp)

        return (sp, stack, best_t, best_prim, best_inst, best_bary,
                o_obj, d_obj, cur_inst)

    st = jax.lax.while_loop(cond, body, state)
    best_t, best_prim, best_inst, best_bary = st[2], st[3], st[4], st[5]
    miss = best_prim < 0
    return HitRecord2(
        t=jnp.where(miss, jnp.inf, best_t),
        prim=best_prim,
        inst=jnp.where(miss, -1, best_inst),
        bary=best_bary,
    )


# ---------------------------------------------------------------------------
# Tracer context: the (trace, resolve) protocol the lighting passes use
# ---------------------------------------------------------------------------

class SceneTracer:
    """Two-level tracer + attribute resolver bound to one frame's RTScene.

    The protocol shared with ops.trace.BatchTracer: ``.trace(o, d, t_max,
    any_hit=, active=, use_alpha=)`` -> hit record and ``.resolve(rec, o, d)``
    -> trace.SurfaceHits. ``use_alpha`` enables the any-hit leaf-cutout test
    (reference leaf.rahit; shadow rays stay opaque — OpaqueEXT flags)."""

    def __init__(
        self,
        scene: RTScene,
        slot_materials: jax.Array,   # i32[N, S]
        materials,                   # core.material.MaterialTable
        *,
        root_code: int,
        stack_size: int,
        leaf_cutout: bool = False,
        use_pallas: bool = False,
        textures=None,
        image_shape=None,
        wide: bool = False,
        pack: int = 1,
    ):
        self.scene = scene
        self.slot_materials = slot_materials
        self.materials = materials
        self.textures = textures
        self.root_code = root_code
        self.stack_size = stack_size
        self.leaf_cutout = leaf_cutout
        self.use_pallas = use_pallas
        # 4-wide grandchild box steps in the packet kernels (A/B perf knob)
        self.wide = wide
        # fat packets: rays per packet = 1024 * pack sharing ONE stack walk
        # (the traversal step is scalar/branch-bound — round-5 measurement —
        # so a wider packet's extra vector sub-blocks pipeline nearly free;
        # the union footprint grows with the packet's pixel area instead)
        self.pack = pack
        # (H, W): group R == H*W wavefronts as (8, 128) pixel-tile packets
        # (trace_kernel.image_mode_ok) — secondary rays derived from image-
        # layout G-buffers keep tile-footprint coherence with zero relayout
        self.image_shape = tuple(image_shape) if image_shape else None

    def _image_shape(self, n_rays: int):
        from .trace_kernel import image_mode_ok

        return (self.image_shape
                if image_mode_ok(self.image_shape, n_rays) else None)

    # -- alpha cutout hook ---------------------------------------------------
    def _alpha_test(self):
        if not self.leaf_cutout:
            return None
        from ..core.material import SHADE_LEAF
        from .shading import leaf_alpha

        scene = self.scene
        slot_materials = self.slot_materials
        shading_model = self.materials.shading_model

        def test(prim, slot, inst, u, v):
            # material id = per-instance slot binding (one [S]-row gather per
            # ray + small one-hot select over slots)
            srow = slot_materials[jnp.clip(inst, 0, slot_materials.shape[0] - 1)]
            mat = jnp.take_along_axis(
                srow[:, None, :].repeat(slot.shape[1], axis=1),
                jnp.clip(slot, 0, slot_materials.shape[1] - 1)[..., None],
                axis=-1,
            )[..., 0]
            is_leaf_mat = shading_model[mat] == SHADE_LEAF
            attr = scene.tri_attr[prim]                       # [R, K, 16]
            w0 = 1.0 - u - v
            uv = (
                w0[..., None] * attr[..., 9:11]
                + u[..., None] * attr[..., 11:13]
                + v[..., None] * attr[..., 13:15]
            )
            return jnp.where(is_leaf_mat, leaf_alpha(uv) >= 0.5, True)

        return test

    def _step_bound(self) -> int:
        from .trace_kernel import traversal_step_bound

        return traversal_step_bound(self.scene, self.slot_materials.shape[0])

    def trace(self, o, d, t_max, *, any_hit=False, active=None,
              use_alpha=False, cull_mask: int = 0xFF):
        alpha = self._alpha_test() if use_alpha else None
        if self.use_pallas and alpha is None:
            from .trace_kernel import (
                _STACK, pallas_traversal_ok, trace_scene_pallas,
            )

            if (self.stack_size <= _STACK
                    and pallas_traversal_ok(self.scene, o.shape[0])):
                return trace_scene_pallas(
                    self.scene, o, d, t_max,
                    root_code=self.root_code, stack_size=self.stack_size,
                    any_hit=any_hit, active=active,
                    max_steps=self._step_bound(),
                    image_shape=self._image_shape(o.shape[0]),
                    wide=self.wide, pack=self.pack, cull_mask=cull_mask,
                )
        return trace_scene(
            self.scene, o, d, t_max,
            root_code=self.root_code, stack_size=self.stack_size,
            any_hit=any_hit, active=active, alpha_test=alpha,
            cull_mask=cull_mask,
        )

    def trace_occlusion_bundle(self, o, dirs, t_caps, *, active=None,
                               cull_mask: int = 0xFF):
        """S origin-shared any-hit rays in ONE traversal -> i32[R] bitmask
        (bit s = sample s occluded). Soft-shadow samples toward one light
        share origins and near-identical footprints, so the bundle costs
        ~one wavefront instead of S (trace_kernel._make_bundle_kernel).
        Falls back to S any-hit traces (CPU/XLA path — the correctness
        reference)."""
        if self.use_pallas:
            from .trace_kernel import (
                _STACK, pallas_traversal_ok, trace_shadow_bundle_pallas,
            )

            if (self.stack_size <= _STACK
                    and pallas_traversal_ok(self.scene, o.shape[0])):
                return trace_shadow_bundle_pallas(
                    self.scene, o, tuple(dirs), tuple(t_caps),
                    root_code=self.root_code, stack_size=self.stack_size,
                    active=active, max_steps=self._step_bound(),
                    wide=self.wide, pack=self.pack, cull_mask=cull_mask,
                )
        bits = jnp.zeros((o.shape[0],), jnp.int32)
        for s, (d, tc) in enumerate(zip(dirs, t_caps)):
            rec = self.trace(o, d, tc, any_hit=True, active=active,
                             cull_mask=cull_mask)
            occ = rec.hit if active is None else (rec.hit | ~active)
            bits = bits | (occ.astype(jnp.int32) << s)
        return bits

    def trace_shadow_ao_bundle(self, o, dirs, t_caps, ao_dirs, ao_caps, *,
                               occ_actives=None, ao_actives=None,
                               cull_mask: int = 0xFF):
        """Fused shadow + RTAO bundle: all occlusion samples AND closest-t AO
        samples share one origin per lane and traverse ONCE
        (trace_kernel.trace_bundle_pallas). Returns ``(bits, ao_ts)``; each
        AO t equals its cap when nothing closer hit (AO weight 0). Falls
        back to per-sample traces (the correctness reference)."""
        if self.use_pallas:
            from .trace_kernel import (
                _STACK, pallas_traversal_ok, trace_bundle_pallas,
            )

            if (self.stack_size <= _STACK
                    and pallas_traversal_ok(self.scene, o.shape[0])):
                return trace_bundle_pallas(
                    self.scene, o, tuple(dirs), tuple(t_caps),
                    tuple(ao_dirs), tuple(ao_caps),
                    root_code=self.root_code, stack_size=self.stack_size,
                    occ_actives=None if occ_actives is None
                    else tuple(occ_actives),
                    ao_actives=None if ao_actives is None
                    else tuple(ao_actives),
                    max_steps=self._step_bound(),
                    wide=self.wide, pack=self.pack, cull_mask=cull_mask,
                )
        r = o.shape[0]
        bits = jnp.zeros((r,), jnp.int32)
        for s, (d, tc) in enumerate(zip(dirs, t_caps)):
            act = None if occ_actives is None else occ_actives[s]
            rec = self.trace(o, d, tc, any_hit=True, active=act,
                             cull_mask=cull_mask)
            occ = rec.hit if act is None else (rec.hit | ~act)
            bits = bits | (occ.astype(jnp.int32) << s)
        ao_ts = []
        for j, (d, tc) in enumerate(zip(ao_dirs, ao_caps)):
            act = None if ao_actives is None else ao_actives[j]
            cap = jnp.asarray(tc, jnp.float32) + o[:, 0] * 0.0
            rec = self.trace(o, d, cap, active=act, cull_mask=cull_mask)
            t = jnp.where(rec.hit, rec.t, cap)
            if act is not None:
                t = jnp.where(act, t, -3e38)
            ao_ts.append(t)
        return bits, tuple(ao_ts)

    def _surface_from_resolved(self, out, o, d):
        """trace_resolve_scene_pallas output dict -> SurfaceHits (shared
        normalization / face-forward / miss handling)."""
        from .trace import SurfaceHits

        hit = out["prim"] >= 0
        t = jnp.where(hit, out["t"], 0.0)
        n = out["normal"]
        n = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        facing = jnp.sum(n * d, axis=-1) < 0.0
        n = jnp.where(facing[:, None], n, -n)
        return SurfaceHits(
            world_pos=o + t[:, None] * d,
            normal=n,
            uv=out["uv"],
            material=jnp.where(hit, out["material"], 0),
            valid=hit,
            t=out["t"],
        )

    def trace_shadow_ao_resolve_bundle(self, o, dirs, t_caps, ao_dirs,
                                       ao_caps, rs_d, rs_cap, *,
                                       occ_actives=None, ao_actives=None,
                                       rs_active=None, cull_mask: int = 0xFF):
        """Fused shadow + RTAO + 1-bounce bundle: the occlusion samples, the
        closest-t AO samples AND the reflection ray (closest hit + full
        attribute resolve) share one origin per lane and traverse ONCE.
        Returns ``(bits, ao_ts, SurfaceHits)``. Falls back to the fused
        shadow+AO bundle plus a separate trace_resolve."""
        if self.use_pallas:
            from .trace_kernel import (
                _STACK, pallas_resolve_ok, trace_bundle_pallas,
            )

            if (self.stack_size <= _STACK
                    and pallas_resolve_ok(self.scene, o.shape[0],
                                          self.slot_materials)):
                bits, ao_ts, out = trace_bundle_pallas(
                    self.scene, o, tuple(dirs), tuple(t_caps),
                    tuple(ao_dirs), tuple(ao_caps),
                    rs_d, rs_cap, self.slot_materials,
                    root_code=self.root_code, stack_size=self.stack_size,
                    occ_actives=None if occ_actives is None
                    else tuple(occ_actives),
                    ao_actives=None if ao_actives is None
                    else tuple(ao_actives),
                    rs_active=rs_active,
                    max_steps=self._step_bound(),
                    wide=self.wide, pack=self.pack, cull_mask=cull_mask,
                )
                return bits, ao_ts, self._surface_from_resolved(out, o, rs_d)
        bits, ao_ts = self.trace_shadow_ao_bundle(
            o, dirs, t_caps, ao_dirs, ao_caps, occ_actives=occ_actives,
            ao_actives=ao_actives, cull_mask=cull_mask)
        surf = self.trace_resolve(o, rs_d, rs_cap, active=rs_active,
                                  cull_mask=cull_mask)
        return bits, ao_ts, surf

    def trace_resolve(self, o, d, t_max, *, active=None, use_alpha=False,
                      cull_mask: int = 0xFF):
        """Closest hit + attribute resolve in one step -> SurfaceHits.

        On TPU, the fused Pallas kernel interpolates uv/normal and looks up
        the material AT HIT TIME from SMEM — no per-ray attribute gathers
        (which cost ~30 ns/row x 2 rows x rays in ``resolve``)."""
        alpha_needed = use_alpha and self.leaf_cutout
        if self.use_pallas:
            from .trace_kernel import (
                _STACK, pallas_resolve_ok, trace_resolve_scene_pallas,
            )

            if (self.stack_size <= _STACK
                    and pallas_resolve_ok(self.scene, o.shape[0],
                                          self.slot_materials)):
                out = trace_resolve_scene_pallas(
                    self.scene, self.slot_materials, o, d, t_max,
                    root_code=self.root_code, stack_size=self.stack_size,
                    active=active, max_steps=self._step_bound(),
                    shading_model=(self.materials.shading_model
                                   if alpha_needed else None),
                    image_shape=self._image_shape(o.shape[0]),
                    wide=self.wide, pack=self.pack, cull_mask=cull_mask,
                )
                return self._surface_from_resolved(out, o, d)
        rec = self.trace(o, d, t_max, active=active, use_alpha=use_alpha,
                         cull_mask=cull_mask)
        return self.resolve(rec, o, d)

    def resolve(self, rec: HitRecord2, ray_o, ray_d):
        """Interpolate hit attributes (hitcommon.glsl getHitInfo analogue):
        world position from the ray equation (exact), normals/uvs from ONE
        object-space attr row + the instance's inverse-transpose."""
        from .trace import SurfaceHits

        scene = self.scene
        pid = jnp.maximum(rec.prim, 0)
        iid = jnp.clip(rec.inst, 0, scene.fwd_rows.shape[0] - 1)
        u = rec.bary[:, 0]
        v = rec.bary[:, 1]
        w0 = 1.0 - u - v

        attr = scene.tri_attr[pid]                            # [R, 16]
        inv = scene.inv_rows[iid]                             # [R, 12]

        t = jnp.where(rec.hit, rec.t, 0.0)
        world = ray_o + t[:, None] * ray_d

        n_obj = (
            w0[:, None] * attr[:, 0:3]
            + u[:, None] * attr[:, 3:6]
            + v[:, None] * attr[:, 6:9]
        )
        # world normal = (M^-1)^T n_obj (reference hitcommon.glsl:128
        # localNormal * gl_WorldToObjectEXT) — matches the fused Pallas
        # resolve kernel; the forward matrix is wrong under non-uniform scale
        n_w = jnp.stack(
            [inv[:, i] * n_obj[:, 0] + inv[:, i + 4] * n_obj[:, 1]
             + inv[:, i + 8] * n_obj[:, 2]
             for i in range(3)], axis=-1)
        n_w = n_w / jnp.maximum(
            jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-12)
        facing = jnp.sum(n_w * ray_d, axis=-1) < 0.0
        n_w = jnp.where(facing[:, None], n_w, -n_w)

        uv = (
            w0[:, None] * attr[:, 9:11]
            + u[:, None] * attr[:, 11:13]
            + v[:, None] * attr[:, 13:15]
        )
        slot = attr[:, 15].astype(jnp.int32)
        srow = self.slot_materials[iid]                       # [R, S]
        mat = jnp.take_along_axis(
            srow, jnp.clip(slot, 0, srow.shape[1] - 1)[:, None], axis=1
        )[:, 0]
        return SurfaceHits(
            world_pos=world,
            normal=n_w,
            uv=uv,
            material=jnp.where(rec.hit, mat, 0),
            valid=rec.hit,
            t=rec.t,
        )


class PagedSceneTracer:
    """SceneTracer-protocol tracer for chunked PagedScenes (10k+ instances).

    On TPU the paged packet kernels stream TLAS chunks HBM->SMEM
    (ops/trace_paged.py); everywhere else (CPU tests, alpha-test closest-hit
    traces) it falls back to the XLA lockstep path over the flattened view
    (``paged_to_flat``), which is also the correctness reference."""

    def __init__(
        self,
        scene: PagedScene,
        slot_materials: jax.Array,
        materials,
        *,
        root_code: int,
        stack_size: int,
        leaf_cutout: bool = False,
        use_pallas: bool = False,
        textures=None,
        image_shape=None,
        wide: bool = False,
        pack: int = 1,
    ):
        self.scene = scene
        self.slot_materials = slot_materials
        self.materials = materials
        self.textures = textures
        self.root_code = root_code
        self.stack_size = stack_size
        self.leaf_cutout = leaf_cutout
        self.use_pallas = use_pallas
        # 4-wide grandchild box steps (round-4: _wide_box_step_paged reads
        # grandchild rows from the table the CHILD's locality bit names, so
        # the not-yet-resident-chunk hazard that kept round 3 binary is
        # gone: chunk codes are non-box children and are never dereferenced
        # before their own pop runs the DMA)
        self.wide = wide
        # fat packets (see SceneTracer.pack)
        self.pack = pack
        self.image_shape = tuple(image_shape) if image_shape else None
        self._flat = None

    def _image_shape(self, n_rays: int):
        from .trace_kernel import image_mode_ok

        return (self.image_shape
                if image_mode_ok(self.image_shape, n_rays) else None)

    def _flat_tracer(self) -> "SceneTracer":
        if self._flat is None:
            flat, remap_root = paged_to_flat(self.scene)
            self._flat = SceneTracer(
                flat, self.slot_materials, self.materials,
                root_code=remap_root(self.root_code),
                stack_size=self.stack_size,
                leaf_cutout=self.leaf_cutout,
                use_pallas=False,   # resident kernel can't hold this scene
                textures=self.textures,
            )
        return self._flat

    def _step_bound(self) -> int:
        nn = (self.scene.static_nodes.shape[0]
              + self.scene.chunk_codes.shape[0] // 2
              + self.scene.bch_codes.shape[0] // 2)
        nl = (self.scene.leaf_rows.shape[0]
              + self.scene.bch_lprim.shape[0] // K)
        n = self.slot_materials.shape[0]
        return min(2**31 - 2, 2 * n * (nl + 2) + nn + 64)

    def _eff_stack(self) -> int:
        # wide steps push up to 3 net entries per pop over half the depth
        return ((self.stack_size * 3) // 2 + 2 if self.wide
                else self.stack_size)

    def trace(self, o, d, t_max, *, any_hit=False, active=None,
              use_alpha=False, cull_mask: int = 0xFF):
        alpha = use_alpha and self.leaf_cutout
        if self.use_pallas and not alpha:
            from .trace_paged import (
                _STACK, paged_traversal_ok, trace_scene_pallas_paged,
            )

            if (self._eff_stack() <= _STACK
                    and paged_traversal_ok(self.scene, o.shape[0])):
                return trace_scene_pallas_paged(
                    self.scene, o, d, t_max,
                    root_code=self.root_code, stack_size=self.stack_size,
                    any_hit=any_hit, active=active,
                    max_steps=self._step_bound(),
                    image_shape=self._image_shape(o.shape[0]),
                    wide=self.wide, pack=self.pack, cull_mask=cull_mask,
                )
        return self._flat_tracer().trace(
            o, d, t_max, any_hit=any_hit, active=active, use_alpha=use_alpha,
            cull_mask=cull_mask)

    def trace_occlusion_bundle(self, o, dirs, t_caps, *, active=None,
                               cull_mask: int = 0xFF):
        """S origin-shared any-hit samples -> i32[R] occlusion bitmask.
        The paged kernel has no bundle variant yet: loop S any-hit paged
        traces (still the paged fast path per sample)."""
        bits = jnp.zeros((o.shape[0],), jnp.int32)
        for s, (d, tc) in enumerate(zip(dirs, t_caps)):
            rec = self.trace(o, d, tc, any_hit=True, active=active,
                             cull_mask=cull_mask)
            occ = rec.hit if active is None else (rec.hit | ~active)
            bits = bits | (occ.astype(jnp.int32) << s)
        return bits

    def trace_resolve(self, o, d, t_max, *, active=None, use_alpha=False,
                      cull_mask: int = 0xFF):
        alpha_needed = use_alpha and self.leaf_cutout
        if self.use_pallas:
            from .trace_paged import (
                _STACK, paged_resolve_ok, trace_resolve_scene_pallas_paged,
            )

            if (self._eff_stack() <= _STACK
                    and paged_resolve_ok(self.scene, o.shape[0])):
                from .trace import SurfaceHits

                out = trace_resolve_scene_pallas_paged(
                    self.scene, o, d, t_max,
                    root_code=self.root_code, stack_size=self.stack_size,
                    max_steps=self._step_bound(),
                    n_slots=self.slot_materials.shape[1],
                    active=active,
                    shading_model=(self.materials.shading_model
                                   if alpha_needed else None),
                    image_shape=self._image_shape(o.shape[0]),
                    wide=self.wide, pack=self.pack, cull_mask=cull_mask,
                )
                hit = out["prim"] >= 0
                t = jnp.where(hit, out["t"], 0.0)
                n = out["normal"]
                n = n / jnp.maximum(
                    jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
                facing = jnp.sum(n * d, axis=-1) < 0.0
                n = jnp.where(facing[:, None], n, -n)
                return SurfaceHits(
                    world_pos=o + t[:, None] * d,
                    normal=n,
                    uv=out["uv"],
                    material=jnp.where(hit, out["material"], 0),
                    valid=hit,
                    t=out["t"],
                )
        return self._flat_tracer().trace_resolve(
            o, d, t_max, active=active, use_alpha=use_alpha,
            cull_mask=cull_mask)

    def resolve(self, rec: HitRecord2, ray_o, ray_d):
        return self._flat_tracer().resolve(rec, ray_o, ray_d)
