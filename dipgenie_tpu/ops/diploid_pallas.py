"""Pallas megakernel diploid pair DP (pair-space formulation).

The third-generation device tier. The chunked tier (ops/diploid_jax.py)
is dispatch-bound on remote-attached TPUs (~7k executable launches per
MHC run at ~0.06 ms each); the fused XLA scan tier (ops/diploid_fused.py)
is a single dispatch but its multi-GB backpointer carry defeats XLA's
in-place aliasing on real TPUs. This tier reformulates the transition in
PAIR SPACE and runs each maximal run of narrow levels (width <= 32) as
ONE `pallas_call`, with maximal runs of wide levels handled by a second
windowed Pallas kernel:

  * DP state V[r, s] with s = i*Bcls + j packed into full 128-lane
    vectors (Bcls in {16, 32} per level width); a narrow transition's
    edge pairs are host-sorted by (dstpair, pred_i, pred_j, edge order)
    and processed in chunks of 256 pairs per Pallas grid step;
  * the predecessor gather is ONE f32 MXU matmul against an in-kernel
    one-hot (exact: all values < 2^24); the recombination shift by
    wsum in {0,1,2} is applied after the gather (a roll over r commutes
    with a per-lane gather);
  * the dst-pair max is a segmented inclusive max-scan over lanes on a
    packed key (value*256 | slotcode) — larger slotcode == earlier
    pair == preferred, which is exactly the reference tie-break
    (value, then smaller pred_i, then smaller pred_j, then edge order;
    approximator.cpp:655-659 semantics via solver/diploid.py);
  * multi-chunk transitions merge through VMEM accumulators with a
    strict > on the value (earlier chunk wins ties = earlier pair);
  * backpointers (global pair ordinal per state) leave the kernel
    through pipelined output blocks whose prefetch-scalar index maps
    advance once per transition — Pallas flushes a block exactly when
    its index changes, giving variable-rate outputs without the manual
    HBM DMA that Mosaic cannot compile at unaligned dynamic offsets;
  * wide transitions (width > 32 or > 2^15 pairs; ~3% of MHC levels in
    ~300 contiguous runs) use a second Pallas kernel with a
    [R1P, NB*1024] double-buffered VMEM state: chunks are split at
    1024-lane destination windows, predecessors are gathered with
    block-masked one-hot matmuls (only the source windows a chunk
    actually touches), and results read-modify-write the destination
    window with a strict > so earlier chunks win ties. An earlier XLA
    lax.scan formulation of the same step measured ~320 us/step
    (serialized gathers + 15-stage associative_scan over 20k lanes) vs
    a few us/chunk here;
  * scores (hom/het colour popcounts, approximator.cpp:269-311) are
    precomputed per edge pair on the host with vectorized numpy — they
    are pure functions of the transition, so the device loop only adds
    and maxes;
  * traceback is a reverse scan per segment reading the spilled
    backpointers; s_het is recomputed from per-pair het scores.

Reference: src/approximator.cpp:362-716 (semantics only). Output
contract matches the exact tier bit for bit:
run() -> (sink_value, sink_s_het, transitions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

NEG = -(2**19)  # unreachable sentinel, re-pinned every level

# bump when plan layout/ladders change (invalidates on-disk plan caches)
PLAN_FORMAT = 8  # 8: flat narrow pair layouts (i*k+j, 256..1024 extents)

# packed chunk-table layout (PLAN_FORMAT 6): tbl is [nchunks, 2, CHUNK]
#   row 0: gidx << 13 | (dst + 1) << 2 | wsum   (gidx < 2^15 = NB_max*1024
#          + narrow layouts; dst+1 in [0, 1024] — 0 marks a padded lane;
#          wsum in {0, 1, 2})
#   row 1: score (PAD_SC on padded lanes)
# The extract one-hot (formerly rows 4..7, "last chunk-lane per out
# lane") is reconstructed IN-KERNEL from dst: pairs are dst-sorted
# within a chunk, so the last occurrence of each dst is the lane whose
# successor differs — one compare per lane, no 4x256 table. This
# quarters the per-plan HBM shipping (MHC: ~2 GB -> ~0.5 GB) and
# removes the planner's lastE scatter pass.
_TBL_ROWS = 2

# MXU matmul exactness for the in-kernel one-hot gathers/extracts.
# CRITICAL: the default TPU f32 dot truncates inputs to bf16 (8
# mantissa bits), which collapses the value+2^22 offset plane to a
# constant and silently zeroes the DP (this was round 3's "sink value
# 0" bug). Round 4 used THREE bf16-exact 8-bit f32 planes; round 5
# moved to the MXU's native s8 x s8 -> s32 mode (exact by
# construction, no float converts, 2x the bf16 MAC rate), with the
# digit encoding below. Compiled parity on real TPU
# (scripts/tpu_parity_gate.py) gates any change here.
import os as _os

# Exactness now rides BALANCED base-256 digits: any nonnegative value
# v < 2^31 decomposes as sum(d_i * 256^i) with d_i in [-128, 127]
# (each digit fits s8 exactly; the s8 x s8 -> s32 dot is exact), and
# — unlike biased digits — an EMPTY one-hot column recombines to 0
# with no correction term, so the extract needs no ones-row/hit-count
# machinery and its matmul is exactly 128 rows = one MXU row-tile.


def _balanced_digits(jnp, v, n):
    """n balanced base-256 s8 digit planes of v (>= 0), stacked on
    axis 0. Exact: v == sum(d_i * 256^i)."""
    ds = []
    c = v
    for _ in range(n - 1):
        d = ((c + 128) & 255) - 128
        ds.append(d)
        c = (c - d) >> 8
    ds.append(c)  # top digit: |c| < 128 by construction for v < 2^(8n-1)
    return jnp.concatenate(ds, axis=0).astype(jnp.int8)
REACH_T = -(2**18)  # values above this are reachable
INVALID = -(2**30)  # packed-key / candidate sentinel
PAD_SC = -(2**22)  # score of padded pair lanes (loses every max)
CHUNK = 2**8  # pair lanes per narrow Pallas step
NARROW_W = 32  # widest level handled by the Pallas kernel


# --------------------------------------------------------------------
# host-side colour mask -> per-pair score machinery
# --------------------------------------------------------------------

_POP16 = np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
)


def _popcount(a: np.ndarray) -> np.ndarray:
    """Elementwise popcount of uint32/uint64 arrays (numpy-version safe)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(a)
    v = a.view(np.uint16) if a.dtype != np.uint16 else a
    return (
        _POP16[v]
        .reshape(a.shape + (a.dtype.itemsize // 2,))
        .sum(-1)
        .astype(np.uint8)
    )


def _level_masks(vs, ve, ptr, colors, uniq):
    """[ve-vs, W] uint32 colour bitsets over the local colour universe."""
    cnt = ve - vs
    W = max(1, (len(uniq) + 31) // 32)
    m = np.zeros((cnt, W), np.uint32)
    seg = colors[ptr[vs] : ptr[ve]]
    if len(seg):
        loc = np.searchsorted(uniq, seg).astype(np.int64)
        rows = np.repeat(
            np.arange(cnt, dtype=np.int64),
            np.diff(ptr[vs : ve + 1]).astype(np.int64),
        )
        np.bitwise_or.at(
            m, (rows, loc // 32), np.uint32(1) << (loc % 32).astype(np.uint32)
        )
    return m


# --------------------------------------------------------------------
# plan
# --------------------------------------------------------------------


@dataclass
class _NarrowRun:
    t0: int  # first transition index (global)
    t1: int  # one past last
    tbl: np.ndarray  # [nchunks_pad, 2, CHUNK] int32 packed blocks
    w1: np.ndarray  # [nchunks, CHUNK] int8   (traceback only)
    symd: np.ndarray  # [nchunks, CHUNK] int16 (traceback only)
    sbits: np.ndarray  # [nchunks_pad] int32 bit0 in1024 bit1 out1024 b2 first b3 last
    sbase: np.ndarray  # [nchunks_pad] int32 chunk ordinal * CHUNK
    r256: np.ndarray  # [nchunks_pad] int32 bp row per out256 transition
    r1024: np.ndarray  # [nchunks_pad] int32
    n256: int
    n1024: int
    # traceback per-transition metadata
    tb_chunkbase: np.ndarray  # [T] int32 first chunk row of transition
    tb_bits: np.ndarray  # [T] int32 (out1024 bit)
    tb_bprow: np.ndarray  # [T] int32 row in bp256 or bp1024
    tb_bin: np.ndarray  # [T] int32 src layout divisor (16/32)
    tb_bout: np.ndarray  # [T] int32 dst layout divisor


@dataclass
class _WideRun:
    """A maximal run of wide / big-pair transitions, executed as ONE
    Pallas kernel over 256-pair chunks with a VMEM-resident
    [R1P, NB*1024] double-buffered state.

    Each chunk's destination lanes live inside one 1024-lane window;
    the kernel gathers predecessors with block-masked one-hot matmuls
    (only source windows present in the chunk, via wgmask bits), does
    the same packed-key segmented max-scan + extract as the narrow
    kernel, then read-modify-writes the destination window of the Vnext
    scratch (strict > keeps the earlier chunk on ties = the plan's
    preference order). Backpointers stream out as one int32
    [R1P, 1024] block per (transition, window)."""

    t0: int
    t1: int
    NB: int  # V windows (SWmax // 1024)
    tbl: np.ndarray  # [nchunks_pad, 2, CHUNK] int32 packed (as narrow)
    w1: np.ndarray  # [nchunks_pad, CHUNK] int8
    symd: np.ndarray  # [nchunks_pad, CHUNK] int16
    wbits: np.ndarray  # [nchunks_pad] int32: 1 window-first, 2 commit
    wwin: np.ndarray  # [nchunks_pad] int32 dst window index
    wpmask: np.ndarray  # [nchunks_pad] int32 dst-window PRESENCE bits:
    # bit b set iff the chunk's transition has >= 1 kept pair landing in
    # window b. At commit every V window is rewritten: present windows
    # take the (reach-masked) Vnext value, absent windows — both holes
    # inside the extent and windows past it — are reset to NEG. A
    # round-4 advisor repro showed the previous extent-only commit left
    # stale older-level values in windows >= ext (gathered as live
    # states by later transitions) and promoted raw uninitialized Vnext
    # scratch for hole windows.
    wbase: np.ndarray  # [nchunks_pad] int32 slot base within transition
    wgmask: np.ndarray  # [nchunks_pad] int32 src-window presence bits
    wrow: np.ndarray  # [nchunks_pad] int32 bp output row
    nrows: int  # real bp rows (sum of ext over transitions)
    # traceback per-transition metadata (same contract as _NarrowRun)
    tb_chunkbase: np.ndarray  # [T] int32
    tb_bits: np.ndarray  # [T] int32 (always 2: 1024-class bp)
    tb_bprow: np.ndarray  # [T] int32 first bp row of transition
    tb_bin: np.ndarray  # [T] int32 src layout divisor (flat k if wide)
    tb_bout: np.ndarray  # [T] int32 dst layout divisor
    # ---- DENSE chunking (round 5, single-chip megakernel) ----
    # The window-split chunks above leave wide chunks only ~34% full on
    # MHC (chunks break at every 1024-lane dst-window boundary); the
    # dense tables pack pairs contiguously — a chunk may span several
    # dst windows — and the dense kernel extracts/RMWs per spanned
    # window. The window-split arrays remain the tables of the
    # tp-sharded path (its pmax merge requires window-disjoint device
    # ownership) and of its traceback. Dense rowA packing:
    #   gidx(15) << 17 | win(5) << 12 | rel(10) << 2 | wsum(2)
    # (padded lanes are all-zero rowA and are identified by
    # score == PAD_SC, NOT by a dst sentinel).
    dtbl: np.ndarray  # [ndch_pad, 2, CHUNK] int32
    dw1: np.ndarray  # [ndch_pad, CHUNK] int8 (traceback)
    dsymd: np.ndarray  # [ndch_pad, CHUNK] int16 (traceback)
    dbits: np.ndarray  # [ndch_pad] int32: 2 commit, 4 real
    dfmask: np.ndarray  # [ndch_pad] int32 first-touch dst-window bits
    dcmask: np.ndarray  # [ndch_pad] int32 spanned dst-window bits
    dgmask: np.ndarray  # [ndch_pad] int32 src-window bits
    dpmask: np.ndarray  # [ndch_pad] int32 transition presence bits
    dtrans: np.ndarray  # [ndch_pad] int32 transition ordinal (bp row)
    dwbase: np.ndarray  # [ndch_pad] int32 chunk pair-ordinal base
    tb2_chunkbase: np.ndarray  # [T] int32 first dense chunk of transition


@dataclass
class PairPlan:
    R: int
    L: int
    segments: list  # _NarrowRun | _WideRun, in level order
    max_abs_value: int  # packed-key overflow guard evidence
    # content fingerprint (set by plan_pairs_cached): keys the on-disk
    # AOT executable cache; None disables it (ad-hoc test plans)
    fingerprint: str | None = None


def _layout(width: int) -> int:
    """Pair-layout divisor of a narrow level: FLAT (i * width + j).
    Flat layouts (PLAN_FORMAT 8) shrink the padded pair extent of a
    width-k level from the power-of-two 256/1024 to ceil(k^2/256)*256
    (256/512/768/1024): a width-20 level costs a 512-lane gather
    one-hot and a 2-block extract instead of 1024/4 — the one-hot
    builds are the narrow kernel's VPU ceiling (BENCH_NOTES roofline).
    """
    return width


def _ext(width: int) -> int:
    """Padded pair-lane extent of a flat-layout level (1..4 blocks)."""
    return max(1, -(-(width * width) // CHUNK))


def _pad_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# power-of-two rungs: padded chunks execute the full kernel, so tight
# fits beat fewer compile shapes (the persistent cache amortizes them)
_RUN_LADDER = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
               32768, 65536)
# wide-run V window-count ladder (VMEM state = 2 * NB * 128 KB);
# 31 is the hard cap (int32 gather-mask bits) => max level width ~177
_NB_LADDER = (2, 5, 18, 31)
# backpointer output rows (per narrow run) are padded to this ladder so
# the number of distinct Mosaic compile shapes stays small: on MHC,
# (T, n256, n1024) is otherwise unique per run -> 300+ compiles
_BP_LADDER = (1, 4, 16, 64, 256, 1024, 4096, 16384, 65536)

# The narrow kernel spills backpointers as int16 global pair ordinals
# (chunk-local slot + sbase), so a narrow transition must keep at most
# 32768 padded pair lanes; larger transitions route to the wide-gap
# path, whose backpointers are int32.
_NARROW_MAX_PAIRS = 1 << 15


def _scan_class(dstl: np.ndarray, nch: int) -> np.ndarray:
    """Per-256-lane-chunk scan-depth class from the longest run of
    consecutive equal dst values among the REAL lanes: 0 (run <= 4,
    2 scan stages), 1 (<= 16, 4 stages), 2 (any, 8 stages). On MHC
    p50/p90 of the max run are 4/16, so most chunks skip 4-6 of the 8
    segmented-max-scan stages (the scan was ~40% of the narrow kernel).
    Padded lanes need no scanning (every pad is INVALID, and max over
    equal values is depth-independent)."""
    n = len(dstl)
    cls = np.zeros(nch, np.int64)
    if n == 0:
        return cls
    starts = np.flatnonzero(np.r_[True, dstl[1:] != dstl[:-1]]).astype(
        np.int64
    )
    cb = np.arange(CHUNK, n, CHUNK, dtype=np.int64)
    bounds = np.union1d(starts, cb)
    lens = np.diff(np.r_[bounds, n])
    mx = np.zeros(nch, np.int64)
    np.maximum.at(mx, bounds // CHUNK, lens)
    cls[mx > 4] = 1
    cls[mx > 16] = 2
    return cls


def _ladder_fit(x: int, ladder) -> int:
    """Smallest ladder rung >= x; extends by doubling beyond the last
    rung so oversized instances plan (at the cost of a fresh compile)
    instead of crashing."""
    for c in ladder:
        if c >= x:
            return c
    c = ladder[-1]
    while c < x:
        c *= 2
    return c


def plan_pairs(
    level_ptr,
    adj_ptr,
    adj_v,
    adj_w,
    hom_ptr,
    hom_colors,
    het_ptr,
    het_colors,
    R: int,
) -> PairPlan:
    level_ptr = np.asarray(level_ptr, np.int64)
    adj_ptr = np.asarray(adj_ptr, np.int64)
    adj_v = np.asarray(adj_v, np.int64)
    adj_w = np.asarray(adj_w, np.int64)
    hom_ptr = np.asarray(hom_ptr, np.int64)
    het_ptr = np.asarray(het_ptr, np.int64)
    L = len(level_ptr) - 1
    L1 = L - 1
    widths = np.diff(level_ptr)
    if R + 1 > 32:
        raise ValueError("pallas backend requires R <= 31")

    # ---- per-transition raw pair tables ----
    # Producer selection: the native OpenMP planner (dg_pair_tables,
    # native/dgcore.cpp) computes every transition's sorted/scored pair
    # arrays in one call (~20x faster than the numpy loop, which pays
    # ~350 us of dispatch overhead per transition — 40+ s on MHC);
    # the numpy closure below remains the reference implementation and
    # the fallback, and tests assert array-exact agreement.
    _nat = None
    if _os.environ.get("DIPGENIE_NO_NATIVE_PLANNER") != "1":
        try:
            from .. import native as _native

            if _native.available():
                _nat = _native.pair_tables_all(
                    level_ptr, adj_ptr, adj_v, adj_w,
                    hom_ptr, hom_colors, het_ptr, het_colors, R,
                )
        except Exception:
            _nat = None

    def pair_tables_numpy(l):
        """Sorted pair arrays for transition l -> l+1 (host layouts)."""
        b0, b1, b2 = int(level_ptr[l]), int(level_ptr[l + 1]), int(level_ptr[l + 2])
        k, k2 = b1 - b0, b2 - b1
        e0, e1 = int(adj_ptr[b0]), int(adj_ptr[b1])
        dst = (adj_v[e0:e1] - b1).astype(np.int64)
        w = adj_w[e0:e1].astype(np.int64)
        src = np.repeat(
            np.arange(k, dtype=np.int64),
            np.diff(adj_ptr[b0 : b1 + 1]).astype(np.int64),
        )
        eo = np.arange(len(dst), dtype=np.int64)  # adjacency order

        # local colour universe + masks
        cs = np.concatenate(
            [
                hom_colors[hom_ptr[b0] : hom_ptr[b2]],
                het_colors[het_ptr[b0] : het_ptr[b2]],
            ]
        )
        uniq = np.unique(cs)
        Hl = _level_masks(b0, b1, hom_ptr, hom_colors, uniq)
        Tl = _level_masks(b0, b1, het_ptr, het_colors, uniq)
        Hr = _level_masks(b1, b2, hom_ptr, hom_colors, uniq)
        Tr = _level_masks(b1, b2, het_ptr, het_colors, uniq)

        E = len(dst)
        e1i = np.repeat(np.arange(E), E)
        e2i = np.tile(np.arange(E), E)
        ws = w[e1i] + w[e2i]
        keep = ws <= R
        e1i, e2i, ws = e1i[keep], e2i[keep], ws[keep]
        s1, s2 = src[e1i], src[e2i]
        d1, d2 = dst[e1i], dst[e2i]
        # preference sort: (dstpair, pred_i, pred_j, edge order)
        order = np.lexsort((eo[e2i], eo[e1i], s2, s1, d1 * k2 + d2))
        e1i, e2i, ws = e1i[order], e2i[order], ws[order]
        s1, s2, d1, d2 = s1[order], s2[order], d1[order], d2[order]

        HLu = Hl[s1] | Hl[s2]
        TLu = Tl[s1] | Tl[s2]
        HRu = Hr[d1] | Hr[d2]
        TRu = Tr[d1] | Tr[d2]
        symd = _popcount(TLu ^ TRu).sum(-1).astype(np.int64)
        score = _popcount(HLu & HRu).sum(-1).astype(np.int64) + symd
        w1 = w[e1i]
        return k, k2, s1, s2, d1, d2, ws, score, symd, w1

    def pair_tables_native(l):
        """Slice of the one-call native planner output for transition l."""
        off, s1a, s2a, d1a, d2a, syma, wsa, w1a, sca, _smax = _nat
        sl = slice(int(off[l]), int(off[l + 1]))
        k = int(level_ptr[l + 1] - level_ptr[l])
        k2 = int(level_ptr[l + 2] - level_ptr[l + 1])
        return (
            k, k2,
            s1a[sl].astype(np.int64), s2a[sl].astype(np.int64),
            d1a[sl].astype(np.int64), d2a[sl].astype(np.int64),
            wsa[sl].astype(np.int64), sca[sl].astype(np.int64),
            syma[sl].astype(np.int64), w1a[sl].astype(np.int64),
        )

    pair_tables = pair_tables_native if _nat is not None else pair_tables_numpy

    # kept pair count per transition (pairs with wsum <= R), computed
    # from the edge-weight histogram without materializing E^2 arrays
    def kept_pairs(l):
        if _nat is not None:
            return int(_nat[0][l + 1] - _nat[0][l])
        b0, b1 = int(level_ptr[l]), int(level_ptr[l + 1])
        w = np.minimum(adj_w[int(adj_ptr[b0]) : int(adj_ptr[b1])], R + 1)
        c = np.bincount(w, minlength=R + 2).astype(np.int64)
        conv = np.convolve(c, c)
        return int(conv[: R + 1].sum())

    narrow = np.zeros(L1, bool)
    for l in range(L1):
        narrow[l] = (
            max(widths[l], widths[l + 1]) <= NARROW_W
            # int16 bp ordinal limit: padded pair lanes must fit 2^15
            and _pad_up(kept_pairs(l), CHUNK) <= _NARROW_MAX_PAIRS
        )

    # packed-key overflow guard: the narrow kernel packs value*256+slot
    # into int32, so the running value upper bound (sum of per-level max
    # scores) must stay below 2^21
    bound = [abs(NEG)]

    def pair_tables_g(l):
        out = pair_tables(l)
        score = out[7]
        bound[0] += int(score.max(initial=0))
        return out

    segments = []
    l = 0
    while l < L1:
        if narrow[l]:
            j = l
            while j < L1 and narrow[j]:
                j += 1
            seg, _ = _plan_narrow_run(l, j, widths, pair_tables_g, R)
            segments.append(seg)
            l = j
        else:
            j = l
            while j < L1 and not narrow[j]:
                j += 1
            segments.append(_plan_wide_run(l, j, widths, pair_tables_g, R))
            l = j
    # 4_100_000 (< 2^22 - 2^15): keeps both the packed int32 scan key
    # (value*256 | slot < 2^30) AND the top balanced base-256 digit of
    # the extract channel (voff*256 | slot < ~127.5 * 2^24) in range
    if bound[0] > 4_100_000:
        raise ValueError(
            f"DP value bound {bound[0]} overflows the packed int32 key; "
            "use the chunked backend"
        )
    return PairPlan(R=R, L=L, segments=segments, max_abs_value=bound[0])


def _plan_narrow_run(t0, t1, widths, pair_tables, R):
    # pass 1: per-transition pair tables + chunk counts
    tabs = []
    nchs = []
    running_sc = 0
    for t in range(t0, t1):
        k, k2, s1, s2, d1, d2, ws, score, symd, w1 = pair_tables(t)
        Bin = _layout(int(widths[t]))
        Bout = _layout(int(widths[t + 1]))
        gidx = (s1 * Bin + s2).astype(np.int32)
        dstl = (d1 * Bout + d2).astype(np.int32)
        tabs.append((gidx, ws, score, dstl, w1, symd, Bin, Bout))
        nchs.append(max(1, (len(gidx) + CHUNK - 1) // CHUNK))
        running_sc += int(score.max(initial=0))

    nreal = int(sum(nchs))
    npad = _ladder_fit(nreal, _RUN_LADDER)
    # pass 2: preallocate flat blocks and fill in place (np.stack of
    # thousands of small arrays dominated planning time before)
    tbl = np.zeros((npad, _TBL_ROWS, CHUNK), np.int32)
    tbl[:, 1] = PAD_SC
    # padded to npad rows so traceback arg shapes are laddered too
    w1a = np.zeros((npad, CHUNK), np.int8)
    syma = np.zeros((npad, CHUNK), np.int16)
    sbits = np.zeros(npad, np.int32)
    sbase = np.zeros(npad, np.int32)
    r256 = np.zeros(npad, np.int32)
    r1024 = np.zeros(npad, np.int32)
    T = t1 - t0
    tb_chunkbase = np.zeros(T, np.int32)
    tb_bits = np.zeros(T, np.int32)
    tb_bprow = np.zeros(T, np.int32)
    tb_bin = np.zeros(T, np.int32)
    tb_bout = np.zeros(T, np.int32)

    crow = 0
    n256 = n1024 = 0
    for ti, (gidx, ws, score, dstl, w1, symd, Bin, Bout) in enumerate(tabs):
        n = len(gidx)
        nch = nchs[ti]
        rows = slice(crow, crow + nch)
        padlen = nch * CHUNK
        view = tbl[rows]  # view: slice indexing

        def fill(row, a, padv):
            buf = np.full(padlen, padv, np.int32)
            buf[:n] = a
            view[:, row] = buf.reshape(nch, CHUNK)

        packed = (
            (gidx.astype(np.int32) << 13)
            | ((dstl.astype(np.int32) + 1) << 2)
            | ws.astype(np.int32)
        )
        fill(0, packed, 0)  # pad lanes: gidx 0, dst -1, wsum 0
        fill(1, score, PAD_SC)
        wbuf = np.zeros(padlen, np.int8)
        wbuf[:n] = w1
        w1a[rows] = wbuf.reshape(nch, CHUNK)
        sbuf = np.zeros(padlen, np.int16)
        sbuf[:n] = symd
        syma[rows] = sbuf.reshape(nch, CHUNK)

        # bits: 0-1 src extent class - 1, 2 first, 3 last, 4 real,
        # 5-6 scan class, 7-8 dst extent class - 1
        sext = _ext(Bin)
        dext = _ext(Bout)
        out1024 = dext > 1  # bp block class (int16 256- vs 1024-wide)
        bits = (sext - 1) | ((dext - 1) << 7) | 16
        sbits[rows] = bits | (_scan_class(dstl, nch) << 5).astype(np.int32)
        sbits[crow] |= 4
        sbits[crow + nch - 1] |= 8
        sbase[rows] = np.arange(nch, dtype=np.int32) * CHUNK
        r256[rows] = n256
        r1024[rows] = n1024
        tb_chunkbase[ti] = crow
        tb_bits[ti] = 2 if out1024 else 0
        tb_bprow[ti] = n1024 if out1024 else n256
        tb_bin[ti] = Bin
        tb_bout[ti] = Bout
        if out1024:
            n1024 += 1
        else:
            n256 += 1
        crow += nch

    n256c = max(n256, 1)
    n1024c = max(n1024, 1)
    # padded grid steps: bits 0 (not first/last), bp rows pinned at the
    # last written row so output index maps never regress
    r256[nreal:] = max(n256 - 1, 0)
    r1024[nreal:] = max(n1024 - 1, 0)
    seg = _NarrowRun(
        t0=t0,
        t1=t1,
        tbl=tbl,
        w1=w1a,
        symd=syma,
        sbits=sbits,
        sbase=sbase,
        r256=np.minimum(r256, n256c - 1),
        r1024=np.minimum(r1024, n1024c - 1),
        n256=n256c,
        n1024=n1024c,
        tb_chunkbase=tb_chunkbase,
        tb_bits=tb_bits,
        tb_bprow=tb_bprow,
        tb_bin=tb_bin,
        tb_bout=tb_bout,
    )
    return seg, running_sc


def _plan_wide_run(t0, t1, widths, pair_tables, R):
    # pass 1: pair tables + window budget
    tabs = []
    need_nb = 1
    for t in range(t0, t1):
        k, k2, s1, s2, d1, d2, ws, score, symd, w1 = pair_tables(t)
        # src/dst layout: narrow pair layout at the run's boundaries,
        # flat k*k for wide levels
        Bin = _layout(int(k)) if k <= NARROW_W else int(k)
        Bout = _layout(int(k2)) if k2 <= NARROW_W else int(k2)
        gidx = (s1 * Bin + s2).astype(np.int32)
        dstl = (d1 * Bout + d2).astype(np.int32)
        need_nb = max(
            need_nb,
            (int(gidx.max(initial=0)) >> 10) + 1,
            (int(dstl.max(initial=0)) >> 10) + 1,
        )
        tabs.append((gidx, ws, score, dstl, w1, symd, Bin, Bout))
    NB = _ladder_fit(need_nb, _NB_LADDER)
    if NB > 31:
        raise ValueError(
            f"wide run needs {NB} 1024-lane V windows (> 31, the int32 "
            "gather-mask limit); use the chunked backend"
        )

    # pass 2: chunk each transition, splitting at 1024-lane dst-window
    # boundaries (dst-sorted pairs => windows ascend monotonically)
    chunks = []  # (trans_idx, lane_slice, win)
    per_tr = []  # (nch, ext, rowbase, pmask)
    rowbase = 0
    for ti, (gidx, ws, score, dstl, w1, symd, Bin, Bout) in enumerate(tabs):
        win = dstl >> 10
        # boundaries where the window changes
        cuts = np.flatnonzero(np.diff(win)) + 1
        bounds = np.concatenate([[0], cuts, [len(dstl)]])
        nch = 0
        local = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            for c0 in range(int(b0), int(b1), CHUNK):
                local.append((c0, min(c0 + CHUNK, int(b1)), int(win[c0])))
                nch += 1
        if not local:
            # a transition with ZERO kept pairs (every pair's wsum > R)
            # still needs one all-pad chunk so its commit fires and
            # resets V to NEG — otherwise the previous level's values
            # would leak through as phantom reachable states
            local = [(0, 0, 0)]
            nch = 1
        ext = (int(dstl.max(initial=0)) >> 10) + 1
        pmask = int(
            np.bitwise_or.reduce(np.left_shift(1, np.unique(win)), initial=0)
        ) if len(win) else 0
        per_tr.append((local, ext, rowbase, pmask))
        rowbase += ext
    nrows = rowbase

    nreal = sum(len(local) for local, _, _, _ in per_tr)
    npad = _ladder_fit(nreal, _RUN_LADDER)
    tbl = np.zeros((npad, _TBL_ROWS, CHUNK), np.int32)
    tbl[:, 1] = PAD_SC
    w1a = np.zeros((npad, CHUNK), np.int8)
    syma = np.zeros((npad, CHUNK), np.int16)
    wbits = np.zeros(npad, np.int32)
    wwin = np.zeros(npad, np.int32)
    wpmask = np.zeros(npad, np.int32)
    wbase = np.zeros(npad, np.int32)
    wgmask = np.zeros(npad, np.int32)
    wrow = np.zeros(npad, np.int32)
    T = t1 - t0
    tb_chunkbase = np.zeros(T, np.int32)
    tb_bits = np.full(T, 2, np.int32)  # 1024-class bp for traceback
    tb_bprow = np.zeros(T, np.int32)
    tb_bin = np.zeros(T, np.int32)
    tb_bout = np.zeros(T, np.int32)

    crow = 0
    for ti, (gidx, ws, score, dstl, w1, symd, Bin, Bout) in enumerate(tabs):
        local, ext, rb, pmask = per_tr[ti]
        tb_chunkbase[ti] = crow
        tb_bprow[ti] = rb
        tb_bin[ti] = Bin
        tb_bout[ti] = Bout
        seen_win = set()
        for ci, (c0, c1, win) in enumerate(local):
            n = c1 - c0
            row = crow + ci
            rel = (dstl[c0:c1] - win * 1024).astype(np.int32)
            tbl[row, 0, :n] = (
                (gidx[c0:c1].astype(np.int32) << 13)
                | ((rel + 1) << 2)
                | ws[c0:c1].astype(np.int32)
            )
            tbl[row, 1, :n] = score[c0:c1]
            w1a[row, :n] = w1[c0:c1]
            syma[row, :n] = symd[c0:c1]
            bits = 0
            if win not in seen_win:
                seen_win.add(win)
                bits |= 1  # window-first: init Vnext window + bp block
            if ci == len(local) - 1:
                bits |= 2  # commit Vnext -> Vnow
            bits |= int(_scan_class(rel, 1)[0]) << 5  # scan depth class
            wbits[row] = bits | 4  # bit 4: real (ladder pads skip)
            wwin[row] = win
            wpmask[row] = pmask
            wbase[row] = ci * CHUNK
            wgmask[row] = int(
                np.bitwise_or.reduce(
                    np.left_shift(1, np.unique(gidx[c0:c1] >> 10)),
                    initial=0,
                )
            )
            wrow[row] = rb + win
        crow += len(local)
    # padded grid steps: repeat the final row indices (no map regression)
    if nreal:
        wrow[nreal:] = wrow[nreal - 1]
        wwin[nreal:] = wwin[nreal - 1]
        wpmask[nreal:] = wpmask[nreal - 1]

    # ---- pass 3: DENSE chunking for the single-chip megakernel ----
    # pairs pack contiguously into 256-lane chunks that may straddle
    # dst windows (window-split chunks above are only ~34% full on MHC)
    ndch_per = [max(1, (len(tab[0]) + CHUNK - 1) // CHUNK) for tab in tabs]
    ndreal = int(sum(ndch_per))
    ndpad = _ladder_fit(ndreal, _RUN_LADDER)
    dtbl = np.zeros((ndpad, _TBL_ROWS, CHUNK), np.int32)
    dtbl[:, 1] = PAD_SC
    dw1 = np.zeros((ndpad, CHUNK), np.int8)
    dsymd = np.zeros((ndpad, CHUNK), np.int16)
    dbits = np.zeros(ndpad, np.int32)
    dfmask = np.zeros(ndpad, np.int32)
    dcmask = np.zeros(ndpad, np.int32)
    dgmask = np.zeros(ndpad, np.int32)
    dpmask = np.zeros(ndpad, np.int32)
    dtrans = np.zeros(ndpad, np.int32)
    dwbase = np.zeros(ndpad, np.int32)
    tb2_chunkbase = np.zeros(T, np.int32)
    drow = 0
    for ti, (gidx, ws, score, dstl, w1, symd, Bin, Bout) in enumerate(tabs):
        _, _, _, pmask = per_tr[ti]
        tb2_chunkbase[ti] = drow
        n = len(gidx)
        winv = dstl >> 10
        relv = dstl & 1023
        packed = (
            (gidx.astype(np.int32) << 17)
            | (winv.astype(np.int32) << 12)
            | (relv.astype(np.int32) << 2)
            | ws.astype(np.int32)
        )
        seen = 0
        nch = ndch_per[ti]
        dstg = (winv.astype(np.int64) << 10) | relv.astype(np.int64)
        dcls = _scan_class(dstg, nch)
        for ci in range(nch):
            c0, c1 = ci * CHUNK, min((ci + 1) * CHUNK, n)
            m = c1 - c0
            row = drow + ci
            if m > 0:
                dtbl[row, 0, :m] = packed[c0:c1]
                dtbl[row, 1, :m] = score[c0:c1]
                dw1[row, :m] = w1[c0:c1]
                dsymd[row, :m] = symd[c0:c1]
                cm = int(
                    np.bitwise_or.reduce(
                        np.left_shift(1, np.unique(winv[c0:c1])), initial=0
                    )
                )
                dgmask[row] = int(
                    np.bitwise_or.reduce(
                        np.left_shift(1, np.unique(gidx[c0:c1] >> 10)),
                        initial=0,
                    )
                )
            else:
                cm = 0
            dcmask[row] = cm
            dfmask[row] = cm & ~seen
            seen |= cm
            dbits[row] = (
                4 | (2 if ci == nch - 1 else 0) | (int(dcls[ci]) << 5)
            )
            dpmask[row] = pmask
            dtrans[row] = ti
            dwbase[row] = c0
        drow += nch
    if ndreal:
        dtrans[ndreal:] = dtrans[ndreal - 1]
        dpmask[ndreal:] = dpmask[ndreal - 1]

    return _WideRun(
        t0=t0,
        t1=t1,
        NB=NB,
        tbl=tbl,
        w1=w1a,
        symd=syma,
        wbits=wbits,
        wwin=wwin,
        wpmask=wpmask,
        wbase=wbase,
        wgmask=wgmask,
        wrow=wrow,
        nrows=max(nrows, 1),
        tb_chunkbase=tb_chunkbase,
        tb_bits=tb_bits,
        tb_bprow=tb_bprow,
        tb_bin=tb_bin,
        tb_bout=tb_bout,
        dtbl=dtbl,
        dw1=dw1,
        dsymd=dsymd,
        dbits=dbits,
        dfmask=dfmask,
        dcmask=dcmask,
        dgmask=dgmask,
        dpmask=dpmask,
        dtrans=dtrans,
        dwbase=dwbase,
        tb2_chunkbase=tb2_chunkbase,
    )


# --------------------------------------------------------------------
# narrow Pallas kernel
# --------------------------------------------------------------------

def _r1p(R1: int) -> int:
    """Padded r-row count of the kernel state/bp blocks. 24 rows (3
    sublane tiles) for the common R <= 23 cuts every row-proportional
    VPU op — digit builds, rolls, selects, scan stages, recombines —
    by 25% vs the round-4 fixed 32 while keeping the same kernel
    structure; R up to 31 falls back to 32 rows."""
    return 24 if R1 <= 24 else 32


def _scan_stages(jnp, pltpu, kv, lane, segb, shifts):
    """Segmented-max-scan stages over the packed key (shared by all
    kernels; the caller guards deeper stages with pl.when on the
    per-chunk scan class — see _scan_class)."""
    for sh in shifts:
        conn = (lane >= sh) & (segb == pltpu.roll(segb, sh, 1))
        m = jnp.broadcast_to(conn, (kv.shape[0], CHUNK))
        sv = pltpu.roll(kv, sh, 1)
        kv = jnp.where(m & (sv > kv), sv, kv)
    return kv


def _narrow_kernel(R1: int, T_static: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R1P = _r1p(R1)

    # timing ablation for perf work ONLY (results are WRONG with any
    # value set): DIPGENIE_ABLATE in {gather, scan, extract}
    _ablate = _os.environ.get("DIPGENIE_ABLATE", "")

    def kern(
        sbits_ref,
        sbase_ref,
        r256_ref,
        r1024_ref,
        tbl_ref,
        vinit_ref,
        bp256_ref,
        bp1024_ref,
        vout_ref,
        V,
        accv,
        accs,
        cand,
    ):
        t = pl.program_id(0)
        T = T_static
        bits = sbits_ref[t]
        scls_src = bits & 3  # src extent class - 1 (flat layouts)
        dcls = (bits >> 7) & 3  # dst extent class - 1
        first = (bits & 4) != 0
        last = (bits & 8) != 0
        real = (bits & 16) != 0  # ladder-padded chunks skip all compute

        @pl.when(t == 0)
        def _():
            V[...] = vinit_ref[...]

        @pl.when(real & (_ablate != "all"))
        def _():
            tbl = tbl_ref[0]  # [2, CHUNK] packed (see _TBL_ROWS)
            packed = tbl[0]
            sc = tbl[1]
            wsum = packed & 3
            dst = ((packed >> 2) & 2047) - 1  # -1 on padded lanes
            gidx = packed >> 13

            # ---- gather: cand[r, p] = V[r, gidx[p]] — ONE s8 MXU
            # matmul over three signed-biased 8-bit planes of (V - NEG)
            # (exact s8 x s8 -> s32; see _balanced_digits) ----
            def plane_gather(Vblk, G8):
                # balanced base-256 digits of (V - NEG) in [0, 2^22):
                # one-hot columns recombine exactly, no bias term
                st = _balanced_digits(jnp, Vblk - NEG, 3)
                g = jax.lax.dot_general(
                    st,
                    G8,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return (
                    g[:R1P]
                    + (g[R1P : 2 * R1P] << 8)
                    + (g[2 * R1P :] << 16)
                    + NEG
                )

            if _ablate != "gather":
                for E in range(4):

                    @pl.when(scls_src == E)
                    def _(E=E):
                        S = (E + 1) * CHUNK
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (S, CHUNK), 0
                        )
                        G8 = (rows == gidx[None, :]).astype(jnp.int8)
                        cand[...] = plane_gather(V[:, :S], G8)

            g0 = cand[...]
            ri = jax.lax.broadcasted_iota(jnp.int32, (R1P, CHUNK), 0)
            g1 = jnp.where(ri >= 1, pltpu.roll(g0, 1, 0), NEG)
            g2 = jnp.where(ri >= 2, pltpu.roll(g0, 2, 0), NEG)
            wb = wsum[None, :]
            c = jnp.where(wb == 0, g0, jnp.where(wb == 1, g1, g2))

            # packed key (value*256 | slotcode), slotcode = CHUNK-1-lane
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            slotc = (CHUNK - 1) - lane
            kv = jnp.where(
                c < REACH_T,
                jnp.int32(INVALID),
                (c + sc[None, :]) * CHUNK + slotc,
            )

            segb = dst[None, :]
            scls = (bits >> 5) & 3
            if _ablate != "scan":
                # classed scan depth: stages 1-2 always; 4-8 when the
                # chunk holds a dst run > 4; 16-128 only for runs > 16
                cand[...] = _scan_stages(jnp, pltpu, kv, lane, segb, (1, 2))

                @pl.when(scls >= 1)
                def _():
                    cand[...] = _scan_stages(
                        jnp, pltpu, cand[...], lane, segb, (4, 8)
                    )

                @pl.when(scls >= 2)
                def _():
                    cand[...] = _scan_stages(
                        jnp, pltpu, cand[...], lane, segb, (16, 32, 64, 128)
                    )

                kv = cand[...]

            vfin = jax.lax.shift_right_arithmetic(kv, 8)
            slot = (CHUNK - 1) - jnp.bitwise_and(kv, CHUNK - 1)
            OFF = jnp.int32(1 << 22)
            voff = vfin + OFF  # in [0, 2^23) for valid, 0 for INVALID
            # signed-biased s8 planes + slot plane + a ones row: extract
            # one-hot columns can be EMPTY (hole out lanes), so the
            # ones row counts column hits and scales the bias
            # correction (0 hits -> exr 0 -> invalid, as before)
            stacked = _balanced_digits(jnp, (voff << 8) | slot, 4)

            base = sbase_ref[t]
            # extract one-hot from dst alone: pairs are dst-sorted within
            # a chunk, so the winning lane per out lane is the LAST with
            # that dst — the lane whose successor differs (roll is
            # circular; lane CHUNK-1 is forced to be a boundary). Padded
            # lanes (dst -1) never match an out lane in [0, OUT).
            lastocc = (lane == CHUNK - 1) | (segb != pltpu.roll(segb, CHUNK - 1, 1))
            dstm = jnp.where(lastocc, segb, -2)  # [1, CHUNK]

            def extract_and_acc(OUT):
                if _ablate == "extract":
                    exv = jnp.full((R1P, OUT), jnp.int32(INVALID))
                    exs = jnp.zeros((R1P, OUT), jnp.int32)
                    av = accv[:, :OUT]
                    take = exv > av
                    nv = jnp.where(first, exv, jnp.where(take, exv, av))
                    ns = jnp.where(
                        first, exs, jnp.where(take, exs, accs[:, :OUT])
                    )
                    accv[:, :OUT] = nv
                    accs[:, :OUT] = ns
                    return nv, ns
                # transposed one-hot Et[o, i] = (o == dst[i] - b*CHUNK),
                # built per 256-out-lane block (Mosaic cannot reshape a
                # [4, 256] vector into [1024]); contraction runs over
                # the chunk-lane axis of both operands
                rowsO = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
                Et = jnp.concatenate(
                    [
                        (rowsO == (dstm - b * CHUNK)).astype(jnp.int8)
                        for b in range(OUT // CHUNK)
                    ],
                    axis=0,
                )  # [OUT, CHUNK]
                ex = jax.lax.dot_general(
                    stacked,
                    Et,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                exc = (
                    ex[:R1P]
                    + (ex[R1P : 2 * R1P] << 8)
                    + (ex[2 * R1P : 3 * R1P] << 16)
                    + (ex[3 * R1P :] << 24)
                )
                # empty one-hot column -> exc 0; INVALID winner -> voff 0:
                # both give exv = -OFF < REACH_T, never taken
                exv = (exc >> 8) - OFF
                exs = (exc & 255) + base
                av = accv[:, :OUT]
                take = exv > av
                nv = jnp.where(first, exv, jnp.where(take, exv, av))
                ns = jnp.where(
                    first, exs, jnp.where(take, exs, accs[:, :OUT])
                )
                accv[:, :OUT] = nv
                accs[:, :OUT] = ns
                return nv, ns

            @pl.when(dcls == 0)
            def _():
                nv, ns = extract_and_acc(CHUNK)

                @pl.when(last)
                def _():
                    V[:, :CHUNK] = jnp.where(
                        nv > REACH_T, nv, jnp.int32(NEG)
                    )
                    bp256_ref[0] = ns.astype(jnp.int16)

            for E in (2, 3, 4):

                @pl.when(dcls == E - 1)
                def _(E=E):
                    OUT = E * CHUNK
                    nv, ns = extract_and_acc(OUT)

                    @pl.when(last)
                    def _():
                        V[:, :OUT] = jnp.where(
                            nv > REACH_T, nv, jnp.int32(NEG)
                        )
                        bp1024_ref[0, :, :OUT] = ns.astype(jnp.int16)

        @pl.when(t == T - 1)
        def _():
            vout_ref[...] = V[...]

    return kern


def _narrow_call(seg: _NarrowRun, R1: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = len(seg.sbits)
    R1P = _r1p(R1)
    kern = _narrow_kernel(R1, len(seg.sbits))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, _TBL_ROWS, CHUNK), lambda t, *s: (t, 0, 0)),
            pl.BlockSpec((R1P, 1024), lambda t, *s: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, R1P, CHUNK), lambda t, sb, sa, a, b: (a[t], 0, 0)),
            pl.BlockSpec((1, R1P, 1024), lambda t, sb, sa, a, b: (b[t], 0, 0)),
            pl.BlockSpec((R1P, 1024), lambda t, *s: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R1P, 1024), jnp.int32),
            pltpu.VMEM((R1P, 1024), jnp.int32),
            pltpu.VMEM((R1P, 1024), jnp.int32),
            pltpu.VMEM((R1P, CHUNK), jnp.int32),
        ],
    )

    # bp rows padded to the ladder: extra rows are never indexed by the
    # (monotone, clipped) prefetch maps and never read by traceback
    n256p = _ladder_fit(seg.n256, _BP_LADDER)
    n1024p = _ladder_fit(seg.n1024, _BP_LADDER)

    def run(sbits, sbase, r256, r1024, tbl, vinit):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n256p, R1P, CHUNK), jnp.int16),
                jax.ShapeDtypeStruct((n1024p, R1P, 1024), jnp.int16),
                jax.ShapeDtypeStruct((R1P, 1024), jnp.int32),
            ),
            interpret=interpret,
        )(sbits, sbase, r256, r1024, tbl, vinit)

    return run


# --------------------------------------------------------------------
# wide Pallas kernel (window-split chunks) — BIG-NB fallback
# --------------------------------------------------------------------
# The dense-chunk kernel above needs ~3 x NB x 128 KB of VMEM plus a
# double-buffered [R1P, NB*1024] bp block and fails to compile at
# NB = 31 (width > ~141). Runs that big keep the round-4 window-split
# whole-run kernel (one dst window per chunk, bp per (transition,
# window) row), whose VMEM peak is 2 x NB x 128 KB + 128 KB. All MHC
# wide runs are NB <= 18 and use the dense kernel.

_DENSE_NB_MAX = 18

def _wide_split_kernel(NB: int, T_static: int, R1: int):
    """Wide-run kernel: V in a [R1P, NB*1024] double-buffered VMEM
    scratch; one 256-pair chunk per grid step. All window addressing is
    static-branch (pl.when on prefetched scalars) — no dynamic lane
    slicing, which Mosaic restricts."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R1P = _r1p(R1)
    _ablate = _os.environ.get("DIPGENIE_ABLATE", "")

    def kern(
        wbits_ref,
        wwin_ref,
        wpmask_ref,
        wbase_ref,
        wgmask_ref,
        wrow_ref,
        tbl_ref,
        vinit_ref,
        bp_ref,
        vout_ref,
        Vnow,
        Vnext,
        candf,
    ):
        t = pl.program_id(0)
        T = T_static
        bits = wbits_ref[t]
        win = wwin_ref[t]
        pmask = wpmask_ref[t]
        base = wbase_ref[t]
        gmask = wgmask_ref[t]
        win_first = (bits & 1) != 0
        commit = (bits & 2) != 0
        real = (bits & 4) != 0  # ladder-padded chunks skip all compute

        @pl.when(t == 0)
        def _():
            for b in range(NB):
                Vnow[:, b * 1024 : (b + 1) * 1024] = jnp.full(
                    (R1P, 1024), NEG, jnp.int32
                )
            Vnow[:, :1024] = vinit_ref[...]

        @pl.when(real & (_ablate != "all"))
        def _():
            tbl = tbl_ref[0]  # [2, CHUNK] packed (see _TBL_ROWS)
            packed = tbl[0]
            sc = tbl[1]
            wsum = packed & 3
            dst = ((packed >> 2) & 2047) - 1  # window-relative (-1 pad)
            gidx = packed >> 13

            # ---- gather: block-masked one-hot s8 matmuls over src
            # windows, accumulating three balanced base-256 digit
            # planes of (V - NEG); every lane's gidx hits exactly one
            # window, so the digit sums recombine exactly ----
            candf[...] = jnp.zeros((3 * R1P, CHUNK), jnp.int32)
            rows = jax.lax.broadcasted_iota(jnp.int32, (1024, CHUNK), 0)
            for b in range(NB):

                @pl.when(((gmask >> b) & 1) != 0)
                def _(b=b):
                    G8 = (rows == (gidx[None, :] - b * 1024)).astype(
                        jnp.int8
                    )
                    st = _balanced_digits(
                        jnp, Vnow[:, b * 1024 : (b + 1) * 1024] - NEG, 3
                    )
                    candf[...] += jax.lax.dot_general(
                        st,
                        G8,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )

            cf = candf[...]
            g0 = (
                cf[:R1P]
                + (cf[R1P : 2 * R1P] << 8)
                + (cf[2 * R1P :] << 16)
                + NEG
            )
            ri = jax.lax.broadcasted_iota(jnp.int32, (R1P, CHUNK), 0)
            g1 = jnp.where(ri >= 1, pltpu.roll(g0, 1, 0), NEG)
            g2 = jnp.where(ri >= 2, pltpu.roll(g0, 2, 0), NEG)
            wb = wsum[None, :]
            c = jnp.where(wb == 0, g0, jnp.where(wb == 1, g1, g2))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            slotc = (CHUNK - 1) - lane
            kv = jnp.where(
                c < REACH_T,
                jnp.int32(INVALID),
                (c + sc[None, :]) * CHUNK + slotc,
            )
            segb = dst[None, :]
            scls = (bits >> 5) & 3
            # stage through the candf scratch rows (gather already read)
            candf[0:R1P, :] = _scan_stages(jnp, pltpu, kv, lane, segb, (1, 2))

            @pl.when(scls >= 1)
            def _():
                candf[0:R1P, :] = _scan_stages(
                    jnp, pltpu, candf[0:R1P, :], lane, segb, (4, 8)
                )

            @pl.when(scls >= 2)
            def _():
                candf[0:R1P, :] = _scan_stages(
                    jnp, pltpu, candf[0:R1P, :], lane, segb, (16, 32, 64, 128)
                )

            kv = candf[0:R1P, :]

            vfin = jax.lax.shift_right_arithmetic(kv, 8)
            slot = (CHUNK - 1) - jnp.bitwise_and(kv, CHUNK - 1)
            OFF = jnp.int32(1 << 22)
            voff = vfin + OFF
            stacked = _balanced_digits(jnp, (voff << 8) | slot, 4)
            # in-kernel extract one-hot (see narrow kernel): last
            # occurrence per dst within the chunk, transposed blocks
            lastocc = (lane == CHUNK - 1) | (segb != pltpu.roll(segb, CHUNK - 1, 1))
            dstm = jnp.where(lastocc, segb, -2)
            rowsO = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            Et = jnp.concatenate(
                [
                    (rowsO == (dstm - b * CHUNK)).astype(jnp.int8)
                    for b in range(4)
                ],
                axis=0,
            )  # [1024, CHUNK]
            ex = jax.lax.dot_general(
                stacked,
                Et,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            exc = (
                ex[:R1P]
                + (ex[R1P : 2 * R1P] << 8)
                + (ex[2 * R1P : 3 * R1P] << 16)
                + (ex[3 * R1P :] << 24)
            )
            # empty one-hot column -> exc 0; INVALID winner -> voff 0:
            # both give exv = -OFF < REACH_T, never taken
            exv = (exc >> 8) - OFF
            exs = (exc & 255) + base

            # ---- RMW into the destination window of Vnext + bp block ----
            for b in range(NB):

                @pl.when(win == b)
                def _(b=b):
                    old = jnp.where(
                        win_first,
                        jnp.int32(NEG),
                        Vnext[:, b * 1024 : (b + 1) * 1024],
                    )
                    # int32 bp: a single wide transition can exceed 2^15
                    # pair ordinals (the narrow kernel's int16 limit)
                    bpold = jnp.where(win_first, jnp.int32(0), bp_ref[0])
                    take = exv > old
                    Vnext[:, b * 1024 : (b + 1) * 1024] = jnp.where(
                        take, exv, old
                    )
                    bp_ref[0] = jnp.where(take, exs, bpold)

            # ---- end of transition: promote Vnext to Vnow. EVERY
            # window is rewritten: absent windows (pmask bit clear) —
            # holes inside the extent and windows past it — become NEG,
            # so no stale older-level value and no uninitialized Vnext
            # scratch ever survives into the next transition's gather
            # (round-4 advisor finding; tests
            # test_pallas_wide_commit_{shrinking_extent_stale_window,
            # hole_window}). Absent windows READ undefined Vnext
            # scratch, but the value is discarded by the select. ----
            @pl.when(commit)
            def _():
                for b in range(NB):
                    present = ((pmask >> b) & 1) != 0
                    nv = Vnext[:, b * 1024 : (b + 1) * 1024]
                    Vnow[:, b * 1024 : (b + 1) * 1024] = jnp.where(
                        present & (nv > REACH_T), nv, jnp.int32(NEG)
                    )

        @pl.when(t == T - 1)
        def _():
            vout_ref[...] = Vnow[:, :1024]

    return kern


def _wide_split_call(seg: _WideRun, R1: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = len(seg.wbits)
    NB = seg.NB
    R1P = _r1p(R1)
    kern = _wide_split_kernel(NB, T, R1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, _TBL_ROWS, CHUNK), lambda t, *s: (t, 0, 0)),
            pl.BlockSpec((R1P, 1024), lambda t, *s: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, R1P, 1024), lambda t, b1, b2, b3, b4, b5, rw: (rw[t], 0, 0)
            ),
            pl.BlockSpec((R1P, 1024), lambda t, *s: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R1P, NB * 1024), jnp.int32),
            pltpu.VMEM((R1P, NB * 1024), jnp.int32),
            pltpu.VMEM((3 * R1P, CHUNK), jnp.int32),
        ],
    )
    nrowsp = _ladder_fit(seg.nrows, _BP_LADDER)

    def run(wbits, wwin, wpmask, wbase, wgmask, wrow, tbl, vinit):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nrowsp, R1P, 1024), jnp.int32),
                jax.ShapeDtypeStruct((R1P, 1024), jnp.int32),
            ),
            interpret=interpret,
        )(wbits, wwin, wpmask, wbase, wgmask, wrow, tbl, vinit)

    return run


# --------------------------------------------------------------------
# wide Pallas kernel (dense chunks, single chip)
# --------------------------------------------------------------------


def _wide_dense_kernel(NB: int, T_static: int, R1: int):
    """Wide-run kernel over DENSE 256-pair chunks: V in a
    [R1P, NB*1024] double-buffered VMEM scratch; a chunk may span
    several 1024-lane destination windows (dcmask bits), each extracted
    and read-modify-written separately. Backpointers leave as ONE
    [R1P, NB*1024] block per transition (pair ordinals are true global
    pair indices, base = chunk * CHUNK). All window addressing is
    static-branch (pl.when on prefetched scalars) — no dynamic lane
    slicing, which Mosaic restricts."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R1P = _r1p(R1)
    _ablate = _os.environ.get("DIPGENIE_ABLATE", "")

    def kern(
        dbits_ref,
        dfmask_ref,
        dcmask_ref,
        dgmask_ref,
        dpmask_ref,
        dtrans_ref,
        dwbase_ref,
        tbl_ref,
        vinit_ref,
        bp_ref,
        vout_ref,
        Vnow,
        Vnext,
        candf,
    ):
        t = pl.program_id(0)
        T = T_static
        bits = dbits_ref[t]
        fmask = dfmask_ref[t]
        cmask = dcmask_ref[t]
        gmask = dgmask_ref[t]
        pmask = dpmask_ref[t]
        base = dwbase_ref[t]
        commit = (bits & 2) != 0
        real = (bits & 4) != 0  # ladder-padded chunks skip all compute

        @pl.when(t == 0)
        def _():
            for b in range(NB):
                Vnow[:, b * 1024 : (b + 1) * 1024] = jnp.full(
                    (R1P, 1024), NEG, jnp.int32
                )
            Vnow[:, :1024] = vinit_ref[...]

        @pl.when(real & (_ablate != "all"))
        def _():
            tbl = tbl_ref[0]  # [2, CHUNK] dense-packed
            packed = tbl[0]
            sc = tbl[1]
            wsum = packed & 3
            rel = (packed >> 2) & 1023
            winl = (packed >> 12) & 31
            gidx = (packed >> 17) & 32767

            # ---- gather: block-masked one-hot s8 matmuls over src
            # windows (see the sharded step kernel for the bias math) --
            candf[...] = jnp.zeros((3 * R1P, CHUNK), jnp.int32)
            rows = jax.lax.broadcasted_iota(jnp.int32, (1024, CHUNK), 0)
            for b in range(NB):

                @pl.when(((gmask >> b) & 1) != 0)
                def _(b=b):
                    G8 = (rows == (gidx[None, :] - b * 1024)).astype(
                        jnp.int8
                    )
                    st = _balanced_digits(
                        jnp, Vnow[:, b * 1024 : (b + 1) * 1024] - NEG, 3
                    )
                    candf[...] += jax.lax.dot_general(
                        st,
                        G8,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )

            cf = candf[...]
            g0 = (
                cf[:R1P]
                + (cf[R1P : 2 * R1P] << 8)
                + (cf[2 * R1P :] << 16)
                + NEG
            )
            ri = jax.lax.broadcasted_iota(jnp.int32, (R1P, CHUNK), 0)
            g1 = jnp.where(ri >= 1, pltpu.roll(g0, 1, 0), NEG)
            g2 = jnp.where(ri >= 2, pltpu.roll(g0, 2, 0), NEG)
            wb = wsum[None, :]
            c = jnp.where(wb == 0, g0, jnp.where(wb == 1, g1, g2))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            slotc = (CHUNK - 1) - lane
            kv = jnp.where(
                c < REACH_T,
                jnp.int32(INVALID),
                (c + sc[None, :]) * CHUNK + slotc,
            )
            # scan segments on the GLOBAL dst lane (win<<10 | rel),
            # ascending within a chunk by the dst sort
            segb = ((winl << 10) | rel)[None, :]
            scls = (bits >> 5) & 3
            # stage through the candf scratch rows (gather already read)
            candf[0:R1P, :] = _scan_stages(jnp, pltpu, kv, lane, segb, (1, 2))

            @pl.when(scls >= 1)
            def _():
                candf[0:R1P, :] = _scan_stages(
                    jnp, pltpu, candf[0:R1P, :], lane, segb, (4, 8)
                )

            @pl.when(scls >= 2)
            def _():
                candf[0:R1P, :] = _scan_stages(
                    jnp, pltpu, candf[0:R1P, :], lane, segb, (16, 32, 64, 128)
                )

            kv = candf[0:R1P, :]

            vfin = jax.lax.shift_right_arithmetic(kv, 8)
            slot = (CHUNK - 1) - jnp.bitwise_and(kv, CHUNK - 1)
            OFF = jnp.int32(1 << 22)
            voff = vfin + OFF
            stacked = _balanced_digits(jnp, (voff << 8) | slot, 4)
            # last occurrence per dst; dense pads are all-zero rowA
            # (dstg 0 == a REAL lane of window 0), so they must be
            # excluded explicitly via the PAD_SC score marker — a pad
            # tail would otherwise add a second one-hot hit for out
            # lane (0, 0)
            lastocc = (lane == CHUNK - 1) | (
                segb != pltpu.roll(segb, CHUNK - 1, 1)
            )
            emask = lastocc & (sc[None, :] != PAD_SC)
            rowsO = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)

            # ---- per spanned dst window: extract + RMW ----
            for b in range(NB):

                @pl.when(((cmask >> b) & 1) != 0)
                def _(b=b):
                    dstm_b = jnp.where(
                        emask & (winl[None, :] == b), rel[None, :], -2
                    )
                    Et = jnp.concatenate(
                        [
                            (rowsO == (dstm_b - q * CHUNK)).astype(jnp.int8)
                            for q in range(4)
                        ],
                        axis=0,
                    )  # [1024, CHUNK]
                    ex = jax.lax.dot_general(
                        stacked,
                        Et,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    exc = (
                        ex[:R1P]
                        + (ex[R1P : 2 * R1P] << 8)
                        + (ex[2 * R1P : 3 * R1P] << 16)
                        + (ex[3 * R1P :] << 24)
                    )
                    # empty one-hot column -> exc 0; INVALID winner -> voff 0:
                    # both give exv = -OFF < REACH_T, never taken
                    exv = (exc >> 8) - OFF
                    exs = (exc & 255) + base
                    first = ((fmask >> b) & 1) != 0
                    sl = slice(b * 1024, (b + 1) * 1024)
                    old = jnp.where(first, jnp.int32(NEG), Vnext[:, sl])
                    bpold = jnp.where(first, jnp.int32(0), bp_ref[0, :, sl])
                    take = exv > old
                    Vnext[:, sl] = jnp.where(take, exv, old)
                    bp_ref[0, :, sl] = jnp.where(take, exs, bpold)

            # ---- end of transition: promote Vnext to Vnow (presence-
            # mask commit; see the window-split kernel history for the
            # stale-window postmortem) ----
            @pl.when(commit)
            def _():
                for b in range(NB):
                    present = ((pmask >> b) & 1) != 0
                    nv = Vnext[:, b * 1024 : (b + 1) * 1024]
                    Vnow[:, b * 1024 : (b + 1) * 1024] = jnp.where(
                        present & (nv > REACH_T), nv, jnp.int32(NEG)
                    )

        @pl.when(t == T - 1)
        def _():
            vout_ref[...] = Vnow[:, :1024]

    return kern


def _wide_call(seg: _WideRun, R1: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = len(seg.dbits)
    NB = seg.NB
    R1P = _r1p(R1)
    kern = _wide_dense_kernel(NB, T, R1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, _TBL_ROWS, CHUNK), lambda t, *s: (t, 0, 0)),
            pl.BlockSpec((R1P, 1024), lambda t, *s: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, R1P, NB * 1024),
                lambda t, a1, a2, a3, a4, a5, tr, a7: (tr[t], 0, 0),
            ),
            pl.BlockSpec((R1P, 1024), lambda t, *s: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R1P, NB * 1024), jnp.int32),
            pltpu.VMEM((R1P, NB * 1024), jnp.int32),
            pltpu.VMEM((3 * R1P, CHUNK), jnp.int32),
        ],
    )
    ntp = _ladder_fit(seg.t1 - seg.t0, _BP_LADDER)

    def run(dbits, dfmask, dcmask, dgmask, dpmask, dtrans, dwbase, tbl,
            vinit):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((ntp, R1P, NB * 1024), jnp.int32),
                jax.ShapeDtypeStruct((R1P, 1024), jnp.int32),
            ),
            interpret=interpret,
        )(dbits, dfmask, dcmask, dgmask, dpmask, dtrans, dwbase, tbl,
          vinit)

    return run


# --------------------------------------------------------------------
# tp-sharded wide path (multi-chip)
# --------------------------------------------------------------------
#
# SURVEY §7.6: "shard the K x K pair tile over devices with halo
# exchange of level-boundary states". The TPU-native decomposition:
#
#   * NARROW runs stay replicated. A narrow level is <= 1024 pair lanes
#     = ONE [R1P, 1024] VPU tile; splitting it across chips buys < 1
#     vector op of compute per level while paying an ICI round-trip per
#     level (~1-2 us latency x ~117k narrow MHC levels would dominate
#     the whole 0.3 s DP). Every device runs the identical narrow
#     megakernel — zero communication, bit-identical by construction.
#   * WIDE transitions (width > 32, up to ~31k pair lanes on MHC, the
#     only levels with enough parallelism to feed >1 chip) execute one
#     transition at a time under shard_map: 1024-lane destination
#     windows are owned round-robin by tp devices (win % n_tp), each
#     device runs a Pallas step kernel over ITS chunks against a
#     REPLICATED V (the "halo" is the whole level boundary: the gather
#     may read any source window), producing a NEG/-1-initialized
#     partial (Vnext, bp); the merge is a single lax.pmax over tp
#     (windows are never split across devices, so partials are disjoint
#     and no cross-device tie-break exists), followed by the
#     presence-mask commit. XLA lowers the pmax to an ICI all-reduce.
#
# ICI cost per wide transition: one all-reduce of [R1P, NB*1024] int32
# (128 KB x NB <= 31 -> <= 4 MB; typical MHC NB in {2, 5}). On a v5e
# ring at ~45 GB/s/link, a NB=5 transition's merge moves ~0.6 MB/device
# ~= 15 us + ~5 us latency; MHC has ~3.6k wide transitions in ~300 runs
# -> ~70 ms of exchange against ~250 ms of single-chip wide compute.
# Cross-over is therefore n_tp = 2-4 on MHC-sized graphs; the design
# targets whole-genome graphs where wide levels dominate. See
# DESIGN_MULTICHIP.md for the full analysis.

# per-transition chunk-count rungs (distinct compile shapes are
# (NB, C); wide transitions have 1..~128 chunks per device)
_STEP_LADDER = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def _wide_step_kernel(NB: int, C: int, R1: int):
    """One wide TRANSITION on one device's chunk subset: grid over C
    chunks, explicit NEG/-1 init of the [R1P, NB*1024] partial outputs
    (no undefined scratch can escape), RMW with strict > per chunk."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R1P = _r1p(R1)

    def kern(
        sbits_ref,
        swin_ref,
        sbase_ref,
        sgmask_ref,
        tbl_ref,
        vnow_ref,
        vpart_ref,
        bppart_ref,
        candf,
    ):
        t = pl.program_id(0)
        bits = sbits_ref[t]
        win = swin_ref[t]
        base = sbase_ref[t]
        gmask = sgmask_ref[t]
        real = (bits & 4) != 0

        @pl.when(t == 0)
        def _():
            for b in range(NB):
                sl = slice(b * 1024, (b + 1) * 1024)
                vpart_ref[:, sl] = jnp.full((R1P, 1024), NEG, jnp.int32)
                bppart_ref[:, sl] = jnp.full((R1P, 1024), -1, jnp.int32)

        @pl.when(real)
        def _():
            tbl = tbl_ref[0]  # [2, CHUNK] packed
            packed = tbl[0]
            sc = tbl[1]
            wsum = packed & 3
            dst = ((packed >> 2) & 2047) - 1
            gidx = packed >> 13

            candf[...] = jnp.zeros((3 * R1P, CHUNK), jnp.int32)
            rows = jax.lax.broadcasted_iota(jnp.int32, (1024, CHUNK), 0)
            for b in range(NB):

                @pl.when(((gmask >> b) & 1) != 0)
                def _(b=b):
                    G8 = (rows == (gidx[None, :] - b * 1024)).astype(
                        jnp.int8
                    )
                    st = _balanced_digits(
                        jnp, vnow_ref[:, b * 1024 : (b + 1) * 1024] - NEG, 3
                    )
                    candf[...] += jax.lax.dot_general(
                        st,
                        G8,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )

            cf = candf[...]
            g0 = (
                cf[:R1P]
                + (cf[R1P : 2 * R1P] << 8)
                + (cf[2 * R1P :] << 16)
                + NEG
            )
            ri = jax.lax.broadcasted_iota(jnp.int32, (R1P, CHUNK), 0)
            g1 = jnp.where(ri >= 1, pltpu.roll(g0, 1, 0), NEG)
            g2 = jnp.where(ri >= 2, pltpu.roll(g0, 2, 0), NEG)
            wb = wsum[None, :]
            c = jnp.where(wb == 0, g0, jnp.where(wb == 1, g1, g2))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            slotc = (CHUNK - 1) - lane
            kv = jnp.where(
                c < REACH_T,
                jnp.int32(INVALID),
                (c + sc[None, :]) * CHUNK + slotc,
            )
            segb = dst[None, :]
            scls = (bits >> 5) & 3
            # stage through the candf scratch rows (gather already read)
            candf[0:R1P, :] = _scan_stages(jnp, pltpu, kv, lane, segb, (1, 2))

            @pl.when(scls >= 1)
            def _():
                candf[0:R1P, :] = _scan_stages(
                    jnp, pltpu, candf[0:R1P, :], lane, segb, (4, 8)
                )

            @pl.when(scls >= 2)
            def _():
                candf[0:R1P, :] = _scan_stages(
                    jnp, pltpu, candf[0:R1P, :], lane, segb, (16, 32, 64, 128)
                )

            kv = candf[0:R1P, :]

            vfin = jax.lax.shift_right_arithmetic(kv, 8)
            slot = (CHUNK - 1) - jnp.bitwise_and(kv, CHUNK - 1)
            OFF = jnp.int32(1 << 22)
            voff = vfin + OFF
            stacked = _balanced_digits(jnp, (voff << 8) | slot, 4)
            lastocc = (lane == CHUNK - 1) | (
                segb != pltpu.roll(segb, CHUNK - 1, 1)
            )
            dstm = jnp.where(lastocc, segb, -2)
            rowsO = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            Et = jnp.concatenate(
                [
                    (rowsO == (dstm - b * CHUNK)).astype(jnp.int8)
                    for b in range(4)
                ],
                axis=0,
            )
            ex = jax.lax.dot_general(
                stacked,
                Et,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            exc = (
                ex[:R1P]
                + (ex[R1P : 2 * R1P] << 8)
                + (ex[2 * R1P : 3 * R1P] << 16)
                + (ex[3 * R1P :] << 24)
            )
            # empty one-hot column -> exc 0; INVALID winner -> voff 0:
            # both give exv = -OFF < REACH_T, never taken
            exv = (exc >> 8) - OFF
            exs = (exc & 255) + base

            # RMW into the owned destination window of the partials
            # (chunks of one window are consecutive in plan order on
            # their owner device, so strict > keeps the earlier chunk
            # on ties = the plan's preference order)
            for b in range(NB):

                @pl.when(win == b)
                def _(b=b):
                    sl = slice(b * 1024, (b + 1) * 1024)
                    old = vpart_ref[:, sl]
                    bpold = bppart_ref[:, sl]
                    take = exv > old
                    vpart_ref[:, sl] = jnp.where(take, exv, old)
                    bppart_ref[:, sl] = jnp.where(take, exs, bpold)

    return kern


def _wide_step_call(NB: int, C: int, R1: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R1P = _r1p(R1)
    kern = _wide_step_kernel(NB, C, R1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, _TBL_ROWS, CHUNK), lambda t, *s: (t, 0, 0)),
            pl.BlockSpec((R1P, NB * 1024), lambda t, *s: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((R1P, NB * 1024), lambda t, *s: (0, 0)),
            pl.BlockSpec((R1P, NB * 1024), lambda t, *s: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * R1P, CHUNK), jnp.int32),
        ],
    )

    def run(sbits, swin, sbase, sgmask, tbl, vnow):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((R1P, NB * 1024), jnp.int32),
                jax.ShapeDtypeStruct((R1P, NB * 1024), jnp.int32),
            ),
            interpret=interpret,
        )(sbits, swin, sbase, sgmask, tbl, vnow)

    return run


def _shard_wide_tables(seg: _WideRun, n_tp: int):
    """Partition a _WideRun's chunk rows into per-(transition, device)
    padded tables for the sharded per-transition step. Windows are
    owned round-robin (win % n_tp); a window's chunks all land on one
    device in plan order, preserving the earlier-chunk tie preference.
    Returns a list over transitions of
    (sbits, swin, sbase, sgmask, tbl, present) with leading axis n_tp.
    """
    T = seg.t1 - seg.t0
    NB = seg.NB
    nreal = int(np.count_nonzero(seg.wbits & 4))
    bounds = [int(x) for x in seg.tb_chunkbase] + [nreal]
    out = []
    for ti in range(T):
        rows = list(range(bounds[ti], bounds[ti + 1]))
        perdev: list[list[int]] = [[] for _ in range(n_tp)]
        for rrow in rows:
            perdev[int(seg.wwin[rrow]) % n_tp].append(rrow)
        C = _ladder_fit(max(1, max(len(p) for p in perdev)), _STEP_LADDER)
        sbits = np.zeros((n_tp, C), np.int32)
        swin = np.zeros((n_tp, C), np.int32)
        sbase = np.zeros((n_tp, C), np.int32)
        sgmask = np.zeros((n_tp, C), np.int32)
        tbl = np.zeros((n_tp, C, _TBL_ROWS, CHUNK), np.int32)
        tbl[:, :, 1] = PAD_SC
        for d, rws in enumerate(perdev):
            for ci, rrow in enumerate(rws):
                # bit 2: real; bits 5-6: scan depth class
                sbits[d, ci] = 4 | (int(seg.wbits[rrow]) & (3 << 5))
                swin[d, ci] = seg.wwin[rrow]
                sbase[d, ci] = seg.wbase[rrow]
                sgmask[d, ci] = seg.wgmask[rrow]
                tbl[d, ci] = seg.tbl[rrow]
        pmask = int(seg.wpmask[rows[0]]) if rows else 0
        present = (
            ((pmask >> np.arange(NB, dtype=np.int32)) & 1)
            .repeat(1024)
            .astype(np.int32)[None, :]
        )
        out.append((sbits, swin, sbase, sgmask, tbl, present))
    return out


# --------------------------------------------------------------------
# traceback scans
# --------------------------------------------------------------------


def _narrow_trace(bp256, bp1024, tbl, w1t, syt, xs, carry):
    """Reverse scan over a narrow run's transitions. xs rows (already
    reversed, tail-padded): chunkbase, bits, bprow, bin, bout, active;
    padded rows (active=0) leave the carry untouched. Shape-generic —
    jit retraces once per laddered shape combination."""
    import jax
    import jax.numpy as jnp

    # bp1024's last dim is 1024 for narrow spills and NB*1024 for dense
    # wide runs (one [R1P, NB*1024] block per transition) — the lane
    # split below handles both
    LDIV = bp1024.shape[2]

    def f(c, x):
        lane, r, sh = c
        chunkbase, bits, bprow, bin_, bout, active = x
        out1024 = (bits & 2) != 0
        dense = (bits & 4) != 0  # dense rowA packing (wide runs)
        s256 = jax.lax.dynamic_slice(
            bp256, (bprow, r, jnp.minimum(lane, CHUNK - 1)), (1, 1, 1)
        )[0, 0, 0].astype(jnp.int32)
        s1024 = jax.lax.dynamic_slice(
            bp1024, (bprow + lane // LDIV, r, lane % LDIV), (1, 1, 1)
        )[0, 0, 0].astype(jnp.int32)
        slot = jnp.where(out1024, s1024, s256)
        crow = chunkbase + slot // CHUNK
        lanec = slot % CHUNK
        packed = jax.lax.dynamic_slice(tbl, (crow, 0, lanec), (1, 1, 1))[
            0, 0, 0
        ]
        gidx = jnp.where(dense, (packed >> 17) & 32767, packed >> 13)
        wsum = packed & 3
        w1 = jax.lax.dynamic_slice(w1t, (crow, lanec), (1, 1))[0, 0].astype(
            jnp.int32
        )
        sy = jax.lax.dynamic_slice(syt, (crow, lanec), (1, 1))[0, 0].astype(
            jnp.int32
        )
        pi = gidx // bin_
        pj = gidx % bin_
        i2 = lane // bout
        j2 = lane % bout
        rec = jnp.stack([pi, pj, i2, j2, w1, wsum - w1, sy])
        on = active != 0
        c2 = (
            jnp.where(on, gidx, lane),
            jnp.where(on, r - wsum, r),
            jnp.where(on, sh + sy, sh),
        )
        return c2, rec

    return jax.lax.scan(f, carry, xs)


def _narrow_trace_acc(bp256, bp1024, tbl, w1t, syt, xs, carry, buf, pos):
    """_narrow_trace writing its records into a DONATED whole-plan
    buffer at row `pos`: the traceback makes one device->host transfer
    total (per-array fetches cost ~50 ms each on the tunnel runtime —
    ~30 s for the 673 MHC segments)."""
    import jax

    carry, recs = _narrow_trace(bp256, bp1024, tbl, w1t, syt, xs, carry)
    buf = jax.lax.dynamic_update_slice(buf, recs, (pos, 0))
    return carry, buf


# --------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------

_CACHE_SET = False
_SRC_HASH = None


def _aot_load(path):
    """Load a serialized compiled executable; None on any mismatch."""
    if not _os.path.exists(path):
        return None
    try:
        import pickle

        from jax.experimental import serialize_executable as se

        with open(path, "rb") as fh:
            payload, in_tree, out_tree = pickle.load(fh)
        return se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception:
        return None  # version/device drift: caller rebuilds


def _aot_store(path, comp):
    import pickle

    from jax.experimental import serialize_executable as se

    try:
        payload, in_tree, out_tree = se.serialize(comp)
        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{_os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh, protocol=4)
        _os.replace(tmp, path)
    except Exception:
        pass  # cache write failure is non-fatal


def _src_hash() -> str:
    """sha1 of this module's source: auto-invalidates the AOT
    executable cache on any kernel/orchestration change."""
    global _SRC_HASH
    if _SRC_HASH is None:
        import hashlib

        try:
            with open(__file__, "rb") as fh:
                _SRC_HASH = hashlib.sha1(fh.read()).hexdigest()
        except Exception:
            _SRC_HASH = "unknown"
    return _SRC_HASH


def _enable_compile_cache():
    """Persistent XLA compilation cache: the MHC plan compiles ~40
    laddered kernel shapes; caching makes every later process start
    warm. Opt out with DIPGENIE_JAX_CACHE=0."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    import os as _os

    d = _os.environ.get("DIPGENIE_JAX_CACHE", "/tmp/dipgenie_jax_cache")
    if d == "0":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def plan_pairs_cached(arrs, R: int, cache_dir: str | None = None):
    """plan_pairs with a content-keyed on-disk pickle cache.

    The key hashes the FULL CSR bytes + PLAN_FORMAT + R, so a changed
    workload or plan layout can never reuse a stale plan; the pickle
    lives in a user-owned directory (default ~/.cache/dipgenie_tpu,
    override DIPGENIE_CACHE_DIR; pass cache_dir="" to disable). Planning
    MHC costs ~9 s cold (native planner) — the cache makes every later
    process start warm, like the persistent XLA compile cache."""
    import hashlib
    import pickle

    if cache_dir is None:
        cache_dir = _os.environ.get(
            "DIPGENIE_CACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "dipgenie_tpu"
            ),
        )
    if not cache_dir:
        return plan_pairs(*arrs, R)
    h = hashlib.sha1()
    h.update(f"fmt{PLAN_FORMAT}-R{R}".encode())
    for a in arrs:
        a = np.ascontiguousarray(a)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    path = _os.path.join(cache_dir, f"pair_plan_{h.hexdigest()[:16]}.pkl")
    if _os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                plan = pickle.load(fh)
            if isinstance(plan, PairPlan) and plan.R == R:
                plan.fingerprint = h.hexdigest()[:16]
                return plan
        except Exception:
            pass  # corrupt cache: replan
    plan = plan_pairs(*arrs, R)
    plan.fingerprint = h.hexdigest()[:16]
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".tmp{_os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump(plan, fh, protocol=4)
        _os.replace(tmp, path)
    except Exception:
        pass  # cache write failure is non-fatal
    return plan


class PairDiploidDP:
    """Pallas narrow runs + Pallas wide runs; single value fetch at the
    end of the forward pass.

    Same output contract as the other device tiers:
    run() -> (sink_value, sink_s_het, transitions) with transitions a
    list of (level, pi, pj, i2, j2, wu, wv), level ascending 1..L-1.

    mesh: an optional jax.sharding.Mesh with a "tp" axis. When given,
    wide runs execute per-transition with destination windows sharded
    over tp (pmax merge over ICI) and narrow runs replicated — see the
    "tp-sharded wide path" section above. Bit-identical to the
    single-device path by construction (windows are never split, so no
    cross-device tie exists).
    """

    def __init__(self, plan: PairPlan, interpret: bool = False, mesh=None):
        self.plan = plan
        self.R = plan.R
        self.R1P = _r1p(plan.R + 1)
        self.interpret = interpret
        self.mesh = mesh
        self.n_tp = int(mesh.shape["tp"]) if mesh is not None else 0
        self._shipped = None
        self._jits = {}
        _enable_compile_cache()

    # ---------------- staging ----------------
    def _put_rep(self, a):
        """device_put; replicated over the mesh in sharded mode."""
        import jax

        if self.mesh is None:
            return jax.device_put(a)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(a, NamedSharding(self.mesh, P()))

    def _put_tp(self, a):
        """device_put with the leading axis sharded over tp."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(*(("tp",) + (None,) * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(self.mesh, spec))

    def _ship(self):
        if self._shipped is not None:
            return self._shipped
        put = self._put_rep
        shipped = []
        for seg in self.plan.segments:
            if isinstance(seg, _NarrowRun):
                shipped.append(
                    (
                        "n",
                        seg,
                        tuple(
                            put(a)
                            for a in (
                                seg.sbits,
                                seg.sbase,
                                seg.r256,
                                seg.r1024,
                                seg.tbl,
                            )
                        ),
                    )
                )
            elif self.mesh is not None:
                dev = []
                for tab in _shard_wide_tables(seg, self.n_tp):
                    sbits, swin, sbase, sgmask, tbl, present = tab
                    dev.append(
                        (
                            self._put_tp(sbits),
                            self._put_tp(swin),
                            self._put_tp(sbase),
                            self._put_tp(sgmask),
                            self._put_tp(tbl),
                            put(present),
                        )
                    )
                shipped.append(("ws", seg, dev))
            elif seg.NB > _DENSE_NB_MAX:
                shipped.append(
                    (
                        "w2",  # big-NB window-split fallback kernel
                        seg,
                        tuple(
                            put(a)
                            for a in (
                                seg.wbits,
                                seg.wwin,
                                seg.wpmask,
                                seg.wbase,
                                seg.wgmask,
                                seg.wrow,
                                seg.tbl,
                            )
                        ),
                    )
                )
            else:
                shipped.append(
                    (
                        "w",
                        seg,
                        tuple(
                            put(a)
                            for a in (
                                seg.dbits,
                                seg.dfmask,
                                seg.dcmask,
                                seg.dgmask,
                                seg.dpmask,
                                seg.dtrans,
                                seg.dwbase,
                                seg.dtbl,
                            )
                        ),
                    )
                )
        self._shipped = shipped
        return shipped

    def _wrap_mesh(self, call, n_in, n_out):
        """In sharded mode, run a single-device pallas call replicated
        on every mesh device via shard_map (plain jit cannot compile a
        pallas_call over a multi-device mesh)."""
        if self.mesh is None:
            return call
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        return shard_map(
            call,
            mesh=self.mesh,
            in_specs=(P(),) * n_in,
            out_specs=(P(),) * n_out if n_out > 1 else P(),
            check_vma=False,
        )

    def _narrow_raw(self, seg):
        key = (
            "nraw",
            len(seg.sbits),
            _ladder_fit(seg.n256, _BP_LADDER),
            _ladder_fit(seg.n1024, _BP_LADDER),
        )
        if key not in self._jits:
            self._jits[key] = _narrow_call(seg, self.R + 1, self.interpret)
        return self._jits[key]

    def _narrow_jit(self, seg):
        import jax

        key = (
            "n",
            len(seg.sbits),
            _ladder_fit(seg.n256, _BP_LADDER),
            _ladder_fit(seg.n1024, _BP_LADDER),
        )
        if key not in self._jits:
            call = self._narrow_raw(seg)
            self._jits[key] = jax.jit(self._wrap_mesh(call, 6, 3))
        return self._jits[key]

    def _sharded_jit(self, NB, C):
        import jax
        import jax.numpy as jnp

        key = ("ws", NB, C)
        if key not in self._jits:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            call = _wide_step_call(NB, C, self.R + 1, self.interpret)

            def local(sbits, swin, sbase, sgmask, tbl, present, V):
                vp, bpp = call(
                    sbits[0], swin[0], sbase[0], sgmask[0], tbl[0], V
                )
                # windows are device-disjoint and partials NEG/-1
                # initialized, so a max all-reduce reassembles exactly
                vm = jax.lax.pmax(vp, "tp")
                bpm = jax.lax.pmax(bpp, "tp")
                vm = jnp.where(
                    (present > 0) & (vm > REACH_T), vm, jnp.int32(NEG)
                )
                return vm, bpm

            fn = shard_map(
                local,
                mesh=self.mesh,
                in_specs=(
                    P("tp"), P("tp"), P("tp"), P("tp"), P("tp"), P(), P(),
                ),
                out_specs=(P(), P()),
                check_vma=False,
            )
            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def _run_wide_sharded(self, seg, dev, V1024, keep_bp: bool):
        """Execute one wide run per-transition over the tp mesh."""
        import jax.numpy as jnp

        NB = seg.NB
        if NB > 1:
            Vw = jnp.concatenate(
                [
                    V1024,
                    jnp.full((self.R1P, (NB - 1) * 1024), NEG, jnp.int32),
                ],
                axis=1,
            )
        else:
            Vw = V1024
        bps = []
        for sbits, swin, sbase, sgmask, tbl, present in dev:
            fn = self._sharded_jit(NB, int(sbits.shape[1]))
            Vw, bpm = fn(sbits, swin, sbase, sgmask, tbl, present, Vw)
            bps.append(bpm if keep_bp else None)
        return Vw[:, :1024], bps

    def _wide_raw(self, seg):
        key = (
            "wraw",
            len(seg.dbits),
            seg.NB,
            _ladder_fit(seg.t1 - seg.t0, _BP_LADDER),
        )
        if key not in self._jits:
            self._jits[key] = _wide_call(seg, self.R + 1, self.interpret)
        return self._jits[key]

    def _wide_jit(self, seg):
        import jax

        key = (
            "w",
            len(seg.dbits),
            seg.NB,
            _ladder_fit(seg.t1 - seg.t0, _BP_LADDER),
        )
        if key not in self._jits:
            self._jits[key] = jax.jit(self._wide_raw(seg))
        return self._jits[key]

    def _wide_split_raw(self, seg):
        key = (
            "w2raw",
            len(seg.wbits),
            seg.NB,
            _ladder_fit(seg.nrows, _BP_LADDER),
        )
        if key not in self._jits:
            self._jits[key] = _wide_split_call(
                seg, self.R + 1, self.interpret
            )
        return self._jits[key]

    def _wide_split_jit(self, seg):
        import jax

        key = (
            "w2",
            len(seg.wbits),
            seg.NB,
            _ladder_fit(seg.nrows, _BP_LADDER),
        )
        if key not in self._jits:
            self._jits[key] = jax.jit(self._wide_split_raw(seg))
        return self._jits[key]

    # ---------------- fused group dispatch ----------------
    # One host dispatch per ~GROUP segments instead of one per segment:
    # the per-pass host cost falls from ~673 sequential launches (which
    # dominate the wall on slow/contended hosts — the device idles
    # between launches) to ~42, and XLA overlaps the per-kernel setup
    # inside each group program. The group program RETURNS each
    # segment's backpointer blocks (the pallas calls write them either
    # way — XLA cannot dead-code custom-call outputs), so ONE compiled
    # program per group serves the measured forward, the traceback's
    # rematerialization, and the e2e path; callers that don't need bps
    # just drop the handles. The persistent compile cache makes the
    # group programs' first build a once-per-plan cost.

    def _fused_groups(self):
        group = int(_os.environ.get("DIPGENIE_FUSE_GROUP", "16"))
        shipped = self._ship()
        groups, cur = [], []
        for i, (kind, _seg, _dev) in enumerate(shipped):
            if kind == "ws":  # sharded: per-transition pmax dispatch
                if cur:
                    groups.append(("f", cur))
                    cur = []
                groups.append(("ws", [i]))
            else:
                cur.append(i)
                if len(cur) >= group:
                    groups.append(("f", cur))
                    cur = []
        if cur:
            groups.append(("f", cur))
        return groups

    def _group_jit(self, idxs):
        import jax

        key = ("grp", tuple(idxs))
        if key in self._jits:
            return self._jits[key]
        shipped = self._ship()
        metas = [(shipped[i][0], shipped[i][1]) for i in idxs]

        def fn(args_list, V):
            bps = []
            for (kind, seg), dev in zip(metas, args_list):
                if kind == "n":
                    bp256, bp1024, V = self._narrow_raw(seg)(*dev, V)
                    bps.append((bp256, bp1024))
                elif kind == "w2":
                    bp, V = self._wide_split_raw(seg)(*dev, V)
                    bps.append((bp,))
                else:
                    bp, V = self._wide_raw(seg)(*dev, V)
                    bps.append((bp,))
            return bps, V

        self._jits[key] = jax.jit(fn)
        return self._jits[key]

    # ---------------- AOT executable cache ----------------
    # jax retraces and re-lowers every pallas kernel instance per
    # process (~0.2 s each, ~670 instances on MHC) and the persistent
    # XLA cache only skips the COMPILE step — so a fresh process still
    # pays ~3-4 min of staging before the first DP pass. The group
    # programs are plan-specific anyway, so we cache the COMPILED
    # EXECUTABLE bytes (jax.experimental.serialize_executable) keyed by
    # (jax version, device kind, PLAN_FORMAT, this file's source hash,
    # plan fingerprint, group): a warm fresh process deserializes ~40
    # programs in ~1 s total and runs with zero tracing. Any code or
    # plan change rolls the key; stale entries are just dead files.

    def _exec_dir(self):
        d = _os.environ.get(
            "DIPGENIE_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "dipgenie_tpu"),
        )
        return _os.path.join(d, "exec") if d else None

    def _group_call(self, idxs):
        """Callable for one group: an AOT-deserialized executable when
        the plan is fingerprinted (disk-cached), else the jit path."""
        key = ("gx", idxs)
        if key in self._jits:
            return self._jits[key]
        fp = getattr(self.plan, "fingerprint", None)
        cdir = self._exec_dir()
        if (
            fp is None
            or cdir is None
            or self.mesh is not None
            or self.interpret
            or _os.environ.get("DIPGENIE_AOT_CACHE", "1") == "0"
        ):
            fn = self._group_jit(idxs)
            self._jits[key] = fn
            return fn
        import hashlib
        import pickle

        import jax
        from jax.experimental import serialize_executable as se

        dev = jax.devices()[0]
        meta = "|".join(
            str(x)
            for x in (
                jax.__version__, dev.platform,
                getattr(dev, "device_kind", ""), PLAN_FORMAT,
                _src_hash(), fp, self.R,
                int(_os.environ.get("DIPGENIE_FUSE_GROUP", "16")), idxs,
            )
        )
        digest = hashlib.sha1(meta.encode()).hexdigest()[:24]
        path = _os.path.join(cdir, f"g_{digest}.pkl")
        comp = _aot_load(path)
        if comp is not None:
            self._jits[key] = comp
            return comp
        fn = self._group_jit(idxs)
        shipped = self._ship()
        args = [shipped[i][2] for i in idxs]
        try:
            comp = fn.lower(args, self._initial()).compile()
            _aot_store(path, comp)
            self._jits[key] = comp
            return comp
        except Exception:
            self._jits[key] = fn  # AOT unsupported: plain jit
            return fn

    def _trace_call(self, args):
        """Shape-keyed AOT wrapper around the shared accumulate-trace
        program (per-process tracing of the scan programs costs
        seconds; their executables are plan-independent). The record
        buffer arg is DONATED — each call appends in place."""
        import jax

        shapes = tuple(
            (tuple(a.shape), str(a.dtype))
            for a in args[:6] + (args[7],)
        )
        key = ("tx", shapes)
        if key in self._jits:
            return self._jits[key]
        if "trace_acc" not in self._jits:
            self._jits["trace_acc"] = jax.jit(
                _narrow_trace_acc, donate_argnums=(7,)
            )
        jfn = self._jits["trace_acc"]
        cdir = self._exec_dir()
        if (
            cdir is None
            or self.mesh is not None
            or self.interpret
            or _os.environ.get("DIPGENIE_AOT_CACHE", "1") == "0"
        ):
            self._jits[key] = jfn
            return jfn
        import hashlib

        dev = jax.devices()[0]
        meta = "|".join(
            str(x)
            for x in (
                jax.__version__, dev.platform,
                getattr(dev, "device_kind", ""), _src_hash(), shapes,
            )
        )
        digest = hashlib.sha1(meta.encode()).hexdigest()[:24]
        path = _os.path.join(cdir, f"t_{digest}.pkl")
        comp = _aot_load(path)
        if comp is None:
            try:
                comp = jfn.lower(*args).compile()
                _aot_store(path, comp)
            except Exception:
                comp = jfn
        self._jits[key] = comp
        return comp

    def _forward_fused(self):
        """keep_bp-free forward with grouped dispatch; falls back to the
        per-segment path via the caller on any failure."""
        shipped = self._ship()
        V = self._initial()
        for gkind, idxs in self._fused_groups():
            if gkind == "ws":
                _, seg, dev = shipped[idxs[0]]
                V, _ = self._run_wide_sharded(seg, dev, V, False)
            else:
                _, V = self._group_call(tuple(idxs))(
                    [shipped[i][2] for i in idxs], V
                )
        return V

    def _initial(self):
        V0 = np.full((self.R1P, 1024), NEG, np.int32)
        V0[:, 0] = 0
        return self._put_rep(V0)

    # ---------------- forward ----------------
    def _forward(self, keep_bp: bool, keep_v_in: bool = False):
        """One forward pass. keep_bp retains every segment's backpointer
        arrays (toy scale only: ~14 GB on MHC); keep_v_in instead
        retains each segment's 128 KB input state so the backward pass
        can rematerialize one segment's bp at a time."""
        shipped = self._ship()
        V = self._initial()
        bps = []
        v_ins = []
        for kind, seg, dev in shipped:
            if keep_v_in:
                v_ins.append(V)
            if kind == "n":
                fn = self._narrow_jit(seg)
                bp256, bp1024, V = fn(*dev, V)
                bps.append((bp256, bp1024) if keep_bp else None)
            elif kind == "ws":
                V, bplist = self._run_wide_sharded(seg, dev, V, keep_bp)
                bps.append(bplist if keep_bp else None)
            else:
                fn = (
                    self._wide_split_jit(seg)
                    if kind == "w2"
                    else self._wide_jit(seg)
                )
                bp, V = fn(*dev, V)
                bps.append(bp if keep_bp else None)
        return (V, bps, v_ins) if keep_v_in else (V, bps)

    def measure_passes(self, passes: int = 5):
        """Honest per-pass wall seconds, each pass TERMINATED BY A
        DEVICE->HOST FETCH of the sink value.

        block_until_ready is NOT an execution barrier on some
        remote-attached runtimes (it returns once dispatch completes,
        while the device still runs) — only a data fetch proves the
        pass executed. Block-based timings here historically overstated
        throughput by >10x. One untimed warm pass compiles all shapes;
        returns ([wall_0..wall_{n-1}], sink_value)."""
        import time as _time

        fuse = _os.environ.get("DIPGENIE_FUSE", "1") != "0"
        if fuse:
            try:  # build/compile the group programs outside the timing
                self._forward_fused()
            except Exception as e:  # pragma: no cover - backend-specific
                print(
                    "[diploid_dp] fused dispatch unavailable "
                    f"({type(e).__name__}: {e}); per-segment fallback"
                )
                fuse = False

        def one():
            t0 = _time.time()
            if fuse:
                V = self._forward_fused()
            else:
                V, _ = self._forward(keep_bp=False)
            v = int(np.asarray(V)[self.R, 0])
            return _time.time() - t0, v

        one()  # warm: compiles + first-fetch effects
        walls = []
        v = None
        for _ in range(max(passes, 1)):
            w, v = one()
            walls.append(w)
        return walls, v

    def measure_forward(self, passes: int = 2, fetch_value: bool = False):
        """Best honest pass wall (see measure_passes)."""
        walls, v = self.measure_passes(passes)
        best = min(walls)
        if fetch_value:
            return best, v
        return best

    # ---------------- traceback staging ----------------
    def _ship_tb_all(self):
        """Ship EVERY segment's traceback tables in one batched
        device_put (per-segment puts cost an RPC each on the tunnel
        runtime — ~10 s for the 673 MHC segments)."""
        import jax

        if not hasattr(self, "_tb"):
            self._tb = {}
        shipped = self._ship()
        host = {}
        for idx, (kind, seg, _dev) in enumerate(shipped):
            if idx in self._tb or kind == "ws":
                continue
            host[idx] = self._tb_host(kind, seg)
        if host:
            if self.mesh is None:
                dev = jax.device_put(host)
            else:
                dev = {k: tuple(self._put_rep(a) for a in v)
                       for k, v in host.items()}
            self._tb.update(dev)

    def _tb_host(self, kind, seg):
        Treal = seg.t1 - seg.t0
        # both segment kinds share the 6-column trace row layout:
        # chunkbase, bits, bprow, bin, bout, active
        if kind == "w":
            # dense wide tables: bp row = transition ordinal, bits
            # carry the dense-packing flag (4), chunk base in dense
            # chunk space
            chunkbase = seg.tb2_chunkbase
            bits = np.full(Treal, 2 | 4, np.int32)
            bprow = np.arange(Treal, dtype=np.int32)
            w1t, syt = seg.dw1, seg.dsymd
        else:  # "n" and the "w2" big-NB window-split fallback
            chunkbase = seg.tb_chunkbase
            bits = seg.tb_bits
            bprow = seg.tb_bprow
            w1t, syt = seg.w1, seg.symd
        xs = np.stack(
            [
                chunkbase,
                bits,
                bprow,
                seg.tb_bin,
                seg.tb_bout,
                np.ones(Treal, np.int32),
            ],
            axis=1,
        )[::-1]
        Tp = _ladder_fit(Treal, _RUN_LADDER)
        pad = np.zeros((Tp - Treal, 6), np.int32)
        pad[:, 3:5] = 1  # bin/bout 1: no div-by-zero on padded rows
        xs = np.concatenate([xs, pad]).astype(np.int32)
        return (xs, w1t, syt)

    def _ship_tb(self, idx, kind, seg):
        """Device-resident traceback tables for one segment (shipped
        in bulk by _ship_tb_all; this is the lazy fallback)."""
        import jax

        if not hasattr(self, "_tb"):
            self._tb = {}
        if idx not in self._tb:
            host = self._tb_host(kind, seg)
            self._tb[idx] = tuple(self._put_rep(a) for a in host)
        return self._tb[idx]

    def _bp256_dummy(self):
        """1-row zero bp256 for wide-run traces (they are 1024-class)."""
        import jax

        if not hasattr(self, "_bpd"):
            self._bpd = self._put_rep(
                np.zeros((1, self.R1P, CHUNK), np.int16)
            )
        return self._bpd

    # ---------------- fused traceback ----------------
    def _run_fused(self, verbose: bool = False):
        """run() with grouped dispatch on both phases (single-device
        path). Identical results to the per-segment orchestration —
        the same kernels run in the same order; only the host dispatch
        granularity changes."""
        import jax
        import jax.numpy as jnp

        shipped = self._ship()
        # one grouping drives BOTH phases: each traceback group
        # rematerializes its bps by re-dispatching the SAME compiled
        # group program from its own forward snapshot (96 KB each)
        groups = self._fused_groups()
        V = self._initial()
        v_ins = []  # group-boundary V snapshots
        for gkind, idxs in groups:
            v_ins.append(V)
            if gkind == "ws":
                _, seg, dev = shipped[idxs[0]]
                V, _ = self._run_wide_sharded(seg, dev, V, False)
            else:
                _, V = self._group_call(tuple(idxs))(
                    [shipped[i][2] for i in idxs], V
                )
        carry = (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(self.R, jnp.int32),
            jnp.asarray(0, jnp.int32),
        )
        self._ship_tb_all()  # one batched transfer for all segments
        # whole-plan record buffer: every trace call appends into ONE
        # donated device array; the traceback costs a single d2h fetch
        total_rows = sum(
            _ladder_fit(shipped[i][1].t1 - shipped[i][1].t0, _RUN_LADDER)
            for i, (k, _s, _d) in enumerate(shipped)
            if k != "ws"
        )
        buf = jnp.zeros((max(total_rows, 1), 7), jnp.int32)
        pos = 0
        entries = []  # (t0, Treal, pos, Tp) in trace order; ws: ndarray
        for (gkind, idxs), Vrun in zip(
            reversed(groups), reversed(v_ins)
        ):
            if gkind == "ws":
                i = idxs[0]
                kind, seg, dev = shipped[i]
                carry, recs = self._trace_ws_host(seg, dev, Vrun, carry)
                entries.append((seg.t0, seg.t1 - seg.t0, recs, None))
                continue
            bps, _ = self._group_call(tuple(idxs))(
                [shipped[i][2] for i in idxs], Vrun
            )
            # per-segment traces ride the SHAPE-SHARED trace program
            # (a handful of compiled variants for the whole plan)
            for j in range(len(idxs) - 1, -1, -1):
                off = idxs[j]
                kind, seg, dev = shipped[off]
                xs, w1d, syd = self._ship_tb(off, kind, seg)
                if kind == "n":
                    b256, b1024 = bps[j]
                    tbl_dev = dev[4]
                else:
                    b256 = self._bp256_dummy()
                    b1024 = bps[j][0]
                    tbl_dev = dev[6] if kind == "w2" else dev[7]
                targs = (
                    b256, b1024, tbl_dev, w1d, syd, xs, carry, buf,
                    np.int32(pos),
                )
                carry, buf = self._trace_call(targs)(*targs)
                entries.append(
                    (seg.t0, seg.t1 - seg.t0, pos, xs.shape[0])
                )
                pos += xs.shape[0]
            del bps
        buf_np = np.asarray(buf)  # the one record fetch
        rec_chunks = [
            (t0, Treal, r if p is None else buf_np[r : r + p])
            for t0, Treal, r, p in entries
        ]
        sink_value = int(np.asarray(V)[self.R, 0])
        return self._assemble(sink_value, rec_chunks)

    def _trace_ws_host(self, seg, dev, V1024, carry):
        """Host-side backtrack of one sharded wide run (see run())."""
        import jax.numpy as jnp

        Treal = seg.t1 - seg.t0
        _, bplist = self._run_wide_sharded(seg, dev, V1024, keep_bp=True)
        lane, r, sh = (int(np.asarray(x)) for x in carry)
        hrecs = np.zeros((Treal, 7), np.int32)
        for k, ti in enumerate(range(Treal - 1, -1, -1)):
            slot = int(np.asarray(bplist[ti][r, lane]))
            crow = int(seg.tb_chunkbase[ti]) + slot // CHUNK
            lanec = slot % CHUNK
            packedv = int(seg.tbl[crow, 0, lanec])
            gidx = packedv >> 13
            wsum = packedv & 3
            w1 = int(seg.w1[crow, lanec])
            sy = int(seg.symd[crow, lanec])
            binv = int(seg.tb_bin[ti])
            bout = int(seg.tb_bout[ti])
            hrecs[k] = (
                gidx // binv, gidx % binv, lane // bout,
                lane % bout, w1, wsum - w1, sy,
            )
            lane, r, sh = gidx, r - wsum, sh + sy
        carry = (
            jnp.asarray(lane, jnp.int32),
            jnp.asarray(r, jnp.int32),
            jnp.asarray(sh, jnp.int32),
        )
        return carry, hrecs

    def _assemble(self, sink_value, rec_chunks):
        import jax.numpy as jnp

        # device-resident record stacks come home in ONE transfer
        # (per-segment fetches cost ~ms each over the tunnel runtime)
        dev_idx = [
            i
            for i, (_, _, r) in enumerate(rec_chunks)
            if not isinstance(r, np.ndarray)
        ]
        if dev_idx:
            cat = np.asarray(
                jnp.concatenate(
                    [rec_chunks[i][2] for i in dev_idx], axis=0
                )
            )
            pos = 0
            for i in dev_idx:
                t0, Treal, r = rec_chunks[i]
                Tp = int(r.shape[0])
                rec_chunks[i] = (t0, Treal, cat[pos : pos + Tp])
                pos += Tp
        shet = 0
        parts = []
        for t0, Treal, recs in rec_chunks:
            r = np.asarray(recs)[:Treal]  # real rows, reversed in-segment
            shet += int(r[:, 6].sum())
            lvl = t0 + (Treal - 1 - np.arange(Treal, dtype=np.int64)) + 1
            parts.append(
                np.column_stack([lvl.astype(np.int64), r[:, :6]])
            )
        allr = (
            np.concatenate(parts)
            if parts
            else np.zeros((0, 7), np.int64)
        )
        allr = allr[np.argsort(allr[:, 0], kind="stable")]
        transitions = [tuple(int(x) for x in row) for row in allr]
        return sink_value, shet, transitions

    # ---------------- full run ----------------
    def run(self, verbose: bool = False):
        import jax
        import jax.numpy as jnp

        if _os.environ.get("DIPGENIE_FUSE", "1") != "0":
            try:
                return self._run_fused(verbose)
            except Exception as e:  # pragma: no cover - backend-specific
                print(
                    "[diploid_dp] fused run unavailable "
                    f"({type(e).__name__}: {e}); per-segment fallback"
                )

        # forward keeps only each segment's 128 KB input state; the
        # backward pass below REMATERIALIZES one segment's backpointers
        # at a time by re-running that segment (2x forward compute for
        # ~100x less resident memory — all bps on MHC would be ~14 GB)
        V, _, v_ins = self._forward(keep_bp=False, keep_v_in=True)
        carry = (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(self.R, jnp.int32),
            jnp.asarray(0, jnp.int32),
        )
        shipped = self._ship()
        if "trace_n" not in self._jits:
            self._jits["trace_n"] = jax.jit(_narrow_trace)
        nseg = len(shipped)
        rec_chunks = []  # device arrays, reversed order
        for ri, (kind, seg, dev) in enumerate(reversed(shipped)):
            idx = nseg - 1 - ri
            Treal = seg.t1 - seg.t0
            if kind == "n":
                xs, w1d, syd = self._ship_tb(idx, kind, seg)
                fn = self._narrow_jit(seg)
                bp256, bp1024, _ = fn(*dev, v_ins[idx])
                carry, recs = self._jits["trace_n"](
                    bp256, bp1024, dev[4], w1d, syd, xs, carry,
                )
                del bp256, bp1024
            elif kind == "ws":
                # sharded wide runs backtrack on the host: bp values are
                # fetched one scalar per transition (the per-transition
                # metadata lives in the host-side plan arrays). One
                # device sync per wide run to realize the carry.
                _, bplist = self._run_wide_sharded(
                    seg, dev, v_ins[idx], keep_bp=True
                )
                lane, r, sh = (int(np.asarray(x)) for x in carry)
                hrecs = np.zeros((Treal, 7), np.int32)
                for k, ti in enumerate(range(Treal - 1, -1, -1)):
                    slot = int(np.asarray(bplist[ti][r, lane]))
                    crow = int(seg.tb_chunkbase[ti]) + slot // CHUNK
                    lanec = slot % CHUNK
                    packedv = int(seg.tbl[crow, 0, lanec])
                    gidx = packedv >> 13
                    wsum = packedv & 3
                    w1 = int(seg.w1[crow, lanec])
                    sy = int(seg.symd[crow, lanec])
                    binv = int(seg.tb_bin[ti])
                    bout = int(seg.tb_bout[ti])
                    hrecs[k] = (
                        gidx // binv, gidx % binv, lane // bout,
                        lane % bout, w1, wsum - w1, sy,
                    )
                    lane, r, sh = gidx, r - wsum, sh + sy
                carry = (
                    jnp.asarray(lane, jnp.int32),
                    jnp.asarray(r, jnp.int32),
                    jnp.asarray(sh, jnp.int32),
                )
                recs = hrecs
                del bplist
            else:
                xs, w1d, syd = self._ship_tb(idx, kind, seg)
                if kind == "w2":
                    fn = self._wide_split_jit(seg)
                    tbl_dev = dev[6]
                else:
                    fn = self._wide_jit(seg)
                    tbl_dev = dev[7]
                bp, _ = fn(*dev, v_ins[idx])
                carry, recs = self._jits["trace_n"](
                    self._bp256_dummy(), bp, tbl_dev, w1d, syd, xs, carry,
                )
                del bp
            rec_chunks.append((seg.t0, Treal, recs))
            # bound in-flight rematerialized bp memory: async dispatch
            # would otherwise enqueue every segment before any frees
            if (ri & 63) == 63:
                jax.block_until_ready(recs)

        sink_value = int(np.asarray(V)[self.R, 0])
        transitions = []
        shet = 0
        for t0, Treal, recs in rec_chunks:
            r = np.asarray(recs)[:Treal]  # real rows, reversed in-segment
            shet += int(r[:, 6].sum())
            for i in range(Treal):
                lvl = t0 + (Treal - 1 - i) + 1
                pi, pj, i2, j2, wu, wv, _ = (int(x) for x in r[i])
                transitions.append((lvl, pi, pj, i2, j2, wu, wv))
        transitions.sort(key=lambda x: x[0])
        return sink_value, shet, transitions
