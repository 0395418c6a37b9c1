"""The scan pipeline: batched two-phase Viterbi over (profile, window) pairs.

Reference call stack being re-architected (SURVEY.md §3.2): the per-thread
protein×sequence×window loop of c-core/thread.c:49-208 becomes

  phase 1 (device, batched): null DP + score-only frame Viterbi for a batch
    of windows of one profile -> LRT filter (thread.c:114-121);
  phase 2 (device per survivor + host): path Viterbi -> packed trellis ->
    host traceback -> hit segmentation -> ML codon/amino decode -> product
    line (thread.c:126-207).

Windows of one (profile, sequence) pair advance serially with last-hit
feedback (exact window.c semantics); batching happens across sequences and
(in the sharded scanner) across profiles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import states as st
from ..ops.costs import ViterbiCosts, build_costs
from ..ops.traceback import unzip
from ..ops.viterbi_jax import viterbi, viterbi_batch, viterbi_null_batch
from ..profile import FrameProfile
from ..xtrans import xtrans_cost_vector
from .decoder import Decoder
from .product import MatchStep, ProductLine, ProductWriter
from .sequence import Sequence
from .window import WindowCursor

HMMER_MAX_AMINO = 100000  # c-core/thread.c:184


def lrt(null_cost: float, alt_cost: float) -> float:
    """LRT from min-plus costs (lrt.h: -2(null_loglik - alt_loglik))."""
    return 2.0 * (float(null_cost) - float(alt_cost))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_len(n: int) -> int:
    """Bucket window lengths to limit recompilation."""
    if n <= 256:
        return _round_up(max(n, 1), 64)
    return 1 << math.ceil(math.log2(n))


@dataclass
class ScanConfig:
    multi_hits: bool = True
    hmmer3_compat: bool = False
    max_batch: int = 64


@dataclass
class _Hit:
    """One window's product data before confirmation."""
    line: ProductLine
    amino: str
    protein_idx: int


class Scanner:
    """Scans sequence batches against a list of pressed profiles.

    `confirmer`, if given, is called as confirmer(protein_idx, amino_seq)
    and must return a log-evalue (and optionally an h3r blob) — the hmmpgmd
    confirmation stage (c-core/hmmer.c).  Without it, every LRT hit is kept
    and reported with evalue 1 (log 0).
    """

    def __init__(self, profiles: list[FrameProfile], config: ScanConfig = None,
                 confirmer=None, abc_name: str = "dna"):
        self.profiles = profiles
        self.config = config or ScanConfig()
        self.confirmer = confirmer
        self.abc_name = abc_name
        self._costs: dict[int, ViterbiCosts] = {}
        self.progress_done = 0
        self.progress_total = 0

    def costs(self, p_idx: int) -> ViterbiCosts:
        if p_idx not in self._costs:
            self._costs[p_idx] = build_costs(
                self.profiles[p_idx], self.config.multi_hits,
                self.config.hmmer3_compat)
        return self._costs[p_idx]

    # ------------------------------------------------------------------
    def run(self, sequences: list[Sequence], product_dir: str) -> str:
        writer = ProductWriter(product_dir)
        self.progress_total = len(self.profiles)
        self.progress_done = 0
        for p_idx in range(len(self.profiles)):
            self._scan_profile(p_idx, sequences, writer)
            self.progress_done += 1
        return writer.close()

    @property
    def progress(self) -> int:
        if not self.progress_total:
            return 0
        return 100 * self.progress_done // self.progress_total

    # ------------------------------------------------------------------
    def _scan_profile(self, p_idx: int, sequences: list[Sequence],
                      writer: ProductWriter) -> None:
        profile = self.profiles[p_idx]
        costs = self.costs(p_idx)
        K = profile.core_size

        cursors = [WindowCursor(K, s.size) for s in sequences]
        pending = [(i, cursors[i].next()) for i in range(len(sequences))]
        pending = [(i, w) for i, w in pending if w is not None]

        while pending:
            batch = pending[: self.config.max_batch]
            pending = pending[len(batch):]

            results = self._phase1(costs, sequences, batch)
            for (s_idx, win), (null_c, alt_c) in zip(batch, results):
                line_lrt = lrt(null_c, alt_c)
                if math.isfinite(line_lrt) and line_lrt >= 0:
                    self._phase2(p_idx, costs, sequences[s_idx], win,
                                 line_lrt, cursors[s_idx], writer)
                nxt = cursors[s_idx].next()
                if nxt is not None:
                    pending.append((s_idx, nxt))

    # ------------------------------------------------------------------
    def _phase1(self, costs: ViterbiCosts, sequences, batch):
        """Null + alt scores for a batch of windows of one profile."""
        lens = [w.length for _, w in batch]
        Lpad = _pad_len(max(lens))
        B = len(batch)
        codes = np.zeros((B, Lpad, 5), dtype=np.int32)
        xts = np.zeros((B, 13), dtype=np.float32)
        lengths = np.asarray(lens, dtype=np.int32)
        for bi, (s_idx, win) in enumerate(batch):
            wc = sequences[s_idx].window_codes(win.start, win.stop)
            codes[bi, : win.length] = wc
            xts[bi] = xtrans_cost_vector(
                self.config.multi_hits, self.config.hmmer3_compat, win.length)

        codes_j = jnp.asarray(codes)
        lengths_j = jnp.asarray(lengths)
        null_scores = viterbi_null_batch(
            jnp.asarray(costs.null), jnp.asarray(xts[:, 0]), codes_j, lengths_j)
        alt_scores = viterbi_batch(
            jnp.asarray(costs.core), jnp.asarray(costs.match),
            jnp.asarray(costs.null), jnp.asarray(costs.background),
            jnp.asarray(xts), codes_j, lengths_j)
        return list(zip(np.asarray(null_scores), np.asarray(alt_scores)))

    # ------------------------------------------------------------------
    def _phase2(self, p_idx, costs: ViterbiCosts, seq: Sequence, win,
                line_lrt: float, cursor: WindowCursor,
                writer: ProductWriter) -> None:
        profile = self.profiles[p_idx]
        L = win.length
        wc = seq.window_codes(win.start, win.stop)
        Lpad = _pad_len(L)
        codes = np.zeros((Lpad, 5), dtype=np.int32)
        codes[:L] = wc
        xt = xtrans_cost_vector(self.config.multi_hits,
                                self.config.hmmer3_compat, L)
        score, xnodes, nodes = viterbi(
            jnp.asarray(costs.core), jnp.asarray(costs.match),
            jnp.asarray(costs.null), jnp.asarray(costs.background),
            jnp.asarray(xt), jnp.asarray(codes), jnp.int32(L), path=True)
        path = unzip(np.asarray(xnodes), np.asarray(nodes), L,
                     profile.core_size)

        seg = segment_hits(path)
        if seg is None:
            return  # no B state: cursor's last_hit_pos stays -1
        begin, end, hit_start, hit_stop, last_hit_pos, found_hit = seg
        cursor.set_last_hit_position(last_hit_pos)
        if not found_hit:
            return  # B without E: empty amino -> no product (thread.c flow)

        window_syms = seq.data[win.start : win.stop]
        decoder = Decoder(profile)
        steps: list[MatchStep] = []
        aminos: list[str] = []
        pos = sum(sz for _, sz in path[:begin])
        from ..frame import frag_code

        for sid, size in path[begin:end]:
            frag = window_syms[pos : pos + size]
            if st.is_mute(sid) or size == 0:
                steps.append(MatchStep(frag, st.state_name(sid), "", ""))
            else:
                fc = frag_code(tuple(
                    "ACGT".index(ch) if ch in "ACGT" else 3
                    for ch in frag))
                codon, amino = decoder.decode_codon_amino(sid, fc)
                steps.append(MatchStep(frag, st.state_name(sid), codon, amino))
                aminos.append(amino)
            pos += size

        line = ProductLine(
            sequence=seq.id, window=win.idx, window_start=win.start,
            window_stop=win.stop, hit=0, hit_start=hit_start,
            hit_stop=hit_stop, profile=profile.accession, abc=self.abc_name,
            lrt=line_lrt, logevalue=0.0, steps=steps)

        amino_seq = "".join(aminos)
        if self.confirmer is not None:
            if len(amino_seq) + 1 > HMMER_MAX_AMINO:
                return
            logevalue, blob = self.confirmer(p_idx, amino_seq)
            if logevalue > 0:
                logevalue = 0.0
            if logevalue == 0:
                return
            line.logevalue = logevalue
            if blob is not None:
                writer.add_h3r(line, blob)
        else:
            if not amino_seq:
                return
        writer.add(line)


def segment_hits(path: list[tuple[int, int]]):
    """Hit segmentation over a traced path (c-core/thread.c:130-166).

    Returns (begin_idx, end_idx, hit_start, hit_stop, last_hit_pos,
    found_hit) over the span from the first B to one past the last E, or
    None when no B state exists (then last_hit_pos stays -1, matching the
    reference's early return).  hit_start/hit_stop are window-relative
    nucleotide positions; last_hit_pos is always hit_stop-1 once a B was
    seen (the reference sets it at loop exit even with no E).
    """
    n = len(path)
    # advance to the first B, accumulating hit_start
    hit_start = 0
    i = 0
    while i < n and path[i][0] != st.STATE_B:
        hit_start += path[i][1]
        i += 1
    if i == n:
        return None
    begin = i
    i += 1

    hit_stop = hit_start
    line_hit_stop = hit_stop
    end = i
    found_any = False
    while True:
        line_hit_stop = hit_stop
        j = end
        while j < n and path[j][0] != st.STATE_E:
            hit_stop += path[j][1]
            j += 1
        if j == n:
            break
        found_any = True
        end = j + 1
    return begin, end, hit_start, line_hit_stop, line_hit_stop - 1, found_any
