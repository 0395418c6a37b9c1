"""Lane-packed small-K tier: bitwise parity with the unpacked kernel.

The packed kernel (ops/viterbi_pallas.py viterbi_scores_pairs_packed)
must reproduce the unpacked pending kernel's scores BIT-exactly for every
segment — the LRT filter compares floats at equality-sensitive margins
and the golden product checksums tolerate nothing (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deciphon_tpu.ops import viterbi_pallas as vp
from deciphon_tpu.ops.costs import build_costs
from deciphon_tpu.profile import sample_profile
from deciphon_tpu.scan.scheduler import (BucketedPairScorer, PackedPairScorer,
                                         PairItem, PairScorer,
                                         DeviceSeqCodes)
from deciphon_tpu.scan.sequence import Sequence, frag_codes_ending
from deciphon_tpu.scan.window import WindowCursor
from deciphon_tpu.xtrans import xtrans_cost_vector


def _windows(nwin, L, seed=1):
    rng = np.random.default_rng(seed)
    codes = np.zeros((nwin, L, 5), np.int32)
    xt = np.zeros((nwin, 13), np.float32)
    lengths = np.zeros((nwin,), np.int32)
    for b in range(nwin):
        n = L - 7 * b
        seq = rng.integers(0, 4, size=n).astype(np.int8)
        codes[b, :n] = frag_codes_ending(seq)
        xt[b] = xtrans_cost_vector(True, False, n)
        lengths[b] = n
    return xt, codes, lengths


@pytest.mark.parametrize("nseg,seg,ks", [
    (2, 64, [20, 50]),
    pytest.param(4, 64, [20, 40, 50],  # one empty trailing segment
                 marks=pytest.mark.slow),
    pytest.param(2, 128, [100, 126], marks=pytest.mark.slow),
    (4, 128, [60, 90, 110, 126]),
])
def test_packed_kernel_bit_equals_unpacked(nseg, seg, ks):
    costs = [build_costs(sample_profile(seed=3 + i, core_size=k))
             for i, k in enumerate(ks)]
    kappa, mode, _ = vp._resolve(None, "pending", None)
    xt, codes, lengths = _windows(8, 23 * max(ks) // 4)
    xts, lens, ck = vp.pack_windows(xt, codes, lengths, kappa=kappa,
                                    mode=mode, w=8)
    pidx = jnp.asarray(np.zeros((xts.shape[0],), np.int32))
    args = (jnp.asarray(xts), jnp.asarray(lens), jnp.asarray(ck))

    pt, pv = vp.build_tables_packed(costs, seg=seg, nseg=nseg)
    palt, pnul = vp.viterbi_scores_pairs_packed(
        pidx, jnp.asarray(pt[None]), jnp.asarray(pv[None]), *args,
        kappa=kappa, nseg=nseg, interpret=True)
    palt, pnul = np.asarray(palt), np.asarray(pnul)

    for s, c in enumerate(costs):
        t, v = vp.build_tables(c, max(128, vp.round_up(c.K + 2, 128)))
        alt, nul = vp.viterbi_scores_pairs(
            pidx, jnp.asarray(t[None]), jnp.asarray(v[None]), *args,
            kappa=kappa, interpret=True, mode="pending", prefetch=False)
        np.testing.assert_array_equal(palt[:, :, s], np.asarray(alt))
        np.testing.assert_array_equal(pnul[:, :, s], np.asarray(nul))
    for s in range(len(costs), nseg):  # empty segments score +inf
        assert np.all(np.isinf(palt[:, :, s]))


def _items(profiles, seqs, dev):
    items = []
    for p, prof in enumerate(profiles):
        for s, seq in enumerate(seqs):
            cur = WindowCursor(prof.core_size, seq.size)
            while True:
                win = cur.next()
                if win is None:
                    break
                items.append(PairItem(
                    p_idx=p, s_idx=s, win=win, seq=seq,
                    gstart=dev.gstart(s, win.start),
                    multi_hits=True, hmmer3_compat=False))
    return items


@pytest.mark.slow
def test_packed_scorer_matches_plain_scorer(monkeypatch):
    """PackedPairScorer (whole-read windows packed + long-read windows on
    the inner unpacked tier) returns exactly PairScorer's scores.

    NLB floor dropped: interpret kernels execute/compile in proportion
    to padded block counts, and the production floor pads every window
    to >=1280 positions."""
    monkeypatch.setattr(PairScorer, "NLB_FLOOR", 1)
    monkeypatch.setattr(PackedPairScorer, "NLB_FLOOR", 1)
    ks = [30, 44, 44, 58]
    profiles = [sample_profile(seed=11 + i, core_size=k)
                for i, k in enumerate(ks)]
    costs = [build_costs(p) for p in profiles]
    rng = np.random.default_rng(2)
    # short reads -> whole-read windows (packed); the 2600 nt read is
    # multi-window for K=30 (50*30=1500) -> routed to the inner tier
    seqs = [Sequence.make(i, f"r{i}", "".join(
        "ACGT"[b] for b in rng.integers(0, 4, size=n)))
        for i, n in enumerate((900, 1200, 2600))]
    dev = DeviceSeqCodes(seqs)

    packed = PackedPairScorer(costs, nseg=4, interpret=True)
    packed.set_device_codes(dev)
    plain = PairScorer(costs, interpret=True)
    plain.set_device_codes(dev)

    items = _items(profiles, seqs, dev)
    got = packed.score(items)
    want = plain.score(list(items))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (got[k], want[k])


def test_bucketed_scorer_builds_packed_tiers():
    """Round-5 greedy class formation: classes open at the largest seg
    need and accept members within 2x, so {100,120} (seg 128) absorbs
    {30,50,60} (seg 64, lane fill >= 0.5) into ONE packed class;
    singletons and big K stay plain."""
    ks = [30, 50, 60, 100, 120, 300, 5000]
    costs = [build_costs(sample_profile(seed=40 + i, core_size=k))
             for i, k in enumerate(ks)]
    b = BucketedPairScorer(costs, interpret=True)
    kinds = [type(s).__name__ for s in b.scorers]
    assert kinds.count("PackedPairScorer") == 1
    packed = next(s for s in b.scorers
                  if type(s).__name__ == "PackedPairScorer")
    assert packed.seg == 128 and packed.nseg >= 4
    # K=300 singleton -> plain; K=5000 -> HBM tier
    assert any(getattr(s, "hbm_table", False) for s in b.scorers)
    # every profile maps to a scorer
    assert sorted(b._map) == list(range(len(ks)))
