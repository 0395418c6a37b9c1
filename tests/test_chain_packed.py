"""Packed-plane chained slots: bit-exactness vs the unchained packed
kernel.

The round-5 unified small-K tier chains windows into lane-PACKED planes
(ops/viterbi_pallas.py viterbi_scores_pairs_packed_chained): every slot
carries a back-to-back window chain shared by all NSEG segments of the
pack.  Window starts are block-aligned and kappa % 5 == 0, so chained
scores must be BIT-identical to scoring each window alone via
viterbi_scores_pairs_packed (which tests/test_pallas_packed.py anchors
to the unpacked kernel).
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
SEG, NSEG = 64, 2


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    seq = Sequence.make(0, "s0", "".join(
        "ACGT"[b] for b in rng.integers(0, 4, size=1600)))
    dev_codes = DeviceSeqCodes([seq])
    costs = [build_costs(sample_profile(seed=51 + i, core_size=k))
             for i, k in enumerate((24, 41))]
    tp, tvp = vp.build_tables_packed(costs, SEG, NSEG)
    tables = jnp.asarray(tp[None])
    tvecs = jnp.asarray(tvp[None])
    return seq, dev_codes, tables, tvecs


def _ref_scores(dev_codes, tables, tvecs, wins):
    """Score windows one per slot via the unchained packed path."""
    import jax.numpy as jnp

    n = len(wins)
    assert n <= W
    xts = np.zeros((1, W, 16), np.float32)
    lens = np.zeros((1, W, 1), np.int32)
    starts = np.full((1, W), dev_codes.pad_start, np.int32)
    maxlen = 1
    for wi, (start, stop) in enumerate(wins):
        xts[0, wi, :13] = xtrans_cost_vector(True, False, stop - start)
        lens[0, wi, 0] = stop - start
        starts[0, wi] = dev_codes.gstart(0, start)
        maxlen = max(maxlen, stop - start)
    nlb = -(-maxlen // KAPPA)
    alt, nul = vp.viterbi_scores_pairs_packed(
        jnp.asarray(np.zeros((1,), np.int32)), tables, tvecs,
        jnp.asarray(xts), jnp.asarray(lens),
        starts=jnp.asarray(starts), codes_all=dev_codes.dev, nlb=nlb,
        kappa=KAPPA, nseg=NSEG, interpret=True)
    alt = np.asarray(alt)
    nul = np.asarray(nul)
    return {wins[wi]: (nul[0, wi], alt[0, wi]) for wi in range(n)}


def test_packed_chained_bit_exact(setup):
    import jax.numpy as jnp

    seq, dev_codes, tables, tvecs = setup
    wins = [(0, 37), (100, 260), (300, 380), (0, 400), (500, 700),
            (700, 755), (40, 440), (900, 1100)]
    ref = _ref_scores(dev_codes, tables, tvecs, wins)

    chains = [
        [wins[0], wins[2], wins[4]],
        [wins[1], wins[3]],
        [wins[5], wins[6], wins[7]],
    ]
    C = 4
    N = 2  # pair 1 = all-pad
    sblk = np.zeros((N, W, C), np.int32)
    wlen = np.zeros((N, W, C), np.int32)
    gst = np.full((N, W, C), dev_codes.pad_start, np.int32)
    xti = np.zeros((N, W, C), np.int32)
    lut = []
    lut_idx = {}
    for s, chain in enumerate(chains):
        blk = 0
        for c, (start, stop) in enumerate(chain):
            L = stop - start
            if L not in lut_idx:
                lut_idx[L] = len(lut)
                lut.append(np.pad(xtrans_cost_vector(True, False, L),
                                  (0, 3)))
            sblk[0, s, c] = blk
            wlen[0, s, c] = L
            gst[0, s, c] = dev_codes.gstart(0, start)
            xti[0, s, c] = lut_idx[L]
            blk += -(-L // KAPPA)
    lut_arr = np.zeros((16, 16), np.float32)
    lut_arr[: len(lut)] = np.stack(lut)
    nlb = int((wlen // KAPPA + (wlen % KAPPA > 0)).sum(axis=2).max())
    pidx = np.zeros((N,), np.int32)

    # per-segment window metadata: the shared-window case broadcasts the
    # slot's run chain to every segment
    wsb = np.broadcast_to(sblk[:, :, None, :], (N, W, NSEG, C))
    wln = np.broadcast_to(wlen[:, :, None, :], (N, W, NSEG, C))
    wxt = np.broadcast_to(xti[:, :, None, :], (N, W, NSEG, C))
    alt, nul = vp.viterbi_scores_pairs_packed_chained(
        jnp.asarray(pidx), tables, tvecs, jnp.asarray(sblk),
        jnp.asarray(wlen), jnp.asarray(gst),
        jnp.asarray(np.ascontiguousarray(wsb)),
        jnp.asarray(np.ascontiguousarray(wln)),
        jnp.asarray(np.ascontiguousarray(wxt)),
        jnp.asarray(lut_arr), dev_codes.dev, nlb=nlb, nseg=NSEG,
        kappa=KAPPA, interpret=True)
    alt = np.asarray(alt)  # (N, W, S, C)
    nul = np.asarray(nul)

    checked = 0
    for s, chain in enumerate(chains):
        for c, w in enumerate(chain):
            want_nul, want_alt = ref[w]
            np.testing.assert_array_equal(alt[0, s, :, c], want_alt,
                                          str((s, c)))
            np.testing.assert_array_equal(nul[0, s, :, c], want_nul,
                                          str((s, c)))
            checked += NSEG
    assert checked == len(wins) * NSEG


def test_packed_chained_per_segment_windows(setup):
    """Segments may lay DIFFERENT window lists on the slot's shared code
    stream (block-aligned starts): each segment's scores must equal the
    unchained packed scores of ITS OWN windows."""
    import jax.numpy as jnp

    seq, dev_codes, tables, tvecs = setup
    KB = KAPPA  # block granularity in nt
    seg_wins = [
        [(0, 400), (400, 800), (800, 1195)],  # segment 0's windows
        [(0, 800), (800, 1100)],              # segment 1's windows
    ]
    ref = [_ref_scores(dev_codes, tables, tvecs, ws) for ws in seg_wins]

    # one shared run covering seq[0:1200): 30 blocks
    N, C = 1, 3
    run_sblk = np.zeros((N, W, 1), np.int32)
    run_len = np.zeros((N, W, 1), np.int32)
    run_gst = np.full((N, W, 1), dev_codes.pad_start, np.int32)
    run_len[0, 0, 0] = 1200
    run_gst[0, 0, 0] = dev_codes.gstart(0, 0)

    wsb = np.zeros((N, W, NSEG, C), np.int32)
    wln = np.zeros((N, W, NSEG, C), np.int32)
    wxt = np.zeros((N, W, NSEG, C), np.int32)
    lut, lut_idx = [], {}
    for s, ws in enumerate(seg_wins):
        for c, (start, stop) in enumerate(ws):
            assert start % KB == 0, "window starts must be block-aligned"
            L = stop - start
            if L not in lut_idx:
                lut_idx[L] = len(lut)
                lut.append(np.pad(xtrans_cost_vector(True, False, L),
                                  (0, 3)))
            wsb[0, 0, s, c] = start // KB
            wln[0, 0, s, c] = L
            wxt[0, 0, s, c] = lut_idx[L]
    lut_arr = np.zeros((16, 16), np.float32)
    lut_arr[: len(lut)] = np.stack(lut)

    alt, nul = vp.viterbi_scores_pairs_packed_chained(
        jnp.asarray(np.zeros((N,), np.int32)), tables, tvecs,
        jnp.asarray(run_sblk), jnp.asarray(run_len), jnp.asarray(run_gst),
        jnp.asarray(wsb), jnp.asarray(wln), jnp.asarray(wxt),
        jnp.asarray(lut_arr), dev_codes.dev, nlb=30, nseg=NSEG,
        kappa=KAPPA, interpret=True)
    alt = np.asarray(alt)
    nul = np.asarray(nul)
    for s, ws in enumerate(seg_wins):
        for c, w in enumerate(ws):
            want_nul, want_alt = ref[s][w]
            # segment s's lane range scored ITS window list
            assert alt[0, 0, s, c] == np.float32(want_alt[s]), (s, c)
            assert nul[0, 0, s, c] == np.float32(want_nul[s]), (s, c)
