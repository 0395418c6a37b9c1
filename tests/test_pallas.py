"""Pallas kernel (interpret mode) parity vs the lax.scan reference engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from deciphon_tpu.ops.costs import build_costs
from deciphon_tpu.ops.engine import ProfilePack, scan_scores_jit
from deciphon_tpu.ops.viterbi_pallas import PallasScanEngine, pack_windows
from deciphon_tpu.profile import sample_profile
from deciphon_tpu.scan.sequence import frag_codes_ending
from deciphon_tpu.xtrans import xtrans_cost_vector


def make_workload(seeds_ks, B, L, mh=True, h3c=False, seed=0):
    costs = [build_costs(sample_profile(s, k), mh, h3c) for s, k in seeds_ks]
    rng = np.random.default_rng(seed)
    codes = np.zeros((B, L, 5), np.int32)
    xt = np.zeros((B, 13), np.float32)
    lengths = np.zeros((B,), np.int32)
    for b in range(B):
        n = max(1, L - 2 * b)
        seq = rng.integers(0, 4, size=n).astype(np.int8)
        codes[b, :n] = frag_codes_ending(seq)
        xt[b] = xtrans_cost_vector(mh, h3c, n)
        lengths[b] = n
    return costs, xt, codes, lengths


def jax_scores(costs, xt, codes, lengths):
    pack = ProfilePack.from_costs(costs, lane_multiple=1)
    nul, alt = scan_scores_jit(
        jnp.asarray(pack.core), jnp.asarray(pack.match),
        jnp.asarray(pack.null), jnp.asarray(pack.background),
        jnp.asarray(xt), jnp.asarray(codes), jnp.asarray(lengths))
    return np.asarray(nul), np.asarray(alt)


@pytest.mark.parametrize("mh,h3c", [(True, False), (False, True)])
def test_pallas_matches_jax_engine(mh, h3c):
    costs, xt, codes, lengths = make_workload(
        [(1, 5), (2, 12), (3, 9)], B=5, L=37, mh=mh, h3c=h3c)
    eng = PallasScanEngine(costs, interpret=True)
    nul_p, alt_p = eng.scores(xt, codes, lengths)
    nul_j, alt_j = jax_scores(costs, xt, codes, lengths)
    np.testing.assert_allclose(alt_p, alt_j, rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(nul_p, nul_j, rtol=2e-6, atol=2e-5)


def test_pallas_window_group_padding():
    """B not a multiple of W; length-1 windows; multi-l-block windows."""
    costs, xt, codes, lengths = make_workload([(7, 4)], B=3, L=70, seed=9)
    lengths[2] = 1  # minimal window
    eng = PallasScanEngine(costs, interpret=True)
    nul_p, alt_p = eng.scores(xt, codes, lengths)
    nul_j, alt_j = jax_scores(costs, xt, codes, lengths)
    np.testing.assert_allclose(alt_p, alt_j, rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(nul_p, nul_j, rtol=2e-6, atol=2e-5)


def test_pack_windows_layout():
    xt = np.arange(3 * 13, dtype=np.float32).reshape(3, 13)
    codes = np.arange(3 * 10 * 5, dtype=np.int32).reshape(3, 10, 5) % 1364
    lengths = np.array([10, 7, 9], np.int32)
    xts, lens, ck = pack_windows(xt, codes, lengths, kappa=8, mode="slot")
    assert xts.shape == (1, 8, 16)
    assert lens.shape == (1, 8, 1)
    assert ck.shape == (1, 2, 8, 5, 8)
    # codes[b, l, t] must land at ck[wg, l//kappa, l%kappa, t, b%W]
    assert ck[0, 0, 3, 2, 1] == codes[1, 3, 2]
    assert ck[0, 1, 1, 4, 2] == codes[2, 9, 4]
    assert lens[0, :3, 0].tolist() == [10, 7, 9]
    assert lens[0, 3:, 0].tolist() == [0] * 5


def test_bucketed_scorer_mixed_sizes():
    """Profiles in different K buckets score identically to the jax engine."""
    from deciphon_tpu.scan.scheduler import (BucketedPairScorer, PairItem,
                                             JaxPairScorer)
    from deciphon_tpu.scan.window import Window

    costs = [build_costs(sample_profile(s, k))
             for s, k in [(1, 6), (2, 150), (3, 9)]]
    rng = np.random.default_rng(5)
    items = []
    for p_idx in range(3):
        for w in range(3):
            n = 30 + 7 * w
            seq = rng.integers(0, 4, size=n).astype(np.int8)
            items.append(PairItem(
                p_idx=p_idx, s_idx=w, win=Window(idx=w, start=0, stop=n),
                codes=frag_codes_ending(seq), multi_hits=True,
                hmmer3_compat=False))

    bucketed = BucketedPairScorer(costs, interpret=True)
    assert len(bucketed.scorers) == 2  # buckets 128 and 256
    got = bucketed.score(items)
    want = JaxPairScorer(costs).score(items)
    for it in items:
        assert it.p_idx in (0, 1, 2)  # restored after scoring
        np.testing.assert_allclose(got[id(it)], want[id(it)],
                                   rtol=2e-6, atol=2e-5)


def test_static_gather_mode_bit_identical():
    """Host slot-major code reorder + static-store gather == slot mode."""
    from deciphon_tpu.ops import viterbi_pallas as vp

    costs, xt, codes, lengths = make_workload(
        [(11, 5), (12, 17)], B=5, L=41, seed=2)
    eng = PallasScanEngine(costs, interpret=True)
    kap = vp.KAPPA
    xts, lens, ck = pack_windows(xt, codes, lengths, kappa=kap, mode="slot")
    a1, n1 = vp.viterbi_scores_grid(
        eng.tables, eng.tvecs, jnp.asarray(xts), jnp.asarray(lens),
        jnp.asarray(ck), kappa=kap, interpret=True, mode="slot")
    xts2, lens2, ck2 = pack_windows(xt, codes, lengths, kappa=kap,
                                    mode="static")
    a2, n2 = vp.viterbi_scores_grid(
        eng.tables, eng.tvecs, jnp.asarray(xts2), jnp.asarray(lens2),
        jnp.asarray(ck2), kappa=kap, interpret=True, mode="static")
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))

    # and the pending push-formulation is bit-identical too
    kap_p = vp.KAPPA_PENDING
    xts3, lens3, ck3 = pack_windows(xt, codes, lengths, kappa=kap_p,
                                    mode="pending")
    a3, n3 = vp.viterbi_scores_grid(
        eng.tables, eng.tvecs, jnp.asarray(xts3), jnp.asarray(lens3),
        jnp.asarray(ck3), kappa=kap_p, interpret=True, mode="pending")
    assert np.array_equal(np.asarray(a1), np.asarray(a3))
    assert np.array_equal(np.asarray(n1), np.asarray(n3))


@pytest.mark.slow
def test_bucketed_scorer_routes_large_profiles_to_hbm_kernel():
    """K beyond the VMEM table limit must score via the HBM-table kernel
    (the reference supports K <= 16384, c-core/model.h:12), bit-identical
    to the VMEM-table pending kernel."""
    from deciphon_tpu.scan.scheduler import (BucketedPairScorer, JaxPairScorer,
                                             PairItem)
    from deciphon_tpu.scan.window import Window

    costs = [build_costs(sample_profile(1, 6)),
             build_costs(sample_profile(2, 9))]
    rng = np.random.default_rng(6)
    items = []
    for p_idx in range(2):
        n = 33
        seq = rng.integers(0, 4, size=n).astype(np.int8)
        items.append(PairItem(
            p_idx=p_idx, s_idx=0, win=Window(idx=0, start=0, stop=n),
            codes=frag_codes_ending(seq), multi_hits=True,
            hmmer3_compat=False))

    saved = BucketedPairScorer.MAX_PALLAS_KP
    saved_pack = BucketedPairScorer.PACK_MAX_SEG
    try:
        BucketedPairScorer.MAX_PALLAS_KP = 64  # force the large-K path
        BucketedPairScorer.PACK_MAX_SEG = 0  # keep the packed tier out
        bucketed = BucketedPairScorer(costs, interpret=True)
        assert all(s.hbm_table for s in bucketed.scorers)
        got = bucketed.score(items)
    finally:
        BucketedPairScorer.MAX_PALLAS_KP = saved
        BucketedPairScorer.PACK_MAX_SEG = saved_pack
    want = JaxPairScorer(costs).score(items)
    for it in items:
        np.testing.assert_allclose(got[id(it)], want[id(it)],
                                   rtol=2e-6, atol=2e-5)


def test_bucketed_scorer_hbm_routing_construction():
    """Fast-tier routing check: oversized-K buckets construct HBM-table
    scorers (the scoring itself is covered by
    test_hbm_kernel_bit_identical_to_vmem_kernel; the full bucketed
    HBM scoring equivalence is the slow-tier test above)."""
    from deciphon_tpu.scan.scheduler import BucketedPairScorer

    costs = [build_costs(sample_profile(1, 6)),
             build_costs(sample_profile(2, 9))]
    saved = BucketedPairScorer.MAX_PALLAS_KP
    saved_pack = BucketedPairScorer.PACK_MAX_SEG
    try:
        BucketedPairScorer.MAX_PALLAS_KP = 64
        BucketedPairScorer.PACK_MAX_SEG = 0
        bucketed = BucketedPairScorer(costs, interpret=True)
        assert all(s.hbm_table for s in bucketed.scorers)
    finally:
        BucketedPairScorer.MAX_PALLAS_KP = saved
        BucketedPairScorer.PACK_MAX_SEG = saved_pack


def test_hbm_kernel_bit_identical_to_vmem_kernel():
    """viterbi_scores_pairs_hbm == viterbi_scores_pairs (pending mode):
    same DP, only the emission-table residency differs."""
    from deciphon_tpu.ops import viterbi_pallas as vp

    costs, xt, codes, lengths = make_workload(
        [(21, 130)], B=3, L=48, seed=13)
    table, tvec = vp.build_tables(costs[0])
    tables = jnp.asarray(table[None])
    tvecs = jnp.asarray(tvec[None])
    xts, lens, ck = pack_windows(xt, codes, lengths, mode="pending", w=8)
    pidx = jnp.zeros((1,), jnp.int32)
    a1, n1 = vp.viterbi_scores_pairs(
        pidx, tables, tvecs, jnp.asarray(xts), jnp.asarray(lens),
        jnp.asarray(ck), mode="pending", interpret=True)
    a2, n2 = vp.viterbi_scores_pairs_hbm(
        pidx, tables, tvecs, jnp.asarray(xts), jnp.asarray(lens),
        jnp.asarray(ck), interpret=True)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))


def test_path_kernel_trellis_bit_parity():
    """The Pallas path kernel's packed trellis equals the viterbi_jax
    oracle bit-for-bit (same candidate order, same f32 sums, shared
    canonical DDCUM), so phase-2 paths are engine-independent."""
    import jax.numpy as jnp

    from deciphon_tpu.ops import viterbi_pallas as vp
    from deciphon_tpu.ops.traceback import unzip
    from deciphon_tpu.ops.viterbi_jax import viterbi_path_batch
    from deciphon_tpu.xtrans import xtrans_cost_vector

    rng = np.random.default_rng(11)
    for K, Ls in [(9, [33, 47, 21]), (150, [200, 161, 90])]:
        costs = build_costs(sample_profile(5 + K, K))
        Kp = vp.round_up(K + 2, 128)
        table, tvec = vp.build_tables(costs, Kp)
        kappa, W = 32, 8
        NLB = -(-max(Ls) // kappa)
        Lk = NLB * kappa
        B = len(Ls)
        codes = np.zeros((W, Lk, 5), np.int32)
        xts = np.zeros((1, W, 16), np.float32)
        lens = np.zeros((1, W, 1), np.int32)
        for b, L in enumerate(Ls):
            seq = rng.integers(0, 4, size=L).astype(np.int8)
            codes[b, :L] = frag_codes_ending(seq)
            xts[0, b, :13] = xtrans_cost_vector(True, False, L)
            lens[0, b, 0] = L
        ck = codes.reshape(1, W, NLB, kappa, 5).transpose(0, 2, 3, 4, 1)
        xn, nd = vp.viterbi_paths_pairs(
            jnp.asarray(np.zeros(1, np.int32)), jnp.asarray(table[None]),
            jnp.asarray(tvec[None]), jnp.asarray(xts), jnp.asarray(lens),
            codes=jnp.asarray(np.ascontiguousarray(ck)), kappa=kappa,
            interpret=True)
        xn = np.asarray(xn)[0]
        nd = np.asarray(nd)[0]
        _, oxn, ond = viterbi_path_batch(
            jnp.asarray(costs.core), jnp.asarray(costs.match),
            jnp.asarray(costs.null), jnp.asarray(costs.background),
            jnp.asarray(xts[0, :B, :13]), jnp.asarray(codes[:B]),
            jnp.asarray(lens[0, :B, 0]))
        oxn = np.asarray(oxn)
        ond = np.asarray(ond)
        for b, L in enumerate(Ls):
            kx = xn[b, :L].astype(np.uint32)
            kn = nd[b, :L, :K].astype(np.uint16)
            assert (kx == oxn[b, 1:L + 1]).all()
            assert (kn == ond[b, 1:L + 1, :K]).all()
            pk = unzip(np.concatenate([np.zeros(1, np.uint32), kx]),
                       np.concatenate([np.zeros((1, K), np.uint16), kn]),
                       L, K)
            assert pk == unzip(oxn[b], ond[b], L, K)


def test_device_start_codes_match_host():
    """The device-computed start-indexed code table equals the host
    per-sequence precompute for every fragment that stays inside the
    sequence (rows past T-t are unused by construction)."""
    import jax.numpy as jnp

    from deciphon_tpu.ops.viterbi_pallas import start_codes
    from deciphon_tpu.scan.scheduler import _start_codes_device
    from deciphon_tpu.scan.sequence import frag_codes_ending

    rng = np.random.default_rng(3)
    for T in (1, 2, 7, 64, 501):
        bases = rng.integers(0, 4, size=T).astype(np.int8)
        host = start_codes(frag_codes_ending(bases))
        dev = np.asarray(_start_codes_device(jnp.asarray(bases)))
        for t in range(1, 6):
            n = max(0, T - (t - 1))
            assert (dev[:n, t - 1] == host[:n, t - 1]).all(), (T, t)
