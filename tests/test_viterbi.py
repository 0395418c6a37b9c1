"""Viterbi engine vs exhaustive path enumeration, plus traceback validation."""

import numpy as np
import pytest

import jax.numpy as jnp

from deciphon_tpu import states as st
from deciphon_tpu.ops import bruteforce
from deciphon_tpu.ops.costs import build_costs
from deciphon_tpu.ops.traceback import unzip
from deciphon_tpu.ops.viterbi_jax import viterbi, viterbi_null
from deciphon_tpu.profile import sample_profile
from deciphon_tpu.scan.sequence import frag_codes_ending
from deciphon_tpu.xtrans import (XT_CC, XT_CT, XT_EB, XT_EC, XT_EJ, XT_ET,
                                 XT_JB, XT_JJ, XT_NB, XT_NN, XT_SB, XT_SN)


def random_seq(rng, L):
    return rng.integers(0, 4, size=L).astype(np.int8)


def run_viterbi(costs, seq, path=False):
    codes = frag_codes_ending(seq)
    return viterbi(
        jnp.asarray(costs.core), jnp.asarray(costs.match),
        jnp.asarray(costs.null), jnp.asarray(costs.background),
        jnp.asarray(costs.xt), jnp.asarray(codes),
        jnp.int32(len(seq)), path=path,
    )


CASES = [
    # (seed, K, L, eps, multi_hits, hmmer3_compat)
    (1, 2, 4, 0.1, True, False),
    (2, 2, 6, 0.1, False, False),
    (3, 3, 5, 0.01, True, True),
    (4, 2, 7, 0.5, True, False),
    (5, 3, 7, 0.1, False, True),
]


@pytest.mark.parametrize("seed,K,L,eps,mh,h3c", CASES)
def test_viterbi_matches_bruteforce(seed, K, L, eps, mh, h3c):
    prof = sample_profile(seed, K, epsilon=eps)
    rng = np.random.default_rng(seed + 100)
    seq = random_seq(rng, L)
    costs = build_costs(prof, mh, h3c, window_len=L)

    expected = bruteforce.best_path_cost(costs, seq)
    got = float(run_viterbi(costs, seq))
    assert np.isfinite(expected)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed,K,L,eps,mh,h3c", CASES)
def test_null_matches_bruteforce(seed, K, L, eps, mh, h3c):
    prof = sample_profile(seed, K, epsilon=eps)
    rng = np.random.default_rng(seed + 200)
    seq = random_seq(rng, L)
    costs = build_costs(prof, mh, h3c, window_len=L)
    expected = bruteforce.best_null_cost(costs, seq)
    codes = frag_codes_ending(seq)
    got = float(viterbi_null(jnp.asarray(costs.null), costs.xt[0],
                             jnp.asarray(codes), jnp.int32(L)))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def path_cost(costs, seq, path):
    """Recompute a traced path's total cost from first principles."""
    from deciphon_tpu.frame import frag_code
    from deciphon_tpu.ops.costs import (CT_BM, CT_DD, CT_DM, CT_II, CT_IM,
                                        CT_MD, CT_MI, CT_MM)

    xt = costs.xt.astype(np.float64)
    core = costs.core.astype(np.float64)
    total = 0.0
    pos = 0
    prev = None
    for sid, size in path:
        frag = tuple(int(x) for x in seq[pos : pos + size])
        c = frag_code(frag) if size else None
        em = 0.0
        trans = 0.0
        if sid == st.STATE_S:
            pass
        elif sid == st.STATE_N:
            em = costs.null[c]
            trans = xt[XT_SN] if prev == st.STATE_S else xt[XT_NN]
        elif sid == st.STATE_B:
            trans = {st.STATE_S: xt[XT_SB], st.STATE_N: xt[XT_NB],
                     st.STATE_E: xt[XT_EB], st.STATE_J: xt[XT_JB]}[prev]
        elif sid == st.STATE_J:
            em = costs.null[c]
            trans = xt[XT_EJ] if prev == st.STATE_E else xt[XT_JJ]
        elif sid == st.STATE_C:
            em = costs.null[c]
            trans = xt[XT_EC] if prev == st.STATE_E else xt[XT_CC]
        elif sid == st.STATE_T:
            trans = xt[XT_ET] if prev == st.STATE_E else xt[XT_CT]
        elif sid == st.STATE_E:
            trans = 0.0
        elif st.is_match(sid):
            k = st.core_idx(sid)
            em = costs.match[c, k]
            if prev == st.STATE_B:
                trans = core[CT_BM, k]
            elif st.is_match(prev):
                trans = core[CT_MM, k]
            elif st.is_insert(prev):
                trans = core[CT_IM, k]
            else:
                trans = core[CT_DM, k]
        elif st.is_insert(sid):
            k = st.core_idx(sid)
            em = costs.background[c]
            trans = core[CT_MI, k] if st.is_match(prev) else core[CT_II, k]
        elif st.is_delete(sid):
            k = st.core_idx(sid)
            trans = core[CT_MD, k] if st.is_match(prev) else core[CT_DD, k]
        else:
            raise AssertionError(sid)
        total += em + trans
        pos += size
        prev = sid
    assert pos == len(seq)
    return total


@pytest.mark.parametrize("seed,K,L,eps,mh,h3c", CASES)
def test_traceback_path_is_optimal(seed, K, L, eps, mh, h3c):
    prof = sample_profile(seed, K, epsilon=eps)
    rng = np.random.default_rng(seed + 300)
    seq = random_seq(rng, L)
    costs = build_costs(prof, mh, h3c, window_len=L)

    score, xnodes, nodes = run_viterbi(costs, seq, path=True)
    path = unzip(np.asarray(xnodes), np.asarray(nodes), L, K)

    # structural sanity
    assert path[0][0] == st.STATE_S and path[-1][0] == st.STATE_T
    assert sum(sz for _, sz in path) == L

    # the traced path's recomputed cost equals the DP optimum
    recomputed = path_cost(costs, seq, path)
    np.testing.assert_allclose(recomputed, float(score), rtol=2e-5, atol=2e-5)


def test_longer_sequence_path():
    prof = sample_profile(11, 8, epsilon=0.1)
    rng = np.random.default_rng(42)
    seq = random_seq(rng, 60)
    costs = build_costs(prof, True, False, window_len=60)
    score, xnodes, nodes = run_viterbi(costs, seq, path=True)
    path = unzip(np.asarray(xnodes), np.asarray(nodes), 60, 8)
    assert sum(sz for _, sz in path) == 60
    recomputed = path_cost(costs, seq, path)
    np.testing.assert_allclose(recomputed, float(score), rtol=1e-4, atol=1e-4)
