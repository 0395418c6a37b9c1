"""Property test: the traced path is legal and its cost equals the score.

Recomputes the min-plus cost of the traceback path step by step with the
same cost tables the engine used — an independent check of the packed
trellis encodings and the unzip walk at sizes the exhaustive oracle
cannot reach.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deciphon_tpu import states as st
from deciphon_tpu.frame import frag_code
from deciphon_tpu.ops.costs import (CT_BM, CT_DD, CT_DM, CT_II, CT_IM,
                                    CT_MD, CT_MI, CT_MM, build_costs)
from deciphon_tpu.ops.traceback import unzip
from deciphon_tpu.ops.viterbi_jax import viterbi
from deciphon_tpu.profile import sample_profile
from deciphon_tpu.scan.sequence import frag_codes_ending
from deciphon_tpu.xtrans import (XT_CC, XT_CT, XT_EB, XT_EC, XT_EJ, XT_ET,
                                 XT_JB, XT_JJ, XT_NB, XT_NN, XT_SB, XT_SN,
                                 xtrans_cost_vector)


def path_cost(costs, seq, path):
    """Accumulate the cost of a traced path (f64)."""
    xt = costs.xt.astype(np.float64)
    core = costs.core.astype(np.float64)
    match = costs.match.astype(np.float64)
    null = costs.null.astype(np.float64)
    bg = costs.background.astype(np.float64)

    def code_at(pos, size):
        return frag_code(tuple(int(x) for x in seq[pos:pos + size]))

    total = 0.0
    pos = 0
    prev = None
    for sid, size in path:
        if prev is not None:
            total += trans_cost(prev, sid, core, xt)
        if size > 0:
            c = code_at(pos, size)
            if st.is_match(sid):
                total += match[c, st.core_idx(sid)]
            elif st.is_insert(sid):
                total += bg[c]
            elif sid in (st.STATE_N, st.STATE_J, st.STATE_C):
                total += null[c]
            else:
                raise AssertionError(f"emitting mute state {sid}")
            pos += size
        prev = sid
    assert pos == len(seq)
    return total


def trans_cost(a, b, core, xt):
    if a == st.STATE_S:
        return {st.STATE_N: xt[XT_SN], st.STATE_B: xt[XT_SB]}[b]
    if a == st.STATE_N:
        return {st.STATE_N: xt[XT_NN], st.STATE_B: xt[XT_NB]}[b]
    if a == st.STATE_B:
        assert st.is_match(b)
        return core[CT_BM, st.core_idx(b)]
    if a == st.STATE_E:
        return {st.STATE_J: xt[XT_EJ], st.STATE_C: xt[XT_EC],
                st.STATE_B: xt[XT_EB], st.STATE_T: xt[XT_ET]}[b]
    if a == st.STATE_J:
        return {st.STATE_J: xt[XT_JJ], st.STATE_B: xt[XT_JB]}[b]
    if a == st.STATE_C:
        return {st.STATE_C: xt[XT_CC], st.STATE_T: xt[XT_CT]}[b]
    ai = st.core_idx(a)
    if b == st.STATE_E:
        assert st.is_match(a) or st.is_delete(a)
        return 0.0
    bi = st.core_idx(b)
    if st.is_match(a):
        if st.is_match(b):
            return core[CT_MM, bi]
        if st.is_insert(b):
            return core[CT_MI, ai]
        if st.is_delete(b):
            return core[CT_MD, bi]
    if st.is_insert(a):
        if st.is_match(b):
            return core[CT_IM, bi]
        if st.is_insert(b):
            return core[CT_II, ai]
    if st.is_delete(a):
        if st.is_match(b):
            return core[CT_DM, bi]
        if st.is_delete(b):
            return core[CT_DD, bi]
    raise AssertionError((a, b))


@pytest.mark.parametrize("seed,K,L,mh,h3c", [
    (11, 30, 150, True, False),
    (12, 60, 300, True, True),
    (13, 15, 90, False, False),
    (14, 100, 200, True, False),
])
def test_traced_path_cost_equals_score(seed, K, L, mh, h3c):
    prof = sample_profile(seed, K, epsilon=0.1)
    costs = build_costs(prof, mh, h3c, window_len=L)
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, size=L).astype(np.int8)
    codes = frag_codes_ending(seq)
    xt = xtrans_cost_vector(mh, h3c, L)
    costs = costs.with_xtrans(mh, h3c, L)

    score, xnodes, nodes = viterbi(
        jnp.asarray(costs.core), jnp.asarray(costs.match),
        jnp.asarray(costs.null), jnp.asarray(costs.background),
        jnp.asarray(xt), jnp.asarray(codes), jnp.int32(L), path=True)
    path = unzip(np.asarray(xnodes), np.asarray(nodes), L, K)

    assert path[0][0] == st.STATE_S
    assert path[-1][0] == st.STATE_T
    got = path_cost(costs, seq, path)
    np.testing.assert_allclose(got, float(score), rtol=1e-5, atol=1e-3)
