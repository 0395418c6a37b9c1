"""Host-side traceback from the packed backpointer trellis.

Parity: c-core/trellis.c trellis_unzip / previous_state / emission_size.
The trellis layout is exactly the reference's: per DP stage one uint32
"xnode" word and K uint16 "node" words (bit fields in state.h:28-39).

Runs on host (numpy scalars) — the path length is O(L/3) and only LRT
survivors are ever traced, mirroring the reference's two-phase design.
"""

from __future__ import annotations

import numpy as np

from .. import states as st

# xnode field offsets/widths: N(4@0) B(2@4) E(15@6) C(4@21) T(1@25) J(4@26)
_XN = {
    st.STATE_N: (0, 4),
    st.STATE_B: (4, 2),
    st.STATE_E: (6, 15),
    st.STATE_C: (21, 4),
    st.STATE_T: (25, 1),
    st.STATE_J: (26, 4),
}
# node fields: M(5@0) D(1@5) I(4@6)
_ND_M = (0, 5)
_ND_D = (5, 1)
_ND_I = (6, 4)


def _bits(x: int, off: int, width: int) -> int:
    return (x >> off) & ((1 << width) - 1)


def unzip(xnodes: np.ndarray, nodes: np.ndarray, L: int,
          K: int) -> list[tuple[int, int]]:
    """Walk T back to S; return the forward path as [(state_id, seqsize)].

    xnodes: (L+1,) uint32;  nodes: (L+1, K) uint16.
    Mirrors trellis.c:147-167.
    """
    path: list[tuple[int, int]] = []
    state = st.STATE_T
    stage = L
    while not (state == st.STATE_S and stage == 0):
        size = _emission_size(xnodes, nodes, stage, state)
        path.append((state, size))
        state = _previous_state(xnodes, nodes, stage, state, K)
        stage -= size
        if stage < 0:
            raise RuntimeError("traceback underflow: corrupt trellis")
    path.append((state, 0))
    path.reverse()
    return path


def _emission_size(xnodes, nodes, stage, sid) -> int:
    if sid in (st.STATE_S, st.STATE_B, st.STATE_E, st.STATE_T):
        return 0
    x = int(xnodes[stage])
    if sid == st.STATE_N:
        return _bits(x, *_XN[st.STATE_N]) % 5 + 1
    if sid == st.STATE_C:
        return _bits(x, *_XN[st.STATE_C]) % 5 + 1
    if sid == st.STATE_J:
        return _bits(x, *_XN[st.STATE_J]) % 5 + 1
    if st.is_delete(sid):
        return 0
    n = int(nodes[stage, st.core_idx(sid)])
    if st.is_match(sid):
        return _bits(n, *_ND_M) % 5 + 1
    if st.is_insert(sid):
        return _bits(n, *_ND_I) % 5 + 1
    raise AssertionError(sid)


def _previous_state(xnodes, nodes, stage, sid, K) -> int:
    if not st.is_core(sid):
        v = _bits(int(xnodes[stage]), *_XN[sid]) if sid != st.STATE_S else 0
        if sid == st.STATE_S:
            return st.STATE_S
        if sid == st.STATE_N:
            return (st.STATE_S, st.STATE_N)[v // 5]
        if sid == st.STATE_B:
            return (st.STATE_S, st.STATE_N, st.STATE_E, st.STATE_J)[v]
        if sid == st.STATE_E:
            return (st.make_match_id(v // 2) if v % 2 == 0
                    else st.make_delete_id(v // 2))
        if sid == st.STATE_C:
            return (st.STATE_E, st.STATE_C)[v // 5]
        if sid == st.STATE_T:
            return (st.STATE_E, st.STATE_C)[v]
        if sid == st.STATE_J:
            return (st.STATE_E, st.STATE_J)[v // 5]
        raise AssertionError(sid)

    idx = st.core_idx(sid)
    n = int(nodes[stage, idx])
    if st.is_match(sid):
        v = _bits(n, *_ND_M)
        choice = v // 5
        if choice == 0:
            return st.STATE_B
        assert idx > 0, "M1 must come from B"
        return (None, st.make_match_id, st.make_insert_id,
                st.make_delete_id)[choice](idx - 1)
    if st.is_delete(sid):
        v = _bits(n, *_ND_D)
        assert idx > 0
        return (st.make_match_id, st.make_delete_id)[v](idx - 1)
    if st.is_insert(sid):
        v = _bits(n, *_ND_I)
        return (st.make_match_id, st.make_insert_id)[v // 5](idx)
    raise AssertionError(sid)
