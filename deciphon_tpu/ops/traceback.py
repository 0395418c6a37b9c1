"""Traceback from the packed backpointer trellis: host walk + device walk.

Parity: c-core/trellis.c trellis_unzip / previous_state / emission_size.
The trellis layout is exactly the reference's: per DP stage one uint32
"xnode" word and K uint16 "node" words (bit fields in state.h:28-39).

Two implementations of the same walk:

* `unzip` — host numpy scalars, the oracle.
* `unzip_device_batch` — a vmapped jit while_loop over the DEVICE-resident
  trellis, returning only the (state, size) step arrays (~KBs) instead of
  shipping the (L, K) trellis to the host (megabytes per survivor over a
  slow host link).  Long-window survivors make the trellis transfer the
  dominant phase-2 cost; tracing on device removes it.  A bounded step
  buffer guards the walk; overflow falls back to the host walk.
"""

from __future__ import annotations

import functools

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


# ---------------------------------------------------------------------------
# Device-side traceback: the identical walk as a jit while_loop.
# ---------------------------------------------------------------------------

_S, _N, _B, _E, _J, _C, _T = (st.STATE_S, st.STATE_N, st.STATE_B, st.STATE_E,
                              st.STATE_J, st.STATE_C, st.STATE_T)
_CLS_M, _CLS_I, _CLS_D, _CLS_X = (st.STATE_M >> 14, st.STATE_I >> 14,
                                  st.STATE_D >> 14, st.STATE_X >> 14)


def _unzip_one(xnodes, nodes, length, max_steps: int):
    """Walk T back to S on device; single trellis (vmapped by caller).

    Returns (states (max_steps,) i32, sizes (max_steps,) i32, nsteps i32,
    ok bool) with steps in REVERSE order (T first) excluding the final
    (S, 0) step; the caller reverses and prepends S exactly like the host
    `unzip`."""
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32

    def bits(v, off, width):
        return (v >> off) & ((1 << width) - 1)

    def step_fields(state, stage):
        """(size, prev_state) for one walk step (trellis.c:51-113)."""
        x = xnodes[stage].astype(i32)
        cls = (state >> 14) & 3
        idx = (state & 0x3FFF) - 1  # 0-based node index for core states
        nd = nodes[stage, jnp.clip(idx, 0, nodes.shape[1] - 1)].astype(i32)

        # ---- emission size ----
        n_sz = bits(x, 0, 4) % 5 + 1
        c_sz = bits(x, 21, 4) % 5 + 1
        j_sz = bits(x, 26, 4) % 5 + 1
        m_sz = bits(nd, 0, 5) % 5 + 1
        i_sz = bits(nd, 6, 4) % 5 + 1
        size = jnp.where(
            cls == _CLS_M, m_sz,
            jnp.where(cls == _CLS_I, i_sz,
                      jnp.where(cls == _CLS_D, 0,
                                jnp.where(state == _N, n_sz,
                                          jnp.where(state == _C, c_sz,
                                                    jnp.where(state == _J,
                                                              j_sz, 0))))))

        # ---- previous state ----
        def mk(cls_bits, k):  # core id from 0-based node k
            return (cls_bits << 14) | (k + 1)

        # specials
        nv = bits(x, 0, 4)
        bv = bits(x, 4, 2)
        ev = bits(x, 6, 15)
        cv = bits(x, 21, 4)
        tv = bits(x, 25, 1)
        jv = bits(x, 26, 4)
        prev_n = jnp.where(nv // 5 == 0, _S, _N)
        prev_b = jnp.where(bv == 0, _S,
                           jnp.where(bv == 1, _N, jnp.where(bv == 2, _E, _J)))
        prev_e = jnp.where(ev % 2 == 0, mk(_CLS_M, ev // 2),
                           mk(_CLS_D, ev // 2))
        prev_c = jnp.where(cv // 5 == 0, _E, _C)
        prev_t = jnp.where(tv == 0, _E, _C)
        prev_j = jnp.where(jv // 5 == 0, _E, _J)
        prev_x = jnp.where(
            state == _N, prev_n,
            jnp.where(state == _B, prev_b,
                      jnp.where(state == _E, prev_e,
                                jnp.where(state == _C, prev_c,
                                          jnp.where(state == _T, prev_t,
                                                    jnp.where(state == _J,
                                                              prev_j, _S))))))
        # core
        mv = bits(nd, 0, 5)
        m_choice = mv // 5  # 0 B, 1 M, 2 I, 3 D
        prev_m = jnp.where(
            m_choice == 0, _B,
            jnp.where(m_choice == 1, mk(_CLS_M, idx - 1),
                      jnp.where(m_choice == 2, mk(_CLS_I, idx - 1),
                                mk(_CLS_D, idx - 1))))
        dv = bits(nd, 5, 1)
        prev_d = jnp.where(dv == 0, mk(_CLS_M, idx - 1), mk(_CLS_D, idx - 1))
        iv = bits(nd, 6, 4)
        prev_i = jnp.where(iv // 5 == 0, mk(_CLS_M, idx), mk(_CLS_I, idx))
        prev = jnp.where(
            cls == _CLS_M, prev_m,
            jnp.where(cls == _CLS_D, prev_d,
                      jnp.where(cls == _CLS_I, prev_i, prev_x)))
        return size, prev

    def cond(c):
        state, stage, n, _, _, alive = c
        return alive

    def body(c):
        state, stage, n, sts, szs, alive = c
        size, prev = step_fields(state, stage)
        sts = sts.at[n].set(state)
        szs = szs.at[n].set(size)
        stage2 = stage - size
        n2 = n + 1
        done = jnp.logical_and(prev == _S, stage2 == 0)
        bad = jnp.logical_or(stage2 < 0, n2 >= max_steps)
        alive = jnp.logical_not(jnp.logical_or(done, bad))
        return (prev, stage2, n2, sts, szs, alive)

    import jax.lax as lax

    sts0 = jnp.zeros((max_steps,), i32)
    szs0 = jnp.zeros((max_steps,), i32)
    state0 = jnp.asarray(_T, i32)
    # pad lanes (length 0) exit immediately — a vmapped while_loop runs
    # until EVERY lane is done, so a spinning pad lane would cost the
    # full step bound
    carry = (state0, length.astype(i32), jnp.asarray(0, i32), sts0, szs0,
             length > 0)
    state, stage, n, sts, szs, _ = lax.while_loop(cond, body, carry)
    ok = jnp.logical_and(state == _S, stage == 0)
    return sts, szs, n, ok


@functools.partial(
    __import__("jax").jit, static_argnames=("max_steps",))
def _unzip_batch_jit(xnodes, nodes, lengths, *, max_steps):
    import jax
    import jax.numpy as jnp

    sts, szs, n, ok = jax.vmap(
        lambda x, nd, ln: _unzip_one(x, nd, ln, max_steps))(
            xnodes, nodes, lengths)
    # narrow on device before the host fetch: state ids are 16-bit by
    # construction (c-core/state.h:9-25) and sizes are 0..5, and the
    # step arrays cross a ~40 MB/s host link in the survivor-heavy path
    return sts.astype(jnp.uint16), szs.astype(jnp.int8), n, ok


def unzip_device_batch(xnodes, nodes, lengths, K: int):
    """Device traceback for a survivor batch; same result as `unzip`.

    xnodes (B, L+1) u32 / nodes (B, L+1, K) u16 DEVICE arrays; lengths
    (B,) i32.  Returns a list of [(state, size), ...] paths.  Entries
    whose bounded walk overflowed (pathological paths longer than
    L + 4K + 64 steps) fall back to the host walk for exactness.
    """
    import jax.numpy as jnp

    Lpad = int(xnodes.shape[1]) - 1
    max_steps = Lpad + 4 * K + 64
    sts, szs, ns, oks = _unzip_batch_jit(
        xnodes, nodes, jnp.asarray(lengths, jnp.int32),
        max_steps=max_steps)
    import jax

    sts, szs, ns, oks = jax.device_get([sts, szs, ns, oks])
    paths = []
    for b in range(len(ns)):
        if not bool(oks[b]):
            # exactness fallback: host walk over the fetched trellis
            paths.append(unzip(np.asarray(xnodes[b]), np.asarray(nodes[b]),
                               int(lengths[b]), K))
            continue
        n = int(ns[b])
        path = [(int(sts[b, i]), int(szs[b, i]))
                for i in range(n - 1, -1, -1)]
        paths.append([(st.STATE_S, 0)] + path)
    return paths


def assemble_path_entries(entries, fetched, out: dict) -> None:
    """Assemble fetched path entries into {id(item) -> (sids, sizes)}.

    `entries` come from the scorers' paths_group_dispatch (and the
    pipeline's lax.scan fallback): (items, sts, szs, ns, oks, xn, nd,
    lengths, K) — `fetched` holds the host copies of (sts, szs, ns, oks)
    per entry, transferred by the caller in ONE batched device_get for
    the whole wave (per-scorer fetches each pay a host-link round trip).
    Entries whose bounded device walk overflowed fall back to the exact
    host walk over their (still device-resident) trellis selections.
    """
    for i, e in enumerate(entries):
        items, _, _, _, _, xn, nd, lengths, K = e
        sts, szs, ns, oks = fetched[4 * i:4 * i + 4]
        for b, it in enumerate(items):
            if not bool(oks[b]):
                out[id(it)] = path_arrays(unzip(
                    np.asarray(xn[b]).astype(np.uint32),
                    np.asarray(nd[b]).astype(np.uint16),
                    int(lengths[b]), K))
                continue
            # paths stay ARRAYS end to end (per-step Python tuple
            # building was a measured survivor-heavy host cost): the
            # walk emits T..S order, so reverse and prepend S
            n = int(ns[b])
            sid = np.empty(n + 1, np.int64)
            sz = np.empty(n + 1, np.int64)
            sid[0], sz[0] = st.STATE_S, 0
            sid[1:] = sts[b, n - 1::-1]
            sz[1:] = szs[b, n - 1::-1]
            out[id(it)] = (sid, sz)


def path_arrays(steps):
    """(state, size) step list -> (sids (n,) int64, sizes (n,) int64).

    The scan pipeline consumes paths as arrays (per-step Python tuples
    were a measured survivor-heavy host cost); this adapts the host
    unzip fallback's list form."""
    a = np.asarray(steps, np.int64).reshape(-1, 2)
    return np.ascontiguousarray(a[:, 0]), np.ascontiguousarray(a[:, 1])
