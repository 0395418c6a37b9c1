"""Native amino-Forward scoring + e-values: the daemon-free confirmer.

The reference delegates hit confirmation to an external HMMER3 hmmpgmd
daemon over TCP (c-core/hmmer.c; SURVEY.md §C13).  This module provides a
native alternative: the HMMER3 local multihit Forward algorithm on the
amino profile, scored on device-friendly array math, with e-values from
the profile's own STATS LOCAL FORWARD calibration line (exponential tail:
P = exp(-lambda * (S - tau)), E = Z * P).

Differences vs a live hmmpgmd (documented, affecting e-values slightly):
the null2 biased-composition correction and domain postprocessing are not
applied, and the amino background is the Swiss-Prot frequency set the
reference's press stage uses (c-core/hmm_reader.c:79-103).  The wire
client (hmmer/client.py) remains available for exact-parity confirmation
against a real daemon.

Model configuration follows HMMER3 local multihit search mode:
  * entry  B->M_k  = 2 (M - k + 1) / (M (M + 1))   (uniform fragments)
  * exits  M_k->E = D_k->E = 1                      (local, score 0)
  * specials N/C/J loop with the length model L/(L+3), which is exactly
    the reference's xtrans algnull wiring with multi_hits=True
    (c-core/xtrans.c:21-51; deciphon_tpu.xtrans.xtrans_setup)
  * N/C/J/I emissions at background odds (score 0)
  * bit score S = (forward_nats - null_length_nats) / ln 2 with
    null_length = L log(L/(L+1)) + log(1/(L+1)).
"""

from __future__ import annotations

import functools
import math

import numpy as np

from ..hmmfile import (HMMProfile, NUM_AMINO, T_DD, T_DM, T_II, T_IM, T_MD,
                       T_MI, T_MM)
from ..alphabet import AMINO_INDEX
from ..profile import NULL_AMINO_LPROBS
from ..xtrans import xtrans_setup

LN2 = math.log(2.0)
_NEG = -1e30  # -inf stand-in that survives arithmetic


def _pad_pow2(n: int, minimum: int = 16) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


@functools.lru_cache(maxsize=8)
def _jit_forward(Kpad: int, Lpad: int):
    import jax
    import jax.numpy as jnp

    def forward(ems, tmm, tim, tdm, tmi, tii, tmd, tdd, tbm, seq_valid,
                xNN, xNB, xEJc, xJJ, xJB, xEB, xECc, xCC, xET, xCT):
        """ems: (Lpad, Kpad) match odds scores for each position; padded
        rows/cols hold _NEG.  Returns forward odds score in nats.

        Special-state wiring uses precombined mute hops exactly like the
        Viterbi engine (c-core/xtrans.c:53-68): xEJc = EJ+JJ (enter J from
        E and emit), xEB = EJ+JB (hop through J without emitting),
        xECc = EC+CC, xET = EC+CT.
        """

        def lse(*xs):
            acc = xs[0]
            for x in xs[1:]:
                acc = jnp.logaddexp(acc, x)
            return acc

        def shift(x):  # out[k] = x[k-1]
            return jnp.concatenate([jnp.full((1,), _NEG), x[:-1]])

        def step(carry, inp):
            M, I, D, N, B, E, J, C = carry
            em, valid = inp

            Mrow = em + lse(
                shift(lse(M + tmm, I + tim, D + tdm)),
                B + tbm,
            )
            Irow = lse(M + tmi, I + tii)  # insert odds emission = 0
            # D chain along k: D_k = lse(M_{k-1}+tmd_k, D_{k-1}+tdd_k)
            A = shift(Mrow) + tmd
            S = jnp.cumsum(tdd)
            G = A - S
            P = jax.lax.associative_scan(jnp.logaddexp, G)
            Drow = P + S

            Erow = lse(
                jax.scipy.special.logsumexp(Mrow),
                jax.scipy.special.logsumexp(Drow))
            Nrow = N + xNN
            Jrow = lse(E + xEJc, J + xJJ)
            Crow = lse(E + xECc, C + xCC)
            Brow = lse(Nrow + xNB, Erow + xEB, Jrow + xJB)

            out = (Mrow, Irow, Drow, Nrow, Brow, Erow, Jrow, Crow)
            keep = lambda new, old: jnp.where(valid, new, old)
            carry = tuple(keep(n, o) for n, o in zip(out, carry))
            return carry, ()

        M0 = jnp.full((Kpad,), _NEG)
        N0 = jnp.float32(0.0)  # S->N = 1
        B0 = N0 + xNB
        carry0 = (M0, M0, M0, N0, B0, jnp.float32(_NEG), jnp.float32(_NEG),
                  jnp.float32(_NEG))
        carry, _ = jax.lax.scan(step, carry0, (ems, seq_valid))
        E_final, C_final = carry[5], carry[7]
        return jnp.logaddexp(E_final + xET, C_final + xCT)

    import jax

    return jax.jit(forward)


class AminoForwardScorer:
    """Forward bit scores for amino sequences vs HMMER3 profiles."""

    def __init__(self, hmms: list[HMMProfile],
                 null_lprobs: np.ndarray = NULL_AMINO_LPROBS):
        self.hmms = hmms
        self.null_lprobs = np.asarray(null_lprobs, dtype=np.float64)

    @functools.lru_cache(maxsize=None)
    def _profile_arrays(self, p_idx: int, Kpad: int):
        hmm = self.hmms[p_idx]
        K = hmm.length
        em = np.full((Kpad, NUM_AMINO + 1), _NEG, np.float32)
        em[:K, :NUM_AMINO] = (hmm.match_lprobs.astype(np.float64)
                              - self.null_lprobs[None, :])
        t = hmm.trans.astype(np.float64)

        def vec(col, src_shift):
            """Transition vector indexed by SOURCE node k (0-based col k =
            node k+1's incoming edge from node k)."""
            v = np.full((Kpad,), _NEG, np.float32)
            v[: K - 1] = t[1:K, col]
            return v

        tmm, tim, tdm = vec(T_MM, 1), vec(T_IM, 1), vec(T_DM, 1)
        # dest-indexed for I (same node) and D entry
        tmi = np.full((Kpad,), _NEG, np.float32)
        tmi[:K] = t[1 : K + 1, T_MI]
        tii = np.full((Kpad,), _NEG, np.float32)
        tii[:K] = t[1 : K + 1, T_II]
        tmd = np.full((Kpad,), _NEG, np.float32)
        tmd[1:K] = t[1:K, T_MD]
        tdd = np.zeros((Kpad,), np.float32)
        tdd[1:K] = np.maximum(t[1:K, T_DD], _NEG / Kpad)
        tdd[K:] = _NEG / Kpad
        # uniform-fragment local entry
        ks = np.arange(Kpad)
        tbm = np.where(
            ks < K,
            np.log(2.0 * np.maximum(K - ks, 1) / (K * (K + 1.0))),
            _NEG).astype(np.float32)
        return em, tmm, tim, tdm, tmi, tii, tmd, tdd, tbm

    def bit_score(self, p_idx: int, amino_seq: str) -> float:
        import jax.numpy as jnp

        hmm = self.hmms[p_idx]
        L = len(amino_seq)
        if L == 0:
            return -math.inf
        Kpad = _pad_pow2(hmm.length)
        Lpad = _pad_pow2(L)
        em, *tvecs = self._profile_arrays(p_idx, Kpad)

        idx = np.array([AMINO_INDEX.get(a, NUM_AMINO) for a in amino_seq],
                       np.int32)
        ems = np.full((Lpad, Kpad), _NEG, np.float32)
        ems[:L] = em[:, idx].T
        # degenerate residues (X etc.): background odds 0 at every node < K
        deg = idx >= NUM_AMINO
        if deg.any():
            ok = np.zeros((Kpad,), np.float32)
            ok[hmm.length:] = _NEG
            ems[:L][deg] = ok
        valid = np.zeros((Lpad,), bool)
        valid[:L] = True

        x = xtrans_setup(True, False, L)
        fwd = _jit_forward(Kpad, Lpad)(
            jnp.asarray(ems), *[jnp.asarray(v) for v in tvecs],
            jnp.asarray(valid),
            *[jnp.float32(v) for v in
              (x.NN, x.NB, x.EJ + x.JJ, x.JJ, x.JB, x.EJ + x.JB,
               x.EC + x.CC, x.CC, x.EC + x.CT, x.CT)])
        fwd_nats = float(fwd)
        null_len = L * math.log(L / (L + 1.0)) + math.log(1.0 / (L + 1.0))
        return (fwd_nats - null_len) / LN2

    def evalue(self, p_idx: int, amino_seq: str, Z: float = 1.0):
        """(bit_score, log_evalue) from the FORWARD calibration line."""
        s = self.bit_score(p_idx, amino_seq)
        stats = self.hmms[p_idx].stats.get("FORWARD")
        if stats is None:
            raise ValueError("profile lacks STATS LOCAL FORWARD calibration")
        tau, lam = stats
        # exponential tail in bits: P = exp(-lambda * (S - tau))
        ln_p = min(-lam * (s - tau), 0.0)
        return s, ln_p + math.log(Z)


class NativeConfirmer:
    """Drop-in `confirmer` for Scanner: native Forward e-values.

    Keep policy mirrors the reference flags (c-core/hmmer.c:86-92): with
    GA thresholds, keep when bit score >= GA sequence cutoff; otherwise
    keep when evalue <= cutoff with Z = num_proteins.  Returns
    (logevalue, h3r_blob); logevalue == 0 means "rejected" to the scan
    pipeline (thread.c:200).
    """

    def __init__(self, hmms: list[HMMProfile], num_proteins: int | None = None,
                 evalue_cutoff: float = 1e-10):
        self.scorer = AminoForwardScorer(hmms)
        self.hmms = hmms
        self.num_proteins = num_proteins or len(hmms)
        self.evalue_cutoff = evalue_cutoff

    def confirm(self, p_idx: int, amino_seq: str):
        from .h3result import H3Result

        hmm = self.hmms[p_idx]
        if hmm.has_ga:
            Z = 1.0
        else:
            Z = float(self.num_proteins)
        score, logevalue = self.scorer.evalue(p_idx, amino_seq, Z=Z)

        if hmm.has_ga:
            if score < hmm.ga[0]:
                return 0.0, None
        else:
            if logevalue > math.log(self.evalue_cutoff):
                return 0.0, None
        if logevalue >= 0.0:
            return 0.0, None

        h3r = H3Result.single_hit(
            name=hmm.name, acc=hmm.accession, score=score,
            lnP=logevalue - math.log(Z), Z=Z, qlen=hmm.length,
            seqlen=len(amino_seq))
        return logevalue, h3r.to_blob()
