"""HMMER layer: native Forward scorer vs brute force, wire client, daemon."""

import math

import numpy as np
import pytest

from deciphon_tpu.hmmer.client import HMMERClient
from deciphon_tpu.hmmer.daemon import FakeHMMERDaemon
from deciphon_tpu.hmmer.forward import (AminoForwardScorer, LN2,
                                        NativeConfirmer)
from deciphon_tpu.hmmer.h3result import H3Domain, H3Result
from deciphon_tpu.hmmfile import HMMProfile, NUM_AMINO, read_hmm
from deciphon_tpu.profile import NULL_AMINO_LPROBS
from deciphon_tpu.xtrans import xtrans_setup

MINIFAM = "/root/reference/c-core/minifam.hmm"


def tiny_hmm(seed: int, K: int) -> HMMProfile:
    rng = np.random.default_rng(seed)

    def lprobs(n):
        p = rng.random(n)
        return np.log(p / p.sum())

    match = np.stack([lprobs(NUM_AMINO) for _ in range(K)])
    trans = np.stack([lprobs(7) for _ in range(K + 1)])
    hmm = HMMProfile(name=f"t{seed}", accession=f"T{seed}", length=K,
                     consensus="-" * K,
                     match_lprobs=match.astype(np.float32),
                     trans=trans.astype(np.float32))
    hmm.stats["FORWARD"] = (-5.0, 0.7)
    return hmm


def brute_forward_bits(hmm: HMMProfile, seq_idx: list[int]) -> float:
    """Sum over all paths of the local multihit model, log-space, f64."""
    K, L = hmm.length, len(seq_idx)
    t = hmm.trans.astype(np.float64)
    em = hmm.match_lprobs.astype(np.float64) - NULL_AMINO_LPROBS[None, :]
    x = xtrans_setup(True, False, L)
    tbm = np.log(2.0 * (K - np.arange(K)) / (K * (K + 1.0)))

    from deciphon_tpu.hmmfile import T_DD, T_DM, T_II, T_IM, T_MD, T_MI, T_MM

    def lse(vals):
        vals = [v for v in vals if v > -1e29]
        if not vals:
            return -np.inf
        m = max(vals)
        return m + math.log(sum(math.exp(v - m) for v in vals))

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def rest(state, k, pos):
        """log sum of path weights from (state at pos) to T at L.

        Emit-on-loop state machine: N/J/C emit one residue (odds 0) per
        self-loop; E->J, E->C, E->B-ish hops and M/D->E exits are mute.
        """
        if state == "T":
            return 0.0 if pos == L else -np.inf
        out = []
        if state == "N":
            out.append(x.NB + rest("B", -1, pos))
            if pos < L:
                out.append(x.NN + rest("N", -1, pos + 1))
        elif state == "B":
            if pos < L:
                for kk in range(K):
                    out.append(tbm[kk] + em[kk, seq_idx[pos]]
                               + rest("M", kk, pos + 1))
        elif state == "M":
            if k + 1 < K and pos < L:
                out.append(t[k + 1, T_MM] + em[k + 1, seq_idx[pos]]
                           + rest("M", k + 1, pos + 1))
            if k + 1 < K:
                out.append(t[k + 1, T_MD] + rest("D", k + 1, pos))
            if pos < L:
                out.append(t[k + 1, T_MI] + rest("I", k, pos + 1))
            out.append(rest("E", -1, pos))  # free local exit
        elif state == "I":
            if k + 1 < K and pos < L:
                out.append(t[k + 1, T_IM] + em[k + 1, seq_idx[pos]]
                           + rest("M", k + 1, pos + 1))
            if pos < L:
                out.append(t[k + 1, T_II] + rest("I", k, pos + 1))
        elif state == "D":
            if k + 1 < K and pos < L:
                out.append(t[k + 1, T_DM] + em[k + 1, seq_idx[pos]]
                           + rest("M", k + 1, pos + 1))
            if k + 1 < K:
                out.append(t[k + 1, T_DD] + rest("D", k + 1, pos))
            out.append(rest("E", -1, pos))  # free local exit
        elif state == "E":
            out.append(x.EJ + rest("J", -1, pos))
            out.append(x.EC + rest("C", -1, pos))
        elif state == "J":
            out.append(x.JB + rest("B", -1, pos))
            if pos < L:
                out.append(x.JJ + rest("J", -1, pos + 1))
        elif state == "C":
            out.append(x.CT + rest("T", -1, pos))
            if pos < L:
                out.append(x.CC + rest("C", -1, pos + 1))
        return lse(out)

    fwd = rest("N", -1, 0)  # S->N is free
    null_len = L * math.log(L / (L + 1.0)) + math.log(1.0 / (L + 1.0))
    # same hmmpgmd score-convention correction as bit_score (forward.py)
    return (fwd - math.log(L) - null_len) / LN2


@pytest.mark.parametrize("seed,K,L", [(1, 2, 4), (2, 3, 5), (3, 2, 6)])
def test_forward_matches_bruteforce(seed, K, L):
    hmm = tiny_hmm(seed, K)
    rng = np.random.default_rng(seed + 50)
    seq_idx = rng.integers(0, NUM_AMINO, size=L).tolist()
    amino = "".join("ACDEFGHIKLMNPQRSTVWY"[i] for i in seq_idx)

    scorer = AminoForwardScorer([hmm])
    got = scorer.bit_score(0, amino)
    expected = brute_forward_bits(hmm, seq_idx)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_minifam_consensus_scores_high():
    hmms = read_hmm(MINIFAM)
    scorer = AminoForwardScorer(hmms)
    # Translate the Homoserine_dh consensus back to its own aminos via the
    # profile consensus annotation.
    for idx, hmm in enumerate(hmms):
        score = scorer.bit_score(idx, hmm.consensus.upper())
        assert score > 50.0, (hmm.name, score)
        other = (idx + 1) % len(hmms)
        cross = scorer.bit_score(other, hmm.consensus.upper())
        assert cross < score


def test_posterior_usages_sum_to_sequence_length():
    """Every residue is emitted by exactly one emitting state, so the
    posterior usages must total L; the posterior pass's forward score
    must equal the plain forward pass."""
    hmm = tiny_hmm(4, 3)
    scorer = AminoForwardScorer([hmm])
    amino = "ACDKLMNPWY"
    fwd, gM, gI, gNCJ = scorer.posterior_usages(0, amino)
    total = gM.sum() + gI + gNCJ
    np.testing.assert_allclose(total, len(amino), rtol=1e-4)
    plain_bits = scorer.bit_score(0, amino)
    L = len(amino)
    null_len = L * math.log(L / (L + 1.0)) + math.log(1.0 / (L + 1.0))
    # bit_score applies the hmmpgmd ln(L) convention (forward.py)
    np.testing.assert_allclose((fwd - math.log(L) - null_len) / LN2,
                               plain_bits, rtol=1e-4, atol=1e-3)


def test_null2_bias_penalizes_low_complexity():
    """HMMER3 null2 semantics: biased-composition sequences get a positive
    bias that lowers the bit score; the bias never goes negative
    (seqbias = logsum(0, log omega + correction) >= 0)."""
    hmms = read_hmm(MINIFAM)
    scorer = AminoForwardScorer(hmms)
    cons = hmms[0].consensus.upper()
    # low-complexity: the consensus' most common residue, repeated
    most = max(set(cons), key=cons.count)
    biased = most * len(cons)
    bias_biased = scorer.null2_bias_nats(0, biased)
    bias_cons = scorer.null2_bias_nats(0, cons)
    assert bias_biased >= 0.0 and bias_cons >= 0.0
    assert bias_biased > bias_cons + 1.0, (bias_biased, bias_cons)
    # corrected score drops for the biased sequence
    assert (scorer.bit_score(0, biased, null2=True)
            < scorer.bit_score(0, biased, null2=False) - 0.5)
    # ... but barely moves for the true consensus
    drop = (scorer.bit_score(0, cons, null2=False)
            - scorer.bit_score(0, cons, null2=True))
    assert 0.0 <= drop < 5.0, drop


def test_confirmer_matches_fixture_hmmpgmd_stats():
    """NativeConfirmer accuracy vs GENUINE hmmpgmd numbers: the reference
    fixture control/tests/files/snap.dcs embeds real h3r stats (bit
    score, lnP, Z=3) produced by a live hmmpgmd for the minifam
    consensus workload.  Our Forward scorer must reproduce the reported
    full-sequence bit score within 0.1 bits and log10 e-value within
    0.05 — including the null2 bias (ref dombias matched to <=0.05
    bits) and the ln(L) score-convention correction (forward.py
    bit_score)."""
    from deciphon_tpu.snap.snap_file import read_snap

    hmms = read_hmm(MINIFAM)
    scorer = AminoForwardScorer(hmms)
    snap = read_snap("/root/reference/control/tests/files/snap.dcs")
    name2idx = {h.accession: i for i, h in enumerate(hmms)}
    assert len(snap.products) == 3
    for p in snap.products:
        h3r = H3Result.from_blob(p.h3result_blob)
        hit = h3r.hits[0]
        aminos = "".join(m.amino for m in p.match_list if m.amino)
        i = name2idx[p.profile]
        score, logE = scorer.evalue(i, aminos, Z=h3r.Z, null2=True)
        assert abs(score - hit.score) <= 0.1, (p.profile, score, hit.score)
        ref_logE = h3r.hit_logevalue(0)
        assert abs(logE - ref_logE) / math.log(10) <= 0.05, (
            p.profile, logE, ref_logE)
        # null2 bias in isolation tracks the reference's reported bias
        raw, _ = scorer.evalue(i, aminos, Z=h3r.Z, null2=False)
        ref_bias = hit.pre_score - hit.score
        assert abs((raw - score) - ref_bias) <= 0.1, p.profile


def test_native_confirmer_policy():
    hmms = read_hmm(MINIFAM)
    conf = NativeConfirmer(hmms)
    logeval, blob = conf.confirm(0, hmms[0].consensus.upper())
    assert logeval < 0
    assert blob is not None
    h3r = H3Result.from_blob(blob)
    assert h3r.nhits == 1
    assert h3r.hits[0].acc == hmms[0].accession
    # junk sequence is rejected
    logeval, blob = conf.confirm(0, "AAAA")
    assert logeval == 0.0 and blob is None


def test_fake_daemon_roundtrip():
    canned = H3Result.single_hit(
        name="prof", acc="PF000", score=42.0, lnP=-30.0, Z=3.0,
        qlen=10, seqlen=20,
        domains=[H3Domain(ienv=1, jenv=20, bitscore=41.0)])

    def responder(hmmidx, seq):
        assert hmmidx == 2
        assert seq == "MAGIC"
        return canned

    with FakeHMMERDaemon(responder) as daemon:
        client = HMMERClient("127.0.0.1", daemon.port, num_proteins=3,
                             has_ga=False, warmup=False)
        with client:
            res = client.get(2, "MAGIC")
            assert res.nhits == 1
            assert res.hits[0].score == 42.0
            assert res.hits[0].domains[0].env_stop == 20
            logeval, blob = client.confirm(2, "MAGIC")
            assert logeval == pytest.approx(-30.0 + math.log(3.0))
            assert H3Result.from_blob(blob).hits[0].acc == "PF000"


@pytest.mark.skipif(__import__("shutil").which("hmmpgmd") is None,
                    reason="HMMER3 binaries not installed")
def test_live_hmmpgmd_end_to_end(tmp_path):
    """Gated real-daemon path (c-core/hmmer.c + worker/hmmer.py:15-36):
    boot a genuine hmmpgmd over minifam and confirm a consensus amino
    query — the client wire protocol, h3r parsing, and e-value flow
    against the real server.  Runs only where HMMER3 is installed."""
    import socket

    from deciphon_tpu.hmmer.daemon import launch_hmmpgmd
    from deciphon_tpu.snap.snap_file import read_snap

    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = launch_hmmpgmd(MINIFAM, port)
    try:
        hmms = read_hmm(MINIFAM)
        snap = read_snap("/root/reference/control/tests/files/snap.dcs")
        p = snap.products[0]
        aminos = "".join(m.amino for m in p.match_list if m.amino)
        idx = next(i for i, h in enumerate(hmms)
                   if h.accession == p.profile)
        client = HMMERClient("127.0.0.1", port, num_proteins=len(hmms),
                             has_ga=all(h.has_ga for h in hmms))
        with client:
            res = client.get(idx, aminos)
            assert res.nhits >= 1
            ref = H3Result.from_blob(p.h3result_blob)
            # same workload the fixture's hmmpgmd saw: scores agree
            assert abs(res.hits[0].score - ref.hits[0].score) < 0.5
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_fake_daemon_error_status():
    def responder(hmmidx, seq):
        raise ValueError("boom")

    with FakeHMMERDaemon(responder) as daemon:
        from deciphon_tpu.hmmer.client import HMMERError

        client = HMMERClient("127.0.0.1", daemon.port, num_proteins=1,
                             has_ga=True, warmup=False)
        with client:
            with pytest.raises(HMMERError, match="boom"):
                client.get(0, "SEQ")
