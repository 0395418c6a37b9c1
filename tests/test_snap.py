"""Snap archive round-trip + match/hit/interval/GFF/FASTA views."""

import numpy as np
import pytest

from deciphon_tpu.intervals import PyInterval, RInterval
from deciphon_tpu.snap.match import Match, MatchList
from deciphon_tpu.snap.hit import QueryIntervalBuilder, hits_of
from deciphon_tpu.snap.snap_file import make_snap_archive, read_snap
from deciphon_tpu.snap.view import view_alignments

MATCH_RAW = (
    "CC,S,,;GCT,N,GCT,A;,B,,;ATG,M1,ATG,M;GGT,M2,GGT,G;AT,I2,ATA,I;"
    ",D3,,;,E,,;TAA,C,TAA,*;,T,,"
)


def test_intervals_roundtrip():
    py = PyInterval(start=3, stop=10)
    assert py.r == RInterval(start=4, stop=10)
    assert py.r.py == py
    assert py.slice == slice(3, 10)
    assert py.offset(5) == PyInterval(start=8, stop=15)
    with pytest.raises(Exception):
        PyInterval(start=5, stop=3)


def test_match_parsing():
    ml = MatchList.from_string(MATCH_RAW)
    assert len(ml) == 10
    assert ml[0].state == "S" and ml[0].is_mute
    m = ml[3]
    assert m.query == "ATG" and m.state == "M1" and m.amino == "M"
    assert m.is_match_state and m.is_core_state
    assert ml.amino == "AMGI*"
    assert ml.query == "CCGCTATGGGTATTAA"
    assert ml[5].is_insert_state and ml[6].is_delete_state


def test_hit_segmentation_and_intervals():
    ml = MatchList.from_string(MATCH_RAW)
    hits = hits_of(ml)
    assert len(hits) == 1
    h = hits[0]
    assert (h.match_interval.start, h.match_interval.stop) == (3, 7)
    qib = QueryIntervalBuilder(ml, offset=100)
    iv = qib.make(h.match_interval)
    # steps before the hit emit CC (2) + GCT (3) = 5 nt
    assert iv.start == 105
    # hit emits ATG + GGT + AT = 8 nt
    assert iv.stop == 113


@pytest.fixture(scope="module")
def snap_path(tmp_path_factory):
    import json
    import os

    from deciphon_tpu.io.dcp import read_dcp_profiles
    from deciphon_tpu.press import press
    from deciphon_tpu.scan.pipeline import ScanConfig, Scanner
    from deciphon_tpu.scan.sequence import Sequence

    here = os.path.dirname(__file__)
    tmp = tmp_path_factory.mktemp("snap")
    dcp = str(tmp / "minifam.dcp")
    press("/root/reference/c-core/minifam.hmm", dcp, 1, 0.01)
    _, profiles = read_dcp_profiles(dcp)
    with open(os.path.join(here, "data_consensus.json")) as fp:
        raw = json.load(fp)[:2]
    seqs = [Sequence.make(e["id"], e["name"], e["seq"]) for e in raw]
    basedir = str(tmp / "reads")
    os.makedirs(basedir)
    Scanner(profiles, ScanConfig(engine="jax")).run(seqs, basedir)
    return make_snap_archive(basedir, str(tmp / "reads.dcs"))


def test_snap_roundtrip(snap_path):
    snap = read_snap(snap_path)
    prods = snap.products
    assert len(prods) >= 2
    seq_ids = {p.seq_id for p in prods}
    assert {1, 2} <= seq_ids
    for p in prods:
        assert p.match_list.query  # non-empty
        assert p.window_interval.stop > p.window_interval.start
        hits = p.hits
        assert hits, "every product row spans at least one hit"
        for h in hits:
            assert h.interval.stop > h.interval.start
            assert h.interval.start >= p.window_interval.start


def test_snap_gff_and_fasta(snap_path):
    snap = read_snap(snap_path)
    gff = snap.products.gff_list().format()
    assert gff.startswith("##gff-version 3")
    assert "Profile=PF" in gff and "ID=1" in gff
    fasta = snap.products.fasta_list("amino").format()
    assert fasta.startswith(">1")
    view = view_alignments(snap.products)
    assert "state" in view and "amino" in view


def test_snap_str(snap_path):
    snap = read_snap(snap_path)
    s = str(snap)
    assert s.startswith("shape: (")


# ---------------------------------------------------------------------------
# HMMER-side views on the reference snap fixture
# (parity: snap/tests/test_align.py invariants + view.py side-by-side)
# ---------------------------------------------------------------------------

REFERENCE_SNAP = "/root/reference/control/tests/files/snap.dcs"


@pytest.fixture(scope="module")
def reference_products():
    from deciphon_tpu.snap.snap_file import read_snap
    return list(read_snap(REFERENCE_SNAP).products)


def test_h3result_attached(reference_products):
    for p in reference_products:
        h3r = p.h3result
        assert h3r is not None
        assert h3r.nhits == 1
        assert h3r.hits[0].acc == p.profile


def test_same_amino(reference_products):
    """Deciphon's decoded aminos == the HMMER alignment query, exactly
    (reference snap/tests/test_align.py:12-20)."""
    for p in reference_products:
        ad = p.h3result.hits[0].domains[0].ad
        hmmer_query = ad.aseq.replace("-", "")
        assert hmmer_query == p.amino
        assert ad.sqto - ad.sqfrom + 1 == len(p.amino)


def test_equal_hits(reference_products):
    """Hit count equals HMMER domain count; each domain's ali interval
    covers the same aminos (reference test_align.py:23-33)."""
    for p in reference_products:
        hits = p.hits
        doms = p.h3result.hits[0].domains
        assert len(hits) == len(doms)
        for hit, d in zip(hits, doms):
            amino_lo, amino_hi = d.iali - 1, d.jali  # 0-based half-open
            assert p.amino[amino_lo:amino_hi] == \
                d.ad.aseq.replace("-", "")


def test_side_by_side_view(reference_products):
    from deciphon_tpu.snap.view import view_alignment
    txt = view_alignment(reference_products[0])
    assert "PF00742.20" in txt
    assert "Homoserine_dh-consensus" in txt
    assert "CS" in txt and "PP" in txt
    # profile consensus and deciphon aminos appear aligned
    assert "Piistlkeslt" in txt
    assert "PIISTLKESLT" in txt


def test_domtbl_views(reference_products):
    p = reference_products[1]
    h3r = p.h3result
    dom_text = h3r.domains_table(query_name="000000001")
    tgt_text = h3r.targets_table(query_name="000000001")
    dom_rows = [l for l in dom_text.splitlines() if not l.startswith("#")]
    assert len(dom_rows) == len(h3r.hits[0].domains)
    assert p.profile in dom_text
    assert p.profile in tgt_text
