"""Real .h3r blob parity: parse + byte-exact re-pack of the
reference-produced fixtures, and the domtbl/targets views."""

import zipfile

import pytest

from deciphon_tpu.hmmer.h3result import H3AliDisplay, H3Domain, H3Result

SNAP = "/root/reference/control/tests/files/snap.dcs"


@pytest.fixture(scope="module")
def fixture_blobs():
    with zipfile.ZipFile(SNAP) as z:
        return {n.split("/")[-1]: z.read(n)
                for n in z.namelist() if n.endswith(".h3r")}


def test_parses_reference_blobs(fixture_blobs):
    r = H3Result.from_blob(fixture_blobs["PF00742.20.h3r"])
    assert r.stats.Z == 3.0
    assert r.stats.nhits == 1
    assert r.nhits == 1
    hit = r.hits[0]
    assert hit.acc == "PF00742.20"
    assert hit.desc == "Homoserine dehydrogenase"
    assert hit.score == pytest.approx(274.254, abs=1e-3)
    d = hit.domains[0]
    assert (d.ienv, d.jenv, d.iali, d.jali) == (1, 173, 1, 173)
    ad = d.ad
    assert ad.hmmfrom == 1 and ad.hmmto == 173 and ad.M == 173
    assert ad.sqname == "Homoserine_dh-consensus"
    assert ad.aseq == ad.model.upper()  # consensus read aligns exactly
    assert len(ad.aseq) == ad.N == 173


def test_roundtrip_byte_exact(fixture_blobs):
    """to_blob(from_blob(x)) == x for every reference blob: the f32/f64
    field split and container layout match the h3result C library."""
    for name, blob in fixture_blobs.items():
        r = H3Result.from_blob(blob)
        assert r.to_blob() == blob, name


def test_logevalue(fixture_blobs):
    r = H3Result.from_blob(fixture_blobs["PF00742.20.h3r"])
    # lnP ~ -197.2, Z = 3 -> logevalue ~ -196.1; evalue prints as 0
    assert r.hit_logevalue(0) == pytest.approx(-196.11, abs=0.01)


def test_domains_table_view(fixture_blobs):
    r = H3Result.from_blob(fixture_blobs["PF00696.29.h3r"])
    text = r.domains_table(query_name="000000001")
    lines = [l for l in text.splitlines() if not l.startswith("#")]
    assert len(lines) == len(r.hits[0].domains)
    cols = lines[0].split()
    assert cols[0] == r.hits[0].name
    assert cols[1] == "PF00696.29"
    # ali-coord columns present and 1-based
    d = r.hits[0].domains[0]
    assert str(d.iali) in cols and str(d.jali) in cols


def test_targets_table_view(fixture_blobs):
    r = H3Result.from_blob(fixture_blobs["PF16620.6.h3r"])
    text = r.targets_table(query_name="000000002")
    lines = [l for l in text.splitlines() if not l.startswith("#")]
    assert len(lines) == 1
    assert "PF16620.6" in lines[0]


def test_fresh_alidisplay_presence():
    ad = H3AliDisplay(
        presence=H3AliDisplay.presence_of(csline="x", ppline="p", aseq="A"),
        model="a", mline="a", aseq="A", csline="x", ppline="p")
    assert ad.presence == 28  # matches the reference fixture value


def test_back_compat_domain_aliases():
    d = H3Domain(ienv=2, jenv=9, iali=3, jali=8, bitscore=12.5,
                 ad=H3AliDisplay(hmmfrom=1, hmmto=6, aseq="ABC",
                                 model="abc", mline="+++"))
    assert d.env_start == 2 and d.env_stop == 9
    assert d.ali_start == 3 and d.ali_stop == 8
    assert d.hmm_start == 1 and d.hmm_stop == 6
    assert d.score == 12.5
    assert d.query_display == "ABC"
    assert d.model_display == "abc"
    assert d.match_display == "+++"
