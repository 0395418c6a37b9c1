"""hmmpgmd binary wire codec: round-trip, fixture-value carriage, and
client/daemon end-to-end over the real framing."""

import zipfile

import pytest

from deciphon_tpu.hmmer.client import HMMERClient
from deciphon_tpu.hmmer.daemon import FakeHMMERDaemon
from deciphon_tpu.hmmer.h3result import H3Result
from deciphon_tpu.hmmer.wire import WireError, parse_reply, serialize_reply

SNAP = "/root/reference/control/tests/files/snap.dcs"
# The OLDER fixture generation (snap/tests/files, pre-dating the current
# xtrans amino-length convention — docs/lrt_version_skew.md): its .h3r
# blobs were written by a different HMMER/h3result revision, so pushing
# them through the binary wire codec pins the layout across generations.
SNAP_OLD = "/root/reference/snap/tests/files/consensus.dcs"


def _load_h3rs(path):
    with zipfile.ZipFile(path) as z:
        return [H3Result.from_blob(z.read(n))
                for n in sorted(z.namelist()) if n.endswith(".h3r")]


@pytest.fixture(scope="module")
def fixture_results():
    return _load_h3rs(SNAP)


@pytest.mark.parametrize("path", [SNAP, SNAP_OLD])
def test_wire_roundtrip_of_reference_values(path):
    """Serialize a reference-produced result onto the wire and parse it
    back: every field the .h3r stores must survive — for BOTH shipped
    fixture generations (layout skew between revisions would surface
    here, not in production)."""
    results = _load_h3rs(path)
    assert results, f"no .h3r blobs found in {path}"
    for r in results:
        back = parse_reply(serialize_reply(r))
        assert back.stats.Z == r.stats.Z
        assert back.stats.nhits == len(r.hits)
        for h0, h1 in zip(r.hits, back.hits):
            assert (h1.name, h1.acc, h1.desc) == (h0.name, h0.acc, h0.desc)
            assert h1.score == pytest.approx(h0.score)
            assert h1.lnP == h0.lnP
            assert h1.nexpected == pytest.approx(h0.nexpected)
            assert h1.flags == h0.flags
            assert len(h1.domains) == len(h0.domains)
            for d0, d1 in zip(h0.domains, h1.domains):
                assert (d1.ienv, d1.jenv, d1.iali, d1.jali) == \
                    (d0.ienv, d0.jenv, d0.iali, d0.jali)
                assert d1.bitscore == pytest.approx(d0.bitscore)
                assert d1.lnP == d0.lnP
                assert d1.ad.to_wire() == d0.ad.to_wire()
        # and the re-packed .h3r blob is identical to the original
        assert back.to_blob() == r.to_blob()


def test_wire_empty_result():
    empty = H3Result()
    back = parse_reply(serialize_reply(empty))
    assert back.nhits == 0


def test_wire_truncated_raises():
    blob = serialize_reply(H3Result())
    with pytest.raises(WireError):
        parse_reply(blob[:-3])


def test_client_parses_wire_reply_end_to_end(fixture_results):
    """The fake daemon emits the real binary framing; the client's
    default parser decodes it — the production code path."""
    canned = fixture_results[0]

    def responder(hmmidx, seq):
        assert hmmidx == 5
        return canned

    with FakeHMMERDaemon(responder) as daemon:
        with HMMERClient("127.0.0.1", daemon.port, num_proteins=3,
                         has_ga=True, warmup=False) as client:
            res = client.get(5, "PIIST")
            assert res.nhits == 1
            assert res.hits[0].acc == canned.hits[0].acc
            assert res.hits[0].domains[0].ad.aseq == \
                canned.hits[0].domains[0].ad.aseq
            logeval, blob = client.confirm(5, "PIIST")
            assert logeval == pytest.approx(canned.hit_logevalue(0))
            # the stored blob is the reference .h3r serialization
            assert H3Result.from_blob(blob).hits[0].acc == \
                canned.hits[0].acc
