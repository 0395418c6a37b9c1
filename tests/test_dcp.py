"""Press -> .dcp -> reload round-trip on the bundled reference minifam.hmm."""

import numpy as np
import pytest

from deciphon_tpu.hmmfile import read_hmm
from deciphon_tpu.io.dcp import DcpReader, read_dcp_profiles
from deciphon_tpu.press import press
from deciphon_tpu.profile import press_profile

MINIFAM = "/root/reference/c-core/minifam.hmm"


@pytest.fixture(scope="module")
def minifam_dcp(tmp_path_factory):
    out = tmp_path_factory.mktemp("dcp") / "minifam.dcp"
    seen = []
    press(MINIFAM, str(out), gencode_id=1, epsilon=0.01,
          progress=lambda d, t: seen.append((d, t)))
    assert seen[-1] == (3, 3)
    return str(out)


def test_press_writes_three_profiles(minifam_dcp):
    with DcpReader(minifam_dcp) as r:
        assert r.num_proteins == 3
        assert r.header.epsilon == pytest.approx(0.01)
        assert r.header.entry_dist == 2  # occupancy
        assert r.header.abc == "ACGT"
        assert r.header.amino == "ACDEFGHIKLMNPQRSTVWY"
        assert r.header.has_ga  # minifam profiles all carry GA
        assert len(r.header.protein_sizes) == 3


def test_roundtrip_matches_fresh_press(minifam_dcp):
    header, profiles = read_dcp_profiles(minifam_dcp)
    hmms = read_hmm(MINIFAM)
    assert [p.accession for p in profiles] == [h.accession for h in hmms]
    for disk, hmm in zip(profiles, hmms):
        fresh = press_profile(hmm, 1, 0.01)
        assert disk.core_size == fresh.core_size
        assert disk.consensus == fresh.consensus
        np.testing.assert_array_equal(disk.trans, fresh.trans)
        np.testing.assert_array_equal(disk.BMk, fresh.BMk)
        np.testing.assert_array_equal(disk.match_emission,
                                      fresh.match_emission)
        np.testing.assert_array_equal(disk.null_emission,
                                      fresh.null_emission)
        np.testing.assert_array_equal(disk.bg_emission, fresh.bg_emission)
        # codon cubes go through the (5,5,5) marginal form on disk
        np.testing.assert_allclose(disk.match_codon_lprobs,
                                   fresh.match_codon_lprobs, atol=1e-6)


def test_random_access_matches_sequential(minifam_dcp):
    with DcpReader(minifam_dcp) as r:
        last = r.read_profile(r.num_proteins - 1)
        first = r.read_profile(0)
        seq = list(r)
    assert first.accession == seq[0].accession
    assert last.accession == seq[-1].accession
    np.testing.assert_array_equal(last.match_emission,
                                  seq[-1].match_emission)


def test_minifam_profiles_sane(minifam_dcp):
    _, profiles = read_dcp_profiles(minifam_dcp)
    for p in profiles:
        # emission tables are log-probs: logsumexp over each duration class
        # sums to 1 overall
        total = np.logaddexp.reduce(
            p.match_emission[0].astype(np.float64))
        assert total == pytest.approx(0.0, abs=1e-4)
        assert np.all(p.BMk <= 0.0)
