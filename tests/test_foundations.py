"""Alphabets, genetic codes, HMMER3 parsing, fragment-code precompute."""

import numpy as np
import pytest

from deciphon_tpu import alphabet, gencode, hmmfile
from deciphon_tpu.scan.sequence import Sequence, frag_codes_ending

MINIFAM = "/root/reference/c-core/minifam.hmm"


def test_gencode_standard():
    gc = gencode.get_gencode(1)
    assert gc.decode(gencode.codon_index(0, 3, 2)) == "M"  # ATG
    assert gc.decode(gencode.codon_index(3, 0, 0)) == "*"  # TAA
    assert gc.decode(gencode.codon_index(3, 0, 2)) == "*"  # TAG
    assert gc.decode(gencode.codon_index(3, 2, 0)) == "*"  # TGA
    assert gc.decode(gencode.codon_index(3, 2, 2)) == "W"  # TGG
    assert gc.decode(gencode.codon_index(2, 2, 2)) == "G"  # GGG
    # 61 sense codons in the standard code
    assert sum(a != "*" for a in gc.aminos) == 61


def test_gencode_all_tables_load():
    for gid in gencode.GENCODE_IDS:
        gc = gencode.get_gencode(gid)
        assert len(gc.aminos) == 64
        assert 0 < sum(a != "*" for a in gc.aminos) <= 64


def test_gencode_vertebrate_mito():
    gc = gencode.get_gencode(2)
    assert gc.decode(gencode.codon_index(3, 2, 0)) == "W"  # TGA -> W
    assert gc.decode(gencode.codon_index(0, 2, 0)) == "*"  # AGA -> stop
    assert gc.decode(gencode.codon_index(0, 3, 0)) == "M"  # ATA -> M


def test_disambiguate():
    assert alphabet.disambiguate("acgt") == "ACGT"
    # counts: A=2 -> R (A or G) resolves to A
    assert alphabet.disambiguate("AARCT") == "AARCT".replace("R", "A")
    with pytest.raises(alphabet.MixedTUError):
        alphabet.disambiguate("ATU")
    # N resolves to most frequent of ACGT
    assert alphabet.disambiguate("GGGNAC") == "GGGGAC"


def test_encode():
    np.testing.assert_array_equal(
        alphabet.encode_dna("ACGTU"), np.array([0, 1, 2, 3, 3], dtype=np.int8)
    )
    with pytest.raises(alphabet.InvalidSequenceError):
        alphabet.encode_dna("ACGZ")


def test_minifam_parse():
    profs = hmmfile.read_hmm(MINIFAM)
    assert [p.name for p in profs] == ["Homoserine_dh", "AA_kinase", "23ISL"]
    assert [p.accession for p in profs] == [
        "PF00742.20", "PF00696.29", "PF16620.6"]
    assert [p.length for p in profs] == [173, 241, 162]
    assert hmmfile.count_profiles(MINIFAM) == 3
    p = profs[0]
    assert p.match_lprobs.shape == (173, 20)
    assert p.trans.shape == (174, 7)
    assert p.has_ga and p.ga == (22.9, 22.9)
    assert len(p.consensus) == 173
    # log-probs: all <= 0 (match scores are -file values)
    assert np.all(p.match_lprobs <= 0)
    # transition rows sum to <= 1-ish in prob space where finite
    finite = np.isfinite(p.trans)
    assert np.all(p.trans[finite] <= 1e-6)
    # MM+MI+MD ~ 1
    s = np.exp(p.trans[5, :3]).sum()
    np.testing.assert_allclose(s, 1.0, rtol=1e-4)
    # first node consensus letters parsed
    assert p.consensus[:3] == "Pii"


def test_frag_codes_ending():
    seq = np.array([0, 1, 2, 3, 0], dtype=np.int8)  # A C G T A
    codes = frag_codes_ending(seq)
    from deciphon_tpu.frame import frag_code

    # position l=1 (row 0): only t=1 valid: fragment 'A'
    assert codes[0, 0] == frag_code((0,))
    # l=3, t=2: fragment CG
    assert codes[2, 1] == frag_code((1, 2))
    # l=5, t=5: ACGTA
    assert codes[4, 4] == frag_code((0, 1, 2, 3, 0))
    # l=2, t=2: AC
    assert codes[1, 1] == frag_code((0, 1))


def test_sequence_make():
    s = Sequence.make(1, "s", "acgtACGT")
    assert s.size == 8
    assert s.codes.shape == (8, 5)
