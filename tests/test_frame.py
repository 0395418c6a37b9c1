"""Frame emission model: exact normalization and limiting-case identities."""

import numpy as np
import pytest

from deciphon_tpu import frame


def random_codon_lprobs(seed, batch=()):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=batch + (4, 4, 4))
    lse = np.log(np.sum(np.exp(logits), axis=(-1, -2, -3), keepdims=True))
    return logits - lse


@pytest.mark.parametrize("eps", [0.0, 0.01, 0.1, 0.5, 0.9])
def test_emission_normalized(eps):
    lp = random_codon_lprobs(7, batch=(4,))
    tbl = frame.emission_table(lp, eps)
    assert tbl.shape == (4, frame.TABLE_SIZE)
    totals = np.sum(np.exp(tbl), axis=-1)
    np.testing.assert_allclose(totals, 1.0, rtol=1e-12)


def test_eps_zero_degenerates_to_codons():
    lp = random_codon_lprobs(3)
    tbl = frame.emission_table(lp, 0.0)
    np.testing.assert_allclose(tbl[20:84].reshape(4, 4, 4), lp, rtol=1e-12)
    assert np.all(np.isinf(tbl[:20])) and np.all(np.isinf(tbl[84:]))


def test_length_block_mass_binomial():
    # P(len=t) depends only on eps: d,i ~ Bin(2, eps), t = 3 - d + i.
    eps = 0.2
    lp = random_codon_lprobs(11)
    tbl = frame.emission_table(lp, eps)

    def bin2(k):
        if k == 0:
            return (1 - eps) ** 2
        if k == 1:
            return 2 * eps * (1 - eps)
        return eps**2

    expected = {t: 0.0 for t in range(1, 6)}
    for d in range(3):
        for i in range(3):
            expected[3 - d + i] += bin2(d) * bin2(i)
    bounds = list(frame.FRAG_OFFSETS) + [frame.TABLE_SIZE]
    for t in range(1, 6):
        mass = np.sum(np.exp(tbl[bounds[t - 1] : bounds[t]]))
        np.testing.assert_allclose(mass, expected[t], rtol=1e-10)


def test_nuclt_marginals_normalized():
    lp = random_codon_lprobs(5, batch=(3,))
    q = frame.nuclt_marginal_lprobs(lp)
    np.testing.assert_allclose(np.sum(np.exp(q), -1), 1.0, rtol=1e-12)


def test_conditional_normalized_per_codon():
    lp = random_codon_lprobs(9)
    q = frame.nuclt_marginal_lprobs(lp)
    cond = frame.conditional_emission_table(0.15, q)
    assert cond.shape == (64, frame.TABLE_SIZE)
    np.testing.assert_allclose(np.sum(np.exp(cond), -1), 1.0, rtol=1e-10)


def test_marginal_equals_codon_mixture_of_conditionals():
    # p(F) = sum_z p(z) p(F|z): the marginal table must equal the
    # codon-probability mixture of the conditional tables.
    lp = random_codon_lprobs(13)
    eps = 0.1
    q = frame.nuclt_marginal_lprobs(lp)
    tbl = frame.emission_table(lp, eps, nuclt_lprobs=q)
    cond = frame.conditional_emission_table(eps, q)
    mix = np.log(np.exp(lp.reshape(64, 1) + cond).sum(axis=0))
    np.testing.assert_allclose(tbl, mix, rtol=1e-9, atol=1e-12)


def test_frag_code_roundtrip():
    for code in range(frame.TABLE_SIZE):
        syms = frame.frag_symbols(code)
        assert frame.frag_code(syms) == code
        assert frame.frag_len(code) == len(syms)


def test_emission_gemm_matches_term_enumeration():
    """The one-GEMM fast path must reproduce the explicit enumeration."""
    import numpy as np

    from deciphon_tpu import frame

    rng = np.random.default_rng(11)
    x = rng.random((5, 64))
    x = np.log(x / x.sum(axis=1, keepdims=True)).reshape(5, 4, 4, 4)
    for eps in (0.0, 0.01, 0.25):
        fast = frame.emission_table(x, eps)
        slow = frame.emission_table_terms(x, eps)
        np.testing.assert_allclose(fast, slow, rtol=1e-10, atol=1e-12)
