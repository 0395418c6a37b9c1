"""Stacked-engine padding invariance + multi-chip sharding on a CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deciphon_tpu.ops.costs import build_costs
from deciphon_tpu.ops.engine import ProfilePack, scan_scores_jit
from deciphon_tpu.ops.viterbi_jax import viterbi, viterbi_null
from deciphon_tpu.profile import sample_profile
from deciphon_tpu.scan.sequence import frag_codes_ending
from deciphon_tpu.xtrans import XT_RR, xtrans_cost_vector


def make_workload(seeds, Ks, B=3, L=40):
    costs = [build_costs(sample_profile(s, k)) for s, k in zip(seeds, Ks)]
    rng = np.random.default_rng(42)
    codes = np.zeros((B, L, 5), np.int32)
    xt = np.zeros((B, 13), np.float32)
    lengths = np.zeros((B,), np.int32)
    seqs = []
    for b in range(B):
        n = L - 3 * b  # varied lengths exercise the length masking
        seq = rng.integers(0, 4, size=n).astype(np.int8)
        seqs.append(seq)
        codes[b, :n] = frag_codes_ending(seq)
        xt[b] = xtrans_cost_vector(True, False, n)
        lengths[b] = n
    return costs, xt, codes, lengths, seqs


def test_pack_padding_matches_unpadded():
    costs, xt, codes, lengths, _ = make_workload([1, 2, 3], [5, 9, 7])
    pack = ProfilePack.from_costs(costs, K_pad=16, lane_multiple=1)
    nul, alt = scan_scores_jit(
        jnp.asarray(pack.core), jnp.asarray(pack.match),
        jnp.asarray(pack.null), jnp.asarray(pack.background),
        jnp.asarray(xt), jnp.asarray(codes), jnp.asarray(lengths))
    nul, alt = np.asarray(nul), np.asarray(alt)

    for p, c in enumerate(costs):
        for b in range(codes.shape[0]):
            a1 = viterbi(jnp.asarray(c.core), jnp.asarray(c.match),
                         jnp.asarray(c.null), jnp.asarray(c.background),
                         jnp.asarray(xt[b]), jnp.asarray(codes[b]),
                         jnp.int32(lengths[b]))
            n1 = viterbi_null(jnp.asarray(c.null), jnp.float32(xt[b][XT_RR]),
                              jnp.asarray(codes[b]), jnp.int32(lengths[b]))
            np.testing.assert_allclose(alt[p, b], float(a1), rtol=1e-6)
            np.testing.assert_allclose(nul[p, b], float(n1), rtol=1e-6)


def test_dryrun_multichip_8_devices():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    nul, alt = [np.asarray(o) for o in out]
    assert np.isfinite(nul).all() and np.isfinite(alt).all()


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4])
def test_dryrun_various_device_counts(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)
