"""Native C++ library: striped kernel parity, encode/frag, fletcher16."""

import numpy as np
import pytest

native = pytest.importorskip("deciphon_tpu.native")

try:
    native.load()
except Exception as exc:  # pragma: no cover
    pytest.skip(f"native library unavailable: {exc}", allow_module_level=True)

import jax.numpy as jnp

from deciphon_tpu.ops.costs import build_costs
from deciphon_tpu.ops.viterbi_jax import viterbi, viterbi_null
from deciphon_tpu.profile import sample_profile
from deciphon_tpu.scan.product import fletcher16 as py_fletcher16
from deciphon_tpu.scan.sequence import frag_codes_ending
from deciphon_tpu.xtrans import XT_RR, xtrans_cost_vector


@pytest.mark.parametrize("seed,K,L,mh,h3c", [
    (1, 5, 37, True, False),
    (2, 23, 64, False, False),
    (3, 40, 120, True, True),
])
def test_native_viterbi_matches_jax(seed, K, L, mh, h3c):
    costs = build_costs(sample_profile(seed, K), mh, h3c)
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, size=L).astype(np.int8)
    codes = frag_codes_ending(seq)
    xt = xtrans_cost_vector(mh, h3c, L)
    prof = native.NativeProfile(costs)
    got = prof.viterbi(codes, L, xt)
    want = float(viterbi(
        jnp.asarray(costs.core), jnp.asarray(costs.match),
        jnp.asarray(costs.null), jnp.asarray(costs.background),
        jnp.asarray(xt), jnp.asarray(codes), jnp.int32(L)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)

    got_n = prof.viterbi_null(codes, L, float(xt[XT_RR]))
    want_n = float(viterbi_null(jnp.asarray(costs.null),
                                jnp.float32(xt[XT_RR]), jnp.asarray(codes),
                                jnp.int32(L)))
    np.testing.assert_allclose(got_n, want_n, rtol=1e-6, atol=1e-5)


def test_native_encode_and_frag_codes():
    sym = native.encode("ACGTUACG")
    assert sym.tolist() == [0, 1, 2, 3, 3, 0, 1, 2]
    with pytest.raises(ValueError, match="'N'"):
        native.encode("ACGN")
    codes = native.frag_codes(sym)
    np.testing.assert_array_equal(codes, frag_codes_ending(sym))


def test_native_fletcher16(tmp_path):
    data = bytes(range(256)) * 37
    path = tmp_path / "blob"
    path.write_bytes(data)
    assert native.fletcher16(data) == py_fletcher16(str(path))


def test_native_bench_runs():
    costs = build_costs(sample_profile(9, 32))
    prof = native.NativeProfile(costs)
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, size=256).astype(np.int8)
    codes = frag_codes_ending(seq)
    xt = xtrans_cost_vector(True, False, 256)
    dt = prof.bench_seconds(codes, 256, xt, nwin=4, nthreads=2)
    assert dt > 0


def test_native_engine_end_to_end_parity(tmp_path):
    """The native CPU engine (the reads/s baseline) drives the SAME
    pipeline to byte-identical products as the jax engine on a
    survivor-bearing workload (reference consensus reads x minifam)."""
    pytest.importorskip("deciphon_tpu.native")
    try:
        from deciphon_tpu.native import load
        load()
    except Exception:
        pytest.skip("native library unavailable")

    from deciphon_tpu.io.dcp import read_dcp_profiles
    from deciphon_tpu.scan.pipeline import ScanConfig, Scanner
    from deciphon_tpu.scan.sequence import Sequence
    from tests.test_golden_parity import FILES, read_fasta

    _, profiles = read_dcp_profiles(f"{FILES}/minifam.dcp")
    seqs = [Sequence.make(i, n, s)
            for i, (n, s) in enumerate(read_fasta(f"{FILES}/consensus.fna"))]

    out_n = Scanner(profiles, ScanConfig(engine="native")).run(
        seqs, str(tmp_path / "native"))
    out_j = Scanner(profiles, ScanConfig(engine="jax")).run(
        seqs, str(tmp_path / "jax"))
    with open(out_n) as a, open(out_j) as b:
        na, nb = a.read(), b.read()
    assert na == nb
    assert na.count("\n") > 1  # survivors actually produced rows
