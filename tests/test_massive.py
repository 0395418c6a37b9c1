"""test_massive parity: 10,000 tiny random reads vs the 1-profile
massive.hmm must produce an EMPTY product file.

The reference's golden fletcher16 (48347, c-core/test_massive.c:55) is
exactly the checksum of the header-only products.tsv — zero hits — so
this parity statement is rng-independent and we can assert it bit-for-bit
including the checksum itself.
"""

import numpy as np
import pytest

from deciphon_tpu.io.dcp import read_dcp_profiles
from deciphon_tpu.press import press
from deciphon_tpu.scan.pipeline import ScanConfig, Scanner
from deciphon_tpu.scan.product import fletcher16
from deciphon_tpu.scan.sequence import Sequence

MASSIVE = "/root/reference/c-core/massive.hmm"
GOLDEN_EMPTY_CHKSUM = 48347  # c-core/test_massive.c:55


@pytest.fixture(scope="module")
def massive_profiles(tmp_path_factory):
    out = tmp_path_factory.mktemp("mass") / "massive.dcp"
    press(MASSIVE, str(out), gencode_id=1, epsilon=0.01)
    _, profiles = read_dcp_profiles(str(out))
    assert len(profiles) == 1 and profiles[0].core_size == 3
    return profiles


def test_massive_random_batch_empty_products(massive_profiles, tmp_path):
    """A handful of 10-nt chance windows do clear the LRT (the reference
    sees them too) — it is the e-value confirmation stage that rejects
    every one, leaving the empty product the golden checksum encodes."""
    from deciphon_tpu.hmmer.forward import NativeConfirmer
    from deciphon_tpu.hmmfile import read_hmm

    rng = np.random.default_rng(28911)
    seqs = []
    for i in range(10000):
        size = 1 + int(rng.integers(0, 3 * 3 * 2 + 3))
        data = "".join("ACGT"[b] for b in rng.integers(0, 4, size=size))
        seqs.append(Sequence.make(i, f"name{i}", data))

    confirmer = NativeConfirmer(read_hmm(MASSIVE))
    scanner = Scanner(massive_profiles, ScanConfig(engine="jax"),
                      confirmer=confirmer.confirm)
    out = scanner.run(seqs, str(tmp_path / "prod"))
    assert scanner.progress == 100
    assert scanner.metrics.survivors > 0, "chance LRT hits should occur"
    with open(out) as fp:
        content = fp.read()
    assert content.count("\n") == 1, "confirmation must reject chance hits"
    assert fletcher16(out) == GOLDEN_EMPTY_CHKSUM
