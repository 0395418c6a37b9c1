"""Multi-device pair scoring on the 8-virtual-CPU mesh: device-count
invariance of the products."""

import json
import os

import jax
import pytest

from deciphon_tpu.io.dcp import read_dcp_profiles
from deciphon_tpu.parallel.multidevice import MultiDevicePairScorer
from deciphon_tpu.press import press
from deciphon_tpu.scan.pipeline import ScanConfig, Scanner
from deciphon_tpu.scan.sequence import Sequence

HERE = os.path.dirname(__file__)
MINIFAM = "/root/reference/c-core/minifam.hmm"


@pytest.fixture(scope="module")
def profiles(tmp_path_factory):
    out = tmp_path_factory.mktemp("md") / "minifam.dcp"
    press(MINIFAM, str(out), 1, 0.01)
    return read_dcp_profiles(str(out))[1]


@pytest.fixture(scope="module")
def seqs():
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        raw = json.load(fp)[:3]
    return [Sequence.make(e["id"], e["name"], e["seq"]) for e in raw]


def test_multidevice_matches_single(profiles, seqs, tmp_path):
    assert len(jax.devices()) >= 8

    out_single = Scanner(profiles, ScanConfig(engine="jax")).run(
        seqs, str(tmp_path / "single"))

    def make_scorer(costs):
        return MultiDevicePairScorer(costs, devices=jax.devices()[:4],
                                     interpret=True)

    out_multi = Scanner(profiles, ScanConfig(engine="jax"),
                        scorer=make_scorer).run(seqs, str(tmp_path / "multi"))
    assert open(out_single).read() == open(out_multi).read()
