"""Scan checkpoint/resume: an interrupted scan resumes to identical output."""

import json
import os

import pytest

from deciphon_tpu.io.dcp import read_dcp_profiles
from deciphon_tpu.press import press
from deciphon_tpu.scan.pipeline import ScanConfig, Scanner
from deciphon_tpu.scan.sequence import Sequence

HERE = os.path.dirname(__file__)
MINIFAM = "/root/reference/c-core/minifam.hmm"


@pytest.fixture(scope="module")
def profiles(tmp_path_factory):
    out = tmp_path_factory.mktemp("ck") / "minifam.dcp"
    press(MINIFAM, str(out), 1, 0.01)
    return read_dcp_profiles(str(out))[1]


@pytest.fixture(scope="module")
def seqs():
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        raw = json.load(fp)[:4]
    return [Sequence.make(e["id"], e["name"], e["seq"]) for e in raw]


class Boom(RuntimeError):
    pass


def test_checkpoint_resume_identical(profiles, seqs, tmp_path):
    cfg = ScanConfig(engine="jax", max_pairs=1)  # many small batches
    reference = Scanner(profiles, cfg).run(seqs, str(tmp_path / "ref"))

    # interrupt after a few scoring rounds
    crash_dir = str(tmp_path / "crash")
    scanner = Scanner(profiles, cfg)
    real_score = scanner.scorer.score
    calls = {"n": 0}

    def flaky(items):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()
        return real_score(items)

    scanner.scorer.score = flaky
    with pytest.raises(Boom):
        scanner.run(seqs, crash_dir, checkpoint=True)
    assert os.path.exists(os.path.join(crash_dir, ".scan_checkpoint.jsonl"))

    # resume with a fresh scanner
    scanner2 = Scanner(profiles, cfg)
    out = scanner2.run(seqs, crash_dir, checkpoint=True)
    assert open(out).read() == open(reference).read()
    # checkpoint journal is cleaned up on success
    assert not os.path.exists(os.path.join(crash_dir,
                                           ".scan_checkpoint.jsonl"))


def test_checkpoint_noop_when_complete(profiles, seqs, tmp_path):
    cfg = ScanConfig(engine="jax")
    d = str(tmp_path / "full")
    out1 = Scanner(profiles, cfg).run(seqs[:2], d, checkpoint=True)
    content = open(out1).read()
    # run again in the same dir without a checkpoint file: full rescan
    out2 = Scanner(profiles, cfg).run(seqs[:2], d, checkpoint=True)
    assert open(out2).read() == content
