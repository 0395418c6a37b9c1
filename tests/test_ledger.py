"""HBM capacity ledger: resident-vs-streamed table planning and the
streamed scan path (the DB-exceeds-HBM tier, c-core/database_writer.c:14 /
protein_reader.c:77-101 design point)."""

import json
import os

import numpy as np
import pytest

from deciphon_tpu.scan.scheduler import (BucketedPairScorer, HBMLedger,
                                         device_table_budget)

HERE = os.path.dirname(__file__)
MINIFAM = "/root/reference/c-core/minifam.hmm"


def test_ledger_plan_partition():
    led = HBMLedger(100)
    flags = led.plan([60, 50, 30, 10])
    # biggest first: 60 fits (40 left), 50 does not, 30 fits (10 left),
    # 10 fits (0 left)
    assert flags == [False, True, False, False]
    assert led.resident_bytes == 100
    assert led.streamed_bytes == 50


def test_ledger_single_oversized_bucket_streams():
    led = HBMLedger(10)
    flags = led.plan([100])
    assert flags == [True]  # streams instead of erroring or OOMing


def test_ledger_deterministic_tie_break():
    led = HBMLedger(25)
    assert led.plan([10, 10, 10]) == [False, False, True]


def test_device_table_budget_env(monkeypatch):
    monkeypatch.setenv("DECIPHON_HBM_BUDGET", "12345")
    assert device_table_budget() == 12345


def test_streamed_scan_products_identical(tmp_path):
    """A budget far below the table mass forces EVERY bucket to stream;
    products must match the fully resident scan byte for byte."""
    from deciphon_tpu.io.dcp import read_dcp_profiles
    from deciphon_tpu.press import press
    from deciphon_tpu.scan.pipeline import ScanConfig, Scanner

    dcp = tmp_path / "minifam.dcp"
    press(MINIFAM, str(dcp))
    _, profiles = read_dcp_profiles(str(dcp))
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        entries = json.load(fp)[:2]
    from deciphon_tpu.scan.sequence import Sequence

    reads = [Sequence.make(e["id"], e["name"], e["seq"]) for e in entries]

    outs = {}
    for label, budget in (("resident", None), ("streamed", 1)):
        sc = Scanner(
            profiles, ScanConfig(engine="pallas-interpret"),
            scorer=lambda costs, budget=budget: BucketedPairScorer(
                costs, interpret=True, w=8, hbm_budget=budget))
        if label == "streamed":
            assert all(s.stream_tables for s in sc.scorer.scorers
                       if hasattr(s, "stream_tables"))
            assert sc.scorer.ledger.streamed  # the ledger engaged
        out = sc.run(reads, str(tmp_path / label))
        outs[label] = open(out).read()
    assert outs["resident"] == outs["streamed"]
    assert len(outs["resident"].splitlines()) > 1
