"""Worker daemons: press thread + scanner daemon + progressor stream."""

import json
import os

import pytest

from deciphon_tpu.worker import Progressor, launch_scanner, press
from deciphon_tpu.worker.progressor import Interrupted

HERE = os.path.dirname(__file__)
MINIFAM = "/root/reference/c-core/minifam.hmm"


def consensus_seqs(n=2):
    from deciphon_tpu.scan.sequence import Sequence

    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        raw = json.load(fp)[:n]
    return [Sequence.make(e["id"], e["name"], e["seq"]) for e in raw]


def test_press_worker_progress(tmp_path):
    out = str(tmp_path / "minifam.dcp")
    prog = press(MINIFAM, out, gencode_id=1, epsilon=0.01)
    values = list(prog.as_progress())
    assert values[-1] == 100
    assert values == sorted(values)
    assert prog.result(timeout=5) == out
    assert os.path.getsize(out) > 1_000_000


def test_press_worker_error(tmp_path):
    prog = press(str(tmp_path / "missing.hmm"), str(tmp_path / "x.dcp"))
    with pytest.raises(FileNotFoundError):
        prog.result(timeout=10)


def test_scanner_daemon_end_to_end(tmp_path):
    dcp = str(tmp_path / "minifam.dcp")
    press(MINIFAM, dcp).result(timeout=120)
    with launch_scanner(dcp, engine="jax") as daemon:
        snap1 = str(tmp_path / "a.dcs")
        snap2 = str(tmp_path / "b.dcs")
        p1 = daemon.put(snap1, consensus_seqs(2))
        p2 = daemon.put(snap2, consensus_seqs(1))
        assert p1.result(timeout=600) == snap1
        assert p2.result(timeout=600) == snap2
        assert p1.progress == 100

    from deciphon_tpu.snap.snap_file import read_snap

    prods = read_snap(snap1).products
    assert len(prods) >= 2


def test_progressor_interrupt():
    prog = Progressor()
    prog.interrupt()
    with pytest.raises(Interrupted):
        prog.check_interrupted()


def test_scanner_daemon_interrupt(tmp_path):
    from deciphon_tpu.scan.pipeline import Scanner

    dcp = str(tmp_path / "minifam.dcp")
    press(MINIFAM, dcp).result(timeout=120)
    with launch_scanner(dcp, engine="jax") as daemon:
        snap = str(tmp_path / "x.dcs")
        prog = daemon.put(snap, consensus_seqs(2))
        prog.interrupt()
        with pytest.raises(Exception):
            prog.result(timeout=600)
        assert not os.path.exists(snap)
