"""python-core compatibility surface: PressContext/Scan/Batch/Sequence."""

import json
import os

import pytest

from deciphon_tpu.core import Batch, DeciphonError, Scan, Sequence
from deciphon_tpu.press import PressContext
from deciphon_tpu.schema import DBFile, NewSnapFile

HERE = os.path.dirname(__file__)
MINIFAM = "/root/reference/c-core/minifam.hmm"


def test_core_press_scan_flow(tmp_path):
    dcp = tmp_path / "minifam.dcp"
    with PressContext(MINIFAM, str(dcp), gencode_id=1, epsilon=0.01) as ctx:
        assert ctx.nproteins == 3
        for _ in range(ctx.nproteins):
            ctx.next()
    assert dcp.exists()

    batch = Batch()
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        for e in json.load(fp)[:2]:
            batch.add(Sequence(e["id"], e["name"], e["seq"]))
    assert len(batch) == 2

    scan = Scan(DBFile(path=dcp), port=0, num_threads=2, multi_hits=True,
                hmmer3_compat=False, cache=False, engine="jax")
    snap = NewSnapFile(path=tmp_path / "result.dcs")
    scan.run(snap, batch)
    assert scan.progress() == 100
    snap.make_archive()

    from deciphon_tpu.snap.snap_file import read_snap

    prods = read_snap(tmp_path / "result.dcs").products
    assert len(prods) >= 2

    batch.reset()
    assert len(batch) == 0


def test_core_bad_database(tmp_path):
    bad = tmp_path / "junk.dcp"
    bad.write_bytes(b"not a database")
    with pytest.raises(DeciphonError, match="cannot open"):
        Scan(DBFile(path=bad), engine="jax")
