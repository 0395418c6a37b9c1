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


def test_core_reuse_scan(tmp_path):
    """The reference's reuse flow (c-core/test_scan.c:50-78): ONE Scan,
    one run() per sequence into the same product dir; each run truncates
    products.tsv (product.c:46 "wb"), so the final file holds only the
    last batch's rows.  Covers both cache modes: cached keeps engine
    state across runs, uncached releases and rebuilds it."""
    dcp = tmp_path / "minifam.dcp"
    with PressContext(MINIFAM, str(dcp), gencode_id=1, epsilon=0.01) as ctx:
        for _ in range(ctx.nproteins):
            ctx.next()

    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        entries = json.load(fp)[:2]

    per_run_products = {}
    for cache in (True, False):
        scan = Scan(DBFile(path=dcp), port=0, num_threads=1,
                    multi_hits=True, hmmer3_compat=False, cache=cache,
                    engine="jax")
        snapdir = tmp_path / f"reuse_{cache}"
        snap = NewSnapFile(path=snapdir / "result.dcs")
        batch = Batch()
        for e in entries:
            batch.add(Sequence(e["id"], e["name"], e["seq"]))
            scan.run(snap, batch)
            assert scan.progress() == 100
            tsv = (snap.basedir / "products.tsv").read_text()
            rows = [ln for ln in tsv.splitlines()[1:] if ln]
            # truncation semantics: ONLY this run's sequence present
            got_ids = {int(r.split("\t")[0]) for r in rows}
            assert got_ids <= {e["id"]}
            per_run_products.setdefault(cache, []).append(rows)
            batch.reset()
        if not cache:
            assert scan._scanner.scorer is None  # released between runs
    # cached and uncached runs produce identical products
    assert per_run_products[True] == per_run_products[False]
    # the consensus sequences hit their own family: rows exist per run
    assert all(rows for rows in per_run_products[True])


def test_core_bad_database(tmp_path):
    bad = tmp_path / "junk.dcp"
    bad.write_bytes(b"not a database")
    with pytest.raises(DeciphonError, match="cannot open"):
        Scan(DBFile(path=bad), engine="jax")
