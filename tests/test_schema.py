"""Schema: name/path suffix algebra + DTO round-trips."""

import pytest
from pydantic import ValidationError

from deciphon_tpu.schema import (DBName, Gencode, HMMName, JobRead, JobState,
                                 JobType, NewSnapFile, PressRequest,
                                 ScanRequest, SeqRead, SnapName)


def test_name_suffix_algebra():
    hmm = HMMName(name="minifam.hmm")
    assert hmm.dbname.name == "minifam.dcp"
    assert hmm.dbname.hmmname.name == "minifam.hmm"
    with pytest.raises(ValidationError):
        HMMName(name="minifam.dcp")
    with pytest.raises(ValidationError):
        DBName(name="x" * 200 + ".dcp")
    SnapName(name="result file.dcs")


def test_gencode_enum():
    assert Gencode.SGC0 == 1
    assert Gencode.BAPP == 11
    assert str(Gencode.CMMC) == "33"
    assert len(Gencode) == 27


def test_press_request_create():
    req = PressRequest.create(7, HMMName(name="pfam.hmm"), Gencode.SGC0, 0.01)
    assert req.db.name == "pfam.dcp"
    assert req.epsilon == 0.01
    # JSON round trip (the MQTT payload contract)
    again = PressRequest.model_validate_json(req.model_dump_json())
    assert again == req


def test_scan_request_roundtrip():
    req = ScanRequest(
        id=1, job_id=2, hmm=HMMName(name="ab.hmm"), db=DBName(name="ab.dcp"),
        multi_hits=True, hmmer3_compat=False,
        seqs=[SeqRead(id=1, name="s", data="ACGT")])
    again = ScanRequest.model_validate_json(req.model_dump_json())
    assert again.seqs[0].data == "ACGT"


def test_new_snap_file(tmp_path):
    target = tmp_path / "out.dcs"
    nf = NewSnapFile(path=target)
    basedir = nf.basedir
    basedir.mkdir()
    (basedir / "products.tsv").write_text("sequence\n")
    (basedir / "hmmer").mkdir()
    snap = nf.make_archive()
    assert snap.path.exists()
    assert not basedir.exists()

    from deciphon_tpu.snap.snap_file import read_snap

    sf = read_snap(snap.path)
    assert len(sf.products) == 0

    # basedir must not pre-exist for a fresh NewSnapFile
    basedir.mkdir()
    with pytest.raises(ValidationError):
        NewSnapFile(path=tmp_path / "out.dcs")


def test_job_read():
    from datetime import datetime

    j = JobRead(id=1, type=JobType.scan, state=JobState.pend, progress=0,
                error="", submission=datetime.now())
    assert j.exec_started is None
