"""Services tier end-to-end: sched REST + poster + worker + control CLI."""

import json
import os
import shutil

import pytest

from deciphon_tpu.poster import Poster
from deciphon_tpu.sched import SchedServer, SchedSettings
from deciphon_tpu.worker_daemon import WorkerLoop

HERE = os.path.dirname(__file__)
MINIFAM = "/root/reference/c-core/minifam.hmm"


@pytest.fixture(scope="module")
def sched(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("sched"))
    settings = SchedSettings(host="127.0.0.1", port=0, data_dir=data_dir)
    with SchedServer(settings) as server:
        yield server


@pytest.fixture(scope="module")
def poster(sched):
    return Poster(sched.url)


@pytest.fixture(scope="module")
def worker(poster, tmp_path_factory):
    return WorkerLoop(poster, workdir=str(tmp_path_factory.mktemp("wrk")),
                      engine="jax")


def test_health_and_root(poster, sched):
    assert poster.handshake() == {"status": "ok"}
    import requests

    r = requests.get(sched.url + "/", timeout=10)
    assert r.status_code == 200 and "/jobs" in r.json()


def test_press_job_flow(poster, worker, tmp_path):
    # operator: upload + register the hmm -> press job queued
    local = tmp_path / "minifam.hmm"
    shutil.copy(MINIFAM, local)
    poster.upload("hmms", str(local))
    hmm = poster.hmm_post("minifam.hmm", gencode=1, epsilon=0.01)
    assert hmm["job"]["state"] == "pend"

    assert worker.poll_once() is True  # presses

    job = poster.job_get(hmm["job"]["id"])
    assert job["state"] == "done", job
    dbs = poster.db_list()
    assert dbs and dbs[0]["file"]["name"] == "minifam.dcp"

    # artifact is downloadable through the presigned flow
    out = tmp_path / "fetched.dcp"
    poster.download("dbs", "minifam.dcp", str(out))
    from deciphon_tpu.io.dcp import DcpReader

    with DcpReader(str(out)) as r:
        assert r.num_proteins == 3


def test_scan_job_flow(poster, worker):
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        data = json.load(fp)[:2]
    seqs = [{"name": e["name"], "data": e["seq"]} for e in data]
    db_id = poster.db_list()[0]["id"]
    scan = poster.scan_post(db_id, seqs)
    assert scan["job"]["state"] == "pend"
    assert len(scan["seqs"]) == 2

    assert worker.poll_once() is True  # scans + posts snap

    job = poster.job_get(scan["job"]["id"])
    assert job["state"] == "done", job

    # snap is stored and parseable
    blob = poster.snap_get(scan["id"])
    assert blob[:2] == b"PK"  # zip

    prods = poster.snap_view(scan["id"], "prods")
    assert prods and {p["seq_id"] for p in prods} == {1, 2}
    gff = poster.snap_view(scan["id"], "gff")
    assert gff.startswith("##gff-version 3")
    view = poster.snap_view(scan["id"], "view")
    assert "amino" in view
    fasta = poster.snap_view(scan["id"], "aminos")
    assert fasta.startswith(">")


def test_job_state_machine_rejections(poster):
    jobs = poster.job_list()
    done = [j for j in jobs if j["state"] == "done"][0]
    with pytest.raises(RuntimeError, match="403"):
        poster.job_patch(done["id"], "run", progress=10)


def test_scan_unknown_db(poster):
    with pytest.raises(RuntimeError, match="404"):
        poster.scan_post(99999, [{"name": "s", "data": "ACGT"}])


def test_snap_validation_rejects_garbage(poster, sched):
    import requests

    scan_id = poster.scan_list()[0]["id"]
    r = requests.post(f"{sched.url}/scans/{scan_id}/snap.dcs",
                      data=b"not a zip", timeout=10)
    assert r.status_code == 422


def test_control_cli(sched, tmp_path, monkeypatch):
    from click.testing import CliRunner

    from deciphon_tpu.control import cli

    runner = CliRunner()
    env = {"DECIPHONCTL_SCHED_URL": sched.url}
    r = runner.invoke(cli, ["job", "ls"], env=env)
    assert r.exit_code == 0, r.output
    assert "done" in r.output

    r = runner.invoke(cli, ["hmm", "ls"], env=env)
    assert r.exit_code == 0 and "minifam.hmm" in r.output

    r = runner.invoke(cli, ["snap", "prods", "1"], env=env)
    # scan ids start at 1; if that scan has no snap the command errors
    # cleanly; the point is wiring, not ids.
    assert r.exit_code in (0, 1)

    dest = tmp_path / "out.dcs"
    scan_id = Poster(sched.url).scan_list()[0]["id"]
    r = runner.invoke(cli, ["snap", "get", str(scan_id), str(dest)], env=env)
    assert r.exit_code == 0 and dest.exists()


def test_queue_claims_are_disjoint(sched):
    """Two workers long-polling the queue never claim the same job."""
    import threading

    from deciphon_tpu.poster import Poster

    p = Poster(sched.url)
    sched.database.queue_publish("t-claims", '{"n": 1}')
    sched.database.queue_publish("t-claims", '{"n": 2}')
    sched.database.queue_publish("t-claims", '{"n": 3}')

    got, lock = [], threading.Lock()

    def worker():
        local = Poster(sched.url)
        while True:
            msg = local.queue_next("t-claims", timeout=0)
            if msg is None:
                return
            with lock:
                got.append(msg["n"])

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(got) == [1, 2, 3]
