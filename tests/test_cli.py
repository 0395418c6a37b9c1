"""CLI end-to-end: press -> scan -> see via click's test runner."""

import json
import os

import pytest
from click.testing import CliRunner

from deciphon_tpu.cli import cli

HERE = os.path.dirname(__file__)
MINIFAM = "/root/reference/c-core/minifam.hmm"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        data = json.load(fp)[:2]
    fna = tmp / "reads.fna"
    with open(fna, "w") as fp:
        for e in data:
            fp.write(f">{e['name']}\n{e['seq']}\n")
    return tmp


def test_cli_press_scan_see(workdir):
    runner = CliRunner()
    dcp = str(workdir / "minifam.dcp")
    r = runner.invoke(cli, ["press", MINIFAM, "1", "--output", dcp,
                            "--no-progress"])
    assert r.exit_code == 0, r.output
    assert os.path.exists(dcp)

    fna = str(workdir / "reads.fna")
    r = runner.invoke(cli, ["scan", dcp, fna, "--engine", "jax",
                            "--no-progress"])
    assert r.exit_code == 0, r.output
    dcs = str(workdir / "reads.dcs")
    assert os.path.exists(dcs)

    r = runner.invoke(cli, ["see", dcs])
    assert r.exit_code == 0, r.output
    assert "state" in r.output and "amino" in r.output

    # scan refuses to overwrite an existing snap
    r = runner.invoke(cli, ["scan", dcp, fna, "--engine", "jax",
                            "--no-progress"])
    assert r.exit_code != 0
    assert "already exists" in r.output


def test_cli_press_bad_gencode(workdir):
    runner = CliRunner()
    r = runner.invoke(cli, ["press", MINIFAM, "99", "--no-progress"])
    assert r.exit_code != 0
    assert "unknown genetic code" in r.output


def test_cli_help():
    runner = CliRunner()
    r = runner.invoke(cli, ["--help"])
    assert r.exit_code == 0
    for cmd in ("press", "scan", "see"):
        assert cmd in r.output
