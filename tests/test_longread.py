"""Long-read windowing + many-sequence workloads (test_window/test_massive
analogs, scaled for the CPU jax engine; the reference's golden checksums
need hmmpgmd so these assert structure, coverage and determinism)."""

import json
import os

import numpy as np
import pytest

from deciphon_tpu.io.dcp import read_dcp_profiles
from deciphon_tpu.press import press
from deciphon_tpu.scan.pipeline import ScanConfig, Scanner
from deciphon_tpu.scan.product import fletcher16
from deciphon_tpu.scan.sequence import Sequence
from deciphon_tpu.scan.window import MAX_WINDOW, WindowCursor

HERE = os.path.dirname(__file__)
MINIFAM = "/root/reference/c-core/minifam.hmm"


@pytest.fixture(scope="module")
def profiles_eps10(tmp_path_factory):
    out = tmp_path_factory.mktemp("lr") / "minifam10.dcp"
    press(MINIFAM, str(out), gencode_id=1, epsilon=0.1)
    _, profiles = read_dcp_profiles(str(out))
    return profiles


def mutated_repeat(size: int, seed: int = 591) -> str:
    """A long read made of repeated consensus with 70% random corruption
    (the reference's test_window corruption pattern, test_window.c:26-38)."""
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        base = json.load(fp)[0]["seq"]
    rng = np.random.default_rng(seed)
    out = []
    for i in range(size):
        if i % 10 in (0, 5, 3, 9, 4, 1, 2):
            out.append("ACGT"[rng.integers(0, 4)])
        else:
            out.append(base[i % len(base)])
    return "".join(out)


def test_window_cursor_long_sequence():
    cur = WindowCursor(core_size=400, seq_size=150000)
    wins = []
    w = cur.next()
    while w is not None:
        wins.append(w)
        w = cur.next()
    assert len(wins) > 5
    assert wins[0].length == min(400 * 50, MAX_WINDOW, 150000)
    # default overlap (no hit feedback) is 4*K
    assert wins[1].start == wins[0].stop + 1 - 4 * 400
    assert wins[-1].stop == 150000
    # full coverage, no gaps
    for a, b in zip(wins, wins[1:]):
        assert b.start <= a.stop


@pytest.mark.slow
def test_longread_windowed_scan(profiles_eps10, tmp_path):
    """150 kb mutated repeat (the reference's test_window workload size):
    with 7/10 positions randomized only a rare window clears the LRT —
    the reference's golden product is similarly tiny (chksum 9910 vs the
    header-only 48347).  With this generator's rng, exactly one PF00742
    window passes; assert the hit and its absolute coordinates."""
    size = 150000
    seq = Sequence.make(1, "mutated-repeat", mutated_repeat(size))
    scanner = Scanner(profiles_eps10, ScanConfig(engine="jax"))
    out = scanner.run([seq], str(tmp_path / "prod"))
    with open(out) as fp:
        fp.readline()
        rows = [line.split("\t") for line in fp]
    assert rows, "the 150kb repeat must yield at least one window hit"
    assert {r[7] for r in rows} == {"PF00742.20"}
    for r in rows:
        w_start, w_stop = int(r[2]), int(r[3])
        h_start, h_stop = int(r[5]), int(r[6])
        assert int(r[1]) > 0  # the hit window is not the first window
        assert 0 <= w_start < w_stop <= size
        assert 0 <= h_start <= h_stop <= w_stop - w_start
        assert float(r[9]) >= 0.0


def test_longread_deterministic(profiles_eps10, tmp_path):
    seq = Sequence.make(1, "m", mutated_repeat(12000))
    cfg = ScanConfig(engine="jax")
    out1 = Scanner(profiles_eps10, cfg).run([seq], str(tmp_path / "a"))
    out2 = Scanner(profiles_eps10, cfg).run([seq], str(tmp_path / "b"))
    assert fletcher16(out1) == fletcher16(out2)


def test_many_short_sequences(profiles_eps10, tmp_path):
    """test_massive analog: a batch of random short reads + planted
    consensus reads; the planted ones must hit, and the run must be
    batch-order deterministic."""
    rng = np.random.default_rng(28911)
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        consensus = json.load(fp)[2]["seq"]  # 23ISL

    seqs = []
    for i in range(40):
        n = int(rng.integers(30, 120))
        seqs.append(Sequence.make(
            i + 1, f"r{i}",
            "".join("ACGT"[b] for b in rng.integers(0, 4, size=n))))
    seqs.append(Sequence.make(41, "planted", consensus))

    scanner = Scanner(profiles_eps10, ScanConfig(engine="jax"))
    out = scanner.run(seqs, str(tmp_path / "prod"))
    with open(out) as fp:
        fp.readline()
        rows = [line.split("\t") for line in fp]
    hit_seqs = {int(r[0]) for r in rows}
    assert 41 in hit_seqs, "planted consensus read must be recovered"
    planted = [r for r in rows if int(r[0]) == 41]
    best = max(float(r[9]) for r in planted)
    assert best > 100.0


def test_window_last_hit_pos_persists_across_windows():
    """window.c never resets last_hit_pos: it persists until the caller
    overwrites it, so a hit-less window after a hit-window keeps using
    the stale hit position (the golden-checksum contract)."""
    K = 100
    cur = WindowCursor(core_size=K, seq_size=40000)
    w0 = cur.next()
    cur.set_last_hit_position(1234)
    w1 = cur.next()
    # stale value survives the hit-less w1: w2 uses it again
    w2 = cur.next()
    assert w1.start == max(w0.start + 1234 + 1, w0.stop + 1 - 4 * K)
    assert w2.start == max(w1.start + 1234 + 1, w1.stop + 1 - 4 * K)
    # overwriting takes effect on the next window only
    cur.set_last_hit_position(7)
    w3 = cur.next()
    assert w3.start == max(w2.start + 7 + 1, w2.stop + 1 - 4 * K)


def test_amino_overflow_writes_match_line_without_confirmation(
        profiles_eps10, tmp_path, monkeypatch):
    """Amino sequences too long for HMMER3 skip ONLY the confirmation;
    the match line is still written (thread.c:182-207: add_match sits
    outside the 100k guard)."""
    import deciphon_tpu.scan.pipeline as pl
    with open(os.path.join(HERE, "data_consensus.json")) as fp:
        consensus = json.load(fp)[0]["seq"]
    seq = Sequence.make(1, "c", consensus)

    calls = []

    def confirmer(p_idx, amino_seq):
        calls.append((p_idx, len(amino_seq)))
        return -50.0, None

    # Force every amino over the "HMMER limit".
    monkeypatch.setattr(pl, "HMMER_MAX_AMINO", 10)
    scanner = Scanner(profiles_eps10, ScanConfig(engine="jax"),
                      confirmer=confirmer)
    out = scanner.run([seq], str(tmp_path / "prod"))
    with open(out) as fp:
        fp.readline()
        rows = [line.split("\t") for line in fp]
    assert rows, "match lines must be written despite skipped confirmation"
    assert calls == [], "confirmer must not be called above the limit"
    # evalue column is 1 (logevalue 0) since no confirmation happened
    assert {r[10] for r in rows} == {"1"}


def test_estimate_windows_matches_hit_free_walk():
    """The speculation depth seed must equal the actual no-hit window
    count for any (core_size, seq_size) — an underestimate only costs an
    extra wave, but an overestimate must never skip windows."""
    from deciphon_tpu.scan.window import WindowCursor

    for K in (5, 50, 173, 500, 2000, 4000):
        for L in (1, 10, 100, 2499, 2500, 2501, 10000, 100000, 250000):
            cur = WindowCursor(K, L)
            est = cur.estimate_windows()
            n = 0
            while cur.next() is not None:
                n += 1
                assert n <= est + 1, (K, L, n, est)
            assert est == n, (K, L, n, est)


def test_rewind_restores_serial_walk():
    """Speculated cursors rewound via state()/restore() replay the exact
    serial sequence the reference's window.c walk produces."""
    from deciphon_tpu.scan.window import WindowCursor

    K, L = 100, 30000
    serial = WindowCursor(K, L)
    wins = []
    # serial walk with a hit reported in window 1
    w = serial.next()
    wins.append((w.idx, w.start, w.stop))
    serial.set_last_hit_position(4321)
    while (w := serial.next()) is not None:
        wins.append((w.idx, w.start, w.stop))

    spec = WindowCursor(K, L)
    w0 = spec.next()
    post0 = spec.state()
    # speculate 3 windows ahead assuming no hit
    spec_ahead = [spec.next() for _ in range(3)]
    assert all(s is not None for s in spec_ahead)
    # the hit lands: rewind to the post-window-0 state and re-derive
    spec.restore(post0)
    spec.set_last_hit_position(4321)
    replay = [(w0.idx, w0.start, w0.stop)]
    while (w := spec.next()) is not None:
        replay.append((w.idx, w.start, w.stop))
    assert replay == wins
