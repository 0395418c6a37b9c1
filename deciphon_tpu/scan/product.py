"""Product (hit) accumulation and products.tsv writing.

Parity: c-core/product.c (header + shard merge), product_thread.c (row
format), product_line.c.  Row format:

  sequence  window  window_start  window_stop  hit  hit_start  hit_stop
  profile  abc  lrt(%.1f)  evalue(%.2g)  match

match string: ';'-joined "frag,STATE,codon,amino" per path step
(codon/amino empty for mute states).

Line order matches the reference's merged per-thread shards: partitions are
contiguous protein ranges and each thread walks proteins, then sequences,
then windows — i.e. global order (protein_idx, sequence, window) regardless
of thread count (the reference's determinism contract,
python-core/tests/test_scan.py:102-104).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

HEADER = ("sequence\twindow\twindow_start\twindow_stop\thit\thit_start\t"
          "hit_stop\tprofile\tabc\tlrt\tevalue\tmatch\n")


def format_evalue(logevalue: float) -> str:
    """%.2g of exp(logevalue) (product_thread.c:63)."""
    return "%.2g" % math.exp(logevalue)


def format_lrt(lrt: float) -> str:
    return "%.1f" % lrt


@dataclass
class MatchStep:
    frag: str  # raw nucleotides of this step (may be "")
    state: str  # state name, e.g. "M12", "I3", "B"
    codon: str  # "" for mute states
    amino: str  # "" for mute states

    def render(self) -> str:
        return f"{self.frag},{self.state},{self.codon},{self.amino}"


@dataclass
class ProductLine:
    sequence: int
    window: int
    window_start: int
    window_stop: int
    hit: int
    hit_start: int
    hit_stop: int
    profile: str
    abc: str
    lrt: float
    logevalue: float
    steps: list[MatchStep] = field(default_factory=list)

    def render(self) -> str:
        cols = [
            str(self.sequence), str(self.window), str(self.window_start),
            str(self.window_stop), str(self.hit), str(self.hit_start),
            str(self.hit_stop), self.profile, self.abc,
            format_lrt(self.lrt), format_evalue(self.logevalue),
            ";".join(s.render() for s in self.steps),
        ]
        return "\t".join(cols) + "\n"


class ProductWriter:
    """Collects lines plus optional h3r blobs; writes the product directory.

    Directory layout (c-core/product.c:15-31, product_thread.c:81-110):
      <dir>/products.tsv
      <dir>/hmmer/<seq>/<window>/<hit>/<profile>.h3r
    """

    def __init__(self, dirname: str):
        self.dirname = dirname
        self.lines: list[ProductLine] = []
        self._orders: list[tuple] = []

    def add(self, line: ProductLine, order: tuple | None = None) -> None:
        self.lines.append(line)
        self._orders.append(order if order is not None
                            else (0, line.sequence, line.window))

    def sort_lines(self) -> None:
        """Restore the reference's deterministic (protein, sequence,
        window) order regardless of batch completion order."""
        paired = sorted(zip(self._orders, range(len(self.lines))))
        self.lines = [self.lines[i] for _, i in paired]
        self._orders = [o for o, _ in paired]

    def add_h3r(self, line: ProductLine, blob: bytes) -> None:
        d = os.path.join(self.dirname, "hmmer", str(line.sequence),
                         str(line.window), str(line.hit))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{line.profile}.h3r"), "wb") as fp:
            fp.write(blob)

    def close(self) -> str:
        os.makedirs(self.dirname, exist_ok=True)
        os.makedirs(os.path.join(self.dirname, "hmmer"), exist_ok=True)
        path = os.path.join(self.dirname, "products.tsv")
        with open(path, "w") as fp:
            fp.write(HEADER)
            for line in self.lines:
                fp.write(line.render())
        return path


def fletcher16(path: str) -> int:
    """Checksum oracle used by the reference tests (c-core/fs.c:157-191)."""
    s1, s2 = 0, 0
    with open(path, "rb") as fp:
        while True:
            chunk = fp.read(5802)
            if not chunk:
                break
            for b in chunk:
                s1 = (s1 + b) % 255
                s2 = (s2 + s1) % 255
    return (s2 << 8) | s1
