"""H3Result: HMMER search results attached to products (.h3r blobs).

The reference stores each confirmed hit's HMMER reply as an opaque binary
blob packed by the h3result C library (c-core/product_thread.c:81-110) and
re-reads it for domtbl-style views (snap/deciphon_snap/hmmer.py).  This
framework defines its own h3r container — msgpack of the parsed result —
written by both the native confirmer (hmmer/forward.py) and the wire
client (hmmer/client.py), and read back by the snap views.  Reference h3r
blobs (C h3result serialization) are not parsed; interop happens at the
products.tsv level.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import msgpack

__all__ = ["H3Result", "H3Domain", "H3Hit"]

MAGIC = "dtpu-h3r"
VERSION = 1


@dataclass
class H3Domain:
    env_start: int = 0  # 1-based envelope coords on the query
    env_stop: int = 0
    ali_start: int = 0  # 1-based alignment coords
    ali_stop: int = 0
    hmm_start: int = 0  # 1-based profile coords
    hmm_stop: int = 0
    score: float = 0.0  # bit score
    lnP: float = 0.0  # log P-value
    query_display: str = ""  # aligned query row
    model_display: str = ""  # aligned model/consensus row
    match_display: str = ""  # midline


@dataclass
class H3Hit:
    name: str
    acc: str
    score: float  # full-sequence bit score
    lnP: float  # log P-value
    domains: list[H3Domain] = field(default_factory=list)

    def logevalue(self, Z: float) -> float:
        return self.lnP + math.log(Z)


@dataclass
class H3Result:
    Z: float
    qlen: int
    seqlen: int
    hits: list[H3Hit] = field(default_factory=list)

    @property
    def nhits(self) -> int:
        return len(self.hits)

    def hit_logevalue(self, i: int) -> float:
        return self.hits[i].logevalue(self.Z)

    @classmethod
    def single_hit(cls, name: str, acc: str, score: float, lnP: float,
                   Z: float, qlen: int, seqlen: int,
                   domains: list[H3Domain] | None = None) -> "H3Result":
        return cls(Z=Z, qlen=qlen, seqlen=seqlen,
                   hits=[H3Hit(name=name, acc=acc, score=score, lnP=lnP,
                               domains=domains or [])])

    # -- serialization --------------------------------------------------
    def to_blob(self) -> bytes:
        return msgpack.packb({
            "magic": MAGIC,
            "version": VERSION,
            "Z": self.Z,
            "qlen": self.qlen,
            "seqlen": self.seqlen,
            "hits": [{
                "name": h.name, "acc": h.acc, "score": h.score, "lnP": h.lnP,
                "domains": [d.__dict__ for d in h.domains],
            } for h in self.hits],
        })

    @classmethod
    def from_blob(cls, blob: bytes) -> "H3Result":
        obj = msgpack.unpackb(blob)
        if obj.get("magic") != MAGIC:
            raise ValueError("not a deciphon-tpu h3r blob")
        hits = [H3Hit(name=h["name"], acc=h["acc"], score=h["score"],
                      lnP=h["lnP"],
                      domains=[H3Domain(**d) for d in h["domains"]])
                for h in obj["hits"]]
        return cls(Z=obj["Z"], qlen=obj["qlen"], seqlen=obj["seqlen"],
                   hits=hits)
