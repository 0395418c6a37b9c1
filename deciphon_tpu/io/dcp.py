"""The .dcp pressed-profile database container (msgpack).

Layout mirrors the reference byte layout at the deciphon level
(c-core/database_writer.c:95-193, protein.c:234-337):

  map(2){
    "header": map(8){
      "magic_number": 0xC6F1, "version": 1,
      "entry_dist": int, "epsilon": float32,
      "abc": <abc blob>, "amino": <abc blob>,
      "has_ga": bool, "protein_sizes": array(N) of uint,
    },
    "proteins": array(N) of map(10){
      "accession": str, "gencode": int, "consensus": str, "core_size": int,
      "null_nuclt_dist": <nuclt_dist>, "null_emission": bin(f32[1364]),
      "bg_nuclt_dist": <nuclt_dist>, "bg_emission": bin(f32[1364]),
      "nodes": map((K+1)*3) of repeated "nuclt_dist"/"trans"/"emission",
      "BMk": bin(f32[K]),
    },
  }

All floats are float32 (lip_pack_float); f32 arrays are msgpack bin blobs of
little-endian floats (c-core/write.c:60-66); ints use minimal encodings.
The `nodes` map deliberately repeats keys, exactly like the reference.

Sub-blob layouts owned by the (non-vendored) imm library — <abc blob>
(imm_abc_pack) and <nuclt_dist>'s members (imm_nuclt_lprob_pack,
imm_codon_marg_pack) — are reconstructed here and documented below; the
deciphon-level structure is exact, the imm-level layout is best-effort:

  abc blob   := map(4){"symbols": str, "any": int(symbol idx),
                       "typeid": int, "size": int}
  nuclt_dist := array(2)[ bin(f32[4]) nucleotide lprobs,
                          bin(f32[125]) codon-marginal lprobs ]

Per-protein byte sizes are recorded in the header for random access — the
partitioned reader (reader partitions, c-core/protein_reader.c) seeks
straight to any protein.
"""

from __future__ import annotations

import io as _io
import os
from dataclasses import dataclass

import msgpack
import numpy as np

from .. import frame
from ..frame import nuclt_marginal_lprobs
from ..profile import FrameProfile

MAGIC_NUMBER = 0xC6F1
DATABASE_VERSION = 0x01
NODE_SIZE = frame.TABLE_SIZE  # 1364

# imm typeids (imm abc.h convention: abc=0x00.. dna/rna/amino specific ids)
TYPEID_DNA = 2
TYPEID_AMINO = 4

DNA_SYMBOLS = "ACGT"
AMINO_SYMBOLS = "ACDEFGHIKLMNPQRSTVWY"


def _f32bin(packer, arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(arr, dtype="<f4")
    return packer.pack(a.tobytes())


def _pack_abc(packer, symbols: str, typeid: int) -> bytes:
    out = [packer.pack_map_header(4)]
    out.append(packer.pack("symbols"))
    out.append(packer.pack(symbols))
    out.append(packer.pack("any"))
    out.append(packer.pack(len(symbols)))
    out.append(packer.pack("typeid"))
    out.append(packer.pack(typeid))
    out.append(packer.pack("size"))
    out.append(packer.pack(len(symbols)))
    return b"".join(out)


def _pack_nuclt_dist(packer, nuclt_lprobs: np.ndarray,
                     codon_marg: np.ndarray) -> bytes:
    """array(2)[nuclt lprobs f32[4], codon marginals f32[125]]."""
    out = [packer.pack_array_header(2)]
    out.append(_f32bin(packer, nuclt_lprobs))
    out.append(_f32bin(packer, codon_marg.reshape(-1)))
    return b"".join(out)


class DcpWriter:
    """Streams pressed profiles into a .dcp file.

    The reference writes proteins through up to 32 4-GB temp chunks then
    concatenates (database_writer.c:14,116-133); here proteins stream to a
    single temp file (modern filesystems need no 4 GB chunking) and the
    header is written first at close, preserving the identical final layout.
    """

    def __init__(self, path: str, entry_dist: int, epsilon: float):
        self.path = path
        self.entry_dist = entry_dist
        self.epsilon = epsilon
        self.has_ga = False
        self.sizes: list[int] = []
        self._tmp_path = path + ".proteins.tmp"
        self._tmp = open(self._tmp_path, "wb")
        self._packer = msgpack.Packer(use_single_float=True, autoreset=True)

    def set_has_ga(self, has_ga: bool) -> None:
        self.has_ga = has_ga

    def pack_profile(self, p: FrameProfile) -> None:
        blob = pack_protein(self._packer, p)
        self.sizes.append(len(blob))
        self._tmp.write(blob)

    def close(self) -> str:
        self._tmp.close()
        pk = self._packer
        with open(self.path, "wb") as fp:
            fp.write(pk.pack_map_header(2))
            fp.write(pk.pack("header"))
            fp.write(pk.pack_map_header(8))
            fp.write(pk.pack("magic_number"))
            fp.write(pk.pack(MAGIC_NUMBER))
            fp.write(pk.pack("version"))
            fp.write(pk.pack(DATABASE_VERSION))
            fp.write(pk.pack("entry_dist"))
            fp.write(pk.pack(self.entry_dist))
            fp.write(pk.pack("epsilon"))
            fp.write(pk.pack(float(self.epsilon)))
            fp.write(pk.pack("abc"))
            fp.write(_pack_abc(pk, DNA_SYMBOLS, TYPEID_DNA))
            fp.write(pk.pack("amino"))
            fp.write(_pack_abc(pk, AMINO_SYMBOLS, TYPEID_AMINO))
            fp.write(pk.pack("has_ga"))
            fp.write(pk.pack(self.has_ga))
            fp.write(pk.pack("protein_sizes"))
            fp.write(pk.pack_array_header(len(self.sizes)))
            for s in self.sizes:
                fp.write(pk.pack(s))
            fp.write(pk.pack("proteins"))
            fp.write(pk.pack_array_header(len(self.sizes)))
            with open(self._tmp_path, "rb") as tmp:
                while True:
                    chunk = tmp.read(1 << 22)
                    if not chunk:
                        break
                    fp.write(chunk)
        os.unlink(self._tmp_path)
        return self.path


def pack_protein(packer, p: FrameProfile) -> bytes:
    """Serialize one pressed profile (protein.c:234-284 layout)."""
    null_q = nuclt_marginal_lprobs(p.null_codon_lprobs.astype(np.float64))
    bg_q = nuclt_marginal_lprobs(p.bg_codon_lprobs.astype(np.float64))
    null_marg = frame.codon_marginals(p.null_codon_lprobs.astype(np.float64))
    bg_marg = frame.codon_marginals(p.bg_codon_lprobs.astype(np.float64))
    match_q = nuclt_marginal_lprobs(p.match_codon_lprobs.astype(np.float64))
    match_marg = frame.codon_marginals(p.match_codon_lprobs.astype(np.float64))

    out = [packer.pack_map_header(10)]
    w = out.append
    w(packer.pack("accession"))
    w(packer.pack(p.accession))
    w(packer.pack("gencode"))
    w(packer.pack(p.gencode_id))
    w(packer.pack("consensus"))
    w(packer.pack(p.consensus))
    w(packer.pack("core_size"))
    w(packer.pack(p.core_size))
    w(packer.pack("null_nuclt_dist"))
    w(_pack_nuclt_dist(packer, null_q, null_marg))
    w(packer.pack("null_emission"))
    w(_f32bin(packer, p.null_emission))
    w(packer.pack("bg_nuclt_dist"))
    w(_pack_nuclt_dist(packer, bg_q, bg_marg))
    w(packer.pack("bg_emission"))
    w(_f32bin(packer, p.bg_emission))
    w(packer.pack("nodes"))
    K1 = p.core_size + 1
    w(packer.pack_map_header(K1 * 3))
    for i in range(K1):
        w(packer.pack("nuclt_dist"))
        w(_pack_nuclt_dist(packer, match_q[i], match_marg[i]))
        w(packer.pack("trans"))
        w(_f32bin(packer, p.trans[i]))
        w(packer.pack("emission"))
        w(_f32bin(packer, p.match_emission[i]))
    w(packer.pack("BMk"))
    w(_f32bin(packer, p.BMk))
    return b"".join(out)


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------


class DcpFormatError(ValueError):
    pass


@dataclass
class DcpHeader:
    magic_number: int
    version: int
    entry_dist: int
    epsilon: float
    abc: str
    amino: str
    has_ga: bool
    protein_sizes: list[int]


def _pairs(obj):
    """Normalize an unpacked map (list of pairs) to iterable of pairs."""
    if isinstance(obj, dict):
        return list(obj.items())
    return obj


def _as_map(obj) -> dict:
    d = {}
    for k, v in _pairs(obj):
        d.setdefault(k, v)
    return d


class DcpReader:
    """Random-access .dcp reader (database_reader.c semantics).

    Validates magic/version/epsilon (database_reader.c:37-75); exposes
    header metadata, per-protein byte offsets, and lazy profile decoding.
    """

    def __init__(self, path: str):
        self.path = path
        self._fp = open(path, "rb")
        self._read_header()

    def close(self):
        self._fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _read_header(self) -> None:
        unpacker = msgpack.Unpacker(
            self._fp, object_pairs_hook=lambda ps: ps, strict_map_key=False,
            max_buffer_size=1 << 31)
        try:
            self._parse_header(unpacker)
        except DcpFormatError:
            raise
        except Exception as exc:  # malformed msgpack, bad unicode, EOF...
            raise DcpFormatError(f"corrupt .dcp file: {exc}") from exc

    def _parse_header(self, unpacker) -> None:
        top_n = unpacker.read_map_header()
        if top_n != 2:
            raise DcpFormatError("expected top-level map(2)")
        key = unpacker.unpack()
        if key != "header":
            raise DcpFormatError("expected 'header' key")
        header = _as_map(unpacker.unpack())
        if header.get("magic_number") != MAGIC_NUMBER:
            raise DcpFormatError("bad magic number")
        if header.get("version") != DATABASE_VERSION:
            raise DcpFormatError("unsupported database version")
        eps = float(header["epsilon"])
        if not (0.0 <= eps <= 1.0):
            raise DcpFormatError("epsilon out of range")
        self.header = DcpHeader(
            magic_number=header["magic_number"],
            version=header["version"],
            entry_dist=header["entry_dist"],
            epsilon=eps,
            abc=_as_map(header["abc"])["symbols"],
            amino=_as_map(header["amino"])["symbols"],
            has_ga=bool(header["has_ga"]),
            protein_sizes=list(header["protein_sizes"]),
        )
        key = unpacker.unpack()
        if key != "proteins":
            raise DcpFormatError("expected 'proteins' key")
        n = unpacker.read_array_header()
        if n != len(self.header.protein_sizes):
            raise DcpFormatError("protein count mismatch")
        # File offset where protein 0 starts = bytes unpacked so far
        # (Unpacker.tell counts consumed bytes, independent of read-ahead).
        base = unpacker.tell()
        self._base = base
        sizes = self.header.protein_sizes
        self._offsets = np.concatenate([[0], np.cumsum(sizes)])[:-1] + base

    @property
    def num_proteins(self) -> int:
        return len(self.header.protein_sizes)

    def protein_blob(self, idx: int) -> bytes:
        self._fp.seek(self._offsets[idx])
        return self._fp.read(self.header.protein_sizes[idx])

    def read_profile(self, idx: int) -> FrameProfile:
        return unpack_protein(self.protein_blob(idx), self.header)

    def __iter__(self):
        for i in range(self.num_proteins):
            yield self.read_profile(i)


def unpack_protein(blob: bytes, header: DcpHeader) -> FrameProfile:
    unpacker = msgpack.Unpacker(
        _io.BytesIO(blob), object_pairs_hook=lambda ps: ps,
        strict_map_key=False, max_buffer_size=1 << 31)
    n = unpacker.read_map_header()
    if n != 10:
        raise DcpFormatError("expected protein map(10)")
    fields = {}
    for _ in range(10):
        k = unpacker.unpack()
        if k == "nodes":
            nk = unpacker.read_map_header()
            nodes = []
            for _ in range(nk):
                nodes.append((unpacker.unpack(), unpacker.unpack()))
            fields["nodes"] = nodes
        else:
            fields[k] = unpacker.unpack()

    K = fields["core_size"]
    node_items = fields["nodes"]
    if len(node_items) != (K + 1) * 3:
        raise DcpFormatError("bad nodes map size")
    trans = np.zeros((K + 1, 7), np.float32)
    match_em = np.zeros((K + 1, NODE_SIZE), np.float32)
    match_marg = np.zeros((K + 1, 5, 5, 5), np.float32)
    ni = 0
    for key, val in node_items:
        i = ni // 3
        if key == "nuclt_dist":
            _, codonm = val
            match_marg[i] = np.frombuffer(codonm, "<f4").reshape(5, 5, 5)
        elif key == "trans":
            trans[i] = np.frombuffer(val, "<f4")
        elif key == "emission":
            match_em[i] = np.frombuffer(val, "<f4")
        else:
            raise DcpFormatError(f"unexpected node key {key!r}")
        ni += 1

    def codons_from_marg(marg: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(marg[..., :4, :4, :4])

    null_marg = np.frombuffer(fields["null_nuclt_dist"][1], "<f4").reshape(5, 5, 5)
    bg_marg = np.frombuffer(fields["bg_nuclt_dist"][1], "<f4").reshape(5, 5, 5)

    return FrameProfile(
        accession=fields["accession"],
        name=fields["accession"],
        core_size=K,
        consensus=fields["consensus"],
        gencode_id=fields["gencode"],
        epsilon=header.epsilon,
        entry_dist=header.entry_dist,
        has_ga=header.has_ga,
        trans=trans,
        BMk=np.frombuffer(fields["BMk"], "<f4").copy(),
        match_emission=match_em,
        null_emission=np.frombuffer(fields["null_emission"], "<f4").copy(),
        bg_emission=np.frombuffer(fields["bg_emission"], "<f4").copy(),
        match_codon_lprobs=codons_from_marg(match_marg),
        null_codon_lprobs=codons_from_marg(null_marg[None])[0],
        bg_codon_lprobs=codons_from_marg(bg_marg[None])[0],
    )


def read_dcp_profiles(path: str) -> tuple[DcpHeader, list[FrameProfile]]:
    with DcpReader(path) as r:
        return r.header, list(r)
