"""Alignment rendering for `see` (parity target: snap/deciphon_snap/view.py).

The reference renders Deciphon and HMMER alignments side by side, joining
on amino positions read from the h3r domain records.  The HMMER overlay
needs the h3r parser (hmmer/h3result.py); until a product carries a parsed
h3result this renders the Deciphon side: per hit, blocks of aligned rows

  state  <state names, one column per step>
  amino  <decoded amino acid per emitting step>
  query  <emitted nucleotide fragment, '.'-padded per column>

Columns are per match-list step; blocks wrap at `width` display columns.
"""

from __future__ import annotations

from .prod import Prod, ProdList

__all__ = ["view_alignments", "view_alignment"]


def view_alignment(prod: Prod, width: int = 96) -> str:
    out = []
    for hit in prod.hits:
        matches = hit.matches
        cols = []
        for m in matches:
            q = m.query or "-"
            a = m.amino or "-"
            s = m.state
            w = max(len(q), len(a), len(s))
            cols.append((s.ljust(w), a.ljust(w), q.ljust(w)))

        header = (f"{prod.profile} hit {hit.id} "
                  f"query {hit.interval.r.start}..{hit.interval.r.stop} "
                  f"lrt {prod.lrt:.1f} evalue {prod.evalue:.2g}")
        out.append(header)
        block_s, block_a, block_q, wsum = [], [], [], 0
        for s, a, q in cols:
            if wsum + len(s) + 1 > width and block_s:
                out.extend(_emit_block(block_s, block_a, block_q))
                block_s, block_a, block_q, wsum = [], [], [], 0
            block_s.append(s)
            block_a.append(a)
            block_q.append(q)
            wsum += len(s) + 1
        if block_s:
            out.extend(_emit_block(block_s, block_a, block_q))
    return "\n".join(out)


def _emit_block(ss, aa, qq):
    return ["state " + " ".join(ss), "amino " + " ".join(aa),
            "query " + " ".join(qq), ""]


def view_alignments(prods: ProdList, width: int = 96) -> str:
    return "\n".join(view_alignment(p, width) for p in prods)
