"""Parser for the reference's golden table outputs
(/root/reference/tests/tp_01.output and tp_03stokes.output).

Structure (produced by tests/tp_01.cc:735-768 / tp_03stokes.cc): a run is a
sequence of config sections; each section has one degree block per
nDegCycles; each block prints per-refinement ":: ..." info lines with an
"Average GMRES iterations" line, then "Convergence table k=K" with one data
row per refinement (errors with interleaved observed rates), and the section
closes with an "Iteration count table".
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class GoldenRow:
    cells: int
    s_dofs: int
    t_dofs: int
    st_dofs: int
    work: int
    errors: list[float]          # error columns, table order
    rates: list[float | None]    # observed rate after each error (None = '-')


@dataclass
class GoldenBlock:
    k: int
    avg_iters: list[float]       # one per refinement, table order
    rows: list[GoldenRow] = field(default_factory=list)


@dataclass
class GoldenSection:
    blocks: list[GoldenBlock] = field(default_factory=list)


_ITER_RE = re.compile(r"Average GMRES iterations ([0-9.]+) \(")
_TABLE_RE = re.compile(r"Convergence table k=(\d+)")


def parse_golden(path: str) -> list[GoldenSection]:
    with open(path, encoding="utf-8") as f:
        lines = f.readlines()
    sections: list[GoldenSection] = []
    cur = GoldenSection()
    pending_iters: list[float] = []
    i = 0
    while i < len(lines):
        line = lines[i]
        m = _ITER_RE.search(line)
        if m:
            pending_iters.append(float(m.group(1)))
            i += 1
            continue
        m = _TABLE_RE.search(line)
        if m:
            blk = GoldenBlock(k=int(m.group(1)), avg_iters=pending_iters)
            pending_iters = []
            i += 2  # skip header line
            while i < len(lines) and lines[i].strip():
                toks = lines[i].split()
                ints = [int(t) for t in toks[:5]]
                # tokens alternate: error value, observed rate (or '-')
                errs: list[float] = []
                rates: list[float | None] = []
                expect_err = True
                for t in toks[5:]:
                    if expect_err:
                        errs.append(float(t))
                        expect_err = False
                    else:
                        rates.append(None if t == "-" else float(t))
                        expect_err = True
                blk.rows.append(GoldenRow(*ints, errors=errs, rates=rates))
                i += 1
            assert len(blk.avg_iters) == len(blk.rows), \
                (path, blk.k, blk.avg_iters, len(blk.rows))
            cur.blocks.append(blk)
            continue
        if "Iteration count table" in line:
            sections.append(cur)
            cur = GoldenSection()
            pending_iters = []
        i += 1
    return sections
