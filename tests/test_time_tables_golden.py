"""Golden-value parity of the time-weight tables vs the reference's
tests/tp_02.output.

The committed golden predates the current tp_02.cc main() (it has no
Evolutionary/Extrapolation sections and a different Stokes list), so instead
of regenerating the file wholesale we parse ITS section headers and verify
every printed matrix against our tables.  This pins the numerical values of:
CG/DG weights r=1..5, wave Schur tables, multi-step assemblies (2,3,4 steps),
and the Stokes two-variable expansions.
"""
import re
from pathlib import Path

import numpy as np
import pytest

from stfem_tpu.types import TimeStepType
from stfem_tpu.time import tables as T
from stfem_tpu.utils.printing import print_formatted

GOLDEN = Path("/root/reference/tests/tp_02.output")
CGP, DG = TimeStepType.CGP, TimeStepType.DG


def parse_golden(text):
    """Split into (header, [matrix_text_blocks]) sections."""
    sections = []
    cur_header = None
    cur_blocks = []
    cur_lines = []
    for ln in text.split("\n"):
        if re.match(r"^[A-Za-z]", ln):
            if cur_header is not None:
                if cur_lines:
                    cur_blocks.append(cur_lines)
                    cur_lines = []
                sections.append((cur_header, cur_blocks))
                cur_blocks = []
            cur_header = ln.strip()
        elif ln == "":  # true separators are empty; all-space lines are
            # zero-rows of a matrix and must stay part of the block
            if cur_lines:
                cur_blocks.append(cur_lines)
                cur_lines = []
        else:
            cur_lines.append(ln)
    if cur_header is not None:
        if cur_lines:
            cur_blocks.append(cur_lines)
        sections.append((cur_header, cur_blocks))
    return sections


def fmt(m):
    return print_formatted(m).rstrip("\n").split("\n")


def expected_blocks(header, prev_header):
    """Return the list of matrices a golden section should contain."""
    m = re.match(r"^(CG|DG)\((\d+)\)$", header)
    if m:
        tt = CGP if m.group(1) == "CG" else DG
        r = int(m.group(2))
        if tt == CGP:
            mass, der = T.get_cg_weights(r)
            return [mass, der], (tt, r)
        jump = T.get_dg_weights(r)[2]
        mass, der_jump, _ = T.get_dg_weights(r)
        return [jump, mass, der_jump], (tt, r)
    if header == "Waves":  # follows a basic CG(r)/DG(r) section
        tt, r = prev_header
        if tt == CGP:
            a, b, g, z = T.split_lhs_rhs_cg(*T.get_cg_weights(r))
        else:
            mass, der_jump, jump = T.get_dg_weights(r)
            a, b, g, z = mass, der_jump, jump, np.zeros((r + 1, 1))
        return list(T.get_fe_time_weights_wave(tt, a, b, g, z)), None
    m = re.match(r"^(CG|DG)\((\d+)\) - (\d+) timesteps in one system$", header)
    if m:
        tt = CGP if m.group(1) == "CG" else DG
        r, nt = int(m.group(2)), int(m.group(3))
        return list(T.get_fe_time_weights(tt, r, 1.0, nt)), None
    m = re.match(r"^Waves (CG|DG)\((\d+)\) - (\d+) timesteps in one system$",
                 header)
    if m:
        tt = CGP if m.group(1) == "CG" else DG
        r, nt = int(m.group(2)), int(m.group(3))
        tw1 = T.get_fe_time_weights(tt, r, 1.0, 1)
        return list(T.get_fe_time_weights_wave(tt, *tw1,
                                               n_timesteps_at_once=nt)), None
    m = re.match(r"^Stokes (CG|DG)\((\d+)\) - (\d+) timesteps in one system$",
                 header)
    if m:
        tt = CGP if m.group(1) == "CG" else DG
        r, nt = int(m.group(2)), int(m.group(3))
        return list(T.get_fe_time_weights_stokes(tt, r, 1.0, nt)), None
    return None, None


@pytest.mark.skipif(not GOLDEN.exists(), reason="reference golden not mounted")
def test_tp02_golden_parity():
    sections = parse_golden(GOLDEN.read_text())
    assert len(sections) > 40
    n_checked = 0
    prev = None
    for header, blocks in sections:
        mats, state = expected_blocks(header, prev)
        if state is not None:
            prev = state
        assert mats is not None, f"unrecognized golden section: {header!r}"
        assert len(mats) == len(blocks), \
            (header, len(mats), len(blocks))
        for mi, (mat, blk) in enumerate(zip(mats, blocks)):
            mat = np.atleast_2d(mat)
            assert mat.shape[0] == len(blk), (header, mi, mat.shape, len(blk))
            for i, line in enumerate(blk):
                ncols = (len(line) + 6) // 7
                assert ncols <= mat.shape[1], (header, mi, line)
                for j in range(mat.shape[1]):
                    field = line[7 * j:7 * (j + 1)] if 7 * j < len(line) else ""
                    if field.strip() == "":
                        assert abs(mat[i, j]) < 0.0105, \
                            (header, mi, i, j, mat[i, j])
                    else:
                        # golden prints %7.2f; allow half an ulp of print
                        assert abs(mat[i, j] - float(field)) <= 0.00500001, \
                            (header, mi, i, j, mat[i, j], field)
            n_checked += 1
    # the golden pins >100 matrices; make sure we actually compared them
    assert n_checked > 100, n_checked
