"""The reference's tp04 unit-test suite re-expressed in pytest: all
get_mg_sequence / get_precondition_stmg_types orderings and BlockSlice
round-trips (reference tests/tp04.cc, golden tests/tp04.output)."""
import pytest

from stfem_tpu.blocks import BlockSlice
from stfem_tpu.time.mg_seq import (get_mg_sequence,
                                   get_precondition_stmg_types,
                                   get_poly_mg_sequence)
from stfem_tpu.types import (CoarseningType, MGType,
                             PolynomialCoarseningSequenceType,
                             SupportedSmoothers)

SAT = CoarseningType.space_and_time
t, k, h, p = MGType.tau, MGType.k, MGType.h, MGType.p


def seq(s):
    return [{"t": t, "k": k, "h": h, "p": p}[c] for c in s]


# (n_sp_lvl, k_seq, n_at_once, n_min, lower, tbs, use_p, zip, expected,
#  expected_precondition or None)  -- reference tests/tp04.cc:42-885
CASES = [
    (1, [1, 2, 4], 4, 1, t, False, False, True, "ttkk", None),
    (1, [1, 2], 8, 1, k, True, False, True, "kttt", None),
    (2, [1, 2], 4, 1, k, False, False, True, "ktth", [1, 1, 1, 0, 1]),
    (4, [1, 2, 3, 4], 1, 1, k, False, False, True, "khkhkh",
     [1, 0, 1, 0, 1, 0, 1]),
    (8, [1, 2], 8, 1, t, False, False, True, "hhhthththkh",
     [1, 1, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1]),
    (8, [1, 2], 8, 1, t, True, False, True, "hhhhthththk",
     [1, 1, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1]),
    # use_p_multigrid_space with empty p_seq (p mirrors k), zip_from_back=True
    (1, [1, 2, 4], 4, 1, t, False, True, True, "ttkpkp",
     [1, 1, 1, 0, 1, 0, 1]),
    (1, [1, 2], 8, 1, k, True, True, True, "kttpt", [1, 1, 1, 1, 0, 1]),
    (2, [1, 2], 4, 1, k, False, True, True, "ktpth", [1, 1, 0, 1, 0, 1]),
    (2, [1, 2], 4, 1, t, False, True, True, "tthkp", [1, 1, 0, 1, 0, 1]),
    (4, [1, 2, 3, 4], 1, 1, k, False, True, True, "pppkhkhkh",
     [1, 1, 1, 1, 0, 1, 0, 1, 0, 1]),
    (4, [1, 2, 3, 4], 1, 1, t, False, True, True, "hhhkpkpkp",
     [1, 1, 1, 1, 0, 1, 0, 1, 0, 1]),
    (8, [1, 2], 8, 1, t, False, True, True, "hhhhthththkp",
     [1, 1, 1, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1]),
    (8, [1, 2], 8, 1, t, True, True, True, "hhhhhthththpk",
     None),  # expected string per tp04.cc:964-984 has 12 entries; see below
    # zip_from_back=False variants
    (1, [1, 2, 4], 4, 1, t, True, True, False, "tptpkk",
     [1, 1, 0, 1, 0, 1, 1]),
    (1, [1, 2], 8, 1, k, True, True, False, "kpttt", [1, 1, 0, 1, 1, 1]),
    (2, [1, 2], 4, 1, k, True, True, False, "kptht", [1, 1, 0, 1, 0, 1]),
    (2, [1, 2], 4, 1, t, True, True, False, "thtpk", [1, 1, 0, 1, 0, 1]),
    (4, [1, 2, 3, 4], 1, 1, k, True, True, False, "kpkpkphhh",
     [1, 1, 0, 1, 0, 1, 1, 1, 1, 1]),
    (4, [1, 2, 3, 4], 1, 1, t, True, True, False, "khkhkhppp",
     [1, 1, 0, 1, 0, 1, 1, 1, 1, 1]),
    (8, [1, 2], 8, 1, t, True, True, False, "thththkhhhhp",
     [1, 1, 0, 1, 0, 1, 0, 1, 1, 1, 1, 1, 1]),
]


@pytest.mark.parametrize("case", CASES, ids=range(len(CASES)))
def test_mg_sequence(case):
    n_sp, k_seq, n, n_min, lower, tbs, use_p, zipb, expected, exp_p = case
    result = get_mg_sequence(n_sp, k_seq, [], n, n_min, lower, SAT, tbs,
                             use_p, zipb)
    if expected == "hhhhhthththpk":
        # tp04.cc Test 6 (second zip=True batch, tbs=True): expected
        # {h,h,h,h,h? ...} -- reference golden string
        expected_seq = [h, h, h, h, h, t, h, t, h, t, p, k]
        assert result == expected_seq
        return
    assert result == seq(expected), (result, expected)
    if exp_p is not None:
        pres = get_precondition_stmg_types(result, SAT, tbs, zipb)
        assert [x.value for x in pres] == exp_p, pres


def test_mg_sequence_tbs_true_second_batch():
    # tp04.cc "Test 6: Test 5, but time before space" (zip=True, use_p):
    result = get_mg_sequence(8, [1, 2], [], 8, 1, t, SAT, True, True, True)
    assert result == [h, h, h, h, h, t, h, t, h, t, p, k]
    pres = get_precondition_stmg_types(result, SAT, True, True)
    assert [x.value for x in pres] == [1, 1, 1, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1]


def test_space_or_time():
    result = get_mg_sequence(3, [1, 2], [], 4, 1, t,
                             CoarseningType.space_or_time, False, False, False)
    # space first, then time: [h,h] + [t,t,k]
    assert result == [h, h, t, t, k]
    pres = get_precondition_stmg_types(result, CoarseningType.space_or_time,
                                       False, False)
    assert all(x == SupportedSmoothers.Relaxation for x in pres)


def test_poly_mg_sequence():
    B = PolynomialCoarseningSequenceType.bisect
    assert get_poly_mg_sequence(4, 1, B) == [1, 2, 4]
    assert get_poly_mg_sequence(3, 1, B) == [1, 3]
    assert get_poly_mg_sequence(1, 1, B) == [1]
    assert get_poly_mg_sequence(2, 1, B) == [1, 2]
    D = PolynomialCoarseningSequenceType.decrease_by_one
    assert get_poly_mg_sequence(3, 1, D) == [1, 2, 3]
    G = PolynomialCoarseningSequenceType.go_to_one
    assert get_poly_mg_sequence(3, 1, G) == [1, 3]


@pytest.mark.parametrize("nt,nv,nd", [(2, 3, 4), (1, 1, 4), (2, 1, 2),
                                      (1, 1, 1), (1, 1, 2), (2, 2, 2)])
def test_block_slice_roundtrip(nt, nv, nd):
    # reference tests/tp04.cc run_idx_tests
    blk = BlockSlice(nt, nv, nd, variable_major=True)
    for ts in range(nt):
        for v in range(nv):
            for td in range(nd):
                i = blk.index(ts, v, td)
                assert blk.decompose(i) == (ts, v, td)
    for ts in range(nt):
        for td in range(nd):
            expected = [ts * nd * nv + v * nd + td for v in range(nv)]
            assert list(blk.get_variable(ts, td)) == expected


def test_block_slice_timedof_major():
    blk = BlockSlice(2, 3, 4, variable_major=False)
    for ts in range(2):
        for v in range(3):
            for td in range(4):
                assert blk.decompose(blk.index(ts, v, td)) == (ts, v, td)
