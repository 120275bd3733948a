"""Full automorphism group + orbital fixing tests.

Reference roles: compute_symmetry_bliss.cpp (group computation) and
prop_sdpsymmetry.c (orbital fixing during B&B).
"""

import numpy as np

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.core.symmetry import (SymmetryGroup, automorphism_group,
                                       orbital_fixing)
from scipsdp_tpu.models.families import min_k_partition
from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP, SDPBlock
from scipsdp_tpu.utils.config import Settings


def _symmetric_prob():
    blk = SDPBlock(
        size=3, var=[0, 1, 2], row=[0, 1, 2], col=[0, 1, 2],
        val=[-1.0, -1.0, -1.0],
        const_row=[0, 1, 2], const_col=[0, 1, 2],
        const_val=[-1.0, -1.0, -1.0],
    )
    return MISDP(
        nvars=3, obj=np.array([-1.0, -1.0, -1.0]),
        lb=np.zeros(3), ub=np.ones(3), integral=np.ones(3, bool),
        blocks=[blk],
        lp=LinearConstraints.from_rows([([0, 1, 2], [1, 1, 1], -INF, 2.0)]),
        name="sym3",
    )


def test_group_full_symmetric():
    grp = automorphism_group(_symmetric_prob())
    assert grp.complete
    assert grp.nontrivial
    assert grp.orbits == [[0, 1, 2]]
    # every generator must be a real permutation
    for g in grp.generators:
        assert sorted(g.tolist()) == [0, 1, 2]


def test_group_trivial_after_perturbation():
    prob = _symmetric_prob()
    prob.obj[0] = -2.0
    grp = automorphism_group(prob)
    assert all(0 not in o for o in grp.orbits)


def test_group_beyond_transpositions():
    """A cyclic-only symmetry: y0->y1->y2->y0 is an automorphism but no
    single transposition is (the round-1 adjacent-transposition detector
    cannot see this orbit)."""
    # rows: y0 + 2 y1 <= 2 (cyclically): coefficient pattern only
    # invariant under the cyclic shift
    rows = [([0, 1], [1.0, 2.0], -INF, 2.0),
            ([1, 2], [1.0, 2.0], -INF, 2.0),
            ([2, 0], [1.0, 2.0], -INF, 2.0)]
    prob = MISDP(
        nvars=3, obj=np.array([-1.0, -1.0, -1.0]),
        lb=np.zeros(3), ub=np.ones(3), integral=np.ones(3, bool),
        blocks=[],
        lp=LinearConstraints.from_rows(rows),
        name="cyc3",
    )
    from scipsdp_tpu.core.symmetry import find_orbits
    assert find_orbits(prob) == []          # transpositions can't see it
    grp = automorphism_group(prob)
    assert grp.orbits == [[0, 1, 2]]        # the full group can


def test_orbital_fixing_rule():
    """Orbit {0,1,2}; 1-fixing var 0 drops generators moving it; a 0-fixed
    member of the remaining orbit fixes the rest to 0."""
    m = 4
    # generators of S3 on {0,1,2}, var 3 fixed
    g1 = np.array([1, 0, 2, 3])
    g2 = np.array([0, 2, 1, 3])
    grp = SymmetryGroup(m, [g1, g2], [[0, 1, 2]], True)
    integral = np.array([True, True, True, False])

    # no fixings -> nothing to do
    lb = np.zeros(m)
    ub = np.ones(m)
    _, new_ub, nf, inf0 = orbital_fixing(grp, lb, ub, integral)
    assert nf == 0 and not inf0

    # y1 fixed to 0: stabilizer of (empty ones) is the whole group ->
    # whole orbit goes to 0
    ub2 = ub.copy()
    ub2[1] = 0.0
    _, new_ub, nf, _ = orbital_fixing(grp, lb, ub2, integral)
    assert nf == 2
    assert new_ub[0] == 0.0 and new_ub[2] == 0.0 and new_ub[3] == 1.0

    # y0 BRANCHED to 1, y1 fixed to 0: only g2 (fixing 0 pointwise)
    # survives; orbit {1,2} -> y2 fixed to 0, y0 untouched
    lb3 = lb.copy()
    lb3[0] = 1.0
    _, new_ub, nf, _ = orbital_fixing(grp, lb3, ub2, integral,
                                      branched_ones={0})
    assert nf == 1
    assert new_ub[2] == 0.0 and new_ub[0] == 1.0

    # provenance-unknown fallback (branched_ones=None) pins all ones:
    # same result here
    _, new_ub, nf, _ = orbital_fixing(grp, lb3, ub2, integral)
    assert nf == 1 and new_ub[2] == 0.0

    # y0 fixed to 1 by PROPAGATION (no branched ones): whole group acts,
    # orbit {0,1,2} holds both a 1- and a 0-fixed member -> infeasible
    _, _, _, isinf = orbital_fixing(grp, lb3, ub2, integral,
                                    branched_ones=set())
    assert isinf

    # propagation-fixed 1 without any 0-fixed member: orbit fixes to 1
    lb4 = lb.copy()
    lb4[0] = 1.0
    new_lb, _, nf, isinf = orbital_fixing(grp, lb4, ub, integral,
                                          branched_ones=set())
    assert not isinf and nf == 2
    assert new_lb[1] == 1.0 and new_lb[2] == 1.0


def test_orbital_solve_parity_and_fixings():
    """Unit-weight complete-graph MkP: the edge variables form ONE orbit
    (S_n on pairs); orbital mode must keep the optimum, perform fixings,
    and not enlarge the tree."""
    import dataclasses

    prob = min_k_partition(nvertices=6, k=2, density=1.0, seed=0)
    prob = dataclasses.replace(
        prob, obj=np.where(prob.obj != 0, 1.5, 0.0))
    grp = automorphism_group(prob)
    assert grp.complete and grp.nontrivial
    assert [len(o) for o in grp.orbits] == [15]
    bb = Settings().bb.__class__(batch_size=8, turbo="off")
    res0 = solve_misdp(prob, Settings(bb=bb))
    res1 = solve_misdp(prob, Settings(
        use_symmetry=True, symmetry_mode="orbital", bb=bb))
    assert abs(res0.objval - res1.objval) < 1e-4
    assert res1.stats.orbital_fixings > 0
    assert res1.stats.nodes <= res0.stats.nodes


def test_orbital_no_crosstalk_with_lexrows():
    """orbital mode must not also add lex rows (they would break the very
    symmetry orbital fixing exploits)."""
    prob = _symmetric_prob()
    res = solve_misdp(prob, Settings(use_symmetry=True,
                                     symmetry_mode="orbital"))
    assert abs(res.objval - (-2.0)) < 1e-4
