"""Formulation-symmetry detection and breaking.

TPU-era replacement for the reference's symmetry stack
(src/symmetry/compute_symmetry_bliss.cpp builds a colored graph of the
MISDP and calls the bliss graph-automorphism library;
src/scipsdp/sdpsymmetry.c collects the SDP data for it;
prop_sdpsymmetry.c applies orbital fixing).  Here:

1. candidate variable orbits come from iterative color refinement (1-WL)
   on the variable/constraint incidence structure — the same signatures
   bliss's graph encodes;
2. each candidate adjacent transposition is verified EXACTLY by applying the
   swap and comparing canonical forms of the constraint system (rows and
   blocks may permute as sets; block index structure must match);
3. verified orbits get lexicographic symmetry-breaking rows
   y_{o_1} >= y_{o_2} >= ... (valid whenever the orbit's full symmetric
   group acts, which chained verified adjacent transpositions generate).

Opt-in via ``Settings.use_symmetry`` (the reference gates its symmetry
handling behind SCIP versions/params too).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP


def _var_signatures(prob: MISDP, rounds: int = 4) -> np.ndarray:
    """Color refinement: hashable signatures invariant under symmetry."""
    m = prob.nvars
    D = prob.lp.dense(m)
    base = [
        hash((round(float(prob.obj[j]), 9), round(float(prob.lb[j]), 9),
              round(float(prob.ub[j]), 9), bool(prob.integral[j])))
        for j in range(m)
    ]
    colors = np.array(base, dtype=np.int64)
    for _ in range(rounds):
        rowsig = []
        for i in range(prob.lp.nrows):
            nz = np.nonzero(D[i])[0]
            rowsig.append(hash((
                round(float(prob.lp.lhs[i]), 9),
                round(float(prob.lp.rhs[i]), 9),
                tuple(sorted((round(float(D[i, j]), 9), int(colors[j]))
                             for j in nz)),
            )))
        blocksig = []
        for blk in prob.blocks:
            # position-invariant within the block: only diagonal-ness and
            # values enter (index permutations must not change signatures)
            ent = tuple(sorted(
                (bool(r == c), round(float(v), 9), int(colors[j]))
                for j, r, c, v in zip(blk.var, blk.row, blk.col, blk.val)))
            cst = tuple(sorted(
                (bool(r == c), round(float(v), 9))
                for r, c, v in zip(blk.const_row, blk.const_col,
                                   blk.const_val)))
            blocksig.append(hash((blk.size, blk.rank1, ent, cst)))
        newc = []
        for j in range(m):
            inrows = tuple(sorted(
                (rowsig[i], round(float(D[i, j]), 9))
                for i in np.nonzero(D[:, j])[0])) if prob.lp.nrows else ()
            inblocks = []
            for k, blk in enumerate(prob.blocks):
                mask = blk.var == j
                if mask.any():
                    ent = tuple(sorted(
                        (bool(r == c), round(float(v), 9))
                        for r, c, v in zip(blk.row[mask], blk.col[mask],
                                           blk.val[mask])))
                    inblocks.append((blocksig[k], ent))
            newc.append(hash((int(colors[j]), inrows,
                              tuple(sorted(inblocks)))))
        colors = np.array(newc, dtype=np.int64)
    return colors


def _block_entry_map(blk):
    """(i, j) -> sorted ((var, val)...) incl. the constant part as var -1."""
    ent = {}
    for j, r, c, v in zip(blk.var, blk.row, blk.col, blk.val):
        key = (int(max(r, c)), int(min(r, c)))
        ent.setdefault(key, []).append((int(j), round(float(v), 9)))
    for r, c, v in zip(blk.const_row, blk.const_col, blk.const_val):
        key = (int(max(r, c)), int(min(r, c)))
        ent.setdefault(key, []).append((-1, round(float(v), 9)))
    return {k: tuple(sorted(vs)) for k, vs in ent.items()}


def _block_iso(blk1, blk2, max_n: int = 16) -> bool:
    """Exact test: does an index permutation map blk1 onto blk2?

    Backtracking over index assignments with invariant pruning; blocks
    larger than ``max_n`` are rejected (conservative)."""
    n = blk1.size
    if n != blk2.size or blk1.rank1 != blk2.rank1:
        return False
    e1 = _block_entry_map(blk1)
    e2 = _block_entry_map(blk2)
    if len(e1) != len(e2):
        return False
    if e1 == e2:
        return True
    if n > max_n:
        return False

    def label(em, i, j):
        return em.get((max(i, j), min(i, j)), ())

    # index invariants: diagonal label + multiset of incident labels
    def inv(em, i):
        return (label(em, i, i),
                tuple(sorted(label(em, i, t) for t in range(n) if t != i)))

    inv1 = [inv(e1, i) for i in range(n)]
    inv2 = [inv(e2, i) for i in range(n)]
    if sorted(inv1) != sorted(inv2):
        return False

    perm = [-1] * n
    used = [False] * n

    def bt(i):
        if i == n:
            return True
        for t in range(n):
            if used[t] or inv1[i] != inv2[t]:
                continue
            ok = all(label(e1, i, k) == label(e2, t, perm[k])
                     for k in range(i))
            if not ok:
                continue
            perm[i] = t
            used[t] = True
            if bt(i + 1):
                return True
            used[t] = False
            perm[i] = -1
        return False

    return bt(0)


def _equivalent(probA: MISDP, probB: MISDP) -> bool:
    """Are the two problems identical up to row permutations and
    within/between-block permutations?"""
    m = probA.nvars
    if (not np.array_equal(np.round(probA.obj, 9), np.round(probB.obj, 9))
            or not np.array_equal(np.round(probA.lb, 9), np.round(probB.lb, 9))
            or not np.array_equal(np.round(probA.ub, 9), np.round(probB.ub, 9))
            or not np.array_equal(probA.integral, probB.integral)):
        return False
    DA = probA.lp.dense(m)
    DB = probB.lp.dense(m)

    def rowset(D, lp):
        return sorted(
            (round(float(lp.lhs[i]), 9), round(float(lp.rhs[i]), 9),
             tuple(sorted((int(j), round(float(D[i, j]), 9))
                          for j in np.nonzero(D[i])[0])))
            for i in range(lp.nrows))

    if rowset(DA, probA.lp) != rowset(DB, probB.lp):
        return False
    # match blocks (bipartite, tiny counts: greedy with backtracking-lite)
    unmatched = list(range(len(probB.blocks)))
    for ba in probA.blocks:
        hit = None
        for t in unmatched:
            if _block_iso(ba, probB.blocks[t]):
                hit = t
                break
        if hit is None:
            return False
        unmatched.remove(hit)
    return True


def _canon(prob: MISDP) -> tuple:
    """Canonical form: rows and blocks as sorted sets (block row/col
    structure kept fixed — conservative, may miss symmetries but never
    accepts a false one)."""
    m = prob.nvars
    D = prob.lp.dense(m)
    rows = tuple(sorted(
        (round(float(prob.lp.lhs[i]), 9), round(float(prob.lp.rhs[i]), 9),
         tuple(sorted((int(j), round(float(D[i, j]), 9))
                      for j in np.nonzero(D[i])[0])))
        for i in range(prob.lp.nrows)))
    blocks = tuple(sorted(
        (blk.size, bool(blk.rank1),
         tuple(sorted((int(j), int(r), int(c), round(float(v), 9))
                      for j, r, c, v in zip(blk.var, blk.row, blk.col,
                                            blk.val))),
         tuple(sorted((int(r), int(c), round(float(v), 9))
                      for r, c, v in zip(blk.const_row, blk.const_col,
                                        blk.const_val))))
        for blk in prob.blocks))
    objs = tuple(round(float(v), 9) for v in prob.obj)
    bnds = tuple((round(float(a), 9), round(float(b), 9), bool(c))
                 for a, b, c in zip(prob.lb, prob.ub, prob.integral))
    return rows, blocks, objs, bnds


def _swapped(prob: MISDP, j1: int, j2: int) -> MISDP:
    perm = np.arange(prob.nvars)
    perm[j1], perm[j2] = j2, j1
    inv = perm  # transposition is its own inverse
    lp = prob.lp
    newind = inv[lp.ind]
    newlp = LinearConstraints(lp.nrows, lp.beg.copy(), newind,
                              lp.val.copy(), lp.lhs.copy(), lp.rhs.copy())
    newblocks = [dataclasses.replace(b, var=inv[b.var]) for b in prob.blocks]
    return dataclasses.replace(
        prob,
        obj=prob.obj[perm], lb=prob.lb[perm], ub=prob.ub[perm],
        integral=prob.integral[perm], blocks=newblocks, lp=newlp,
    )


def find_orbits(prob: MISDP, max_orbit_vars: int = 64) -> List[List[int]]:
    """Verified variable orbits (size >= 2) under exact transposition
    symmetry.  Conservative: only symmetries expressible without
    permuting rows/columns *within* SDP blocks are found."""
    if prob.indicators:
        return []
    colors = _var_signatures(prob)
    orbits: List[List[int]] = []
    seen = set()
    for col in np.unique(colors):
        cand = [int(j) for j in np.where(colors == col)[0] if j not in seen]
        if len(cand) < 2 or len(cand) > max_orbit_vars:
            continue
        # verify the chain of adjacent transpositions exactly
        verified = [cand[0]]
        for a, bvar in zip(cand, cand[1:]):
            if _equivalent(_swapped(prob, a, bvar), prob):
                verified.append(bvar)
            else:
                break
        if len(verified) >= 2:
            orbits.append(verified)
            seen.update(verified)
    return orbits


def symmetry_breaking_rows(prob: MISDP) -> List[tuple]:
    """Lexicographic ordering rows  y_{o_i} - y_{o_{i+1}} >= 0  per orbit
    (the simplest valid symresack/orbitope-style handling; orbital fixing
    follows implicitly through bound propagation)."""
    rows = []
    for orbit in find_orbits(prob):
        for a, bvar in zip(orbit, orbit[1:]):
            rows.append(([a, bvar], [1.0, -1.0], 0.0, INF))
    return rows
