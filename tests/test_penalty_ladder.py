"""Penalty-ladder decision rule (reference src/sdpi/sdpi.c:3497-3599).

The rung-3 escalation loop must reproduce the reference's per-solve
decision between "raise Gamma" and "tighten gaptol toward MIN_GAPTOL":

* solver not acceptable                  -> Gamma *= penaltyparamfact
* converged, r <= feastol (``feasorig``) -> accept, objective minus Gamma*r
* converged, r > feastol, Tr(X) ~ Gamma  -> penalty bound binds: raise Gamma
  (``penaltybound``, PENALTYBOUNDTOL, sdpisolver_dsdp.c:61,1687)
* converged, r > feastol, bound slack    -> tighten gaptol (gaptolfact)

The per-solve budget must yield TIMELIMIT (SCIPsdpiIsTimelimExc analog).

These tests script the solver outputs (monkeypatched ``_run``) so each
branch is forced deterministically, then assert the ladder's observable
decisions (Gamma / gaptol sequences passed to the solver, final statuses).
"""

import numpy as np
import pytest

from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP, densify
from scipsdp_tpu.ops.ipm import SolveOutput
from scipsdp_tpu.utils.config import IPMSettings, Settings
from scipsdp_tpu.utils.status import SolverResultStatus


def _tiny_problem():
    return MISDP(
        nvars=1,
        obj=np.array([1.0]),
        lb=np.array([0.0]),
        ub=np.array([2.0]),
        integral=np.zeros(1, dtype=bool),
        blocks=[],
        lp=LinearConstraints.from_rows([([0], [1.0], 0.5, INF)]),
        name="tiny",
    )


class ScriptedRuns:
    """Replaces SDPInterface._run with a scripted output sequence and
    records the (gamma, gaptol) the ladder chose for each call."""

    def __init__(self, iface, script):
        self.iface = iface
        self.script = list(script)
        self.calls = []          # (gamma, gaptol) per call
        self.m = iface.m

    def __call__(self, b, lb, ub, cuts=None, warm_y=None, warm_mask=None,
                 f32=False, gaptol=None, warm_X=None, feastol_vec=None):
        B = b.shape[0]
        self.calls.append((float(b[0, self.m]),
                           None if gaptol is None else float(
                               np.asarray(gaptol)[0])))
        status, r, xlb_r, dobj = self.script.pop(0)
        mp = self.m + 1
        y = np.zeros((B, mp))
        # feasible primal point (y0=1 satisfies y0 >= 0.5 and the box) so
        # accepted solutions pass the independent verification rung
        y[:, 0] = 1.0
        y[:, self.m] = r
        xlb = np.zeros((B, mp))
        xlb[:, self.m] = xlb_r
        return SolveOutput(
            status=np.full(B, int(status), np.int32),
            dobj=np.full(B, dobj),
            y=y,
            r=np.full(B, r),
            gap=np.zeros(B),
            pinf=np.zeros(B),
            dinf=np.zeros(B),
            iters=np.asarray(0),
            X=tuple(np.zeros((B, 1, 1, 1))),
            xl=np.zeros((B, 1)),
            xlb=xlb,
            xub=np.zeros((B, mp)),
        )


def _make_iface(npenaltyincr=2):
    prob = _tiny_problem()
    s = Settings(ipm=IPMSettings(penaltyparam=10.0, maxpenaltyparam=1000.0,
                                 npenaltyincr=npenaltyincr,
                                 onevar=False))
    return SDPInterface(densify(prob), s), s


F = int(SolverResultStatus.FAILED)
OPT = int(SolverResultStatus.OPTIMAL)


def test_penaltybound_active_raises_gamma():
    """Converged penalty solves with Tr(X) ~ Gamma (tiny xlb_r) must raise
    Gamma each round at the n-th-root factor, keeping gaptol fixed."""
    iface, s = _make_iface()
    # rung1 fail; rung2 probe converged r=0 (no infeasibility proof); then
    # rung3: two rounds converged-not-feasorig with penalty bound active
    script = [
        (F, 0.0, 0.0, 0.0),            # rung 1 direct
        (OPT, 0.0, 0.0, 0.0),          # rung 2 probe: r* = 0 -> feasible
        (OPT, 1.0, 0.0, 5.0),          # rung 3: r>feastol, xlb_r=0 -> bound
        (OPT, 1.0, 0.0, 6.0),          # raise again
        (OPT, 1.0, 0.0, 7.0),          # gamma capped after this
        (F, 0.0, 0.0, 0.0),            # rung 4 box rescue fails
    ]
    sr = ScriptedRuns(iface, script)
    iface._run = sr
    res = iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]))
    gammas = [g for (g, _) in sr.calls[2:5]]
    fact = (1000.0 / 10.0) ** 0.5      # npenaltyincr = 2
    assert gammas[0] == pytest.approx(10.0)
    assert gammas[1] == pytest.approx(10.0 * fact)
    assert gammas[2] == pytest.approx(10.0 * fact * fact)
    # gaptol untouched while the penalty bound binds
    assert all(gt == pytest.approx(s.ipm.gaptol) for (_, gt) in sr.calls[2:5])
    # rescue never got feasorig: the converged solves still provide bounds
    assert res.status[0] == SolverResultStatus.BOUND_ONLY
    assert res.objval[0] == pytest.approx(7.0)


def test_penaltybound_slack_tightens_gaptol():
    """Converged-not-feasorig with slack penalty bound must shrink gaptol
    by gaptolfact = (min_gaptol/gaptol)^(1/npenaltyincr), Gamma fixed."""
    iface, s = _make_iface()
    big_xlb = 1.0   # xlb_r = Gamma - Tr(X) large -> bound NOT active
    script = [
        (F, 0.0, 0.0, 0.0),
        (OPT, 0.0, 0.0, 0.0),
        (OPT, 1.0, big_xlb, 5.0),
        (OPT, 1.0, big_xlb, 5.0),
        (OPT, 1.0, big_xlb, 5.0),
        (F, 0.0, 0.0, 0.0),
    ]
    sr = ScriptedRuns(iface, script)
    iface._run = sr
    iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]))
    gfact = (s.ipm.min_gaptol / s.ipm.gaptol) ** 0.5
    tols = [gt for (_, gt) in sr.calls[2:5]]
    assert tols[0] == pytest.approx(s.ipm.gaptol)
    assert tols[1] == pytest.approx(s.ipm.gaptol * gfact)
    assert tols[2] == pytest.approx(s.ipm.gaptol * gfact * gfact, rel=1e-6)
    # gamma stays put when only gaptol moves
    assert all(g == pytest.approx(10.0) for (g, _) in sr.calls[2:5])


def test_feasorig_accepts_with_gamma_correction():
    """A converged rescue with r <= feastol is the original optimum; the
    reported objective removes the Gamma*r term."""
    iface, s = _make_iface()
    r = 1e-7
    script = [
        (F, 0.0, 0.0, 0.0),
        (OPT, 0.0, 0.0, 0.0),
        (OPT, r, 1.0, 5.0),
    ]
    sr = ScriptedRuns(iface, script)
    iface._run = sr
    res = iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]))
    assert res.status[0] == SolverResultStatus.OPTIMAL
    assert res.objval[0] == pytest.approx(5.0 - 10.0 * r)
    assert res.npenalty == 1


def test_unacceptable_rescue_raises_gamma():
    """A rescue solve that fails outright must raise Gamma (the reference's
    'did not converge even with penalty formulation' branch)."""
    iface, _ = _make_iface()
    script = [
        (F, 0.0, 0.0, 0.0),
        (OPT, 0.0, 0.0, 0.0),
        (F, 0.0, 0.0, 0.0),    # rescue 1 fails -> raise
        (OPT, 1e-8, 0.0, 4.0),  # rescue 2 converges feasorig
    ]
    sr = ScriptedRuns(iface, script)
    iface._run = sr
    res = iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]))
    fact = (1000.0 / 10.0) ** 0.5
    assert sr.calls[2][0] == pytest.approx(10.0)
    assert sr.calls[3][0] == pytest.approx(10.0 * fact)
    assert res.status[0] == SolverResultStatus.OPTIMAL


def test_time_limit_yields_timelimit_status():
    """An exhausted per-solve budget short-circuits the ladder and marks
    undecided instances TIMELIMIT."""
    iface, _ = _make_iface()
    script = [(F, 0.0, 0.0, 0.0)] * 8

    sr = ScriptedRuns(iface, script)

    def slow_run(*a, **k):
        import time
        time.sleep(0.05)
        return sr(*a, **k)

    iface._run = slow_run
    res = iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]),
                            time_limit=0.01)
    assert res.status[0] == SolverResultStatus.TIMELIMIT
    # only the direct rung ran before the budget check fired
    assert len(sr.calls) == 1


def test_iterlimit_status_surfaces():
    """An IPM that runs out of iterations while progressing reports
    ITERLIMIT (not FAILED) from the direct rung; the ladder still tries to
    rescue it."""
    iface, _ = _make_iface()
    IL = int(SolverResultStatus.ITERLIMIT)
    script = [
        (IL, 0.0, 0.0, 0.0),
        (OPT, 0.0, 0.0, 0.0),
        (OPT, 1e-8, 0.0, 4.0),
    ]
    sr = ScriptedRuns(iface, script)
    iface._run = sr
    res = iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]))
    assert res.status[0] == SolverResultStatus.OPTIMAL
    assert len(sr.calls) == 3


def test_tier_inheritance_starts_ladder_high():
    """cons_savedsdpsettings analog: an inherited (Gamma, gaptol) tier must
    make the ladder START at the parent's Gamma instead of the bottom, and
    the result must record the tier that decided the instance."""
    iface, s = _make_iface()
    fact = (1000.0 / 10.0) ** 0.5
    inherited_gamma = 10.0 * fact
    script = [
        (F, 0.0, 0.0, 0.0),            # rung 1 direct
        (OPT, 0.0, 0.0, 0.0),          # rung 2 probe: no infeasibility
        (OPT, 1e-9, 0.0, 5.0),         # rung 3: feasorig at inherited tier
    ]
    sr = ScriptedRuns(iface, script)
    iface._run = sr
    tier = np.array([[inherited_gamma, np.nan]])
    res = iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]),
                            tier=tier)
    # first penalty call already at the inherited Gamma
    assert sr.calls[2][0] == pytest.approx(inherited_gamma)
    assert res.status[0] == SolverResultStatus.OPTIMAL
    # the decided instance records its tier for the children
    assert res.tier is not None
    assert res.tier[0, 0] == pytest.approx(inherited_gamma)


def test_no_tier_recorded_for_direct_solves():
    iface, s = _make_iface()
    sr = ScriptedRuns(iface, [(OPT, 0.0, 0.0, 3.0)])
    iface._run = sr
    res = iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]))
    assert res.tier is not None and not np.isfinite(res.tier[0]).any()


class ScriptedVectorRuns:
    """Per-slot scripted outputs: each script entry is a list of
    (status, r, dobj) per batch slot; records (gamma_vec, gaptol_vec)."""

    def __init__(self, iface, script):
        self.iface = iface
        self.script = list(script)
        self.calls = []
        self.m = iface.m

    def __call__(self, b, lb, ub, cuts=None, warm_y=None, warm_mask=None,
                 f32=False, gaptol=None, warm_X=None, feastol_vec=None):
        B = b.shape[0]
        self.calls.append((np.asarray(b[:, self.m]).copy(),
                           None if gaptol is None
                           else np.asarray(gaptol).copy()))
        rows = self.script.pop(0)
        mp = self.m + 1
        status = np.array([r[0] for r in rows], np.int32)
        rvec = np.array([r[1] for r in rows])
        dobj = np.array([r[2] for r in rows])
        y = np.zeros((B, mp))
        y[:, 0] = 1.0       # passes the independent verification rung
        y[:, self.m] = rvec
        return SolveOutput(
            status=status, dobj=dobj, y=y, r=rvec,
            gap=np.zeros(B), pinf=np.zeros(B), dinf=np.zeros(B),
            iters=np.asarray(0),
            X=(np.zeros((B, 1, 1, 1)),),
            xl=np.zeros((B, 1)),
            xlb=np.zeros((B, mp)),
            xub=np.zeros((B, mp)),
        )


def test_speculative_parallel_ladder_one_dispatch():
    """Round-5 concurrent-portfolio ladder (SCIPsdpiClone role): with free
    batch slots, the whole escalation schedule is evaluated in ONE
    dispatch — clones of the failed instance at different (Gamma, gaptol)
    tiers — and the lowest-tier feasorig outcome is adopted, with its
    tier recorded for the children."""
    iface, s = _make_iface()
    F_ = F
    PRE_INF = int(SolverResultStatus.PRESOLVED_INFEASIBLE)
    fact = (1000.0 / 10.0) ** 0.5      # npenaltyincr = 2
    gfact = (s.ipm.min_gaptol / s.ipm.gaptol) ** 0.5
    r_ok = 1e-9
    script = [
        # rung 1 direct: slot 0 fails, slots 1-3 decided (free for clones)
        [(F_, 0.0, 0.0), (PRE_INF, 0.0, 0.0), (PRE_INF, 0.0, 0.0),
         (PRE_INF, 0.0, 0.0)],
        # rung 2 probe: converged with r* = 0 (no infeasibility proof)
        [(OPT, 0.0, 0.0)] * 4,
        # rung 3 speculative: slot 3 hosts tier (1,0) and is feasorig
        [(F_, 0.0, 0.0), (F_, 0.0, 0.0), (F_, 0.0, 0.0),
         (OPT, r_ok, 5.0)],
    ]
    sr = ScriptedVectorRuns(iface, script)
    iface._run = sr
    lb = np.zeros((4, 1))
    ub = np.full((4, 1), 2.0)
    res = iface.solve_batch(lb, ub)
    # exactly 3 dispatches: direct, probe, ONE speculative ladder
    assert len(sr.calls) == 3
    gam_vec, gt_vec = sr.calls[2]
    # slot layout: own slot 0 = base tier; free slots popped 3, 2, 1 host
    # sched (1,0), (0,1), (1,1)
    assert gam_vec[0] == pytest.approx(10.0)
    assert gam_vec[3] == pytest.approx(10.0 * fact)
    assert gam_vec[2] == pytest.approx(10.0)
    assert gam_vec[1] == pytest.approx(10.0 * fact)
    assert gt_vec[3] == pytest.approx(s.ipm.gaptol)
    assert gt_vec[2] == pytest.approx(s.ipm.gaptol * gfact)
    assert gt_vec[1] == pytest.approx(s.ipm.gaptol * gfact)
    # the (1,0)-tier outcome was adopted for the owner
    assert res.status[0] == SolverResultStatus.OPTIMAL
    assert res.objval[0] == pytest.approx(5.0 - 10.0 * fact * r_ok)
    assert res.tier[0, 0] == pytest.approx(10.0 * fact)
    assert res.npenalty == 1


def test_speculative_exhausted_records_top_tier():
    """An instance the whole speculative schedule cannot solve records a
    near-top tier so its children skip re-climbing the ladder, and the
    Farkas box-bound rescue (computeConflictCut aggregation over the PSD
    primal iterate) still extracts a valid dual bound from the finite
    node box: b^T y >= tr(C X) + min over the box of (b - A* X)^T y."""
    iface, s = _make_iface()
    PRE_INF = int(SolverResultStatus.PRESOLVED_INFEASIBLE)
    script = [
        [(F, 0.0, 0.0), (PRE_INF, 0.0, 0.0), (PRE_INF, 0.0, 0.0),
         (PRE_INF, 0.0, 0.0)],
        [(OPT, 0.0, 0.0)] * 4,          # probe: no proof
        [(F, 0.0, 0.0)] * 4,            # speculative: all tiers fail
    ]
    sr = ScriptedVectorRuns(iface, script)
    iface._run = sr
    res = iface.solve_batch(np.zeros((4, 1)), np.full((4, 1), 2.0))
    # X = 0, xl = 0 from the scripted runs: g = 0, lhs = 0, so the box
    # bound is min(1*0, 1*2) = 0 minus the feastol safety margin — a
    # valid (loose) lower bound for the true optimum 0.5; the node gets
    # BOUND_ONLY instead of burning a requeue-forever FAILED
    assert res.status[0] == SolverResultStatus.BOUND_ONLY
    assert res.objval[0] == pytest.approx(-s.ipm.feastol)
    # near-top tier recorded (one escalation step below the cap)
    fact = (1000.0 / 10.0) ** 0.5
    assert res.tier[0, 0] == pytest.approx(1000.0 / fact)
    assert np.isfinite(res.tier[0, 1])
