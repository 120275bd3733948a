"""Placeholder — implemented later this round."""
class BBResult:  # pragma: no cover
    pass

def solve_misdp(*a, **kw):  # pragma: no cover
    raise NotImplementedError
