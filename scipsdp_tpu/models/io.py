"""Problem I/O dispatch (extension-based, with .gz support).

Analog of SCIP's reader registry: SCIP-SDP registers two readers
(reader_sdpa.c, reader_cbf.c; scipsdpdefplugins.c:208-269).
"""

from __future__ import annotations

from scipsdp_tpu.models.problem import MISDP
from scipsdp_tpu.models.reader_cbf import read_cbf
from scipsdp_tpu.models.reader_cip import read_cip
from scipsdp_tpu.models.reader_sdpa import ReadError, read_sdpa

__all__ = ["read_problem", "ReadError"]


def read_problem(path: str) -> MISDP:
    base = path[:-3] if path.endswith(".gz") else path
    if base.endswith(".dat-s") or base.endswith(".dat"):
        return read_sdpa(path)
    if base.endswith(".cbf"):
        return read_cbf(path)
    if base.endswith(".cip"):
        return read_cip(path)
    raise ReadError(f"unknown problem file extension: {path}")
