"""Native frontier node-pool tests (scipsdp_tpu/native/frontier.cpp)."""

import numpy as np
import pytest

from scipsdp_tpu.native.frontier import FrontierStore, get_frontier_lib


def _drive(fs: FrontierStore, rng):
    trace = []
    for step in range(200):
        if rng.random() < 0.6 or len(fs) == 0:
            b = float(np.round(rng.normal(), 3))
            lb = rng.random(4)
            fs.push(lb, lb + 1.0, b, step % 7,
                    side=(b, [step], step, None, None))
        else:
            out = fs.pop_upto(int(rng.integers(1, 4)),
                              cutoff=float(rng.normal() + 1.0))
            trace.append([(o[2], o[3], o[4][2]) for o in out])
    out = fs.pop_upto(10_000)
    trace.append([(o[2], o[3], o[4][2]) for o in out])
    return trace


def test_native_matches_python_fallback():
    if get_frontier_lib() is None:
        pytest.skip("native frontier not built")
    t1 = _drive(FrontierStore(4, prefer_native=True),
                np.random.default_rng(7))
    t2 = _drive(FrontierStore(4, prefer_native=False),
                np.random.default_rng(7))
    assert t1 == t2


def test_pop_order_and_side_data():
    fs = FrontierStore(2)
    fs.push(np.zeros(2), np.ones(2), 3.0, 1, side=(3.0, ["a"], 0, None, None))
    fs.push(np.zeros(2), np.ones(2), 1.0, 2, side=(1.0, ["b"], 1, None, None))
    fs.push(np.zeros(2), np.ones(2), 1.0, 3, side=(1.0, ["c"], 2, None, None))
    out = fs.pop_upto(3)
    # ascending bound, ties by insertion order
    assert [o[4][1][0] for o in out] == ["b", "c", "a"]
    assert [o[3] for o in out] == [2, 3, 1]
    assert len(fs) == 0 and fs.best_bound() == np.inf


def test_dump_preserves_store():
    fs = FrontierStore(2)
    for b in (5.0, 2.0, 8.0):
        fs.push(np.zeros(2), np.ones(2), b, 0, side=(b, [], 0, None, None))
    d = fs.dump()
    assert len(d) == 3 and len(fs) == 3
    assert sorted(x[2] for x in d) == [2.0, 5.0, 8.0]
