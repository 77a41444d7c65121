"""Vector-lane parity over the reference's documentation examples:
every doc example whose program COMPILES to the column plan runs
through BOTH remap lanes (VectorRemapStage vs RemapStage) on a
one-row batch built from the documented input; the output events,
error lanes and abort flags must agree. This drives the late-r4
kernels through ~600 real stdlib invocations beyond the synthetic
deepfuzz grammar."""

from __future__ import annotations

import importlib

import pyarrow as pa
import pytest

from vrl_ray.lang.parser import ParseError
from vrl_ray.lang.vectorize import NotVectorizable, VectorProgram

from test_docs_examples import CASES, _close, _jsonable

RM = importlib.import_module("vrl_ray.lang.remap")


def _vector_cases():
    out = []
    for p in CASES:
        src, inp, _want, _raises = p.values
        try:
            VectorProgram(src)
        except (NotVectorizable, ParseError):
            continue                    # row-only program
        except Exception:
            continue
        out.append(pytest.param(src, inp, id=p.id))
    return out


VCASES = _vector_cases()


def _norm(v):
    v = _jsonable(v)
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


@pytest.mark.parametrize("src,inp", VCASES)
def test_vector_lane_matches_row_lane(src, inp):
    keys = list(inp) or ["__probe"]
    batch = pa.table({k: RM._py_array([dict(inp).get(k, 1)])
                      for k in keys})
    row = RM.RemapStage(src)(batch).to_pylist()[0]
    vec = RM.VectorRemapStage(src)(batch).to_pylist()[0]
    assert (row.get("vrl_err") or None) == (vec.get("vrl_err") or None), \
        (src, row.get("vrl_err"), vec.get("vrl_err"))
    assert bool(row.get("aborted")) == bool(vec.get("aborted")), src
    fields = (set(row) | set(vec)) - {"vrl_err", "aborted", "extra"}
    for k in fields:
        rv, vv = _norm(row.get(k)), _norm(vec.get(k))
        assert _close(rv, vv) or _close(vv, rv), (src, k, rv, vv)
