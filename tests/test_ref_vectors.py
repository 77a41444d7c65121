"""The reference `test_function!` vector sweep as a regression gate.

scripts/ref_vectors.py extracts every literal-expressible case from
/root/reference/src/stdlib/*.rs and runs it against REGISTRY. As of
round 5 the sweep covers 1264 of 1270 cases with ZERO result
divergences and ZERO error-message differences; the 6 skips are
inherently inexpressible (encoder tests whose oracle is the encoder
itself, a Rust-enum Display interpolation, a year-0 chrono timestamp
below Python's datetime range). This test pins that state so a
behavior regression in any stdlib function fails CI with the exact
case name.
"""

import io
import os
import sys
from contextlib import redirect_stdout

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

REF = "/root/reference/src/stdlib"


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference checkout not present")
def test_reference_vectors_all_green():
    import ref_vectors

    buf = io.StringIO()
    with redirect_stdout(buf):
        ref_vectors.main(["--verbose"])
    out = buf.getvalue()
    diverges = [l for l in out.splitlines() if l.startswith("DIVERGE")]
    errmsgs = [l for l in out.splitlines() if l.startswith("ERRMSG")]
    assert not diverges, "\n".join(diverges[:10])
    assert not errmsgs, "\n".join(errmsgs[:10])
    import re
    m = re.search(r"(\d+) cases: (\d+) pass, (\d+) diverge, (\d+) skipped",
                  out)
    assert m, out[-200:]
    total, passed, _, skipped = map(int, m.groups())
    # pass floor: new skips (parser regressions) may not silently eat
    # previously-verified cases
    assert passed >= 1264, (passed, skipped)
    assert total >= 1270
