"""Reference diagnostics corpus: exact rendered-text parity.

Every case in /root/reference/lib/tests/tests/diagnostics/*.vrl (the
group src/test/ runs for diagnostic-output validation) is compiled by
vrl_ray.lang.diag_pass and the rendered codespan text is compared
byte-for-byte against the expected ``# result:`` block.  Cases whose
expected result is a runtime value / runtime error (no compile
diagnostic) execute through the row-level engine instead and compare
the value or the exact runtime error string.

Source extraction mirrors the reference runner: the compiled source is
everything after the leading comment block INCLUDING blank lines, so
line/column numbers in the rendered output line up.
"""

from __future__ import annotations

import glob
import json

import pytest

from vrl_ray.lang import compile_program, VrlRuntimeError
from vrl_ray.lang.diag_pass import render_diagnostics
from vrl_ray.value import VrlError

DIR = "/root/reference/lib/tests/tests/diagnostics"


def _parse_case(path: str) -> dict:
    src_lines, obj, res, mode = [], [], [], None
    done = False
    for line in open(path).read().splitlines():
        if line.startswith("#") and not done:
            line = line[1:]
            if line.startswith(" "):
                line = line[1:]
            if line.startswith("object:"):
                mode = "obj"
                obj.append(line[len("object:"):].strip())
            elif line.startswith("result:"):
                mode = "res"
                res.append(line[len("result:"):].strip())
            else:
                if mode == "obj":
                    obj.append(line)
                elif mode == "res":
                    res.append(line)
        else:
            done = True
            src_lines.append(line)
    return {"obj": "".join(obj), "res": "\n".join(res).strip(),
            "src": "\n".join(src_lines)}


CASES = sorted(glob.glob(f"{DIR}/*.vrl"))


def test_corpus_is_present():
    assert len(CASES) >= 37


@pytest.mark.parametrize(
    "path", CASES, ids=[p.rsplit("/", 1)[1] for p in CASES])
def test_diagnostic_case(path):
    c = _parse_case(path)
    want = c["res"]
    if "error[" in want or "warning[" in want:
        got = render_diagnostics(c["src"])
        assert got == want, f"--- got ---\n{got}\n--- want ---\n{want}"
        return
    # runtime case: the program must compile clean and produce the
    # expected value, or raise the exact runtime error text
    assert render_diagnostics(c["src"]) == "", "unexpected compile diags"
    obj = json.loads(c["obj"]) if c["obj"].strip() else {}
    try:
        r, _ev, _aborted = compile_program(c["src"]).resolve(obj)
    except (VrlError, VrlRuntimeError) as e:
        assert str(e) == want, f"runtime error {e!r} != {want!r}"
        return
    try:
        expected = json.loads(want)
    except ValueError:
        expected = want
    assert r == expected, f"{r!r} != {expected!r}"
