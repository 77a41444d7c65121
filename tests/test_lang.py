"""VRL language front end: parser/interpreter semantics + the
RemapStage bridge into Ray Data."""

import pyarrow as pa
import pytest

from vrl_ray.lang import compile_program, remap, RemapStage
from vrl_ray.lang.interpreter import VrlRuntimeError
from vrl_ray.value import VrlError


def run(src, event=None):
    res, ev, aborted = compile_program(src).resolve(event if event is not None else {})
    return res, ev, aborted


class TestInterpreter:
    def test_event_mutation(self):
        _, ev, _ = run('.a = 1\n.b.c = "x"')
        assert ev == {"a": 1, "b": {"c": "x"}}

    def test_root_replacement(self):
        _, ev, _ = run('. = { "only": true }', {"old": 1})
        assert ev == {"only": True}

    def test_infallible_assignment(self):
        # assignment.rs:522-549
        # on error the ok target gets the expression's TYPE DEFAULT
        # (assignment.rs:522-549; corpus infallible_variable.vrl)
        _, ev, _ = run('.ok, .err = to_int("nope")')
        assert ev["ok"] == 0 and "nope" in ev["err"]
        _, ev, _ = run('.ok, .err = to_int("42")')
        assert ev == {"ok": 42, "err": None}

    def test_coalesce_operator(self):
        res, _, _ = run('to_int("bad") ?? 7')
        assert res == 7

    def test_bang_aborts(self):
        with pytest.raises(VrlRuntimeError):
            run('to_int!("bad")')

    def test_if_else(self):
        res, _, _ = run('if 1 > 2 { "a" } else if 2 > 1 { "b" } else { "c" }')
        assert res == "b"

    def test_if_requires_boolean(self):
        with pytest.raises((VrlRuntimeError, VrlError)):
            run('if 1 { "a" }')

    def test_abort(self):
        res, ev, aborted = run('.x = 1\nabort\n.y = 2', {})
        assert aborted is not None
        assert ev == {"x": 1}  # modifications kept up to abort

    def test_closures(self):
        res, _, _ = run('map_keys({"a": 1}) -> |key| { upcase(key) }')
        assert res == {"A": 1}
        res, _, _ = run('filter([1, 2, 3]) -> |_i, v| { v > 1 }')
        assert res == [2, 3]

    def test_del_exists(self):
        _, ev, _ = run('del(.drop)', {"drop": 1, "keep": 2})
        assert ev == {"keep": 2}
        res, _, _ = run('exists(.a.b)', {"a": {"b": None}})
        assert res is True

    def test_merge_assign(self):
        _, ev, _ = run('. |= {"b": 2}', {"a": 1})
        assert ev == {"a": 1, "b": 2}

    def test_string_template(self):
        res, _, _ = run('lvl = "warn"\n"[{{ lvl }}] hi"')
        assert res == "[warn] hi"

    def test_variables_and_paths(self):
        res, _, _ = run('v = {"x": [1, 2]}\nv.x[1]')
        assert res == 2

    def test_typed_literals(self):
        res, _, _ = run("t'2021-01-01T00:00:00Z'")
        assert res.year == 2021
        res, _, _ = run("match(\"foo\", r'^f')")
        assert res is True

    def test_runtime_arg_kind_errors_are_catchable(self):
        """r3: wrong-kind arguments at runtime are ordinary fallible-
        call errors with the reference's ArgumentError text
        (expressions/query/function_call_error.vrl — 'expected
        string, got null'), NOT program aborts, even for functions
        whose Python body raises a bare TypeError."""
        from vrl_ray.lang import compile_program
        p = compile_program(
            r'''.o, .e = parse_regex(.t, r'(?P<c>\d)')''', strict=False)
        _, ev, _ = p.resolve({"t": None})
        assert ev["e"].endswith("expected string, got null"), ev["e"]
        _, ev2, _ = p.resolve({"t": 42})
        assert ev2["e"].endswith("expected string, got integer")


class TestRemapStage:
    PROGRAM = """
    .kind = downcase(.event_type)
    .value_int, .parse_err = to_int(round(.value))
    if .value >= 100.0 { .is_big = true } else { .is_big = false }
    """

    def batch(self):
        return pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "event_type": ["CLICK", "ERROR"],
            "value": pa.array([12.4, 150.9], pa.float64()),
        })

    def test_stage_direct(self):
        out = RemapStage(self.PROGRAM)(self.batch()).to_pylist()
        assert out[0]["kind"] == "click" and out[0]["value_int"] == 12
        assert out[1]["is_big"] is True and out[1]["value_int"] == 151
        assert all(r["vrl_err"] is None for r in out)

    def test_remap_through_ray(self, ray_session):
        import ray.data as rd
        ds = remap(rd.from_arrow(self.batch()), self.PROGRAM, concurrency=1)
        out = {r["event_id"]: r for r in ds.take_all()}
        assert out[1]["kind"] == "click"
        assert out[2]["is_big"] is True

    def test_error_lane_never_raises(self, ray_session):
        import ray.data as rd
        bad = pa.table({"event_id": pa.array([1], pa.int64())})
        ds = remap(rd.from_arrow(bad), 'to_int!("not a number")', concurrency=1)
        rows = ds.take_all()
        assert rows[0]["vrl_err"] is not None

    def test_drop_aborted_vector_path(self, ray_session):
        """drop_aborted rides the COLUMN plan (r3): the route-guard
        program vectorizes, aborted rows are filtered in-batch, and
        the output matches the per-row interpreter path exactly."""
        import ray.data as rd
        src = 'if .value >= 100.0 { abort }\n.kind = downcase(.event_type)'
        for vectorize in (None, False):
            ds = remap(rd.from_arrow(self.batch()), src,
                       concurrency=1, drop_aborted=True,
                       vectorize=vectorize)
            rows = ds.take_all()
            assert [r["event_id"] for r in rows] == [1]
            assert rows[0]["kind"] == "click"
            assert rows[0]["aborted"] is False


class TestVectorize:
    """lang/vectorize.py: the column-plan fast path must match the
    per-row interpreter bit-for-bit on the vectorizable subset."""

    PROGRAM = """
    .kind = downcase(.event_type)
    .value_int, .parse_err = to_int(round(.value))
    if .value >= 100.0 { .is_big = true } else { .is_big = false }
    .half = .value / 2.0
    .label = .kind + "!"
    """

    def _batch(self):
        import pyarrow as pa

        return pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "event_type": pa.array(["Click", "ERROR", "view", "Login"]),
            "value": pa.array([5.2, 150.7, 99.9, 100.0], pa.float64()),
        })

    def test_parity_with_interpreter(self):
        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = self._batch()
        out = VectorProgram(self.PROGRAM).run(batch)
        p = Program(self.PROGRAM)
        for i, row in enumerate(batch.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            for f in ("kind", "value_int", "is_big", "half", "label",
                      "parse_err"):
                assert out[f][i].as_py() == ev[f], (f, i)

    def test_error_lane_and_default(self):
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"s": pa.array(["12", "nope", None])})
        out = VectorProgram(".n, .err = to_int(.s)").run(batch)
        # null coerces to 0 with NO error (to_int.rs:12)
        assert out["n"].to_pylist() == [12, 0, 0]
        assert out["err"].to_pylist()[1] is not None
        assert out["err"].to_pylist()[0] is None
        assert out["err"].to_pylist()[2] is None

    def test_division_by_zero_lane(self):
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"a": pa.array([4.0, 1.0]),
                          "b": pa.array([2.0, 0.0])})
        out = VectorProgram(".q, .e = .a / .b").run(batch)
        # ok target gets the TYPE DEFAULT 0.0 on error, like the
        # interpreter (assignment.rs:522-549; was None before r3)
        assert out["q"].to_pylist() == [2.0, 0.0]
        assert "zero" in out["e"].to_pylist()[1]

    def test_handled_default_is_outermost_exprs(self):
        """On a handled (`ok, err =`) error the ok target gets the
        OUTERMOST expression's type default, no matter where inside
        the expression the error originated — an inner binop error
        under round() must yield round's default (null), not the
        binop's 0 (interpreter._eval_assign; assignment.rs:522-549)."""
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"a": pa.array([1.4, None, 2.6])})
        out = VectorProgram(".o, .e = round((.a + .a), 0)").run(batch)
        assert out["o"].to_pylist() == [3.0, None, 5.0]
        assert out["e"].to_pylist()[1] is not None
        # comparison default is false even when the error is inner
        out = VectorProgram(".o, .e = (.a + .a) > 2").run(batch)
        assert out["o"].to_pylist() == [True, False, True]

    def test_if_predicate_null_errors_per_row(self):
        """A null row in a boolean `if` predicate errors per row
        ('if predicate must be boolean, got null'), it does not
        silently take the else branch (if_statement.rs predicate
        kind check; ADVICE r3 fuzz finding)."""
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"a": pa.array([True, None, False]),
                          "o": pa.array([9, 9, 9], pa.int64())})
        # statement form: errored row keeps the prior value
        out = VectorProgram(
            "if .a { .o = 1 } else { .o = 2 }").run(batch)
        assert out["o"].to_pylist() == [1, 9, 2]
        assert "must be boolean" in out["vrl_err"].to_pylist()[1]
        # expression form
        out = VectorProgram(".o = if .a { 1 } else { 2 }").run(batch)
        assert out["o"].to_pylist() == [1, 9, 2]

    def test_lazy_branch_and_short_circuit_errors(self):
        """The vector lane evaluates branches/operands EAGERLY; errors
        from code the interpreter never runs must be masked out:
        not-taken `if` branches, `??` right sides on rows whose left
        side succeeded, and `&&`/`||` right sides where the left
        short-circuits (r3 deep-fuzz class)."""
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"s": pa.array(["ok", None]),
                          "t": pa.array([None, "x"])})
        # not-taken branch errors (strlen(null)) are not errors
        out = VectorProgram(
            '.o = if is_null(.t) { 1 } else { strlen(.t) }').run(batch)
        assert out["o"].to_pylist() == [1, 1]
        assert out["vrl_err"].to_pylist() == [None, None]
        # ?? only runs the RHS on rows whose LHS errored
        out = VectorProgram('.o = downcase(.s) ?? upcase(.t)').run(batch)
        assert out["o"].to_pylist() == ["ok", "X"]
        assert out["vrl_err"].to_pylist() == [None, None]
        # && short-circuits: a false LHS never evaluates the RHS
        # (row 0 has .t null — match(null) would error if it ran)
        out = VectorProgram(
            ".o = !is_null(.t) && match(.t, r'x')").run(batch)
        assert out["o"].to_pylist() == [False, True]
        assert out["vrl_err"].to_pylist() == [None, None]

    def test_lazy_position_del_in_siblings(self):
        """r5 (ADVICE): del in argument / container-element / binop-RHS
        position AFTER a per-row-fallible sibling is conditionally
        reached — the interpreter never runs it on rows where the
        earlier sibling failed. The vector lane must defer to the row
        path there (previously it deleted batch-wide). Siblings with
        only infallible predecessors still vectorize."""
        import pyarrow as pa

        from vrl_ray.lang import RemapStage
        from vrl_ray.lang.vectorize import VectorProgram, _RowFallback

        batch = pa.table({"s": ["1", "x"], "a": [20, 20]})
        lazy = ['.o = [to_int!(.s), del(.a)]',
                '.o = {"x": to_int!(.s), "y": del(.a)}',
                '.z = (to_int(.s) + del(.a))']
        for src in lazy:
            try:
                VectorProgram(src).run(batch)
                raise AssertionError(f"expected fallback: {src}")
            except _RowFallback:
                pass
            # the row path keeps .a on the failing row
            rows = RemapStage(src)(batch).to_pylist()
            assert rows[1]["a"] == 20, src
        # del with only infallible earlier siblings stays columnar
        # and applies to every row — matching the interpreter
        out = VectorProgram('.o = [1, del(.a)]').run(batch).to_pylist()
        rows = RemapStage('.o = [1, del(.a)]')(batch).to_pylist()
        assert [r.get("a") for r in out] == [None, None]
        assert [r.get("a") for r in rows] == [None, None]

    def test_abort_vectorized(self):
        """`abort` compiles into the column plan (r3): aborted rows
        keep mutations made BEFORE the abort, skip later statements,
        carry no error, and come out with aborted=true — previously
        any program containing abort fell back to the row path."""
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"a": pa.array([1, 5, None], pa.int64())})
        out = VectorProgram(
            '.o = "pre"\nif .a == 1 { abort "bye" }\n.q = "post"'
        ).run(batch).to_pylist()
        assert [r["aborted"] for r in out] == [True, False, False]
        assert [r["o"] for r in out] == ["pre", "pre", "pre"]
        assert [r["q"] for r in out] == [None, "post", "post"]
        assert all(r["vrl_err"] is None for r in out)

    def test_if_statement_general_shapes(self):
        """Vectorized if statements support else-if chains, missing
        else, asymmetric branch fields, and multi-statement branches
        with statement-order error gating (a write BEFORE the row's
        first error sticks; the erroring statement's own write and
        everything after do not) — r3, previously NotVectorizable."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({
            "a": pa.array([1, 5, None, 9], pa.int64()),
            "s": pa.array(["3", "x", "7", None]),
        })
        progs = [
            # chain + no else: untaken rows keep prior (absent)
            'if .a == 1 { .o = "one" } else if .a == 5 { .o = "five" }',
            # asymmetric fields
            'if .a == 1 { .o = "one" } else { .p = "other" }',
            # if EXPRESSION without else → null when untaken
            '.o = if .a == 1 { "one" }',
            # multi-statement branch: .o assigned, then to_int!(.s)
            # aborts row 1 — .o must keep the already-written value
            'if .a != 1 { .o = "set"\n.p = to_int!(.s) } '
            'else { .o = "else" }',
        ]
        for src in progs:
            out = VectorProgram(src).run(batch).to_pylist()
            prog = Program(src)
            for ri, row in enumerate(batch.to_pylist()):
                ev = dict(row)
                rerr = None
                try:
                    _, ev, _ = prog.resolve(ev)
                except Exception as ex:
                    rerr = str(ex)
                assert out[ri].get("vrl_err") == rerr, (src, ri)
                for k in ("o", "p"):
                    assert out[ri].get(k) == ev.get(k), (src, ri, k)

    def test_sha2_variant_argument(self):
        """sha2's variant argument selects the digest (sha2.rs); the
        vector kernel must not silently compute the SHA-512/256
        default (r3 fuzz catch — the ignored-optional-arg class)."""
        import hashlib

        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"s": pa.array(["", "abc"])})
        out = VectorProgram(
            '.d = sha2(.s, "SHA-256")\n'
            '.n = sha2(.s, variant: "SHA-384")\n'
            '.o = sha2(.s)').run(batch)
        for i, s in enumerate(["", "abc"]):
            b = s.encode()
            assert out["d"][i].as_py() == hashlib.sha256(b).hexdigest()
            assert out["n"][i].as_py() == hashlib.sha384(b).hexdigest()
            assert out["o"][i].as_py() == \
                hashlib.new("sha512_256", b).hexdigest()

    def test_bang_call_errors_abort_not_capture(self):
        """`f!()` errors abort the row's program — `ok, err =` must
        NOT capture them (the interpreter raises VrlRuntimeError
        through the capture). The vector lane carries them in the
        error lane tagged as aborts (vectorize._ABORT): the errored
        row's targets keep their prior values, later statements skip
        it, and the plain text lands in vrl_err."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"s": pa.array(["abcdef", "x"])})
        src = '.o, .e = slice!(.s, 3)\n.post = "ran"'
        out = VectorProgram(src).run(batch).to_pylist()
        prog = Program(src)
        for ri, row in enumerate(batch.to_pylist()):
            ev = dict(row)
            rerr = None
            try:
                _, ev, _ = prog.resolve(ev)
            except Exception as ex:
                rerr = str(ex)
            assert out[ri].get("vrl_err") == rerr
            for k in ("o", "e", "post"):
                assert out[ri].get(k) == ev.get(k), (ri, k)
        # concrete pin: row 1 aborted — nothing captured, no .post
        assert out[0]["o"] == "def" and out[0]["vrl_err"] is None
        assert out[0]["post"] == "ran"
        assert out[1]["o"] is None and out[1]["e"] is None
        assert out[1]["post"] is None
        assert "slice" in out[1]["vrl_err"]
        assert "\x00" not in out[1]["vrl_err"]

    def test_nested_write_gated_on_error_rows(self):
        """Nested (.a.b) writes after a row died (or erroring
        themselves) keep the prior value per row instead of punting
        the whole batch to the row path: leaf-level blend + top-level
        validity restore (r3; was _RowFallback)."""
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({
            "s": pa.array(["5", "xx", None]),
            "obj": pa.array(
                [{"f": 0, "g": "keep"}, None, {"f": 7, "g": "z"}],
                pa.struct([("f", pa.int64()), ("g", pa.string())])),
        })
        # row 1 dies at to_int; its obj must stay EXACTLY null
        out = VectorProgram(".n = to_int(.s)\n.obj.f = 99").run(batch)
        assert out["obj"].to_pylist() == [
            {"f": 99, "g": "keep"}, None, {"f": 99, "g": "z"}]
        assert out["vrl_err"].to_pylist()[1] is not None
        # the erroring expression IS the nested write
        out = VectorProgram(".obj.f = to_int(.s)").run(batch)
        assert out["obj"].to_pylist() == [
            {"f": 5, "g": "keep"}, None, {"f": 0, "g": "z"}]
        # fresh nested target after a death stays null on dead rows
        out = VectorProgram('.n = to_int(.s)\n.nest.k = "v"').run(batch)
        assert out["nest"].to_pylist() == [{"k": "v"}, None, {"k": "v"}]

    def test_unvectorizable_falls_back(self):
        import pytest as _pytest

        from vrl_ray.lang.vectorize import NotVectorizable, VectorProgram

        for src in ("del(%meta.x)",      # metadata paths stay per-row
                    ".x = for_each(.arr) -> |i, v| { .y = v }"):
            with _pytest.raises(NotVectorizable):
                VectorProgram(src)
        # r4: containers vectorize in every shape — constant (scalar
        # fold), computed elements, and heterogeneous (list<union>)
        import pyarrow as pa

        b = pa.table({"t": pa.array(["a"])})
        out = VectorProgram('.x = ["mixed", 1]').run(b)
        assert out["x"].to_pylist() == [["mixed", 1]]

    def test_nested_and_closure_now_vectorize(self):
        """r2 widening: nested struct targets, split/slice/sha2
        kernels and map_values closure lowering compile to the column
        plan (VERDICT r1 #6) — plan-shape guard."""
        from vrl_ray.lang.vectorize import VectorProgram

        for src in (".a.b = 1",
                    ".kind = downcase(.t)\n.meta.kind = .kind",
                    '.parts = split(.t, " ")',
                    ".pre = slice(.t, 0, 3)",
                    ".h = sha2(.t)",
                    ".d = map_values(.xs) -> |v| { v * 2 }",
                    ".f = filter(.xs) -> |_i, v| { v > 1 }"):
            VectorProgram(src)   # must not raise

    def test_filter_closure_parity(self):
        """r3: filter closure lowering — vector output must match the
        interpreter element-for-element, including empty lists, empty
        results and the index param."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({
            "xs": pa.array([[1, 5, 2, 9], [], [3], [7, 7, 0, 0, 8]],
                           pa.list_(pa.int64())),
        })
        for src in (".kept = filter(.xs) -> |_i, v| { v > 2 }",
                    ".kept = filter(.xs) -> |i, _v| { i < 2 }",
                    ".kept = filter(.xs) -> |i, v| { v + i > 6 }"):
            out = VectorProgram(src).run(batch)
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                assert out["kept"][i].as_py() == ev["kept"], (src, i)

    def test_error_text_parity_with_interpreter(self):
        """r3: the vector lane's per-row error strings must match the
        interpreter's positioned diagnostics byte-for-byte — including
        values whose repr needs escaping — so vectorized and fallback
        blocks of one dataset agree (ADVICE r2 class)."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        cases = [
            (".n, .err = to_int(.s)",
             {"s": pa.array(["12", "nope", "3.7", "it's", "a\\b",
                             None, "café"])}),
            (".f, .err = to_float(.s)",
             {"s": pa.array(["1.5", "junk", None, "don't"])}),
            (".cut, .err = slice(.s, 5)",
             {"s": pa.array(["long enough", "abc", ""])}),
            ('.t, .err = parse_timestamp(.s, "%d/%m/%Y:%H:%M:%S %z")',
             {"s": pa.array(["10/02/2021:13:44:01 +0000", "garbage",
                             None])}),
        ]
        for src, cols in cases:
            batch = pa.table(cols)
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                assert out[i]["err"] == ev["err"], (src, i, out[i]["err"],
                                                   ev["err"])
                tgt = src.split(",")[0].lstrip(" .")
                assert out[i][tgt] == ev[tgt], (src, i)

    def test_variables_and_for_each_lowering(self):
        """r3: per-event variables compile to columns and statement-
        level for_each accumulators lower to segmented reductions —
        parity with the interpreter incl. empty lists, error kills and
        handled errors captured into variables."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        src = ("total = 0.0\nn = 0\n"
               "for_each(.xs) -> |_i, v| { total = total + v\n"
               "n = n + 1 }\n"
               ".sum = total\n.count = n")
        batch = pa.table({"xs": pa.array([[1.5, 2.5], [], [10.0]],
                                         pa.list_(pa.float64()))})
        out = VectorProgram(src).run(batch).to_pylist()
        p = Program(src)
        for i, row in enumerate(batch.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            assert out[i]["sum"] == ev["sum"], i
            assert out[i]["count"] == ev["count"], i

        # handled error into a variable + var round-trip
        src2 = ("tmp = downcase(.s)\n.x = tmp\n"
                "ok, e = to_int(.s)\n.ok = ok\n.err = e")
        b2 = pa.table({"s": pa.array(["AB", "7", None])})
        out2 = VectorProgram(src2).run(b2).to_pylist()
        p2 = Program(src2)
        for i, row in enumerate(b2.to_pylist()):
            try:
                _, ev, _ = p2.resolve(dict(row))
            except Exception as ex:
                # interpreter raises per row on an unhandled fallible —
                # the remap stage maps that to the vrl_err lane, which
                # is exactly what the vector path recorded
                assert out2[i]["vrl_err"] == getattr(ex, "message",
                                                     str(ex)), i
                continue
            for fld in ("x", "ok", "err"):
                assert out2[i][fld] == ev[fld], (i, fld, out2[i], ev)

        # unhandled fallible var assignment kills the row like the
        # interpreter (later statements skip it, vrl_err records it)
        src3 = "x = to_int(.s)\n.y = x"
        b3 = pa.table({"s": pa.array(["5", "bad"])})
        out3 = VectorProgram(src3).run(b3).to_pylist()
        assert out3[0]["y"] == 5 and out3[0]["vrl_err"] is None
        assert out3[1]["y"] is None and out3[1]["vrl_err"] is not None

    def test_new_string_kernels_parity(self):
        """r3 kernels (parse_regex via pc.extract_regex, truncate,
        strip_whitespace, to_bool): value AND positioned error-text
        parity with the interpreter, including null inputs."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import NotVectorizable, VectorProgram

        cases = [
            (r'''.p, .e = parse_regex(.t, '''
             r'''r'(?P<verb>\w+) (?P<path>/\S*) (?P<code>\d+)')''',
             {"t": ["GET /i 200", "garbage", None, "POST /a 404"]},
             ("p", "e")),
            ('.o, .e = truncate(.t, 5)',
             {"t": ["hello world", "hi", None, "exact"]}, ("o", "e")),
            ('.o, .e = truncate(.t, 3, "...")',
             {"t": ["hello world", "hi", None]}, ("o", "e")),
            ('.o, .e = strip_whitespace(.t)',
             {"t": ["  pad  ", "x", None, "\t tab\n"]}, ("o", "e")),
            ('.o, .e = to_bool(.t)',
             {"t": ["true", "NO", " 1 ", "maybe", None, "Y"]},
             ("o", "e")),
            ('.o, .e = to_bool(.t)', {"t": [0, 3, None, -1]}, ("o", "e")),
        ]
        for src, data, fields in cases:
            batch = pa.table(data)
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src, strict=False)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                for fld in fields:
                    assert out[i][fld] == ev.get(fld), \
                        (src, i, fld, out[i][fld], ev.get(fld))

        # struct field access on the lowered parse_regex result
        src = (r'''.p = parse_regex!(.t, r'(?P<code>\d\d\d)')'''
               + "\n.code = .p.code")
        b = pa.table({"t": ["x 200 y", "z 404"]})
        out = VectorProgram(src).run(b).to_pylist()
        assert [r["code"] for r in out] == ["200", "404"]

        # optional args that silently diverged before r3:
        # case_sensitive on the contains family, floor/ceil
        # precision, and round's integer return at precision 0
        for src, col, vals in [
                ('.o = contains(.t, "O", case_sensitive: false)',
                 "t", ["foo", "bar"]),
                ('.o = starts_with(.t, "F", false)', "t", ["foo", "x"]),
                ('.o = ends_with(.t, "O", false)', "t", ["foo", "baO"]),
                ('.o = floor(.v, 2)', "v", [1.2345, -1.236]),
                ('.o = ceil(.v, 1)', "v", [1.2345, -1.236]),
                ('.o = round(.v)', "v", [1.5, -2.5])]:
            b = pa.table({col: pa.array(vals)})
            out = [r["o"] for r in VectorProgram(src).run(b).to_pylist()]
            p = Program(src)
            exp = [p.resolve({col: x})[1]["o"] for x in vals]
            assert out == exp and all(
                type(x) == type(y) for x, y in zip(out, exp)), \
                (src, out, exp)

        # to_unix_timestamp unit argument (ignored before r3) and
        # non-UTC format_timestamp timezone (must fall back, the
        # kernel renders UTC only)
        from datetime import datetime, timezone as _tz
        ts = [datetime(2021, 1, 2, 3, 4, 5, 123456, tzinfo=_tz.utc)]
        bt = pa.table({"ts": pa.array(ts, pa.timestamp("us", tz="UTC"))})
        for src in ('.o = to_unix_timestamp(.ts, unit: "milliseconds")',
                    '.o = to_unix_timestamp(.ts, "nanoseconds")'):
            out = [r["o"] for r in VectorProgram(src).run(bt).to_pylist()]
            p = Program(src)
            exp = [p.resolve({"ts": x})[1]["o"] for x in ts]
            assert out == exp, (src, out, exp)
        with pytest.raises(NotVectorizable):
            VectorProgram('.o = format_timestamp!(.ts, "%F", '
                          'timezone: "America/New_York")').run(bt)

        # replace: regex-literal pattern and count must match the
        # interpreter (both diverged before r3 — literal-substring
        # replace of the regex SOURCE, and count ignored)
        for src, vals in [
                (r'''.o = replace(.t, r'o+', "0")''', ["foo", "o+o"]),
                ('.o = replace(.t, "o", "0", count: 1)', ["foo", "o+o"]),
                ('.o = replace(.t, "o", "0", 2)', ["fooo", "o"])]:
            b = pa.table({"t": pa.array(vals, pa.string())})
            out = [r["o"] for r in VectorProgram(src).run(b).to_pylist()]
            p = Program(src)
            exp = [p.resolve({"t": x})[1]["o"] for x in vals]
            assert out == exp, (src, out, exp)
        # replacement strings with $-group refs cannot lower (RE2
        # rewrite syntax differs from the interpreter's)
        with pytest.raises(NotVectorizable):
            VectorProgram(r'''.o = replace(.t, r'(o)', "$1$1")''').run(
                pa.table({"t": ["o"]}))

        # unsafe patterns refuse to lower (fall back, never diverge):
        # optional group, alternation, dynamic pattern
        for bad in (r'''.p = parse_regex!(.t, r'(?P<a>\d)(?P<b>x)?')''',
                    r'''.p = parse_regex!(.t, r'(?P<a>cat|dog)')''',
                    '.p = parse_regex!(.t, .pat)'):
            with pytest.raises(NotVectorizable):
                VectorProgram(bad).run(
                    pa.table({"t": ["1x"], "pat": ["x"]}))

    def test_ok_err_into_nested_paths(self):
        """r3: `ok, err =` where either target is a nested path."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"s": pa.array(["12", "nope", "7"])})
        for src, okf, errf in (
                (".val, .meta.err = to_int(.s)", "val", ("meta", "err")),
                (".out.val, .out.err = to_int(.s)",
                 ("out", "val"), ("out", "err"))):
            out = VectorProgram(src).run(batch)
            p = Program(src)

            def dig(obj, path):
                if isinstance(path, str):
                    return obj.get(path)
                for seg in path:
                    obj = (obj or {}).get(seg) if isinstance(obj, dict) \
                        else None
                return obj

            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                got = out.to_pylist()[i]
                assert dig(got, okf) == dig(ev, okf), (src, i)
                assert dig(got, errf) == dig(ev, errf), (src, i)

    def test_remap_auto_selects_vector_stage(self, ray_session):
        import ray.data as rd

        from vrl_ray.lang.remap import remap

        ds = rd.from_arrow(self._batch())
        out = remap(ds, self.PROGRAM).to_pandas()
        assert list(out["kind"]) == ["click", "error", "view", "login"]
        assert list(out["is_big"]) == [False, True, False, True]


class TestCli:
    """vrl_ray.cli — the reference's `vrl` one-shot contract
    (src/cli/cmd.rs:30-170)."""

    def test_result_per_event(self, tmp_path, capsys):
        from vrl_ray.cli import main

        f = tmp_path / "e.ndjson"
        f.write_text('{"a": 1}\n{"a": 2}\n')
        assert main([".a + 1", "-i", str(f)]) == 0
        assert capsys.readouterr().out == "2\n3\n"

    def test_print_object(self, tmp_path, capsys):
        from vrl_ray.cli import main

        f = tmp_path / "e.ndjson"
        f.write_text('{"a": 1}\n')
        assert main(["-o", ".b = .a * 10", "-i", str(f)]) == 0
        assert capsys.readouterr().out == '{"a":1,"b":10}\n'

    def test_empty_input_is_one_empty_object(self, tmp_path, capsys):
        from vrl_ray.cli import main

        f = tmp_path / "empty.ndjson"
        f.write_text("")
        assert main(["-o", '.x = "hi"', "-i", str(f)]) == 0
        assert capsys.readouterr().out == '{"x":"hi"}\n'

    def test_context_timezone(self, tmp_path, capsys):
        """-z (cmd.rs:51-53): naive timestamps resolve in the context
        timezone — parse_timestamp and the log parsers both honor it."""
        from vrl_ray.cli import main
        from vrl_ray.functions.timestamp import set_context_timezone

        f = tmp_path / "e.ndjson"
        f.write_text("{}\n")
        try:
            assert main([
                "-z", "Europe/Paris",
                'parse_timestamp!("2019-12-31:12:00:00",'
                ' "%Y-%m-%d:%H:%M:%S")',
                "-i", str(f)]) == 0
            # Paris is UTC+1 in winter
            assert capsys.readouterr().out == '"2019-12-31T11:00:00Z"\n'
            assert main(["-z", "Not/AZone", ".x", "-i", str(f)]) == 1
            assert "unable to parse timezone: Not/AZone" in \
                capsys.readouterr().err
        finally:
            set_context_timezone(None)

    def test_program_error_exit_code(self, tmp_path, capsys):
        from vrl_ray.cli import main

        f = tmp_path / "e.ndjson"
        f.write_text('{"a": "not a number"}\n')
        assert main(['to_int!(.a)', "-i", str(f)]) == 1

    def test_repl_persistent_event(self, capsys):
        import io

        from vrl_ray.cli import run_repl

        lines = iter(['.a = 1', '.b = .a + 1', '.', 'exit'])
        buf = io.StringIO()
        assert run_repl(input_fn=lambda: next(lines), out=buf) == 0
        out = buf.getvalue().splitlines()
        assert out[-1] == '{"a":1,"b":2}'


class TestVectorFallbackInRay:
    def test_schema_surprise_degrades_to_error_lane(self, ray_session):
        """ADVICE r1 high: a data-dependent Arrow type error inside
        the vectorized remap stage must NOT crash the pipeline — the
        batch reruns through the interpreter and the rows carry
        vrl_err."""
        import pyarrow as pa
        import ray.data as rd

        from vrl_ray.lang.remap import remap

        # string-typed column where the program compares numerically
        ds = rd.from_arrow(pa.table({"v": pa.array(["a", "b", "c"])}))
        out = remap(ds, ".big = .v > 3").take_all()
        assert len(out) == 3
        assert all(r["vrl_err"] for r in out)
        assert all(r["big"] is None for r in out)

    def test_nested_program_via_remap(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vrl_ray.lang.remap import remap

        ds = rd.from_arrow(pa.table({"event_type": pa.array(["A", "b"])}))
        rows = remap(ds, ".meta.kind = downcase(.event_type)").take_all()
        assert [r["meta"] for r in rows] == [{"kind": "a"}, {"kind": "b"}]


class TestUnionLane:
    """r4: per-row dynamic-type branch blends vectorize via tagged
    union lanes (vectorize._Union) instead of falling back — values,
    error texts and capture defaults must match the interpreter."""

    def _both(self, src, batch):
        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        out = VectorProgram(src).run(batch).to_pylist()
        p = Program(src)
        ref = []
        for row in batch.to_pylist():
            try:
                _, ev, _ = p.resolve(dict(row))
                ref.append(ev)
            except Exception as ex:
                ref.append({"__err__": str(ex)})
        return out, ref

    def test_mixed_branch_types_blend(self):
        import pyarrow as pa

        b = pa.table({"a": pa.array([1, 2, None], pa.int64())})
        out, ref = self._both('.o = if .a == 1 { "one" } else { 99 }', b)
        assert [r["o"] for r in out] == ["one", 99, 99]
        assert [r["o"] for r in ref] == ["one", 99, 99]

    def test_union_through_kernel_and_binop(self):
        import pyarrow as pa

        b = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
        src = ('.u = if .a == 1 { "x" } else { .a }\n'
               '.s = to_string(.u)\n'
               '.p, .e = .u + 1')
        out, ref = self._both(src, b)
        for o, r in zip(out, ref):
            assert o["s"] == r["s"], (o, r)
            assert o["p"] == r["p"], (o, r)
            assert (o["e"] or None) == (r.get("e") or None), (o, r)

    def test_union_equality_cross_type_false(self):
        import pyarrow as pa

        b = pa.table({"a": pa.array([1, 2], pa.int64())})
        out, ref = self._both(
            '.q = (if .a == 1 { "1" } else { .a }) == 2', b)
        assert [r["q"] for r in out] == [False, True]
        assert [r["q"] for r in ref] == [False, True]

    def test_retyped_overwrite_under_mask_unions(self):
        import pyarrow as pa

        # .s starts string; errored rows keep the string while ok
        # rows get an int — per-row types in one column
        b = pa.table({"s": pa.array(["5", "x", "7"])})
        out, ref = self._both('.s = to_int!(.s)', b)
        assert [r["s"] for r in out] == [5, "x", 7]
        assert out[1]["vrl_err"] is not None

    def test_join_per_row_separator(self):
        import pyarrow as pa

        b = pa.table({"s": pa.array(["a,b", "c,d", "e,f"]),
                      "t": pa.array(["-", None, "+"])})
        out, ref = self._both('.o, .e = join(split(.s, ","), .t)', b)
        for o, r in zip(out, ref):
            assert o["o"] == r["o"], (o, r)
            assert (o["e"] or None) == (r.get("e") or None), (o, r)

    def test_computed_containers(self):
        import pyarrow as pa

        b = pa.table({"a": pa.array([1, None], pa.int64()),
                      "s": pa.array(["x", "y"])})
        out, ref = self._both(
            '.arr = [.a, 7]\n.obj = {"k": .s, "n": .a}', b)
        for o, r in zip(out, ref):
            assert o["arr"] == r["arr"], (o, r)
            assert o["obj"] == r["obj"], (o, r)

    def test_row_path_mixed_type_output_never_raises(self):
        """r4: a program whose output column holds per-row dynamic
        types must not crash EITHER path (repo invariant: data never
        raises from a stage). Both materialize a sparse union with
        identical values."""
        import pyarrow as pa

        from vrl_ray.lang.remap import RemapStage, VectorRemapStage

        src = '.o = if .a == 1 { "one" } else { 99 }'
        b = pa.table({"a": pa.array([1, 2, None], pa.int64())})
        row = RemapStage(src)(b)
        vec = VectorRemapStage(src)(b)
        assert row["o"].to_pylist() == ["one", 99, 99]
        assert row["o"].to_pylist() == vec["o"].to_pylist()

    def test_union_columns_survive_block_slicing(self):
        """r4: union columns are DENSE — pyarrow 16 mishandles sliced
        sparse unions (children ignore the slice offset) and Ray
        blocks slice tables constantly."""
        import pyarrow as pa

        from vrl_ray.lang.remap import RemapStage, VectorRemapStage

        b = pa.table({"c": pa.array([True, False, True]),
                      "s": pa.array(["x", "y", "z"]),
                      "a": pa.array([1, 2, 3], pa.int64())})
        v = VectorRemapStage('.o = if .a == 1 { "one" } else { 99 }')(b)
        assert v.slice(1, 2)["o"].to_pylist() == [99, 99]
        v2 = VectorRemapStage('.x = [.a, "t"]')(b)
        assert v2.slice(2, 1)["x"].to_pylist() == [[3, "t"]]
        r = RemapStage('.s = if .c { [1, 2] } else { ["a"] }')(b)
        assert r.slice(1, 1)["s"].to_pylist() == [["a"]]

    def test_row_path_nested_heterogeneous_never_raises(self):
        """r4 review fix: per-row heterogeneity NESTED inside lists /
        dicts written to an input column must not crash the stage."""
        import pyarrow as pa

        from vrl_ray.lang.remap import RemapStage

        b = pa.table({"c": pa.array([True, False]),
                      "s": pa.array(["x", "y"])})
        out = RemapStage('.s = if .c { [1, 2] } else { ["a"] }')(b)
        assert out["s"].to_pylist() == [[1, 2], ["a"]]
        out2 = RemapStage('.s = if .c { 5 } else { ["a", 1] }')(b)
        assert out2["s"].to_pylist() == [5, ["a", 1]]


class TestStructShapeParity:
    """r4: nested writes into a TYPED struct column preserve each
    row's true object shape — a write into a null row creates a fresh
    object with ONLY the written path (no null siblings), dead rows
    (errors/aborts) keep their prior shape, and int/float branch
    blends keep per-row kinds (union lanes, not Arrow float
    promotion). Interpreter = ground truth for all of these."""

    BATCH = None

    @staticmethod
    def _batch():
        import pyarrow as pa

        return pa.table({
            "obj": pa.array(
                [{"x": 1, "y": "hey"}, None, {"x": 9, "y": ""}],
                pa.struct([("x", pa.int64()), ("y", pa.string())])),
            "s": pa.array(["7", "", "z"]),
        })

    @staticmethod
    def _both(src, batch):
        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        out = VectorProgram(src).run(batch).to_pylist()
        p = Program(src)
        ref = []
        for row in batch.to_pylist():
            ev = {k: (dict(v) if isinstance(v, dict) else v)
                  for k, v in row.items()}
            try:
                _, ev2, _ = p.resolve(ev)
                ref.append(ev2)
            except Exception as ex:
                ref.append({"__err__": str(ex), **ev})
        return out, ref

    def test_null_row_write_creates_fresh_shape(self):
        out, ref = self._both('.obj.x = 5', self._batch())
        assert out[1]["obj"] == {"x": 5}          # no null 'y' sibling
        assert [r["obj"] for r in out] == [r["obj"] for r in ref]

    def test_chained_writes_accrete_on_fresh_shape(self):
        out, ref = self._both('.obj.x = 5\n.obj.z = 7', self._batch())
        assert out[1]["obj"] == {"x": 5, "z": 7}
        assert [r["obj"] for r in out] == [r["obj"] for r in ref]

    def test_reads_from_union_shaped_struct(self):
        out, ref = self._both('.obj.x = 5\n.r = .obj.y', self._batch())
        assert [r["r"] for r in out] == ["hey", None, ""]
        assert [r["r"] for r in out] == [r.get("r") for r in ref]

    def test_dead_rows_keep_prior_shape_on_added_field(self):
        # slice!("", 1) aborts row 2: its obj must NOT grow a null z
        out, ref = self._both('.obj.z = slice!(.s, 1)', self._batch())
        assert out[1]["obj"] is None               # prior null stays null
        assert out[1]["vrl_err"] is not None
        assert [r["obj"] for r in out] == [r["obj"] for r in ref]

    def test_int_float_blend_keeps_per_row_kind(self):
        import pyarrow as pa

        b = pa.table({"c": pa.array([True, False]),
                      "f": pa.array([1.5, 2.5], pa.float64()),
                      "q": pa.array([None, None], pa.int64())})
        out, ref = self._both(
            '.o = if .c { 0 } else { .f }\n.p = .o + .q', b)
        assert [r["o"] for r in out] == [0, 2.5]
        assert out[0]["vrl_err"] == "can't add type null to integer"
        assert out[1]["vrl_err"] == "can't add type null to float"
        assert [r["vrl_err"] for r in out] == \
            [r["__err__"] for r in ref]

    def test_same_type_union_list_equality(self):
        import pyarrow as pa

        b = pa.table({"a": pa.array([1], pa.int64())})
        out, _ = self._both(
            '.u = ["a", 1]\n.eq = (.u == .u)\n.ne = (.u != .u)', b)
        assert out[0]["eq"] is True and out[0]["ne"] is False

    def test_hash_on_non_string_degrades_per_row(self):
        import pyarrow as pa

        from vrl_ray.lang.remap import RemapStage, VectorRemapStage

        b = pa.table({"a": pa.array([1, 2], pa.int64())})
        src = '.obj.y = .a\n.h, .e = md5(.obj.y)'
        row, vec = RemapStage(src)(b), VectorRemapStage(src)(b)
        assert vec["e"].to_pylist() == row["e"].to_pylist()
        assert row["e"].to_pylist()[0] is not None


class TestEncodeJsonKernel:
    """r4: encode_json lowers to the column plan (leaves render via
    the row encoder per DISTINCT value; structs/lists/unions
    assemble with Arrow join kernels). Output must be byte-identical
    to value.encode_json."""

    def _both(self, src, batch):
        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        out = VectorProgram(src).run(batch).to_pylist()
        p = Program(src)
        ref = []
        for row in batch.to_pylist():
            _, ev, _ = p.resolve(dict(row))
            ref.append(ev)
        return out, ref

    def test_all_shapes_exact(self):
        import pyarrow as pa

        batch = pa.table({
            "obj": pa.array(
                [{"x": 1, "y": "q\"uo\nte"}, None, {"x": 9, "y": ""}],
                pa.struct([("x", pa.int64()), ("y", pa.string())])),
            "arr": pa.array([[1, 2], [], None], pa.list_(pa.int64())),
            "f": pa.array([1.0, -0.5, None], pa.float64()),
            "ts": pa.array([1700000000123456, 0, None],
                           pa.timestamp("us", tz="UTC")),
        })
        src = ('.a1 = encode_json(.obj)\n.a2 = encode_json(.arr)\n'
               '.a3 = encode_json(.f)\n.a4 = encode_json(.ts)')
        out, ref = self._both(src, batch)
        for o, r in zip(out, ref):
            for k in ("a1", "a2", "a3", "a4"):
                assert o[k] == r[k], (k, o[k], r[k])
        assert out[0]["a1"] == '{"x":1,"y":"q\\"uo\\nte"}'
        assert out[1]["a1"] == "null"
        assert out[2]["a2"] == "null"
        assert out[0]["a3"] == "1.0"

    def test_union_shaped_struct_renders_true_shape(self):
        import pyarrow as pa

        batch = pa.table({
            "obj": pa.array(
                [{"x": 1, "y": "hey"}, None],
                pa.struct([("x", pa.int64()), ("y", pa.string())])),
        })
        out, ref = self._both('.obj.x = 5\n.j = encode_json(.obj)',
                              batch)
        assert out[1]["j"] == '{"x":5}'
        assert [r["j"] for r in out] == [r["j"] for r in ref]

    def test_sorted_keys_and_heterogeneous_literal(self):
        import pyarrow as pa

        batch = pa.table({"a": pa.array([1, None], pa.int64())})
        out, ref = self._both(
            '.j = encode_json({"z": [.a, "t"], "a": null})', batch)
        assert out[0]["j"] == '{"a":null,"z":[1,"t"]}'
        assert [r["j"] for r in out] == [r["j"] for r in ref]

    def test_pretty_falls_back_to_row_path(self):
        import pyarrow as pa

        from vrl_ray.lang.remap import RemapStage, VectorRemapStage

        b = pa.table({"obj": pa.array(
            [{"x": 1}], pa.struct([("x", pa.int64())]))})
        src = '.j = encode_json(.obj, pretty: true)'
        row, vec = RemapStage(src)(b), VectorRemapStage(src)(b)
        assert vec["j"].to_pylist() == row["j"].to_pylist()


class TestDelExistsKernels:
    """r4: del/exists over event paths lower to the column plan;
    conservative fallbacks where per-row presence can't live in a
    column (written fields, partially-stopped batches)."""

    @staticmethod
    def _batch():
        import pyarrow as pa

        return pa.table({
            "obj": pa.array(
                [{"x": 1, "y": "hey"}, None, {"x": 9, "y": ""}],
                pa.struct([("x", pa.int64()), ("y", pa.string())])),
            "a": pa.array([1, None, 3], pa.int64()),
        })

    def test_exists_shapes(self):
        from vrl_ray.lang.vectorize import VectorProgram

        src = ('.e1 = exists(.a)\n.e2 = exists(.missing)\n'
               '.e3 = exists(.obj.x)\n.e4 = exists(.obj.zz)')
        out = VectorProgram(src).run(self._batch()).to_pylist()
        assert [r["e1"] for r in out] == [True, True, True]
        assert [r["e2"] for r in out] == [False, False, False]
        # null struct row has no keys
        assert [r["e3"] for r in out] == [True, False, True]
        assert [r["e4"] for r in out] == [False, False, False]

    def test_del_nested_removes_field_per_shape(self):
        from vrl_ray.lang.vectorize import VectorProgram

        out = VectorProgram('del(.obj.x)\ndel(.obj.y)') \
            .run(self._batch()).to_pylist()
        assert [r["obj"] for r in out] == [{}, None, {}]

    def test_del_expression_returns_old(self):
        from vrl_ray.lang.vectorize import VectorProgram

        out = VectorProgram('.old = del(.a)').run(self._batch()) \
            .to_pylist()
        assert [r["old"] for r in out] == [1, None, 3]
        assert [r["a"] for r in out] == [None, None, None]

    def test_del_on_partially_stopped_batch_matches_row_path(self):
        import pyarrow as pa

        from vrl_ray.lang.remap import RemapStage, VectorRemapStage

        b = pa.table({"s": pa.array(["7", "bad"]),
                      "a": pa.array([1, 2], pa.int64())})
        src = '.n = to_int(.s)\ndel(.a)'
        row, vec = RemapStage(src)(b), VectorRemapStage(src)(b)
        # error row KEEPS .a; both lanes agree
        assert row["a"].to_pylist() == vec["a"].to_pylist()
        assert row["a"].to_pylist()[1] == 2


class TestMergeOpKernel:
    """r4: the `|` shallow object merge lowers to a struct-column
    rebuild (right fields overwrite, left-then-right field order);
    null/non-object sides error per row with the interpreter's
    template and a null ok-default."""

    def test_merge_matrix(self):
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({
            "obj": pa.array(
                [{"x": 1, "y": "hey"}, None, {"x": 9, "y": ""}],
                pa.struct([("x", pa.int64()), ("y", pa.string())])),
            "o2": pa.array(
                [{"y": "R", "z": 5}, {"y": "r2", "z": 6}, None],
                pa.struct([("y", pa.string()), ("z", pa.int64())])),
            "a": pa.array([1, 2, 3], pa.int64()),
        })
        for src in ('.m, .e = (.obj | .o2)',
                    '.m, .e = (.obj | {"w": true})',
                    '.m, .e = (.obj | .a)',
                    '.m, .e = (.obj | .missing)'):
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                ev = {k: (dict(v) if isinstance(v, dict) else v)
                      for k, v in row.items()}
                _, ref, _ = p.resolve(ev)
                assert out[i]["m"] == ref["m"], (src, i)
                assert out[i]["e"] == ref.get("e"), (src, i)

    def test_merge_field_order_feeds_encode_json(self):
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        b = pa.table({"a": pa.array([1], pa.int64())})
        out = VectorProgram(
            '.m = ({"b": 1} | {"a": 2})\n.j = encode_json(.m)'
        ).run(b).to_pylist()
        assert out[0]["j"] == '{"a":2,"b":1}'


class TestTypeAssertAndMergeAssign:
    """r4: string()/int()/float()/bool()/array()/object()/timestamp()
    type asserts and the |= merge-assign lower to the column plan."""

    def test_type_assert_family(self):
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({
            "a": pa.array([5, None], pa.int64()),
            "s": pa.array(["x", None]),
        })
        for src in ('.o, .e = string(.s)', '.o, .e = string(.a)',
                    '.o, .e = int(.a)', '.o, .e = bool(.s)',
                    '.o, .e = timestamp(.missing)'):
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                assert out[i]["o"] == ev["o"], (src, i)
                assert (out[i]["e"] or None) == (ev.get("e") or None), \
                    (src, i, ev.get("e"), out[i]["e"])

    def test_merge_assign_matrix(self):
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({
            "x": pa.array([{"b": 2}, None, {"b": 3}],
                          pa.struct([("b", pa.int64())])),
            "n": pa.array([5, None, 7], pa.int64()),
            "r": pa.array([{"a": 10}, {"a": 11}, None],
                          pa.struct([("a", pa.int64())])),
        })
        for src in ('.x |= {"a": 1}', '.n |= {"a": 1}',
                    '.miss |= {"a": 1}', '.x |= .r', '.x |= .n'):
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                ev0 = {k: (dict(v) if isinstance(v, dict) else v)
                       for k, v in row.items()}
                try:
                    _, ev, _ = p.resolve(ev0)
                    rerr = None
                except Exception as ex:
                    rerr = str(ex); ev = ev0
                assert (out[i]["vrl_err"] or None) == rerr, (src, i)
                for k in ("x", "n", "r", "miss"):
                    if k in ev or k in out[i]:
                        assert out[i].get(k) == ev.get(k), (src, i, k)


class TestNestedBranchTargets:
    """r4: if-branches may write NESTED paths; untaken/errored rows
    keep the prior value and shape (incl. null struct rows)."""

    def test_nested_if_targets(self):
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({
            "obj": pa.array(
                [{"x": 1, "y": "hey"}, None, {"x": 9, "y": ""}],
                pa.struct([("x", pa.int64()), ("y", pa.string())])),
            "c": pa.array([True, False, True]),
            "s": pa.array(["7", "bad", "9"]),
        })
        for src in ('if .c { .obj.x = 100 }',
                    'if .c { .obj.z = 1 } else { .obj.x = -1 }',
                    'if .c { .obj.x = to_int(.s) }',
                    'if .c { .obj.x = 5\n.obj.y = "set" } '
                    'else { .r = 0 }'):
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                ev0 = {k: (dict(v) if isinstance(v, dict) else v)
                       for k, v in row.items()}
                _, ev, _ = p.resolve(ev0)
                assert out[i]["obj"] == ev["obj"], (src, i)


class TestArrayKernels:
    """r4: length/push/append/includes lower to the column plan
    (numpy offset interleave for per-row list concat)."""

    @staticmethod
    def _batch():
        import pyarrow as pa

        return pa.table({
            "arr": pa.array([[1, 2], [], None, [5]],
                            pa.list_(pa.int64())),
            "arr2": pa.array([[7], [8, 9], [10], None],
                             pa.list_(pa.int64())),
            "s": pa.array(["héllo", None, "x", ""]),
            "a": pa.array([5, 2, None, 1], pa.int64()),
        })

    def _check(self, src):
        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = self._batch()
        out = VectorProgram(src).run(batch).to_pylist()
        p = Program(src)
        for i, row in enumerate(batch.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            assert out[i]["o"] == ev["o"], (src, i, ev["o"], out[i]["o"])
            assert (out[i]["e"] or None) == (ev.get("e") or None), \
                (src, i, ev.get("e"), out[i]["e"])

    def test_length(self):
        for src in ('.o, .e = length(.arr)', '.o, .e = length(.s)',
                    '.o, .e = length(.a)', '.o, .e = length(.miss)'):
            self._check(src)

    def test_push_append(self):
        for src in ('.o, .e = push(.arr, 9)', '.o, .e = push(.arr, .a)',
                    '.o, .e = push(.a, 9)', '.o, .e = push(.arr, null)',
                    '.o, .e = append(.arr, .arr2)',
                    '.o, .e = append(.arr, [7, 8])',
                    '.o, .e = append(.a, .arr)'):
            self._check(src)

    def test_includes(self):
        for src in ('.o, .e = includes(.arr, 2)',
                    '.o, .e = includes(.arr, .a)',
                    '.o, .e = includes(.arr, 2.0)',
                    '.o, .e = includes(.arr, "x")',
                    '.o, .e = includes(.a, 2)'):
            self._check(src)


class TestParseJsonKernel:
    """r4: parse_json lowers to the column plan — per-row json.loads
    bounded to the statement, per-SHAPE union lanes so each row's
    true object shape survives into encode_json."""

    def test_mixed_shapes_and_errors(self):
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"s": pa.array(
            ['{"k": 1, "n": {"d": 2}}', '{"k": 5}', '{nope', None,
             '[1, "a"]', '"plain"', '7', '{"k": 1.5, "extra": true}'])})
        src = ('.o, .e = parse_json(.s)\n.r = .o.k\n'
               '.j = encode_json(.o)')
        out = VectorProgram(src).run(batch).to_pylist()
        p = Program(src)
        for i, row in enumerate(batch.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            for k in ("o", "e", "r", "j"):
                assert (out[i].get(k) or None) == (ev.get(k) or None), \
                    (i, k, ev.get(k), out[i].get(k))
        # shape-true rendering: no null-filled siblings
        assert out[1]["j"] == '{"k":5}'

    def test_max_depth(self):
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        b = pa.table({"s": pa.array(['{"k": {"d": 2}}'])})
        out = VectorProgram(
            '.o, .e = parse_json(.s, max_depth: 1)').run(b).to_pylist()
        assert out[0]["o"] == {"k": '{"d": 2}'}   # RAW slice, space kept

    def test_mixed_kind_leaf_under_one_key_no_abort(self):
        """r5 (ADVICE): mixed leaf KINDS under one key merge into a
        struct lane with a union child; handled-capture error masking
        must never give that struct a validity bitmap — pc.struct_field
        on struct-with-validity + union child hits an Arrow CHECK
        (array_nested.cc:1142) and ABORTS the whole worker process.
        This ran as exit-134 before the mask_null retag fix."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"s": pa.array(
            ['{"a": 1}', '{"a": "x"}', 'bad', None,
             '{"a": 2.5}', '{"a": [1, "z"]}', '{"a": {"b": 3}}'])})
        src = '.p, .e = parse_json(.s)\n.q = .p.a'
        out = VectorProgram(src).run(batch).to_pylist()
        p = Program(src)
        for i, row in enumerate(batch.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            for k in ("p", "e", "q"):
                assert (out[i].get(k) or None) == \
                    (ev.get(k) or None), (i, k)


class TestRowLoopTier:
    """r4: registry functions without a dedicated Arrow kernel run
    per row BOUNDED TO THEIR STATEMENT (generic row-loop tier) —
    the rest of the program stays columnar; nondeterministic and
    environment functions stay excluded."""

    def test_assorted_functions_match_interpreter(self):
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({
            "s": pa.array(["host=a dur=1.5 ok=true", "x", None]),
            "url": pa.array(["https://ex.com:8080/p?a=1&b=2",
                             "notaurl", "http://x.y/"]),
            "n": pa.array([3, None, -7], pa.int64()),
        })
        progs = ('.o, .e = parse_key_value(.s)',
                 '.o, .e = parse_url(.url)\n.j = encode_json(.o)',
                 '.o, .e = format_number(.n, 2)',
                 '.o, .e = parse_logfmt(.s)\n.h = .o.host')
        for src in progs:
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                for k in ("o", "e", "j", "h"):
                    assert (out[i].get(k) or None) == \
                        (ev.get(k) or None), (src, i, k)

    def test_nested_shape_lanes_split_query_objects(self):
        """parse_url's nested query object must keep each row's OWN
        key set (no null-filled params from sibling rows)."""
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        b = pa.table({"u": pa.array(["http://x.y/?a=1", "http://x.y/"])})
        out = VectorProgram('.o = parse_url!(.u)\n.j = encode_json(.o)') \
            .run(b).to_pylist()
        assert '"query":{"a":"1"}' in out[0]["j"]
        assert '"query":{}' in out[1]["j"]

    def test_excluded_functions_stay_row_path(self):
        import pytest as _pytest

        from vrl_ray.lang.vectorize import NotVectorizable, VectorProgram

        # random_* stay excluded; now/uuid_v4/uuid_v7 vectorize since
        # r5 (now() = one clock read per batch; uuids per row)
        for src in (".x = random_int(0, 5)", ".x = random_bool()"):
            with _pytest.raises(NotVectorizable):
                VectorProgram(src)
        import pyarrow as pa

        b = pa.table({"t": pa.array(["a", "b"])})
        out = VectorProgram(".x = uuid_v4()\n.y = uuid_v7()\n"
                            ".z = now()").run(b)
        xs = out["x"].to_pylist()
        assert len(set(xs)) == 2 and all(len(u) == 36 for u in xs)
        assert out["z"].to_pylist()[0] is not None

    def test_handled_merge_assign(self):
        """r5: `.res, err |= expr` vectorizes — error rows (expr OR
        merge-type) get the type default plain-assigned and err
        captures the message (interpreter retries with op '=')."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"kv": pa.array(["bar=3", "bar=7", "bar=9"]),
                          "n": pa.array([1, 2, None])})
        progs = ('.res = {"foo": 2}\n.res, _ |= parse_key_value(.kv)\n'
                 '.out = encode_json(.res)',
                 '.res = {"a": 1}\n.res, .e |= 32\n'
                 '.out = encode_json(.res)',
                 '.res = {"a": 1}\n.res, e |= {"b": .n}\n'
                 '.out = encode_json(.res)\n.eo = e')
        for src in progs:
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                for k in ("out", "e", "eo"):
                    assert out[i].get(k) == ev.get(k), (src, i, k)

    def test_infinity_rendering(self):
        """r5 (fuzz-found): ±inf renders as inf/-inf through
        to_string (Rust f64 Display) and as null through encode_json
        (serde_json serialize_f64) — Python's defaults were
        OverflowError and the invalid literal `Infinity`."""
        import pyarrow as pa

        from vrl_ray.functions import REGISTRY
        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        assert REGISTRY["to_string"](float("inf")) == "inf"
        assert REGISTRY["to_string"](float("-inf")) == "-inf"
        assert REGISTRY["encode_json"](
            {"v": float("inf"), "w": [1.5, float("-inf")]}) \
            == '{"v":null,"w":[1.5,null]}'
        batch = pa.table({"x": pa.array([1e308, -1e308, 0.5])})
        for src in ('.o, .e = to_string(.x * 10.0)',
                    '.o = encode_json([.x * 10.0, 1.25])'):
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                for k in ("o", "e"):
                    assert out[i].get(k) == ev.get(k), (src, i, k)

    def test_root_merge_assign_handled(self):
        """r5: `., err |= expr` — ok rows merge rhs fields into the
        event; error rows (expr or merge-type) reset the WHOLE event
        to the null default (all columns null), err captures."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"obj": pa.array([{"w": 1}, {"w": 2}, None]),
                          "keep": pa.array(["a", "b", "c"])})
        src = '., err |= .obj\n.e = err\n.k2 = .keep\n.w2 = .w'
        out = VectorProgram(src).run(batch).to_pylist()
        p = Program(src)
        for i, row in enumerate(batch.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            ev = ev if ev is not None else {}
            for k in (set(ev) | set(out[i])) - {"vrl_err", "aborted",
                                                "extra"}:
                assert out[i].get(k) == ev.get(k), (i, k)
        assert out[2]["keep"] is None and out[2]["e"] is not None
        # corpus shape (infallible_err_merge_assignment.vrl)
        o = VectorProgram(
            '. = { "onk": 1 }\n'
            "., err |= parse_syslog(s'not a syslog message')\n"
            '.e = err').run(pa.table({"d": [1]})).to_pylist()
        assert o[0].get("onk") is None and "syslog" in o[0]["e"]

    def test_var_merge_assign(self):
        """r5: variable |= targets (plain and handled) — unset vars
        and non-object current values coerce through the same merge
        math as event paths."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"n": pa.array([1, 2, None])})
        progs = ('x = {"ook": 23}\nx |= {"w": 1}\n.out = encode_json(x)',
                 'x = "oh no"\nx, .e |= {"ook": 32}\n'
                 '.out = encode_json(x)',
                 'x = {"a": 1}\nx, e |= 32\n.out = [encode_json(x), e]',
                 'y |= {"b": .n}\n.out = encode_json(y)')
        for src in progs:
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                for k in ("out", "e"):
                    assert out[i].get(k) == ev.get(k), (src, i, k)

    def test_meta_root_read(self):
        """r5: `%` reads the metadata namespace as an object of the
        fields written so far ({} when none); a GATED meta write
        (post-abort) pushes the read to the row path."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram, _RowFallback

        batch = pa.table({"a": pa.array([1, 2, None])})
        for src in ('%foo = 1\n%bar = %foo + 5\n.out = %',
                    '.out = %',
                    '%x = .a\n.out = encode_json(%)'):
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                assert out[i].get("out") == ev.get("out"), (src, i)
        import pytest as _pytest
        with _pytest.raises(_RowFallback):
            VectorProgram('if .a == 1 { abort }\n%g = 9\n.out = %') \
                .run(batch)

    def test_del_exists_list_index(self):
        """r5: del(.f[i]) removes the element WITH SHIFT (negative i
        counts from the end; out-of-range / non-list = no-op) and
        exists(.f[i]) is offsets arithmetic — incl. SLICED columns
        whose offsets stay absolute into the full values child."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        full = pa.table({"onk": pa.array(
            [["drop"], ["nork", "spork"], ["a"], [], None])})
        batch = full.slice(1)
        for src in ('.old = del(.onk[0])\n.j = encode_json(.onk)',
                    '.old = del(.onk[-1])\n.j = encode_json(.onk)',
                    '.e = exists(.onk[1])\n.e2 = exists(.onk[-1])'):
            out = VectorProgram(src).run(batch).to_pylist()
            p = Program(src)
            for i, row in enumerate(batch.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                for k in ("old", "j", "e", "e2"):
                    assert out[i].get(k) == ev.get(k), (src, i, k)
        # corpus 8068 shape: del then read the shifted survivor
        o = VectorProgram('.onk = ["nork", "spork"]\ndel(.onk[0])\n'
                          '.r = .onk[0] + "!"') \
            .run(pa.table({"d": [1]})).to_pylist()
        assert o[0]["r"] == "spork!" and o[0]["onk"] == ["spork"]

    def test_named_arg_hole_passes_kwargs(self):
        """r5: a named arg that leaves a positional hole
        (`flatten(., except: [...])` skips `separator`) reaches the
        row-loop registry fn as **kwargs instead of falling back."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"a": pa.array(
            ['{"x": {"y": 1}, "keep": {"z": 2}}', 'bad', None])})
        src = ('.p, .e = parse_json(.a)\n'
               '.f, .e2 = flatten(.p, except: ["keep"])')
        out = VectorProgram(src).run(batch).to_pylist()
        assert out[0]["f"] == {"keep": {"z": 2}, "x.y": 1}
        p = Program(src)
        for i, row in enumerate(batch.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            for k in ("p", "e", "f", "e2"):
                assert (out[i].get(k) or None) == \
                    (ev.get(k) or None), (i, k)

    def test_log_rides_row_loop_tier(self, capfd):
        """r5: log() vectorizes via the generic row-loop tier — one
        stderr line per row, null return, and the REST of the program
        stays columnar (later statements still compute)."""
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        batch = pa.table({"msg": pa.array(["a", "b", None])})
        src = ('log(.msg, level: "warn")\n'
               '.x = log("fixed")\n'
               '.out, .e = upcase(.msg)')
        out = VectorProgram(src).run(batch).to_pylist()
        err = capfd.readouterr().err
        assert err.count("[warn] a") == 1 and err.count("[warn] b") == 1
        assert err.count("[info] fixed") == 3   # once per row
        p = Program(src)
        for i, row in enumerate(batch.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            for k in ("x", "out", "e"):
                assert (out[i].get(k) or None) == \
                    (ev.get(k) or None), (i, k)


class TestRootAssignment:
    """r4: whole-event replacement (`. = parse_json!(.msg)` — the
    canonical Vector remap program) lowers to the column plan; error
    rows keep their ORIGINAL event (incl. across both lanes)."""

    def test_clean_batch_drops_old_columns(self):
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        b = pa.table({"old": pa.array([5, 6], pa.int64())})
        out = VectorProgram('. = {"fixed": true, "n": .old}\n'
                            '.r = .n * 2').run(b)
        assert "old" not in out.column_names
        assert out.to_pylist() == [
            {"fixed": True, "n": 5, "r": 10, "vrl_err": None},
            {"fixed": True, "n": 6, "r": 12, "vrl_err": None}]

    def test_error_rows_keep_original_event(self):
        import pyarrow as pa

        from vrl_ray.lang.vectorize import VectorProgram

        b = pa.table({
            "m": pa.array(['{"k": 7}', 'BAD']),
            "old": pa.array([5, 6], pa.int64()),
        })
        out = VectorProgram('. = parse_json!(.m)\n.x = .k + 1') \
            .run(b).to_pylist()
        assert out[0]["k"] == 7 and out[0]["x"] == 8
        assert out[0]["m"] is None and out[0]["old"] is None
        assert out[1]["m"] == "BAD" and out[1]["old"] == 6
        assert out[1]["vrl_err"] is not None

    def test_resolve_syncs_rebound_root_on_error(self):
        """Partial mutations persist on error INCLUDING a root
        rebind — callers holding the original dict must see it."""
        from vrl_ray.lang.interpreter import Program

        p = Program('. = {"a": 1}\n.b = to_int!("bad")')
        ev = {"orig": 9}
        try:
            p.resolve(ev)
            raise AssertionError("should raise")
        except Exception:
            pass
        assert ev == {"a": 1}


class TestSlicedListKernels:
    """r4 review fix: Ray blocks slice tables constantly, and a
    sliced list column keeps ABSOLUTE offsets into the full child —
    the concat/membership kernels must rebaseline."""

    def test_kernels_on_base_offset_slice(self):
        import numpy as np
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        vals = pa.array([9, 1, 2, 3, 2, 2], pa.int64())
        off = pa.array([0, 1, 3, 4, 6], pa.int32())
        sl = pa.ListArray.from_arrays(off, vals).slice(1, 3)
        assert np.asarray(sl.offsets)[0] == 1     # base > 0 pinned
        b = pa.table({"arr": sl, "a": pa.array([2, 4, 2], pa.int64())})
        src = ('.o, .e = includes(.arr, .a)\n'
               '.p, .q = push(.arr, .a)\n'
               '.l, .m = append(.arr, .arr)\n'
               '.x = .arr[0]\n.j = encode_json(.arr)')
        vec = VectorProgram(src).run(b).to_pylist()
        p = Program(src)
        for i, row in enumerate(b.to_pylist()):
            _, ev, _ = p.resolve(dict(row))
            for k in ("o", "p", "l", "x", "j"):
                assert vec[i][k] == ev[k], (i, k, ev[k], vec[i][k])


class TestMetadataNamespace:
    """r4: %metadata paths vectorize as a transient per-event
    namespace — written beside event columns, never emitted, and
    SURVIVING whole-event replacement."""

    def test_meta_roundtrip_and_root_survival(self):
        import pyarrow as pa

        from vrl_ray.lang.interpreter import Program
        from vrl_ray.lang.vectorize import VectorProgram

        b = pa.table({"a": pa.array([5, 7], pa.int64()),
                      "m": pa.array(['{"k": 1}', '{"k": 2}'])})
        progs = ('%tmp = .a + 1\n.out, .e = %tmp * 2',
                 '%st.x = .a\n.out = %st.x',
                 '%keep = .a\n. = parse_json!(.m)\n.back = %keep')
        for src in progs:
            out = VectorProgram(src).run(b)
            assert not any(c.startswith("\x00") for c in
                           out.column_names)
            vec = out.to_pylist()
            p = Program(src)
            for i, row in enumerate(b.to_pylist()):
                _, ev, _ = p.resolve(dict(row))
                for k in ("out", "e", "back"):
                    if k in ev or k in vec[i]:
                        assert (vec[i].get(k) or None) == \
                            (ev.get(k) or None), (src, i, k)


class TestTemplateStrings:
    """\"{{ var }}\" templates desugar to concatenated VARIABLE reads
    (template_string.rs rewrite_to_concatenated_strings,
    compiler.rs:240-249) — field paths don't interpolate, non-string
    values error like string concat, raw s'..' strings never
    interpolate."""

    def _run(self, src, ev=None):
        from vrl_ray.lang import compile_program
        return compile_program(src).resolve(ev if ev is not None else {})

    def test_variable_interpolation(self):
        assert self._run('lvl = "warn"\n.m = "[{{ lvl }}] hi"')[1] == \
            {"m": "[warn] hi"}

    def test_single_segment_returns_value_verbatim(self):
        # one Template segment = just the variable (no concat, no
        # coercion): the reduce over a single item is that item
        assert self._run('x = 5\n.m = "{{ x }}"')[1] == {"m": 5}

    def test_non_string_variable_errors_like_concat(self):
        _, ev, _ = self._run('x = 5\n.m, .e = "v: {{ x }}"')
        assert ev["e"] == "can't add type integer to string"

    def test_field_path_is_undefined_variable(self):
        import pytest
        from vrl_ray.value import VrlError
        with pytest.raises(VrlError, match="undefined variable"):
            self._run('.m = "v: {{ .field }}"', {"field": "x"})

    def test_escaped_braces(self):
        assert self._run(r'.m = "a \{{ x \}} b"')[1] == \
            {"m": "a {{ x }} b"}

    def test_unterminated_open_drops_tail(self):
        # lex.rs template(): trailing content inside an open {{ is
        # dropped; a single Literal segment lexes as a plain string
        assert self._run('.m = "a {{"')[1] == {"m": "a "}
        assert self._run('.m = "{{}}"')[1] == {"m": ""}
        assert self._run('.m = "a {{}} b"')[1] == {"m": "a  b"}

    def test_raw_string_never_interpolates(self):
        assert self._run("lvl = \"w\"\n.m = s'[{{ lvl }}]'")[1] == \
            {"m": "[{{ lvl }}]"}

    def test_vector_lane_parity(self):
        import pyarrow as pa

        import importlib
        RM = importlib.import_module("vrl_ray.lang.remap")
        batch = pa.table({"s": ["a", "bb", None]})
        src = 'v = .s\n.m, .e = "got: {{ v }}!"'
        row = RM.RemapStage(src)(batch).to_pylist()
        vec = RM.VectorRemapStage(src)(batch).to_pylist()
        assert row == vec
        assert row[0]["m"] == "got: a!"
