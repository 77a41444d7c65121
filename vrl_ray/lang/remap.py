"""RemapStage: run a VRL program per event inside Ray Data.

This is the compatibility path for users bringing actual VRL programs
(the reference's embedding pattern, examples/simple.rs:8-41: compile
once, clone per worker, resolve per event). The program is compiled
ONCE per actor (``__init__``); each batch runs rows through the
tree-walking evaluator.

Events are built from row columns; every field the program writes
becomes a top-level column (structs/lists/per-row mixed types
materialize via _py_array — the same layouts the vector lane emits,
so mixed-lane blocks stay consistent; an always-null ``extra``
companion remains for schema stability). Aborted events get
``aborted=True`` (route them with ``ds.filter``); program errors
land in ``vrl_err`` — neither ever raises out of the stage, so
retries stay idempotent.

For hot pipelines prefer the vectorized stages (stages/parse.py etc.);
RemapStage trades throughput for full language compatibility.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import pyarrow as pa

from ..value import VrlError
from .interpreter import Program, Abort
from .parser import ParseError


class RemapStage:
    """``ds.map_batches(RemapStage, fn_constructor_kwargs=
    dict(source=PROGRAM), concurrency=N, batch_format="pyarrow")``"""

    def __init__(self, source: str, drop_aborted: bool = False):
        self.program = Program(source)   # compile once per actor
        self.drop_aborted = drop_aborted

    def __call__(self, batch: pa.Table) -> pa.Table:
        in_cols = batch.column_names
        rows = batch.to_pylist()
        out_rows = []
        for row in rows:
            event = dict(row)
            try:
                _, mutated, aborted = self.program.resolve(event)
                err = None
            except VrlError as e:
                mutated, aborted, err = event, None, e.message
            except Exception as e:  # program error lane, never raise
                mutated, aborted, err = event, None, str(e)
            if aborted is not None and self.drop_aborted:
                continue
            if not isinstance(mutated, dict):
                mutated = {"value": mutated}
            mutated["aborted"] = aborted is not None
            mutated["vrl_err"] = err
            out_rows.append(mutated)
        return _rows_to_table(out_rows, in_cols)


def _rows_to_table(rows: list[dict], in_cols: list[str]) -> pa.Table:
    """Stable schema: input columns + every new field as a REAL
    column (_py_array materializes any shape); ``extra`` is an
    always-null legacy companion."""
    if not rows:
        # keep the companion columns: an all-aborted block under
        # drop_aborted must still unify with its sibling blocks
        cols0: dict = {c: pa.array([]) for c in in_cols}
        if "extra" not in cols0:
            cols0["extra"] = pa.array([], pa.string())
        cols0["aborted"] = pa.array([], pa.bool_())
        cols0["vrl_err"] = pa.array([], pa.string())
        return pa.table(cols0)
    # collect new fields across the batch
    new_fields: list[str] = []
    for r in rows:
        for k in r:
            if k not in in_cols and k not in ("aborted", "vrl_err") and \
                    k not in new_fields:
                new_fields.append(k)
    cols: dict[str, list] = {c: [] for c in in_cols}
    for f in new_fields:
        cols[f] = []
    # `extra` is a legacy always-null companion kept for schema
    # stability: complex NEW fields used to be JSON-encoded here, but
    # _py_array materializes every shape (structs, lists, unions)
    # since r4, so both remap lanes now emit REAL columns. A program
    # field literally named `extra` (a legal VRL name) shadows the
    # companion — never double-append.
    has_extra = "extra" in cols
    if not has_extra:
        cols["extra"] = []
    cols["aborted"] = []
    cols["vrl_err"] = []
    for r in rows:
        for c in in_cols:
            cols[c].append(r.get(c))
        for f in new_fields:
            cols[f].append(r.get(f))
        if not has_extra:
            cols["extra"].append(None)
        cols["aborted"].append(r["aborted"])
        cols["vrl_err"].append(r["vrl_err"])
    return pa.table({k: _py_array(v, real_nulls=True)
                     for k, v in cols.items()})


_PA_ERRS = (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError)


def _py_array(vals: list, real_nulls: bool = False) -> pa.Array:
    """pa.array with per-row dynamic-type tolerance: a column holding
    e.g. both ints and strings (``.o = if c { 1 } else { "x" }``)
    becomes a sparse Arrow union — the same representation the vector
    lane's _Union materializes, so mixed row-path/vector-path blocks
    stay consistent and the stage never raises on data (repo
    invariant). Recursion covers heterogeneity NESTED inside lists
    (``[1, 2]`` vs ``["a"]`` → list<union>) and objects (per-field
    recursion). ``real_nulls``: the Nones in ``vals`` are REAL null
    rows (a top-level column) rather than union-lane padding — null
    struct rows then materialize as nulls even when union children
    forbid a validity bitmap (dense-union null lane)."""
    try:
        out = pa.array(vals)
    except _PA_ERRS:
        pass
    else:
        # pa.array silently COERCES mixed numeric Python kinds
        # (int+float → double, bool+int → int64) — VRL keeps bool /
        # integer / float as distinct per-row kinds, so those mixes
        # must become union lanes / kind-split children like any
        # other kind mix (r5, fuzz-found via parse_json's
        # i64-overflow floats). Checks fire only on numeric-typed
        # results (incl. numeric list children / struct fields).
        coerced = _silently_coerced(out, vals)
        if coerced == "lanes":
            out = None              # top-level kind mix → lane split
        elif coerced == "list":
            return _list_flat(vals)
        elif coerced == "struct":
            return _struct_fields(vals, real_nulls=real_nulls)
        if out is not None:
            if _has_struct_type(out.type) and _shape_mixed(vals):
                # pa.array UNIFIES differing object key sets into one
                # struct (missing keys become null siblings) — the
                # reference keeps per-row shapes; split per key-set
                # like the vector lane's per-SHAPE union lanes (r5)
                if pa.types.is_struct(out.type):
                    shaped = _shape_lanes(vals)
                    if shaped is not None:
                        return shaped
                    return _struct_fields(vals, real_nulls=real_nulls)
                return _list_flat(vals)
            return out
    import numpy as np

    lane_of: dict = {}
    lanes: list[list] = []
    tags = np.zeros(len(vals), np.int8)
    for i, v in enumerate(vals):
        if v is None:
            continue            # null rows stay in lane 0
        # dicts lane per KEY SET: differing shapes must not unify
        t = ("dict", frozenset(v)) if isinstance(v, dict) else type(v)
        code = lane_of.get(t)
        if code is None:
            code = lane_of[t] = len(lanes)
            lanes.append([None] * len(vals))
        lanes[code][i] = v
        tags[i] = code
    if not lanes:
        return pa.nulls(len(vals))
    if len(lanes) == 1:
        return _py_lane(lanes[0], real_nulls=real_nulls)
    full = [_py_lane(lane) for lane in lanes]
    # DENSE union (pyarrow 16 mishandles sliced sparse unions, and
    # Ray blocks slice tables): compact each lane to its owned rows
    from .vectorize import _dense_union
    return _dense_union(tags, full, len(vals))


def _silently_coerced(out: pa.Array, vals: list):
    """Did pa.array unify distinct numeric PYTHON kinds? Returns
    "lanes" (top-level scalars mixed), "list" (list children mixed),
    "struct" (a struct field mixed) or None. Scans run only when the
    RESULT type is numeric-bearing, so kind-stable hot columns pay
    one type() per row at most."""
    t = out.type
    if pa.types.is_floating(t) or pa.types.is_integer(t):
        kinds = set()
        for v in vals:
            if v is not None:
                kinds.add(type(v))
                if len(kinds) > 1:
                    return "lanes"
        return None
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and (
            pa.types.is_floating(t.value_type)
            or pa.types.is_integer(t.value_type)):
        kinds = set()
        for v in vals:
            if v is None:
                continue
            for e_ in v:
                if e_ is not None:
                    kinds.add(type(e_))
                    if len(kinds) > 1:
                        return "list"
        return None
    if pa.types.is_struct(t):
        for j in range(t.num_fields):
            ft = t.field(j).type
            f = t.field(j).name
            if pa.types.is_floating(ft) or pa.types.is_integer(ft):
                kinds = set()
                for v in vals:
                    if v is None:
                        continue
                    x = v.get(f)
                    if x is not None:
                        kinds.add(type(x))
                        if len(kinds) > 1:
                            return "struct"
            elif pa.types.is_list(ft) or pa.types.is_struct(ft) or \
                    pa.types.is_large_list(ft):
                # recurse: a numeric mix buried in a child list /
                # nested struct ({"v": [1, 2.5]}) — rebuild per field
                # so the child takes its own guard
                sub = pa.array([None if v is None else v.get(f)
                                for v in vals], ft)
                if _silently_coerced(sub, [
                        None if v is None else v.get(f)
                        for v in vals]):
                    return "struct"
    return None


def _list_flat(vals: list) -> pa.Array:
    """List column via explicit offsets + a _py_array child (keeps
    mixed-kind elements as unions instead of pa.array's coercion)."""
    offsets: list = []
    flat: list = []
    pos = 0
    for v in vals:
        if v is None:
            offsets.append(None)
            continue
        offsets.append(pos)
        flat.extend(v)
        pos += len(v)
    offsets.append(pos)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    _py_array(flat))


def _struct_fields(vals: list, real_nulls: bool = False) -> pa.Array:
    """Struct column with per-FIELD _py_array children (kind mixes
    become union children instead of coerced doubles). With
    ``real_nulls`` (top-level call, Nones are REAL null rows, not
    union padding), a struct whose union children reject the
    validity bitmap gets its null rows via a dense-union null lane —
    a struct validity bitmap over union children CHECK-aborts Arrow
    (see vectorize._null_rows)."""
    names: list = []
    for v in vals:
        if v is not None:
            for k in v:
                if k not in names:
                    names.append(k)
    children = [_py_array([None if v is None else v.get(k)
                           for v in vals]) for k in names]
    struct = pa.StructArray.from_arrays(children, names=names)
    null_mask = pa.array([v is None for v in vals])
    import pyarrow.compute as _pc
    if _pc.any(null_mask).as_py():
        try:
            struct = _pc.if_else(_pc.invert(null_mask), struct,
                                 pa.scalar(None, struct.type))
        except _PA_ERRS:
            if real_nulls:
                import numpy as np
                from .vectorize import _dense_union
                tags = np.array([1 if v is None else 0 for v in vals],
                                np.int8)
                return _dense_union(
                    tags, [struct, pa.nulls(len(vals))], len(vals))
            # union padding rows: masked by the parent's tag anyway
    return struct


def _has_struct_type(t) -> bool:
    if pa.types.is_struct(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _has_struct_type(t.value_type)
    return False


def _shape_mixed(vals: list) -> bool:
    """True when sibling objects anywhere in the tree carry DIFFERING
    key sets (pa.array would unify them with null siblings)."""
    dsets = set()
    for v in vals:
        if isinstance(v, dict):
            dsets.add(frozenset(v))
    if len(dsets) > 1:
        return True
    if dsets:
        dicts = [v for v in vals if isinstance(v, dict)]
        for k in next(iter(dsets)):
            if _shape_mixed([v.get(k) for v in dicts]):
                return True
    flat = [e for v in vals if isinstance(v, list) for e in v]
    if flat and _shape_mixed(flat):
        return True
    return False


def _shape_lanes(vals: list):
    """Per-KEY-SET dense union lanes for top-level shape mixes (the
    vector lane's per-SHAPE representation). None when there is only
    one shape (caller rebuilds with per-field recursion instead)."""
    shape_of: dict = {}
    order: list = []
    for v in vals:
        if isinstance(v, dict):
            k = frozenset(v)
            if k not in shape_of:
                shape_of[k] = len(order)
                order.append(k)
    if len(order) <= 1:
        return None
    import numpy as np
    from .vectorize import _dense_union
    tags = np.zeros(len(vals), np.int8)
    lanes: list[list] = [[None] * len(vals) for _ in order]
    for i, v in enumerate(vals):
        if v is None:
            continue            # null rows stay in lane 0
        code = shape_of[frozenset(v)]
        lanes[code][i] = v
        tags[i] = code
    return _dense_union(tags, [_py_lane(l) for l in lanes], len(vals))


def _py_lane(vals: list, real_nulls: bool = False) -> pa.Array:
    """Arrow array for values that share one Python type but may be
    heterogeneous INSIDE (mixed-element lists, field-type-conflicting
    dicts). ``real_nulls``: Nones are real null rows, not
    union-padding (see _struct_fields)."""
    try:
        out = pa.array(vals)
    except _PA_ERRS:
        pass
    else:
        coerced = _silently_coerced(out, vals)
        if coerced == "list":
            return _list_flat(vals)
        if coerced == "struct":
            return _struct_fields(vals, real_nulls=real_nulls)
        return out
    sample = next(v for v in vals if v is not None)
    if isinstance(sample, list):
        return _list_flat(vals)
    if isinstance(sample, dict):
        return _struct_fields(vals, real_nulls=real_nulls)
    # same python type yet unconvertible (exotic): last resort —
    # stringified repr keeps the stage alive (invariant over fidelity)
    return pa.array([None if v is None else str(v) for v in vals])


class VectorRemapStage:
    """Fast path: the program compiled to a column plan
    (lang/vectorize.py), executed once per batch — no per-row Python.
    Output schema: input columns (possibly overwritten) + assigned
    fields; `aborted`/`vrl_err`/`extra` companions are added for
    drop-in parity with RemapStage."""

    def __init__(self, source: str, drop_aborted: bool = False):
        from .vectorize import VectorProgram

        self.program = VectorProgram(source)   # compile once per actor
        self.source = source
        self.drop_aborted = drop_aborted
        self._fallback: Optional[RemapStage] = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        try:
            out = self.program.run(batch)
        except Exception:
            # Data-dependent schema surprises (e.g. `.v > 3` over a
            # string-typed column raises ArrowNotImplementedError) must
            # degrade to the per-row error lane, never crash the stage
            # (repo invariant: data errors NEVER raise; ADVICE r1).
            if self._fallback is None:
                self._fallback = RemapStage(
                    self.source, drop_aborted=self.drop_aborted)
            out = self._fallback(batch)
            # align to the vector path's output schema (column set +
            # order) so mixed vector/fallback blocks stay consistent
            n = len(out)
            for f in self.program.target_fields:
                if f not in out.column_names:
                    # null-typed (not string-typed) so blocks produced
                    # here unify with vector-path blocks whose same
                    # field came out int64/list/etc (ADVICE r2)
                    out = out.append_column(f, pa.nulls(n))
            order = (list(batch.column_names)
                     + [f for f in self.program.target_fields
                        if f not in batch.column_names]
                     + ["vrl_err", "extra", "aborted"])
            # keep fields the static target list can't know about
            # (whole-event replacement creates them at runtime)
            order += [c for c in out.column_names if c not in order]
            return out.select([c for c in order if c in out.column_names])
        n = len(out)
        if "extra" not in out.column_names:
            out = out.append_column("extra", pa.nulls(n, pa.string()))
        if "aborted" not in out.column_names:
            out = out.append_column(
                "aborted", pa.array([False] * n, pa.bool_()))
        if "vrl_err" not in out.column_names:
            out = out.append_column("vrl_err", pa.nulls(n, pa.string()))
        if self.drop_aborted:
            import pyarrow.compute as pc

            keep = pc.invert(pc.fill_null(
                pc.cast(out["aborted"], pa.bool_()), False))
            out = out.filter(keep)
        return out


def remap(ds, source: str, *, concurrency=None, batch_size: int = 8192,
          drop_aborted: bool = False, vectorize: Optional[bool] = None):
    """Apply a VRL program to every row of a Dataset.

    ``vectorize=None`` (default) compiles to the Arrow column plan
    when the program is inside the vectorizable subset, else falls
    back to the per-row interpreter; True forces the column plan
    (raises NotVectorizable); False forces the interpreter."""
    from .vectorize import NotVectorizable, VectorProgram

    use_vector = vectorize
    if use_vector is None:
        try:
            VectorProgram(source)   # compile-check on the driver
            use_vector = True
        except (NotVectorizable, ParseError):
            use_vector = False

    # the driver's context timezone must reach the worker processes
    # (it is a module global — cli.py -z sets it on the DRIVER only)
    from ..functions.timestamp import get_context_timezone
    ctx_tz = get_context_timezone()

    if concurrency is not None:
        # caller pinned a pool size → keep the actor-pool form
        cls = VectorRemapStage if use_vector else RemapStage
        return ds.map_batches(
            cls,
            fn_constructor_kwargs=dict(source=source,
                                       drop_aborted=drop_aborted),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    # default: plain tasks with a per-WORKER compiled-stage cache —
    # tasks reuse the session's warm worker processes across
    # executions, where a dedicated actor pool re-spins per execution
    # (~1-2 s) and idles whatever cores it doesn't cover
    return ds.map_batches(
        _remap_batch,
        fn_kwargs=dict(source=source, drop_aborted=drop_aborted,
                       vector=use_vector, ctx_tz=ctx_tz),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


_STAGE_CACHE: dict = {}


def _remap_batch(batch, *, source: str, drop_aborted: bool,
                 vector: bool, ctx_tz=None):
    """Task-pool remap: compile once per worker process (keyed by
    program text), then run batches through the cached stage."""
    if ctx_tz is not None:
        from ..functions.timestamp import get_context_timezone, \
            set_context_timezone
        if get_context_timezone() != ctx_tz:
            set_context_timezone(ctx_tz)
    key = (source, drop_aborted, vector)
    st = _STAGE_CACHE.get(key)
    if st is None:
        cls = VectorRemapStage if vector else RemapStage
        st = _STAGE_CACHE[key] = cls(source=source,
                                     drop_aborted=drop_aborted)
    return st(batch)
