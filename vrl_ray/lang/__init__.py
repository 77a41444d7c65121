"""A compact VRL-language front end: lexer → recursive-descent parser
→ tree-walking evaluator over the row-level stdlib.

Covers the expression surface of the reference grammar
(/root/reference/src/parser/parser.lalrpop, 575 lines + lex.rs):
literals (incl. ``s'..'`` raw strings, ``r'..'`` regexes, ``t'..'``
timestamps), event paths (``.a.b[0]``, root ``.``), variables,
assignment (incl. infallible ``ok, err = expr``), all binary operators
with VRL coercion/truthiness semantics, ``??``, ``!``, if/else-if/else
expressions, blocks, arrays/objects, function calls with named
arguments and the ``!`` abort-on-error suffix, closures
(``-> |k, v| { .. }``), and ``abort``.

This is the *compatibility* execution path (row-at-a-time, like the
reference's tree-walking runtime, src/compiler/runtime.rs:96-128);
the performance path is the vectorized stage kernels. ``RemapStage``
bridges the two: a compiled program applied per row inside
``map_batches`` (compiled once per actor).
"""

from .parser import parse, ParseError
from .interpreter import Program, compile_program, VrlRuntimeError, Abort
from .remap import RemapStage, remap
from .diag_pass import collect_diagnostics, render_diagnostics

__all__ = [
    "parse", "ParseError", "Program", "compile_program",
    "VrlRuntimeError", "Abort", "RemapStage", "remap",
    "collect_diagnostics", "render_diagnostics",
]
