"""CLI one-shot runner + NDJSON source — the equivalent of the
reference's ``vrl`` binary (src/cli/cmd.rs:30-170, SURVEY §3.1).

    python -m vrl_ray.cli '.foo = true'                   # empty event
    python -m vrl_ray.cli -p prog.vrl -i events.ndjson    # per-line JSON
    echo '{"a":1}' | python -m vrl_ray.cli '.a + 1'
    python -m vrl_ray.cli -p prog.vrl -i big.ndjson --ray # Ray Data path

Reference behaviors mirrored: empty input = one empty object
(cmd.rs:84-97); result of the final expression printed per event
(``-o`` prints the mutated object instead); compile once, resolve per
event (cmd.rs:141-170). ``--ray`` routes the same program through
``ray.data.read_json`` + the remap stage (vectorized when possible)
instead of the serial loop — the scaled form of the same contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def _print_value(v) -> str:
    from .value import encode_json

    if isinstance(v, str):
        return json.dumps(v)
    return encode_json(v)


def run_serial(source: str, lines: list[str], print_object: bool) -> int:
    from .lang import compile_program
    from .lang.interpreter import VrlRuntimeError
    from .value import VrlError

    try:
        program = compile_program(source, strict=False)
    except Exception as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    events = [{}] if not lines else None
    if events is None:
        events = []
        for line in lines:
            try:
                events.append(json.loads(line))
            except ValueError as e:
                print(f"error: invalid input JSON: {e}", file=sys.stderr)
                return 1

    rc = 0
    for event in events:
        try:
            result, mutated, aborted = program.resolve(event)
        except (VrlError, VrlRuntimeError) as e:
            print(f"error: {e}", file=sys.stderr)
            rc = 1
            continue
        if aborted is not None:
            print(_print_value(mutated))
            continue
        print(_print_value(mutated if print_object else result))
    return rc


def run_ray(source: str, input_path: str, output_path: str | None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    from .lang.remap import remap

    try:
        ds = rd.read_json(input_path, file_extensions=None)
        out = remap(ds, source)
        if output_path:
            out.write_parquet(output_path)
            print(f"wrote {out.count()} rows to {output_path}",
                  file=sys.stderr)
        else:
            for batch in out.iter_batches(batch_format="pyarrow",
                                          batch_size=1024):
                for row in batch.to_pylist():
                    print(json.dumps({k: v for k, v in row.items()
                                      if v is not None}, default=str))
    except Exception as e:
        # the Ray path is columnar: NDJSON whose fields change type
        # between lines cannot load as a typed column — use the
        # serial per-event mode for heterogeneous events
        print(f"error: --ray requires schema-consistent NDJSON "
              f"(columnar load failed: {str(e)[:200]}). "
              f"Run without --ray for heterogeneous events.",
              file=sys.stderr)
        return 1
    return 0


def run_repl(input_fn=None, out=None, quiet=False) -> int:
    """Interactive REPL (the reference's src/cli/repl.rs: persistent
    event object, each line compiled + resolved against it; ``.``
    shows the event; ``exit`` quits)."""
    from .lang import compile_program
    from .lang.interpreter import VrlRuntimeError
    from .value import VrlError

    input_fn = input_fn or (lambda: input("$ "))
    out = out or sys.stdout
    event: dict = {}
    if not quiet:
        print("VRL REPL — enter a program per line; `exit` quits", file=out)
    while True:
        try:
            line = input_fn()
        except (EOFError, KeyboardInterrupt):
            return 0
        if line is None or line.strip() in ("exit", "quit"):
            return 0
        if not line.strip():
            continue
        try:
            result, event, aborted = compile_program(
                line, strict=False).resolve(event)
            if not isinstance(event, dict):
                event = {}
            print(_print_value(result) if aborted is None else "aborted",
                  file=out)
        except (VrlError, VrlRuntimeError, Exception) as e:
            print(f"error: {e}", file=out)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="vrl_ray", description="run a VRL program over events")
    p.add_argument("PROGRAM", nargs="?", help="inline program source")
    p.add_argument("-p", "--program", dest="program_file",
                   help="file containing the program")
    p.add_argument("-i", "--input", dest="input_file",
                   help="NDJSON events file (default: stdin)")
    p.add_argument("-o", "--print-object", action="store_true",
                   help="print the mutated event instead of the result")
    p.add_argument("-z", "--timezone",
                   help="timezone used to parse naive dates (cmd.rs -z)")
    p.add_argument("-q", "--quiet", action="store_true",
                   help="don't print the REPL banner")
    p.add_argument("--ray", action="store_true",
                   help="run through Ray Data (vectorized remap stage)")
    p.add_argument("--output", help="with --ray: write parquet here")
    args = p.parse_args(argv)

    if args.timezone:
        from .functions.timestamp import set_context_timezone
        from .value import VrlError
        try:
            set_context_timezone(args.timezone)
        except VrlError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1

    if args.PROGRAM and args.program_file:
        p.error("PROGRAM and --program are mutually exclusive")
    if args.PROGRAM is not None:
        source = args.PROGRAM
    elif args.program_file:
        with open(args.program_file, encoding="utf-8") as f:
            source = f.read()
    else:
        # no program → REPL (cmd.rs:121-130 should_open_repl)
        return run_repl(quiet=args.quiet)

    if args.ray:
        if not args.input_file:
            p.error("--ray requires --input")
        return run_ray(source, args.input_file, args.output)

    if args.input_file:
        with open(args.input_file, encoding="utf-8") as f:
            text = f.read()
    else:
        text = sys.stdin.read()
    lines = [ln for ln in text.splitlines() if ln.strip()]
    return run_serial(source, lines, args.print_object)


if __name__ == "__main__":
    sys.exit(main())
