"""Deep fuzz: random typed VRL programs, vector lane vs interpreter.

Generates seeded random programs over the full vectorizable grammar
(arithmetic/string/bool kernels, if expressions and statements, `??`,
`&&`/`||`, handled captures, variables, bang calls) and runs them over
a null-bearing batch through BOTH the column plan and the row
interpreter, comparing every output field and the error lanes exactly.
This harness found the r3 lazy-evaluation divergence class (eager
branch/short-circuit errors), the bang-capture class, and the
replace(count=0)/to_string(-0.0)/ceil-int kernel bugs.

Usage: python scripts/deepfuzz.py [seed] [n_programs]
Prints each divergence (program, row, field, ref vs vec) and a summary
line; exit status 1 if any divergence was found.
"""
import copy
import random
import sys

import pyarrow as pa

from vrl_ray.lang.interpreter import Program
from vrl_ray.lang.vectorize import NotVectorizable, VectorProgram, _RowFallback

R = random.Random(0)

STR_LITS = ['"x"', '"Foo Bar"', '""', '" ab "', '"12"', '"-3.5"',
            '"true"', '"NO"', '"ümlaut"', '"a,b,c"']


def kvenc():
    # kv serializer: indexed array keys, null leaves, whitespace
    # quoting, \n escaping (r5 rewrite). encode_logfmt has no
    # flatten_boolean parameter (forced true, encode_logfmt.rs:57).
    fn = R.choice(['encode_logfmt', 'encode_key_value'])
    arg = R.choice(['.obj', '.nest0',
                    '{"ip": [127, 0, .a], "v": null}',
                    '{"msg": "a b", "t": true, "f": false}',
                    '{"x": {"y": [.s, 2.5]}, "nl": "a\\nb"}'])
    opt = ''
    if fn == 'encode_key_value' and R.random() < 0.5:
        opt = ', flatten_boolean: true'
    return f"{fn}({arg}{opt})"


def num(d=0):
    opts = ['.a', '.b', '.obj.x', '.arr[0]', '.arr[-1]',
            'ilit', 'flit']
    if d < 2:
        opts += ['binop', 'binop', 'call', 'iff', 'coalesce',
                 'to_int', 'to_float', 'strlen']
    c = R.choice(opts)
    if c == 'ilit':
        return str(R.randint(-20, 20))
    if c == 'flit':
        if R.random() < 0.1:
            # huge magnitudes (VRL floats have NO exponent syntax —
            # long digit strings parse to big f64s / ±inf in both
            # lexers): products overflow to ±inf — to_string must
            # print inf/-inf (Rust Display) and encode_json must emit
            # null (serde serialize_f64); fuzz-found r5
            big = "9" * R.choice([39, 155, 310])
            return R.choice([f"{big}.0", f"-{big}.0"])
        if R.random() < 0.1:
            # scientific-range magnitudes (|x| >= 1e16 / < 1e-4):
            # Rust Display renders these POSITIONALLY (never e-form)
            # while serde_json/ryu uses unpadded exponents ("1e20",
            # "1e-6", but "0.00001" fixed) — to_string/encode_json
            # parity across both lanes; r5 formatter rewrite
            return R.choice([
                "0.00001", "0.0000001", "0.000099",
                "0." + "0" * 30 + "7",
                "123456789012345678901.5", "18" + "0" * 18 + ".0",
                "-0.0000025", "-" + "4" * 20 + ".0",
            ])
        return f"{R.uniform(-20, 20):.2f}"
    if c == 'binop':
        return f"({num(d + 1)} {R.choice(['+', '-', '*', '/', '%'])} {num(d + 1)})"
    if c == 'call':
        f = R.choice(['round', 'floor', 'ceil', 'abs'])
        if f == 'abs':
            return f"abs({num(d + 1)})"
        return f"{f}({num(d + 1)}, {R.randint(0, 3)})"
    if c == 'iff':
        r = R.random()
        if r < 0.2:
            return f"(if {boolex(d + 1)} {{ {num(d + 1)} }})"
        if r < 0.4:
            return (f"(if {boolex(d + 1)} {{ {num(d + 1)} }} "
                    f"else if {boolex(d + 1)} {{ {num(d + 1)} }} "
                    f"else {{ {num(d + 1)} }})")
        return f"(if {boolex(d + 1)} {{ {num(d + 1)} }} else {{ {num(d + 1)} }})"
    if c == 'coalesce':
        return f"({num(d + 1)} ?? {num(d + 1)})"
    if c == 'to_int':
        # incl. strings Rust FromStr rejects (padding, underscores)
        # or accepts ('+7', 'inf' for floats) — fuzz-found r5 class
        return f"to_int({R.choice(['.s', '.t', num(d + 1)])})" \
            if R.random() < 0.8 else \
            f"""to_int({R.choice(['" 5 "', '"1_0"', '"+7"', '"2.5"'])})"""
    if c == 'to_float':
        return f"to_float({R.choice(['.s', '.t', num(d + 1)])})" \
            if R.random() < 0.8 else \
            f"""to_float({R.choice(['" 2.5 "', '"1_0.5"', '"inf"',
                                    '"-Infinity"', '"nan"', '"1e3"'])})"""
    if c == 'strlen':
        return f"strlen({strx(d + 1)})"
    return c


def strx(d=0):
    opts = ['.s', '.t', '.obj.y', 'lit', '.arr[1]', '.arr[9]']
    if d < 2:
        opts += ['case', 'concat', 'to_string', 'trunc', 'slice',
                 'replace', 'strip', 'joinsplit', 'iff', 'coalesce',
                 'replace_with', 'template']
    c = R.choice(opts)
    if c == 'lit':
        return R.choice(STR_LITS)
    if c == 'case':
        return f"{R.choice(['downcase', 'upcase'])}({strx(d + 1)})"
    if c == 'concat':
        return f"({strx(d + 1)} + {strx(d + 1)})"
    if c == 'to_string':
        return f"to_string({num(d + 1)})"
    if c == 'trunc':
        args = f"{strx(d + 1)}, {R.randint(0, 6)}"
        if R.random() < 0.5:
            args += f', "{R.choice(["", "...", ".."])}"'
        return f"truncate({args})"
    if c == 'slice':
        start = R.randint(0, 4)
        if R.random() < 0.5:
            return f"slice!({strx(d + 1)}, {start})"
        return f"slice!({strx(d + 1)}, {start}, {R.randint(start, start + 5)})"
    if c == 'replace':
        pat = R.choice(['"a"', '"o"', '" "', 'r\'[ab]+\'', 'r\'\\d\''])
        args = f'{strx(d + 1)}, {pat}, "_"'
        if R.random() < 0.5:
            args += f", {R.randint(-1, 3)}"
        return f"replace({args})"
    if c == 'replace_with':
        # every shape: named/positional captures, reserved-name error,
        # optional count (named + positional), non-string body result,
        # fallible body, null/non-string inputs (value may be .obj.y /
        # .arr[9] → null; to_string(num) exercises coercions)
        pat = R.choice([r"r'(?P<w>[a-z]+)'", r"r'(\d)(\d)?'", r"r'o'",
                        r"r'(?P<string>x)'", r"r'\s+'"])
        body = R.choice([
            'upcase(m.string)', 'm.string + "!"',
            '(m.w ?? "-")', 'to_string(length(m.captures))',
            '(m.captures[0] ?? "_")',
            'to_string!(to_int!(m.string) + 1)',   # fallible body
            '7',                                   # non-string result
        ])
        args = f"{strx(d + 1)}, {pat}"
        r = R.random()
        if r < 0.33:
            args += f", count: {R.randint(-1, 2)}"
        elif r < 0.5:
            args += f", {R.randint(-1, 2)}"
        bang = "!" if R.random() < 0.3 else ""
        return f"replace_with{bang}({args}) -> |m| {{ {body} }}"
    if c == 'template':
        # "{{ var }}" desugars to variable string concat (r5);
        # non-string vars error per row like any concat
        v = R.choice([strx(d + 1), num(d + 1)])
        return ('{ tvar__ = %s; "pre {{ tvar__ }} post" }' % v)
    if c == 'strip':
        return f"strip_whitespace({strx(d + 1)})"
    if c == 'joinsplit':
        sep = R.choice(['"|"', '"|"', '""', '.t'])
        return f'join!(split({strx(d + 1)}, ","), {sep})'
    if c == 'iff':
        r = R.random()
        if r < 0.2:
            return f"(if {boolex(d + 1)} {{ {strx(d + 1)} }})"
        if r < 0.4:
            return (f"(if {boolex(d + 1)} {{ {strx(d + 1)} }} "
                    f"else if {boolex(d + 1)} {{ {strx(d + 1)} }} "
                    f"else {{ {strx(d + 1)} }})")
        return f"(if {boolex(d + 1)} {{ {strx(d + 1)} }} else {{ {strx(d + 1)} }})"
    if c == 'coalesce':
        return f"({strx(d + 1)} ?? {strx(d + 1)})"
    return c


def boolex(d=0):
    opts = ['cmp', 'scmp', 'isnull', 'exists']
    if d < 2:
        opts += ['contains', 'match', 'to_bool', 'not', 'and', 'or',
                 'coalesce']
    c = R.choice(opts)
    if c == 'cmp':
        op = R.choice(['>', '>=', '<', '<=', '==', '!='])
        return f"({num(d + 1)} {op} {num(d + 1)})"
    if c == 'scmp':
        return f"({strx(d + 1)} {R.choice(['==', '!='])} {strx(d + 1)})"
    if c == 'isnull':
        return f"{R.choice(['is_null', 'is_nullish'])}({R.choice(['.a', '.s', '.t'])})"
    if c == 'exists':
        return "exists(%s)" % R.choice(
            ['.a', '.s', '.missing', '.obj.x', '.obj.zz', '.obj.y',
             '.arr', '.nest0.f', '.o1'])
    if c == 'contains':
        f = R.choice(['contains', 'starts_with', 'ends_with'])
        args = f"{strx(d + 1)}, {R.choice(STR_LITS)}"
        if R.random() < 0.5:
            args += f", {R.choice(['true', 'false'])}"
        return f"{f}({args})"
    if c == 'match':
        return f"match({strx(d + 1)}, r'{R.choice(['[ab]+', '^F', 'o.o', chr(92) + 'd+'])}')"
    if c == 'to_bool':
        # incl. parse_bool's integer-string forms and non-trimmed
        # padding (r5 reference-parity fix)
        if R.random() < 0.25:
            lit = R.choice(['"5"', '"-3"', '"00"', '"TRUE"', '"Yes"',
                            '" true "', '"on"', '"0"'])
            return f"to_bool({lit})"
        return f"to_bool({R.choice(['.s', num(d + 1)])})"
    if c == 'not':
        return f"!({boolex(d + 1)})"
    if c in ('and', 'or'):
        op = '&&' if c == 'and' else '||'
        return f"({boolex(d + 1)} {op} {boolex(d + 1)})"
    if c == 'coalesce':
        return f"({boolex(d + 1)} ?? {boolex(d + 1)})"
    return c


def tsx(d=0):
    c = R.choice(['col', 'parse', 'lit'] if d < 2 else ['col', 'lit'])
    if c == 'parse':
        return f'parse_timestamp({strx(d + 1)}, "%+")'
    if c == 'lit':
        return R.choice(["t'2021-01-01T00:00:00Z'",
                         "t'1999-12-31T23:59:59.5Z'",
                         "t'2024-02-29T12:00:00+02:00'"])
    return '.ts'


def anyexpr(d=0):
    gens = [num, strx, boolex, num, strx, boolex]
    gens += [lambda dd: f"md5({strx(dd)})",
             lambda dd: f"sha1({strx(dd)})",
             lambda dd: "sha2(%s%s)" % (strx(dd), R.choice(
                 ['', ', "SHA-224"', ', "SHA-256"', ', "SHA-384"',
                  ', "SHA-512/224"', ', variant: "SHA-512"'])),
             lambda dd: "parse_regex%s(%s, r'%s')" % (
                 R.choice(['', '!']), strx(dd), R.choice(
                     [r'(?P<m>\d+)', '(?P<a>[a-z]+)', '^(?P<h>.)',
                      '(?P<x>o+) (?P<y>.*)'])),
             lambda dd: f"slice!({strx(dd)}, {R.randint(0, 3)})",
             lambda dd: f"to_int!({R.choice(['.s', '.t', '.a'])})",
             lambda dd: R.choice(
                 ['[1, 2, 3]', '["a", "b"]', '[]', '[null]',
                  '{"k": 1, "s": "x"}', '{"n": {"a": true}, "l": [2]}',
                  '["a", 1]', f'[{num(2)}, 2]']),
             lambda dd: f'format_timestamp{R.choice(["", "!"])}'
                        f'({tsx(dd)}, "%Y-%m-%dT%H:%M")',
             lambda dd: "(%s | %s)" % (
                 R.choice(['.obj', '{"w": 1, "y": 2}', '.a', '.missing',
                           '{"n": {"i": 1}}']),
                 R.choice(['.obj', '{"y": "over", "z": true}', '.s',
                           '.missing', '{}'])),
             lambda dd: "%s%s(%s)" % (
                 R.choice(['string', 'int', 'float', 'bool', 'array',
                           'object', 'timestamp']),
                 R.choice(['', '!']),
                 R.choice(['.a', '.b', '.s', '.obj', '.arr', '.ts',
                           '.missing'])),
             lambda dd: "parse_json%s(%s%s)" % (
                 R.choice(['', '!']),
                 R.choice(['.s', '.t', '.jsons', '.a', '.missing']),
                 # depth-limited mode keeps RAW subtree slices (r5)
                 R.choice(['', '', '', ', max_depth: 1',
                           ', max_depth: 2'])),
             lambda dd: "parse_regex_all(%s, r'%s')" % (
                 R.choice(['.s', '.t', '.missing']),
                 R.choice([r'(?P<d>\d+)', '(?P<w>[a-z]+)'])),
             lambda dd: "%s(%s)" % (
                 # generic row-loop tier: registry fns without a
                 # dedicated Arrow kernel
                 R.choice(['parse_key_value', 'parse_logfmt',
                           'parse_csv', 'camelcase', 'snakecase',
                           'parse_url', 'shannon_entropy',
                           'to_syslog_level', 'parse_int',
                           'squeeze_whitespace']),
                 R.choice(['.s', '.t', '.jsons', '.a', '.missing'])),
             # convert_case parity: boundary splitting with the
             # original_case hint and snakecase excluded_boundaries
             lambda dd: "%s(%s%s)" % (
                 R.choice(['camelcase', 'snakecase', 'pascalcase',
                           'kebabcase', 'screamingsnakecase']),
                 R.choice(['.s', '.t', '"s3BucketDetails"',
                           '"XMLHttpRequest"', '"mixed_Case-str Ing"']),
                 R.choice(['', '', ', original_case: "camelCase"',
                           ', original_case: "snake_case"',
                           ', original_case: "kebab-case"'])),
             lambda dd: "snakecase(%s, excluded_boundaries: [%s])" % (
                 R.choice(['.s', '.t', '"s3BucketDetails"']),
                 R.choice(['"lower_upper"', '"acronym"',
                           '"digit_lower", "lower_digit", "upper_digit"',
                           '"digit_upper"', ''])),
             # parse_duration / parse_bytes with every unit form
             lambda dd: "parse_duration(%s, %s)" % (
                 R.choice(['.s', '.t', '"1d1s"', '"1ms1 µs"', '".5s 2m"',
                           '"abc 3h"', '"1y"', '"5S"']),
                 R.choice(['"s"', '"ms"', '"ns"', '"w"', '"d"', '.s'])),
             lambda dd: "%s(%s%s)" % (
                 R.choice(['encode_punycode', 'decode_punycode']),
                 R.choice(['.s', '.t', '"www.CAFé.com"',
                           '"xn--8hbb.xn--fiba."', '"_dmarc.x.com"']),
                 R.choice(['', '', ', validate: false'])),
             lambda dd: "encode_percent(%s%s)" % (
                 R.choice(['.s', '.t', '"a_b.c-d~e"', '"foo #<>?bar"']),
                 R.choice(['', ', ascii_set: "CONTROLS"',
                           ', ascii_set: "FRAGMENT"',
                           ', ascii_set: "SPECIAL"',
                           ', ascii_set: "WWW_FORM_URLENCODED"',
                           ', ascii_set: "COMPONENT"'])),
             lambda dd: "format_number(%s%s)" % (
                 R.choice(['.a', '.b', '1234.567', '123456',
                           '11222333444.56789', '.s']),
                 R.choice(['', ', scale: 2', ', scale: 0',
                           ', scale: 3, decimal_separator: ",", '
                           'grouping_separator: "."',
                           ', grouping_separator: ","'])),
             lambda dd: "parse_bytes(%s, %s%s)" % (
                 R.choice(['.s', '.t', '"1.2KiB"', '"12 TB"', '"1e3 k"',
                           '"0.2 MiB"', '"1YiB"']),
                 R.choice(['"B"', '"KiB"', '"kB"', '"MB"', '"EiB"', '.s']),
                 R.choice(['', ', base: "10"', ', base: "2"'])),
             lambda dd: "%s[%d]" % (
                 R.choice(['split(.s, ",")', '[1, 2, 3]', '.arr',
                           'split(.t, ",")']),
                 R.randint(-2, 3)),
             lambda dd: "({ %s\n %s } ?? %s)" % (
                 R.choice(['parse_json(.jsons)', 'to_int(.s)',
                           f'bv{dd} = to_int(.t)', 'slice!(.s, 9)']),
                 anyexpr(2), anyexpr(2)),
             # multi-statement block EXPRESSION with var writes
             # (vectorized r5): writes gate on in-block errors; the
             # final statement may itself be an assignment (its value
             # is the block's value); reassignment reads its own
             # earlier write
             lambda dd: R.choice([
                 "{ vb = %s\n vb + 1 }" % num(2),
                 "{ vb = %s\n _ig = %s\n vb = vb * 2\n vb }" % (
                     num(2), anyexpr(2)),
                 "{ vs = %s\n vt = to_int(%s)\n vt }" % (
                     strx(2), strx(2)),
                 "{ vs = %s\n upcase(vs) }" % strx(2),
                 # r5: EVENT writes inside block expressions persist
                 # beyond the block (statement position only; lazy /
                 # closure positions fall back at runtime)
                 "{ .bw = %s\n .bw }" % anyexpr(2),
                 "{ .bn.k = %s\n 1 }" % num(2),
                 "{ vb = %s\n .bw2 = vb }" % num(2),
             ]),
             lambda dd: "length(%s)" % R.choice(
                 ['.arr', '.s', '.obj', '.a', '.missing', strx(dd)]),
             lambda dd: "push(%s, %s)" % (
                 R.choice(['.arr', '.a', '.missing', '[1, 2]']),
                 R.choice(['9', 'null', '.a', '-1'])),
             lambda dd: "append(%s, %s)" % (
                 R.choice(['.arr', '.a', '[1]', '.missing']),
                 R.choice(['.arr', '[7, 8]', '[]', '.s'])),
             lambda dd: "includes(%s, %s)" % (
                 R.choice(['.arr', '.a', '.missing', '[1, 2, 3]']),
                 R.choice(['2', '2.0', '"x"', 'null', '.a'])),
             lambda dd: "encode_json(%s)" % R.choice(
                 ['.obj', '.arr', '.a', '.b', '.s', '.ts',
                  '{"k": [1, "x"], "n": null}', '[.a, .s]',
                  strx(dd), num(dd)]),
             lambda dd: kvenc(),
             lambda dd: "encode_csv(%s%s)" % (
                 # strings-only elements (try_bytes — ints error),
                 # single-byte delimiter, r5 signature fix
                 R.choice(['.arr', '["a", "b,c"]', '[.s, "x"]',
                           '[]', 'split(.s, " ")']),
                 R.choice(['', ', delimiter: ";"',
                           ', delimiter: "--"'])),
             lambda dd: "%s(%s)" % (
                 # BTreeMap iteration order: keys/values observe
                 # sorted keys, never insertion order (r5 fix)
                 R.choice(['keys', 'values']),
                 R.choice(['.obj', '{"z": 1, "a": .a, "m": .s}',
                           'parse_json(.jsons) ?? {"x": 1}',
                           'merge({"b": 2}, {"A": .b})'])),
             lambda dd: "to_unix_timestamp(%s%s)" % (tsx(dd), R.choice(
                 ['', ', unit: "milliseconds"', ', unit: "seconds"',
                  ', unit: "nanoseconds"']))]
    return R.choice(gens)(d)


def gen_stmt(i):
    kind = R.choice(['assign', 'assign', 'handled', 'handled', 'var',
                     'ifstmt', 'closure', 'nested', 'abort', 'del',
                     'merge', 'root', 'dotread', 'bare', 'metavar',
                     'varpath', 'lazydel', 'jsonshape', 'assertx',
                     'predcap', 'namedhole'])
    if kind == 'namedhole':
        # r5: named args that leave a positional hole reach row-loop
        # registry fns as **kwargs (flatten's `except` skips
        # `separator`); also mix a canonicalizable named arg and a
        # null/non-object input so the error lane is exercised
        val = R.choice(['.obj', '.objarr[0]', '.a', '.missing',
                        'parse_json!(.jsons)'])
        call = R.choice([
            f'flatten({val}, except: ["k", {strx(1)}])',
            f'flatten({val}, separator: "_", except: ["x"])',
            f'flatten({val}, separator: {strx(1)})',
        ])
        if R.random() < 0.5:
            return f".o{i}, .e{i} = {call}"
        return f".o{i} = ({call} ?? {anyexpr(1)})"
    if kind == 'predcap':
        # r5: `(ok, err = f(); err == null)` capture in an IF
        # PREDICATE (first predicate runs on every row — its var
        # writes are sound); also block captures in expression
        # position and varpath writes inside closure body blocks
        form = R.choice(['ifpred', 'ifexpr', 'blockcap', 'closmut'])
        call = R.choice([f'to_int({strx(1)})', f'to_float({strx(1)})',
                         'parse_json(.jsons)', f'slice!({strx(1)}, 1)'])
        if form == 'ifpred':
            return (f"if (cp{i}, ce{i} = {call}; ce{i} == null) "
                    f"{{ .o{i} = cp{i} }}"
                    + R.choice(['', f" else {{ .o{i} = {anyexpr(1)} }}"]))
        if form == 'ifexpr':
            return (f".o{i} = if (cp{i}, ce{i} = {call}; "
                    f"ce{i} == null) {{ cp{i} }} else {{ ce{i} }}")
        if form == 'blockcap':
            return (f".o{i} = {{ cb{i}, eb{i} = {call}\n "
                    f"if eb{i} == null {{ cb{i} }} else {{ -1 }} }}")
        if R.random() < 0.4:
            # review-found class: OUTER var writes / dels inside
            # closure bodies PERSIST in the interpreter (last element
            # wins) — the vector lane must fall back, not silently
            # discard the expanded copy
            body = R.choice([f'ow{i} = ow{i} + v', f'ow{i} = v',
                             f'del(ow{i}.x)', f'ow{i}.f = v'])
            init = ('.obj' if 'del' in body or '.f' in body
                    else R.choice(['0', '[0]']))
            return (f"ow{i} = {init}\n"
                    f".o{i} = map_values(.arr) -> |v| {{ {body}\n v }}\n"
                    f".after{i} = ow{i}")
        return (f".o{i} = map_values(.objarr) -> |ov| "
                f"{{ ov.add = {R.choice(['1', '.a', 'ov.k ?? 0'])}\n"
                f" ov }}")
    if kind == 'assertx':
        # assert / assert_eq special forms (vectorized r5): cond must
        # be exactly `true`; message evaluated unconditionally,
        # stringified on failing rows; assert_eq reprs both operands
        if R.random() < 0.5:
            cond = R.choice([boolex(1), strx(1), num(1), '.missing'])
            msg = R.choice(['', f', {strx(1)}', ', "a msg"',
                            f', {num(1)}'])
            call = f"assert({cond}{msg})"
        else:
            call = f"assert_eq({anyexpr(1)}, {anyexpr(1)})"
        if R.random() < 0.5:
            return f".ok{i}, .ae{i} = {call}"
        return call
    if kind == 'jsonshape':
        # ADVICE r5: mixed leaf KINDS under one key ('{"k": 1}' vs
        # '{"k": "x"}' in the corpus) merge into a struct lane with a
        # union child; handled-capture masking + a later field read
        # used to CHECK-abort the process (array_nested.cc:1142)
        rd = R.choice([f".q{i} = .p{i}.k", f".q{i} = .p{i}.w",
                       f".q{i} = encode_json(.p{i})",
                       f".q{i} = exists(.p{i}.k)",
                       f".q{i} = (.p{i}.k ?? 0)",
                       # r5: ARITHMETIC/compare on values read out of
                       # union children — kernels must lane-dispatch
                       f".q{i}, .qe{i} = (.p{i}.k + 1)",
                       f".q{i}, .qe{i} = (.p{i}.k * 2)",
                       f".q{i} = ((.p{i}.k > 1) ?? false)",
                       f".q{i}, .qe{i} = to_string(.p{i}.k)"])
        if R.random() < 0.25:
            # r5: i64-overflow ints become lossy floats (serde u64/f64
            # widths) and int/float/bool KIND mixes under one key must
            # keep per-row kinds (pa.array silently coerces)
            lit = R.choice([
                '{"k": 99999999999999999999, "w": 3}',
                '{"k": [1, 2.5], "w": true}',
            ])
            return (f".p{i}, .er{i} = parse_json("
                    f"(if .a == 1 {{ s'{lit}' }} else {{ .jsons }}))"
                    f"\n{rd}")
        return f".p{i}, .er{i} = parse_json(.jsons)\n{rd}"
    if kind == 'abort':
        # conditional abort/return: later statements must skip
        # stopped rows, mutations before the stop stick; abort also
        # flips the `aborted` column
        if R.random() < 0.4:
            stop = f"return {anyexpr(1)}"
        else:
            stop = "abort" + R.choice(['', '', ' "dropped"',
                                       f' {strx(1)}'])
        after = R.choice(['', f"\n.q{i} = {anyexpr(1)}"])
        els = R.choice(['', f" else {{ .o{i} = {anyexpr(1)} }}"])
        return (f"if {boolex()} {{ .o{i} = {anyexpr(1)}\n{stop} }}"
                f"{els}{after}")
    if kind == 'lazydel':
        # review-found class: del reached only on SOME rows (?? RHS,
        # if arms, after an erroring block statement) must not apply
        # batch-wide
        tgt = R.choice(['.a', '.s', '.obj.x'])
        form = R.choice([
            f".z{i} = (to_int(.s) ?? del({tgt}))",
            f".z{i} = if {boolex()} {{ del({tgt}) }} else {{ 1 }}",
            f".z{i} = ({{ to_int(.t)\n del({tgt})\n 1 }} ?? 2)",
            # r5 (ADVICE): del in argument / container-element / binop-
            # RHS position after a per-row-fallible sibling is also
            # conditionally reached
            f".z{i} = [to_int!(.s), del({tgt})]",
            f".z{i} = {{\"x\": to_int!(.t), \"y\": del({tgt})}}",
            f".z{i} = (to_int(.s) + del({tgt}))",
            f".z{i} = [del({tgt}), to_int!(.s)]",
        ])
        return form
    if kind == 'metavar':
        # %metadata: transient per-event namespace (incl. the `%`
        # root read — an object of written fields, r5; gated writes
        # force the row path)
        use = R.choice([f".o{i} = (%m{i} ?? {anyexpr(1)})",
                        f".o{i}, .e{i} = %m{i}",
                        f".o{i} = %unset{i}",
                        f".o{i} = %",
                        f".o{i} = encode_json(%)",
                        f"if {boolex(1)} {{ %g{i} = 1 }}\n.o{i} = %",
                        f'% = {{"r{i}": {anyexpr(1)}}}\n'
                        f".o{i} = encode_json(%)",
                        f"% = {{}}\n.o{i} = encode_json(%)"])
        return f"%m{i} = {anyexpr()}\n{use}"
    if kind == 'bare':
        # bare expression statement: value discarded, errors kill
        return anyexpr()
    if kind == 'dotread':
        # whole-event read (first statement only is vectorizable;
        # later positions must fall back and still match)
        return R.choice([f".bk{i} = .", f".bk{i} = encode_json(.)"])
    if kind == 'root':
        # whole-event replacement; error rows keep the ORIGINAL event
        form = R.choice(['obj', 'json', 'json_bang', 'capture'])
        after = R.choice(['', f"\n.after{i} = {anyexpr(1)}"])
        if form == 'obj':
            return ('. = {"w%d": %s, "v": .a}%s' % (i, anyexpr(1), after))
        if form == 'capture':
            # r5: handled root replacement — error rows become the
            # DEFAULT event (null → empty), err var gets the message
            err = R.choice([f'er{i}', '_'])
            rd = '' if err == '_' else f"\n.er{i}o = er{i}"
            return f"., {err} = parse_json(.jsons){rd}{after}"
        bang = '!' if form == 'json_bang' else ''
        return f". = parse_json{bang}(.jsons){after}"
    if kind == 'merge':
        tgt = R.choice(['.obj', '.missing', '.a', f'.o{i}', '.nest0',
                        '.', '.'])
        if R.random() < 0.25:
            # r5: variable merge targets (x |= {...}), incl. unset
            # vars and non-object current values
            init = R.choice([f'mv{i} = .obj\n', f'mv{i} = "s"\n',
                             f'mv{i} = {{"k": 1}}\n', ''])
            rhs = R.choice(['{"w": 1}', '.obj', '.a', 'parse_json(.jsons)'])
            cap = R.choice(['', f', .mve{i}', ', _'])
            return (f"{init}mv{i}{cap} |= {rhs}\n"
                    f".mvo{i} = mv{i}")
        rhs = R.choice(['{"w": 1}', '{"y": "over"}', '.obj', '.a',
                        '.missing', '{}'])
        if R.random() < 0.4:
            # r5: handled merge-assign — error rows (expr OR
            # merge-type) get the type default plain-assigned (for a
            # ROOT target: the whole event resets), err captures;
            # also fallible rhs
            err = R.choice(['_', f'me{i}'] +
                           ([f'.me{i}'] if tgt != '.' else []))
            rhs = R.choice([rhs, 'parse_json(.jsons)',
                            f'parse_key_value!("k={i}")'])
            rd = '' if err in ('_',) or err.startswith('.') \
                else f"\n.meo{i} = {err}"
            after = f"\n.after{i} = .a" if tgt == '.' and \
                R.random() < 0.5 else ''
            return f"{tgt}, {err} |= {rhs}{rd}{after}"
        return f"{tgt} |= {rhs}"
    if kind == 'del':
        # del as statement or expression; dead rows must keep fields
        if R.random() < 0.3:
            # r5: del on VARIABLE fields (post-parse cleanup idiom);
            # value-semantics isolation from the source column
            init = R.choice([f'dv{i} = .obj', f'dv{i} = {{"a": 1}}',
                             f'dv{i} = .a'])
            fld = R.choice(['x', 'y', 'a', 'zz'])
            form = R.choice(['stmt', 'expr'])
            dl = (f"del(dv{i}.{fld})" if form == 'stmt'
                  else f".dd{i} = del(dv{i}.{fld})")
            return f"{init}\n{dl}\n.o{i} = dv{i}\n.p{i} = .obj.x"
        tgt = R.choice(['.a', '.s', '.obj.x', '.obj.y', '.missing',
                        '.obj.zz', f'.o{i}',
                        # r5: list-element removal with shift (neg idx
                        # counts from the end; out-of-range = no-op)
                        '.arr[0]', '.arr[1]', '.arr[-1]', '.arr[9]',
                        '.s[0]', '.missing[2]'])
        form = R.choice(['stmt', 'stmt', 'expr', 'then_read'])
        if form == 'stmt':
            return f"del({tgt})"
        if form == 'expr':
            return f".d{i} = del({tgt})"
        return f"del({tgt})\n.d{i} = {tgt}\n.x{i} = exists({tgt})"
    if kind == 'assign':
        return f".o{i} = {anyexpr()}"
    if kind == 'nested':
        tgt = R.choice([f".nest{i}.f", f".nest{i}.f",
                        # writes into the EXISTING typed struct column
                        # (row 2 is null: the fresh object must carry
                        # ONLY the written field, not null siblings)
                        ".obj.x", ".obj.y", ".obj.z"])
        stmt = f"{tgt} = {anyexpr()}"
        if tgt.startswith(".obj") and R.random() < 0.5:
            stmt += f"\n.r{i} = {R.choice(['.obj.x', '.obj.y', '.obj.z'])}"
        return stmt
    if kind == 'handled':
        return f".o{i}, .e{i} = {anyexpr()}"
    if kind == 'var':
        # variables feed later expressions, not just pass-throughs
        use = R.choice([f".o{i} = v{i}",
                        f".o{i} = (v{i} ?? {anyexpr(1)})",
                        f".o{i}, .e{i} = v{i}"])
        return f"v{i} = {anyexpr()}\n{use}"
    if kind == 'varpath':
        # nested writes INTO variables build objects before use
        if R.random() < 0.35:
            # r5: list ELEMENT writes (xs[i] = v) — in-range, pad
            # above, negative in-range, value-semantics isolation
            # from the source column
            init = R.choice([f'xs{i} = .arr', f'xs{i} = [1, 2, 3]',
                             f'xs{i} = []',
                             f'xs{i} = split((.s ?? "a,b"), ",")'])
            idx = R.choice([0, 1, 5, -1, -2])
            val = R.choice(['9', '"z"', 'null', num(2), '.a'])
            if R.random() < 0.4:
                # event-column form (.arr[i] = v, r5)
                return (f".arr[{idx}] = {val}\n.o{i} = .arr")
            return (f"{init}\nxs{i}[{idx}] = {val}\n"
                    f".o{i} = xs{i}\n.p{i} = .arr[0]")
        init = R.choice(['', f'w{i} = {{}}\n',
                         f'w{i} = {{"k": 1}}\n'])
        return (f"{init}w{i}.f = {anyexpr()}\n"
                f".o{i} = w{i}.f\n.p{i} = w{i}.k")
    if kind == 'ifstmt':
        shape = R.choice(['plain', 'noelse', 'chain', 'asym', 'multi',
                          'nested', 'varbranch'])
        if shape == 'varbranch':
            # r5: variable branch targets (`if c { x = 1 }`) — the
            # untaken/dead rows keep the pre-if value; reassignments
            # inside one branch read their own earlier write
            seed = R.choice([str(R.randint(0, 5)), '"s"', 'null',
                             f'(.a ?? {R.randint(0, 3)})'])
            upd = R.choice([f'vb{i} = {anyexpr(1)}',
                            f'vb{i} = vb{i} + 1\n vb{i} = vb{i} * 2',
                            f'vb{i} = to_int({strx(1)})'])
            els = R.choice(['', f' else {{ vb{i} = {anyexpr(1)} }}'])
            return (f"vb{i} = {seed}\n"
                    f"if {boolex()} {{ {upd} }}{els}\n"
                    f".o{i} = vb{i}")
        if shape == 'noelse':
            return f"if {boolex()} {{ .o{i} = {anyexpr(1)} }}"
        if shape == 'chain':
            els = R.choice(['', f" else {{ .o{i} = {anyexpr(1)} }}"])
            return (f"if {boolex()} {{ .o{i} = {anyexpr(1)} }}"
                    f" else if {boolex()} {{ .o{i} = {anyexpr(1)} }}"
                    f"{els}")
        if shape == 'asym':
            # branches assign DIFFERENT fields: the untaken field
            # keeps its prior value per row
            return (f"if {boolex()} {{ .o{i} = {anyexpr(1)} }}"
                    f" else {{ .p{i} = {anyexpr(1)} }}")
        if shape == 'nested':
            # nested branch targets: untaken rows keep prior value
            # AND shape (incl. the null-struct row)
            t1 = R.choice(['.obj.x', '.obj.y', '.obj.z', f'.nest{i}.f'])
            els = R.choice(['', f" else {{ {R.choice(['.obj.x', '.obj.w', f'.q{i}'])} = {anyexpr(1)} }}"])
            return f"if {boolex()} {{ {t1} = {anyexpr(1)} }}{els}" 
        if shape == 'multi':
            # second statement may read (or reassign) the first's
            # target — the written-overlay must give it the branch's
            # own value on taken rows, prior elsewhere
            rd = R.choice([f".o{i}", anyexpr(1)])
            tgt = R.choice([f".p{i}", f".o{i}"])
            return (f"if {boolex()} {{ .o{i} = {anyexpr(1)}\n"
                    f"{tgt} = ({rd} ?? {num(2)}) }}"
                    f" else {{ .o{i} = {anyexpr(1)} }}")
        return (f"if {boolex()} {{ .o{i} = {anyexpr(1)} }}"
                f" else {{ .o{i} = {anyexpr(1)} }}")
    if kind == 'closure':
        which = R.choice(['map', 'filter', 'mapkeys', 'foreach'])
        if which == 'foreach':
            # for_each accumulators (sum r3, push/local/cond r5):
            # seed acc, optional body-local, optional if-gated update,
            # read the acc after the loop
            coll = R.choice(['.arr', '.arr', '[1, 2, 3]', '[]'])
            seed = R.choice(['[]', '[0]', '["s"]'])
            elem = R.choice(['v', 'v * 2', 'i_', 'to_string(v)',
                             'lv', '(v ?? 0)',
                             '(v + (.a ?? 0))', '((.b ?? 0) - v)'])
            local = "lv = v + 1\n " if 'lv' in elem or \
                R.random() < 0.3 else ""
            upd = f"ac{i} = push(ac{i}, {elem})"
            r_ = R.random()
            if r_ < 0.25:
                # r5 set accumulators: flag / last-match-wins
                upd = R.choice([
                    f"if v {R.choice(['>', '==', '<'])} "
                    f"{R.randint(0, 3)} {{ fl{i} = "
                    f"{R.choice(['true', 'v', 'to_string(v)'])} }}",
                    f"fl{i} = {R.choice(['v', 'v * 2', 'i_'])}",
                ])
                return (f"fl{i} = {R.choice(['false', '0', 'null'])}\n"
                        f"for_each({coll}) -> |i_, v| {{ {upd} }}\n"
                        f".o{i} = fl{i}")
            if r_ < 0.55:
                upd = (f"if v {R.choice(['>', '<', '!='])} "
                       f"{R.randint(0, 3)} {{ {upd} }}")
            if R.random() < 0.3:
                upd += f"\n sm{i} = sm{i} + (v ?? 0)"
                pre = f"sm{i} = 0\n"
            else:
                pre = ""
            if R.random() < 0.15:
                # r5: unconditional return exits the closure per
                # element — statements after it must NOT run
                upd = (f"return {R.choice(['42', 'v', '(v ?? 1)'])}"
                       f"\n {upd}")
            return (f"{pre}ac{i} = {seed}\n"
                    f"for_each({coll}) -> |i_, v| {{ {local}{upd} }}\n"
                    f".o{i} = ac{i}" + (f"\n.s{i}m = sm{i}" if pre
                                        else ""))
        if which == 'mapkeys':
            bodyk = R.choice(['upcase(k)', 'k + "_t"', '"same"',
                              'downcase(k)'])
            rec = R.choice(['', '', ', recursive: true',
                            ', recursive: false'])
            # r5: recursive renames descend struct children and list
            # elements (type-level); exercise a NESTED constant too
            src_ = R.choice(['.obj', '.obj',
                             '{"a": 1, "n": {"b": 2}, "l": [{"c": 3}]}'])
            return (f".o{i}, .e{i} = map_keys({src_}{rec})"
                    f" -> |k| {{ {bodyk} }}")
        if which == 'map':
            # capture-bearing bodies (element-expanded ctx, r5): the
            # operand may read event paths / outer vars, incl. via a
            # preceding var binding
            rhs = R.choice([str(R.randint(1, 5)), '.a', '.obj.x',
                            '(.a ?? 1)', 'cv'])
            pre = f"cv = (.b ?? 0)\n" if rhs == 'cv' else ""
            return (f"{pre}.o{i} = map_values(.arr) -> |v| "
                    f"{{ v {R.choice(['+', '*', '-'])} {rhs} }}")
        rhs = R.choice([str(R.randint(-2, 4)), '.a', '(.a ?? 2)', 'i_'])
        return (f".o{i} = filter(.arr) -> |i_, v| "
                f"{{ v {R.choice(['>', '<', '!='])} {rhs} }}")
    raise AssertionError


def gen_program():
    return "\n".join(gen_stmt(i) for i in range(R.randint(1, 4)))


def make_batch():
    return pa.table({
        "a": pa.array([3, None, -7, 0, 12], pa.int64()),
        "b": pa.array([2.5, -1.0, None, 0.0, 9.75], pa.float64()),
        "s": pa.array(["Foo Bar", "", None, "  x ", "42"]),
        "jsons": pa.array(['{"k": 1}', '[1, "a"]', '{bad', None,
                           '{"w": [1, 2.5], "k": 2.5, "B": "z"}']),
        "t": pa.array(["true", None, "a,b", "-3", "ümlaut Z"]),
        "ts": pa.array([1700000000123456, 0, None, -86399876544,
                        1234567890999999],
                       pa.timestamp("us", tz="UTC")),
        "arr": pa.array([[1, 2, 3], [], [5, -1], [0], [7]],
                        pa.list_(pa.int64())),
        "obj": pa.array([{"x": 1, "y": "hey"}, {"x": None, "y": "B c"},
                         None, {"x": -4, "y": None}, {"x": 9, "y": ""}],
                        pa.struct([("x", pa.int64()),
                                   ("y", pa.string())])),
        "objarr": pa.array(
            [[{"k": 1}, {"k": 2}], [], [{"k": None}], [{"k": 4}],
             [{"k": 5}, {"k": None}, {"k": 7}]],
            pa.list_(pa.struct([("k", pa.int64())]))),
    })


def norm(s):
    # (r4: int/float branch blends keep per-row kinds via union
    # lanes, so error texts match exactly — no masking needed)
    return s


def close(x, y):
    if isinstance(x, float) and isinstance(y, (int, float)):
        if x != x and y != y:  # NaN
            return True
        if x == y:             # covers equal infinities (inf-inf=nan)
            return True
        return abs(x - y) < 1e-9 or (x != 0 and abs((x - y) / x) < 1e-9)
    return x == y


def run_fuzz(seed: int, n_programs: int, verbose: bool = True) -> int:
    """Returns the number of unique divergences found."""
    global R
    R = random.Random(seed)
    batch = make_batch()
    rows = batch.to_pylist()
    n_div = n_vec = n_fall = 0
    seen = set()
    for pi in range(n_programs):
        src = gen_program()
        try:
            prog = Program(src)
        except Exception:
            continue
        try:
            vp = VectorProgram(src)
            out = vp.run(batch)
        except (NotVectorizable, _RowFallback):
            n_fall += 1
            continue
        except Exception as ex:
            key = f"RAISE {type(ex).__name__} {str(ex)[:60]}"
            if key not in seen:
                seen.add(key)
                if verbose:
                    print(f"=== VECTOR RAISED ===\n{src}\n  {key}\n")
            n_div += 1
            continue
        n_vec += 1
        ocols = out.to_pylist()
        for ri, row in enumerate(rows):
            # deep copy: programs that write nested paths (.obj.x)
            # must not mutate the shared row dicts across programs
            ev = copy.deepcopy(row)
            rerr = None
            rab = False
            try:
                _, ev2, ra = prog.resolve(ev)
                # root replacement (`. = {...}`) REBINDS the event —
                # compare against the returned dict, not the original
                ev = ev2
                rab = ra is not None
            except Exception as ex:
                rerr = str(ex)
            verr = ocols[ri].get("vrl_err")
            vab = bool(ocols[ri].get("aborted") or False)
            bad = []
            if (rerr is None) != (verr is None):
                bad.append(("vrl_err presence", rerr, verr))
            elif rerr is not None and norm(rerr) != norm(verr):
                bad.append(("vrl_err text", rerr, verr))
            if rab != vab:
                bad.append(("aborted", rab, vab))
            if ev is None:
                # `., err |= <error>` resets the root to the null
                # default — the remap stage materializes that as an
                # empty event (all columns null)
                ev = {}
            keys = set(ev) | set(ocols[ri])
            keys.discard("vrl_err")
            keys.discard("aborted")   # compared above as a flag
            for k in keys:
                rv, vv = ev.get(k), ocols[ri].get(k)
                if isinstance(rv, str) and isinstance(vv, str) \
                        and norm(rv) == norm(vv):
                    continue
                if not close(rv, vv) and not close(vv, rv):
                    bad.append((k, rv, vv))
            if bad:
                key = (src.replace("\n", "; "), tuple(b[0] for b in bad))
                if key not in seen:
                    seen.add(key)
                    if verbose:
                        print(f"=== DIVERGE row {ri} ===\n{src}")
                        for k, rv, vv in bad:
                            print(f"  {k}: ref={rv!r}  vec={vv!r}")
                        print()
                n_div += 1
    if verbose:
        print(f"programs={n_programs} vectorized={n_vec} "
              f"fallback={n_fall} divergent_rows={n_div} "
              f"unique={len(seen)}")
        from vrl_ray.lang.vectorize import FALLBACK_CONVERSIONS
        if FALLBACK_CONVERSIONS:
            # broad-exception → _RowFallback conversions: a TypeError
            # here can be a kernel bug hiding as a silent slowdown
            print("fallback_conversions="
                  + dict(FALLBACK_CONVERSIONS).__repr__())
    return len(seen)


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    sys.exit(1 if run_fuzz(seed, n) else 0)
