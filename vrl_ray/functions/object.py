"""Object/Array/Enumerate-category stdlib functions (row-level).

Mirrors /root/reference/src/stdlib/{merge,keys,values,length,compact,
flatten,unflatten,from_entries,to_entries,object_from_array,zip,
map_keys,map_values,for_each,filter,includes,match_array,unique,
append,push,pop,chunks,tally,tally_value,unnest,del,exists,get,set,
remove}.rs. ``unnest`` row-level semantics here; the one-to-many
pipeline form is ``stages.route.unnest_stage`` (ds.flat_map /
map_batches emitting more rows).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from ..value import (
    VrlError, vrl_type, path_get, path_insert, path_remove, parse_path,
)

__all__ = [
    "merge", "keys", "values", "length", "compact", "flatten",
    "unflatten", "from_entries", "to_entries", "object_from_array",
    "zip_", "map_keys", "map_values", "for_each", "filter_",
    "includes", "match_array", "unique", "append", "push", "pop",
    "chunks", "tally", "tally_value", "unnest_row", "del_", "exists",
    "get", "set_", "remove",
]


def merge(to: dict, from_: dict, deep: bool = False) -> dict:
    """merge.rs: right wins; deep=True recurses into objects."""
    if not isinstance(to, dict) or not isinstance(from_, dict):
        raise VrlError("parameters must be objects")
    out = dict(to)
    for k, v in from_.items():
        if deep and isinstance(out.get(k), dict) and isinstance(v, dict):
            out[k] = merge(out[k], v, deep=True)
        else:
            out[k] = v
    return out


def _btree_items(d: dict):
    """Reference objects are BTreeMap<KeyString, Value>: every
    iteration observes keys in lexicographic (byte) order, never
    insertion order. UTF-8 byte order == code-point order, so
    Python's str sort matches."""
    return sorted(d.items(), key=lambda kv: str(kv[0]))


def keys(value: dict) -> list:
    if not isinstance(value, dict):
        raise VrlError("expected object")
    return [k for k, _ in _btree_items(value)]


def values(value: dict) -> list:
    if not isinstance(value, dict):
        raise VrlError("expected object")
    return [v for _, v in _btree_items(value)]


def length(value) -> int:
    """length.rs: object = #keys, array = #items, string = #bytes."""
    if isinstance(value, dict) or isinstance(value, list):
        return len(value)
    if isinstance(value, str):
        return len(value.encode("utf-8"))
    raise VrlError(f"expected object, array or string, got {vrl_type(value)}")


def compact(
    value,
    recursive: bool = True,
    null: bool = True,
    string: bool = True,
    object: bool = True,
    array: bool = True,
    nullish: bool = False,
) -> Any:
    """compact.rs: drop empty/null values from collections."""
    from .coerce import is_nullish

    def empty(v) -> bool:
        if nullish and is_nullish(v):
            return True
        if null and v is None:
            return True
        if string and v == "" and isinstance(v, str):
            return True
        if object and isinstance(v, dict) and not v:
            return True
        if array and isinstance(v, list) and not v:
            return True
        return False

    def walk(v):
        if isinstance(v, dict):
            out = {}
            for k, x in v.items():
                if recursive and isinstance(x, (dict, list)):
                    x = walk(x)
                if not empty(x):
                    out[k] = x
            return out
        if isinstance(v, list):
            out_l = []
            for x in v:
                if recursive and isinstance(x, (dict, list)):
                    x = walk(x)
                if not empty(x):
                    out_l.append(x)
            return out_l
        return v

    if not isinstance(value, (dict, list)):
        raise VrlError("expected object or array")
    return walk(value)


def flatten(value, separator: str = ".", except_: Optional[list] = None) -> Any:
    """flatten.rs: a nested ARRAY flattens to a flat array; a nested
    OBJECT flattens to dotted keys (arrays kept as leaf values, like
    the reference); `except_` lists top-level keys left nested."""
    skip = set(except_ or [])
    if isinstance(value, list):
        out_l: list = []

        def walk_l(v):
            for x in v:
                if isinstance(x, list):
                    walk_l(x)
                else:
                    out_l.append(x)

        walk_l(value)
        return out_l
    if not isinstance(value, dict):
        raise VrlError("expected object or array")
    out: dict = {}

    # MapFlatten (flatten.rs:60-108): the `except` check uses the BARE
    # key at EVERY depth; empty objects recurse into nothing and
    # disappear from the output.
    def walk(v, prefix: str):
        for k, x in _btree_items(v):
            key = f"{prefix}{separator}{k}" if prefix else str(k)
            if isinstance(x, dict) and str(k) not in skip:
                walk(x, key)
            else:
                out[key] = x

    walk(value, "")
    return out


def unflatten(value: dict, separator: str = ".", recursive: bool = True) -> dict:
    """unflatten.rs: dotted keys -> nested objects (objects only; no
    array reconstruction, matching the reference)."""
    if not isinstance(value, dict):
        raise VrlError("expected object")
    out: dict = {}
    for k, v in _btree_items(value):
        if recursive and isinstance(v, dict):
            v = unflatten(v, separator, True)
        parts = str(k).split(separator)
        cur = out
        for p in parts[:-1]:
            nxt = cur.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                cur[p] = nxt
            cur = nxt
        cur[parts[-1]] = v
    return out


def from_entries(value: list) -> dict:
    """from_entries.rs: each entry is an OBJECT; the key is the first
    of key/Key/name/Name whose value is neither null nor false
    (select_key), must be a string; the value is `value` else `Value`
    else null (present-but-null does NOT fall through)."""
    out = {}
    if not isinstance(value, list):
        from ..value import vrl_type
        raise VrlError(f"expected array, got {vrl_type(value)}")
    for e in value:
        if not isinstance(e, dict):
            from ..value import vrl_type
            raise VrlError(f"expected object, got {vrl_type(e)}")
        key = None
        for alias in ("key", "Key", "name", "Name"):
            k = e.get(alias)
            if k is not None and k is not False:
                key = k
                break
        if not isinstance(key, str):
            raise VrlError("object keys must be strings")
        if "value" in e:
            v = e["value"]
        elif "Value" in e:
            v = e["Value"]
        else:
            v = None
        out[key] = v
    return out


def to_entries(value) -> list:
    """to_entries.rs: objects -> key/value entries; arrays -> entries
    keyed by index."""
    if isinstance(value, dict):
        return [{"key": k, "value": v} for k, v in value.items()]
    if isinstance(value, list):
        return [{"key": i, "value": v} for i, v in enumerate(value)]
    from ..value import vrl_type
    raise VrlError(f"expected array or object, got {vrl_type(value)}")


def object_from_array(values: list, keys: Optional[list] = None) -> dict:
    """object_from_array.rs: [[k,v],..] or zip(keys, values); null
    keys skip the entry."""
    if keys is not None:
        out = {}
        for k, v in zip(keys, values):
            if k is None:
                continue
            if not isinstance(k, str):
                raise VrlError("object keys must be strings")
            out[k] = v
        return out
    out = {}
    for e in values:
        if not isinstance(e, list):
            from ..value import vrl_type
            raise VrlError(f"expected array, got {vrl_type(e)}")
        if not e:
            raise VrlError("array value too short")
        k = e[0]
        if k is None:
            continue
        if not isinstance(k, str):
            # make_key_string: Bytes or Null only
            raise VrlError("object keys must be strings")
        out[k] = e[1] if len(e) > 1 else None
    return out


def zip_(array_0: list, array_1: Optional[list] = None) -> list:
    """zip.rs: pairwise zip; single-arg form zips an array of arrays
    (every inner element must itself be an array — data error, not a
    crash, when it isn't)."""
    from ..value import vrl_type
    if array_1 is not None:
        if not isinstance(array_0, list):
            raise VrlError(f"expected array, got {vrl_type(array_0)}")
        if not isinstance(array_1, list):
            raise VrlError(f"expected array, got {vrl_type(array_1)}")
        return [list(t) for t in zip(array_0, array_1)]
    if not isinstance(array_0, list):
        raise VrlError(f"expected array, got {vrl_type(array_0)}")
    for inner in array_0:
        if not isinstance(inner, list):
            from ..value import vrl_type
            raise VrlError(f"expected array, got {vrl_type(inner)}")
    return [list(t) for t in zip(*array_0)]


def map_keys(value: dict, fn: Callable[[str], str], recursive: bool = False) -> dict:
    if not isinstance(value, dict):
        raise VrlError("expected object")

    def walk(v):
        if isinstance(v, dict):
            return {fn(k): walk(x) for k, x in _btree_items(v)}
        if isinstance(v, list):
            return [walk(x) for x in v]
        return v

    if recursive:
        return walk(value)
    return {fn(k): v for k, v in _btree_items(value)}


def map_values(value, fn: Callable[[Any], Any], recursive: bool = False):
    if isinstance(value, dict):
        return {
            k: (map_values(v, fn, True) if recursive and isinstance(v, (dict, list)) else fn(v))
            for k, v in _btree_items(value)
        }
    if isinstance(value, list):
        return [
            map_values(v, fn, True) if recursive and isinstance(v, (dict, list)) else fn(v)
            for v in value
        ]
    raise VrlError("expected object or array")


def for_each(value, fn: Callable[[Any, Any], None]) -> None:
    """for_each.rs: |k,v| over objects, |i,v| over arrays."""
    if isinstance(value, dict):
        for k, v in _btree_items(value):
            fn(k, v)
    elif isinstance(value, list):
        for i, v in enumerate(value):
            fn(i, v)
    else:
        raise VrlError("expected object or array")


def filter_(value, fn: Callable[[Any, Any], bool]):
    """filter.rs: keep entries where |k,v| / |i,v| closure is true."""
    if isinstance(value, dict):
        return {k: v for k, v in _btree_items(value) if fn(k, v)}
    if isinstance(value, list):
        return [v for i, v in enumerate(value) if fn(i, v)]
    raise VrlError("expected object or array")


def includes(value: list, item: Any) -> bool:
    from ..value import eq
    if not isinstance(value, list):
        raise VrlError("expected array")
    return any(eq(v, item) for v in value)


def match_array(value: list, pattern, all: bool = False) -> bool:
    """match_array.rs: any (default) / all items match the regex;
    non-string items never match."""
    from .string import match_ as _match
    if not isinstance(value, list):
        raise VrlError("expected array")
    items = [_match(v, pattern) if isinstance(v, str) else False for v in value]
    if all:
        return len(items) > 0 and False not in items
    return True in items


def unique(value: list) -> list:
    """unique.rs: first occurrence wins, order preserved."""
    if not isinstance(value, list):
        raise VrlError("expected array")
    seen = []
    out = []
    for v in value:
        key = repr(v)
        if key not in seen:
            seen.append(key)
            out.append(v)
    return out


def append(value: list, items: list) -> list:
    if not isinstance(value, list) or not isinstance(items, list):
        raise VrlError("expected arrays")
    return value + items


def push(value: list, item: Any) -> list:
    if not isinstance(value, list):
        raise VrlError("expected array")
    return value + [item]


def pop(value: list) -> list:
    if not isinstance(value, list):
        from ..value import vrl_type
        raise VrlError(f"expected array, got {vrl_type(value)}")
    return value[:-1]


def chunks(value, chunk_size: int) -> list:
    """chunks.rs: byte-chunks of a string / item-chunks of an array."""
    if chunk_size < 1:
        raise VrlError("chunk_size must be at least 1 byte")
    if isinstance(value, str):
        # chunks.rs:12 — raw BYTE chunks; a chunk that splits a
        # codepoint stays bytes (VRL strings are bytes)
        b = value.encode("utf-8")
        out = []
        for i in range(0, len(b), chunk_size):
            c = b[i:i + chunk_size]
            try:
                out.append(c.decode("utf-8"))
            except UnicodeDecodeError:
                out.append(c)
        return out
    if isinstance(value, list):
        return [value[i:i + chunk_size] for i in range(0, len(value), chunk_size)]
    raise VrlError("expected string or array")


def tally(value: list) -> dict:
    """tally.rs: count occurrences of string items in ONE array."""
    if not isinstance(value, list):
        raise VrlError("expected array")
    out: dict = {}
    for v in value:
        if not isinstance(v, str):
            from ..value import rust_debug
            raise VrlError(
                f"all values must be strings, found: {rust_debug(v)}")
        out[v] = out.get(v, 0) + 1
    return out


def tally_value(array: list, value: Any) -> int:
    from ..value import eq
    if not isinstance(array, list):
        raise VrlError("expected array")
    return sum(1 for v in array if eq(v, value))


def unnest_row(event: dict, path: str) -> list[dict]:
    """unnest.rs:64-72 row semantics: explode array at `path` into N
    copies of the event (the only one-to-many operator)."""
    arr = path_get(event, path)
    if not isinstance(arr, list):
        raise VrlError(f"expected array at {path}")
    out = []
    for item in arr:
        # path_insert is copy-on-write (r5): use its return value
        out.append(path_insert(_deepcopy_json(event), path, item))
    return out


def _deepcopy_json(v):
    if isinstance(v, dict):
        return {k: _deepcopy_json(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_deepcopy_json(x) for x in v]
    return v


# --- path functions (del.rs, exists.rs, get.rs, set.rs, remove.rs) ---------

def del_(event: dict, path: str, compact_: bool = False):
    """del.rs: remove and return old value (mutates event)."""
    new_root, removed = path_remove(event, path, compact=compact_)
    if isinstance(event, dict) and isinstance(new_root, dict) and new_root is not event:
        event.clear()
        event.update(new_root)
    return removed


def exists(event: dict, path: str) -> bool:
    segs = parse_path(path) if isinstance(path, str) else list(path)
    cur = event
    for seg in segs:
        if isinstance(seg, int):
            if not isinstance(cur, list):
                return False
            idx = seg if seg >= 0 else len(cur) + seg
            if idx < 0 or idx >= len(cur):
                return False
            cur = cur[idx]
        else:
            if not isinstance(cur, dict) or seg not in cur:
                return False
            cur = cur[seg]
    return True


def _check_segments(path: list) -> list:
    for seg in path:
        if isinstance(seg, bool) or not isinstance(seg, (str, int)):
            raise VrlError(
                "path segment must be a string or an integer")
    return path


def get(value, path: list):
    """get.rs: path as runtime array of segments."""
    if not isinstance(path, list):
        raise VrlError("path must be an array")
    return path_get(value, _check_segments(path))


def set_(value, path: list, data):
    """set.rs: returns new value with `data` inserted at path."""
    if not isinstance(path, list):
        raise VrlError("path must be an array")
    import copy
    return path_insert(copy.deepcopy(value), _check_segments(path), data)


def remove(value, path: list, compact: bool = False):
    """remove.rs: returns new value with path removed."""
    if not isinstance(path, list):
        raise VrlError("path must be an array")
    import copy
    root, _ = path_remove(copy.deepcopy(value), _check_segments(path),
                          compact=compact)
    return root
