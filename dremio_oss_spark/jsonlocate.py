"""JSON cell selection <-> element path locator.

Behavioral spec: the reference's JSONElementLocator
(dac/backend/src/main/java/com/dremio/dac/explore/JSONElementLocator.java:1-563)
— given the rendered JSON text of one cell and a character-range
selection, find the array/map path of the selected element(s)
(`locate`), and inversely find the character interval of a given path
(`locate_path`).  The paths feed the extract-map / extract-list
transform recommenders (ExtractMapRecommender.java:55,
ExtractListRecommender.java:56-74).

Everything here is driver-side, per-cell UI work: the input is ONE
cell's text (preview cells are already size-capped), never a
distributed scan — identical cost shape to the reference, which runs
a Jackson streaming parser over the cell string.

Path model: a path is a list of elements, each either
``ObjEl(field)`` (map/struct member access) or ``ArrElem`` with a
``position`` and a shared per-array element count (the reference's
ArrayJsonPathElement parent-chain count, which every snapshot of the
same array shares — ``from_the_end`` offsets need the final count).
"""

from __future__ import annotations

import re


class JsonLocateError(ValueError):
    pass


class ObjEl:
    """`.field` — ObjectJsonPathElement; field None while inside an
    object but before its first key (dropped from snapshots)."""

    __slots__ = ("field",)

    def __init__(self, field: str | None):
        self.field = field

    def __repr__(self):
        return f".{self.field}"

    def __eq__(self, other):
        return isinstance(other, ObjEl) and other.field == self.field

    def __hash__(self):
        return hash(("f", self.field))


class ArrEl:
    """`[position]` — ArrayJsonPathElement.  All elements of one array
    share a count cell so `count` reflects the array's FINAL size
    after the parse completes (incParents semantics)."""

    __slots__ = ("position", "_shared")

    def __init__(self, position: int = -1, shared: dict | None = None):
        self.position = position
        # parsed-path elements (explicit [i]) carry their own cell
        # (reference ctor: count = position; the blank ctor: 0)
        self._shared = shared if shared is not None \
            else {"n": position if position >= 0 else 0}

    def inc(self) -> "ArrEl":
        child = ArrEl(self.position + 1, self._shared)
        self._shared["n"] = child.position + 1
        return child

    @property
    def count(self) -> int:
        return self._shared["n"]

    def __repr__(self):
        return f"[{self.position}]"

    def __eq__(self, other):
        return isinstance(other, ArrEl) and \
            other.position == self.position

    def __hash__(self):
        return hash(("i", self.position))


_NUM = re.compile(r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")
_ESCAPES = {'"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f",
            "n": "\n", "r": "\r", "t": "\t"}


def _scan_string(text: str, i: int) -> tuple[str, int]:
    """Decode a JSON string starting at the opening quote `i`;
    returns (decoded, index just past the closing quote)."""
    out = []
    j = i + 1
    n = len(text)
    while j < n:
        c = text[j]
        if c == '"':
            return "".join(out), j + 1
        if c == "\\":
            if j + 1 >= n:
                break
            e = text[j + 1]
            if e == "u":
                if j + 6 > n:
                    break
                out.append(chr(int(text[j + 2:j + 6], 16)))
                j += 6
            else:
                out.append(_ESCAPES.get(e, e))
                j += 2
        else:
            out.append(c)
            j += 1
    raise JsonLocateError(f"unterminated string at {i}")


def _tokenize(text: str):
    """Yield (kind, value, start, text_len) with Jackson-compatible
    offsets: `start` is the token's first char (the opening quote for
    strings) and `text_len` the token TEXT length (decoded length for
    strings — getTextLength()).  kinds: obj_start obj_end arr_start
    arr_end field string number true false null."""
    i, n = 0, len(text)
    stack: list[str] = []
    expect_key = False
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == ",":
            expect_key = bool(stack and stack[-1] == "o")
            i += 1
            continue
        if c == ":":
            i += 1
            continue
        if c == "{":
            yield ("obj_start", None, i, 1)
            stack.append("o")
            expect_key = True
            i += 1
        elif c == "}":
            if not stack or stack[-1] != "o":
                raise JsonLocateError(f"unexpected }} at {i}")
            stack.pop()
            yield ("obj_end", None, i, 1)
            expect_key = False
            i += 1
        elif c == "[":
            yield ("arr_start", None, i, 1)
            stack.append("a")
            expect_key = False
            i += 1
        elif c == "]":
            if not stack or stack[-1] != "a":
                raise JsonLocateError(f"unexpected ] at {i}")
            stack.pop()
            yield ("arr_end", None, i, 1)
            expect_key = False
            i += 1
        elif c == '"':
            s, j = _scan_string(text, i)
            if expect_key:
                yield ("field", s, i, len(s))
                expect_key = False
            else:
                yield ("string", s, i, len(s))
            i = j
        elif text.startswith("true", i):
            yield ("true", True, i, 4)
            i += 4
        elif text.startswith("false", i):
            yield ("false", False, i, 5)
            i += 5
        elif text.startswith("null", i):
            yield ("null", None, i, 4)
            i += 4
        else:
            m = _NUM.match(text, i)
            if not m:
                raise JsonLocateError(
                    f"bad JSON at {i}: {text[i:i + 20]!r}")
            yield ("number", m.group(0), i, len(m.group(0)))
            i = m.end()


class _Tracker:
    """updatePath (JSONElementLocator.java:258-295): the current path
    while streaming tokens."""

    def __init__(self):
        self.path: list = []
        self.started_array = False

    def _inc(self):
        if self.started_array:
            self.path.append(ArrEl())
            self.started_array = False
        if not self.path:
            return
        top = self.path[-1]
        if isinstance(top, ArrEl):
            self.path[-1] = top.inc()

    def update(self, kind: str, value):
        if kind == "arr_start":
            self._inc()
            self.started_array = True
        elif kind == "arr_end":
            if self.started_array:
                self.started_array = False
            elif self.path and isinstance(self.path[-1], ArrEl):
                self.path.pop()
            else:
                raise JsonLocateError("was not in an array")
        elif kind == "obj_start":
            self._inc()
            self.path.append(ObjEl(None))
        elif kind == "obj_end":
            if not self.started_array and self.path and \
                    isinstance(self.path[-1], ObjEl):
                self.path.pop()
            else:
                raise JsonLocateError("was not in an object")
        elif kind == "field":
            if not self.path or not isinstance(self.path[-1], ObjEl):
                raise JsonLocateError("field outside an object")
            self.path.pop()
            self.path.append(ObjEl(value))
        else:
            self._inc()

    def snapshot(self) -> list:
        """JsonPath(JsonPath) copy: shared element objects, trailing
        field-less object dropped."""
        p = list(self.path)
        if p and isinstance(p[-1], ObjEl) and p[-1].field is None:
            p.pop()
        return p


def locate(cell_text: str, sel_start: int, sel_end: int
           ) -> tuple[list, list]:
    """Selection interval → (start_path, end_path)
    (JSONElementLocator.locate:210-256).  Elements are shared with the
    tracker, so ArrEl.count reads the array's final size."""
    tr = _Tracker()
    start = end = None
    prev_end = -1
    for kind, value, tstart, tlen in _tokenize(cell_text):
        tend = tstart + tlen
        if end is None and prev_end < sel_end < tstart:
            end = tr.snapshot()
        tr.update(kind, value)
        if start is None and \
                (prev_end < sel_start or tstart <= sel_start) and \
                sel_start < tend:
            start = tr.snapshot()
        if end is None and tstart <= sel_end <= tend:
            end = tr.snapshot()
        prev_end = tend
    if start is None:
        start = tr.snapshot()
    if end is None:
        end = tr.snapshot()
    return start, end


def locate_path(cell_text: str, path) -> tuple[int, int] | None:
    """Path → character interval (JSONElementLocator.locatePath:
    119-177): scalar values map to their text span (inside the quotes
    for strings); containers span from their opener to the matching
    closer.

    Reference-parity quirk, kept deliberately: a path naming an
    OBJECT-VALUED ARRAY ELEMENT (e.g. `value.topping[0]` over a list
    of objects) returns None — the live path only equals such a
    searched path at the element's END_OBJECT token, and the
    reference's switch returns null for END_* tokens
    (JSONElementLocator.java:168-173).  Field paths INTO the element
    (`value.topping[0].type`) and container paths via their field
    (`value.topping`) resolve normally."""
    if isinstance(path, str):
        path = parse_path(path)
    tr = _Tracker()
    toks = _tokenize(cell_text)
    hit = None
    for tok in toks:
        tr.update(tok[0], tok[1])
        if tr.path == list(path):
            hit = tok
            break
    if hit is None:
        return None
    if hit[0] == "field":
        try:
            hit = next(toks)
        except StopIteration:
            return None
        tr.update(hit[0], hit[1])
    kind, _, tstart, tlen = hit
    if kind in ("string", "number", "true", "false", "null"):
        start = tstart + (1 if kind == "string" else 0)
        return start, start + tlen
    if kind in ("obj_start", "arr_start"):
        start = tstart
        for tok in toks:
            tr.update(tok[0], tok[1])
            if tr.path == list(path):
                return start, tok[2] + tok[3]
    return None


def parse_path(s: str):
    """'value.a[0].b' or 'a[0].b' → element list
    (JSONElementLocator.parsePath + JsonPath(String))."""
    if s.startswith("value"):
        s = s[len("value"):]
    out: list = []
    i, n = 0, len(s)
    while i < n:
        if s[i] == ".":
            j = i + 1
            while j < n and s[j] not in ".[":
                j += 1
            if j == i + 1:
                raise JsonLocateError(f"empty field in path {s!r}")
            out.append(ObjEl(s[i + 1:j]))
            i = j
        elif s[i] == "[":
            j = s.find("]", i)
            if j < 0:
                raise JsonLocateError(f"{s!r} missing ]")
            out.append(ArrEl(int(s[i + 1:j])))
            i = j + 1
        elif i == 0:
            # leading bare field name (rule-path form 'a.b[0]')
            j = 0
            while j < n and s[j] not in ".[":
                j += 1
            out.append(ObjEl(s[:j]))
            i = j
        else:
            raise JsonLocateError(f"bad path {s!r} at {i}")
    return out


def to_rule_path(path) -> str:
    """Element list → the ExtractMapRule path string 'a.b[0]'
    (mapPathList joined on '.', ExtractMapRecommender:41)."""
    out = []
    for e in path:
        if isinstance(e, ObjEl):
            out.append(("." if out else "") + (e.field or ""))
        else:
            out.append(f"[{e.position}]")
    return "".join(out)
