r"""Low-level lexical helpers for the OBO 1.4 flat-file format.

Implements, from the published OBO 1.4 specification and the reference
fixtures, the lexical layer the reference gets from its Rust pest grammar:

* escape sequences in identifiers / unquoted values
  (``\n \t \  \: \, \" \\ \( \) \[ \] \{ \} \!`` — evidence:
  ``xref: value-type:xsd\:string`` in ``/root/reference/tests/data/ms.obo``
  line 39; escaped vs unescaped ident forms at
  ``/root/reference/src/py/id.rs:366-370,487-497``)
* quoted strings with ``\"`` escapes (``QuotedString`` throughout the
  reference, e.g. ``src/py/syn.rs:124``)
* trailing ``{k="v", ...}`` qualifier blocks and ``! ...`` comments
  (captured per entity clause, ``src/py/term/clause.rs:136-156``,
  ``src/py/abc.rs:160-165``)
* ``[...]`` xref lists with per-item optional quoted descriptions
  (``src/py/xref.rs:39-55,169-173``)

Everything here is pure Python operating on single strings; it is invoked
from the vectorized document parser which amortizes the interpreter cost
over Arrow batches.  Hot paths take fast exits for the overwhelmingly
common case (no quote / bracket / comment on the line).
"""

from __future__ import annotations

# Unescape map per OBO 1.4 §2.1. Any other backslash-escaped char maps to
# itself (lenient, matches the reference's permissive fixtures).
_UNESCAPE = {
    "n": "\n",
    "t": "\t",
    "W": " ",
    ":": ":",
    ",": ",",
    '"': '"',
    "\\": "\\",
    "(": "(",
    ")": ")",
    "[": "[",
    "]": "]",
    "{": "{",
    "}": "}",
    "!": "!",
    " ": " ",
    "@": "@",
}

_ESCAPE_IDENT = {
    "\n": "\\n",
    "\t": "\\t",
    " ": "\\ ",
    ":": "\\:",
    ",": "\\,",
    '"': '\\"',
    "\\": "\\\\",
    "[": "\\[",
    "]": "\\]",
    "{": "\\{",
    "}": "\\}",
    "!": "\\!",
}


def unescape(s: str) -> str:
    """Resolve backslash escapes. Fast path: no backslash at all."""
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            out.append(_UNESCAPE.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


import re as _re

_URL_IDENT_RE = _re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _escape_all(s: str) -> str:
    if not any(ch in _ESCAPE_IDENT for ch in s):
        return s
    return "".join(_ESCAPE_IDENT.get(ch, ch) for ch in s)


def escape_ident(s: str) -> str:
    """Escape an identifier for serialization (inverse of token scan).

    URL idents print raw; prefixed idents keep the prefix separator colon
    unescaped but escape colons inside the local part — the reference's
    ``value-type:xsd\\:string`` form (``id.rs:366-370``); unprefixed
    idents escape fully.
    """
    if _URL_IDENT_RE.match(s):
        return s
    if ":" in s:
        prefix, local = s.split(":", 1)
        return f"{_escape_all(prefix)}:{_escape_all(local)}"
    return _escape_all(s)


def escape_quoted(s: str) -> str:
    """Escape text destined for a double-quoted string."""
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def escape_unquoted(s: str) -> str:
    """Escape raw-text clause values (name/remark/owl-axioms/...).

    Only what would change parse semantics: backslash itself, real
    newlines/tabs (owl-axioms carries literal \\n sequences in the wild —
    ms.obo header), comment starts, qualifier-block opens, and the two
    region-openers a reparse would otherwise treat structurally — a raw
    ``"`` opens a quoted span (swallowing any trailing ``! comment``) and
    a raw ``[`` opens bracket nesting with the same effect.
    """
    return (
        s.replace("\\", "\\\\")
        .replace("\n", "\\n")
        .replace("\t", "\\t")
        .replace("!", "\\!")
        .replace("{", "\\{")
        .replace('"', '\\"')
        .replace("[", "\\[")
    )


def split_line(value: str):
    """Split a raw clause value into ``(payload, qualifiers, comment)``.

    ``qualifiers`` is a list of ``(key, value)`` or None; ``comment`` is the
    trailing ``! ...`` text or None.  Respects quoted strings, escapes and
    bracket nesting, so a ``!`` or ``{8}`` inside a ``def: "..."`` regex is
    payload, not decoration (real case: ms.obo line 14401).
    """
    # Fast path: nothing that could start a quote/qualifier/comment.
    if "!" not in value and "{" not in value:
        return value.strip(), None, None

    # Fast path 2: comment-bearing line with no quotes/brackets/escapes —
    # the dominant shape (`is_a: X:1 ! parent term`) cuts straight to the
    # first '!' (most ms.obo entity lines take this path).
    if '"' not in value and "[" not in value and "{" not in value and "\\" not in value:
        bang = value.find("!")
        return value[:bang].strip(), None, value[bang + 1 :].strip()

    payload_end = len(value)
    qualifiers = None
    comment = None
    i, n = 0, len(value)
    in_quote = False
    bracket = 0  # [ ] nesting (xref lists)
    while i < n:
        c = value[i]
        if c == "\\":
            i += 2
            continue
        if in_quote:
            if c == '"':
                in_quote = False
            i += 1
            continue
        if c == '"':
            in_quote = True
            i += 1
            continue
        if c == "[":
            bracket += 1
            i += 1
            continue
        if c == "]":
            if bracket:
                bracket -= 1
            i += 1
            continue
        if bracket:
            i += 1
            continue
        if c == "{":
            # trailing qualifier block
            block, j = _scan_braced(value, i)
            qualifiers = parse_qualifier_block(block)
            payload_end = min(payload_end, i)
            i = j
            continue
        if c == "!":
            comment = value[i + 1 :].strip()
            payload_end = min(payload_end, i)
            break
        i += 1
    return value[:payload_end].strip(), qualifiers, comment


def _scan_braced(s: str, start: int):
    """Return (inner_text, index_after_closing_brace); s[start] == '{'."""
    i = start + 1
    n = len(s)
    in_quote = False
    while i < n:
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            in_quote = not in_quote
        elif c == "}" and not in_quote:
            return s[start + 1 : i], i + 1
        i += 1
    return s[start + 1 :], n  # unterminated: be lenient


def parse_qualifier_block(inner: str):
    """``key="value", key2="value2"`` → [(key, value), ...].

    Qualifier shape per ``src/py/qual.rs:44-47`` (ident key + quoted value).
    """
    quals = []
    i, n = 0, len(inner)
    while i < n:
        while i < n and inner[i] in " \t,":
            i += 1
        if i >= n:
            break
        # key: up to '='
        j = i
        while j < n and inner[j] != "=":
            j += 1
        key = unescape(inner[i:j].strip())
        i = j + 1
        if i < n and inner[i] == '"':
            val, i = scan_quoted(inner, i)
        else:
            j = i
            while j < n and inner[j] not in ",":
                j += 1
            val = unescape(inner[i:j].strip())
            i = j
        quals.append((key, val))
    return quals


def scan_quoted(s: str, start: int):
    """Scan a double-quoted string starting at s[start]=='"'.

    Returns (unescaped_text, index_after_closing_quote).
    """
    i = start + 1
    # fast path: closing quote with no backslash anywhere before it
    q = s.find('"', i)
    if q != -1 and s.find("\\", i, q) == -1:
        return s[i:q], q + 1
    n = len(s)
    buf = []
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            buf.append(_UNESCAPE.get(s[i + 1], s[i + 1]))
            i += 2
            continue
        if c == '"':
            return "".join(buf), i + 1
        buf.append(c)
        i += 1
    return "".join(buf), n  # unterminated: lenient


def scan_token(s: str, start: int, stops: str = " \t"):
    """Scan one whitespace-delimited token honoring escapes.

    Returns (unescaped_token, index_after_token).
    """
    n = len(s)
    # fast path: next stop char, no backslash inside the token
    j = n
    for st in stops:
        k = s.find(st, start)
        if k != -1 and k < j:
            j = k
    if s.find("\\", start, j) == -1:
        return s[start:j], j
    i = start
    buf = []
    esc = False
    while i < n:
        c = s[i]
        if esc:
            buf.append(_UNESCAPE.get(c, c))
            esc = False
            i += 1
            continue
        if c == "\\":
            esc = True
            i += 1
            continue
        if c in stops:
            break
        buf.append(c)
        i += 1
    return "".join(buf), i


def skip_ws(s: str, i: int) -> int:
    n = len(s)
    while i < n and s[i] in " \t":
        i += 1
    return i


def parse_xref_list(s: str, start: int = 0):
    r"""Parse ``[id "desc", id2, ...]`` → (list[(id, desc|None)], end_index).

    ``s[start]`` must be ``[``. Ids may contain escaped ``\,``/``\]``;
    descs are optional quoted strings (``src/py/xref.rs:49-55``).
    Trailing ``{...}`` per-xref modifiers are consumed and ignored (they
    are not exposed by the reference's XrefList either).
    """
    assert s[start] == "["
    xrefs = []
    i = start + 1
    n = len(s)
    while i < n:
        i = skip_ws(s, i)
        if i < n and s[i] == "]":
            return xrefs, i + 1
        # id token: stops at space, comma, or closing bracket
        ident, i = scan_token(s, i, stops=' \t,]"')
        desc = None
        i = skip_ws(s, i)
        if i < n and s[i] == '"':
            desc, i = scan_quoted(s, i)
            i = skip_ws(s, i)
        if i < n and s[i] == "{":
            _, i = _scan_braced(s, i)
            i = skip_ws(s, i)
        if ident:
            xrefs.append((ident, desc))
        if i < n and s[i] == ",":
            i += 1
            continue
        if i < n and s[i] == "]":
            return xrefs, i + 1
        # lenient: stray content, keep scanning
        if i < n and s[i] not in ' \t,]"':
            continue
        i += 1
    return xrefs, n  # unterminated: lenient


def split_tag_value(line: str):
    """Split ``tag: value`` at the first unescaped colon.

    Returns (tag, value) or None if the line has no unescaped colon.
    Tag is unescaped; value keeps raw escapes (parsed per-tag later).
    """
    # fast path: no escaping anywhere near the first colon
    c = line.find(":")
    if c == -1:
        if "\\" not in line:
            return None
    elif line.find("\\", 0, c) == -1:
        return line[:c], line[c + 1 :].lstrip(" \t")
    i, n = 0, len(line)
    while i < n:
        ch = line[i]
        if ch == "\\":
            i += 2
            continue
        if ch == ":":
            return unescape(line[:i]), line[i + 1 :].lstrip(" \t")
        i += 1
    return None
