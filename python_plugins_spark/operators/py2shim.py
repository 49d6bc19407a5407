"""Hand-rolled Python-2 -> 3 source rewriter for the transform shim.

The reference's Interpreted mode is Jython 2.5 and its own test
scripts are Python 2 (``print "emitting records"``,
``/root/reference/src/test/java/io/cdap/plugin/python/transform/
PythonTransformNativeTest.java:60-62``), so verbatim CDAP migration
scripts must still run here. This replaces the previous ``lib2to3``
implementation: lib2to3 is deprecated and REMOVED in Python 3.13, so
the feature would have died silently on interpreter upgrade.

Built on the stdlib ``tokenize`` module (stable API), which happily
lexes the py2-isms we need — they just arrive as adjacent token pairs:

- ``<>``      -> OP '<' + OP '>'        -> ``!=``
- ``0777``    -> NUMBER '0' + NUMBER    -> ``0o777``
- ``10L``     -> NUMBER + NAME 'L'      -> ``10``
- ``print x`` -> NAME-led statement     -> ``print(x)`` (incl. trailing
  comma -> ``end=' '`` and ``print >>f, x`` -> ``file=f``)
- ``x.has_key(y)``                      -> ``(y in x)``
- ``except E, e:``                      -> ``except E as e:``
- ``raise E, v[, tb]``                  -> ``raise E(v)[.with_traceback(tb)]``
- ``xrange`` / ``long``                 -> ``range`` / ``int``
- ``.iteritems/itervalues/iterkeys``    -> ``.items/values/keys``

Rewrites operate on the token stream (comments and string literals are
therefore never touched); output is reassembled with
``tokenize.untokenize`` compatibility mode, which normalizes spacing
but preserves indentation structure. Scripts broken in both dialects
still fail to tokenize/compile and surface the original error.
"""

from __future__ import annotations

import io
import tokenize
from tokenize import DEDENT, INDENT, NAME, NEWLINE, NL, NUMBER, OP, STRING

_OPENERS = {"(": ")", "[": "]", "{": "}"}
_CLOSERS = {")": "(", "]": "[", "}": "{"}


def _adjacent(a, b) -> bool:
    return a.end == b.start


def _lex(src: str) -> list:
    return list(tokenize.generate_tokens(io.StringIO(src).readline))


def _match_forward(toks: list[tuple], i: int) -> int:
    """Index of the closer matching the opener at ``i`` (2-tuples)."""
    depth = 0
    for j in range(i, len(toks)):
        t, s = toks[j][0], toks[j][1]
        if t == OP and s in _OPENERS:
            depth += 1
        elif t == OP and s in _CLOSERS:
            depth -= 1
            if depth == 0:
                return j
    raise SyntaxError("unbalanced brackets")


def _match_backward(toks: list[tuple], i: int) -> int:
    """Index of the opener matching the closer at ``i`` (2-tuples)."""
    depth = 0
    for j in range(i, -1, -1):
        t, s = toks[j][0], toks[j][1]
        if t == OP and s in _CLOSERS:
            depth += 1
        elif t == OP and s in _OPENERS:
            depth -= 1
            if depth == 0:
                return j
    raise SyntaxError("unbalanced brackets")


def _pass_lexical(raw: list) -> list[tuple[int, str]]:
    """Adjacency merges (<>, octal, long suffix) + name renames.
    Consumes full TokenInfo (positions needed); emits 2-tuples."""
    out: list[tuple[int, str]] = []
    i = 0
    while i < len(raw):
        tok = raw[i]
        nxt = raw[i + 1] if i + 1 < len(raw) else None
        if (
            tok.type == OP and tok.string == "<"
            and nxt is not None and nxt.type == OP and nxt.string == ">"
            and _adjacent(tok, nxt)
        ):
            out.append((OP, "!="))
            i += 2
            continue
        if (
            tok.type == NUMBER and tok.string == "0"
            and nxt is not None and nxt.type == NUMBER
            and _adjacent(tok, nxt)
            and nxt.string.rstrip("lL").isdigit()
        ):
            digits = nxt.string.rstrip("lL")
            if all(c in "01234567" for c in digits):
                out.append((NUMBER, "0o" + digits))
                i += 2
                # a long suffix may still follow (0777L -> '0','777','L'
                # already consumed above; '0','777L' handled by rstrip)
                continue
        if (
            tok.type == NUMBER
            and nxt is not None and nxt.type == NAME
            and nxt.string in ("l", "L")
            and _adjacent(tok, nxt)
        ):
            out.append((NUMBER, tok.string))
            i += 2
            continue
        if tok.type == NAME and tok.string == "xrange":
            out.append((NAME, "range"))
            i += 1
            continue
        if (
            tok.type == NAME
            and tok.string in ("iteritems", "itervalues", "iterkeys")
            and out
            and out[-1] == (OP, ".")
        ):
            out.append((NAME, tok.string[4:]))  # .items/.values/.keys
            i += 1
            continue
        if tok.type == NAME and tok.string == "long":
            out.append((NAME, "int"))
            i += 1
            continue
        out.append((tok.type, tok.string))
        i += 1
    return out


def _stmt_starts(toks: list[tuple]) -> set[int]:
    """Indices where a new simple statement can begin."""
    starts = set()
    depth = 0
    expect = True
    for i, (t, s) in enumerate(toks):
        if t in (NEWLINE, INDENT, DEDENT):
            expect = True
            continue
        if t in (NL, tokenize.COMMENT):
            continue
        if t == OP:
            if s in _OPENERS:
                depth += 1
            elif s in _CLOSERS:
                depth -= 1
            if s in (";", ":") and depth == 0:
                expect = True
                continue
        if expect:
            starts.add(i)
            expect = False
    return starts


def _split_top_level(toks: list[tuple], sep: str) -> list[list[tuple]]:
    parts: list[list[tuple]] = [[]]
    depth = 0
    for t, s in toks:
        if t == OP:
            if s in _OPENERS:
                depth += 1
            elif s in _CLOSERS:
                depth -= 1
            if s == sep and depth == 0:
                parts.append([])
                continue
        parts[-1].append((t, s))
    return parts


def _line_end(toks: list[tuple], i: int) -> int:
    """First index >= i holding NEWLINE or a top-level ';'."""
    depth = 0
    for j in range(i, len(toks)):
        t, s = toks[j][0], toks[j][1]
        if t == NEWLINE:
            return j
        if t == OP:
            if s in _OPENERS:
                depth += 1
            elif s in _CLOSERS:
                depth -= 1
            elif s == ";" and depth == 0:
                return j
    return len(toks)


def _rewrite_print(toks: list[tuple]) -> list[tuple]:
    while True:
        starts = _stmt_starts(toks)
        hit = None
        for i in sorted(starts):
            if toks[i] == (NAME, "print"):
                end = _line_end(toks, i)
                rest = toks[i + 1 : end]
                # already a call spanning the whole statement? leave it
                if (
                    rest
                    and rest[0] == (OP, "(")
                    and _match_forward(toks, i + 1) == end - 1
                ):
                    continue
                hit = (i, end, rest)
                break
        if hit is None:
            return toks
        i, end, rest = hit
        kwargs: list[tuple] = []
        if rest and rest[0] == (OP, ">>"):
            # print >>f, x  ->  print(x, file=f)
            fparts = _split_top_level(rest[1:], ",")
            fileexpr, rest = fparts[0], [
                tv for part in fparts[1:] for tv in part + [(OP, ",")]
            ][:-1] if len(fparts) > 1 else []
            kwargs += [(OP, ","), (NAME, "file"), (OP, "=")] + fileexpr
        if rest and rest[-1] == (OP, ","):
            rest = rest[:-1]
            kwargs += [(OP, ","), (NAME, "end"), (OP, "="), (STRING, "' '")]
        toks = (
            toks[:i]
            + [(NAME, "print"), (OP, "(")]
            + rest
            + kwargs
            + [(OP, ")")]
            + toks[end:]
        )


def _rewrite_has_key(toks: list[tuple]) -> list[tuple]:
    while True:
        hit = None
        for i in range(len(toks) - 2):
            if (
                toks[i] == (OP, ".")
                and toks[i + 1] == (NAME, "has_key")
                and toks[i + 2] == (OP, "(")
            ):
                hit = i
                break
        if hit is None:
            return toks
        i = hit
        close = _match_forward(toks, i + 2)
        args = toks[i + 3 : close]
        # walk back over the primary expression (trailer chain:
        # atom followed by any mix of .NAME / [...] / (...) trailers)
        j = i - 1
        while j >= 0:
            t, s = toks[j]
            if t == OP and s in _CLOSERS:
                j = _match_backward(toks, j) - 1
                continue  # opener may follow a callable/indexable
            if t in (NAME, STRING, NUMBER):
                j -= 1
                if j >= 0 and toks[j] == (OP, "."):
                    j -= 1
                    continue
                break  # atom reached
            break
        primary = toks[j + 1 : i]
        if not primary:
            raise SyntaxError("has_key with no receiver")
        toks = (
            toks[: j + 1]
            + [(OP, "(")]
            + args
            + [(NAME, "in")]
            + primary
            + [(OP, ")")]
            + toks[close + 1 :]
        )


def _rewrite_except(toks: list[tuple]) -> list[tuple]:
    out = list(toks)
    for i in sorted(_stmt_starts(out)):
        if i < len(out) and out[i] == (NAME, "except"):
            # clause runs to the ':' at depth 0
            depth = 0
            for j in range(i + 1, len(out)):
                t, s = out[j]
                if t == OP:
                    if s in _OPENERS:
                        depth += 1
                    elif s in _CLOSERS:
                        depth -= 1
                    elif s == ":" and depth == 0:
                        break
            else:
                continue
            clause = out[i + 1 : j]
            parts = _split_top_level(clause, ",")
            if len(parts) == 2 and len(parts[1]) == 1 and parts[1][0][0] == NAME:
                out[i + 1 : j] = parts[0] + [(NAME, "as")] + parts[1]
    return out


def _rewrite_raise(toks: list[tuple]) -> list[tuple]:
    while True:
        hit = None
        for i in sorted(_stmt_starts(toks)):
            if toks[i] == (NAME, "raise"):
                end = _line_end(toks, i)
                parts = _split_top_level(toks[i + 1 : end], ",")
                if len(parts) in (2, 3) and all(parts):
                    hit = (i, end, parts)
                    break
        if hit is None:
            return toks
        i, end, parts = hit
        repl = [(NAME, "raise")] + parts[0] + [(OP, "(")] + parts[1] + [(OP, ")")]
        if len(parts) == 3:
            repl += (
                [(OP, "."), (NAME, "with_traceback"), (OP, "(")]
                + parts[2]
                + [(OP, ")")]
            )
        toks = toks[:i] + repl + toks[end:]


def python2_to_3(src: str) -> str:
    """Rewrite a Python-2 script to compile under Python 3. Raises
    (SyntaxError/TokenizeError) when the source cannot be mechanically
    converted — callers surface the ORIGINAL py3 compile error."""
    if not src.endswith("\n"):
        src += "\n"
    toks = _pass_lexical(_lex(src))
    toks = _rewrite_except(toks)
    toks = _rewrite_raise(toks)
    toks = _rewrite_has_key(toks)
    toks = _rewrite_print(toks)
    return tokenize.untokenize(toks)
