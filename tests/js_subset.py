"""Mechanical JS-subset -> Python transpiler for executing the shipped
frontend modules (projection.js, applogic.js) without node.

The frontend's logic modules are written in a disciplined subset —
function/const/let declarations, if/else, counting for-loops, arrays and
Math.* — precisely so this ~80-line translator can run them under pytest
against golden inputs (substitute for the reference's vite/TS type-check,
which needs a node toolchain this image lacks)."""

from __future__ import annotations

import math
import re


def _expr(s: str) -> str:
    """Translate a JS expression/statement fragment to Python."""
    s = re.sub(r"\b(const|let) ", "", s)
    s = s.replace("!==", " __NE__ ").replace("===", " __EQ__ ")
    s = s.replace(" __NE__ ", " != ").replace(" __EQ__ ", " == ")
    s = s.replace("Math.PI", "math.pi")
    s = s.replace("Math.min", "min").replace("Math.max", "max")
    s = s.replace("Math.abs", "abs")
    s = s.replace("Math.", "math.")
    s = s.replace(" && ", " and ").replace(" || ", " or ")
    s = re.sub(r"\btrue\b", "True", s)
    s = re.sub(r"\bfalse\b", "False", s)
    s = re.sub(r"\bnull\b", "None", s)
    s = s.replace(".push(", ".append(")
    s = re.sub(r"\b(\w+)\.length\b", r"len(\1)", s)
    return s


def transpile_js(source: str) -> str:
    out: list[str] = []
    indent = 0
    buf = ""
    for raw in source.splitlines():
        line = raw.strip()
        if not line or line.startswith("//") or line == '"use strict";':
            continue
        buf = f"{buf} {line}" if buf else line
        if not (buf.endswith(";") or buf.endswith("{") or buf.endswith("}")):
            continue  # statement continues on the next line
        stmt, buf = buf, ""

        if stmt == "}":
            indent -= 1
            continue
        if stmt == "} else {":
            indent -= 1
            out.append("    " * indent + "else:")
            indent += 1
            continue
        m = re.fullmatch(r"function (\w+)\((.*)\) \{", stmt)
        if m:
            out.append("    " * indent + f"def {m.group(1)}({m.group(2)}):")
            indent += 1
            continue
        m = re.fullmatch(r"for \(let (\w+) = 0; \1 < (.+); \1 \+= 1\) \{", stmt)
        if m:
            out.append(
                "    " * indent + f"for {m.group(1)} in range({_expr(m.group(2))}):"
            )
            indent += 1
            continue
        m = re.fullmatch(r"if \((.+)\) \{ (.+); \}", stmt)
        if m:  # braced single-line if
            out.append(
                "    " * indent + f"if {_expr(m.group(1))}: {_expr(m.group(2))}"
            )
            continue
        m = re.fullmatch(r"if \((.+)\) \{", stmt)
        if m:
            out.append("    " * indent + f"if {_expr(m.group(1))}:")
            indent += 1
            continue
        out.append("    " * indent + _expr(stmt.rstrip(";")))
    assert not buf, f"unterminated statement: {buf!r}"
    assert indent == 0, "unbalanced braces"
    return "\n".join(out)


def load_js(*sources: str) -> dict:
    """Transpile and exec JS modules into one shared namespace."""
    namespace: dict = {"math": math}
    for src in sources:
        exec(transpile_js(src), namespace)  # noqa: S102 - our checked-in files
    return namespace
