"""JS ``script`` processor auto-translation — the declarative subset.

The reference embeds a JS engine (goja) and hands each event to a
user ``function process(event) {...}``
(``libbeat/processors/script/javascript/session.go``, event API
``beatevent_v0.go:80-86``: Get/Put/Rename/Delete/Cancel/Tag/
AppendTo). A per-event interpreter is exactly the row-at-a-time slow
path this engine bans — but almost every real-world Beats script is
STRAIGHT-LINE field surgery plus guards, which maps 1:1 onto the
processor registry. This module translates that subset into a plain
processor-config list (``add_fields`` / ``copy_fields`` / ``rename``
/ ``drop_fields`` / ``add_tags`` / ``drop_event`` / ``if``), so the
translated script runs as whole-stage-codegen column expressions with
ZERO Python in the hot path.

Supported grammar (anything else raises ``ScriptTranslationError`` —
loud refusal beats silent misparse; the caller falls back to the
``Script`` processor's Python-callable escape hatch):

- ``function process(evt) { ... }`` wrapper, ``//`` and ``/* */``
  comments;
- ``evt.Put(key, literal)`` — string / number / bool / null / flat
  object literal;
- ``evt.Put(key, evt.Get(src))`` (and via a ``var`` alias);
- ``evt.Rename(from, to)``, ``evt.Delete(key)``, ``evt.Tag(tag)``,
  ``evt.AppendTo("tags", tag)``, ``evt.Cancel()``;
- ``var x = evt.Get("f");`` single-assignment aliases, usable in
  conditions and Put values;
- ``if (cond) { ... } else if ... else { ... }`` with conditions
  built from ``===``/``==``/``!==``/``!=`` against literals, bare
  ``evt.Get("f")`` (has_fields), ``!``, ``&&``, ``||``, parens —
  emitted as the engine's own condition grammar (§2.5) under an
  ``{"if": ..., "then": [...], "else": [...]}`` entry.

Out of scope (raises): loops, arithmetic/string expressions, regexes,
function calls beyond the event API, nested ``Get`` paths computed at
runtime. Those scripts genuinely need code — port them to the
``Script(lang="pandas")`` Arrow path instead.
"""

from __future__ import annotations

import re

__all__ = ["ScriptTranslationError", "translate_script"]


class ScriptTranslationError(ValueError):
    """The script is outside the translatable subset."""


_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_$][\w$]*)
  | (?P<op>===|!==|==|!=|&&|\|\||[(){};,.!=:])
""", re.VERBOSE | re.DOTALL)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise ScriptTranslationError(
                f"untranslatable character at offset {pos}: "
                f"{src[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    return out


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t",
                                       "r": "\r"}.get(m.group(1),
                                                      m.group(1)), body)


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0
        self.param: str | None = None
        self.aliases: dict[str, str] = {}  # var name → Get field path

    # -- token helpers -------------------------------------------------
    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value: str):
        kind, tok = self.next()
        if tok != value:
            raise ScriptTranslationError(
                f"expected {value!r}, got {tok!r}")
        return tok

    def expect_name(self, value: str | None = None) -> str:
        kind, tok = self.next()
        if kind != "name" or (value is not None and tok != value):
            raise ScriptTranslationError(
                f"expected identifier {value or ''}, got {tok!r}")
        return tok

    # -- grammar -------------------------------------------------------
    def parse(self) -> list[dict]:
        self.expect_name("function")
        self.expect_name("process")
        self.expect("(")
        self.param = self.expect_name()
        self.expect(")")
        self.expect("{")
        procs = self.parse_stmts()
        self.expect("}")
        while self.peek()[1] == ";":
            self.next()
        if self.peek()[0] != "eof":
            raise ScriptTranslationError(
                f"trailing content after process(): {self.peek()[1]!r}")
        return procs

    def parse_stmts(self) -> list[dict]:
        procs: list[dict] = []
        while self.peek()[1] not in ("}", "") :
            procs.extend(self.parse_stmt())
        return _merge_adjacent(procs)

    def parse_stmt(self) -> list[dict]:
        kind, tok = self.peek()
        if tok == "if":
            return [self.parse_if()]
        if tok == "var" or tok == "let" or tok == "const":
            self.next()
            name = self.expect_name()
            self.expect("=")
            field = self.parse_get_expr()
            self.expect(";")
            if name in self.aliases:
                raise ScriptTranslationError(
                    f"alias {name!r} reassigned (single-assignment only)")
            self.aliases[name] = field
            return []
        if kind == "name" and tok == self.param:
            return self.parse_event_call()
        raise ScriptTranslationError(f"untranslatable statement at {tok!r}")

    def parse_get_expr(self) -> str:
        """``evt.Get("f")`` or a previously-bound alias → field path."""
        kind, tok = self.next()
        if kind == "name" and tok in self.aliases:
            return self.aliases[tok]
        if kind != "name" or tok != self.param:
            raise ScriptTranslationError(
                f"expected {self.param}.Get(...) or alias, got {tok!r}")
        self.expect(".")
        self.expect_name("Get")
        self.expect("(")
        field = self.parse_string()
        self.expect(")")
        return field

    def parse_string(self) -> str:
        kind, tok = self.next()
        if kind != "string":
            raise ScriptTranslationError(f"expected string, got {tok!r}")
        return _unquote(tok)

    def parse_literal(self):
        kind, tok = self.peek()
        if kind == "string":
            self.next()
            return _unquote(tok)
        if kind == "number":
            self.next()
            return float(tok) if "." in tok else int(tok)
        if kind == "name" and tok in ("true", "false", "null"):
            self.next()
            return {"true": True, "false": False, "null": None}[tok]
        if tok == "{":  # flat object literal
            self.next()
            obj = {}
            while self.peek()[1] != "}":
                kind1, tok1 = self.peek()
                if kind1 == "name":  # unquoted JS object key
                    self.next()
                    key = tok1
                else:
                    key = self.parse_string()
                kind2, tok2 = self.next()
                if tok2 != ":":
                    raise ScriptTranslationError(
                        f"expected ':' in object literal, got {tok2!r}")
                obj[key] = self.parse_literal()
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return obj
        raise ScriptTranslationError(f"untranslatable value {tok!r}")

    def parse_event_call(self) -> list[dict]:
        self.next()  # param
        self.expect(".")
        method = self.expect_name()
        self.expect("(")
        out: list[dict]
        if method == "Put":
            key = self.parse_string()
            self.expect(",")
            k, t = self.peek()
            if (k == "name"
                    and (t == self.param or t in self.aliases)):
                src = self.parse_get_expr()
                out = [{"copy_fields":
                        {"fields": [{"from": src, "to": key}]}}]
            else:
                val = self.parse_literal()
                out = [{"add_fields": {"fields": {key: val},
                                       "fields_under_root": True}}]
        elif method == "Rename":
            src = self.parse_string()
            self.expect(",")
            dst = self.parse_string()
            out = [{"rename": {"fields": [{"from": src, "to": dst}],
                               "ignore_missing": True}}]
        elif method == "Delete":
            out = [{"drop_fields": {"fields": [self.parse_string()]}}]
        elif method == "Tag":
            out = [{"add_tags": {"tags": [self.parse_string()]}}]
        elif method == "AppendTo":
            target = self.parse_string()
            if target != "tags":
                raise ScriptTranslationError(
                    "AppendTo is translatable only for 'tags'")
            self.expect(",")
            out = [{"add_tags": {"tags": [self.parse_string()]}}]
        elif method == "Cancel":
            out = [{"drop_event": {}}]
        else:
            raise ScriptTranslationError(
                f"event.{method} is outside the translatable subset")
        self.expect(")")
        self.expect(";")
        return out

    # conditions: or_expr > and_expr > unary > atom
    def parse_if(self) -> dict:
        self.expect_name("if")
        self.expect("(")
        cond = self.parse_or()
        self.expect(")")
        self.expect("{")
        then = self.parse_stmts()
        self.expect("}")
        entry: dict = {"if": cond, "then": then}
        if self.peek()[1] == "else":
            self.next()
            if self.peek()[1] == "if":
                entry["else"] = [self.parse_if()]
            else:
                self.expect("{")
                entry["else"] = self.parse_stmts()
                self.expect("}")
        return entry

    def parse_or(self) -> dict:
        parts = [self.parse_and()]
        while self.peek()[1] == "||":
            self.next()
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else {"or": parts}

    def parse_and(self) -> dict:
        parts = [self.parse_unary()]
        while self.peek()[1] == "&&":
            self.next()
            parts.append(self.parse_unary())
        return parts[0] if len(parts) == 1 else {"and": parts}

    def parse_unary(self) -> dict:
        if self.peek()[1] == "!":
            self.next()
            return {"not": self.parse_unary()}
        if self.peek()[1] == "(":
            self.next()
            cond = self.parse_or()
            self.expect(")")
            return cond
        return self.parse_atom()

    def parse_atom(self) -> dict:
        field = self.parse_get_expr()
        op = self.peek()[1]
        if op in ("===", "==", "!==", "!="):
            self.next()
            val = self.parse_literal()
            eq = {"equals": {field: val}}
            return eq if op in ("===", "==") else {"not": eq}
        # bare Get → truthiness = the field exists (the idiomatic
        # `if (evt.Get("x"))` null guard)
        return {"has_fields": [field]}


def _merge_adjacent(procs: list[dict]) -> list[dict]:
    """Fuse runs of root-level add_fields into one processor (fewer
    plan nodes; same semantics — later Puts win, like JS)."""
    out: list[dict] = []
    for p in procs:
        if (out and set(p) == {"add_fields"}
                and set(out[-1]) == {"add_fields"}
                and p["add_fields"].get("fields_under_root")
                and out[-1]["add_fields"].get("fields_under_root")):
            out[-1]["add_fields"]["fields"].update(p["add_fields"]["fields"])
        else:
            out.append(p)
    return out


def translate_script(source: str) -> list[dict]:
    """JS ``function process(event) {...}`` source → processor-config
    list consumable by ``build_pipeline`` / ``LogPipeline``. Raises
    :class:`ScriptTranslationError` on anything outside the subset."""
    return _Parser(_tokenize(source)).parse()
