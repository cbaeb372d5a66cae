"""User-defined Jinja macros for SQL-text models (X82, VERDICT r10
"What's missing" #1 / "Next round" item 2).

dbt projects ship ``{% macro name(args) %} ... {% endmacro %}`` files in
``macro-paths`` (the reference declares ``macro-paths: ["macros"]`` at
`/root/reference/dbt_project.yml:10`, directory shipped empty) and call
them from models as ``{{ name(arg, kw=val) }}``.  This module gives the
Jinja-lite renderer (core/sqlmodel.py) that surface by TEXT EXPANSION
with argument binding — the static subset real project macros
overwhelmingly are (cents_to_dollars-style expression helpers,
cross-database shims).  Everything dynamic stays out of scope and fails
loud, matching the module family's raise-don't-guess posture:

  * supported in a macro body: parameter substitutions ``{{ param }}``
    plus everything the model renderer already supports (ref, source,
    var, date_trunc, nested user macros up to a bounded depth)
  * supported as call arguments: string/number/bool/None literals,
    ``ref('x')`` / ``source('a','b')`` / ``var('x')`` calls (re-wrapped
    as Jinja for the downstream render), and bare ``this``
  * NOT supported (raises): control flow in bodies ({% if %}, {% for %}),
    ``return()``, set/do blocks, ``*args``/``**kwargs``, expressions as
    arguments, shadowing a built-in macro name

Expansion happens at REGISTRATION time, before dependency parsing — so
a ``ref()`` introduced by a macro body becomes a DAG edge exactly as if
it were written in the model file (dbt compiles the same way), and the
expanded text is what the model fingerprint hashes (a macro edit
re-fingerprints its users for slim-CI state:modified selection).
"""

from __future__ import annotations

import ast
import os
import re
from dataclasses import dataclass

# the Jinja-lite builtins a user macro must not shadow
BUILTIN_MACROS = frozenset({
    "ref", "source", "config", "var", "env_var", "this",
    "is_incremental", "date_trunc",
})

_MACRO_DEF_RE = re.compile(
    r"\{%-?\s*macro\s+([A-Za-z_]\w*)\s*\(([^()]*)\)\s*-?%\}(.*?)"
    r"\{%-?\s*endmacro\s*-?%\}",
    re.DOTALL)
_BODY_PARAM_RE_TMPL = r"\{{\{{\s*{param}\s*\}}\}}"
_CALL_OPEN_RE_TMPL = r"\{{\{{\s*{name}\s*\("
_WRAPPED_ARG_RE = re.compile(
    r"^(ref|source|var)\s*\(.*\)$|^this$", re.DOTALL)


@dataclass(frozen=True)
class Macro:
    name: str
    params: tuple[str, ...]
    defaults: dict          # param -> (rendered TEXT, raw source text)
    body: str


def _subst_in_jinja_spans(body: str, param: str, raw: str) -> str:
    """Replace bare-identifier occurrences of ``param`` INSIDE remaining
    ``{{ ... }}`` spans (i.e. as an argument of a nested macro/builtin
    call) with the caller's RAW argument text — quoted strings stay
    quoted for the inner call's own binding pass.  Quoted regions within
    a span are left alone (a string literal containing the param name is
    data, not a reference)."""
    ident = re.compile(rf"\b{re.escape(param)}\b")
    # alternating segments: quoted strings pass through, unquoted text
    # gets the identifier substitution
    seg = re.compile(r"'[^']*'|\"[^\"]*\"")

    def fix_span(m: re.Match) -> str:
        span, out, pos = m.group(0), [], 0
        for q in seg.finditer(span):
            out.append(ident.sub(lambda _m: raw, span[pos:q.start()]))
            out.append(q.group(0))
            pos = q.end()
        out.append(ident.sub(lambda _m: raw, span[pos:]))
        return "".join(out)

    return re.sub(r"\{\{.*?\}\}", fix_span, body, flags=re.DOTALL)


def _literal_text(value) -> str:
    """A Python literal -> the text dbt's renderer would emit for it:
    strings render as their CONTENT (no quotes — the model text supplies
    its own, ``'{{ var("status") }}'`` style), everything else as repr.
    """
    if isinstance(value, str):
        return value
    return repr(value)


def parse_macro_text(text: str, origin: str = "<text>") -> dict[str, Macro]:
    """Every ``{% macro %}`` block in one file.  Non-macro content
    outside blocks is ignored (dbt allows comments/whitespace);
    a block with unparseable parameters raises."""
    out: dict[str, Macro] = {}
    # fail-loud guard (review r12): a `{% macro %}` opener the full
    # definition regex cannot consume (e.g. parentheses inside a default
    # value) must raise here, not vanish — the alternative is a macro
    # that silently never registers and a misleading leftover-Jinja
    # error at some call site later
    # ...but only openers OUTSIDE already-matched definition spans count
    # (ADVICE r11): a macro whose BODY legitimately contains the literal
    # text `{% macro` (docs, a commented-out definition) is a file dbt
    # accepts — the guard is for openers the parser left dangling.
    spans = [m.span() for m in _MACRO_DEF_RE.finditer(text)]
    dangling = [o.start() for o in re.finditer(r"\{%-?\s*macro\b", text)
                if not any(a <= o.start() < b for a, b in spans)]
    if dangling:
        raise ValueError(
            f"{origin}: {len(dangling)} {{% macro %}} definition(s) "
            "could not be parsed — supported signatures are "
            "comma-separated names with literal defaults containing no "
            "parentheses")
    for m in _MACRO_DEF_RE.finditer(text):
        name, sig, body = m.group(1), m.group(2).strip(), m.group(3)
        if name in BUILTIN_MACROS:
            raise ValueError(
                f"{origin}: macro {name!r} shadows a built-in — rename it")
        params: list[str] = []
        defaults: dict = {}
        if sig:
            for raw in sig.split(","):
                raw = raw.strip()
                if not raw:
                    continue
                if raw.startswith("*"):
                    raise ValueError(
                        f"{origin}: macro {name!r}: varargs ({raw!r}) are "
                        "unsupported — name every parameter")
                if "=" in raw:
                    pname, dflt = raw.split("=", 1)
                    pname, dflt = pname.strip(), dflt.strip()
                    try:
                        defaults[pname] = (
                            _literal_text(ast.literal_eval(dflt)), dflt)
                    except (ValueError, SyntaxError):
                        raise ValueError(
                            f"{origin}: macro {name!r}: default for "
                            f"{pname!r} must be a literal, got {dflt!r}"
                            ) from None
                else:
                    pname = raw
                if not re.fullmatch(r"[A-Za-z_]\w*", pname):
                    raise ValueError(
                        f"{origin}: macro {name!r}: bad parameter {raw!r}")
                params.append(pname)
        if re.search(r"\{%-?\s*(if|for|set|do|call)\b", body):
            raise ValueError(
                f"{origin}: macro {name!r}: control flow in macro bodies "
                "is unsupported — only parameter substitution expands")
        if name in out:
            raise ValueError(f"{origin}: duplicate macro {name!r}")
        out[name] = Macro(name, tuple(params), defaults, body.strip())
    return out


def load_macro_dirs(dirs: list[str]) -> dict[str, Macro]:
    """All macros from every ``*.sql`` under the given macro-paths —
    dbt's flat project-wide macro namespace (a name collision across
    files is an error there too)."""
    macros: dict[str, Macro] = {}
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for dirpath, _dn, fns in sorted(os.walk(d)):
            for f in sorted(fns):
                if not f.endswith(".sql"):
                    continue
                path = os.path.join(dirpath, f)
                with open(path) as fh:
                    new = parse_macro_text(fh.read(), origin=path)
                dup = set(new) & set(macros)
                if dup:
                    raise ValueError(
                        f"{path}: macros {sorted(dup)} already defined "
                        "elsewhere in macro-paths")
                macros.update(new)
    return macros


def _split_args(argtext: str) -> list[str]:
    """Split a call's argument text at top-level commas, respecting
    quotes and nested parens."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in argtext:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _arg_text(raw: str, macro: str) -> str:
    """One call argument -> its replacement text.  Literals render as
    their value; ref()/source()/var() calls and bare ``this`` re-wrap
    as Jinja so the downstream model render resolves them; anything
    else (arithmetic, names, nested macro calls) raises."""
    try:
        return _literal_text(ast.literal_eval(raw))
    except (ValueError, SyntaxError):
        pass
    if _WRAPPED_ARG_RE.fullmatch(raw.strip()):
        return "{{ " + raw.strip() + " }}"
    raise ValueError(
        f"macro {macro!r}: unsupported argument {raw!r} — pass a "
        "literal, ref()/source()/var(), or this")


def expand_macros(sql_text: str, macros: dict[str, Macro] | None,
                  max_depth: int = 10) -> str:
    """Expand every known-macro call site in ``sql_text``; macros may
    call macros (bodies re-scan each pass) up to ``max_depth`` passes,
    after which a still-expanding text raises (recursion guard).
    Unknown ``{{ name(...) }}`` constructs are left untouched — the
    model renderer's leftover-Jinja check raises on them with its
    standard message, so an unregistered macro still fails loud."""
    if not macros:
        return sql_text
    for _ in range(max_depth):
        changed = False
        for name, mac in macros.items():
            pat = re.compile(_CALL_OPEN_RE_TMPL.format(name=re.escape(name)))
            # scan position advances PAST each inserted body within a
            # pass — a call the expansion itself re-introduces waits for
            # the NEXT pass, so max_depth genuinely bounds recursion
            # (review r12: a self-recursive macro `{% macro r(x) %}
            # {{ r(x) }}{% endmacro %}` hung forever because re-searching
            # from the start re-matched the call just inserted)
            scan_from = 0
            while True:
                m = pat.search(sql_text, scan_from)
                if not m:
                    break
                # balanced-paren scan for the call's closing paren
                depth, k, quote = 1, m.end(), None
                while k < len(sql_text) and depth:
                    ch = sql_text[k]
                    if quote:
                        if ch == quote:
                            quote = None
                    elif ch in "'\"":
                        quote = ch
                    elif ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                    k += 1
                close = re.match(r"\s*\}\}", sql_text[k:])
                if depth or not close:
                    raise ValueError(
                        f"unterminated macro call {name!r} in SQL text")
                args = _split_args(sql_text[m.end():k - 1])
                bound = dict(mac.defaults)
                pos = 0
                for a in args:
                    kw = re.match(r"([A-Za-z_]\w*)\s*=(?!=)(.*)", a,
                                  re.DOTALL)
                    if kw and kw.group(1) in mac.params:
                        raw_a = kw.group(2).strip()
                        bound[kw.group(1)] = (_arg_text(raw_a, name), raw_a)
                    else:
                        if pos >= len(mac.params):
                            raise ValueError(
                                f"macro {name!r}: too many arguments "
                                f"({len(args)} given, "
                                f"{len(mac.params)} declared)")
                        bound[mac.params[pos]] = (_arg_text(a, name),
                                                  a.strip())
                        pos += 1
                missing = [p for p in mac.params if p not in bound]
                if missing:
                    raise ValueError(
                        f"macro {name!r}: missing arguments {missing}")
                body = mac.body
                for p, (v, raw) in bound.items():
                    # lambda replacement: the bound text is literal, never
                    # re-interpreted for \g<...> escapes
                    body = re.sub(
                        _BODY_PARAM_RE_TMPL.format(param=re.escape(p)),
                        lambda _m, _v=v: _v, body)
                    # a param used as an argument of a NESTED call
                    # ({{ other_macro(p) }}) substitutes its RAW call
                    # text, so string args stay quoted for the inner
                    # binding pass
                    body = _subst_in_jinja_spans(body, p, raw)
                sql_text = (sql_text[:m.start()] + body
                            + sql_text[k + close.end():])
                scan_from = m.start() + len(body)
                changed = True
        if not changed:
            return sql_text
    raise ValueError(
        f"macro expansion did not terminate in {max_depth} passes — "
        "recursive macros?")


def run_operation(spark, macros: dict[str, Macro], name: str,
                  args: dict | None = None,
                  relations: dict | None = None):
    """``dbt run-operation`` analog (X89 [public dbt surface: dbt
    run-operation — invoke a macro standalone, outside any model]):
    expand macro ``name`` with ``args`` (literals only, like any call
    site), bind every ref()/source() the expansion names to the given
    ``relations`` as temp views, and run the resulting SQL via
    ``spark.sql``.  Returns the result DataFrame.

    dbt uses run-operation for maintenance SQL (grants, manual fixes,
    vacuum-style jobs); the Spark twin returns the statement's result
    so callers can act on it.  A macro that expands to something other
    than one runnable statement fails in Spark's parser — loud, as
    intended."""
    from .sqlmodel import parse_deps, render_sql

    if name not in macros:
        raise ValueError(f"run-operation: unknown macro {name!r} "
                         f"(defined: {sorted(macros)})")
    call_args = ", ".join(
        f"{k}={v!r}" for k, v in (args or {}).items())
    text = expand_macros("{{ %s(%s) }}" % (name, call_args), macros)
    deps = parse_deps(text)
    relations = relations or {}
    missing = [d for d in deps if d not in relations]
    if missing:
        raise ValueError(
            f"run-operation {name!r}: macro references {missing} but "
            "no such relations were passed")
    views = {d: f"__runop_{name}_{d}" for d in deps}
    for d, v in views.items():
        relations[d].createOrReplaceTempView(v)
    try:
        out = spark.sql(render_sql(text, views))
        out.schema  # force analysis before the views drop
        return out
    finally:
        for v in views.values():
            spark.catalog.dropTempView(v)
