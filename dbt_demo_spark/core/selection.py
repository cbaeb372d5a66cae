"""dbt node-selection syntax for the Runner — the ``--select`` /
``--exclude`` graph language [public knowledge: dbt-core node selection
docs; the reference project is run with plain ``dbt run``, README.md:50,
but every real deployment drives it with selectors].

Supported grammar (the dbt core subset):

  * ``model_name``        — that model (fnmatch wildcards allowed: ``stg_*``)
  * ``+model``            — model plus all ancestors
  * ``model+``            — model plus all descendants
  * ``+model+``           — both
  * ``2+model`` / ``model+2`` — hop-limited ancestors / descendants
  * ``@model``            — model, its descendants, and ALL ancestors of
                            those descendants (the "build everything the
                            children need" operator)
  * ``tag:nightly``       — models carrying the tag (wildcards allowed)
  * ``source:raw_loans``  — models reading the source directly (graph
                            suffixes allowed: ``source:raw_loans+``)
  * ``state:modified``    — models whose CODE changed vs a saved state
                            (new models count as modified, like dbt);
                            ``state:new`` — only the new ones.  The dbt
                            slim-CI workflow [public knowledge: dbt
                            state method / defer]: save the green
                            build's state (``save_state``), select
                            ``state:modified+`` on the next run.
                            Requires ``state=`` (a ``load_state`` dict);
                            graph suffixes compose (``state:modified+``)
  * ``a b``               — union of specs
  * ``a,b``               — intersection of specs
  * ``--exclude``         — same grammar, subtracted after selection

Selection yields the TARGET set; the Runner still builds any unselected
ancestors a target needs (registry.topo_order's upstream closure), the
same way ``dbt run -s model`` assumes parents exist — here we rebuild
them instead of deferring, which is the safe default for an in-memory
view layer (an unbuilt upstream VIEW cannot be read from the warehouse).

A spec that matches nothing raises ValueError — a typo'd selector
silently running zero models is how production refreshes get skipped.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from dataclasses import dataclass
from fnmatch import fnmatchcase

from .model import ModelRegistry

_ATOM = re.compile(r"^(?P<up>(?:\d+)?\+)?(?P<base>@?[^+@]+?)(?P<down>\+(?:\d+)?)?$")


def node_code_state(registry: ModelRegistry) -> dict[str, str | None]:
    """CODE-level fingerprint per model — what ``state:modified`` compares
    (dbt's manifest diff): fn source (SQL text for sql_model nodes),
    materialization params, contract, hooks, deps, tags.  No data stamps —
    this is "did the project change", not "did the inputs change" (that
    is refresh='changed').  ``None`` = unsourceable fn — always treated
    as modified, never guessed."""
    out: dict[str, str | None] = {}
    for name in registry.names():
        m = registry[name]
        parts = [name, m.materialized, ",".join(m.partition_by),
                 ",".join(m.bucket_by), str(m.n_buckets), m.watermark_col,
                 m.incremental_strategy, ",".join(m.unique_key),
                 ",".join(m.zorder_by), str(m.zorder_files),
                 ",".join("=".join(c) for c in m.contract),
                 ",".join(m.deps), ",".join(sorted(m.tags)),
                 # r13: EVERY materialization-affecting field counts as
                 # code — a changed fold spec / schema policy /
                 # microbatch window is a modified node (mirrors the
                 # runner's build-state fingerprint)
                 ",".join(f"{c}={fn}" for c, fn in m.combine),
                 m.on_schema_change, m.event_time, m.batch_size,
                 str(m.lookback), m.begin]
        try:
            parts.append(inspect.getsource(m.fn))
            parts.append(getattr(m.fn, "__sql_text__", ""))
            for h in (*m.pre_hook, *m.post_hook):
                parts.append("hook:" + (h if isinstance(h, str)
                                        else inspect.getsource(h)))
        except (OSError, TypeError):
            out[name] = None
            continue
        out[name] = hashlib.sha1("\x1e".join(parts).encode()).hexdigest()
    return out


def save_state(registry: ModelRegistry, path: str) -> None:
    """Persist the project's code state (atomic replace) — run after a
    green build; the next CI run selects ``state:modified+`` against it."""
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"nodes": node_code_state(registry)}, fh, indent=1)
    os.replace(tmp, path)


def load_state(path: str) -> dict[str, str | None]:
    with open(path) as fh:
        return json.load(fh)["nodes"]


def _children(registry: ModelRegistry) -> dict[str, set[str]]:
    kids: dict[str, set[str]] = {n: set() for n in registry.names()}
    for n in registry.names():
        for d in registry[n].deps:
            if d in registry:
                kids[d].add(n)
    return kids


def _walk(start: set[str], edges: dict[str, set[str]],
          depth: int | None) -> set[str]:
    """BFS closure over ``edges`` from ``start``, to ``depth`` hops
    (None = unbounded).  Returns start plus everything reached."""
    seen = set(start)
    frontier = set(start)
    hops = 0
    while frontier and (depth is None or hops < depth):
        frontier = {m for n in frontier for m in edges.get(n, ())} - seen
        seen |= frontier
        hops += 1
    return seen


def _match_base(registry: ModelRegistry, base: str,
                state: dict[str, str | None] | None = None,
                owners: dict[str, str] | None = None) -> set[str]:
    """Resolve a non-graph atom body to a model set."""
    if base.startswith("package:"):
        # X92 [public dbt surface: package selector method] — models by
        # OWNING project; the map comes from port_dbt_project
        # (PortedProject.owner_of).  Raising without it beats matching
        # nothing: a package: selector on a registry with no package
        # provenance is a caller error, not an empty set.
        pat = base[len("package:"):]
        if owners is None:
            raise ValueError(
                f"selector {base!r} needs owners= "
                "(PortedProject.owner_of — which project registered "
                "each model)")
        return {n for n in registry.names()
                if fnmatchcase(owners.get(n, ""), pat)}
    if base.startswith("tag:"):
        pat = base[4:]
        return {n for n in registry.names()
                if any(fnmatchcase(t, pat) for t in registry[n].tags)}
    if base.startswith("source:"):
        pat = base[7:]
        return {n for n in registry.names()
                if any(d not in registry and fnmatchcase(d, pat)
                       for d in registry[n].deps)}
    if base.startswith("state:"):
        method = base[6:]
        if method not in ("modified", "new"):
            raise ValueError(f"unknown state method {base!r}: "
                             "expected state:modified or state:new")
        if state is None:
            raise ValueError(f"selector {base!r} needs state= (a saved "
                             "node-state dict, selection.load_state)")
        now = node_code_state(registry)
        new = {n for n in now if n not in state}
        if method == "new":
            return new
        # modified = new, hash-diverged, or unsourceable on either side
        return new | {n for n, h in now.items() if n in state
                      and (h is None or state[n] is None or h != state[n])}
    return {n for n in registry.names() if fnmatchcase(n, base)}


def _eval_atom(registry: ModelRegistry, atom: str,
               parents: dict[str, set[str]],
               kids: dict[str, set[str]],
               state: dict[str, str | None] | None = None,
               owners: dict[str, str] | None = None) -> set[str]:
    m = _ATOM.match(atom)
    if not m:
        raise ValueError(f"unparseable selector atom: {atom!r}")
    base = m.group("base")
    if base.startswith("@"):
        if m.group("up") or m.group("down"):
            raise ValueError(f"@ cannot combine with +: {atom!r}")
        hit = _match_base(registry, base[1:], state, owners)
        down = _walk(hit, kids, None)
        return _walk(down, parents, None)
    hit = _match_base(registry, base, state, owners)
    out = set(hit)
    if m.group("up"):
        d = m.group("up")[:-1]
        out |= _walk(hit, parents, int(d) if d else None)
    if m.group("down"):
        d = m.group("down")[1:]
        out |= _walk(hit, kids, int(d) if d else None)
    return out


def _eval_spec(registry: ModelRegistry, spec: str,
               parents: dict[str, set[str]],
               kids: dict[str, set[str]],
               state: dict[str, str | None] | None = None,
               owners: dict[str, str] | None = None) -> set[str]:
    """One space-separated spec: comma-intersection of atoms."""
    out: set[str] | None = None
    for atom in spec.split(","):
        got = _eval_atom(registry, atom.strip(), parents, kids, state,
                         owners)
        out = got if out is None else out & got
    return out or set()


def select_nodes(registry: ModelRegistry, select: str | None,
                 exclude: str | None = None,
                 state: dict[str, str | None] | None = None,
                 owners: dict[str, str] | None = None) -> list[str]:
    """Evaluate a selection string against the registry's DAG; returns the
    selected model names in registry order.  ``select=None`` starts from
    every model (the ``dbt run`` default) — useful with ``exclude``.
    ``state`` feeds ``state:modified`` / ``state:new`` atoms
    (``load_state``'s dict)."""
    kids = _children(registry)
    parents = {n: {d for d in registry[n].deps if d in registry}
               for n in registry.names()}
    if select is None:
        chosen = set(registry.names())
    else:
        chosen = set()
        for spec in select.split():
            got = _eval_spec(registry, spec, parents, kids, state,
                             owners)
            if not got:
                # a typo'd selector silently running zero models is how
                # production refreshes get skipped; an EMPTY state
                # selection is the opposite — slim CI's "nothing
                # changed, build nothing" success case.  Empty is only
                # OK when attributable to a state atom: every NON-state
                # atom must still match something on its own (ADVICE r9 —
                # 'typo_model,state:modified' must raise, not skip).
                atoms = [a.strip() for a in spec.split(",")]
                for atom in atoms:
                    if "state:" in atom:
                        continue
                    if not _eval_atom(registry, atom, parents, kids,
                                      state, owners):
                        raise ValueError(
                            f"selector atom {atom!r} in {spec!r} matched "
                            f"no models "
                            f"(registry: {sorted(registry.names())})")
                if not any("state:" in a for a in atoms):
                    raise ValueError(
                        f"selector {spec!r} matched no models "
                        f"(registry: {sorted(registry.names())})")
            chosen |= got
    if exclude:
        for spec in exclude.split():
            chosen -= _eval_spec(registry, spec, parents, kids, state,
                                 owners)
    return [n for n in registry.names() if n in chosen]


# ------------------------------------------------ YAML selectors (X86) --

# dbt selectors.yml [public knowledge: dbt-core YAML selectors] — named,
# composable selection definitions.  A definition is one of:
#   * a STRING in the CLI grammar above ("tag:nightly stg_*+")
#   * {method:, value:, parents:, children:, parents_depth:,
#      children_depth:, childrens_parents:} — one method atom with
#     graph modifiers (methods supported: fqn, tag, source, state)
#   * {union: [defn, ...]} / {intersection: [defn, ...]} — members
#     combine in order; a member {exclude: [defn, ...]} SUBTRACTS its
#     matches from the set built so far (dbt's exclude-inside-a-set)
# Unknown methods and keys raise — a selector that silently selects the
# wrong set is how production refreshes skip nodes.

_METHOD_KEYS = {"method", "value", "parents", "children", "parents_depth",
                "children_depth", "childrens_parents"}
_SELECTOR_METHODS = {"fqn", "tag", "source", "state", "package"}


@dataclass(frozen=True)
class SelectorBook:
    """Parsed selectors.yml: named definitions plus the default (the one
    flagged ``default: true``, if any)."""
    selectors: dict
    default: str | None = None


def load_selectors(path: str) -> SelectorBook:
    """Parse a dbt ``selectors.yml``.  Each entry needs ``name`` and
    ``definition``; at most one may carry ``default: true``."""
    import yaml

    with open(path) as fh:
        doc = yaml.safe_load(fh) or {}
    out: dict = {}
    default = None
    for entry in doc.get("selectors", []) or []:
        if not isinstance(entry, dict) or "name" not in entry \
                or "definition" not in entry:
            raise ValueError(
                f"selectors.yml: entry {entry!r} needs name: and "
                "definition:")
        name = entry["name"]
        if name in out:
            raise ValueError(f"selectors.yml: duplicate selector {name!r}")
        out[name] = entry["definition"]
        if entry.get("default"):
            if default is not None:
                raise ValueError(
                    f"selectors.yml: both {default!r} and {name!r} claim "
                    "default: true")
            default = name
    return SelectorBook(out, default)


def _method_atom(defn: dict) -> str:
    unknown = set(defn) - _METHOD_KEYS
    if unknown:
        raise ValueError(
            f"selector method block has unknown keys {sorted(unknown)} "
            f"(supported: {sorted(_METHOD_KEYS)})")
    method, value = defn.get("method"), defn.get("value")
    if method not in _SELECTOR_METHODS:
        raise ValueError(
            f"unsupported selector method {method!r} "
            f"(supported: {sorted(_SELECTOR_METHODS)})")
    if not isinstance(value, str) or not value:
        raise ValueError(f"selector method {method!r} needs a value:")
    atom = value if method == "fqn" else f"{method}:{value}"
    if defn.get("childrens_parents"):
        if any(defn.get(k) for k in ("parents", "children",
                                     "parents_depth", "children_depth")):
            raise ValueError(
                "childrens_parents (@) cannot combine with "
                "parents/children modifiers")
        return "@" + atom
    up = down = ""
    if defn.get("parents") or "parents_depth" in defn:
        up = (str(defn["parents_depth"]) if "parents_depth" in defn
              else "") + "+"
    if defn.get("children") or "children_depth" in defn:
        down = "+" + (str(defn["children_depth"])
                      if "children_depth" in defn else "")
    return up + atom + down


def _eval_definition(registry: ModelRegistry, defn,
                     parents: dict[str, set[str]],
                     kids: dict[str, set[str]],
                     state: dict[str, str | None] | None,
                     owners: dict[str, str] | None = None) -> set[str]:
    if isinstance(defn, str):
        out: set[str] = set()
        for spec in defn.split():
            out |= _eval_spec(registry, spec, parents, kids, state,
                              owners)
        return out
    if not isinstance(defn, dict):
        raise ValueError(f"unparseable selector definition: {defn!r}")
    if "union" in defn or "intersection" in defn:
        if len(defn) != 1:
            raise ValueError(
                f"a set block holds exactly one of union:/intersection:, "
                f"got {sorted(defn)}")
        key = "union" if "union" in defn else "intersection"
        # exclude members subtract AFTER all the other members combine
        # (dbt semantics; review r12 — applying them positionally kept
        # an excluded node when a later member re-matched it, and an
        # exclude-first intersection seeded acc with the empty set)
        acc: set[str] | None = None
        ex: set[str] = set()
        for mbr in defn[key] or []:
            if isinstance(mbr, dict) and set(mbr) == {"exclude"}:
                for e in mbr["exclude"] or []:
                    ex |= _eval_definition(registry, e, parents, kids,
                                           state, owners)
                continue
            got = _eval_definition(registry, mbr, parents, kids, state,
                                   owners)
            if acc is None:
                acc = got
            elif key == "union":
                acc |= got
            else:
                acc &= got
        return (acc or set()) - ex
    if "exclude" in defn:
        raise ValueError(
            "exclude: is only valid as a member of a union:/intersection:"
            " list — a bare exclude has nothing to subtract from")
    return _eval_atom(registry, _method_atom(defn), parents, kids, state,
                      owners)


def _mentions_state(defn) -> bool:
    if isinstance(defn, str):
        return "state:" in defn
    if isinstance(defn, dict):
        if defn.get("method") == "state":
            return True
        return any(_mentions_state(v) for v in defn.values())
    if isinstance(defn, list):
        return any(_mentions_state(v) for v in defn)
    return False


def eval_selector(registry: ModelRegistry, book: SelectorBook,
                  name: str | None = None,
                  state: dict[str, str | None] | None = None,
                  owners: dict[str, str] | None = None) -> list[str]:
    """Evaluate a named selector (or the book's default) to the target
    list ``Runner.run(select=...)`` takes.  An empty result raises
    unless the definition involves ``state:`` — slim CI's "nothing
    changed, build nothing" is the one legitimate empty selection
    (mirrors select_nodes' typo guard)."""
    if name is None:
        name = book.default
        if name is None:
            raise ValueError("no selector name given and selectors.yml "
                             "marks no default: true")
    if name not in book.selectors:
        raise ValueError(f"unknown selector {name!r} "
                         f"(defined: {sorted(book.selectors)})")
    defn = book.selectors[name]
    kids = _children(registry)
    parents = {n: {d for d in registry[n].deps if d in registry}
               for n in registry.names()}
    chosen = _eval_definition(registry, defn, parents, kids, state,
                              owners)
    if not chosen and not _mentions_state(defn):
        raise ValueError(
            f"selector {name!r} matched no models "
            f"(registry: {sorted(registry.names())})")
    return [n for n in registry.names() if n in chosen]


def ls(registry: ModelRegistry, select: str | None = None,
       exclude: str | None = None,
       state: dict[str, str | None] | None = None,
       owners: dict[str, str] | None = None) -> list[dict]:
    """``dbt ls`` analog (X89 [public dbt surface: dbt list]): the
    selected nodes with their manifest-ish facts, in registry order —
    what CI scripts parse to see what a selector WOULD touch without
    building anything."""
    out = []
    for n in select_nodes(registry, select, exclude, state=state,
                          owners=owners):
        m = registry[n]
        out.append({
            "name": n, "materialized": m.materialized,
            "deps": list(m.deps), "tags": list(m.tags),
            "group": m.group, "access": m.access or "protected",
            "has_tests": bool(m.tests),
        })
    return out
