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

import re
from fnmatch import fnmatchcase

from .model import ModelRegistry

_ATOM = re.compile(r"^(?P<up>(?:\d+)?\+)?(?P<base>@?[^+@]+?)(?P<down>\+(?:\d+)?)?$")


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


def _match_base(registry: ModelRegistry, base: str) -> set[str]:
    """Resolve a non-graph atom body to a model set."""
    if base.startswith("tag:"):
        pat = base[4:]
        return {n for n in registry.names()
                if any(fnmatchcase(t, pat) for t in registry[n].tags)}
    if base.startswith("source:"):
        pat = base[7:]
        return {n for n in registry.names()
                if any(d not in registry and fnmatchcase(d, pat)
                       for d in registry[n].deps)}
    return {n for n in registry.names() if fnmatchcase(n, base)}


def _eval_atom(registry: ModelRegistry, atom: str,
               parents: dict[str, set[str]],
               kids: dict[str, set[str]]) -> set[str]:
    m = _ATOM.match(atom)
    if not m:
        raise ValueError(f"unparseable selector atom: {atom!r}")
    base = m.group("base")
    if base.startswith("@"):
        if m.group("up") or m.group("down"):
            raise ValueError(f"@ cannot combine with +: {atom!r}")
        hit = _match_base(registry, base[1:])
        down = _walk(hit, kids, None)
        return _walk(down, parents, None)
    hit = _match_base(registry, base)
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
               kids: dict[str, set[str]]) -> set[str]:
    """One space-separated spec: comma-intersection of atoms."""
    out: set[str] | None = None
    for atom in spec.split(","):
        got = _eval_atom(registry, atom.strip(), parents, kids)
        out = got if out is None else out & got
    return out or set()


def select_nodes(registry: ModelRegistry, select: str | None,
                 exclude: str | None = None) -> list[str]:
    """Evaluate a selection string against the registry's DAG; returns the
    selected model names in registry order.  ``select=None`` starts from
    every model (the ``dbt run`` default) — useful with ``exclude``."""
    kids = _children(registry)
    parents = {n: {d for d in registry[n].deps if d in registry}
               for n in registry.names()}
    if select is None:
        chosen = set(registry.names())
    else:
        chosen = set()
        for spec in select.split():
            got = _eval_spec(registry, spec, parents, kids)
            if not got:
                raise ValueError(
                    f"selector {spec!r} matched no models "
                    f"(registry: {sorted(registry.names())})")
            chosen |= got
    if exclude:
        for spec in exclude.split():
            chosen -= _eval_spec(registry, spec, parents, kids)
    return [n for n in registry.names() if n in chosen]
