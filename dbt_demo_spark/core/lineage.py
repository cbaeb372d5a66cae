"""Column-level lineage from Catalyst analyzed plans.

The reference repo exists to feed a metadata/lineage platform: its README
walks `dbt docs generate` + ingestion so the models' dependency graph and
the deliberate fan-out bug can be traced in a lineage UI (reference:
README.md, docs/bug-analysis.md).  Table-level lineage ships here as
`ModelRegistry.manifest()`; this module adds the COLUMN-level edges —
which output columns of each model derive from which columns of its refs
— the way the OpenLineage/Spline agents do it [public knowledge]: walk
the ANALYZED logical plan, where every attribute carries a globally
unique exprId, and fold attribute provenance bottom-up.

Why the analyzed (not optimized) plan: analysis resolves names to
exprIds but hasn't collapsed projections yet, so the mapping from the
model's declared outputs to its ref columns is still syntactic — the
lineage a human reads in the model source.

Cost: pure driver-side plan analysis.  Nothing is executed, collected,
or scanned — at 100 TB this costs the same milliseconds it costs here.

Provenance folding rules:
  * pass-through nodes (Filter / Join / Sort / SubqueryAlias / ...) keep
    exprIds, so they need no handling at all;
  * `Alias` is the ONLY way Catalyst mints a new id for a computed
    column (Project / Aggregate / Window expression lists) — map the new
    id to the union of its referenced ids' provenance;
  * `Union` output ids map positionally over all children;
  * `Generate` (explode/posexplode) output ids map to the generator's
    references;
  * `Expand` (CUBE / ROLLUP / grouping sets) output ids map to the union
    of the column's slot across all projection rows.
Reference leaves are the model's REF relations: their output ids anchor
the fold, so provenance stops at (ref_name, column) — dep-relative, the
grain the manifest's table-level edges compose over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

Provenance = dict[str, list[tuple[str, str]]]   # out col -> [(ref, col)]


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _refs(expr) -> list[int]:
    """exprIds referenced by a Catalyst expression."""
    return [a.exprId().id() for a in _seq(expr.references().toSeq())]


def _collect_aliases(expr, out: list) -> None:
    """Aliases in an expression tree (top-level in project/agg/window
    lists, but a CreateStruct(Alias(...)) nests them one level down)."""
    if expr.getClass().getSimpleName() == "Alias":
        out.append(expr)
    for ch in _seq(expr.children()):
        _collect_aliases(ch, out)


def column_lineage(df: DataFrame, inputs: dict[str, DataFrame]) -> Provenance:
    """Map every output column of ``df`` to the ``inputs`` columns it
    derives from (expression references, the OpenLineage notion of
    derivation — a filter on a column does not make it a parent of every
    output).  Columns built purely from literals map to ``[]``.

    ``inputs`` must be the SAME DataFrame objects the plan was built from.
    Anchoring is by CANONICALIZED subtree match, not raw exprId: when a
    model self-joins a ref (the reference's fan-out bug does exactly
    this), Catalyst's DeduplicateRelations re-mints one side's exprIds,
    so id-anchoring silently loses that branch — canonicalization erases
    ids, so the re-minted subtree still matches its ref, and the walk
    stops at the ref boundary (dep-relative provenance, the grain the
    manifest's table edges compose over)."""
    canon: dict[str, list[tuple[str, list[str]]]] = {}
    for ref_name, src in inputs.items():
        p = src._jdf.queryExecution().analyzed()
        cols = [a.name() for a in _seq(p.output())]
        canon.setdefault(p.canonicalized().toString(),
                         []).append((ref_name, cols))

    prov: dict[int, set[tuple[str, str]]] = {}

    def resolve(ids: list[int]) -> set[tuple[str, str]]:
        out: set[tuple[str, str]] = set()
        for i in ids:
            out |= prov.get(i, set())
        return out

    def visit(node) -> None:
        matches = canon.get(node.canonicalized().toString())
        if matches:
            # ref boundary: anchor this subtree's outputs positionally
            # (two identical refs both claim the columns) and stop
            for attr_i, attr in enumerate(_seq(node.output())):
                prov[attr.exprId().id()] = {
                    (ref_name, cols[attr_i]) for ref_name, cols in matches}
            return
        for child in _seq(node.children()):
            visit(child)
        cls = node.getClass().getSimpleName()
        if cls == "Union":
            kids = _seq(node.children())
            for i, attr in enumerate(_seq(node.output())):
                merged: set[tuple[str, str]] = set()
                for k in kids:
                    merged |= resolve([_seq(k.output())[i].exprId().id()])
                prov[attr.exprId().id()] = merged
        elif cls == "Generate":
            gen_refs = _refs(node.generator())
            for attr in _seq(node.generatorOutput()):
                prov[attr.exprId().id()] = resolve(gen_refs)
        elif cls == "Expand":
            rows = [_seq(r) for r in _seq(node.projections())]
            for i, attr in enumerate(_seq(node.output())):
                merged = set()
                for row in rows:
                    merged |= resolve(_refs(row[i]))
                prov[attr.exprId().id()] = merged
        aliases: list = []
        for e in _seq(node.expressions()):
            _collect_aliases(e, aliases)
        for a in aliases:
            prov[a.exprId().id()] = resolve(_refs(a))

    plan = df._jdf.queryExecution().analyzed()
    visit(plan)
    return {attr.name(): sorted(prov.get(attr.exprId().id(), set()))
            for attr in _seq(plan.output())}


def registry_column_lineage(registry, sources: dict[str, DataFrame]) -> dict:
    """Column-level lineage for every model in a registry — the
    ``manifest()`` companion a lineage platform ingests.  Builds each
    model's LOGICAL plan from its refs in topo order (views only — no
    materialization, no Spark jobs) and extracts dep-relative column
    edges; composing them along the manifest's table edges yields
    source-to-mart column paths.

    Returns ``{model: {column: [[ref, column], ...]}}`` (JSON-able)."""
    relations: dict[str, DataFrame] = dict(sources)
    out: dict[str, dict[str, list[list[str]]]] = {}
    for name in registry.topo_order():
        mdef = registry[name]
        refs = {d: relations[d] for d in mdef.deps}
        try:
            df = mdef.fn(refs)
        except TypeError:
            from .model import IncrementalContext

            df = mdef.fn(refs, IncrementalContext(is_incremental=False))
        lin = column_lineage(df, refs)
        out[name] = {c: [list(p) for p in parents]
                     for c, parents in lin.items()}
        relations[name] = df
    return out


def manifest_with_lineage(registry, sources: dict[str, DataFrame]) -> dict:
    """``ModelRegistry.manifest()`` with each node's column-level edges
    attached under ``columns`` — the ONE document a lineage platform
    ingests (table edges, exposures, AND column provenance together).
    Pure plan analysis on top of the static manifest; no jobs."""
    man = registry.manifest()
    cols = registry_column_lineage(registry, sources)
    for name, lin in cols.items():
        man["nodes"][name]["columns"] = lin
    return man
