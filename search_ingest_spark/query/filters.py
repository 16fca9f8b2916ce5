"""Filter-context spec shared by the Spark and serving query paths.

ES bool-query *filter context* (non-scoring) over the doc_attrs table,
as one Python dict per query — the shape ES's request DSL collapses to
after parsing (reference: filters forwarded verbatim to ES,
/root/reference/src/search-ingest/elastic.cr — ES evaluates them as
Lucene bitsets; here they become pushed-down parquet predicates):

    {"lang": "es"}                          term   (equality)
    {"lang": ["es", "fr"]}                  terms  (match any)
    {"lat": {"gte": -10.0, "lt": 40.0}}     range  (gte/gt/lte/lt)
    {"tag": {"exists": True}}               exists (ES exists query;
                                            False = field missing)

and conjunctions of the above ({"lang": "es", "lat": {...}}: AND), plus
ES's `nested` query over an array-of-struct attr (the type the
reference's schema mapper produces for arrays of Hash/NamedTuple —
/root/reference/src/search-ingest/schemas.cr:247-248):

    {"nested": {"path": "props",
                "where": {"k": "k2", "v": {"gte": 20, "lt": 70}}}}

matches docs where AT LEAST ONE element of `props` satisfies ALL inner
clauses — the defining nested-vs-flattened distinction (a doc with
elements {k:'k2',v:5} and {k:'k9',v:30} does NOT match, though the
flattened columns would).  Inner clauses reuse the same term/terms/
range/exists grammar over the element's struct fields.

One spec, two compilers: `spark_cond` builds a pyspark Column (pushed
into the doc_attrs parquet scan by Catalyst — PushedFilters shows
GreaterThanOrEqual/LessThan), `arrow_cond` builds the identical
pyarrow.compute expression for the Spark-free serving path (pyarrow
prunes row groups with the same min/max stats).  Keeping both
compilers in one module is what guarantees the two paths stay
semantically identical — the bitwise parity tests then only have to
cover the scoring kernel.

Range endpoints are evaluated with the SAME comparison ops both sides
(>=, >, <=, <) so a doc qualifies on one path iff it qualifies on the
other, including float-equal boundary values.
"""

from __future__ import annotations

from typing import Any, Mapping

_RANGE_OPS = ("gte", "gt", "lte", "lt")


def _is_range(v: Any) -> bool:
    return isinstance(v, Mapping) and "exists" not in v


def _is_exists(v: Any) -> bool:
    return isinstance(v, Mapping) and "exists" in v


def _check_range(col: str, v: Mapping) -> None:
    bad = set(v) - set(_RANGE_OPS)
    if bad or not v:
        raise ValueError(
            f"range filter on {col!r} must use keys from {_RANGE_OPS}, "
            f"got {sorted(v) if v else 'empty dict'}"
        )


def _check_exists(col: str, v: Mapping) -> bool:
    if set(v) != {"exists"} or not isinstance(v["exists"], bool):
        raise ValueError(
            f"exists filter on {col!r} must be exactly "
            f"{{'exists': True|False}}, got {dict(v)}"
        )
    return v["exists"]


def _check_nested(v: Any) -> tuple[str, dict]:
    if (not isinstance(v, Mapping) or set(v) != {"path", "where"}
            or not isinstance(v["path"], str)
            or not isinstance(v["where"], Mapping) or not v["where"]
            or "nested" in v["where"]):
        raise ValueError(
            "nested filter must be {'path': <array-of-struct col>, "
            f"'where': {{non-empty flat clause dict}}}}, got {v!r}")
    return v["path"], dict(v["where"])


def split_nested(attr_filter: dict) -> tuple[dict, list[tuple[str, dict]]]:
    """(flat_clauses, [(path, where), ...]) — the serving path pushes
    the flat clauses into the pyarrow scan (arrow_cond) and evaluates
    the nested ones post-scan (arrow_nested_mask): dataset filter
    expressions cannot quantify over list elements."""
    flat = {c: v for c, v in attr_filter.items() if c != "nested"}
    nested = ([_check_nested(attr_filter["nested"])]
              if "nested" in attr_filter else [])
    return flat, nested


def spark_cond(attr_filter: dict):
    """Compile the filter spec to one pyspark Column (AND of clauses).

    The `nested` clause compiles to F.exists(path, λ element: AND of
    inner clauses) — a Catalyst HOF over the array column, evaluated
    element-at-a-time JVM-side (no explode, no shuffle, no Python)."""
    from pyspark.sql import functions as F

    cond = None
    for c, v in attr_filter.items():
        if c == "nested":
            path, where = _check_nested(v)

            def _el_pred(el, _w=dict(where)):
                return _spark_flat(_w, lambda f: el[f])

            # NOTE: F.exists inspects the lambda's arity — a bound
            # default would read as the (x, i) two-arg form, so the
            # predicate must expose exactly one positional parameter
            e = F.exists(F.col(path), lambda el: _el_pred(el))
        else:
            e = _spark_flat({c: v}, F.col)
        cond = e if cond is None else cond & e
    return cond


def _spark_flat(clauses: Mapping, ref):
    """AND of flat clauses with fields resolved through `ref` (F.col at
    top level; array-element struct access inside a nested clause)."""
    cond = None
    for c, v in clauses.items():
        if _is_exists(v):
            e = (ref(c).isNotNull() if _check_exists(c, v)
                 else ref(c).isNull())
        elif _is_range(v):
            _check_range(c, v)
            e = None
            for op, bound in v.items():
                cl = {
                    "gte": ref(c) >= bound, "gt": ref(c) > bound,
                    "lte": ref(c) <= bound, "lt": ref(c) < bound,
                }[op]
                e = cl if e is None else e & cl
        elif isinstance(v, (list, tuple, set, frozenset)):
            e = ref(c).isin(list(v))
        else:
            e = ref(c) == v
        cond = e if cond is None else cond & e
    return cond


def arrow_cond(attr_filter: dict):
    """Compile the same spec to a pyarrow dataset filter expression.

    `nested` is NOT expressible as a dataset filter (no element
    quantifier in pyarrow expressions) — callers split it out with
    split_nested() and apply arrow_nested_mask() after the scan."""
    import pyarrow.compute as pc

    if "nested" in attr_filter:
        raise ValueError(
            "nested clause is not scan-pushable: use split_nested() + "
            "arrow_nested_mask()")
    cond = None
    for c, v in attr_filter.items():
        if _is_exists(v):
            e = (pc.field(c).is_valid() if _check_exists(c, v)
                 else pc.field(c).is_null())
        elif _is_range(v):
            _check_range(c, v)
            e = None
            for op, bound in v.items():
                cl = {
                    "gte": pc.field(c) >= bound, "gt": pc.field(c) > bound,
                    "lte": pc.field(c) <= bound, "lt": pc.field(c) < bound,
                }[op]
                e = cl if e is None else e & cl
        elif isinstance(v, (list, tuple, set, frozenset)):
            e = pc.field(c).isin(list(v))
        else:
            e = pc.field(c) == v
        cond = e if cond is None else cond & e
    return cond


def arrow_nested_mask(tbl, path: str, where: dict):
    """Per-row boolean numpy mask: row qualifies iff ≥1 element of its
    `path` list-of-struct satisfies ALL `where` clauses — the serving
    path's post-scan evaluator for the nested spec (same semantics as
    spark_cond's F.exists, so the two paths can't drift).  Vectorized:
    ONE flatten of the list column, inner clauses evaluated on the
    flattened struct-field arrays with pyarrow compute, element
    verdicts folded to parents via list_parent_indices + np bincount —
    no per-row Python."""
    import numpy as np
    import pyarrow.compute as pc

    col = tbl[path]
    if col.num_chunks != 1:
        col = col.combine_chunks()
    chunk = col.chunk(0) if hasattr(col, "chunk") else col
    flat = pc.list_flatten(chunk)
    parents = pc.list_parent_indices(chunk).to_numpy(zero_copy_only=False)
    ok = None
    for c, v in where.items():
        field = pc.struct_field(flat, c)
        if _is_exists(v):
            e = (pc.is_valid(field) if _check_exists(c, v)
                 else pc.is_null(field))
        elif _is_range(v):
            _check_range(c, v)
            e = None
            for op, bound in v.items():
                cl = {"gte": pc.greater_equal, "gt": pc.greater,
                      "lte": pc.less_equal, "lt": pc.less}[op](field, bound)
                e = cl if e is None else pc.and_kleene(e, cl)
        elif isinstance(v, (list, tuple, set, frozenset)):
            e = pc.is_in(field, value_set=__import__("pyarrow").array(
                sorted(v) if not isinstance(v, (list, tuple)) else list(v)))
        else:
            e = pc.equal(field, v)
        ok = e if ok is None else pc.and_kleene(ok, e)
    hits = ok.to_numpy(zero_copy_only=False)
    hits = np.asarray([bool(h) if h is not None else False for h in hits]) \
        if hits.dtype == object else np.nan_to_num(hits).astype(bool)
    mask = np.zeros(len(tbl), dtype=bool)
    if len(parents):
        np.logical_or.at(mask, parents[hits], True)
    return mask


def sql_literal(v) -> str:
    """Render one Python value as an ANSI-SQL literal.  repr() is NOT a
    SQL renderer (ADVICE r04): a string holding a single quote reprs
    double-quoted (invalid SQL), True/None repr as Python keywords.
    Strings quote with '' doubling; bool → TRUE/FALSE; None → NULL;
    anything non-scalar is rejected loudly rather than mis-rendered."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise ValueError(f"unsupported SQL literal type: {type(v).__name__}")


def sql_cond(attr_filter: dict) -> str:
    """Compile the spec to a SQL WHERE fragment (oracle duty).  The
    nested clause renders as DuckDB `len(list_filter(path, e -> ...))
    > 0` — per-element conjunction, the same ≥1-element quantifier the
    other two compilers evaluate."""
    parts: list[str] = []
    for c, v in attr_filter.items():
        if c == "nested":
            path, where = _check_nested(v)
            inner = " AND ".join(
                _sql_flat(f, fv, ref=f"e.{f}") for f, fv in where.items())
            parts.append(f"len(list_filter({path}, e -> {inner})) > 0")
        else:
            parts.append(_sql_flat(c, v, ref=c))
    return " AND ".join(parts)


def _sql_flat(c: str, v, *, ref: str) -> str:
    """Render ONE flat clause with the field spelled as `ref` (the bare
    column at top level, `e.field` inside a nested lambda)."""
    if _is_exists(v):
        return (f"{ref} IS NOT NULL" if _check_exists(c, v)
                else f"{ref} IS NULL")
    if _is_range(v):
        _check_range(c, v)
        sym = {"gte": ">=", "gt": ">", "lte": "<=", "lt": "<"}
        return " AND ".join(
            f"{ref} {sym[op]} {sql_literal(bound)}" for op, bound in v.items())
    if isinstance(v, (list, tuple, set, frozenset)):
        vals = ", ".join(sql_literal(x) for x in v)
        return f"{ref} IN ({vals})"
    return f"{ref} = {sql_literal(v)}"
