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

and conjunctions of the above ({"lang": "es", "lat": {...}}: AND).

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


def spark_cond(attr_filter: dict):
    """Compile the filter spec to one pyspark Column (AND of clauses)."""
    from pyspark.sql import functions as F

    cond = None
    for c, v in attr_filter.items():
        if _is_exists(v):
            e = (F.col(c).isNotNull() if _check_exists(c, v)
                 else F.col(c).isNull())
        elif _is_range(v):
            _check_range(c, v)
            e = None
            for op, bound in v.items():
                cl = {
                    "gte": F.col(c) >= bound, "gt": F.col(c) > bound,
                    "lte": F.col(c) <= bound, "lt": F.col(c) < bound,
                }[op]
                e = cl if e is None else e & cl
        elif isinstance(v, (list, tuple, set, frozenset)):
            e = F.col(c).isin(list(v))
        else:
            e = F.col(c) == v
        cond = e if cond is None else cond & e
    return cond


def arrow_cond(attr_filter: dict):
    """Compile the same spec to a pyarrow dataset filter expression."""
    import pyarrow.compute as pc

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
    """Compile the spec to an ANSI-SQL WHERE fragment (oracle duty)."""
    parts: list[str] = []
    for c, v in attr_filter.items():
        if _is_exists(v):
            parts.append(
                f"{c} IS NOT NULL" if _check_exists(c, v) else f"{c} IS NULL")
        elif _is_range(v):
            _check_range(c, v)
            sym = {"gte": ">=", "gt": ">", "lte": "<=", "lt": "<"}
            for op, bound in v.items():
                parts.append(f"{c} {sym[op]} {sql_literal(bound)}")
        elif isinstance(v, (list, tuple, set, frozenset)):
            vals = ", ".join(sql_literal(x) for x in v)
            parts.append(f"{c} IN ({vals})")
        else:
            parts.append(f"{c} = {sql_literal(v)}")
    return " AND ".join(parts)
