"""Document (Mongo-analog) dataflow — C1-C9 of SURVEY.md §2.C.

The reference executes LLM-generated MongoDB query dicts against pymongo
(find: NLP_SQLizer/backend/app/ai/nl2mongo.py:178-189; pipelines
:168-177 with $limit injection :171-174; result flattening :195-226;
schema inference by sampling app/mongodb_adapter.py:97-148; explain
:229-297; collection discovery app/mongodb_adapter.py:75-95).

Here a "collection" is any DataFrame registered with the
:class:`DocumentStore`; the SAME query-dict dialect is translated to
native DataFrame operators, so Catalyst plans them (filter pushdown,
partial aggregation, TakeOrderedAndProject) instead of a document DB:

- find filter   → ``df.filter``  ($eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/
                  $regex/$exists/$and/$or/$not)
- projection    → ``df.select`` (include or exclude specs)
- sort          → ``df.orderBy`` (insertion-ordered spec, 1/-1)
- limit         → ``df.limit`` — injected at 100 when absent, matching
                  nl2mongo.py:171-174's $limit injection
- pipeline      → $match/$group/$sort/$limit/$skip/$replaceRoot/
                  $project/$count/$unwind
                  (incl. preserveNullAndEmptyArrays + includeArrayIndex
                  via explode_outer/posexplode)/$lookup (equi-join AND
                  uncorrelated-pipeline forms)/$facet (per-facet $match
                  preludes + mixed accumulator sets, one grouping-sets
                  scan)/$bucket/$sortByCount/$addFields/$set mapped to
                  filter/groupBy().agg()/orderBy/limit/select/count/
                  explode/join+collect_list/grouping-sets/CASE-chain
                  aggregate/withColumns; accumulators and $addFields
                  speak the expression dialect ($cond, comparisons,
                  arithmetic, string ops — all codegen);
                  $setWindowFields (rank family/$shift/framed
                  accumulators) onto Spark window functions

Flattening keeps the reference's display contract: columns = union of
fields with ``_id`` first, nested structs/maps/arrays rendered as JSON
strings (``F.to_json``), scalars untouched.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_LIMIT = 100  # nl2mongo.py:171-174 / :188


class DocumentQueryError(ValueError):
    """Raised for malformed query dicts (bad operator, unknown field)."""


# ---------------------------------------------------------- filter (C1)
_CMP_OPS = {
    "$eq": lambda c, v: c == F.lit(v),
    # Negated operators are null-safe: Mongo's $ne/$nin match documents
    # where the field is null or missing, but `c != lit(v)` evaluates to
    # NULL there and the row would be silently dropped.
    "$ne": lambda c, v: ~c.eqNullSafe(F.lit(v)),
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
    "$in": lambda c, v: c.isin(list(v)),
    "$nin": lambda c, v: F.coalesce(~c.isin(list(v)), F.lit(True)),
    "$regex": lambda c, v: c.rlike(v),
}


def _field_condition(field: str, spec: Any) -> Column:
    col = F.col(field)
    if isinstance(spec, dict):
        conds: list[Column] = []
        for op, val in spec.items():
            if op in _CMP_OPS:
                conds.append(_CMP_OPS[op](col, val))
            elif op == "$exists":
                conds.append(col.isNotNull() if val else col.isNull())
            elif op == "$not":
                # Mongo's $not matches when the inner predicate does NOT
                # match — including null/missing fields, where the inner
                # condition evaluates to NULL rather than false.
                conds.append(~F.coalesce(_field_condition(field, val), F.lit(False)))
            elif op == "$all":
                # array field contains every listed value
                if not isinstance(val, list) or not val:
                    raise DocumentQueryError(
                        f"$all expects a non-empty literal list: {val!r}"
                    )
                c = F.array_contains(col, val[0])
                for v in val[1:]:
                    c = c & F.array_contains(col, v)
                conds.append(c)
            elif op == "$size":
                # query-form $size: exact element count (literal int,
                # like Mongo — no range form exists in the query language)
                conds.append(F.size(col) == _int_literal(val, "$size"))
            elif op == "$mod":
                if not (isinstance(val, list) and len(val) == 2):
                    raise DocumentQueryError(
                        f"$mod expects [divisor, remainder]: {val!r}"
                    )
                d, r = (_int_literal(x, "$mod") for x in val)
                if d == 0:
                    raise DocumentQueryError("$mod divisor must be nonzero")
                conds.append(col % F.lit(d) == F.lit(r))
            elif op == "$elemMatch":
                # {field: {$elemMatch: {$gte: a, $lt: b}}} — one array
                # element satisfies ALL the operator conditions. The
                # operator-dict form only (scalar elements); the nested
                # document form needs element schemas and is refused.
                if not (isinstance(val, dict) and val
                        and all(k.startswith("$") for k in val)):
                    raise DocumentQueryError(
                        "$elemMatch compiles the operator-dict form "
                        f"({{'$gte': …}}), got: {val!r}"
                    )
                bad = [k for k in val if k not in _CMP_OPS]
                if bad:
                    raise DocumentQueryError(
                        f"$elemMatch unsupported operators: {bad}"
                    )

                def make_pred(_spec):
                    def pred(x):
                        c = None
                        for o, v in _spec.items():
                            piece = _CMP_OPS[o](x, v)
                            c = piece if c is None else c & piece
                        return c

                    return pred

                conds.append(F.exists(col, make_pred(val)))
            else:
                raise DocumentQueryError(f"Unsupported filter operator: {op}")
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    return col == F.lit(spec)


def filter_condition(
    filter_dict: dict[str, Any], columns: list[str] | None = None
) -> Column:
    """Translate a Mongo-style filter document into one boolean Column.

    ``columns`` — when the caller knows the collection schema — lets
    schema-dependent operators ($text reads the conventional ``text``
    column) fail with the module's typed error instead of a raw Spark
    AnalysisException at execution time."""
    if not filter_dict:
        return F.lit(True)
    conds: list[Column] = []
    for key, spec in filter_dict.items():
        if key in ("$and", "$or", "$nor") and not (
            isinstance(spec, list) and spec
        ):
            # Mongo rejects an empty (or non-array) clause list too —
            # keep the error typed instead of an IndexError on sub[0]
            raise DocumentQueryError(
                f"{key} needs a non-empty array of clauses: {spec!r}"
            )
        if key == "$and":
            sub = [filter_condition(s, columns) for s in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c & s
            conds.append(c)
        elif key == "$or":
            sub = [filter_condition(s, columns) for s in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c | s
            conds.append(c)
        elif key == "$nor":
            # matches documents that fail EVERY clause — including
            # rows where a clause evaluates to NULL (missing/null
            # fields), which Mongo counts as not-matching
            sub = [
                ~F.coalesce(filter_condition(s, columns), F.lit(False))
                for s in spec
            ]
            c = sub[0]
            for s in sub[1:]:
                c = c & s
            conds.append(c)
        elif key == "$expr":
            # Mongo's aggregation-expression filter: cross-field
            # predicates in $match ("n_chars > 2 * x") via the same
            # dialect accumulators use — still a codegen Column, so
            # Catalyst can push what is pushable
            conds.append(_ref(spec).cast("boolean"))
        elif key == "$text":
            # {"$search": "w1 w2 …"} — Mongo's text-index OR-of-terms
            # semantics over the corpus's conventional ``text`` column
            # (the engine's documents schema; a collection without one
            # raises the typed error below when the caller supplied its
            # schema). Whole-token matching on the same
            # lowercase \s+ tokenization the text operators use; no
            # relevance score (use the BM25 retrieval operator for
            # ranked search).
            if not (isinstance(spec, dict)
                    and isinstance(spec.get("$search"), str)
                    and spec["$search"].strip()):
                raise DocumentQueryError(
                    f"$text expects {{'$search': 'terms'}}: {spec!r}"
                )
            if columns is not None and "text" not in columns:
                raise DocumentQueryError(
                    "$text searches the conventional 'text' column, "
                    "which this collection does not have (columns: "
                    + ", ".join(sorted(columns)) + ")"
                )
            from .dedup import tokens_expr as _toks

            terms = spec["$search"].lower().split()
            toks = _toks(F.col("text"))
            c = F.array_contains(toks, terms[0])
            for t in terms[1:]:
                c = c | F.array_contains(toks, t)
            conds.append(c)
        elif key == "$comment":
            continue  # annotation only — no semantic effect (Mongo parity)
        elif key == "$where":
            raise DocumentQueryError(
                "$where executes JavaScript, which this engine does not "
                "ship — express the predicate with $expr"
            )
        elif key == "$sampleRate":
            raise DocumentQueryError(
                "$sampleRate is nondeterministic; this engine's "
                "sampling contract is deterministic — use $sample "
                "(md5-keyed draw) for a fixed-size sample"
            )
        elif key.startswith("$"):
            raise DocumentQueryError(f"Unsupported top-level operator: {key}")
        else:
            conds.append(_field_condition(key, spec))
    if not conds:  # e.g. a filter that is ONLY a $comment
        return F.lit(True)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


# ------------------------------------------------------ projection (C2)
def apply_projection(df: DataFrame, projection: dict[str, Any] | None) -> DataFrame:
    """Mongo projection: {f:1,...} include (insertion order), {f:0,...}
    exclude. Mixed include/exclude is rejected like pymongo does, except
    the pymongo-special ``{_id: 0}`` alongside includes; an include
    projection keeps ``_id`` by default when the collection has one."""
    if not projection:
        return df
    # computed values are EXPRESSIONS (Mongo's rule): operator dicts,
    # document literals, arrays, '$'-paths, AND bare strings — {out:
    # "hello"} assigns the constant, it does not include a column
    # named 'out' (the r11 projection property sweep caught the
    # bare-string/array forms compiling to an unresolved include).
    # Numbers and booleans stay include/exclude flags: 1/true/any
    # truthy number includes, 0/false excludes (use $literal for a
    # constant number, exactly Mongo's escape hatch).
    computed = {
        f: v for f, v in projection.items()
        if isinstance(v, (dict, list, str))
    }
    if computed:
        # Mongo computed projection: {alias: <expression>} rides the
        # same dialect as $addFields; computed fields are implicitly
        # included alongside the 1-valued includes
        df = df.withColumns({name: _ref(e) for name, e in computed.items()})
        projection = {
            **{f: 1 for f in computed},
            **{f: v for f, v in projection.items() if f not in computed},
        }
    includes = [f for f, v in projection.items() if v]
    excludes = [f for f, v in projection.items() if not v]
    if includes and [e for e in excludes if e != "_id"]:
        raise DocumentQueryError("Projection cannot mix include and exclude")
    if includes:
        if "_id" in df.columns and "_id" not in projection:
            includes = ["_id", *includes]
        return df.select(*includes)
    return df.drop(*excludes)


# ------------------------------------------------------------ sort (C3)
def apply_sort(df: DataFrame, sort: dict[str, int] | None) -> DataFrame:
    if not sort:
        return df
    cols = [F.col(f).asc() if d >= 0 else F.col(f).desc() for f, d in sort.items()]
    return df.orderBy(*cols)


# ------------------------------------------- correlated $lookup (C5+)
def lookup_correlated(
    df: DataFrame, fdf: DataFrame, spec: dict[str, Any]
) -> DataFrame:
    """The correlated ``$lookup`` forms, de-correlated into ONE left
    outer join — the rewrite Catalyst itself performs for LATERAL
    (q131's precedent, relational.py): instead of running the
    sub-pipeline once per local row (Mongo's executable semantics),
    substitute the ``let`` bindings into the ``$match.$expr`` so
    ``$$var`` tokens become LOCAL-side columns and ``$field`` tokens
    become FOREIGN-side columns, and the whole $match collapses to a
    join condition. Two accepted shapes:

    - ``{from, let, pipeline: [{$match: {$expr}} (+ $project)], as}`` —
      the classic correlated form;
    - ``{from, localField, foreignField, pipeline: [...], as}`` — the
      concise correlated form (Mongo 5.0+): the equi-condition is
      AND-ed with the pipeline's $expr.

    Accepted sub-pipeline stages: one leading ``$match {$expr}``, then
    either a trailing ``$group`` (``_id: None`` → one aggregate doc per
    local row; keyed ``_id`` → an array of per-key group docs, sorted
    by ``_id``) or optional ``$sort`` / ``$limit`` / include-only
    ``$project``. Anything else stays a loud error. An existing local
    column named by ``as`` is OVERWRITTEN (Mongo's contract).

    Scale: equality conjuncts written as ``$eq`` compile to
    ``eqNullSafe`` equi-join keys, so Catalyst plans a hash/sort-merge
    join (broadcast when the foreign side is dim-sized) — the
    de-correlated plan shuffles each side once on the key instead of
    probing the foreign collection per local row. A correlation with
    NO equality conjunct degrades to a broadcast-nested-loop join;
    that is the honest cost of a pure-inequality correlation on any
    engine. Matches regroup onto the (unique) local row id; unmatched
    rows get an EMPTY array because the foreign payload struct is
    built pre-join (a left-join miss leaves it NULL and collect_list
    drops nulls — Mongo's empty-array contract)."""
    let = spec.get("let", {})
    pipe = list(spec.get("pipeline") or [])
    out_name = spec["as"]
    concise = "localField" in spec or "foreignField" in spec
    if concise and not ("localField" in spec and "foreignField" in spec):
        raise DocumentQueryError(
            "$lookup concise correlated form needs BOTH localField and "
            "foreignField"
        )
    cond_spec = None
    project = None
    if pipe and set(pipe[0]) == {"$match"}:
        m = pipe.pop(0)["$match"]
        if not (isinstance(m, dict) and set(m) == {"$expr"}):
            raise DocumentQueryError(
                "correlated $lookup $match must be a single $expr "
                f"document: {m!r}"
            )
        cond_spec = m["$expr"]
    sub_sort: dict | None = None
    sub_limit: int | None = None
    sub_group: dict | None = None
    if pipe and set(pipe[0]) == {"$group"}:
        # trailing per-correlation aggregate — two accepted shapes:
        # {$group: {_id: None, accs}} (ONE aggregate doc per local row)
        # and the keyed {$group: {_id: "$k" | expr, accs}} (an array of
        # per-key group docs per local row, sorted by _id for
        # determinism). Both are the textbook de-correlation target:
        # join + regrouped aggregate, never a per-row re-execution.
        sub_group = pipe.pop(0)["$group"]
        if not (isinstance(sub_group, dict) and "_id" in sub_group):
            raise DocumentQueryError(
                "correlated $lookup $group needs an _id "
                f"(None or a key expression): {sub_group!r}"
            )
        if pipe:
            raise DocumentQueryError(
                "correlated $lookup $group must be the final sub-stage; "
                f"found: {[next(iter(s)) for s in pipe]}"
            )
    while pipe:
        sop = next(iter(pipe[0]))
        if sop == "$sort" and sub_sort is None and project is None:
            sub_sort = pipe.pop(0)["$sort"]
            if not (isinstance(sub_sort, dict) and sub_sort):
                raise DocumentQueryError(f"Bad sub-pipeline $sort: {sub_sort!r}")
        elif sop == "$limit" and sub_limit is None:
            if sub_sort is None:
                raise DocumentQueryError(
                    "correlated $lookup $limit requires a preceding $sort "
                    "(an unsorted per-group page is nondeterministic)"
                )
            sub_limit = int(pipe.pop(0)["$limit"])
        elif sop == "$project" and project is None:
            project = pipe.pop(0)["$project"]
        else:
            break
    if pipe:
        raise DocumentQueryError(
            "correlated $lookup supports one leading $match {$expr} plus "
            "optional $sort / $limit / include-only $project; "
            f"unsupported stages: {[next(iter(s)) for s in pipe]}"
        )
    if not concise and cond_spec is None:
        raise DocumentQueryError(
            "$lookup with 'let' needs a pipeline starting with "
            "{$match: {$expr: ...}} to correlate on"
        )
    payload_cols = list(fdf.columns)
    if project is not None:
        if not all(v in (1, True) for v in project.values()):
            raise DocumentQueryError(
                "correlated $lookup $project must be include-only"
            )
        unknown = [f for f in project if f not in fdf.columns]
        if unknown:
            raise DocumentQueryError(
                f"correlated $lookup $project unknown fields: {unknown}"
            )
        payload_cols = list(project)

    def resolve(tok: str) -> Column:
        if tok.startswith("$$"):
            var = tok[2:]
            if var not in let:
                raise DocumentQueryError(
                    f"$lookup let variable {var!r} is not defined"
                )
            b = let[var]
            if isinstance(b, str) and b.startswith("$"):
                return F.col(f"__l.{b[1:]}")
            return F.lit(b)
        return F.col(f"__f.{tok[1:]}")

    if out_name in df.columns:
        # Mongo OVERWRITES an existing field named by "as" (the
        # graph_lookup contract) — drop the old column rather than
        # emitting a duplicate-named output
        df = df.drop(out_name)
    row_id = "__rowid"
    base_cols = list(df.columns)
    # Row-id determinism: monotonically_increasing_id is safe here
    # WITHOUT a localCheckpoint pin (contrast graph_lookup, which
    # re-joins `base` against a separately-derived plan) because the
    # lineage below is LINEAR — `left` has exactly one consumer chain
    # (join → regroup inside one plan), so the ids are generated once
    # per task and a task retry regenerates identical ids from the same
    # partition contents. If this ever gains a second consumer of
    # `left` (a cached/retried-lineage refactor), add
    # `.localCheckpoint()` like graph_lookup does.
    left = df.withColumn(row_id, F.monotonically_increasing_id()).alias("__l")
    fprep = fdf.withColumn(
        "__frow", F.struct(*[F.col(c) for c in payload_cols])
    ).alias("__f")
    cond = None
    if concise:
        cond = F.col(f"__l.{spec['localField']}").eqNullSafe(
            F.col(f"__f.{spec['foreignField']}")
        )
    if cond_spec is not None:
        expr_cond = _ref(cond_spec, resolve).cast("boolean")
        cond = expr_cond if cond is None else cond & expr_cond
    joined = left.join(fprep, cond, "left")
    if sub_group is not None:
        # per-correlation aggregate: accumulators run over each local
        # row's matches only (mask = a real foreign row joined), with
        # '$field' resolving to the FOREIGN side. Mongo's result shape
        # is an ARRAY holding the one aggregate doc — and an empty
        # array when nothing matched ($group over zero docs emits no
        # doc), hence the match-count gate.
        for alias in sub_group:
            if alias == "_id":
                continue
            # an alias shadowing a LOCAL column would make the agg
            # output ambiguous AND the post-array drop() would take the
            # local column with it; an alias equal to the $lookup's own
            # "as" name would likewise be swallowed by the final drop —
            # refuse at parse time (the $facet/$bucketAuto
            # reserved-alias contract)
            if alias in base_cols or alias == out_name \
                    or alias.startswith("__"):
                raise DocumentQueryError(
                    f"correlated $lookup $group alias {alias!r} collides "
                    "with a local field, the $lookup 'as' name, or the "
                    "compiler's __* namespace"
                )
        matched_c = F.col("__f.__frow").isNotNull()

        def fresolve(tok: str) -> Column:
            if tok.startswith("$$"):
                return resolve(tok)
            return F.col(f"__f.{tok[1:]}")

        acc_aliases = [a for a in sub_group if a != "_id"]
        aggs = [
            _acc_to_agg_masked(a, s_, matched_c, fresolve)
            for a, s_ in sub_group.items()
            if a != "_id"
        ]
        gid = sub_group["_id"]
        if gid is not None:
            # keyed per-correlation $group: {_id: "$k" | expr, accs} →
            # groupBy(row_id, key) computes each local row's per-key
            # aggregates in ONE pass, then the regroup on row_id folds
            # them into an array of {_id: k, accs} docs (sorted by _id,
            # the dialect's determinism convention). Unmatched local
            # rows form a single (row, null-key) group with zero
            # matches; the when() mask nulls its doc and collect_list
            # drops nulls — the empty-array contract. A REAL null
            # foreign key still appears: its group has matches, so the
            # mask keeps it. Scale: two key-partitioned aggregates —
            # (row_id, k) then row_id — both map-side-combinable; no
            # per-row re-execution and no skew beyond the data's own
            # key distribution.
            key_c = _ref(gid, fresolve)
            per_key = joined.groupBy(
                F.col(f"__l.{row_id}").alias(row_id),
                key_c.alias("__gk"),
            ).agg(
                *[F.first(F.col(f"__l.{c}")).alias(c) for c in base_cols],
                F.count(F.when(matched_c, F.lit(1))).alias("__nm"),
                *aggs,
            )
            doc = F.struct(
                F.col("__gk").alias("_id"),
                *[F.col(a) for a in acc_aliases],
            )
            return (
                per_key.groupBy(row_id)
                .agg(
                    *[F.first(F.col(c)).alias(c) for c in base_cols],
                    F.sort_array(
                        F.collect_list(F.when(F.col("__nm") > 0, doc))
                    ).alias(out_name),
                )
                .drop(row_id)
            )
        agged = joined.groupBy(F.col(f"__l.{row_id}")).agg(
            *[F.first(F.col(f"__l.{c}")).alias(c) for c in base_cols],
            F.count(F.when(matched_c, F.lit(1))).alias("__nm"),
            *aggs,
        )
        doc = F.struct(
            F.lit(None).cast("string").alias("_id"),
            *[F.col(a) for a in acc_aliases],
        )
        return (
            agged.withColumn(
                out_name,
                # [] when nothing matched, [doc] otherwise — filter on
                # the singleton array keeps the element type without
                # naming it (when/otherwise(NULL) would yield null,
                # breaking the empty-array contract)
                F.filter(F.array(doc), lambda _x: F.col("__nm") > 0),
            )
            .drop("__nm", *acc_aliases)
            .drop(row_id)
        )
    if sub_sort is None:
        return (
            joined.groupBy(F.col(f"__l.{row_id}"))
            .agg(
                *[F.first(F.col(f"__l.{c}")).alias(c) for c in base_cols],
                F.collect_list(F.col("__f.__frow")).alias(out_name),
            )
            .drop(row_id)
        )
    # $sort (+$limit): the per-group top-N window rewrite — rank the
    # matches inside each local row's group, keep rn <= limit, and
    # rebuild the array IN the sub-pipeline's sort order (sort_array on
    # (rn, payload) structs, then strip the rank). An unmatched local
    # row contributes one all-null foreign row: rn=1 survives any
    # limit and the null payload is filtered out of the array — the
    # empty-array contract holds. Scale: the window and the regroup
    # share the row-id partitioning (one exchange, reused).
    from pyspark.sql import Window

    unknown = [f for f in sub_sort if f not in fdf.columns]
    if unknown:
        raise DocumentQueryError(
            f"correlated $lookup $sort unknown fields: {unknown}"
        )
    order_cols = [
        F.col(f"__f.{f}").asc() if d >= 0 else F.col(f"__f.{f}").desc()
        for f, d in sub_sort.items()
    ]
    w = Window.partitionBy(F.col(f"__l.{row_id}")).orderBy(*order_cols)
    ranked = joined.withColumn("__rn", F.row_number().over(w))
    if sub_limit is not None:
        ranked = ranked.filter(F.col("__rn") <= sub_limit)
    pair = F.struct(F.col("__rn").alias("__rn"),
                    F.col("__f.__frow").alias("__p"))
    return (
        ranked.groupBy(F.col(f"__l.{row_id}"))
        .agg(
            *[F.first(F.col(f"__l.{c}")).alias(c) for c in base_cols],
            F.filter(
                F.transform(
                    F.sort_array(F.collect_list(pair)), lambda x: x["__p"]
                ),
                lambda p: p.isNotNull(),
            ).alias(out_name),
        )
        .drop(row_id)
    )


# ----------------------------------------------------- $group stage (C5)
def _acc_to_agg(alias: str, spec: dict[str, Any], resolve=None) -> Column:
    """Unmasked accumulator — delegates to the masked dispatch with a
    constant-true condition (Catalyst folds the no-op CASE away), so
    there is exactly ONE accumulator table to extend."""
    return _acc_to_agg_masked(alias, spec, F.lit(True), resolve)


def _ref(arg: Any, resolve=None) -> Column:
    """'$field' → column reference; literals pass through; operator
    dicts recurse into the expression language (:func:`_expr`). An
    optional ``resolve`` callable overrides how '$field' / '$$var'
    tokens become Columns — the correlated-$lookup compiler uses it to
    bind '$field' to the foreign side and '$$var' to the local side.

    With the default resolver, a supported expression document compiles
    through the SQL-text fast path (ONE F.expr parse instead of a py4j
    roundtrip per node — see ``_sql_of``); the trees are identical by
    the canonicalized-plan test contract, and anything unsupported
    falls through to the Column path below unchanged."""
    if resolve is None and _SQL_FAST_PATH:
        s = _sql_of(arg, None)
        if s is not None:
            return F.expr(s)
    if isinstance(arg, str) and arg.startswith("$"):
        if resolve is not None:
            return resolve(arg)
        if arg.startswith("$$"):
            raise DocumentQueryError(f"Unbound expression variable: {arg}")
        return F.col(arg[1:])
    if isinstance(arg, dict):
        if len(arg) == 1 and next(iter(arg)).startswith("$"):
            return _expr(arg, resolve)
        # document literal (Mongo's object construction in expression
        # position): {"k": e, …} → a struct with each value compiled —
        # what $arrayToObject/$objectToArray/$getField compose over
        if not arg:
            raise DocumentQueryError(
                "empty document literal is not a compilable expression"
            )
        bad = [k for k in arg if k.startswith("$")]
        if bad:
            raise DocumentQueryError(
                f"document literal keys may not start with '$': {bad} "
                "(a single-key $-dict is an operator expression)"
            )
        return F.struct(
            *[_ref(v, resolve).alias(k) for k, v in arg.items()]
        )
    if isinstance(arg, list):
        # array literal: each element compiles as an expression (Mongo
        # semantics — '$refs' and document literals nest inside)
        if not arg:
            return F.array().cast("array<string>")
        return F.array(*[_ref(e, resolve) for e in arg])
    return F.lit(arg)


def _typeof_to_bson(t: Column) -> Column:
    """Map Spark typeof() names onto Mongo $type names (int/long/
    double/decimal/string/bool/date/array/object/binData); unknown
    Spark types pass through under their Spark name."""
    return (
        F.when(t.isin("tinyint", "smallint", "int"), F.lit("int"))
        .when(t == "bigint", F.lit("long"))
        .when(t.isin("float", "double"), F.lit("double"))
        .when(t.startswith("decimal"), F.lit("decimal"))
        .when(t == "string", F.lit("string"))
        .when(t == "boolean", F.lit("bool"))
        .when(t.isin("date", "timestamp", "timestamp_ntz"), F.lit("date"))
        .when(t.startswith("array"), F.lit("array"))
        .when(t.startswith("struct") | t.startswith("map"), F.lit("object"))
        .when(t == "binary", F.lit("binData"))
        .otherwise(t)
    )


def _merge_two_maps(a: Column, b: Column) -> Column:
    """Later-wins merge of two MAP columns (Mongo $mergeObjects): keep
    a's entries whose key b does not define, then append b's — avoids
    map_concat's duplicate-key policy dependence entirely."""
    return F.map_from_entries(
        F.concat(
            F.filter(
                F.map_entries(a),
                lambda e: ~F.array_contains(F.map_keys(b), e["key"]),
            ),
            F.map_entries(b),
        )
    )


# Mongo aggregation expression operators → Column expressions. Every
# operand recurses through _ref, so field refs, literals, and nested
# operator dicts compose ("$cond" over "$eq" over "$multiply"). All of
# it stays whole-stage-codegen — the expression dialect compiles to
# native Catalyst expressions, never a UDF.
_EXPR_OPS = {
    "$eq": lambda a, b: a.eqNullSafe(b),
    "$ne": lambda a, b: ~a.eqNullSafe(b),
    "$gt": lambda a, b: a > b,
    "$gte": lambda a, b: a >= b,
    "$lt": lambda a, b: a < b,
    "$lte": lambda a, b: a <= b,
    "$add": lambda *xs: sum(xs[1:], xs[0]),
    "$subtract": lambda a, b: a - b,
    "$multiply": lambda *xs: __import__("functools").reduce(
        lambda p, x: p * x, xs
    ),
    "$divide": lambda a, b: a / b,
    "$toUpper": lambda a: F.upper(a),
    "$toLower": lambda a: F.lower(a),
    "$concat": lambda *xs: F.concat(*xs),
    "$strLenCP": lambda a: F.length(a),
    "$size": lambda a: F.size(a).cast("long"),
    # ---- numeric (r8): all native Catalyst, codegen-friendly.
    # $round/$trunc follow Mongo's HALF_EVEN contract — Spark's
    # bround IS banker's rounding (plain round() is HALF_UP and would
    # silently diverge).
    "$abs": lambda a: F.abs(a),
    "$ceil": lambda a: F.ceil(a),
    "$floor": lambda a: F.floor(a),
    "$mod": lambda a, b: a % b,
    "$pow": lambda a, b: F.pow(a, b),
    "$sqrt": lambda a: F.sqrt(a),
    "$exp": lambda a: F.exp(a),
    "$ln": lambda a: F.log(a),
    "$log10": lambda a: F.log10(a),
    # ---- string (r8)
    "$trim": lambda a: F.trim(a),
    "$ltrim": lambda a: F.ltrim(a),
    "$rtrim": lambda a: F.rtrim(a),
    "$toString": lambda a: a.cast("string"),
    "$toInt": lambda a: a.cast("int"),
    "$toLong": lambda a: a.cast("long"),
    "$toDouble": lambda a: a.cast("double"),
    "$toDate": lambda a: a.cast("date"),
    # Mongo defines $toBool/$toDecimal as $convert shorthands; ANSI
    # cast is loud on unconvertible input (Mongo errors there too) —
    # use $convert's onError for the recovering form
    "$toBool": lambda a: a.cast("boolean"),
    "$toDecimal": lambda a: a.cast("decimal(38,10)"),
    # ---- array (r8)
    "$concatArrays": lambda *xs: F.concat(*xs),
    "$ifNull": lambda *xs: F.coalesce(*xs),
    "$in": lambda v, arr: F.array_contains(arr, v),
    "$not": lambda a: ~a.cast("boolean"),
    # ---- comparison / boolean (r9 wave 2). $cmp/$strcasecmp return
    # -1/0/1; a null operand yields null (documented divergence —
    # Mongo totally orders null below numbers, a per-type order no
    # single Catalyst expression reproduces; $ifNull the operands if
    # null ranking matters).
    "$cmp": lambda a, b: (
        F.when(a.eqNullSafe(b) & a.isNotNull(), 0)
        .when(a < b, -1).when(a > b, 1).cast("int")
    ),
    "$strcasecmp": lambda a, b: (
        F.when(F.lower(a) == F.lower(b), 0)
        .when(F.lower(a) < F.lower(b), -1)
        .when(F.lower(a) > F.lower(b), 1).cast("int")
    ),
    # Mongo's arg shape is [array] — the list unwraps to one operand
    # Mongo TRUTHINESS in the element predicate: null (and 0/false)
    # elements are FALSY — without the coalesce, Spark's 3VL
    # exists/forall returns NULL for [1, null] where Mongo says
    # false/true by the falsy rule (r12 set-sweep find)
    "$anyElementTrue": lambda a: F.exists(
        a, lambda x: F.coalesce(x.cast("boolean"), F.lit(False))),
    "$allElementsTrue": lambda a: F.forall(
        a, lambda x: F.coalesce(x.cast("boolean"), F.lit(False))),
    # ---- arrays (r9 wave 2)
    "$indexOfArray": lambda arr, v: (
        (F.array_position(arr, v) - F.lit(1)).cast("long")
    ),
    "$setEquals": lambda a, b: (
        F.array_sort(F.array_distinct(a)) == F.array_sort(F.array_distinct(b))
    ),
    "$setIsSubset": lambda a, b: F.size(F.array_except(a, b)) == 0,
    # ---- math (r9 wave 2) — all 1:1 native
    "$sin": lambda a: F.sin(a), "$cos": lambda a: F.cos(a),
    "$tan": lambda a: F.tan(a), "$asin": lambda a: F.asin(a),
    "$acos": lambda a: F.acos(a), "$atan": lambda a: F.atan(a),
    "$atan2": lambda a, b: F.atan2(a, b),
    "$sinh": lambda a: F.sinh(a), "$cosh": lambda a: F.cosh(a),
    "$tanh": lambda a: F.tanh(a),
    "$degreesToRadians": lambda a: F.radians(a),
    "$radiansToDegrees": lambda a: F.degrees(a),
    # [num, base] — computed as ln(x)/ln(b), the same identity Mongo's
    # and DuckDB's arbitrary-base logs use
    "$log": lambda x, b: F.log(x) / F.log(b),
    "$bitAnd": lambda *xs: __import__("functools").reduce(
        lambda p, x: p.bitwiseAND(x), xs
    ),
    "$bitOr": lambda *xs: __import__("functools").reduce(
        lambda p, x: p.bitwiseOR(x), xs
    ),
    "$bitXor": lambda *xs: __import__("functools").reduce(
        lambda p, x: p.bitwiseXOR(x), xs
    ),
    "$bitNot": lambda a: F.bitwise_not(a),
    # ---- strings (r9 wave 2)
    "$strLenBytes": lambda a: F.octet_length(a),
    # $binarySize: byte size of a string (UTF-8) or binary value —
    # octet_length covers both input types natively; Mongo returns an
    # int, null for null input (octet_length's contract too)
    "$binarySize": lambda a: F.octet_length(a).cast("long"),
    # ---- r10: byte-indexed substring + type introspection.
    # $substrBytes slices the UTF-8 BYTES (substring over a binary
    # cast — native); a slice that splits a multi-byte character
    # yields replacement characters where Mongo errors (documented
    # divergence — Spark's binary→string cast does not validate).
    "$substrBytes": lambda s, start, cnt: F.substring(
        s.cast("binary"), start.cast("int") + F.lit(1), cnt.cast("int")
    ).cast("string"),
    # $isNumber/$type read the COLUMN type via typeof() (constant per
    # expression — Catalyst folds it) plus a per-row null gate: in a
    # typed columnar engine a value's BSON type is its column type,
    # and null is the only per-row variation. Mongo's 'missing' is
    # not representable (columns always exist) — documented.
    "$isNumber": lambda a: a.isNotNull() & F.typeof(a).rlike(
        r"^(tinyint|smallint|int|bigint|float|double)$|^decimal\("
    ),
    "$type": lambda a: F.when(a.isNull(), F.lit("null")).otherwise(
        _typeof_to_bson(F.typeof(a))
    ),
    # ---- object/map (r9): the doc plane's dynamic-key objects are MAP
    # columns; $objectToArray emits Mongo's [{k, v}, …] shape in the
    # map's entry order (map_from_entries preserves insertion order, so
    # a build→entries round-trip is order-stable). $arrayToObject takes
    # the same {k, v} shape back. Struct inputs fail at analysis time
    # with Spark's type error — dynamic keys belong in maps.
    "$objectToArray": lambda m: F.transform(
        F.map_entries(m),
        lambda e: F.struct(e["key"].alias("k"), e["value"].alias("v")),
    ),
    # duplicate keys follow Mongo's documented LAST-value-wins: an
    # entry survives only when no later entry redefines its key (the
    # _merge_two_maps key-filter pattern, indexed) — otherwise Spark's
    # default map_from_entries duplicate-key policy would throw
    "$arrayToObject": lambda a: F.map_from_entries(
        F.filter(
            F.transform(a, lambda e: F.struct(e["k"], e["v"])),
            lambda e, i: ~F.exists(
                F.slice(a, i + F.lit(2), F.greatest(F.size(a), F.lit(1))),
                lambda later: later["k"] == e["k"],
            ),
        )
    ),
    # later-wins variadic merge over MAP columns; a null operand
    # propagates null (Mongo skips nulls — $ifNull an empty map if
    # that matters)
    "$mergeObjects": lambda *xs: __import__("functools").reduce(
        _merge_two_maps, xs
    ),
    "$setUnion": lambda *xs: F.array_sort(F.array_distinct(F.concat(*xs))),
    "$setIntersection": lambda a, b: F.array_sort(F.array_intersect(a, b)),
    "$setDifference": lambda a, b: F.array_sort(F.array_except(a, b)),
    "$reverseArray": lambda a: F.reverse(a),
    # ---- date parts (r8): Mongo returns ints
    "$year": lambda a: F.year(a),
    "$month": lambda a: F.month(a),
    "$dayOfMonth": lambda a: F.dayofmonth(a),
    "$hour": lambda a: F.hour(a),
    "$minute": lambda a: F.minute(a),
    "$second": lambda a: F.second(a),
    "$dayOfWeek": lambda a: F.dayofweek(a),
    "$dayOfYear": lambda a: F.dayofyear(a),
    # ISO fields: weekofyear IS the ISO week; ISO weekday is Mon=1..
    # Sun=7 (weekday() is 0-based Monday); the ISO week-year is the
    # calendar year of that week's THURSDAY (d + (4 - isoDow) days) —
    # the standard identity, no Spark pattern needed
    "$isoWeek": lambda a: F.weekofyear(a),
    "$isoDayOfWeek": lambda a: F.weekday(a) + F.lit(1),
    "$isoWeekYear": lambda a: F.year(
        F.date_add(F.to_date(a), F.lit(4) - (F.weekday(a) + F.lit(1)))
    ).cast("long"),
    # Mongo's $week: Sunday-start, week 1 begins at the first Sunday,
    # earlier days are week 0 — floor((doy-1 - (dayofweek-1) + 7) / 7)
    "$week": lambda a: F.floor(
        (F.dayofyear(a) - F.lit(1) - (F.dayofweek(a) - F.lit(1)) + F.lit(7))
        / F.lit(7)
    ).cast("int"),
    "$millisecond": lambda a: F.floor(
        (F.unix_micros(a.cast("timestamp")) % F.lit(1_000_000))
        / F.lit(1000)
    ).cast("int"),
}


def _int_literal(x: Any, op: str) -> int:
    if not isinstance(x, int) or isinstance(x, bool):
        raise DocumentQueryError(
            f"{op} expects an integer literal, got {x!r}"
        )
    return x


def _scoped_resolve(outer, bindings: dict[str, Column]):
    """Resolver for array-expression lambda bodies: '$$<var>' tokens in
    ``bindings`` become the lambda parameters; everything else delegates
    to the enclosing resolver (so $filter inside a correlated $lookup
    still sees the right sides)."""

    def resolve(tok: str) -> Column:
        if tok.startswith("$$") and tok[2:] in bindings:
            return bindings[tok[2:]]
        if outer is not None:
            return outer(tok)
        if tok.startswith("$$"):
            raise DocumentQueryError(f"Unbound expression variable: {tok}")
        return F.col(tok[1:])

    return resolve


_DATE_TRUNC_UNITS = {"year", "quarter", "month", "week", "day", "hour",
                     "minute"}
# Mongo $dateTrunc startOfWeek day names → Spark dayofweek() index
# (1=Sunday..7=Saturday); Mongo's documented default is SUNDAY
_START_OF_WEEK = {
    "sunday": 1, "monday": 2, "tuesday": 3, "wednesday": 4,
    "thursday": 5, "friday": 6, "saturday": 7,
    "sun": 1, "mon": 2, "tue": 3, "wed": 4, "thu": 5, "fri": 6, "sat": 7,
}


# Mongo $dateToString/$dateFromString format specifiers → Spark
# datetime-pattern fields (Spark's DateTimeFormatter dialect). Only
# specifiers with an exact Spark field are mapped; %G/%V/%u (ISO week
# dialect) and %z/%Z (offset rendering) have no loss-free Spark
# equivalent under the proleptic calendar and are refused loudly.
_MONGO_FMT_SPECS = {
    "Y": "yyyy", "m": "MM", "d": "dd", "H": "HH", "M": "mm", "S": "ss",
    "L": "SSS", "j": "DDD",
}


def _mongo_fmt_tokens(fmt: str, op: str) -> list[tuple[str, str]]:
    """Scan a Mongo %-format string into ('lit', text) / ('pat',
    spark_pattern) tokens; unknown specifiers and a dangling '%' are
    loud."""
    toks: list[tuple[str, str]] = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            toks.append(("lit", "".join(lit)))
            lit.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise DocumentQueryError(
                    f"{op}: dangling '%' in format {fmt!r}"
                )
            spec = fmt[i + 1]
            if spec == "%":
                lit.append("%")
            else:
                pat = _MONGO_FMT_SPECS.get(spec)
                if pat is None:
                    raise DocumentQueryError(
                        f"{op}: unsupported format specifier %{spec} "
                        f"in {fmt!r} (supported: "
                        f"%{'/%'.join(sorted(_MONGO_FMT_SPECS))}, %%)"
                    )
                flush()
                toks.append(("pat", pat))
            i += 2
        else:
            lit.append(ch)
            i += 1
    flush()
    return toks


def _mongo_datetime_fmt(fmt: str, op: str) -> str:
    """Translate a Mongo %-format string into ONE Spark datetime
    pattern (the PARSE side needs a single pattern). Literal runs are
    single-quoted so format text can never collide with pattern
    letters ('T' in ISO strings, stray 'y', …). ADJACENT specifiers of
    the same field ('%m%m') would silently merge into one longer
    pattern field ('MM'+'MM' = 'MMMM', the text month) — the pattern
    language has no empty separator, so that shape is refused loudly
    (found by the r9 property sweep; the RENDER side sidesteps the
    problem entirely by concatenating per-specifier date_format
    pieces — see $dateToString)."""
    out: list[str] = []
    prev_pat: str | None = None
    for kind, text in _mongo_fmt_tokens(fmt, op):
        if kind == "lit":
            out.append("'" + text.replace("'", "''") + "'")
            prev_pat = None
            continue
        if prev_pat is not None and prev_pat[0] == text[0]:
            raise DocumentQueryError(
                f"{op}: adjacent identical specifiers in {fmt!r} have "
                "no single-pattern representation — separate them "
                "with literal text"
            )
        out.append(text)
        prev_pat = text
    return "".join(out)


# Mongo $regexMatch/$regexFind options → Java inline-flag letters
# (identical meanings: i=case-insensitive, m=multiline anchors,
# s=dotall, x=comments)
_REGEX_OPTIONS = {"i", "m", "s", "x"}

# $convert targets: Mongo type name -> Spark cast type ("date" is the
# try-parse cascade, handled in _expr), plus Mongo's numeric type codes
_CONVERT_TYPES = {
    "double": "double", "string": "string", "bool": "boolean",
    "date": "date", "int": "int", "long": "long",
    "decimal": "decimal(38,10)",
}
_CONVERT_CODES = {1: "double", 2: "string", 8: "bool", 9: "date",
                  16: "int", 18: "long", 19: "decimal"}


def _has_left_context_assertion(pattern: str) -> bool:
    """True when the pattern contains a zero-width assertion that
    consults text to the LEFT of the match position — '^' (outside a
    character class, where it means negation), \\b/\\B, or a
    lookbehind. $regexFindAll's per-match offset fold re-searches the
    suffix after each match, where such assertions would see a spurious
    string-start; right-context assertions ($, lookahead) are safe."""
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            if not in_class and pattern[i + 1] in ("b", "B"):
                return True
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "^":
            return True
        elif c == "(" and pattern[i:i + 4] in ("(?<=", "(?<!"):
            return True
        i += 1
    return False


def _python_probe(pattern: str) -> str:
    """Rewrite Java-only regex spelling into the Python equivalent so
    ``re`` can act as the compile-time validator / group counter for
    patterns EXECUTED by Java regex: named groups ``(?<name>...)`` →
    ``(?P<name>...)`` (lookbehind ``(?<=``/``(?<!`` is untouched — the
    rewrite requires a leading letter) and named backrefs
    ``\\k<name>`` → ``(?P=name)``."""
    probe = re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", pattern)
    # escape-aware: only rewrite \k that is itself an ESCAPE — i.e.
    # preceded by an even number of backslashes. A literal-backslash
    # pattern like \\k<x> (escaped backslash, then plain text k<x>)
    # must pass through untouched or the probe becomes uncompilable
    # and a valid Java pattern gets a false typed rejection (r13
    # advice find).
    return re.sub(
        r"(?<!\\)((?:\\\\)*)\\k<([A-Za-z][A-Za-z0-9]*)>",
        r"\1(?P=\2)",
        probe,
    )


def _regex_operands(op: str, operands: Any) -> tuple[Any, str]:
    """Validate {input, regex, options} for the $regex* expression ops.
    The pattern and options must be COMPILE-TIME literals: the engine
    folds them into the Catalyst expression (and counts capture
    groups), so a field-path regex cannot be compiled — refuse loudly
    rather than treating it as literal text."""
    if not (isinstance(operands, dict) and "input" in operands
            and "regex" in operands):
        raise DocumentQueryError(f"{op} needs input+regex: {operands!r}")
    pattern = operands["regex"]
    if not isinstance(pattern, str) or pattern.startswith("$"):
        raise DocumentQueryError(
            f"{op} regex must be a literal string: {pattern!r}"
        )
    opts = operands.get("options", "")
    if not isinstance(opts, str) or not set(opts) <= _REGEX_OPTIONS:
        raise DocumentQueryError(
            f"{op} bad options {opts!r} (supported: i, m, s, x)"
        )
    if opts:
        pattern = "(?" + "".join(sorted(set(opts))) + ")" + pattern
    # compile-validate here so EVERY $regex* op (incl. $regexMatch,
    # which never needs a group count) refuses a malformed pattern
    # with the module's typed error instead of surfacing a raw Spark
    # execution exception — the NL regex tier (nl71) feeds the
    # user-quoted pattern straight through this path. EXECUTION is
    # Java regex (Spark), so the probe bridges the two dialects
    # (r11 advice): Python-only named-group syntax is rejected with a
    # typed error (Java would throw at runtime), while Java's named
    # groups/backrefs are rewritten to Python spelling FOR THE PROBE
    # ONLY — the executed pattern is untouched. Possessive
    # quantifiers and atomic groups are valid in both (re since
    # Python 3.11).
    if re.search(r"\(\?P[<=>]", pattern):
        raise DocumentQueryError(
            f"{op} pattern {pattern!r} uses Python-only (?P...) group "
            "syntax; execution is Java regex — use (?<name>...) and "
            r"\k<name>"
        )
    try:
        re.compile(_python_probe(pattern))
    except re.error as exc:
        raise DocumentQueryError(
            f"{op} bad pattern {pattern!r}: {exc}"
        ) from exc
    return operands["input"], pattern


# ------------------------------------------------------------------ r14
# SQL-text fast path for expression compilation (guide §4/§5: the
# driver should do almost no work — through this environment's ~1-2 ms
# py4j gateway every Column operation is a JVM roundtrip, so a deep
# expression document costs 0.2-0.6 s of PURE plan construction when
# built node-by-node). The emitter below renders a supported expression
# document to ONE SQL string, compiled with a single F.expr() parse.
#
# Equivalence contract: every template here parses to the EXACT
# Catalyst tree the Column path builds — verified by canonicalized-
# optimized-plan equality in tests/test_documents.py
# (test_sql_fast_path_tree_equivalence) over the full op battery, so
# plans, results and hashes are unchanged by construction. Anything
# not provably identical (document literals — struct() vs
# named_struct() render differently — $convert's cascade, the regex
# family, date arithmetic, $let, …) returns None and falls back to the
# Column path, which also keeps every typed-error contract: the
# emitter only fires on specs it has fully validated, so malformed
# input always reaches the Column path's DocumentQueryError.
_SQL_FAST_PATH = True

_SQL_IDENT_RE = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_SQL_CASTS = {
    "$toString": "STRING", "$toInt": "INT", "$toLong": "BIGINT",
    "$toDouble": "DOUBLE", "$toDate": "DATE", "$toBool": "BOOLEAN",
    "$toDecimal": "DECIMAL(38,10)",
}

_SQL_DATE_FNS = {
    "$year": "year", "$month": "month", "$dayOfMonth": "dayofmonth",
    "$hour": "hour", "$minute": "minute", "$second": "second",
    "$dayOfWeek": "dayofweek", "$dayOfYear": "dayofyear",
    "$isoWeek": "weekofyear",
}

_SQL_FN1 = {
    "$toUpper": "upper", "$toLower": "lower", "$strLenCP": "length",
    "$abs": "abs", "$ceil": "ceil", "$floor": "floor", "$sqrt": "sqrt",
    "$exp": "exp", "$ln": "ln", "$log10": "log10", "$trim": "trim",
    "$ltrim": "ltrim", "$rtrim": "rtrim", "$strLenBytes": "octet_length",
    "$reverseArray": "reverse", "$sin": "sin", "$cos": "cos",
    "$tan": "tan", "$asin": "asin", "$acos": "acos", "$atan": "atan",
    "$sinh": "sinh", "$cosh": "cosh", "$tanh": "tanh",
    "$degreesToRadians": "radians", "$radiansToDegrees": "degrees",
    "$bitNot": None,  # rendered as ~x below
}


def _sql_lit(v: Any) -> str | None:
    """SQL literal with the same Catalyst type F.lit() would produce
    (bool before int — bool is an int subclass; D-suffixed doubles —
    a bare 1.5 parses as DECIMAL; L-suffix only past int32 — F.lit
    makes IntegerType literals in range)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return str(v)
        if -(2**63) <= v < 2**63:
            return f"{v}L"
        return None
    if isinstance(v, float):
        import math

        if not math.isfinite(v):
            return None
        return repr(v) + "D"
    if isinstance(v, str):
        if any(ord(c) < 32 or ord(c) == 127 for c in v):
            return None  # keep control-char escaping out of scope
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return None  # dates/datetimes/bytes: Column path


def _sql_ident(path: str) -> str | None:
    if not path or "`" in path or path.startswith("__m_"):
        # "__m_" is the emitter's lambda-parameter namespace: a column
        # of that name would be shadowed inside lambda bodies
        return None
    return ".".join("`" + seg + "`" for seg in path.split("."))


def _sql_of(arg: Any, env: dict[str, str] | None) -> str | None:
    """SQL text for an expression document under the DEFAULT resolver
    ('$f' → column f; '$$v' → the lambda binding in ``env``), or None
    when any node lacks a verified SQL twin."""
    if isinstance(arg, str):
        if arg.startswith("$$"):
            if env and arg[2:] in env:
                return env[arg[2:]]
            return None
        if arg.startswith("$"):
            return _sql_ident(arg[1:])
        return _sql_lit(arg)
    if isinstance(arg, dict):
        if len(arg) == 1 and next(iter(arg)).startswith("$"):
            return _sql_expr_text(arg, env)
        # document literal → struct with aliases (struct(e AS `k`, …)
        # parses to the same CreateStruct F.struct(e.alias(k)) builds)
        if not arg or any(k.startswith("$") or "`" in k for k in arg):
            return None
        parts = [(k, _sql_of(v, env)) for k, v in arg.items()]
        if any(p is None for _, p in parts):
            return None
        return ("struct("
                + ", ".join(f"{p} AS `{k}`" for k, p in parts) + ")")
    if isinstance(arg, list):
        if not arg:
            return "CAST(array() AS ARRAY<STRING>)"
        parts = [_sql_of(e, env) for e in arg]
        if any(p is None for p in parts):
            return None
        return "array(" + ", ".join(parts) + ")"
    return _sql_lit(arg)


def _sql_literal_tree(v: Any) -> str | None:
    """$literal body: scalars, lists and documents, NO '$'
    interpretation (keys and strings stay verbatim text)."""
    if isinstance(v, dict):
        if not v or any("`" in k for k in v):
            return None
        parts = [(k, _sql_literal_tree(x)) for k, x in v.items()]
        if any(p is None for _, p in parts):
            return None
        return ("struct("
                + ", ".join(f"{p} AS `{k}`" for k, p in parts) + ")")
    if isinstance(v, list):
        if not v:
            return "CAST(array() AS ARRAY<STRING>)"
        parts = [_sql_literal_tree(x) for x in v]
        if any(p is None for p in parts):
            return None
        return "array(" + ", ".join(parts) + ")"
    return _sql_lit(v)


def _sql_bool(x: str) -> str:
    return f"CAST({x} AS BOOLEAN)"


def _sql_expr_text(  # noqa: C901 — one dispatcher, mirror of _expr
    spec: dict[str, Any], env: dict[str, str] | None
) -> str | None:
    if len(spec) != 1:
        return None
    op, operands = next(iter(spec.items()))

    def sub(a: Any) -> str | None:
        return _sql_of(a, env)

    # ---- special forms -------------------------------------------
    if op == "$cond":
        if isinstance(operands, dict):
            parts = [operands.get("if"), operands.get("then"),
                     operands.get("else")]
            if any(p is None for p in parts):
                return None
        else:
            parts = list(operands) if isinstance(operands, list) else None
            if parts is None or len(parts) != 3:
                return None
        c, t, e = (sub(p) for p in parts)
        if None in (c, t, e):
            return None
        return f"CASE WHEN {c} THEN {t} ELSE {e} END"
    if op in ("$and", "$or"):
        if not isinstance(operands, list) or not operands:
            return None
        xs = [sub(a) for a in operands]
        if any(x is None for x in xs):
            return None
        word = "AND" if op == "$and" else "OR"
        out = _sql_bool(xs[0])
        for x in xs[1:]:
            out = f"({out} {word} {_sql_bool(x)})"
        return out
    if op == "$switch":
        if not (isinstance(operands, dict)
                and isinstance(operands.get("branches"), list)
                and operands["branches"]):
            return None
        pieces = []
        for br in operands["branches"]:
            if not (isinstance(br, dict) and "case" in br and "then" in br):
                return None
            c, t = sub(br["case"]), sub(br["then"])
            if c is None or t is None:
                return None
            pieces.append(f"WHEN {_sql_bool(c)} THEN {t}")
        tail = ""
        if "default" in operands:
            d = sub(operands["default"])
            if d is None:
                return None
            tail = f" ELSE {d}"
        return "CASE " + " ".join(pieces) + tail + " END"
    if op == "$literal":
        return _sql_literal_tree(operands)
    if op in ("$round", "$trunc"):
        args = operands if isinstance(operands, list) else [operands]
        if len(args) > 1 and not (isinstance(args[1], int)
                                  and not isinstance(args[1], bool)):
            return None
        place = args[1] if len(args) > 1 else 0
        v = sub(args[0])
        if v is None:
            return None
        if op == "$round":
            return f"bround({v}, {place})"
        sd = repr(float(10**place)) + "D"
        return (f"(CASE WHEN (({v} * {sd}) >= 0) THEN floor(({v} * {sd}))"
                f" ELSE ceil(({v} * {sd})) END / {sd})")
    if op == "$split":
        import re as _re_mod

        if not (isinstance(operands, list) and len(operands) == 2
                and isinstance(operands[1], str)
                and not operands[1].startswith("$")):
            return None
        s = sub(operands[0])
        pat = _sql_lit(_re_mod.escape(operands[1]))
        if s is None or pat is None:
            return None
        return f"split({s}, {pat}, -1)"
    if op == "$substrCP":
        if not (isinstance(operands, list) and len(operands) == 3):
            return None
        s, start, cnt = (sub(a) for a in operands)
        if None in (s, start, cnt):
            return None
        return f"substring({s}, ({start} + 1), {cnt})"
    if op == "$substrBytes":
        args = operands if isinstance(operands, list) else [operands]
        if len(args) != 3:
            return None
        s, start, cnt = (sub(a) for a in args)
        if None in (s, start, cnt):
            return None
        return (f"CAST(substring(CAST({s} AS BINARY), "
                f"(CAST({start} AS INT) + 1), CAST({cnt} AS INT)) "
                f"AS STRING)")
    if op == "$arrayElemAt":
        if not (isinstance(operands, list) and len(operands) == 2):
            return None
        arr, idx = sub(operands[0]), sub(operands[1])
        if arr is None or idx is None:
            return None
        return (f"try_element_at({arr}, CAST(CASE WHEN ({idx} >= 0) "
                f"THEN ({idx} + 1) ELSE {idx} END AS INT))")
    if op == "$slice":
        if not (isinstance(operands, list) and len(operands) in (2, 3)):
            return None
        arr = sub(operands[0])
        tail_ints = operands[1:]
        if arr is None or not all(
            isinstance(x, int) and not isinstance(x, bool)
            for x in tail_ints
        ):
            return None
        if len(operands) == 2:
            n = operands[1]
            if n >= 0:
                return f"slice({arr}, 1, {n})"
            return (f"slice({arr}, greatest((size({arr}) + {n + 1}), 1), "
                    f"{-n})")
        pos, n = operands[1], operands[2]
        if n <= 0:
            return None
        start = pos + 1 if pos >= 0 else pos
        return f"slice({arr}, {start}, {n})"
    if op == "$getField":
        if isinstance(operands, str):
            if "." in operands:
                return None
            return _sql_of("$" + operands, env)
        if not (isinstance(operands, dict) and "field" in operands
                and "input" in operands):
            return None
        field = operands["field"]
        if not isinstance(field, str) or field.startswith("$"):
            return None
        inp = sub(operands["input"])
        f_lit = _sql_lit(field)
        if inp is None or f_lit is None:
            return None
        return f"{inp}[{f_lit}]"
    if op == "$dateTrunc":
        if not (isinstance(operands, dict) and "date" in operands
                and "unit" in operands):
            return None
        unit = operands["unit"]
        if unit not in _DATE_TRUNC_UNITS:
            return None
        d = sub(operands["date"])
        if d is None:
            return None
        if unit == "week":
            idx = _START_OF_WEEK.get(
                str(operands.get("startOfWeek", "sunday")).lower()
            )
            if idx is None:
                return None
            day = f"to_date({d})"
            return (f"date_sub({day}, (((dayofweek({day}) - {idx}) + 7) "
                    f"% 7))")
        t = f"date_trunc('{unit}', {d})"
        if unit in ("year", "quarter", "month", "day"):
            return f"CAST({t} AS DATE)"
        return t
    if op == "$sortArray":
        if not (isinstance(operands, dict) and "input" in operands
                and operands.get("sortBy") in (1, -1)):
            return None
        arr = sub(operands["input"])
        if arr is None:
            return None
        s = f"array_sort({arr})"
        return s if operands["sortBy"] == 1 else f"reverse({s})"
    if op == "$replaceAll":
        if not (isinstance(operands, dict) and "input" in operands
                and "find" in operands and "replacement" in operands):
            return None
        i, f_, r = (sub(operands[k])
                    for k in ("input", "find", "replacement"))
        if None in (i, f_, r):
            return None
        return f"replace({i}, {f_}, {r})"
    if op == "$indexOfCP":
        if not (isinstance(operands, list) and len(operands) in (2, 3, 4)):
            return None
        needle = operands[1]
        if not isinstance(needle, str) or needle.startswith("$"):
            return None
        tail_ints = operands[2:]
        if not all(isinstance(x, int) and not isinstance(x, bool)
                   for x in tail_ints):
            return None
        s = sub(operands[0])
        n_lit = _sql_lit(needle)
        if s is None or n_lit is None:
            return None
        if len(operands) == 4:
            s = f"substring({s}, 1, {operands[3]})"
        start = operands[2] if len(operands) >= 3 else 0
        if start < 0:
            return None
        return f"CAST((locate({n_lit}, {s}, {start + 1}) - 1) AS BIGINT)"
    if op in ("$trim", "$ltrim", "$rtrim") and isinstance(operands, dict):
        import re as _re_mod

        if "input" not in operands:
            return None
        s = sub(operands["input"])
        if s is None:
            return None
        chars = operands.get("chars")
        if chars is None:
            return f"{_SQL_FN1[op]}({s})"
        if not isinstance(chars, str) or chars.startswith("$") or not chars:
            return None
        cls = "[" + "".join(_re_mod.escape(c) for c in set(chars)) + "]+"
        pat = {"$trim": f"^{cls}|{cls}$", "$ltrim": f"^{cls}",
               "$rtrim": f"{cls}$"}[op]
        p_lit = _sql_lit(pat)
        if p_lit is None:
            return None
        return f"regexp_replace({s}, {p_lit}, '')"
    if op in ("$filter", "$map"):
        if not (isinstance(operands, dict) and "input" in operands):
            return None
        var = operands.get("as", "this")
        if not (isinstance(var, str) and _SQL_IDENT_RE.match(var)):
            return None
        body_key = "cond" if op == "$filter" else "in"
        if body_key not in operands:
            return None
        inp = sub(operands["input"])
        if inp is None:
            return None
        param = f"__m_{var}"
        body = _sql_of(operands[body_key], {**(env or {}), var: param})
        if body is None:
            return None
        if op == "$filter":
            return f"filter({inp}, {param} -> {_sql_bool(body)})"
        return f"transform({inp}, {param} -> {body})"
    if op == "$reduce":
        if not (isinstance(operands, dict) and "input" in operands
                and "initialValue" in operands and "in" in operands):
            return None
        inp = sub(operands["input"])
        if inp is None:
            return None
        init_spec = operands["initialValue"]
        body = operands["in"]
        scoped = {**(env or {}), "value": "__m_value", "this": "__m_this"}
        body_sql = _sql_of(body, scoped)
        if body_sql is None:
            return None
        if isinstance(init_spec, (int, float)) and not isinstance(
                init_spec, bool):
            probe = f"get({inp}, -1)"
            body_probe = _sql_of(
                body, {**(env or {}), "value": probe, "this": probe}
            )
            i_lit = _sql_lit(init_spec)
            if body_probe is None or i_lit is None:
                return None
            init = (f"coalesce(CASE WHEN FALSE THEN {probe} END, "
                    f"CASE WHEN FALSE THEN {body_probe} END, {i_lit})")
        else:
            init = sub(init_spec)
            if init is None:
                return None
        return (f"aggregate({inp}, {init}, "
                f"(__m_value, __m_this) -> {body_sql})")
    if op == "$let":
        if not (isinstance(operands, dict)
                and isinstance(operands.get("vars"), dict)
                and "in" in operands):
            return None
        # vars evaluate in the ENCLOSING scope (Mongo's rule); inlining
        # each binding's SQL text wherever '$$name' appears duplicates
        # the subtree exactly like the Column path's reuse of one
        # Column object does
        scoped = dict(env or {})
        for name, val in operands["vars"].items():
            if not isinstance(name, str) or not _SQL_IDENT_RE.match(name):
                return None
            v = _sql_of(val, env)
            if v is None:
                return None
            scoped[name] = v
        return _sql_of(operands["in"], scoped)
    if op in ("$dateDiff", "$dateAdd", "$dateSubtract"):
        if not (isinstance(operands, dict) and "unit" in operands):
            return None
        unit = operands["unit"]
        if op == "$dateDiff":
            if not ("startDate" in operands and "endDate" in operands):
                return None
            a = sub(operands["startDate"])
            b = sub(operands["endDate"])
            if a is None or b is None:
                return None
            if unit == "day":
                return f"CAST(datediff(to_date({b}), to_date({a})) AS BIGINT)"
            if unit == "year":
                return f"CAST((year({b}) - year({a})) AS BIGINT)"
            if unit == "month":
                return (f"CAST((((year({b}) - year({a})) * 12) + "
                        f"(month({b}) - month({a}))) AS BIGINT)")
            if unit == "week":
                sow = _sql_expr_text(
                    {"$dateTrunc": {"date": operands["startDate"],
                                    "unit": "week"}}, env)
                eow = _sql_expr_text(
                    {"$dateTrunc": {"date": operands["endDate"],
                                    "unit": "week"}}, env)
                if sow is None or eow is None:
                    return None
                return f"CAST((datediff({eow}, {sow}) / 7) AS BIGINT)"
            if unit in ("hour", "minute", "second"):
                secs = {"hour": 3600, "minute": 60, "second": 1}[unit]
                ta = (f"CAST(date_trunc('{unit}', "
                      f"CAST({a} AS TIMESTAMP)) AS BIGINT)")
                tb = (f"CAST(date_trunc('{unit}', "
                      f"CAST({b} AS TIMESTAMP)) AS BIGINT)")
                return f"CAST((({tb} - {ta}) / {secs}) AS BIGINT)"
            return None
        if "startDate" not in operands or "amount" not in operands:
            return None
        amt = operands["amount"]
        if not isinstance(amt, int) or isinstance(amt, bool):
            return None
        if op == "$dateSubtract":
            amt = -amt
        if unit not in ("year", "quarter", "month", "week", "day",
                        "hour", "minute", "second"):
            return None
        if unit == "quarter":
            unit, amt = "month", amt * 3
        d = sub(operands["startDate"])
        if d is None:
            return None
        return f"({d} + interval {amt} {unit})"
    if op == "$dateToString":
        if not (isinstance(operands, dict) and "date" in operands
                and "timezone" not in operands):
            return None
        fmt = operands.get("format", "%Y-%m-%dT%H:%M:%S.%LZ")
        if not isinstance(fmt, str):
            return None
        d = sub(operands["date"])
        if d is None:
            return None
        try:
            toks = _mongo_fmt_tokens(fmt, "$dateToString")
        except DocumentQueryError:
            return None  # Column path raises the same typed error
        pieces = []
        for kind, text in toks:
            t_lit = _sql_lit(text)
            if t_lit is None:
                return None
            pieces.append(t_lit if kind == "lit"
                          else f"date_format({d}, {t_lit})")
        body = ("concat(" + ", ".join(pieces) + ")") if pieces else "''"
        rendered = f"CASE WHEN ({d} IS NOT NULL) THEN {body}"
        if "onNull" in operands:
            on = sub(operands["onNull"])
            if on is None:
                return None
            rendered += f" ELSE {on}"
        return rendered + " END"
    if op == "$dateFromString":
        if not (isinstance(operands, dict) and "dateString" in operands
                and "timezone" not in operands):
            return None
        s = sub(operands["dateString"])
        if s is None:
            return None
        fmt = operands.get("format")
        if fmt is not None:
            if not isinstance(fmt, str) or fmt.startswith("$"):
                return None
            try:
                pat = _mongo_datetime_fmt(fmt, "$dateFromString")
            except DocumentQueryError:
                return None
            p_lit = _sql_lit(pat)
            if p_lit is None:
                return None
            parsed = (f"try_to_timestamp({s}, {p_lit})"
                      if "onError" in operands
                      else f"to_timestamp({s}, {p_lit})")
        else:
            parsed = (f"try_to_timestamp({s})" if "onError" in operands
                      else f"to_timestamp({s})")
        if "onError" in operands:
            on_err = sub(operands["onError"])
            if on_err is None:
                return None
            parsed = f"coalesce({parsed}, {on_err})"
        if "onError" in operands or "onNull" in operands:
            if "onNull" in operands:
                on_null = sub(operands["onNull"])
                if on_null is None:
                    return None
            else:
                on_null = "CAST(NULL AS TIMESTAMP)"
            parsed = (f"CASE WHEN ({s} IS NULL) THEN {on_null} "
                      f"ELSE {parsed} END")
        return parsed
    if op == "$dateFromParts":
        if not (isinstance(operands, dict) and "year" in operands):
            return None
        known = {"year", "month", "day", "hour", "minute", "second",
                 "millisecond", "onError", "onNull"}
        if set(operands) - known:  # timezone/iso*/unknown → Column path
            return None
        part = {}
        for k, dflt in (("year", 0), ("month", 1), ("day", 1),
                        ("hour", 0), ("minute", 0), ("second", 0),
                        ("millisecond", 0)):
            part[k] = (sub(operands[k]) if k in operands else str(dflt))
            if part[k] is None:
                return None
        secs = (f"CAST((CAST({part['second']} AS DECIMAL(16,6)) + "
                f"(CAST({part['millisecond']} AS DECIMAL(16,6)) / 1000)) "
                f"AS DECIMAL(16,6))")
        made_args = ", ".join(
            [f"CAST({part[k]} AS INT)"
             for k in ("year", "month", "day", "hour", "minute")]
            + [secs]
        )
        if "onError" in operands:
            on_err = sub(operands["onError"])
            if on_err is None:
                return None
            made = (f"coalesce(try_make_timestamp({made_args}), "
                    f"CAST({on_err} AS TIMESTAMP))")
        else:
            made = f"make_timestamp({made_args})"
        if "onError" in operands or "onNull" in operands:
            if "onNull" in operands:
                on_null = sub(operands["onNull"])
                if on_null is None:
                    return None
            else:
                on_null = "CAST(NULL AS TIMESTAMP)"
            made = (f"CASE WHEN ({part['year']} IS NULL) THEN {on_null} "
                    f"ELSE {made} END")
        return made
    if op in ("$regexMatch", "$regexFind", "$regexFindAll"):
        try:
            inp, pattern = _regex_operands(op, operands)
        except DocumentQueryError:
            return None  # Column path raises the same typed error
        s = sub(inp)
        p_lit = _sql_lit(pattern)
        if s is None or p_lit is None:
            return None
        if op == "$regexMatch":
            return f"regexp_like({s}, {p_lit})"
        import re as _re_mod

        try:
            n_groups = _re_mod.compile(_python_probe(pattern)).groups
        except _re_mod.error:
            return None  # Column path raises the typed error
        pref_lit = _sql_lit(f"(?s)^.*?(?={pattern})")
        if pref_lit is None:
            return None
        if op == "$regexFind":
            caps = ", ".join(
                f"regexp_extract({s}, {p_lit}, {g})"
                for g in range(1, n_groups + 1)
            )
            doc = (
                f"struct(regexp_extract({s}, {p_lit}, 0) AS `match`, "
                f"CAST((length({s}) - length(regexp_replace({s}, "
                f"{pref_lit}, ''))) AS BIGINT) AS `idx`, "
                f"CAST(array({caps}) AS ARRAY<STRING>) AS `captures`)"
            )
            return f"CASE WHEN regexp_like({s}, {p_lit}) THEN {doc} END"
        if _has_left_context_assertion(pattern):
            return None  # Column path raises the typed refusal
        matches = f"regexp_extract_all({s}, {p_lit}, 0)"
        suffix = f"substr({s}, (__m_acc['pos'] + 1), length({s}))"
        found = (f"CAST(((__m_acc['pos'] + length({suffix})) - "
                 f"length(regexp_replace({suffix}, {pref_lit}, ''))) "
                 f"AS INT)")
        step = (f"struct(({found} + greatest(length(__m_m), 1)) AS `pos`, "
                f"concat(__m_acc['out'], array(CAST({found} AS BIGINT))) "
                f"AS `out`)")
        idxs = (f"aggregate({matches}, "
                f"struct(CAST(0 AS INT) AS `pos`, "
                f"CAST(array() AS ARRAY<BIGINT>) AS `out`), "
                f"(__m_acc, __m_m) -> {step}, "
                f"__m_acc -> __m_acc['out'])")
        caps = ", ".join(
            f"element_at(regexp_extract_all({s}, {p_lit}, {g}), "
            f"(__m_i + 1))"
            for g in range(1, n_groups + 1)
        )
        docs = (f"transform({matches}, (__m_m, __m_i) -> "
                f"struct(__m_m AS `match`, "
                f"element_at({idxs}, (__m_i + 1)) AS `idx`, "
                f"CAST(array({caps}) AS ARRAY<STRING>) AS `captures`))")
        return (f"coalesce({docs}, CAST(array() AS "
                f"array<struct<match:string,idx:bigint,"
                f"captures:array<string>>>))")
    if op == "$convert":
        if not (isinstance(operands, dict) and "input" in operands
                and "to" in operands):
            return None
        to = operands["to"]
        if isinstance(to, int) and not isinstance(to, bool):
            to = _CONVERT_CODES.get(to, to)
        if to == "timestamp":
            to = "date"
        if not isinstance(to, str) or to not in _CONVERT_TYPES:
            return None
        for fb_key in ("onError", "onNull"):
            fb = operands.get(fb_key)
            if fb is None or isinstance(fb, dict) or (
                    isinstance(fb, str) and fb.startswith("$")):
                continue
            if to == "date":
                return None  # Column path raises the typed guard
            if to == "string":
                ok = isinstance(fb, str)
            elif to == "bool":
                ok = isinstance(fb, bool)
            else:
                ok = isinstance(fb, (int, float)) and not isinstance(
                    fb, bool)
            if not ok:
                return None  # Column path raises the typed guard
        x = sub(operands["input"])
        if x is None:
            return None
        if to == "date":
            s = f"CAST({x} AS STRING)"
            conv = (f"coalesce(try_to_timestamp({s}), "
                    f"timestamp_millis(try_cast({s} AS BIGINT)))")
        elif "onError" in operands:
            conv = f"try_cast({x} AS {_CONVERT_TYPES[to]})"
        else:
            conv = f"CAST({x} AS {_CONVERT_TYPES[to]})"
        failed = f"(({x} IS NOT NULL) AND ({conv} IS NULL))"
        if "onError" in operands:
            on_err = sub(operands["onError"])
            if on_err is None:
                return None
            conv = f"CASE WHEN {failed} THEN {on_err} ELSE {conv} END"
        elif to == "date":
            conv = (f"CASE WHEN {failed} THEN raise_error("
                    f"'$convert: unparseable date input (use onError)') "
                    f"ELSE {conv} END")
        if "onNull" in operands:
            on_null = sub(operands["onNull"])
            if on_null is None:
                return None
            conv = (f"CASE WHEN ({x} IS NULL) THEN {on_null} "
                    f"ELSE {conv} END")
        return conv
    if op == "$dateToParts":
        if not (isinstance(operands, dict) and "date" in operands
                and not operands.get("iso8601")):
            return None
        d = sub(operands["date"])
        if d is None:
            return None
        ms = (f"CAST(floor(((unix_micros(CAST({d} AS TIMESTAMP)) "
              f"% 1000000) / 1000)) AS INT)")
        return (f"struct(year({d}) AS `year`, month({d}) AS `month`, "
                f"dayofmonth({d}) AS `day`, hour({d}) AS `hour`, "
                f"minute({d}) AS `minute`, second({d}) AS `second`, "
                f"{ms} AS `millisecond`)")
    if op == "$zip":
        if not (isinstance(operands, dict)
                and isinstance(operands.get("inputs"), list)
                and len(operands["inputs"]) == 2):
            return None
        a = sub(operands["inputs"][0])
        b = sub(operands["inputs"][1])
        if a is None or b is None:
            return None
        if not operands.get("useLongestLength", False):
            n = f"least(size({a}), size({b}))"
            a, b = f"slice({a}, 1, {n})", f"slice({b}, 1, {n})"
        return f"zip_with({a}, {b}, (__m_x, __m_y) -> array(__m_x, __m_y))"
    if op == "$range":
        if not (isinstance(operands, list) and len(operands) in (2, 3)):
            return None
        step = operands[2] if len(operands) == 3 else 1
        if not isinstance(step, int) or isinstance(step, bool) or step == 0:
            return None
        a0, b0 = sub(operands[0]), sub(operands[1])
        if a0 is None or b0 is None:
            return None
        a = f"CAST({a0} AS INT)"
        b = f"CAST({b0} AS INT)"
        if step > 0:
            cond, stop = f"({a} < {b})", f"({b} - 1)"
        else:
            cond, stop = f"({a} > {b})", f"({b} + 1)"
        return (f"CASE WHEN {cond} THEN sequence({a}, {stop}, {step}) "
                f"ELSE CAST(array() AS ARRAY<INT>) END")
    if op == "$replaceOne":
        if not (isinstance(operands, dict) and "input" in operands
                and "find" in operands and "replacement" in operands):
            return None
        find = operands["find"]
        if not isinstance(find, str) or find.startswith("$") or not find:
            return None
        s = sub(operands["input"])
        repl = sub(operands["replacement"])
        f_lit = _sql_lit(find)
        if None in (s, repl, f_lit):
            return None
        pos = f"locate({f_lit}, {s})"
        spliced = (f"concat(substring({s}, 1, ({pos} - 1)), {repl}, "
                   f"substring({s}, ({pos} + {len(find)}), length({s})))")
        return f"CASE WHEN ({pos} = 0) THEN {s} ELSE {spliced} END"
    if op == "$mergeObjects":
        args_m = operands if isinstance(operands, list) else [operands]
        xs_m = [_sql_of(a, env) for a in args_m]
        if not xs_m or any(x is None for x in xs_m):
            return None
        out = xs_m[0]
        for b in xs_m[1:]:
            out = (f"map_from_entries(concat(filter(map_entries({out}), "
                   f"__m_e -> (NOT array_contains(map_keys({b}), "
                   f"__m_e['key']))), map_entries({b})))")
        return out
    if op == "$objectToArray":
        if isinstance(operands, list) and len(operands) != 1:
            return None  # Column path raises the arity error
        m_sql = sub(operands[0] if isinstance(operands, list) else operands)
        if m_sql is None:
            return None
        return (f"transform(map_entries({m_sql}), __m_e -> "
                f"struct(__m_e['key'] AS `k`, __m_e['value'] AS `v`))")
    if op == "$arrayToObject":
        if isinstance(operands, list) and len(operands) != 1:
            return None  # Column path raises the arity error
        a_sql = sub(operands[0] if isinstance(operands, list) else operands)
        if a_sql is None:
            return None
        return (
            f"map_from_entries(filter(transform({a_sql}, __m_e -> "
            f"struct(__m_e['k'] AS `k`, __m_e['v'] AS `v`)), "
            f"(__m_e, __m_i) -> (NOT exists(slice({a_sql}, (__m_i + 2), "
            f"greatest(size({a_sql}), 1)), "
            f"__m_later -> (__m_later['k'] = __m_e['k'])))))"
        )
    if op == "$isNumber":
        args_n = operands if isinstance(operands, list) else [operands]
        if len(args_n) != 1:
            return None
        x = _sql_of(args_n[0], env)
        if x is None:
            return None
        return (f"(({x} IS NOT NULL) AND (typeof({x}) RLIKE "
                f"'^(tinyint|smallint|int|bigint|float|double)$"
                f"|^decimal\\\\('))")
    if op == "$type":
        args_t = operands if isinstance(operands, list) else [operands]
        if len(args_t) != 1:
            return None
        x = _sql_of(args_t[0], env)
        if x is None:
            return None
        t = f"typeof({x})"
        bson = (
            f"CASE WHEN ({t} IN ('tinyint', 'smallint', 'int')) "
            f"THEN 'int' "
            f"WHEN ({t} = 'bigint') THEN 'long' "
            f"WHEN ({t} IN ('float', 'double')) THEN 'double' "
            f"WHEN startswith({t}, 'decimal') THEN 'decimal' "
            f"WHEN ({t} = 'string') THEN 'string' "
            f"WHEN ({t} = 'boolean') THEN 'bool' "
            f"WHEN ({t} IN ('date', 'timestamp', 'timestamp_ntz')) "
            f"THEN 'date' "
            f"WHEN startswith({t}, 'array') THEN 'array' "
            f"WHEN (startswith({t}, 'struct') OR startswith({t}, 'map')) "
            f"THEN 'object' "
            f"WHEN ({t} = 'binary') THEN 'binData' "
            f"ELSE {t} END"
        )
        return f"CASE WHEN ({x} IS NULL) THEN 'null' ELSE {bson} END"
    # ---- table ops ------------------------------------------------
    args = operands if isinstance(operands, list) else [operands]
    xs = [_sql_of(a, env) for a in args]
    if any(x is None for x in xs):
        return None
    n = len(xs)

    def fold(sym: str) -> str:
        out = xs[0]
        for x in xs[1:]:
            out = f"({out} {sym} {x})"
        return out

    if op == "$eq" and n == 2:
        return f"({xs[0]} <=> {xs[1]})"
    if op == "$ne" and n == 2:
        return f"(NOT ({xs[0]} <=> {xs[1]}))"
    if op in ("$gt", "$gte", "$lt", "$lte") and n == 2:
        sym = {"$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}[op]
        return f"({xs[0]} {sym} {xs[1]})"
    if op == "$add" and n >= 1:
        return fold("+")
    if op == "$subtract" and n == 2:
        return fold("-")
    if op == "$multiply" and n >= 1:
        return fold("*")
    if op == "$divide" and n == 2:
        return fold("/")
    if op == "$mod" and n == 2:
        return fold("%")
    if op == "$pow" and n == 2:
        return f"power({xs[0]}, {xs[1]})"
    if op == "$atan2" and n == 2:
        return f"atan2({xs[0]}, {xs[1]})"
    if op == "$log" and n == 2:
        return f"(ln({xs[0]}) / ln({xs[1]}))"
    if op in _SQL_FN1 and n == 1:
        if op == "$bitNot":
            return f"~{xs[0]}"
        return f"{_SQL_FN1[op]}({xs[0]})"
    if op in _SQL_CASTS and n == 1:
        return f"CAST({xs[0]} AS {_SQL_CASTS[op]})"
    if op in ("$concat", "$concatArrays") and n >= 1:
        return "concat(" + ", ".join(xs) + ")"
    if op == "$ifNull" and n >= 1:
        return "coalesce(" + ", ".join(xs) + ")"
    if op == "$size" and n == 1:
        return f"CAST(size({xs[0]}) AS BIGINT)"
    if op == "$binarySize" and n == 1:
        return f"CAST(octet_length({xs[0]}) AS BIGINT)"
    if op == "$in" and n == 2:
        return f"array_contains({xs[1]}, {xs[0]})"
    if op == "$not" and n == 1:
        return f"(NOT {_sql_bool(xs[0])})"
    if op in ("$bitAnd", "$bitOr", "$bitXor") and n >= 1:
        return fold({"$bitAnd": "&", "$bitOr": "|", "$bitXor": "^"}[op])
    if op == "$cmp" and n == 2:
        a, b = xs
        return (f"CAST(CASE WHEN (({a} <=> {b}) AND ({a} IS NOT NULL)) "
                f"THEN 0 WHEN ({a} < {b}) THEN -1 "
                f"WHEN ({a} > {b}) THEN 1 END AS INT)")
    if op == "$strcasecmp" and n == 2:
        a, b = xs
        return (f"CAST(CASE WHEN (lower({a}) = lower({b})) THEN 0 "
                f"WHEN (lower({a}) < lower({b})) THEN -1 "
                f"WHEN (lower({a}) > lower({b})) THEN 1 END AS INT)")
    if op == "$indexOfArray" and n == 2:
        return f"CAST((array_position({xs[0]}, {xs[1]}) - 1) AS BIGINT)"
    if op == "$setEquals" and n == 2:
        return (f"(array_sort(array_distinct({xs[0]})) = "
                f"array_sort(array_distinct({xs[1]})))")
    if op == "$setIsSubset" and n == 2:
        return f"(size(array_except({xs[0]}, {xs[1]})) = 0)"
    if op == "$setUnion" and n >= 1:
        return ("array_sort(array_distinct(concat("
                + ", ".join(xs) + ")))")
    if op == "$setIntersection" and n == 2:
        return f"array_sort(array_intersect({xs[0]}, {xs[1]}))"
    if op == "$setDifference" and n == 2:
        return f"array_sort(array_except({xs[0]}, {xs[1]}))"
    if op in ("$anyElementTrue", "$allElementsTrue") and n == 1:
        hof = "exists" if op == "$anyElementTrue" else "forall"
        return (f"{hof}({xs[0]}, __m_x -> "
                f"coalesce(CAST(__m_x AS BOOLEAN), FALSE))")
    if op in _SQL_DATE_FNS and n == 1:
        return f"{_SQL_DATE_FNS[op]}({xs[0]})"
    if op == "$isoDayOfWeek" and n == 1:
        return f"(weekday({xs[0]}) + 1)"
    if op == "$isoWeekYear" and n == 1:
        a = xs[0]
        return (f"CAST(year(date_add(to_date({a}), "
                f"(4 - (weekday({a}) + 1)))) AS BIGINT)")
    if op == "$week" and n == 1:
        a = xs[0]
        return (f"CAST(floor(((((dayofyear({a}) - 1) - "
                f"(dayofweek({a}) - 1)) + 7) / 7)) AS INT)")
    if op == "$millisecond" and n == 1:
        return (f"CAST(floor(((unix_micros(CAST({xs[0]} AS TIMESTAMP)) "
                f"% 1000000) / 1000)) AS INT)")
    return None


def _expr(spec: dict[str, Any], resolve=None) -> Column:
    """One {$op: operands} expression document → a Column."""
    if len(spec) != 1:
        raise DocumentQueryError(f"Bad expression: {spec!r}")
    op, operands = next(iter(spec.items()))
    if op == "$dateTrunc":
        # {"date": "$ts", "unit": "day"} → date_trunc; day-or-coarser
        # units come back as DATE (Mongo returns a Date at the
        # boundary), finer units stay TIMESTAMP. Unit "week" does NOT
        # use Spark's date_trunc('week') (ISO, Monday-based): Mongo's
        # $dateTrunc defaults startOfWeek to SUNDAY, so the week path
        # computes date_sub(day, (dayofweek - start) mod 7) honoring an
        # optional {"startOfWeek": "monday"|...} operand.
        if not (isinstance(operands, dict) and "date" in operands
                and "unit" in operands):
            raise DocumentQueryError(f"$dateTrunc needs date+unit: {spec!r}")
        unit = operands["unit"]
        if unit not in _DATE_TRUNC_UNITS:
            raise DocumentQueryError(f"$dateTrunc bad unit: {unit!r}")
        if unit == "week":
            sow = operands.get("startOfWeek", "sunday")
            idx = _START_OF_WEEK.get(str(sow).lower())
            if idx is None:
                raise DocumentQueryError(
                    f"$dateTrunc bad startOfWeek: {sow!r}"
                )
            day = F.to_date(_ref(operands["date"], resolve))
            # dayofweek(): 1=Sunday..7=Saturday; step back to the most
            # recent start-of-week day (0..6 days)
            return F.date_sub(
                day, (F.dayofweek(day) - F.lit(idx) + F.lit(7)) % F.lit(7)
            )
        truncated = F.date_trunc(unit, _ref(operands["date"], resolve))
        if unit in ("year", "quarter", "month", "day"):
            return truncated.cast("date")
        return truncated
    if op == "$cond":
        if isinstance(operands, dict):
            # dict form: a missing key and an explicit null are
            # indistinguishable — keep the strict guard (use the array
            # form for literal-null branches)
            parts = [operands.get("if"), operands.get("then"),
                     operands.get("else")]
            if any(p is None for p in parts):
                raise DocumentQueryError(
                    f"$cond needs if/then/else: {spec!r}"
                )
        else:
            # array form: [if, then, else] — a None element is Mongo's
            # literal null branch, compiled as such
            parts = list(operands)
            if len(parts) != 3:
                raise DocumentQueryError(
                    f"$cond needs if/then/else: {spec!r}"
                )
        cond, then, other = (_ref(p, resolve) for p in parts)
        return F.when(cond, then).otherwise(other)
    if op in ("$and", "$or"):
        import functools
        import operator as _op

        subs = [_ref(a, resolve).cast("boolean") for a in operands]
        if not subs:
            raise DocumentQueryError(f"{op} needs operands: {spec!r}")
        return functools.reduce(
            _op.and_ if op == "$and" else _op.or_, subs
        )
    # ---- special forms (r8): operators whose operands are not all
    # plain sub-expressions — literal places/delimiters, lambda bodies
    # with $$-variables, or named documents.
    if op == "$switch":
        # {"branches": [{"case": e, "then": e}, ...], "default": e}
        if not (isinstance(operands, dict)
                and isinstance(operands.get("branches"), list)
                and operands["branches"]):
            raise DocumentQueryError(f"Bad $switch: {spec!r}")
        out = None
        for br in operands["branches"]:
            if not (isinstance(br, dict) and "case" in br and "then" in br):
                raise DocumentQueryError(f"Bad $switch branch: {br!r}")
            c = _ref(br["case"], resolve).cast("boolean")
            t = _ref(br["then"], resolve)
            out = F.when(c, t) if out is None else out.when(c, t)
        if "default" in operands:
            out = out.otherwise(_ref(operands["default"], resolve))
        # Mongo errors at RUN time when no branch matches and there is
        # no default; a DataFrame engine can't raise per-row — the
        # documented divergence is NULL instead (when() without
        # otherwise), which downstream null handling treats uniformly
        return out
    if op == "$round" or op == "$trunc":
        args = operands if isinstance(operands, list) else [operands]
        place = _int_literal(args[1], op) if len(args) > 1 else 0
        val = _ref(args[0], resolve)
        if op == "$round":
            # Mongo rounds HALF_EVEN — Spark's bround IS banker's
            # rounding (plain round() is HALF_UP and would diverge)
            return F.bround(val, place)
        scale = F.lit(float(10 ** place))
        scaled = val * scale
        return (
            F.when(scaled >= 0, F.floor(scaled)).otherwise(F.ceil(scaled))
            / scale
        )
    if op == "$split":
        # Mongo's delimiter is a LITERAL string; Spark's split takes a
        # regex — escape metacharacters so '.' splits on dots
        import re as _re_mod

        if not (isinstance(operands, list) and len(operands) == 2
                and isinstance(operands[1], str)
                and not operands[1].startswith("$")):
            # Mongo allows a field-path delimiter; the compile-time
            # regex escape can't — refuse '$'-refs loudly rather than
            # treating them as literal text
            raise DocumentQueryError(
                f"$split expects [expr, literal delimiter]: {spec!r}"
            )
        # split with limit -1 keeps trailing empties (Mongo keeps them)
        return F.split(
            _ref(operands[0], resolve), _re_mod.escape(operands[1]), -1
        )
    if op == "$substrCP":
        # Mongo is 0-based; Spark substring is 1-based
        if not (isinstance(operands, list) and len(operands) == 3):
            raise DocumentQueryError(f"$substrCP needs 3 operands: {spec!r}")
        s = _ref(operands[0], resolve)
        start = _ref(operands[1], resolve) + F.lit(1)
        return F.substring(s, start, _ref(operands[2], resolve))
    if op == "$arrayElemAt":
        # Mongo: 0-based, negative counts from the end, OUT-OF-RANGE
        # yields missing (null here) — try_element_at, because Spark
        # 4's plain element_at THROWS on an out-of-bounds index (the
        # r11 projection property sweep caught [-4] over a 3-element
        # array dying with SparkArrayIndexOutOfBoundsException).
        # element_at is 1-based with the same negative convention; the
        # +1 shift means the compiled index is never 0.
        if not (isinstance(operands, list) and len(operands) == 2):
            raise DocumentQueryError(f"$arrayElemAt needs 2 operands: {spec!r}")
        arr = _ref(operands[0], resolve)
        idx = _ref(operands[1], resolve)
        return F.try_element_at(
            arr, F.when(idx >= 0, idx + F.lit(1)).otherwise(idx).cast("int")
        )
    if op == "$slice":
        if not (isinstance(operands, list) and len(operands) in (2, 3)):
            raise DocumentQueryError(f"$slice needs 2-3 operands: {spec!r}")
        arr = _ref(operands[0], resolve)
        if len(operands) == 2:
            n = _int_literal(operands[1], "$slice")
            # Mongo 2-arg: first n (n>0) or last n (n<0)
            if n >= 0:
                return F.slice(arr, 1, n)
            return F.slice(arr, F.greatest(
                F.size(arr) + F.lit(n + 1), F.lit(1)
            ), F.lit(-n))
        pos = _int_literal(operands[1], "$slice")
        n = _int_literal(operands[2], "$slice")
        if n <= 0:
            raise DocumentQueryError("$slice 3-arg count must be positive")
        start = pos + 1 if pos >= 0 else pos  # slice() shares the
        #                       negative-from-end convention for starts
        return F.slice(arr, start, n)
    if op in ("$filter", "$map"):
        if not (isinstance(operands, dict) and "input" in operands):
            raise DocumentQueryError(f"Bad {op}: {spec!r}")
        var = operands.get("as", "this")
        body_key = "cond" if op == "$filter" else "in"
        if body_key not in operands:
            raise DocumentQueryError(f"{op} needs {body_key!r}: {spec!r}")
        inp = _ref(operands["input"], resolve)
        body = operands[body_key]
        is_filter = op == "$filter"

        # a SINGLE-parameter closure: pyspark inspects the lambda's
        # arity to decide between (x) and (x, i) forms, so default-arg
        # captures would be mistaken for extra lambda parameters
        def make_lam(_body, _var, _resolve, _is_filter):
            def lam(x):
                c = _ref(_body, _scoped_resolve(_resolve, {_var: x}))
                return c.cast("boolean") if _is_filter else c

            return lam

        return (F.filter if is_filter else F.transform)(
            inp, make_lam(body, var, resolve, is_filter)
        )
    if op == "$reduce":
        if not (isinstance(operands, dict) and "input" in operands
                and "initialValue" in operands and "in" in operands):
            raise DocumentQueryError(f"Bad $reduce: {spec!r}")
        inp = _ref(operands["input"], resolve)
        init_spec = operands["initialValue"]
        body = operands["in"]
        if isinstance(init_spec, (int, float)) and not isinstance(
                init_spec, bool):
            # Mongo silently WIDENS the accumulator (int32 -> long ->
            # double) as the fold proceeds; Spark's F.aggregate
            # demands the init's type EQUAL the merge lambda's return
            # type, so a bare `initialValue: 0` over a bigint array
            # throws DATATYPE_MISMATCH (r11 judge find). Derive the
            # init's type from the fold itself: get(arr, -1) is a
            # guaranteed-null column OF THE ELEMENT TYPE (no ANSI
            # error), a probe-compiled BODY (both lambda vars bound to
            # the element probe) carries the merge's RESULT type (the
            # r12 suite caught an int-literal array whose body
            # references a LONG outer column — element type alone is
            # not enough), when(False, ...) never evaluates either,
            # and coalesce unifies the literal with both: the
            # accumulator adopts the widest of (literal, element,
            # body) exactly like Mongo's promotion ladder.
            probe = F.get(inp, F.lit(-1))
            body_probe = _ref(body, _scoped_resolve(
                resolve, {"value": probe, "this": probe}))
            init = F.coalesce(
                F.when(F.lit(False), probe),
                F.when(F.lit(False), body_probe),
                F.lit(init_spec))
        else:
            init = _ref(init_spec, resolve)

        def make_merge(_body, _resolve):
            def merge(acc, x):
                return _ref(_body, _scoped_resolve(
                    _resolve, {"value": acc, "this": x}
                ))

            return merge

        return F.aggregate(inp, init, make_merge(body, resolve))
    if op == "$convert":
        # {"input": e, "to": t, "onError": e?, "onNull": e?} — the
        # general form of the $toX family (Mongo 4.0). `to` is a
        # compile-time literal: a type name or Mongo's numeric code.
        # Conversion failures are LOUD without onError (ANSI cast
        # throws; Mongo errors there too); with onError the try_cast
        # substitutes the fallback for failures ONLY — null INPUT is
        # not a failure and follows onNull (default null), mirroring
        # the $dateFromString precedence contract. to:"date" accepts
        # both date-strings (parse) and numerics (MILLIS since epoch —
        # Mongo's convention; a bare Spark cast would read seconds)
        # via a try-parse cascade, and returns a timestamp.
        # Documented divergences: string→bool follows Spark's cast
        # table ('true'/'false'/'1'… convert; Mongo rejects every
        # string), decimal is decimal(38,10) not decimal128, and a
        # date→string render uses Spark's ISO form.
        if not (isinstance(operands, dict) and "input" in operands
                and "to" in operands):
            raise DocumentQueryError(f"Bad $convert: {spec!r}")
        to = operands["to"]
        if isinstance(to, int) and not isinstance(to, bool):
            to = _CONVERT_CODES.get(to, to)
        if to == "timestamp":  # r9b alias — same cascade as "date"
            to = "date"
        if not isinstance(to, str) or to not in _CONVERT_TYPES:
            raise DocumentQueryError(
                f"$convert bad 'to' {operands['to']!r} "
                f"(supported: {sorted(_CONVERT_TYPES)} or Mongo codes "
                f"{sorted(_CONVERT_CODES)})"
            )
        # Mongo's onError/onNull may be ANY type (a heterogeneous
        # result column) — a DataFrame column is single-typed, so a
        # fallback literal outside the target's type family either
        # runtime-crashes (ANSI casts 'missing' to double under
        # when()-coercion), dies in analysis (int vs boolean has no
        # common type), or SILENTLY RE-TYPES the whole column (an int
        # fallback with to:"string" coerced every success row back to
        # int) — all three shapes sweep-found (r12). Loud typed error
        # for literal fallbacks outside the family; expression
        # fallbacks must analyze to the target type.
        for fb_key in ("onError", "onNull"):
            fb = operands.get(fb_key)
            if fb is None or isinstance(fb, dict) or (
                    isinstance(fb, str) and fb.startswith("$")):
                continue  # absent / expression / field path
            if to == "date":
                # the date cascade yields a TIMESTAMP column and no
                # scalar literal is timestamp-typed: a bare string
                # fallback would silently re-type the whole column to
                # string under when()-coercion — the exact class this
                # guard exists to block (r13 advice find). Use an
                # expression fallback ({"$toDate": ...} / field path).
                ok = False
            elif to == "string":
                ok = isinstance(fb, str)
            elif to == "bool":
                ok = isinstance(fb, bool)
            else:
                ok = isinstance(fb, (int, float)) and not isinstance(
                    fb, bool)
            if not ok:
                raise DocumentQueryError(
                    f"$convert {fb_key} {fb!r} does not match target "
                    f"{to!r}: a DataFrame column is single-typed "
                    "(Mongo's heterogeneous fallback has no Spark "
                    "analog) — use a target-typed fallback"
                )
        x = _ref(operands["input"], resolve)
        if to == "date":
            s = x.cast("string")
            conv = F.coalesce(
                F.try_to_timestamp(s),
                F.timestamp_millis(s.try_cast("long")),
            )
        elif "onError" in operands:
            conv = x.try_cast(_CONVERT_TYPES[to])
        else:
            conv = x.cast(_CONVERT_TYPES[to])
        failed = x.isNotNull() & conv.isNull()
        if "onError" in operands:
            conv = F.when(
                failed, _ref(operands["onError"], resolve)
            ).otherwise(conv)
        elif to == "date":
            # the loud no-onError contract for the cascade path, where
            # try-parses would otherwise swallow the failure silently
            conv = F.when(
                failed,
                F.raise_error(F.lit(
                    "$convert: unparseable date input (use onError)")),
            ).otherwise(conv)
        if "onNull" in operands:
            conv = F.when(
                x.isNull(), _ref(operands["onNull"], resolve)
            ).otherwise(conv)
        return conv
    if op in ("$dateDiff", "$dateAdd", "$dateSubtract"):
        if not (isinstance(operands, dict) and "unit" in operands):
            raise DocumentQueryError(f"Bad {op}: {spec!r}")
        unit = operands["unit"]
        if op == "$dateDiff":
            if not ("startDate" in operands and "endDate" in operands):
                raise DocumentQueryError(f"{op} needs startDate+endDate")
            a = _ref(operands["startDate"], resolve)
            b = _ref(operands["endDate"], resolve)
            if unit == "day":
                # Mongo counts day BOUNDARY crossings, not 24h spans
                return F.datediff(F.to_date(b), F.to_date(a)).cast("long")
            if unit == "year":
                return (F.year(b) - F.year(a)).cast("long")
            if unit == "month":
                return (
                    (F.year(b) - F.year(a)) * F.lit(12)
                    + (F.month(b) - F.month(a))
                ).cast("long")
            if unit == "week":
                # boundary-crossing count under the Sunday default
                sow = _expr(
                    {"$dateTrunc": {"date": operands["startDate"],
                                    "unit": "week"}}, resolve)
                eow = _expr(
                    {"$dateTrunc": {"date": operands["endDate"],
                                    "unit": "week"}}, resolve)
                return (F.datediff(eow, sow) / F.lit(7)).cast("long")
            if unit in ("hour", "minute", "second"):
                # Mongo counts unit BOUNDARY crossings for every unit,
                # not elapsed spans — truncate both ends to the unit
                # first (10:59→11:01 is ONE hour boundary, not zero;
                # the r11 date property sweep's contract). For
                # 'second' trunc-then-diff and span coincide.
                secs = {"hour": 3600, "minute": 60, "second": 1}[unit]
                ta = F.date_trunc(unit, a.cast("timestamp")).cast("long")
                tb = F.date_trunc(unit, b.cast("timestamp")).cast("long")
                return ((tb - ta) / F.lit(secs)).cast("long")
            raise DocumentQueryError(f"{op} bad unit: {unit!r}")
        if "startDate" not in operands or "amount" not in operands:
            raise DocumentQueryError(f"{op} needs startDate+amount")
        amt = _int_literal(operands["amount"], op)
        if op == "$dateSubtract":
            amt = -amt
        d = _ref(operands["startDate"], resolve)
        if unit not in ("year", "quarter", "month", "week", "day",
                        "hour", "minute", "second"):
            raise DocumentQueryError(f"{op} bad unit: {unit!r}")
        if unit == "quarter":
            # Spark's interval literal has no 'quarter' unit — the
            # bare f-string compiled a PARSE_SYNTAX_ERROR (caught by
            # the r11 date property sweep); a quarter IS 3 calendar
            # months, same clamping
            unit, amt = "month", amt * 3
        return d + F.expr(f"interval {amt} {unit}")
    if op == "$dateToString":
        # {"format": "%Y-%m-%d…", "date": e, "onNull": e?} — rendered
        # PIECE-WISE: each %-specifier becomes its own date_format()
        # and literal runs become plain lit()s, concatenated. One
        # translated pattern would silently merge adjacent same-field
        # specifiers ('%m%m' → 'MMMM' → 'March' — caught by the r9
        # property sweep); the piece-wise concat has no such ambiguity
        # and needs no literal quoting at all. Still one codegen
        # projection. Default format is Mongo's ISO shape. "timezone"
        # is refused (the engine normalizes timestamps to UTC on
        # ingest — sources/parquet.py — so a per-expression zone would
        # silently double-shift).
        if not (isinstance(operands, dict) and "date" in operands):
            raise DocumentQueryError(f"$dateToString needs date: {spec!r}")
        if "timezone" in operands:
            raise DocumentQueryError(
                "$dateToString timezone is not supported: timestamps "
                "are UTC-normalized on ingest"
            )
        fmt = operands.get("format", "%Y-%m-%dT%H:%M:%S.%LZ")
        if not isinstance(fmt, str):
            raise DocumentQueryError(f"$dateToString bad format: {fmt!r}")
        dcol = _ref(operands["date"], resolve)
        pieces = [
            F.lit(text) if kind == "lit" else F.date_format(dcol, text)
            for kind, text in _mongo_fmt_tokens(fmt, "$dateToString")
        ]
        body = F.concat(*pieces) if pieces else F.lit("")
        # a literal-only format never nulls out on its own — gate on
        # the date so a null input still follows Mongo's null/onNull
        # contract
        rendered = F.when(dcol.isNotNull(), body)
        if "onNull" in operands:
            rendered = rendered.otherwise(_ref(operands["onNull"], resolve))
        return rendered
    if op == "$dateFromString":
        # {"dateString": e, "format": literal?, "onError": e?,
        # "onNull": e?} → to_timestamp. Without onError the parse is
        # STRICT (ANSI to_timestamp raises on malformed input — Mongo
        # throws too); with onError the try_ variant substitutes the
        # fallback for parse failures only. onNull handles null INPUT
        # before the parse, mirroring Mongo's precedence.
        if not (isinstance(operands, dict) and "dateString" in operands):
            raise DocumentQueryError(
                f"$dateFromString needs dateString: {spec!r}"
            )
        if "timezone" in operands:
            raise DocumentQueryError(
                "$dateFromString timezone is not supported: timestamps "
                "are UTC-normalized on ingest"
            )
        s = _ref(operands["dateString"], resolve)
        fmt = operands.get("format")
        if fmt is not None:
            if not isinstance(fmt, str) or fmt.startswith("$"):
                raise DocumentQueryError(
                    f"$dateFromString format must be a literal: {fmt!r}"
                )
            pat = _mongo_datetime_fmt(fmt, "$dateFromString")
            parsed = (F.try_to_timestamp(s, F.lit(pat))
                      if "onError" in operands
                      else F.to_timestamp(s, pat))
        else:
            parsed = (F.try_to_timestamp(s) if "onError" in operands
                      else F.to_timestamp(s))
        if "onError" in operands:
            parsed = F.coalesce(parsed, _ref(operands["onError"], resolve))
        if "onError" in operands or "onNull" in operands:
            # null INPUT is not a parse failure: Mongo's onNull —
            # defaulting to null — takes precedence over onError, so
            # gate before the coalesce above can see the null-input
            # miss
            on_null = (_ref(operands["onNull"], resolve)
                       if "onNull" in operands
                       else F.lit(None).cast("timestamp"))
            parsed = F.when(s.isNull(), on_null).otherwise(parsed)
        return parsed
    if op == "$dateFromParts":
        # {"year": e, "month": e?, "day": e?, "hour": e?, "minute": e?,
        # "second": e?, "millisecond": e?} → make_timestamp (ONE native
        # Catalyst call; milliseconds ride the fractional-seconds
        # argument). STRICT by default: an out-of-range part (month 13)
        # throws under ANSI — a documented divergence from Mongo's
        # carry-and-pin coercion (month 13 → January of year+1), which
        # no single Catalyst expression reproduces. The engine-extension
        # "onError"/"onNull" keys mirror the sibling $dateFromString
        # contract: onError switches to try_make_timestamp + fallback
        # for out-of-range parts; a null YEAR returns onNull (default
        # null) first. The ISO week-date form and timezone are refused
        # pointedly.
        if not isinstance(operands, dict):
            raise DocumentQueryError(f"$dateFromParts needs year: {spec!r}")
        if "timezone" in operands:
            raise DocumentQueryError(
                "$dateFromParts timezone is not supported: timestamps "
                "are UTC-normalized on ingest"
            )
        iso_keys = sorted(k for k in operands if k.startswith("iso"))
        if iso_keys:
            raise DocumentQueryError(
                f"$dateFromParts ISO week-date fields {iso_keys} are "
                "not supported — build the date from year/month/day"
            )
        if "year" not in operands:
            raise DocumentQueryError(f"$dateFromParts needs year: {spec!r}")
        known = {"year", "month", "day", "hour", "minute", "second",
                 "millisecond", "onError", "onNull"}
        bad_keys = sorted(set(operands) - known)
        if bad_keys:
            raise DocumentQueryError(
                f"$dateFromParts unknown fields: {bad_keys}"
            )
        part = {
            k: (_ref(operands[k], resolve) if k in operands else F.lit(d))
            for k, d in (("year", 0), ("month", 1), ("day", 1),
                         ("hour", 0), ("minute", 0), ("second", 0),
                         ("millisecond", 0))
        }
        secs = (
            part["second"].cast("decimal(16,6)")
            + part["millisecond"].cast("decimal(16,6)") / F.lit(1000)
        ).cast("decimal(16,6)")
        made_args = [part["year"].cast("int"), part["month"].cast("int"),
                     part["day"].cast("int"), part["hour"].cast("int"),
                     part["minute"].cast("int"), secs]
        if "onError" in operands:
            made = F.coalesce(
                F.try_make_timestamp(*made_args),
                _ref(operands["onError"], resolve).cast("timestamp"),
            )
        else:
            made = F.make_timestamp(*made_args)
        if "onError" in operands or "onNull" in operands:
            on_null = (_ref(operands["onNull"], resolve)
                       if "onNull" in operands
                       else F.lit(None).cast("timestamp"))
            made = F.when(part["year"].isNull(), on_null).otherwise(made)
        return made
    if op == "$regexMatch":
        inp, pattern = _regex_operands(op, operands)
        return F.regexp_like(_ref(inp, resolve), F.lit(pattern))
    if op == "$regexFind":
        # First-match document {match, idx, captures} or null when
        # nothing matches — Mongo's shape, all native regexp_* calls on
        # ONE input expression (codegen CSEs the repeated pattern).
        # idx is the 0-based CODE-POINT offset of the match — Mongo's
        # contract ("the code point index of the matching string").
        # regexp_instr would report Java UTF-16 units (diverging on
        # astral-plane input); instead idx = length(s) -
        # length(regexp_replace(s, '(?s)^.*?(?=pat)', '')): the lazy
        # anchored prefix up to the first match is stripped and both
        # length() calls count code points. The lookahead evaluates
        # over the FULL string, so assertions keep their left context.
        # Documented divergence: a non-participating capture group
        # yields '' (regexp_extract's convention), not null.
        import re as _re_mod

        inp, pattern = _regex_operands(op, operands)
        try:
            n_groups = _re_mod.compile(_python_probe(pattern)).groups
        except _re_mod.error as exc:
            raise DocumentQueryError(
                f"$regexFind bad pattern {pattern!r}: {exc}"
            ) from exc
        s = _ref(inp, resolve)
        lit_pat = F.lit(pattern)
        first_idx = (
            F.length(s)
            - F.length(
                F.regexp_replace(s, F.lit(f"(?s)^.*?(?={pattern})"), F.lit(""))
            )
        )
        doc = F.struct(
            F.regexp_extract(s, pattern, 0).alias("match"),
            first_idx.cast("long").alias("idx"),
            F.array(*[
                F.regexp_extract(s, pattern, g)
                for g in range(1, n_groups + 1)
            ]).cast("array<string>").alias("captures"),
        )
        return F.when(F.regexp_like(s, lit_pat), doc)
    if op == "$regexFindAll":
        # Array of Mongo's {match, idx, captures} docs for EVERY match.
        # regexp_extract_all pulls the full match and each capture
        # group (the per-group arrays align by match ordinal — one
        # codegen scan per group), and idx comes from a left-fold over
        # the matches that re-searches the remaining suffix from the
        # previous match's end (empty matches advance one position,
        # Java's rule). Offsets are 0-based CODE-POINT indexes —
        # Mongo's contract — via the $regexFind trick: the lazy
        # anchored prefix up to the next match is stripped and the two
        # length() calls count code points (regexp_instr would report
        # UTF-16 units, diverging on astral-plane input; the property
        # sweep pins code points with a non-BMP case). All native
        # Catalyst lambdas — no UDF, no extra stage. Null input
        # returns [] (the Mongo contract; $regexFind returns null).
        # Patterns with left-context assertions are refused: the
        # suffix re-search would see a spurious string-start and could
        # misreport idx — $regexFind's full-string search stays exact
        # for the first match. REMAINING DOCUMENTED DIVERGENCE: an
        # EMPTY-MATCHABLE pattern (e.g. 'a*') over astral-plane input
        # yields one extra zero-length match per astral char — Java's
        # Matcher advances by UTF-16 code unit after an empty match and
        # so also matches inside the surrogate pair, where Mongo's
        # PCRE advances by code point. Non-empty matches and all BMP
        # input are exact (sweep-pinned).
        import re as _re_mod

        inp, pattern = _regex_operands(op, operands)
        try:
            n_groups = _re_mod.compile(_python_probe(pattern)).groups
        except _re_mod.error as exc:
            raise DocumentQueryError(
                f"$regexFindAll bad pattern {pattern!r}: {exc}"
            ) from exc
        if _has_left_context_assertion(pattern):
            raise DocumentQueryError(
                "$regexFindAll cannot compute exact per-match offsets "
                "for patterns with left-context assertions (^, \\b, "
                "\\B, lookbehind) — use $regexFind (first match) or "
                "$regexMatch (predicate)"
            )
        s = _ref(inp, resolve)
        lit_pat = F.lit(pattern)
        matches = F.regexp_extract_all(s, lit_pat, F.lit(0))

        prefix_pat = F.lit(f"(?s)^.*?(?={pattern})")

        def _idx_step(acc: Column, m: Column) -> Column:
            suffix = s.substr(acc["pos"] + F.lit(1), F.length(s))
            found = (
                acc["pos"]
                + F.length(suffix)
                - F.length(F.regexp_replace(suffix, prefix_pat, F.lit("")))
            ).cast("int")
            return F.struct(
                (found + F.greatest(F.length(m), F.lit(1))).alias("pos"),
                F.concat(
                    acc["out"], F.array(found.cast("long"))
                ).alias("out"),
            )

        idxs = F.aggregate(
            matches,
            F.struct(
                F.lit(0).cast("int").alias("pos"),
                F.array().cast("array<long>").alias("out"),
            ),
            _idx_step,
            lambda acc: acc["out"],
        )
        docs = F.transform(
            matches,
            lambda m, i: F.struct(
                m.alias("match"),
                F.element_at(idxs, i + F.lit(1)).alias("idx"),
                F.array(*[
                    F.element_at(
                        F.regexp_extract_all(s, lit_pat, F.lit(g)),
                        i + F.lit(1),
                    )
                    for g in range(1, n_groups + 1)
                ]).cast("array<string>").alias("captures"),
            ),
        )
        return F.coalesce(
            docs,
            F.array().cast(
                "array<struct<match:string,idx:bigint,"
                "captures:array<string>>>"
            ),
        )
    if op == "$let":
        # {"vars": {name: e, …}, "in": body} — vars evaluate in the
        # ENCLOSING scope (Mongo's rule: a var may not see its
        # siblings), then the body resolves '$$name' through the same
        # scoped-resolver machinery the array lambdas use.
        if not (isinstance(operands, dict)
                and isinstance(operands.get("vars"), dict)
                and "in" in operands):
            raise DocumentQueryError(f"Bad $let: {spec!r}")
        bindings = {
            name: _ref(val, resolve)
            for name, val in operands["vars"].items()
        }
        return _ref(operands["in"], _scoped_resolve(resolve, bindings))
    if op == "$getField":
        # {"field": literal, "input": e} pulls a struct field / map key;
        # the string shorthand reads a top-level field of the current
        # document (dots are LITERAL in Mongo's $getField — that is its
        # reason to exist — so the shorthand refuses them rather than
        # silently nesting).
        if isinstance(operands, str):
            if "." in operands:
                raise DocumentQueryError(
                    "$getField shorthand with a dotted name needs the "
                    "{field, input} form"
                )
            return _ref("$" + operands, resolve)
        if not (isinstance(operands, dict) and "field" in operands
                and "input" in operands):
            raise DocumentQueryError(f"Bad $getField: {spec!r}")
        field = operands["field"]
        if not isinstance(field, str) or field.startswith("$"):
            raise DocumentQueryError(
                f"$getField field must be a literal string: {field!r}"
            )
        return _ref(operands["input"], resolve)[field]
    # NOTE: $convert compiles in the r12 branch above (millis-date
    # cascade, single-typed fallback guard) — the earlier r9b cast
    # form was folded into it.
    if op == "$literal":
        # verbatim value, no '$' interpretation — scalars, flat lists,
        # and document literals compile to lit/array/struct of literals
        def build(v: Any) -> Column:
            if isinstance(v, dict):
                if not v:
                    raise DocumentQueryError("$literal: empty document")
                return F.struct(*[build(x).alias(k) for k, x in v.items()])
            if isinstance(v, list):
                return F.array(*[build(x) for x in v])
            return F.lit(v)

        return build(operands)
    if op in ("$trim", "$ltrim", "$rtrim") and isinstance(operands, dict):
        # Mongo's canonical {input, chars?} form; the chars set trims
        # via an anchored character-class regexp_replace (codegen
        # native). The bare-operand form stays in _EXPR_OPS.
        import re as _re_mod

        if "input" not in operands:
            raise DocumentQueryError(f"{op} needs input: {spec!r}")
        s = _ref(operands["input"], resolve)
        chars = operands.get("chars")
        if chars is None:
            return {"$trim": F.trim, "$ltrim": F.ltrim,
                    "$rtrim": F.rtrim}[op](s)
        if not isinstance(chars, str) or chars.startswith("$") or not chars:
            raise DocumentQueryError(
                f"{op} chars must be a non-empty literal string: {chars!r}"
            )
        cls = "[" + "".join(_re_mod.escape(c) for c in set(chars)) + "]+"
        pat = {"$trim": f"^{cls}|{cls}$", "$ltrim": f"^{cls}",
               "$rtrim": f"{cls}$"}[op]
        return F.regexp_replace(s, pat, "")
    if op == "$sortArray":
        # {input, sortBy: 1|-1} — scalar element sort only; the
        # field-spec sortBy form (document elements) is refused: a
        # comparator over arbitrary struct shapes is not compilable
        # without the element schema
        if not (isinstance(operands, dict) and "input" in operands
                and operands.get("sortBy") in (1, -1)):
            raise DocumentQueryError(
                f"$sortArray needs input + sortBy 1|-1: {spec!r}"
            )
        arr = F.array_sort(_ref(operands["input"], resolve))
        return arr if operands["sortBy"] == 1 else F.reverse(arr)
    if op == "$range":
        # [start, end, step?] — end-exclusive, literal nonzero step;
        # an empty range is [] (the CASE branch keeps sequence() from
        # evaluating with inverted bounds)
        if not (isinstance(operands, list) and len(operands) in (2, 3)):
            raise DocumentQueryError(f"$range needs 2-3 operands: {spec!r}")
        step = _int_literal(operands[2], "$range") if len(operands) == 3 else 1
        if step == 0:
            raise DocumentQueryError("$range step must be nonzero")
        a = _ref(operands[0], resolve).cast("int")
        b = _ref(operands[1], resolve).cast("int")
        if step > 0:
            cond, stop = a < b, b - F.lit(1)
        else:
            cond, stop = a > b, b + F.lit(1)
        return F.when(cond, F.sequence(a, stop, F.lit(step))).otherwise(
            F.array().cast("array<int>")
        )
    if op == "$zip":
        # {"inputs": [a, b], "useLongestLength": bool} — two inputs,
        # pairs as 2-element arrays (Mongo's shape). Shortest-length
        # truncation by default; longest pads with null via zip_with's
        # own convention. Element types must share a common Spark type
        # (heterogeneous zips fail analysis loudly).
        if not (isinstance(operands, dict)
                and isinstance(operands.get("inputs"), list)
                and len(operands["inputs"]) == 2):
            raise DocumentQueryError(
                f"$zip compiles exactly 2 inputs: {spec!r}"
            )
        a = _ref(operands["inputs"][0], resolve)
        b = _ref(operands["inputs"][1], resolve)
        if not operands.get("useLongestLength", False):
            n = F.least(F.size(a), F.size(b))
            a, b = F.slice(a, 1, n), F.slice(b, 1, n)
        return F.zip_with(a, b, lambda x, y: F.array(x, y))
    if op == "$replaceOne":
        # {input, find (literal), replacement} — locate the FIRST
        # occurrence, splice around it; no match returns the input
        # unchanged (Mongo's contract)
        if not (isinstance(operands, dict) and "input" in operands
                and "find" in operands and "replacement" in operands):
            raise DocumentQueryError(f"Bad $replaceOne: {spec!r}")
        find = operands["find"]
        if not isinstance(find, str) or find.startswith("$") or not find:
            raise DocumentQueryError(
                f"$replaceOne find must be a non-empty literal string: "
                f"{find!r}"
            )
        s = _ref(operands["input"], resolve)
        repl = _ref(operands["replacement"], resolve)
        pos = F.locate(find, s)
        spliced = F.concat(
            F.substring(s, F.lit(1), pos - F.lit(1)),
            repl,
            F.substring(s, pos + F.lit(len(find)), F.length(s)),
        )
        return F.when(pos == 0, s).otherwise(spliced)
    if op == "$dateToParts":
        # {date} → Mongo's parts document (calendar form; iso8601
        # variant not compiled)
        if not (isinstance(operands, dict) and "date" in operands):
            raise DocumentQueryError(f"$dateToParts needs date: {spec!r}")
        if operands.get("iso8601"):
            raise DocumentQueryError(
                "$dateToParts iso8601 form is not compiled — use "
                "$isoWeek/$isoDayOfWeek/$isoWeekYear"
            )
        d = _ref(operands["date"], resolve)
        return F.struct(
            F.year(d).alias("year"), F.month(d).alias("month"),
            F.dayofmonth(d).alias("day"), F.hour(d).alias("hour"),
            F.minute(d).alias("minute"), F.second(d).alias("second"),
            _EXPR_OPS["$millisecond"](d).alias("millisecond"),
        )
    if op == "$replaceAll":
        # {"input", "find", "replacement"} — Mongo replaces LITERAL
        # substrings; F.replace is the non-regex replacement (all three
        # operands may be expressions).
        if not (isinstance(operands, dict) and "input" in operands
                and "find" in operands and "replacement" in operands):
            raise DocumentQueryError(f"Bad $replaceAll: {spec!r}")
        return F.replace(
            _ref(operands["input"], resolve),
            _ref(operands["find"], resolve),
            _ref(operands["replacement"], resolve),
        )
    if op == "$indexOfCP":
        # [string, substring, start?, end?] → 0-based index of the
        # first occurrence, -1 when absent (locate's 0 → -1). The
        # substring and bounds must be literals: locate() folds the
        # needle into the codegen'd expression.
        if not (isinstance(operands, list) and len(operands) in (2, 3, 4)):
            raise DocumentQueryError(f"$indexOfCP needs 2-4 operands: {spec!r}")
        needle = operands[1]
        if not isinstance(needle, str) or needle.startswith("$"):
            raise DocumentQueryError(
                f"$indexOfCP substring must be a literal string: {needle!r}"
            )
        s = _ref(operands[0], resolve)
        if len(operands) == 4:
            end = _int_literal(operands[3], "$indexOfCP")
            # Mongo's end bound is exclusive and CONTAINING: the whole
            # match must lie within [start, end) — searching the
            # end-length prefix reproduces that exactly
            s = F.substring(s, 1, end)
        start = (_int_literal(operands[2], "$indexOfCP")
                 if len(operands) >= 3 else 0)
        if start < 0:
            raise DocumentQueryError("$indexOfCP start must be >= 0")
        return (F.locate(needle, s, start + 1) - F.lit(1)).cast("long")
    fn = _EXPR_OPS.get(op)
    if fn is None:
        if op == "$function":
            raise DocumentQueryError(
                "$function executes JavaScript, which this engine does "
                "not ship — express the computation with aggregation "
                "expression operators (the dialect covers the string/"
                "array/date/object surface)"
            )
        if op == "$rand":
            raise DocumentQueryError(
                "$rand is nondeterministic; this engine's sampling "
                "contract is deterministic — use $sample (md5-keyed "
                "draw) or an md5/xxhash64 expression over a key column"
            )
        raise DocumentQueryError(f"Unsupported expression operator: {op}")
    args = operands if isinstance(operands, list) else [operands]
    try:
        return fn(*[_ref(a, resolve) for a in args])
    except TypeError as exc:
        # a fixed-arity lambda called with the wrong operand count —
        # surface the dialect's typed error, not a raw TypeError
        raise DocumentQueryError(
            f"{op}: bad operand count ({len(args)}): {exc}"
        ) from exc


def _acc_selection_ops(
    alias: str, op: str, arg: Any, cond: Column, resolve=None
) -> Column:
    """Mongo 5.2/7.0 selection + percentile accumulators, all native
    Catalyst aggregates:

    - ``$topN``/``$bottomN {output, sortBy, n}`` — collect
      ``struct(sort keys…, output)`` (masked rows collapse to NULL and
      collect_list skips them), ``array_sort`` with a chained
      COMPARATOR honoring each key's ±1 direction, slice n, project the
      output field. $bottomN sorts with every direction REVERSED and
      re-reverses the slice, so the result reads in Mongo's sort order.
      Sort-key ties fall through to the OUTPUT value ascending — the
      module's determinism convention (Mongo leaves ties unspecified);
      null sort keys follow Spark comparator semantics (group them out
      with $match if they matter). n must be a literal positive int
      (Mongo's expression-n is not compiled).
    - ``$top``/``$bottom {output, sortBy}`` — the N=1 forms, returning
      the scalar itself (element_at of the same plan, no extra pass).
    - ``$minN``/``$maxN {input, n}`` — N smallest/largest BY VALUE:
      sort_array over the collected values, slice n ($maxN descending,
      Mongo's output order).
    - ``$firstN``/``$lastN`` — loud refusal: they are DOCUMENT-order
      defined, which a distributed group cannot reproduce; use
      $minN/$maxN or $setWindowFields with sortBy.
    - ``$median {input, method: 'approximate'}`` /
      ``$percentile {input, p: […], method}`` — compiled to Spark's
      EXACT interpolated percentile (Mongo's 'approximate' names its
      t-digest estimator; the exact answer is a documented
      better-accuracy divergence, same convention as the $push sort).
      method is required by Mongo and validated here.

    Scale: every one of these is a single map-side-combinable aggregate
    (collect/percentile partials merge), never a per-group re-scan; the
    top/bottom collect is bounded by the group's row count — at 100 TB
    use $match/$sample shaping for pathological groups (same guidance
    as $push).
    """
    if op in ("$firstN", "$lastN"):
        raise DocumentQueryError(
            f"{op} is document-order defined — a distributed group has "
            "no deterministic document order; precede the $group with "
            "a $sort (the sorted form compiles, see _first_last_agg), "
            "or use $minN/$maxN (value order) / $setWindowFields with "
            "sortBy"
        )
    if not isinstance(arg, dict):
        raise DocumentQueryError(f"Bad {op} spec: {arg!r}")

    def _lit_n() -> int:
        n = arg.get("n")
        if not isinstance(n, int) or isinstance(n, bool) or n < 1:
            raise DocumentQueryError(
                f"{op} needs a literal positive int n, got {n!r}"
            )
        return n

    if op in ("$minN", "$maxN"):
        if "input" not in arg:
            raise DocumentQueryError(f"{op} needs input, got {arg!r}")
        col = F.when(cond, _ref(arg["input"], resolve))
        arr = F.sort_array(F.collect_list(col), asc=(op == "$minN"))
        return F.slice(arr, 1, _lit_n()).alias(alias)
    if op in ("$median", "$percentile"):
        if arg.get("method") != "approximate":
            raise DocumentQueryError(
                f"{op} requires method: 'approximate' (Mongo's contract; "
                "compiled to the EXACT interpolated percentile — a "
                "documented better-accuracy divergence)"
            )
        if "input" not in arg:
            raise DocumentQueryError(f"{op} needs input, got {arg!r}")
        col = F.when(cond, _ref(arg["input"], resolve))
        if op == "$median":
            return F.median(col).alias(alias)
        ps = arg.get("p")
        if not (
            isinstance(ps, list)
            and ps
            and all(
                isinstance(p, (int, float))
                and not isinstance(p, bool)
                and 0 <= p <= 1
                for p in ps
            )
        ):
            raise DocumentQueryError(
                f"$percentile needs p: a list of fractions in [0,1], "
                f"got {ps!r}"
            )
        return F.percentile(
            col, F.array(*[F.lit(float(p)) for p in ps])
        ).alias(alias)

    # $topN/$bottomN/$top/$bottom
    n = 1 if op in ("$top", "$bottom") else _lit_n()
    row, finish = _topn_parts(op, arg, cond, resolve)
    out = finish(F.collect_list(row), n)
    if op in ("$top", "$bottom"):
        return F.element_at(out, 1).alias(alias)
    return out.alias(alias)


def _topn_parts(op: str, arg: dict, cond: Column, resolve=None):
    """Shared $topN-family machinery for the $group AND window forms:
    validate {output, sortBy}, build the ``struct(sort keys…, output)``
    row (masked rows collapse to NULL — both collect_list forms skip
    them), and return ``(row, finish)`` where finish(collected, n)
    comparator-sorts the collected array per the spec's ±1 directions
    (ties → output ascending, the dialect convention), slices n,
    projects the output field, and re-reverses the bottom forms into
    Mongo's sort order."""
    if "output" not in arg or "sortBy" not in arg:
        raise DocumentQueryError(f"{op} needs output + sortBy, got {arg!r}")
    sort_by = arg["sortBy"]
    if not (
        isinstance(sort_by, dict)
        and sort_by
        and all(d in (1, -1) for d in sort_by.values())
    ):
        raise DocumentQueryError(f"{op} bad sortBy: {sort_by!r}")
    items = list(sort_by.items())
    bottom = op in ("$bottomN", "$bottom")
    row = F.when(
        cond,
        F.struct(
            *[
                _ref(f"${f}", resolve).alias(f"__k{i}")
                for i, (f, _d) in enumerate(items)
            ],
            _ref(arg["output"], resolve).alias("__o"),
        ),
    )

    def comparator(l: Column, r: Column) -> Column:
        # ties on every sort key fall through to the output ascending
        cmpe = (
            F.when(l["__o"] < r["__o"], F.lit(-1))
            .when(l["__o"] > r["__o"], F.lit(1))
            .otherwise(F.lit(0))
        )
        for i, (_f, d) in reversed(list(enumerate(items))):
            d_eff = -d if bottom else d
            lt = F.lit(-1 if d_eff >= 0 else 1)
            gt = F.lit(1 if d_eff >= 0 else -1)
            ki = f"__k{i}"
            cmpe = (
                F.when(l[ki] < r[ki], lt)
                .when(l[ki] > r[ki], gt)
                .otherwise(cmpe)
            )
        return cmpe

    def finish(collected: Column, n: int) -> Column:
        arr = F.slice(F.array_sort(collected, comparator), 1, n)
        out = F.transform(arr, lambda x: x["__o"])
        return F.reverse(out) if bottom else out

    return row, finish


def _acc_to_agg_masked(
    alias: str, spec: dict[str, Any], cond: Column, resolve=None
) -> Column:
    """THE accumulator dispatch table (single source of truth —
    :func:`_acc_to_agg` delegates here with a constant-true mask, which
    Catalyst folds away). A non-trivial ``cond`` aggregates only rows
    satisfying it — the per-facet ``$match`` prelude folded INTO the
    shared grouping-sets aggregate (``agg(when(cond, x))``; Spark
    aggregates skip nulls, so unmatched rows contribute nothing),
    keeping $facet preludes on the single-scan plan instead of one scan
    per facet.

    $push/$addToSet note: Mongo preserves document/insertion order;
    Spark's collect_list order is partition-dependent, so the
    translation SORTS the collected array — deterministic (and
    oracle-hashable) at the cost of diverging from Mongo's order
    contract, which no distributed engine can honor anyway."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise DocumentQueryError(f"Bad accumulator for {alias!r}: {spec!r}")
    op, arg = next(iter(spec.items()))
    if op in ("$count",) or (op == "$sum" and arg == 1):
        return F.count(F.when(cond, F.lit(1))).alias(alias)
    if op in ("$topN", "$bottomN", "$top", "$bottom", "$minN", "$maxN",
              "$firstN", "$lastN", "$median", "$percentile"):
        # spec-dict accumulators (Mongo 5.2/7.0) — dispatched BEFORE the
        # masked _ref: their args are option dicts, not expressions
        return _acc_selection_ops(alias, op, arg, cond, resolve)
    masked = F.when(cond, _ref(arg, resolve))
    if op == "$sum":
        # documented divergence: Mongo's $sum returns 0 when a group
        # has no numeric values; Spark's sum (and the DuckDB oracle
        # twins) return NULL there — the SQL convention this engine
        # keeps (coalescing would desync every existing facet twin)
        return F.sum(masked).alias(alias)
    if op == "$avg":
        return F.avg(masked).alias(alias)
    if op == "$min":
        return F.min(masked).alias(alias)
    if op == "$max":
        return F.max(masked).alias(alias)
    if op == "$push":
        return F.sort_array(F.collect_list(masked)).alias(alias)
    if op == "$addToSet":
        return F.sort_array(F.collect_set(masked)).alias(alias)
    if op == "$stdDevSamp":
        return F.stddev_samp(masked).alias(alias)
    if op == "$stdDevPop":
        return F.stddev_pop(masked).alias(alias)
    if op == "$accumulator":
        raise DocumentQueryError(
            "$accumulator executes JavaScript, which this engine does "
            "not ship — compose the built-in accumulators ($sum/$avg/"
            "$push/$firstN/$mergeObjects/…) with dialect expressions "
            "instead"
        )
    raise DocumentQueryError(f"Unsupported accumulator: {op}")


def facet_group(df: DataFrame, facets: dict[str, list[dict]]) -> DataFrame:
    """``$facet`` restricted to the analytic subset: every sub-pipeline
    is an optional ``$match`` prelude followed by exactly ONE ``$group``
    stage with a scalar ``"$field"`` key. All facets compile into a
    single GROUPING SETS pass — Mongo executes N sub-pipelines over the
    input; the Spark translation scans the collection ONCE, Expands
    each row into its facet groupings map-side, and one shuffle serves
    every facet (the q118 lattice machinery applied to the document
    plane).

    Generality within the single scan:
    - a facet's ``$match`` prelude does NOT fall back to a second scan:
      its condition is folded into that facet's accumulators as
      ``agg(when(cond, x))`` masks, and groups whose rows all fail the
      prelude are dropped by a per-facet matched-row count;
    - facets may declare DIFFERENT accumulator sets (an r6 relaxation —
      Mongo never required them to match): each facet computes its own
      namespaced aggregates, and the flattened output schema is the
      ordered union of accumulator names with NULLs where a facet
      doesn't define one.
    Output is the flattened long form ``(facet, _id,
    <union of accumulators...>)``.

    Scale: one scan + one shuffle regardless of facet count, preludes,
    or accumulator mix, vs N scans for the sub-pipeline-per-facet
    translation.
    """
    names: list[str] = []
    fields: list[str] = []
    conds: list[Column | None] = []
    accs_list: list[dict[str, Any]] = []
    for name, sub in facets.items():
        if not isinstance(sub, list) or not all(
            isinstance(st, dict) for st in sub
        ):
            raise DocumentQueryError(
                f"$facet sub-pipeline {name!r} must be a stage list"
            )
        cond: Column | None = None
        stages = list(sub)
        if len(stages) == 2 and set(stages[0]) == {"$match"}:
            cond = filter_condition(stages[0]["$match"])
            stages = stages[1:]
        if len(stages) != 1 or set(stages[0]) != {"$group"}:
            raise DocumentQueryError(
                f"$facet sub-pipeline {name!r} must be a single $group "
                "stage (optionally preceded by one $match)"
            )
        g = stages[0]["$group"]
        gid = g.get("_id")
        if not (isinstance(gid, str) and gid.startswith("$")):
            raise DocumentQueryError(
                f"$facet group key for {name!r} must be a '$field' reference"
            )
        if gid[1:] in fields:
            raise DocumentQueryError(
                "$facet group keys must be distinct fields"
            )
        accs = {k: v for k, v in g.items() if k != "_id"}
        # the masked-copy compilation below namespaces per-facet
        # columns as '<alias>__<idx>' plus internal '__n__<idx>' /
        # '__g_<field>' helpers — a user alias shaped like any of
        # those would collide into an ambiguous-column
        # AnalysisException at runtime, so refuse it loudly here
        for a in accs:
            if (
                a == "__n"
                or a.startswith("__g_")
                or re.fullmatch(r".+__\d+", a)
            ):
                raise DocumentQueryError(
                    f"$facet accumulator alias {a!r} in {name!r} "
                    "collides with the compiler's reserved "
                    "'__n'/'__g_*'/'*__<n>' namespace — rename it"
                )
        names.append(name)
        fields.append(gid[1:])
        conds.append(cond)
        accs_list.append(accs)
    if not names:
        raise DocumentQueryError("$facet requires at least one facet")
    any_prelude = any(c is not None for c in conds)
    uniform = all(a == accs_list[0] for a in accs_list)
    # ordered union of accumulator aliases across facets
    out_aliases: list[str] = []
    for accs in accs_list:
        for a in accs:
            if a not in out_aliases:
                out_aliases.append(a)
    if uniform and not any_prelude:
        aggs = [_acc_to_agg(a, s) for a, s in accs_list[0].items()]
    else:
        # one masked copy of EACH facet's accumulator set, plus a
        # matched-row count to drop groups the prelude fully excludes
        aggs = []
        for i, (c, accs) in enumerate(zip(conds, accs_list)):
            mask = c if c is not None else F.lit(True)
            aggs.extend(
                _acc_to_agg_masked(f"{a}__{i}", s, mask)
                for a, s in accs.items()
            )
            aggs.append(F.count(F.when(mask, F.lit(1))).alias(f"__n__{i}"))
    # grouping() indicators are only legal inside the aggregate list —
    # compute them there, pick the facet name from them afterwards
    gcols = [F.grouping(f).alias(f"__g_{f}") for f in fields]
    grouped = df.groupingSets(
        [[F.col(f)] for f in fields], *[F.col(f) for f in fields]
    ).agg(*aggs, *gcols)
    facet_col = None
    for name, field in zip(names, fields):
        cond = F.col(f"__g_{field}") == 0
        facet_col = (
            F.when(cond, F.lit(name))
            if facet_col is None
            else facet_col.when(cond, F.lit(name))
        )
    id_col = F.coalesce(*[F.col(f).cast("string") for f in fields])
    if uniform and not any_prelude:
        return grouped.select(
            facet_col.alias("facet"),
            id_col.alias("_id"),
            *out_aliases,
        ).orderBy("facet", "_id")

    def pick(alias: str) -> Column:
        out = None
        for i, field in enumerate(fields):
            if alias != "__n" and alias not in accs_list[i]:
                continue  # this facet doesn't define the accumulator
            is_facet = F.col(f"__g_{field}") == 0
            val = F.col(f"{alias}__{i}")
            out = F.when(is_facet, val) if out is None else out.when(is_facet, val)
        return out.alias(alias)

    keep = pick("__n")  # matched-row count for THIS row's facet
    return (
        grouped.select(
            facet_col.alias("facet"),
            id_col.alias("_id"),
            *[pick(a) for a in out_aliases],
            keep,
        )
        .where(F.col("__n") > 0)
        .drop("__n")
        .orderBy("facet", "_id")
    )


def _first_last_agg(
    df: DataFrame, alias: str, spec: dict[str, Any], sort_ctx: dict | None
) -> Column:
    """``$first``/``$last`` (and the N-forms ``$firstN``/``$lastN``) in
    ``$group`` — Mongo's sort-then-group idiom. Document order is
    undefined in a distributed group, so these REQUIRE the immediately
    preceding ``$sort``'s keys
    (threaded through by ``_apply_pipeline``; a $match/$limit/$skip in
    between preserves the context, anything else clears it): the
    translation is ``min_by``/``max_by`` over a direction-normalized
    key struct — ONE map-side-combinable aggregate, never a window or a
    re-join. Descending keys are normalized by negation (numeric) or
    negated epoch-micros (date/timestamp); a descending STRING key has
    no total-order inversion and is refused loudly. Sort-key ties break
    toward the output value (min side for $first, max side for $last) —
    the dialect's determinism convention, where Mongo is unspecified.
    """
    op, arg = next(iter(spec.items()))
    if not sort_ctx:
        raise DocumentQueryError(
            f"{op} in $group requires an immediately preceding $sort "
            "(document order is undefined in a distributed group — the "
            "sort keys define it; $match/$limit/$skip in between are "
            "fine)"
        )
    if op in ("$firstN", "$lastN"):
        if not (isinstance(arg, dict) and "input" in arg):
            raise DocumentQueryError(f"Bad {op} spec: {arg!r}")
        n = arg.get("n")
        if not isinstance(n, int) or isinstance(n, bool) or n < 1:
            raise DocumentQueryError(
                f"{op} needs a literal positive integer n, got {n!r}"
            )
        in_spec = arg["input"]
    else:
        n = None
        in_spec = arg
    keys: list[Column] = []
    for f, d in sort_ctx.items():
        if f not in df.columns:
            raise DocumentQueryError(
                f"{op}: sort key {f!r} is not a column at the $group "
                "stage"
            )
        c = F.col(f)
        if d >= 0:
            keys.append(c)
            continue
        dt = df.schema[f].dataType
        if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            keys.append(-F.unix_micros(c.cast("timestamp")))
        elif isinstance(dt, T.NumericType):
            keys.append(-c)
        else:
            raise DocumentQueryError(
                f"{op}: descending sort key {f!r} of type "
                f"{dt.simpleString()} has no order inversion — sort "
                "ascending or use a numeric/date key"
            )
    out = _ref(in_spec)
    if op == "$mergeObjects":
        # later-wins fold over the maps in sort (= document) order:
        # collect (keys…, map) structs, sort, strip the keys, drop null
        # documents (Mongo ignores them), then aggregate() the tail
        # onto the head — one map-side-combinable collect per group.
        pair = F.struct(
            *[k.alias(f"__k{i}") for i, k in enumerate(keys)],
            out.alias("__v"),
        )

        # maps are not orderable, so the struct can't use array_sort's
        # default ordering — compare the (already direction-normalized)
        # key fields explicitly, first difference wins
        def _key_cmp(left, right):
            cmp = F.lit(0)
            for i in reversed(range(len(keys))):
                ki = f"__k{i}"
                cmp = (
                    F.when(left[ki] < right[ki], -1)
                    .when(left[ki] > right[ki], 1)
                    .otherwise(cmp)
                )
            return cmp.cast("int")

        arr = F.filter(
            F.transform(F.array_sort(F.collect_list(pair), _key_cmp),
                        lambda x: x["__v"]),
            lambda m: m.isNotNull(),
        )
        merged = F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - F.lit(1), F.lit(0))),
            F.get(arr, 0),
            _merge_two_maps,
        )
        return merged.alias(alias)
    if n is None:
        ordc = F.struct(*keys, out)
        agg = F.min_by(out, ordc) if op == "$first" else F.max_by(out, ordc)
        return agg.alias(alias)
    # $firstN/$lastN: ONE collect_list of (normalized keys…, value)
    # structs per group (map-side combinable), array_sort into document
    # (= sort) order, slice the head or tail — the tail slice keeps
    # ascending order, matching Mongo's "last n, in order" contract.
    # The collect is group-sized before the slice; same $match/$sample
    # shaping guidance as $push/$topN for pathological groups.
    pair = F.struct(
        *[k.alias(f"__k{i}") for i, k in enumerate(keys)],
        out.alias("__v"),
    )
    arr = F.array_sort(F.collect_list(pair))
    if op == "$firstN":
        sliced = F.slice(arr, 1, n)
    else:
        sliced = F.slice(
            arr,
            F.greatest(F.size(arr) - F.lit(n - 1), F.lit(1)),
            F.lit(n),
        )
    return F.transform(sliced, lambda x: x["__v"]).alias(alias)


def apply_group(
    df: DataFrame, spec: dict[str, Any], sort_ctx: dict | None = None
) -> DataFrame:
    """$group: {_id: None | "$f" | {alias: "$f", ...}, out: {$acc: arg}}.

    Maps to groupBy().agg() — partial (map-side) aggregation for free.
    The group key is exposed as ``_id`` (scalar) or ``_id.<alias>``
    struct (dict spec), matching Mongo's result shape. ``sort_ctx``
    carries the immediately preceding ``$sort`` spec so ``$first``/
    ``$last`` can compile (see :func:`_first_last_agg`).
    """
    if "_id" not in spec:
        raise DocumentQueryError("$group requires _id")
    id_spec = spec["_id"]
    aggs = [
        _first_last_agg(df, a, s, sort_ctx)
        if isinstance(s, dict) and len(s) == 1
        and next(iter(s)) in ("$first", "$last", "$firstN", "$lastN",
                              "$mergeObjects")
        else _acc_to_agg(a, s)
        for a, s in spec.items()
        if a != "_id"
    ]
    if not aggs:
        aggs = [F.count(F.lit(1)).alias("__n")]
        drop_n = True
    else:
        drop_n = False
    if id_spec is None:
        out = df.agg(*aggs).withColumn("_id", F.lit(None).cast("string"))
        out = out.select("_id", *[c for c in out.columns if c != "_id"])
    elif isinstance(id_spec, str):
        out = df.groupBy(_ref(id_spec).alias("_id")).agg(*aggs)
    elif isinstance(id_spec, dict):
        key = F.struct(*[_ref(v).alias(k) for k, v in id_spec.items()])
        out = df.groupBy(key.alias("_id")).agg(*aggs)
    else:
        raise DocumentQueryError(f"Bad $group _id: {id_spec!r}")
    return out.drop("__n") if drop_n else out


def bucket_group(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """$bucket: histogram aggregation over explicit boundaries.

    ``{"groupBy": "$f", "boundaries": [b0, b1, ...], "default": d,
    "output": {alias: {$acc: arg}}}`` — Mongo buckets a value into
    ``[b_i, b_{i+1})`` and labels the bucket with its LOWER boundary;
    out-of-range values go to ``default`` (an error in Mongo when no
    default is given — same here, raised at plan build, not per-row).

    Spark shape: the bucket label is one CASE chain (boundaries are a
    handful of literals, so the whole projection stays in codegen —
    never a per-row UDF or a join against a boundary table), then the
    same groupBy().agg() as $group: map-side combine collapses each
    partition to ≤ n_buckets rows before the shuffle, so at 100 TB the
    exchange carries buckets × partitions rows, not data.
    """
    if "groupBy" not in spec or "boundaries" not in spec:
        raise DocumentQueryError("$bucket requires groupBy and boundaries")
    bounds = spec["boundaries"]
    # STRICTLY increasing, like Mongo: a duplicate boundary would
    # silently create a dead [b, b) bucket instead of erroring
    if len(bounds) < 2 or any(a >= b for a, b in zip(bounds, bounds[1:])):
        raise DocumentQueryError(f"Bad $bucket boundaries: {bounds!r}")
    val = _ref(spec["groupBy"])
    label = None
    for lo, hi in zip(bounds, bounds[1:]):
        cond = (val >= F.lit(lo)) & (val < F.lit(hi))
        branch = F.lit(lo).cast("string")
        label = F.when(cond, branch) if label is None else label.when(cond, branch)
    if "default" in spec:
        label = label.otherwise(F.lit(spec["default"]).cast("string"))
    else:
        raise DocumentQueryError(
            "$bucket without default requires all values in range; "
            "provide 'default'"
        )
    out_spec = spec.get("output") or {"count": {"$sum": 1}}
    aggs = [_acc_to_agg(a, s) for a, s in out_spec.items()]
    return df.groupBy(label.alias("_id")).agg(*aggs)


def bucket_auto_group(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$bucketAuto`` — equi-depth histogram with data-derived
    boundaries: N buckets of approximately equal document counts, equal
    groupBy values NEVER split across buckets (Mongo's contract; its
    own docs promise only "approximately" equal counts, so the exact
    packing is implementation-defined — this one is the deterministic
    first-row-index formula below, byte-stable across runs and
    reproducible in ANSI SQL for the oracle).

    ``{"groupBy": "$f", "buckets": N, "output": {alias: {$acc: arg}}}``
    → ``_id = {min, max}`` structs where max = next bucket's min
    (half-open), last bucket inclusive of the overall max.

    Spark shape (the q153 equi-depth recipe adapted to ties-together):

    1. per-distinct-value counts — ONE map-side-combinable aggregate
       (the only scan of the data);
    2. a window over the DISTINCT-VALUE frame ordered by value derives
       each value's first global row index (cumsum - count), and
       ``bucket = (start · N) div total`` in pure integer math — ties
       share a start, hence a bucket. The frame is distinct-values-
       sized: sorting it in one task is the same bounded cost as
       q153's cut-point collect, and q156's GK-sketch tier is the
       100 TB path when even the distinct domain is huge;
    3. bucket bounds: per-bucket min + lead() for the half-open max;
    4. accumulators: the value→bucket map (distinct-values-sized)
       broadcast-joins back onto the documents, then ONE
       groupBy(bucket).agg(...) — partial aggregation as usual.

    Divergences, stated loudly: ``granularity`` (R5/E-series boundary
    rounding) is not compiled (typed error); documents whose groupBy
    value is null are EXCLUDED (Mongo folds them into the first
    bucket; a null min boundary would poison the half-open contract
    here) — both documented, neither silent. Skewed domains can leave
    some of the N bucket ids empty (a value holding >1/N of the rows
    swallows its whole stride); Mongo merges those differently, the
    count contract ("approximately equal") holds either way.
    """
    from pyspark.sql import Window

    if not isinstance(spec, dict) or "groupBy" not in spec \
            or "buckets" not in spec:
        raise DocumentQueryError("$bucketAuto requires groupBy and buckets")
    if "granularity" in spec:
        raise DocumentQueryError(
            "$bucketAuto granularity (R5/E-series rounding) is not "
            "compiled — omit it for the count-based packing"
        )
    n = spec["buckets"]
    if not isinstance(n, int) or isinstance(n, bool) or n < 1:
        raise DocumentQueryError(f"$bucketAuto bad buckets: {n!r}")
    val = _ref(spec["groupBy"])
    vals = (
        df.groupBy(val.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__v").isNotNull())
    )
    w = Window.orderBy("__v")
    run = F.sum("__c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("__c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    assign = vals.select(
        "__v",
        (run - F.col("__c")).alias("__start"),
        total.alias("__total"),
    ).select(
        "__v",
        # exact INTEGER division (SQL div) — a double `/` + cast can
        # land one bucket off at representation boundaries, and the
        # DuckDB oracle twin uses true integer `//`
        F.expr(f"(__start * {int(n)}) div __total").alias("__b"),
    )
    bframe = assign.groupBy("__b").agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi_in")
    )
    w2 = Window.orderBy("__b")
    gmax = F.max("__hi_in").over(
        w2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    bounds = bframe.select(
        "__b",
        "__lo",
        F.coalesce(F.lead("__lo", 1).over(w2), gmax).alias("__hi"),
    )
    out_spec = spec.get("output") or {"count": {"$sum": 1}}
    for alias in out_spec:
        # the compiler's internal namespace (same contract as $facet's
        # reserved-alias guard): a user alias of __b/__v/__lo/__hi/_id
        # would collide with the bucket plumbing mid-plan
        if alias.startswith("__") or alias == "_id":
            raise DocumentQueryError(
                f"$bucketAuto output alias {alias!r} collides with the "
                "compiler's reserved __*/_id namespace"
            )
    aggs = [_acc_to_agg(a, s) for a, s in out_spec.items()]
    docs = df.join(F.broadcast(assign), val.eqNullSafe(F.col("__v")), "inner")
    per_bucket = docs.groupBy("__b").agg(*aggs)
    return (
        per_bucket.join(F.broadcast(bounds), "__b")
        .select(
            F.struct(
                F.col("__lo").alias("min"), F.col("__hi").alias("max")
            ).alias("_id"),
            *[F.col(a) for a in out_spec],
        )
    )


# ------------------------------------------- $setWindowFields (C5+)
_WINDOW_RANK_OPS = {
    "$rank": F.rank,
    "$denseRank": F.dense_rank,
    "$documentNumber": F.row_number,
}
_WINDOW_AGG_OPS = {
    "$sum": F.sum,
    "$avg": F.avg,
    "$min": F.min,
    "$max": F.max,
    "$first": lambda c: F.first(c, ignorenulls=False),
    "$last": lambda c: F.last(c, ignorenulls=False),
    # $push/$addToSet follow the module's $group convention (see
    # _acc_to_agg_masked): the collected array is SORTED — deterministic
    # and oracle-hashable, diverging from Mongo's document-order
    # contract, which no distributed engine can honor anyway. The sort
    # wraps the WINDOWED value (_WINDOW_POST below) — sort_array is not
    # itself a window function, so it can't sit under .over().
    "$push": F.collect_list,
    "$addToSet": F.collect_set,
    "$stdDevSamp": F.stddev_samp,
    "$stdDevPop": F.stddev_pop,
}
_WINDOW_POST = {"$push": F.sort_array, "$addToSet": F.sort_array}
# two-operand window accumulators: {"$covarianceSamp": ["$x", "$y"]}
_WINDOW_AGG_OPS2 = {
    "$covarianceSamp": F.covar_samp,
    "$covariancePop": F.covar_pop,
}
# fixed-width time units for $derivative/$integral (and time-unit range
# windows below) — month/year vary in length, so Mongo's unit algebra is
# only honored for these; anything else is a loud error
_FIXED_UNIT_SECS = {"second": 1, "minute": 60, "hour": 3600,
                    "day": 86400, "week": 604800}


def _frame_bound(tok: Any, *, lower: bool):
    """Mongo window bound token → Spark frame boundary: "unbounded",
    "current", or a signed integer offset (negative = preceding)."""
    from pyspark.sql import Window

    if tok == "unbounded":
        return Window.unboundedPreceding if lower else Window.unboundedFollowing
    if tok == "current":
        return Window.currentRow
    if isinstance(tok, int) and not isinstance(tok, bool):
        return tok
    raise DocumentQueryError(f"Bad window bound: {tok!r}")


def set_window_fields(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$setWindowFields`` (Mongo 5.0) → Spark window functions.

    ``{"partitionBy": "$f" | expr | None, "sortBy": {f: 1|-1, ...},
    "output": {name: {$op: arg[, "window": {"documents"|"range":
    [lo, hi]}]}, ...}}``

    Translation is 1:1 with Spark's ``Window`` spec — every output
    field is one ``Column.over(window)`` added via ``withColumns``, so
    fields sharing a (partition, sort, frame) ride the SAME physical
    sort (Catalyst collapses them into one Window operator; no extra
    exchange or sort per field):

    - rank family ($rank/$denseRank/$documentNumber) — requires
      ``sortBy``, takes no frame (Mongo contract, enforced loudly);
    - $shift {output, by, default} — ``lead`` for positive ``by``,
      ``lag`` for negative; ``default`` fills only positions OUTSIDE
      the partition (lead/lag's native third argument — Mongo's
      contract; a null value at a valid position stays null);
    - accumulators ($sum/$avg/$min/$max/$count/$first/$last, plus
      $push/$addToSet — sorted arrays, the module's determinism
      convention — $stdDevSamp/$stdDevPop and the two-operand
      $covarianceSamp/$covariancePop) with an
      optional frame: ``documents`` bounds → ``rowsBetween``; ``range``
      bounds → ``rangeBetween`` (single ascending numeric sort key,
      Spark's own rangeBetween precondition, enforced loudly; time
      ``unit`` ranges are not compiled). Default frame when ``window``
      is omitted is the WHOLE partition — Mongo's documented
      ["unbounded", "unbounded"] default — except $first/$last, which
      require ``sortBy`` and read the first/last row in SORT order
      (Mongo's contract; an unordered partition read would be
      nondeterministic);
    - $derivative — (last − first of input) / (sortBy span in ``unit``)
      over the frame, four endpoint reads on ONE window; one-document
      frames → null. sortBy must be a single ascending field: epoch
      microseconds + required fixed-width unit for dates, raw value
      (unit forbidden) for numerics;
    - $integral — trapezoid sum between consecutive docs inside the
      frame, compiled as a running-sum endpoint diff (C_last − C_first
      where C is the cumulative pairwise trapezoid — works for
      documents AND range frames; see the inline comment). Null inputs
      skip their trapezoid segments (documented divergence; Mongo
      requires numerics anyway). Tied sort-key values make the pairing
      order-dependent — keep the sort key unique (Mongo's own result
      is equally unspecified under ties);
    - $expMovingAvg {input, N|alpha} — per-partition recursion via ONE
      Arrow-batched applyInPandas pass (``_apply_ema``): no frame
      (loud), requires sortBy, exact pandas ``ewm(adjust=False)``
      semantics.

    Scale: a missing ``partitionBy`` is compiled (Mongo allows it) but
    funnels the whole input through ONE task's sort — same single-key
    hazard as a global window in SQL; real pipelines partition. The
    per-partition sort is Tungsten spillable, so wide partitions bound
    memory, not correctness. No reference analog (the reference's
    translator predates Mongo 5.0 stages — nl2mongo.py emits only
    find/$group shapes); implemented for dialect completeness next to
    $facet/$bucket.
    """
    from pyspark.sql import Window

    if not isinstance(spec, dict):
        raise DocumentQueryError(f"Bad $setWindowFields spec: {spec!r}")
    output = spec.get("output")
    if not isinstance(output, dict) or not output:
        raise DocumentQueryError(
            "$setWindowFields requires a non-empty 'output' map"
        )
    part = spec.get("partitionBy")
    part_cols = [_ref(part)] if part is not None else []
    sort_by = spec.get("sortBy")
    if sort_by is not None and not (isinstance(sort_by, dict) and sort_by):
        raise DocumentQueryError(f"Bad sortBy: {sort_by!r}")
    sort_cols = (
        [
            F.col(f).asc() if d >= 0 else F.col(f).desc()
            for f, d in sort_by.items()
        ]
        if sort_by
        else []
    )
    base = Window.partitionBy(*part_cols)
    sorted_w = base.orderBy(*sort_cols) if sort_cols else None

    def _w_from_frame(frame):
        """Frame dict → Spark Window: ``documents`` → rowsBetween,
        ``range`` → rangeBetween (incl. fixed-width time units)."""
        if not isinstance(frame, dict):
            raise DocumentQueryError(f"Bad window frame: {frame!r}")
        unit = frame.get("unit")
        body_frame = {k: v for k, v in frame.items() if k != "unit"}
        if len(body_frame) != 1:
            raise DocumentQueryError(f"Bad window frame: {frame!r}")
        kind, bounds = next(iter(body_frame.items()))
        if not isinstance(bounds, list) or len(bounds) != 2:
            raise DocumentQueryError(f"Bad window bounds: {bounds!r}")
        lo = _frame_bound(bounds[0], lower=True)
        hi = _frame_bound(bounds[1], lower=False)
        if kind == "documents":
            if unit is not None:
                raise DocumentQueryError("'unit' applies to range windows")
            if sorted_w is None:
                raise DocumentQueryError("documents window requires sortBy")
            return sorted_w.rowsBetween(lo, hi)
        if kind == "range":
            if not (
                sort_by
                and len(sort_by) == 1
                and next(iter(sort_by.values())) >= 0
            ):
                raise DocumentQueryError(
                    "range window requires a single ascending sortBy key"
                )
            if unit is not None:
                # time-unit range (Mongo: {"range": [-7, 0], "unit":
                # "day"} over a date/timestamp sortBy) — compiled by
                # RE-SORTING on the key's epoch seconds and scaling
                # the bounds to seconds; fixed-width units only
                # (month/year vary — Spark's rangeBetween can't
                # express them either, loud error)
                secs = _FIXED_UNIT_SECS.get(unit)
                if secs is None:
                    raise DocumentQueryError(
                        f"range window bad unit: {unit!r} "
                        "(fixed-width units second..week only)"
                    )
                skey = next(iter(sort_by))
                epoch = F.col(skey).cast("timestamp").cast("long")

                # scale only REAL integer offsets from the spec —
                # unboundedPreceding/currentRow sentinels pass through
                # (they are Python ints too; multiplying the sentinel
                # would overflow the frame)
                def _scaled(tok, b):
                    return b * secs if isinstance(tok, int) and not isinstance(
                        tok, bool
                    ) else b

                return base.orderBy(epoch.asc()).rangeBetween(
                    _scaled(bounds[0], lo), _scaled(bounds[1], hi)
                )
            return sorted_w.rangeBetween(lo, hi)
        raise DocumentQueryError(
            f"Unsupported window kind: {kind!r} (documents/range)"
        )

    def _rate_sort_key(op, unit):
        """$derivative/$integral read the sortBy field's VALUE deltas:
        single ascending field; date/timestamp → epoch microseconds +
        REQUIRED fixed-width unit (Mongo's contract — month/year vary),
        numeric → raw value, unit forbidden."""
        if not (
            sort_by
            and len(sort_by) == 1
            and next(iter(sort_by.values())) >= 0
        ):
            raise DocumentQueryError(
                f"{op} requires a single ascending sortBy field"
            )
        skey = next(iter(sort_by))
        dt = df.schema[skey].dataType
        if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            if unit not in _FIXED_UNIT_SECS:
                raise DocumentQueryError(
                    f"{op} over a date/timestamp sortBy requires a "
                    f"fixed-width unit (second..week), got {unit!r}"
                )
            return (
                F.unix_micros(F.col(skey).cast("timestamp")),
                float(_FIXED_UNIT_SECS[unit]) * 1e6,
            )
        if isinstance(dt, T.NumericType):
            if unit is not None:
                raise DocumentQueryError(
                    f"{op} unit applies only to date/timestamp sortBy"
                )
            return F.col(skey).cast("double"), None
        raise DocumentQueryError(
            f"{op} sortBy field {skey!r} must be numeric or date/timestamp"
        )

    out_cols: dict[str, Column] = {}
    # $integral's cumulative trapezoid columns — materialized in a FIRST
    # projection so the frame diff in out_cols can reference them
    pre_cols: dict[str, Column] = {}
    # $expMovingAvg recursions — applied AFTER the window projection via
    # one Arrow-batched applyInPandas pass (see _apply_ema)
    ema_specs: dict[str, tuple[Column, float]] = {}
    for name, ospec in output.items():
        if name.startswith("__"):
            raise DocumentQueryError(
                f"output field {name!r} collides with the compiler's "
                "reserved __* namespace"
            )
        if not isinstance(ospec, dict) or not ospec:
            raise DocumentQueryError(f"Bad output field {name!r}: {ospec!r}")
        frame = ospec.get("window")
        body = {k: v for k, v in ospec.items() if k != "window"}
        if len(body) != 1:
            raise DocumentQueryError(
                f"output field {name!r} needs exactly one window operator"
            )
        op, arg = next(iter(body.items()))
        if op in _WINDOW_RANK_OPS:
            if sorted_w is None:
                raise DocumentQueryError(f"{op} requires sortBy")
            if frame is not None:
                raise DocumentQueryError(f"{op} takes no window frame")
            out_cols[name] = _WINDOW_RANK_OPS[op]().over(sorted_w)
            continue
        if op == "$shift":
            if sorted_w is None:
                raise DocumentQueryError("$shift requires sortBy")
            if frame is not None:
                raise DocumentQueryError("$shift takes no window frame")
            if not isinstance(arg, dict) or "output" not in arg:
                raise DocumentQueryError(f"Bad $shift spec: {arg!r}")
            by = arg.get("by", 1)
            if not isinstance(by, int) or isinstance(by, bool):
                raise DocumentQueryError(f"$shift 'by' must be an int: {by!r}")
            src = _ref(arg["output"])
            # lead/lag's NATIVE default applies only when the shifted
            # position falls outside the partition — Mongo's contract.
            # (A coalesce would also claim legitimately-null values at
            # valid positions; the r10 window property sweep caught
            # that conflation.) The default must be a CONSTANT scalar
            # (Mongo rejects non-constant expressions loudly); a bare
            # {$literal: scalar} wrapper is unwrapped, anything else —
            # expression docs, '$field' paths — is refused rather than
            # silently treated as a Python literal or dying in py4j.
            default = arg.get("default")
            if isinstance(default, str) and default.startswith("$"):
                raise DocumentQueryError(
                    f"$shift 'default' must be a constant scalar, not a "
                    f"field path: {default!r} (use {{'$literal': ...}} "
                    f"for a literal string starting with '$')"
                )
            if isinstance(default, dict):
                if set(default) == {"$literal"} and not isinstance(
                    default["$literal"], (dict, list)
                ):
                    default = default["$literal"]
                else:
                    raise DocumentQueryError(
                        f"$shift 'default' must be a constant scalar: "
                        f"{default!r}"
                    )
            if isinstance(default, list):
                raise DocumentQueryError(
                    f"$shift 'default' must be a constant scalar: "
                    f"{default!r}"
                )
            shifted = (
                F.lead(src, by, default) if by >= 0
                else F.lag(src, -by, default)
            ).over(sorted_w)
            out_cols[name] = shifted
            continue
        if op == "$expMovingAvg":
            if frame is not None:
                raise DocumentQueryError("$expMovingAvg takes no window frame")
            if sorted_w is None:
                raise DocumentQueryError("$expMovingAvg requires sortBy")
            if not isinstance(arg, dict) or "input" not in arg:
                raise DocumentQueryError(
                    f"Bad $expMovingAvg spec (needs input + N|alpha): {arg!r}"
                )
            n, alpha = arg.get("N"), arg.get("alpha")
            if (n is None) == (alpha is None):
                raise DocumentQueryError(
                    "$expMovingAvg needs exactly one of N / alpha"
                )
            if n is not None:
                if not isinstance(n, int) or isinstance(n, bool) or n < 1:
                    raise DocumentQueryError(f"$expMovingAvg bad N: {n!r}")
                alpha = 2.0 / (n + 1)
            elif not (
                isinstance(alpha, (int, float))
                and not isinstance(alpha, bool)
                and 0 < alpha < 1
            ):
                raise DocumentQueryError(f"$expMovingAvg bad alpha: {alpha!r}")
            ema_specs[name] = (_ref(arg["input"]), float(alpha))
            continue
        if op in ("$derivative", "$integral"):
            if not isinstance(arg, dict) or "input" not in arg:
                raise DocumentQueryError(f"Bad {op} spec (needs input): {arg!r}")
            k_col, unit_scale = _rate_sort_key(op, arg.get("unit"))
            w = (
                _w_from_frame(frame)
                if frame is not None
                else sorted_w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            y = _ref(arg["input"]).cast("double")
            if op == "$derivative":
                # Mongo: (last(y) - first(y)) / (sort-key span in unit)
                # over the frame — all four endpoint reads ride the SAME
                # window (one Window operator); a one-document frame has
                # zero span → null (Mongo's contract)
                dy = (
                    F.last(y, ignorenulls=False).over(w)
                    - F.first(y, ignorenulls=False).over(w)
                )
                dk = (
                    F.last(k_col, ignorenulls=False).over(w)
                    - F.first(k_col, ignorenulls=False).over(w)
                )
                r = dy / dk
                if unit_scale is not None:
                    r = r * F.lit(unit_scale)
                out_cols[name] = F.when(dk != F.lit(0), r)
            else:
                # $integral = trapezoid sum between consecutive docs
                # INSIDE the frame. Pairwise trapezoids telescope through
                # a running sum: trap_i = (y_i + y_{i-1})/2 · (k_i -
                # k_{i-1}) over the PARTITION sort, C_i = Σ_{j≤i} trap_j,
                # and the frame integral is C_last − C_first — the
                # endpoint diff excludes the frame-head's inbound
                # trapezoid and works for documents AND range frames
                # (a frame-relative rows shift could not express range
                # bounds). C rides pre_cols: Spark can't nest window
                # functions in one projection.
                trap = F.coalesce(
                    (y + F.lag(y, 1).over(sorted_w))
                    * F.lit(0.5)
                    * (k_col - F.lag(k_col, 1).over(sorted_w)),
                    F.lit(0.0),
                )
                tmp = f"__swf_cum_{name}"
                pre_cols[tmp] = F.sum(trap).over(
                    sorted_w.rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                )
                r = (
                    F.last(F.col(tmp), ignorenulls=False).over(w)
                    - F.first(F.col(tmp), ignorenulls=False).over(w)
                )
                if unit_scale is not None:
                    r = r / F.lit(unit_scale)
                out_cols[name] = r
            continue
        if op == "$locf":
            # Mongo 5.3 last-observation-carried-forward: the running
            # last non-null in sort order (no window param in Mongo)
            if sorted_w is None:
                raise DocumentQueryError("$locf requires sortBy")
            if frame is not None:
                raise DocumentQueryError("$locf takes no window frame")
            out_cols[name] = F.last(_ref(arg), ignorenulls=True).over(
                sorted_w.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            continue
        if op == "$linearFill":
            # Mongo 5.3 linear interpolation between the bracketing
            # non-null neighbors along the sortBy axis — the $fill
            # stage's linear math as a window operator. Output promotes
            # to double (the $fill stage's documented divergence); nulls
            # outside the bracketing range stay null.
            if frame is not None:
                raise DocumentQueryError("$linearFill takes no window frame")
            if not (
                sort_by
                and len(sort_by) == 1
                and next(iter(sort_by.values())) >= 0
            ):
                raise DocumentQueryError(
                    "$linearFill requires a single ascending sortBy field"
                )
            skey = next(iter(sort_by))
            dt = df.schema[skey].dataType
            if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
                xs = F.unix_micros(F.col(skey).cast("timestamp")).cast(
                    "double"
                )
            elif isinstance(dt, T.NumericType):
                xs = F.col(skey).cast("double")
            else:
                raise DocumentQueryError(
                    f"$linearFill sortBy field {skey!r} must be numeric "
                    "or date/timestamp"
                )
            y = _ref(arg)
            wp = sorted_w.rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            wf = sorted_w.rowsBetween(
                Window.currentRow, Window.unboundedFollowing
            )
            known_v = F.when(y.isNotNull(), y.cast("double"))
            known_x = F.when(y.isNotNull(), xs)
            prev_v = F.last(known_v, ignorenulls=True).over(wp)
            prev_x = F.last(known_x, ignorenulls=True).over(wp)
            next_v = F.first(known_v, ignorenulls=True).over(wf)
            next_x = F.first(known_x, ignorenulls=True).over(wf)
            interp = prev_v + (next_v - prev_v) * (xs - prev_x) / (
                next_x - prev_x
            )
            out_cols[name] = F.when(y.isNotNull(), y.cast("double")).otherwise(
                F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
            )
            continue
        if op in ("$median", "$percentile"):
            # Mongo 7.0 window forms — Spark's EXACT interpolated
            # percentile over the frame (same better-accuracy
            # divergence as the $group forms; method validated)
            if not isinstance(arg, dict) or arg.get("method") != "approximate":
                raise DocumentQueryError(
                    f"{op} requires method: 'approximate' (compiled to "
                    "the EXACT interpolated percentile — documented "
                    "divergence)"
                )
            if "input" not in arg:
                raise DocumentQueryError(f"{op} needs input, got {arg!r}")
            pcol = _ref(arg["input"])
            w = _w_from_frame(frame) if frame is not None else base
            if op == "$median":
                # percentile(col, 0.5), not F.median: Spark refuses
                # median over an ORDER BY/framed window while percentile
                # is frame-capable — identical value by definition
                out_cols[name] = F.percentile(pcol, F.lit(0.5)).over(w)
            else:
                ps = arg.get("p")
                if not (
                    isinstance(ps, list)
                    and ps
                    and all(
                        isinstance(p, (int, float))
                        and not isinstance(p, bool)
                        and 0 <= p <= 1
                        for p in ps
                    )
                ):
                    raise DocumentQueryError(
                        f"$percentile needs p: a list of fractions in "
                        f"[0,1], got {ps!r}"
                    )
                out_cols[name] = F.percentile(
                    pcol, F.array(*[F.lit(float(p)) for p in ps])
                ).over(w)
            continue
        if op in ("$topN", "$bottomN", "$top", "$bottom"):
            # Mongo 5.2 rank-selection window forms — the $group
            # machinery (_topn_parts: struct row + direction-honoring
            # comparator + slice/project/reverse) applied to a window
            # collect. The op's OWN sortBy orders the selection; the
            # stage's sortBy only shapes the frame.
            if not isinstance(arg, dict):
                raise DocumentQueryError(f"Bad {op} spec: {arg!r}")
            if op in ("$top", "$bottom"):
                n = 1
            else:
                n = arg.get("n")
                if not isinstance(n, int) or isinstance(n, bool) or n < 1:
                    raise DocumentQueryError(
                        f"{op} needs a literal positive int n, got {n!r}"
                    )
            row, finish = _topn_parts(op, arg, F.lit(True), None)
            w = _w_from_frame(frame) if frame is not None else base
            out = finish(F.collect_list(row).over(w), n)
            out_cols[name] = (
                F.element_at(out, 1) if op in ("$top", "$bottom") else out
            )
            continue
        if op in ("$firstN", "$lastN", "$minN", "$maxN"):
            # Mongo 5.2 N-selection window forms. $firstN/$lastN are
            # SORT-order defined here (unlike $group, where they are
            # refused): collect_list over an ORDERED window buffers
            # rows in frame order, so the first/last n slices are the
            # first/last n documents of the frame. $minN/$maxN sort the
            # collected frame BY VALUE ($maxN descending — Mongo's
            # output order).
            if not isinstance(arg, dict) or "input" not in arg:
                raise DocumentQueryError(
                    f"Bad {op} spec (needs input + n): {arg!r}"
                )
            n = arg.get("n")
            if not isinstance(n, int) or isinstance(n, bool) or n < 1:
                raise DocumentQueryError(
                    f"{op} needs a literal positive int n, got {n!r}"
                )
            y = _ref(arg["input"])
            if op in ("$firstN", "$lastN"):
                if sorted_w is None:
                    raise DocumentQueryError(f"{op} requires sortBy")
                w = (
                    _w_from_frame(frame)
                    if frame is not None
                    else sorted_w.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                arr = F.collect_list(y).over(w)
                if op == "$firstN":
                    out_cols[name] = F.slice(arr, 1, n)
                else:
                    # negative-start slice errors when |start| exceeds
                    # the array size — short frames return whole
                    out_cols[name] = F.when(
                        F.size(arr) > n, F.slice(arr, -n, n)
                    ).otherwise(arr)
            else:
                w = _w_from_frame(frame) if frame is not None else base
                arr = F.sort_array(
                    F.collect_list(y).over(w), asc=(op == "$minN")
                )
                out_cols[name] = F.slice(arr, 1, n)
            continue
        if op == "$count":
            col = F.count(F.lit(1))
        elif op in _WINDOW_AGG_OPS2:
            if not (isinstance(arg, list) and len(arg) == 2):
                raise DocumentQueryError(
                    f"{op} expects a two-element operand list: {arg!r}"
                )
            col = _WINDOW_AGG_OPS2[op](_ref(arg[0]), _ref(arg[1]))
        elif op in _WINDOW_AGG_OPS:
            col = _WINDOW_AGG_OPS[op](_ref(arg))
        else:
            raise DocumentQueryError(f"Unsupported window operator: {op}")
        if frame is None:
            if op in ("$first", "$last"):
                # Mongo requires sortBy for $first/$last, and frame-less
                # they mean first/last IN SORT ORDER over the whole
                # partition — col.over(base) would read an arbitrary
                # row's value (partition order is nondeterministic)
                if sorted_w is None:
                    raise DocumentQueryError(f"{op} requires sortBy")
                out_cols[name] = col.over(
                    sorted_w.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                continue
            # Mongo default: ["unbounded", "unbounded"] over the
            # partition — the frame-less Window.partitionBy form
            wc = col.over(base)
            out_cols[name] = (
                _WINDOW_POST[op](wc) if op in _WINDOW_POST else wc
            )
            continue
        wc = col.over(_w_from_frame(frame))
        out_cols[name] = _WINDOW_POST[op](wc) if op in _WINDOW_POST else wc
    if pre_cols:
        df = df.withColumns(pre_cols)
    out = df.withColumns(out_cols)
    if pre_cols:
        out = out.drop(*pre_cols)
    if ema_specs:
        out = _apply_ema(
            out, part_cols[0] if part_cols else None, sort_by, ema_specs
        )
    return out


def _apply_ema(
    df: DataFrame,
    part_col: Column | None,
    sort_by: dict[str, int],
    ema_specs: dict[str, tuple[Column, float]],
) -> DataFrame:
    """``$expMovingAvg``: the per-partition recursion ``ema_i = α·x_i +
    (1−α)·ema_{i−1}`` with ``ema_1 = x_1`` (Mongo's contract; ``α =
    2/(N+1)`` for the N form) — exactly pandas ``ewm(alpha,
    adjust=False).mean()`` over the sort order.

    No Spark window frame expresses the recursion (every prior row
    carries a DISTINCT weight — first/last/sum over any frame can't
    weight rows by distance), so this is the module's one Arrow-batched
    ``applyInPandas`` window path: shuffle by the partition key, one
    pandas pass per group, all requested EMA fields in the SAME pass.

    100 TB: the exchange is the same one the projection's window fields
    ride; per-group work is a single sequential scan (pandas streams the
    recursion in C). A missing ``partitionBy`` funnels the whole input
    through ONE group — the same documented hazard as the frame-less
    window path; real pipelines partition. Null inputs follow pandas
    ``adjust=False`` semantics (the output carries the prior state and
    the null row does not update it) — matching Mongo's
    ignore-non-numeric contract for the all-numeric case.
    """
    sort_fields = [(f, d >= 0) for f, d in sort_by.items()]
    in_names = {name: f"__swf_ema_in_{name}" for name in ema_specs}
    alphas = {name: a for name, (_c, a) in ema_specs.items()}
    work = df.withColumn(
        "__swf_g", part_col if part_col is not None else F.lit(1)
    ).withColumns(
        {in_names[n]: c.cast("double") for n, (c, _a) in ema_specs.items()}
    )
    out_schema = T.StructType(
        list(work.schema.fields)
        + [T.StructField(n, T.DoubleType()) for n in ema_specs]
    )

    def fn(pdf):
        pdf = pdf.sort_values(
            [f for f, _ in sort_fields],
            ascending=[asc for _, asc in sort_fields],
            kind="mergesort",
        )
        for n, src in in_names.items():
            pdf[n] = pdf[src].ewm(alpha=alphas[n], adjust=False).mean()
        return pdf

    out = work.groupBy("__swf_g").applyInPandas(fn, out_schema)
    return out.drop("__swf_g", *in_names.values())


def _lookup_payload_row_cap(spark, n_cols: int) -> int:
    """Row bound for the uncorrelated $lookup's driver-materialized
    payload, derived from ``spark.sql.autoBroadcastJoinThreshold`` (the
    byte class the broadcast must fit regardless): threshold bytes over
    a conservative 16 B/field estimate, floored at 1000 rows so tiny
    thresholds don't break legitimate dim-sized payloads. A disabled
    threshold (-1) falls back to Spark's 10 MB default — disabling
    auto-broadcast tunes JOIN planning, it does not make an unbounded
    driver collect safe."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    units = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    mult, num = 1, raw
    for suffix in ("kb", "mb", "gb", "k", "m", "g", "b"):
        if raw.endswith(suffix):
            mult, num = units[suffix[0]], raw[: -len(suffix)]
            break
    try:
        nbytes = int(float(num)) * mult
    except ValueError:
        nbytes = 10 << 20
    if nbytes <= 0:
        nbytes = 10 << 20
    return max(1000, nbytes // (16 * n_cols))


# ------------------------------------------- $densify / $fill (C5+)
_DENSIFY_MAX_POINTS = 10_000_000  # per-partition spine cap, see below


def densify_stage(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$densify`` (Mongo 5.1) — insert documents at step intervals of
    a numeric or date/timestamp field so downstream windows see a
    gapless axis.

    ``{"field": f, "partitionByFields": [p, ...], "range": {"step": k
    [, "unit": "day"|...], "bounds": "full" | "partition" |
    [lo, hi]}}``

    Spark shape (three bounded pieces, no driver loop):

    1. a bounds frame — per-partition ``min/max`` (``"partition"``), the
       global min/max broadcast-crossed with the distinct partition
       keys (``"full"``), or literal ``[lo, hi)`` bounds (Mongo's
       half-open contract; the spine filters ``< hi``) — a
       partitions-sized aggregate with map-side combine;
    2. the spine: ``explode(sequence(lo, hi, step))`` over that frame —
       date/timestamp fields step by ``interval k unit``; integral
       fields by a literal step (a fractional numeric step is a loud
       typed error — binary-float steps silently drift off-grid);
    3. generated docs = spine ANTI-JOIN existing (on partition+field,
       the only shuffle, bounded by spine size), then
       ``unionByName(allowMissingColumns=True)`` back onto the input —
       original documents (on- OR off-grid) pass through untouched,
       generated docs carry partition keys + field and nulls elsewhere,
       exactly Mongo's contract.

    Guard: a runaway numeric spine ((hi-lo)/step points per partition)
    is refused at RUN time by an ``assert_true`` woven into the bound
    column itself (can't be pruned — sequence() consumes it); dates are
    bounded by the calendar (~3.7M day-points per 10k years), and
    sequence() itself hard-stops past the array limit. Mongo's own cap
    is 500k docs total; ours is _DENSIFY_MAX_POINTS (10M) per
    partition — the distributed setting tolerates more.

    100 TB: the expensive side is the anti-join; it shuffles
    (partition, field) pairs only — 16-byte rows, never documents —
    and the union is a no-shuffle concat.
    """
    if not (isinstance(spec, dict) and "field" in spec
            and isinstance(spec.get("range"), dict)):
        raise DocumentQueryError(f"Bad $densify spec: {spec!r}")
    field = spec["field"]
    if field not in df.columns:
        raise DocumentQueryError(f"$densify unknown field {field!r}")
    rng = spec["range"]
    step, unit, bounds = rng.get("step"), rng.get("unit"), rng.get("bounds")
    if step is None or bounds is None:
        raise DocumentQueryError(f"$densify range needs step+bounds: {rng!r}")
    ftype = df.schema[field].dataType
    is_temporal = isinstance(ftype, (T.DateType, T.TimestampType,
                                     T.TimestampNTZType))
    if is_temporal:
        if unit not in _DATE_TRUNC_UNITS:
            raise DocumentQueryError(
                f"$densify on a date field needs a unit: {unit!r}"
            )
        if not isinstance(step, int) or isinstance(step, bool) or step <= 0:
            raise DocumentQueryError(f"$densify bad step: {step!r}")
        step_col = F.expr(f"interval {int(step)} {unit}")
    else:
        if unit is not None:
            raise DocumentQueryError(
                "$densify 'unit' applies to date fields only"
            )
        if not isinstance(step, int) or isinstance(step, bool) or step <= 0:
            raise DocumentQueryError(
                f"$densify numeric step must be a positive int: {step!r} "
                "(fractional steps drift off-grid in binary floats)"
            )
        step_col = F.lit(step)
    parts = spec.get("partitionByFields") or []
    if not isinstance(parts, list) or any(
        p not in df.columns for p in parts
    ):
        raise DocumentQueryError(f"Bad partitionByFields: {parts!r}")

    fcol = F.col(field)
    half_open = False
    if isinstance(bounds, list):
        if len(bounds) != 2:
            raise DocumentQueryError(f"Bad $densify bounds: {bounds!r}")
        lo = F.lit(bounds[0]).cast(ftype)
        hi = F.lit(bounds[1]).cast(ftype)
        half_open = True  # Mongo: literal bounds are [lo, hi)
        if parts:
            bframe = df.select(*parts).distinct().select(
                *parts, lo.alias("__lo"), hi.alias("__hi")
            )
        else:
            bframe = df.sparkSession.range(1).select(
                lo.alias("__lo"), hi.alias("__hi")
            )
    elif bounds == "partition":
        if not parts:
            raise DocumentQueryError(
                "$densify bounds 'partition' requires partitionByFields"
            )
        bframe = df.groupBy(*parts).agg(
            F.min(fcol).alias("__lo"), F.max(fcol).alias("__hi")
        )
    elif bounds == "full":
        gl = df.agg(
            F.min(fcol).alias("__lo"), F.max(fcol).alias("__hi")
        )
        bframe = (
            df.select(*parts).distinct().crossJoin(F.broadcast(gl))
            if parts
            else gl
        )
    else:
        raise DocumentQueryError(f"Bad $densify bounds: {bounds!r}")

    lo_c, hi_c = F.col("__lo"), F.col("__hi")
    if not is_temporal:
        # runaway-spine guard, woven into the bound so Catalyst can't
        # prune it: assert_true returns NULL when the predicate holds,
        # so coalesce() evaluates it then yields the real bound
        n_points = (hi_c - lo_c) / F.lit(step)
        hi_c = F.coalesce(
            F.assert_true(
                n_points <= F.lit(_DENSIFY_MAX_POINTS),
                F.lit(f"$densify spine exceeds {_DENSIFY_MAX_POINTS} "
                      "points in one partition"),
            ).cast(ftype),
            hi_c,
        )
    seq = F.sequence(lo_c, hi_c, step_col)
    spine = bframe.select(
        *parts, F.explode(seq).alias(field)
    ).filter(fcol.isNotNull())
    if half_open:
        # Mongo's literal-bounds contract is [lo, hi): sequence() is
        # inclusive, so trim the upper bound back off
        spine = spine.filter(fcol < F.lit(bounds[1]).cast(ftype))
    existing = df.select(*parts, field).distinct()
    generated = spine.join(existing, on=[*parts, field], how="left_anti")
    return df.unionByName(generated, allowMissingColumns=True)


def fill_stage(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$fill`` (Mongo 5.3) — fill null fields per partition.

    ``{"partitionBy": "$p" | None | "partitionByFields": [...],
    "sortBy": {f: 1|-1}, "output": {col: {"value": v|expr} |
    {"method": "locf" | "linear"}}}``

    - ``value`` → ``coalesce(col, expr)`` — pure projection, no window;
    - ``locf`` → ``last(col, ignorenulls=True)`` over the sorted
      partition, unbounded-preceding..current — one window;
    - ``linear`` → interpolation between the bracketing non-null
      neighbours along a SINGLE ascending numeric sortBy key:
      ``prev + (next-prev)·(x-prev_x)/(next_x-prev_x)``; leading and
      trailing nulls stay null (Mongo's contract). Four helper columns
      over two frames (preceding last / following first) of the SAME
      sort — one exchange, one sort, two Window operators.

      Documented divergence: ``linear`` PROMOTES an integer column to
      double for all rows — the interpolant is fractional and a
      DataFrame column has exactly ONE type, unlike Mongo's
      per-document types which keep untouched values as ints. Existing
      non-null VALUES are preserved exactly (doubles are exact for
      |n| < 2^53); only the dtype widens. A column already double/float
      keeps its values untouched with no cast.

    All methods sharing the (partition, sort) ride one physical sort;
    locf/linear require ``sortBy`` (loud otherwise). State is a window
    frame, not driver memory — spillable at any partition width.
    """
    from pyspark.sql import Window

    if not isinstance(spec, dict) or not isinstance(spec.get("output"), dict) \
            or not spec["output"]:
        raise DocumentQueryError(f"Bad $fill spec: {spec!r}")
    parts: list[Column] = []
    if spec.get("partitionBy") is not None:
        parts = [_ref(spec["partitionBy"])]
    elif spec.get("partitionByFields"):
        parts = [F.col(p) for p in spec["partitionByFields"]]
    sort_by = spec.get("sortBy")
    if sort_by is not None and not (isinstance(sort_by, dict) and sort_by):
        raise DocumentQueryError(f"Bad sortBy: {sort_by!r}")
    sort_cols = (
        [F.col(f).asc() if d >= 0 else F.col(f).desc()
         for f, d in sort_by.items()]
        if sort_by
        else []
    )
    out_cols: dict[str, Column] = {}
    for name, fspec in spec["output"].items():
        if name not in df.columns:
            raise DocumentQueryError(f"$fill unknown field {name!r}")
        if not isinstance(fspec, dict) or len(fspec) != 1:
            raise DocumentQueryError(f"Bad $fill output {name!r}: {fspec!r}")
        col = F.col(name)
        if "value" in fspec:
            out_cols[name] = F.coalesce(col, _ref(fspec["value"]))
            continue
        method = fspec.get("method")
        if method not in ("locf", "linear"):
            raise DocumentQueryError(f"Bad $fill method: {fspec!r}")
        if not sort_cols:
            raise DocumentQueryError(f"$fill method {method!r} requires sortBy")
        w = Window.partitionBy(*parts).orderBy(*sort_cols)
        if method == "locf":
            out_cols[name] = F.last(col, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            continue
        # linear
        if len(sort_by) != 1 or next(iter(sort_by.values())) < 0:
            raise DocumentQueryError(
                "$fill linear requires a single ascending sortBy key"
            )
        sfield = next(iter(sort_by))
        if sfield not in df.columns or not isinstance(
            df.schema[sfield].dataType, T.NumericType
        ):
            # a silent cast("double") of a non-numeric key would yield
            # all-null x positions and a no-op fill — loud beats silent
            raise DocumentQueryError(
                f"$fill linear sortBy key {sfield!r} must be numeric"
            )
        xs = F.col(sfield).cast("double")
        wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        known_v = F.when(col.isNotNull(), col.cast("double"))
        known_x = F.when(col.isNotNull(), xs)
        prev_v = F.last(known_v, ignorenulls=True).over(wp)
        prev_x = F.last(known_x, ignorenulls=True).over(wp)
        next_v = F.first(known_v, ignorenulls=True).over(wf)
        next_x = F.first(known_x, ignorenulls=True).over(wf)
        interp = prev_v + (next_v - prev_v) * (xs - prev_x) / (
            next_x - prev_x
        )
        # int→double promotion is a documented divergence (see
        # docstring); skip the no-op cast when the column is already
        # floating so those columns pass through bit-identical
        keep = col if isinstance(
            df.schema[name].dataType, (T.DoubleType, T.FloatType)
        ) else col.cast("double")
        out_cols[name] = F.when(col.isNotNull(), keep).otherwise(
            F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        )
    return df.withColumns(out_cols)


# ------------------------------------------- $graphLookup (C5+)
_GRAPH_LOOKUP_MAX_ROUNDS = 100


def graph_lookup(df: DataFrame, fdf: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$graphLookup`` — recursive graph traversal from each input
    document over a foreign collection.

    ``{"from", "startWith": "$expr", "connectFromField",
    "connectToField", "as" [, "maxDepth", "depthField",
    "restrictSearchWithMatch"]}``

    Spark shape: the iterative-superstep BFS the dedup plane already
    uses (graph.py's pagerank / dedup's label propagation), driven per
    LOCAL ROW instead of globally:

    - each local row gets an internal key; round 0's frontier is its
      ``startWith`` value;
    - one superstep = equi-join frontier (row, node) against the
      foreign side on ``connectToField`` (AQE broadcasts dim-sized
      foreign collections; otherwise a hash join on the node key —
      16-byte frontier rows either way), recording matches with their
      BFS depth, then the matches' ``connectFromField`` values anti-
      joined against the visited set become the next frontier;
    - the visited (row, node) set both dedups matches (a doc is
      emitted once, at its FIRST discovery depth — Mongo's contract)
      and guarantees termination on cyclic graphs: the frontier
      strictly shrinks against it, so rounds ≤ graph diameter.
      ``maxDepth`` bounds rounds explicitly (depth 0 = first lookup);
      without it a _GRAPH_LOOKUP_MAX_ROUNDS backstop raises loudly
      rather than looping a degenerate graph forever;
    - every round's frontier/matched/visited are ``localCheckpoint``-ed
      (the q60 convention) so lineage stays O(1) per round, not O(d);
    - finally the matches regroup per local row as a sorted array of
      foreign-doc structs (+ ``depthField``), left-joined back — rows
      that matched nothing keep Mongo's empty-array contract.

    Connect fields may be scalar or ARRAYS of scalars (Mongo walks
    arrays element-wise):

    - array ``connectFromField`` → the next frontier explodes each
      match's array into (row, node) pairs — the BFS loop already
      operates on that shape, only frontier derivation changes;
    - array ``connectToField`` → the foreign side is exploded ONCE
      before the walk into (node, doc) pairs, so each superstep stays
      one equi-join; because one doc is then reachable through several
      of its to-nodes (possibly at different depths), matches are
      deduped post-loop to the FIRST discovery depth via a
      group-by-payload min(depth) — exactly Mongo's emit-once
      contract. The scalar path skips both the explode and the dedup,
      keeping its r7 plan unchanged;
    - a ``startWith`` expression that resolves to an array seeds the
      round-0 frontier with each element.

    Map/struct connect fields (and arrays of non-atomic elements) stay
    a loud typed error. ``restrictSearchWithMatch`` filters
    the foreign side BEFORE the walk with the ordinary find dialect —
    it reaches the parquet scan as a pushed predicate.
    """
    for k in ("startWith", "connectFromField", "connectToField", "as"):
        if k not in spec:
            raise DocumentQueryError(f"$graphLookup missing {k!r}")
    start, as_field = spec["startWith"], spec["as"]
    cfrom, cto = spec["connectFromField"], spec["connectToField"]
    if not (isinstance(start, str) and start.startswith("$")) and not isinstance(
        start, dict
    ):
        raise DocumentQueryError(f"$graphLookup bad startWith: {start!r}")
    if cfrom not in fdf.columns or cto not in fdf.columns:
        raise DocumentQueryError(
            f"$graphLookup connect fields {cfrom!r}/{cto!r} must exist "
            f"in the foreign collection"
        )
    def _conn_is_array(f: str) -> bool:
        dt = fdf.schema[f].dataType
        if isinstance(dt, (T.MapType, T.StructType)):
            raise DocumentQueryError(
                f"$graphLookup connect field {f!r} must be scalar or an "
                "array of scalars"
            )
        if isinstance(dt, T.ArrayType):
            if not isinstance(dt.elementType, T.AtomicType):
                raise DocumentQueryError(
                    f"$graphLookup connect field {f!r} must hold atomic "
                    f"elements, not {dt.elementType}"
                )
            return True
        return False

    cfrom_arr, cto_arr = _conn_is_array(cfrom), _conn_is_array(cto)
    if cto_arr:
        # doc dedup below group-bys the full payload struct; Spark can
        # hash/compare arrays but not maps — refuse the one shape the
        # regroup could not execute
        bad = [c for c in fdf.columns
               if isinstance(fdf.schema[c].dataType, T.MapType)]
        if bad:
            raise DocumentQueryError(
                "$graphLookup with an array connectToField cannot dedup "
                f"documents carrying map columns: {bad}"
            )
    restrict = spec.get("restrictSearchWithMatch")
    if restrict is not None:
        fdf = fdf.filter(filter_condition(restrict, fdf.columns))
    max_depth = spec.get("maxDepth")
    if max_depth is not None and (
        not isinstance(max_depth, int) or isinstance(max_depth, bool)
        or max_depth < 0
    ):
        raise DocumentQueryError(f"$graphLookup bad maxDepth: {max_depth!r}")
    depth_field = spec.get("depthField")

    if as_field in df.columns:
        # Mongo OVERWRITES an existing field named by "as" — drop the
        # old column rather than letting the join-back raise an
        # ambiguous-column AnalysisException
        df = df.drop(as_field)
    base = df.withColumn("__gl_row", F.monotonically_increasing_id())
    base = base.localCheckpoint()  # pin the nondeterministic row ids
    seeds = base.select("__gl_row", _ref(start).alias("__node"))
    if isinstance(seeds.schema["__node"].dataType, T.ArrayType):
        # an array-valued startWith seeds one frontier node per element
        seeds = seeds.select(
            "__gl_row", F.explode("__node").alias("__node")
        )
    frontier = (
        seeds.filter(F.col("__node").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    visited = frontier  # (row, node) pairs already probed
    payload_cols = [c for c in fdf.columns]
    # array connectToField: explode the foreign side ONCE into
    # (node, doc) pairs so every superstep stays a single equi-join
    fkeyed = fdf.withColumn(
        "__to", F.explode(F.col(cto)) if cto_arr else F.col(cto)
    )
    # NOTE (r13 optimization round): keeping the VISITED accumulator as
    # a LAZY union of the per-round checkpointed leaves — avoiding the
    # O(d²) re-materialization its eager re-checkpoints pay — was tried
    # and MEASURED SLOWER at sf0.1 (q172 1.89 s → 2.95 s, q179
    # 1.02 s → 1.35 s in the full bench): visited feeds EVERY round's
    # anti-join, so each superstep re-plans a union tree that grows
    # with depth, and the per-round planning/stage overhead dwarfs the
    # copied bytes. The eager collapse keeps every round's plan
    # O(1)-sized; reverted — do not re-try.
    #
    # MATCHED is different (r14): nothing inside the loop reads it — it
    # is consumed exactly once, by the post-loop regroup. Accumulating
    # the per-round checkpointed ``hits`` frames in a Python list and
    # unioning them AFTER the loop removes one materialization job per
    # depth round with none of the per-round replanning above (the
    # union tree is planned once, over already-checkpointed leaves).
    hits_rounds: list[DataFrame] = []
    depth = 0
    while True:
        hits = (
            frontier.join(fkeyed, frontier["__node"] == fkeyed["__to"])
            .select(
                "__gl_row",
                F.lit(depth).cast("long").alias("__depth"),
                *payload_cols,
            )
            .localCheckpoint()
        )
        hits_rounds.append(hits)
        if max_depth is not None and depth >= max_depth:
            break
        nxt = (
            hits.select(
                "__gl_row",
                (F.explode(F.col(cfrom)) if cfrom_arr
                 else F.col(cfrom)).alias("__node"),
            )
            .filter(F.col("__node").isNotNull())
            .distinct()
            .join(visited, ["__gl_row", "__node"], "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
        depth += 1
        if depth >= _GRAPH_LOOKUP_MAX_ROUNDS:
            raise DocumentQueryError(
                f"$graphLookup exceeded {_GRAPH_LOOKUP_MAX_ROUNDS} rounds "
                "without converging — set maxDepth"
            )
    matched = hits_rounds[0]
    for h in hits_rounds[1:]:
        matched = matched.union(h)
    if cto_arr:
        # one doc is reachable through several of its to-nodes, possibly
        # at different depths — emit it ONCE, at its first discovery
        # depth (Mongo's contract). The scalar path needs no dedup: each
        # doc's single to-node is probed at most once per row.
        matched = matched.groupBy("__gl_row", *payload_cols).agg(
            F.min("__depth").alias("__depth")
        )
    doc = F.struct(
        *[F.col(c) for c in payload_cols],
        *([F.col("__depth").alias(depth_field)] if depth_field else []),
    )
    grouped = matched.groupBy("__gl_row").agg(
        F.sort_array(F.collect_list(doc)).alias(as_field)
    )
    out = (
        base.join(grouped, "__gl_row", "left")
        .withColumn(
            as_field,
            F.coalesce(
                F.col(as_field),
                F.array().cast(grouped.schema[as_field].dataType),
            ),
        )
        .drop("__gl_row")
    )
    return out


# ---------------------------------------------------------------- store
def _lit_merge_type(a, b, path: str):
    """Union two inferred literal types (None/NullType = no evidence
    yet); long+double widens, structs merge field-wise, anything else
    is the loud type-drift error."""
    if a is None or isinstance(a, T.NullType):
        return b
    if b is None or isinstance(b, T.NullType):
        return a
    if a == b:
        return a
    if {a, b} == {T.LongType(), T.DoubleType()}:
        return T.DoubleType()
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        am = {f.name: f.dataType for f in a.fields}
        bm = {f.name: f.dataType for f in b.fields}
        names = list(dict.fromkeys(list(am) + list(bm)))
        return T.StructType([
            T.StructField(
                n, _lit_merge_type(am.get(n), bm.get(n), f"{path}.{n}"),
                True,
            )
            for n in names
        ])
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(
            _lit_merge_type(a.elementType, b.elementType, path + "[]"),
            True,
        )
    raise DocumentQueryError(
        f"$documents type drift at {path!r}: {a.simpleString()} vs "
        f"{b.simpleString()} — make the literal values a consistent type"
    )


def _lit_type(v, path: str):
    """Spark type of one literal value — the dialect's type rules
    (int→long, float→double, datetime→timestamp, dict→struct).
    Expressions are refused: $documents here takes LITERAL docs."""
    import datetime as _dt

    if v is None:
        return T.NullType()
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        if v.startswith("$"):
            raise DocumentQueryError(
                f"$documents takes literal documents only; {v!r} at "
                f"{path!r} looks like a field path — there is no input "
                "document to resolve it against"
            )
        return T.StringType()
    if isinstance(v, _dt.datetime):
        return T.TimestampType()
    if isinstance(v, _dt.date):
        return T.DateType()
    if isinstance(v, list):
        et = None
        for i, x in enumerate(v):
            et = _lit_merge_type(et, _lit_type(x, f"{path}[{i}]"), path)
        return T.ArrayType(et or T.NullType(), True)
    if isinstance(v, dict):
        bad = [k for k in v if isinstance(k, str) and k.startswith("$")]
        if bad:
            raise DocumentQueryError(
                f"$documents takes LITERAL documents — expression "
                f"operators are not supported (found {bad} at {path!r})"
            )
        bad_keys = [k for k in v if not isinstance(k, str)]
        if bad_keys:
            # r11 advice: a non-string key would get a str()-named
            # struct field whose value _lit_to_row's v.get(f.name)
            # silently drops to null — loud typed error instead,
            # consistent with the stage's drift/type contracts
            raise DocumentQueryError(
                f"$documents field names must be strings at {path!r}: "
                f"{bad_keys[0]!r}"
            )
        return T.StructType([
            T.StructField(k, _lit_type(x, f"{path}.{k}"), True)
            for k, x in v.items()
        ])
    raise DocumentQueryError(
        f"$documents cannot type literal {type(v).__name__} at {path!r}"
    )


def _lit_resolve_null(t):
    """All-null fields default to string (the JSON reader's rule)."""
    if t is None or isinstance(t, T.NullType):
        return T.StringType()
    if isinstance(t, T.StructType):
        return T.StructType([
            T.StructField(f.name, _lit_resolve_null(f.dataType), True)
            for f in t.fields
        ])
    if isinstance(t, T.ArrayType):
        return T.ArrayType(_lit_resolve_null(t.elementType), True)
    return t


def _lit_to_row(v, t):
    if v is None:
        return None
    if isinstance(t, T.StructType):
        return tuple(_lit_to_row(v.get(f.name), f.dataType) for f in t.fields)
    if isinstance(t, T.ArrayType):
        return [_lit_to_row(x, t.elementType) for x in v]
    if isinstance(t, T.DoubleType):
        return float(v)
    return v


def _literal_docs_frame(spark: SparkSession, docs) -> DataFrame:
    """``$documents`` (Mongo 5.1): an inline literal collection —
    ``spark.createDataFrame`` over the docs with the dialect's type
    rules (schema = first-seen key order, types unioned across docs,
    missing fields null, long+double widens, drift is a loud typed
    error). Driver-sized BY CONSTRUCTION: the literals live in the
    query text, so the broadcast-sized frame is the right plan at any
    corpus scale — prototyping pipelines and seeding $lookup/$unionWith
    probes, never a data path."""
    if not isinstance(docs, list) or not docs:
        raise DocumentQueryError(
            f"$documents expects a non-empty list of documents: {docs!r}"
        )
    bad = [d for d in docs if not isinstance(d, dict) or not d]
    if bad:
        raise DocumentQueryError(
            f"$documents entries must be non-empty documents: {bad[0]!r}"
        )
    merged = None
    for i, d in enumerate(docs):
        merged = _lit_merge_type(merged, _lit_type(d, f"docs[{i}]"), "$documents")
    schema = _lit_resolve_null(merged)
    rows = [_lit_to_row(d, schema) for d in docs]
    return spark.createDataFrame(rows, schema)


class DocumentStore:
    """Collections = named DataFrames; the Mongo-analog façade (C9).

    The reference discovers databases/collections via pymongo
    (mongodb_adapter.py:75-95); here registration is explicit or via
    JSON-lines ingestion (schema inferred by Spark's JSON reader, the
    C7 analog of 100-doc sampling).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._collections: dict[str, DataFrame] = {}

    # -- discovery (C9)
    def register(self, name: str, df: DataFrame) -> None:
        self._collections[name] = df

    def register_json(self, name: str, json_docs: list[str]) -> DataFrame:
        """Ingest JSON documents with schema inference (C7): Spark's JSON
        reader plays the role of the reference's 100-doc type-union
        sampling — at scale it samples rather than scanning everything."""
        df = self.spark.read.json(self.spark.sparkContext.parallelize(json_docs))
        self.register(name, df)
        return df

    def list_collections(self) -> list[str]:
        return sorted(self._collections)

    def collection(self, name: str) -> DataFrame:
        try:
            return self._collections[name]
        except KeyError:
            raise DocumentQueryError(f"Unknown collection: {name}") from None

    # -- schema inference by sampling (C7, mongodb_adapter.py:97-148)
    def collection_schema(self, name: str, sample_size: int = 100) -> dict:
        """Field → union of observed Python type names + nullability from
        a bounded sample, plus the exact row count AND the sample rows
        themselves (``"sample"``) — the same output shape the reference
        builds from 100 sampled documents; returning the sample lets
        the crawl adapter reuse it instead of running a second
        identical limit-collect job per collection."""
        df = self.collection(name)
        sample = df.limit(sample_size).collect()
        field_types: dict[str, set[str]] = {}
        field_nullable: dict[str, bool] = {}
        for row in sample:
            d = row.asDict()
            for k, v in d.items():
                field_types.setdefault(k, set())
                if v is None:
                    field_nullable[k] = True
                else:
                    field_types[k].add(type(v).__name__)
        columns = [
            {
                "name": f,
                "type": ", ".join(sorted(ts)) if ts else "unknown",
                "nullable": field_nullable.get(f, False),
            }
            for f, ts in sorted(field_types.items())
        ]
        return {
            "name": name,
            "columns": columns,
            "row_count": df.count(),
            "sample": sample,
        }

    # -- find (C1-C4)
    def find(
        self,
        collection: str,
        filter_dict: dict | None = None,
        projection: dict | None = None,
        sort: dict | None = None,
        limit: int | None = None,
        skip: int | None = None,
    ) -> DataFrame:
        df = self.collection(collection)
        if filter_dict:
            df = df.filter(filter_condition(filter_dict, df.columns))
        df = apply_projection(df, projection)
        df = apply_sort(df, sort)
        if skip:  # pymongo's find(skip=N): applied before the limit
            df = df.offset(int(skip))
        return df.limit(limit if limit is not None else DEFAULT_LIMIT)

    # -- aggregate (C5)
    def aggregate(
        self, collection: str | None, pipeline: list[dict]
    ) -> DataFrame:
        """collection=None is the db-level aggregate (Mongo's
        ``db.aggregate``): the pipeline must then start with a source
        stage — ``$documents`` is the one this engine supports."""
        src = self.collection(collection) if collection is not None else None
        df = self._apply_pipeline(src, pipeline)
        has_limit = any("$limit" in st for st in pipeline if isinstance(st, dict))
        # aggregate-shaped pipelines are bounded by their GROUP KEY
        # cardinality, and truncating one at 100 rows silently drops
        # whole groups (a $facet over >100 sources would lose facet
        # rows while claiming completeness) — the injected cap guards
        # raw document dumps only. Deliberate divergence from the
        # reference's unconditional injection (nl2mongo.py:171-174);
        # the executor's row cap (S9) still bounds what reaches a
        # client.
        _AGG_STAGES = ("$group", "$facet", "$bucket", "$sortByCount",
                       "$count")
        aggregates = any(
            op in st
            for st in pipeline
            if isinstance(st, dict)
            for op in _AGG_STAGES
        )
        if not has_limit and not aggregates:
            df = df.limit(DEFAULT_LIMIT)  # $limit injection, nl2mongo.py:171-174
        return df

    def _apply_pipeline(
        self, df: DataFrame | None, pipeline: list[dict]
    ) -> DataFrame:
        """Run the stage list with NO limit injection — shared by
        :meth:`aggregate` (which injects the cap afterwards) and the
        ``$lookup`` pipeline form (a sub-pipeline must never be
        truncated: its result is the join payload). ``df=None`` is the
        no-input-collection form: the first stage must be
        ``$documents``."""
        if df is None and not (
            pipeline
            and isinstance(pipeline[0], dict)
            and "$documents" in pipeline[0]
        ):
            raise DocumentQueryError(
                "a pipeline with no input collection must start with "
                "$documents"
            )
        # the most recent $sort's spec, kept alive across the
        # order-preserving stages ($match/$limit/$skip) so a following
        # $group can compile $first/$last against its keys; any stage
        # that reshapes rows or columns clears it (a $project could
        # silently overwrite a sort key)
        last_sort: dict | None = None
        for stage_idx, stage in enumerate(pipeline):
            if not isinstance(stage, dict) or len(stage) != 1:
                raise DocumentQueryError(f"Bad pipeline stage: {stage!r}")
            op, spec = next(iter(stage.items()))
            if op not in ("$match", "$limit", "$skip", "$sort", "$group"):
                last_sort = None
            if op == "$documents":
                # inline literal collection (Mongo 5.1) — a SOURCE
                # stage: only legal first, and only when the pipeline
                # has no input collection (Mongo's contract: $documents
                # runs against the database, $unionWith/$lookup
                # sub-pipelines without a coll/from)
                if stage_idx != 0:
                    raise DocumentQueryError(
                        "$documents must be the first stage"
                    )
                if df is not None:
                    raise DocumentQueryError(
                        "$documents runs against the database, not a "
                        "collection — use aggregate(None, pipeline) or "
                        "a $unionWith {'pipeline': ...} without 'coll'"
                    )
                df = _literal_docs_frame(self.spark, spec)
                continue
            if op == "$match":
                df = df.filter(filter_condition(spec, df.columns))
            elif op == "$group":
                df = apply_group(df, spec, sort_ctx=last_sort)
                last_sort = None
            elif op == "$sort":
                df = apply_sort(df, spec)
                if isinstance(spec, dict):
                    last_sort = spec
            elif op == "$limit":
                df = df.limit(int(spec))
            elif op == "$skip":
                # pagination: Spark's native offset() (3.4+). Mongo
                # applies skip before limit in pipeline order, which is
                # exactly stage order here. Scale note: like every
                # OFFSET, a deep skip still computes the skipped prefix
                # — keyset pagination (a $match on the sort key) is the
                # 100 TB shape; $skip exists for dialect completeness.
                df = df.offset(int(spec))
            elif op in ("$replaceRoot", "$replaceWith"):
                # {"newRoot": "$field"} — promote a struct column to the
                # document root (the standard post-$lookup+$unwind move).
                # $replaceWith (Mongo 4.2) is the shorthand alias: its
                # operand IS the newRoot expression.
                if op == "$replaceWith":
                    spec = {"newRoot": spec}
                nr = spec.get("newRoot") if isinstance(spec, dict) else None
                if not (isinstance(nr, str) and nr.startswith("$")):
                    raise DocumentQueryError(
                        f"{op} expects {{'newRoot': '$field'}}: "
                        f"{spec!r}"
                    )
                field = nr[1:]
                try:
                    ftype = df.schema[field].dataType
                except Exception as exc:
                    # schema[...] raises a bare KeyError (or a Spark
                    # IllegalArgument) for missing / dotted-nested
                    # names — keep the dialect's loud typed-error
                    # contract that nl2doc's ask() fall-through
                    # reports via __cause__
                    raise DocumentQueryError(
                        f"{op} unknown field {field!r} "
                        "(top-level struct columns only)"
                    ) from exc
                if not isinstance(ftype, T.StructType):
                    raise DocumentQueryError(
                        f"{op} field {field!r} is not a document"
                    )
                df = df.select(F.col(f"{field}.*"))
            elif op == "$project":
                df = apply_projection(df, spec)
            elif op == "$count":
                df = df.agg(F.count(F.lit(1)).alias(str(spec)))
            elif op == "$unwind":
                # string form plus the options document:
                # preserveNullAndEmptyArrays → explode_outer (the row
                # survives with a NULL element, Mongo's semantics);
                # includeArrayIndex → posexplode(_outer) with the index
                # column named by the option. All four combinations are
                # native generators — never a UDF.
                if isinstance(spec, str):
                    field, idx_name, preserve = spec[1:], None, False
                else:
                    field = spec["path"][1:]
                    idx_name = spec.get("includeArrayIndex")
                    preserve = bool(
                        spec.get("preserveNullAndEmptyArrays", False)
                    )
                if idx_name:
                    gen = F.posexplode_outer if preserve else F.posexplode
                    # keep the unwound field at its original position
                    # (the generator emits (pos, value) adjacently, so
                    # the index column lands immediately before it) —
                    # positional consumers must not see the field
                    # relocated to the end
                    pos = df.columns.index(field)
                    before = [F.col(c) for c in df.columns[:pos]]
                    after = [F.col(c) for c in df.columns[pos + 1:]]
                    df = df.select(
                        *before,
                        gen(F.col(field)).alias(idx_name, field),
                        *after,
                    )
                else:
                    gen = F.explode_outer if preserve else F.explode
                    df = df.withColumn(field, gen(F.col(field)))
            elif op == "$lookup":
                # Four supported forms, all BEYOND the reference surface
                # (its translator never emits $lookup,
                # NLP_SQLizer/backend/app/ai/nl2mongo.py:64-67):
                #   {"from", "localField", "foreignField", "as"} —
                #     Mongo's left outer equi-join: matches collect into
                #     an array column (possibly empty). Spark shape =
                #     left join + collect_list of the foreign side's
                #     struct, grouped back on the local row. Scale: an
                #     equi-join shuffle on the lookup key plus a regroup
                #     on the (unique) local id — broadcast when the
                #     foreign side is dim-sized.
                #   {"from", "pipeline", "as"} with NO "let" — the
                #     UNCORRELATED sub-pipeline form: the sub-pipeline
                #     runs once over the foreign collection and every
                #     local row receives the full result as one array
                #     (Mongo's semantics when no let-variables
                #     correlate). Spark shape = run the sub-pipeline,
                #     collapse it to a single sorted array row, and
                #     broadcast-cross-join it onto the local scan — the
                #     payload is one row of metadata-sized aggregate
                #     output, never re-executed per local row.
                #   {"from", "let", "pipeline", "as"} and the concise
                #     {"from", "localField", "foreignField", "pipeline",
                #     "as"} — the CORRELATED forms, de-correlated into
                #     one left outer join by substituting the let
                #     bindings into the $match's $expr (Catalyst's own
                #     LATERAL rewrite — see :func:`lookup_correlated`
                #     for the accepted sub-pipeline shapes and the loud
                #     contract on everything else).
                if "let" in spec or (
                    "pipeline" in spec
                    and ("localField" in spec or "foreignField" in spec)
                ):
                    df = lookup_correlated(
                        df, self.collection(spec["from"]), spec
                    )
                    continue
                if "pipeline" in spec:
                    sub = self._apply_pipeline(
                        self.collection(spec["from"]), spec["pipeline"]
                    )
                    # materialize the payload on the DRIVER: collect()
                    # preserves the sub-pipeline's $sort order (Mongo's
                    # array-order contract — a distributed collect_list
                    # would scramble it), and the result is the same
                    # memory class as the broadcast it feeds — one row
                    # holding the whole array either way. A sub-pipeline
                    # big enough to hurt here would also be too big to
                    # broadcast — so the design bound is ENFORCED before
                    # the driver pays for it: a row cap derived from
                    # spark.sql.autoBroadcastJoinThreshold (the size
                    # class the crossJoin below must fit anyway),
                    # fetched via limit(cap+1) so an oversized
                    # sub-pipeline costs one bounded fetch, not a
                    # driver OOM (r8 verdict, What's wrong #1; guard
                    # pattern mirrors _DENSIFY_MAX_POINTS).
                    spark = df.sparkSession
                    row_cap = _lookup_payload_row_cap(
                        spark, max(len(sub.columns), 1)
                    )
                    rows = [tuple(r) for r in sub.limit(row_cap + 1).collect()]
                    if len(rows) > row_cap:
                        raise DocumentQueryError(
                            f"$lookup uncorrelated sub-pipeline from "
                            f"{spec['from']!r} exceeds the broadcast "
                            f"payload bound ({row_cap} rows, derived "
                            "from spark.sql.autoBroadcastJoinThreshold)"
                            " — add a $limit/$group to the sub-pipeline"
                            " or use the correlated let/localField form"
                        )
                    payload = spark.createDataFrame(
                        [(rows,)],
                        T.StructType(
                            [T.StructField(spec["as"], T.ArrayType(sub.schema))]
                        ),
                    )
                    df = df.crossJoin(F.broadcast(payload))
                    continue
                fdf = self.collection(spec["from"])
                local, foreign = spec["localField"], spec["foreignField"]
                out_name = spec["as"]
                fstruct = F.struct(
                    *[F.col(c) for c in fdf.columns]
                ).alias("__frow")
                fslim = fdf.select(
                    F.col(foreign).alias("__fkey"), fstruct
                )
                row_id = "__rowid"
                df = df.withColumn(row_id, F.monotonically_increasing_id())
                # eqNullSafe, not ==: Mongo's $lookup matches a
                # null/missing localField against null foreignField
                # rows; a plain equality join would hand those rows an
                # empty array instead. (FK-complete corpora never hit
                # the difference; nullable keys do.)
                joined = df.join(
                    fslim, df[local].eqNullSafe(fslim["__fkey"]), "left"
                )
                base_cols = [c for c in df.columns if c != row_id]
                df = (
                    joined.groupBy(row_id)
                    .agg(
                        *[F.first(c).alias(c) for c in base_cols],
                        F.collect_list("__frow").alias(out_name),
                    )
                    .drop(row_id)
                )
            elif op == "$unionWith":
                # {"coll": name} / bare "name" / {"coll", "pipeline"} —
                # Mongo appends the other collection's documents to the
                # stream WITH duplicates (SQL UNION ALL, B14's parity).
                # Spark shape: unionByName — a no-shuffle concatenation
                # of the two scans (Catalyst unions the file lists; at
                # 100 TB this is exactly as cheap as reading both
                # inputs). Mongo tolerates heterogeneous documents;
                # a DataFrame engine cannot — schema drift between the
                # two sides is a loud typed error naming the columns,
                # not a silent null-fill. The sub-pipeline recurses
                # through _apply_pipeline, so $out/$merge inside it hit
                # the same read-only denial.
                if isinstance(spec, str):
                    other = self.collection(spec)
                elif isinstance(spec, dict) and "coll" in spec:
                    other = self.collection(spec["coll"])
                    if spec.get("pipeline"):
                        other = self._apply_pipeline(
                            other, spec["pipeline"]
                        )
                elif isinstance(spec, dict) and spec.get("pipeline"):
                    # coll-less form (Mongo 6.0): the sub-pipeline has
                    # no input collection, so it must start with
                    # $documents — the literal-docs union seam
                    other = self._apply_pipeline(None, spec["pipeline"])
                else:
                    raise DocumentQueryError(
                        "$unionWith expects a collection name or "
                        f"{{'coll', 'pipeline'}}: {spec!r}"
                    )
                missing = set(df.columns) - set(other.columns)
                extra = set(other.columns) - set(df.columns)
                if missing or extra:
                    raise DocumentQueryError(
                        "$unionWith schema drift between the two sides "
                        f"(missing from union side: {sorted(missing)}, "
                        f"extra on union side: {sorted(extra)}) — "
                        "project both sides to a shared shape first"
                    )
                # name-matched TYPE drift is the same contract: without
                # this check a long-vs-string column surfaces as a raw
                # AnalysisException and a long-vs-double silently widens
                mismatched = [
                    (c, str(df.schema[c].dataType),
                     str(other.schema[c].dataType))
                    for c in df.columns
                    if df.schema[c].dataType != other.schema[c].dataType
                ]
                if mismatched:
                    raise DocumentQueryError(
                        "$unionWith type drift between the two sides: "
                        + ", ".join(
                            f"{c} ({a} vs {b})" for c, a, b in mismatched
                        )
                        + " — cast both sides to a shared type first"
                    )
                df = df.unionByName(other)
            elif op == "$facet":
                # BEYOND the reference surface (like $lookup): the
                # single-scan grouping-sets translation, see facet_group
                df = facet_group(df, spec)
            elif op == "$bucket":
                # BEYOND the reference surface: explicit-boundary
                # histogram, see bucket_group
                df = bucket_group(df, spec)
            elif op == "$bucketAuto":
                # BEYOND the reference surface: equi-depth histogram
                # with ties-together packing, see bucket_auto_group
                df = bucket_auto_group(df, spec)
            elif op == "$sample":
                # {"size": N} — Mongo samples RANDOMLY; this engine's
                # whole sampling plane is reproducible by design (the
                # q50/q51 md5 convention), so $sample is the same
                # uniform-but-DETERMINISTIC draw: order by the md5 of
                # the document's JSON rendering, take N (that loud
                # divergence beats a result the driver's hash compare
                # and any retry could never reproduce). Spark plan:
                # TakeOrderedAndProject on the hash — per-partition
                # top-N, never a full global sort.
                if not (isinstance(spec, dict)
                        and isinstance(spec.get("size"), int)
                        and not isinstance(spec["size"], bool)
                        and spec["size"] >= 0):
                    raise DocumentQueryError(
                        f"$sample expects {{'size': N>=0}}: {spec!r}"
                    )
                key = F.md5(
                    F.to_json(F.struct(*[F.col(c) for c in df.columns]))
                )
                df = df.orderBy(key).limit(spec["size"])
            elif op == "$unset":
                # string / list-of-strings sugar for the exclusion
                # projection (Mongo 4.2) — maps to df.drop, which is
                # column pruning Catalyst pushes into the scan
                fields = [spec] if isinstance(spec, str) else spec
                if not (isinstance(fields, list) and fields and all(
                    isinstance(f, str) and f for f in fields
                )):
                    raise DocumentQueryError(
                        f"$unset expects a field or list of fields: {spec!r}"
                    )
                missing = [f for f in fields if f not in df.columns]
                if missing:
                    raise DocumentQueryError(
                        f"$unset unknown fields: {missing}"
                    )
                df = df.drop(*fields)
            elif op in ("$addFields", "$set"):
                # computed columns from the expression dialect; pure
                # projections (withColumns), so Catalyst folds them
                # into the surrounding stage plan
                if not isinstance(spec, dict) or not spec:
                    raise DocumentQueryError(
                        f"{op} expects a non-empty field map: {spec!r}"
                    )
                df = df.withColumns(
                    {name: _ref(e) for name, e in spec.items()}
                )
            elif op == "$setWindowFields":
                # BEYOND the reference surface: Mongo 5.0 window stage,
                # 1:1 onto Spark window functions — see set_window_fields
                df = set_window_fields(df, spec)
            elif op == "$graphLookup":
                # BEYOND the reference surface: per-row BFS with a
                # visited-set — see graph_lookup
                if not isinstance(spec, dict) or "from" not in spec:
                    raise DocumentQueryError(
                        f"$graphLookup expects a spec with 'from': {spec!r}"
                    )
                df = graph_lookup(df, self.collection(spec["from"]), spec)
            elif op == "$densify":
                # BEYOND the reference surface: gapless axis via
                # sequence()+anti-join+union — see densify_stage
                df = densify_stage(df, spec)
            elif op == "$fill":
                # BEYOND the reference surface: coalesce/locf/linear
                # null-filling over window frames — see fill_stage
                df = fill_stage(df, spec)
            elif op == "$sortByCount":
                # sugar for $group{_id,count}+$sort{count:-1} (Mongo
                # leaves tie order unspecified; _id breaks ties here so
                # the result is deterministic and oracle-hashable)
                if not (isinstance(spec, str) and spec.startswith("$")):
                    raise DocumentQueryError(
                        f"$sortByCount expects a '$field' ref: {spec!r}"
                    )
                df = (
                    df.groupBy(_ref(spec).alias("_id"))
                    .agg(F.count(F.lit(1)).alias("count"))
                    .orderBy(F.desc("count"), "_id")
                )
            elif op in ("$out", "$merge"):
                # the document plane honors the same read-only contract
                # as the SQL safety gate (B18/S1: SELECT-only, writes
                # denied loudly) — Mongo's write stages get a denial
                # that names the policy, not a generic unsupported error
                raise DocumentQueryError(
                    f"{op} is a write stage; this engine executes "
                    "read-only pipelines (write/DDL denial, same "
                    "policy as the SQL safety gate)"
                )
            elif op == "$redact":
                # $redact's $$DESCEND/$$PRUNE walk needs per-subtree
                # re-evaluation, which a columnar plan cannot express;
                # its two practical uses map 1:1 onto supported stages
                raise DocumentQueryError(
                    "$redact is not supported — filter whole documents "
                    "with $match, or drop fields with $project/$unset"
                )
            else:
                raise DocumentQueryError(f"Unsupported pipeline stage: {op}")
        return df

    # -- query-dict entry point (nl2mongo.py:116-193 shape)
    def execute(self, query_dict: dict) -> DataFrame:
        name = query_dict.get("collection")
        if not name:
            raise DocumentQueryError("Query must specify a collection")
        if "." in name:  # db.collection → collection (nl2mongo.py:135-139)
            name = name.split(".", 1)[1]
        if "pipeline" in query_dict:
            return self.aggregate(name, query_dict["pipeline"])
        if "find" in query_dict:
            return self.find(
                name,
                query_dict["find"],
                query_dict.get("projection"),
                query_dict.get("sort"),
                query_dict.get("limit"),
                query_dict.get("skip"),
            )
        raise DocumentQueryError("Query must have either 'pipeline' or 'find'")

    # -- explain (C8, nl2mongo.py:229-297 → Spark's own planner)
    def explain(self, query_dict: dict) -> str:
        df = self.execute(query_dict)
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )


# ----------------------------------------------------- flattening (C6)
def flatten_for_display(df: DataFrame) -> DataFrame:
    """Reference display contract (nl2mongo.py:195-226): ``_id`` first,
    remaining columns sorted, nested structs/maps/arrays as JSON
    strings, scalars untouched."""
    cols = sorted(df.columns)
    if "_id" in cols:
        cols = ["_id"] + [c for c in cols if c != "_id"]
    out = []
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.StructType, T.MapType, T.ArrayType)):
            out.append(F.to_json(F.col(c)).alias(c))
        else:
            out.append(F.col(c))
    return df.select(*out)


def crawl_document_schema(store: DocumentStore, sample_size: int = 100):
    """DocumentStore → SchemaMetadata adapter — the uniform-crawl bridge
    that lets the document plane feed the SAME trainer/semantic-linker
    as the relational plane (mongodb_adapter.py:227-295 behavior:
    collections become tables, ``_id`` is marked primary key when
    present :265-268, field types come from the sampled collection
    schema :252-270, sample rows are stringified where non-scalar
    :272-284, and synonyms are mined with the same miner as the SQL
    crawl :296-304).

    Driver-side metadata work: per collection one bounded sample + one
    count — never a full scan, so it is as cheap at 100 TB as at 100 MB.
    """
    from ..catalog.metadata import ColumnInfo, SchemaMetadata, TableInfo
    from .profiler import extract_synonyms

    meta = SchemaMetadata()
    for name in store.list_collections():
        cs = store.collection_schema(name, sample_size=sample_size)
        info = TableInfo(name)
        info.row_count = int(cs.get("row_count", 0))
        for col in cs["columns"]:
            ci = ColumnInfo(
                name=col["name"],
                type_str=col["type"],
                nullable=bool(col.get("nullable", True)),
            )
            if col["name"] == "_id":
                ci.is_primary_key = True
                info.primary_key = ["_id"]
            info.columns.append(ci)
        for row in cs["sample"]:  # reuse collection_schema's sample job
            info.sample_rows.append(
                {
                    k: (v if isinstance(v, (int, float, str, bool)) or v is None
                        else str(v))
                    for k, v in row.asDict().items()
                }
            )
        meta.tables[name] = info
    # Mongo declares no FK graph; relationships stay empty (reference
    # parity) and synonyms use the shared miner.
    meta.synonyms = extract_synonyms(meta)
    return meta


def parse_query_json(text: str) -> dict:
    """Tolerant JSON extraction (nl2mongo.py:86-112): strip fences, fall
    back to the first JSON object found in prose."""
    text = text.strip()
    if text.startswith("```"):
        lines = text.split("\n")
        if len(lines) > 2:
            text = "\n".join(lines[1:-1] if lines[-1].strip().startswith("```") else lines[1:])
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        import re

        m = re.search(r"\{.*\}", text, re.DOTALL)
        if m:
            try:
                return json.loads(m.group(0))
            except json.JSONDecodeError:
                pass
        raise DocumentQueryError(f"Failed to parse query JSON: {text[:120]!r}") from None


# ----------------------------------------------------- registry queries
def _store(spark: SparkSession, sf_dir: str) -> DocumentStore:
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("documents", load_table(spark, sf_dir, "documents"))
    store.register("events", load_table(spark, sf_dir, "events"))
    return store


def q35_doc_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """find + projection + sort + limit over the documents collection
    (C1-C4; oracle-checked)."""
    return _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "find": {"lang": "en", "n_chars": {"$gt": 200}},
            "projection": {"doc_id": 1, "source": 1, "n_chars": 1},
            "sort": {"n_chars": -1, "doc_id": 1},
            "limit": 50,
        }
    )


def q36_doc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$match/$group/$sort aggregation pipeline over events (C5;
    oracle-checked; $limit injected automatically). Float aggregates are
    rounded post-pipeline so the hash compare is stable across
    summation orders."""
    df = _store(spark, sf_dir).execute(
        {
            "collection": "events",
            "pipeline": [
                {"$match": {"event_type": {"$in": ["click", "view"]}}},
                {
                    "$group": {
                        "_id": "$event_type",
                        "n": {"$sum": 1},
                        "total": {"$sum": "$value"},
                        "avg_value": {"$avg": "$value"},
                    }
                },
                {"$sort": {"_id": 1}},
            ],
        }
    )
    return df.select(
        "_id",
        "n",
        F.round("total", 2).alias("total"),
        F.round("avg_value", 4).alias("avg_value"),
    )


def q37_doc_find_or_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$or + $regex + $exists find over documents (C1 operator breadth;
    oracle-checked)."""
    return _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "find": {
                "$or": [
                    {"source": {"$regex": "^src1$"}},
                    {"n_chars": {"$lt": 120}},
                ],
                "text": {"$exists": True},
            },
            "projection": {"doc_id": 1, "lang": 1, "source": 1, "n_chars": 1},
            "sort": {"doc_id": 1},
            "limit": 500,
        }
    )


def q132_doc_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$facet over documents — per-language and per-source stats from
    ONE grouping-sets scan (oracle: DuckDB GROUPING SETS twin). The
    rounding keeps the avg engine-exact."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {
                    "$facet": {
                        "by_lang": [
                            {
                                "$group": {
                                    "_id": "$lang",
                                    "n_docs": {"$sum": 1},
                                    "avg_chars": {"$avg": "$n_chars"},
                                }
                            }
                        ],
                        "by_source": [
                            {
                                "$group": {
                                    "_id": "$source",
                                    "n_docs": {"$sum": 1},
                                    "avg_chars": {"$avg": "$n_chars"},
                                }
                            }
                        ],
                    }
                }
            ],
        }
    )
    return out.withColumn("avg_chars", F.round("avg_chars", 4))


BUCKET_BOUNDS = [0, 150, 300, 450, 600]


def q143_doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$bucket histogram of document lengths over explicit boundaries
    (oracle: DuckDB CASE-chain twin). Out-of-range lengths land in the
    'other' default bucket — none exist in the corpus, so the oracle
    proves the boundary arithmetic, the pytest proves the default."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {
                    "$bucket": {
                        "groupBy": "$n_chars",
                        "boundaries": BUCKET_BOUNDS,
                        "default": "other",
                        "output": {
                            "n_docs": {"$sum": 1},
                            "avg_chars": {"$avg": "$n_chars"},
                        },
                    }
                },
                {"$sort": {"_id": 1}},
            ],
        }
    )
    return out.withColumn("avg_chars", F.round("avg_chars", 4))


def _bucket_case_sql(col: str, bounds: list[int]) -> str:
    arms = " ".join(
        f"WHEN {col} >= {lo} AND {col} < {hi} THEN '{lo}'"
        for lo, hi in zip(bounds, bounds[1:])
    )
    return f"CASE {arms} ELSE 'other' END"


Q143_ORACLE_SQL = f"""
    SELECT {_bucket_case_sql("n_chars", BUCKET_BOUNDS)} AS _id,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY _id
    ORDER BY _id
"""


def q154_doc_lang_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source English share via the expression dialect: a $cond
    riding a $sum accumulator plus an $addFields division — the
    conditional-ratio shape Mongo ratio queries use, all compiled to
    one groupBy (oracle: CASE/avg twin)."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {
                    "$group": {
                        "_id": "$source",
                        "n_docs": {"$sum": 1},
                        "n_en": {
                            "$sum": {
                                "$cond": [
                                    {"$eq": ["$lang", "en"]}, 1, 0
                                ]
                            }
                        },
                    }
                },
                {
                    "$addFields": {
                        "en_ratio": {"$divide": ["$n_en", "$n_docs"]}
                    }
                },
                {"$sort": {"_id": 1}},
            ],
        }
    )
    return out.withColumn("en_ratio", F.round("en_ratio", 6))


Q154_ORACLE_SQL = """
    SELECT source AS _id,
           count(*) AS n_docs,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
           round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS en_ratio
    FROM documents
    GROUP BY source
    ORDER BY _id
"""


def q149_top_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$sortByCount over document sources (oracle: group+count+desc)."""
    return _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [{"$sortByCount": "$source"}, {"$limit": 10}],
        }
    )


Q149_ORACLE_SQL = """
    SELECT source AS _id, count(*) AS count
    FROM documents
    GROUP BY source
    ORDER BY count DESC, _id
    LIMIT 10
"""


Q132_ORACLE_SQL = """
    WITH g AS (
      SELECT lang, source,
             grouping(lang)   AS g_lang,
             grouping(source) AS g_source,
             count(*)                 AS n_docs,
             round(avg(n_chars), 4)   AS avg_chars
      FROM documents
      GROUP BY GROUPING SETS ((lang), (source))
    )
    SELECT CASE WHEN g_lang = 0 THEN 'by_lang' ELSE 'by_source' END AS facet,
           coalesce(CAST(lang AS VARCHAR), CAST(source AS VARCHAR)) AS _id,
           n_docs, avg_chars
    FROM g
    ORDER BY facet, _id NULLS FIRST
"""


def q157_doc_lookup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$lookup in its UNCORRELATED-pipeline form: the five longest-doc
    rows each receive the corpus-wide per-language counts (the
    sub-pipeline runs ONCE over the foreign collection and its
    aggregate result is broadcast onto the local rows — never
    re-executed per row), then $unwind flattens the array for the
    hash oracle. New r6 — closes the r5 verdict's '$lookup pipeline
    form' gap; the correlated 'let' form stays a loud error
    (test_documents pins the contract)."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {"$match": {"n_chars": {"$gte": 500}}},
                {"$sort": {"doc_id": 1}},
                {"$limit": 5},
                {"$project": {"doc_id": 1, "lang": 1, "n_chars": 1}},
                {
                    "$lookup": {
                        "from": "documents",
                        "as": "lang_counts",
                        "pipeline": [
                            {"$group": {"_id": "$lang", "n": {"$sum": 1}}}
                        ],
                    }
                },
                {"$unwind": "$lang_counts"},
            ],
        }
    )
    return out.select(
        "doc_id",
        "lang",
        "n_chars",
        F.col("lang_counts._id").alias("corpus_lang"),
        F.col("lang_counts.n").alias("corpus_n"),
    ).orderBy("doc_id", "corpus_lang")


Q157_ORACLE_SQL = """
    WITH top5 AS (
      SELECT doc_id, lang, n_chars
      FROM documents WHERE n_chars >= 500
      ORDER BY doc_id LIMIT 5
    ), lc AS (
      SELECT lang AS corpus_lang, count(*) AS corpus_n
      FROM documents GROUP BY lang
    )
    SELECT doc_id, lang, n_chars, corpus_lang, corpus_n
    FROM top5 CROSS JOIN lc
    ORDER BY doc_id, corpus_lang
"""


def q158_doc_facet_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$facet with PER-FACET $match preludes — each facet filters its
    own input before grouping, and the translation still runs ONE
    grouping-sets scan: the preludes become agg(when(cond, x)) masks
    plus a matched-row-count group filter (see :func:`facet_group`).
    New r6 — closes the r5 verdict's 'per-facet $match prelude' gap;
    a plan pytest asserts the single documents scan."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {
                    "$facet": {
                        "long_by_lang": [
                            {"$match": {"n_chars": {"$gte": 300}}},
                            {
                                "$group": {
                                    "_id": "$lang",
                                    "n_docs": {"$sum": 1},
                                    "avg_chars": {"$avg": "$n_chars"},
                                }
                            },
                        ],
                        "en_by_source": [
                            {"$match": {"lang": "en"}},
                            {
                                "$group": {
                                    "_id": "$source",
                                    "n_docs": {"$sum": 1},
                                    "avg_chars": {"$avg": "$n_chars"},
                                }
                            },
                        ],
                    }
                }
            ],
        }
    )
    return out.withColumn("avg_chars", F.round("avg_chars", 4))


Q158_ORACLE_SQL = """
    SELECT 'long_by_lang' AS facet, lang AS _id,
           count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
    FROM documents WHERE n_chars >= 300 GROUP BY lang
    UNION ALL
    SELECT 'en_by_source', source,
           count(*), round(avg(n_chars), 4)
    FROM documents WHERE lang = 'en' GROUP BY source
    ORDER BY facet, _id
"""


def q167_doc_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination page 3 of the documents listing: $sort + $skip +
    $limit (skip 40, take 20 over a unique sort key) — the C3/C4
    surface every Mongo UI drives, plus $replaceRoot exercised after a
    computed wrapper (oracle: ORDER BY/OFFSET/LIMIT twin)."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {"$sort": {"doc_id": 1}},
                {"$skip": 40},
                {"$limit": 20},
                {"$project": {"doc_id": 1, "lang": 1, "n_chars": 1}},
            ],
        }
    )
    return out


Q167_ORACLE_SQL = """
    SELECT doc_id, lang, n_chars
    FROM documents
    ORDER BY doc_id
    LIMIT 20 OFFSET 40
"""


def q168_doc_lookup_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated ``$lookup`` (the post-2019 Mongo join idiom the
    reference's translator never emits — beyond-parity): the 10 richest
    customers each receive their own orders above 100k via a
    ``let``/``$expr`` sub-pipeline, counted with ``$size``. The
    de-correlation compiles the $match to an eqNullSafe equi-join
    (hash/sort-merge, broadcast-able — see :func:`lookup_correlated`),
    so the 100 TB plan is one key-shuffle, never a per-row probe.
    Oracle: LEFT JOIN + GROUP BY twin."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("customer", load_table(spark, sf_dir, "customer"))
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "customer",
        [
            {"$sort": {"c_acctbal": -1, "c_custkey": 1}},
            {"$limit": 10},
            {"$lookup": {
                "from": "orders",
                "let": {"cid": "$c_custkey"},
                "pipeline": [{"$match": {"$expr": {"$and": [
                    {"$eq": ["$o_custkey", "$$cid"]},
                    {"$gt": ["$o_totalprice", 100000]},
                ]}}}],
                "as": "big_orders",
            }},
            {"$project": {
                "c_custkey": 1,
                "c_acctbal": 1,
                "n_big": {"$size": "$big_orders"},
            }},
        ],
    )
    return out.select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"),
                      "n_big")


Q168_ORACLE_SQL = """
    WITH top10 AS (
      SELECT c_custkey, c_acctbal
      FROM customer
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 10
    )
    SELECT t.c_custkey,
           round(t.c_acctbal, 2) AS acctbal,
           count(o.o_orderkey)   AS n_big
    FROM top10 t
    LEFT JOIN orders o
      ON o.o_custkey = t.c_custkey AND o.o_totalprice > 100000
    GROUP BY t.c_custkey, t.c_acctbal
"""


def q169_doc_union_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$unionWith`` (read-only union stage): English documents
    unioned with the long-document slice of the SAME collection — the
    two filters OVERLAP, so the per-language counts after the union
    prove UNION ALL semantics (overlapping docs counted twice; B14's
    parity on the document plane). Spark shape: two pushed-filter
    scans concatenated with unionByName — no shuffle beyond the final
    small groupBy. Oracle: UNION ALL twin."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {"$match": {"lang": "en"}},
                {"$project": {"doc_id": 1, "lang": 1}},
                {"$unionWith": {
                    "coll": "documents",
                    "pipeline": [
                        {"$match": {"n_chars": {"$gte": 500}}},
                        {"$project": {"doc_id": 1, "lang": 1}},
                    ],
                }},
                {"$group": {"_id": "$lang", "n": {"$sum": 1}}},
                {"$sort": {"_id": 1}},
            ],
        }
    )
    return out


Q169_ORACLE_SQL = """
    WITH u AS (
      SELECT doc_id, lang FROM documents WHERE lang = 'en'
      UNION ALL
      SELECT doc_id, lang FROM documents WHERE n_chars >= 500
    )
    SELECT lang AS _id, count(*) AS n
    FROM u GROUP BY lang ORDER BY _id
"""


def q170_doc_window_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$setWindowFields`` end-to-end: per-source top-5 documents by
    length carrying a rank, a running character total (documents
    frame), the previous doc id ($shift by -1 → lag), and the
    partition-wide total (frame-less accumulator) — all four output
    fields share one (partition, sort), so the physical plan carries
    exactly ONE exchange and ONE sort (measured; the frame-less total
    becomes a second Window operator riding the same sorted exchange —
    zero extra shuffles).
    Oracle: the ANSI window-function twin. Sort key (n_chars DESC,
    doc_id) is unique per partition, so rank and shift are
    deterministic and hash-stable."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {"$setWindowFields": {
                    "partitionBy": "$source",
                    "sortBy": {"n_chars": -1, "doc_id": 1},
                    "output": {
                        "rnk": {"$rank": {}},
                        "running_chars": {
                            "$sum": "$n_chars",
                            "window": {"documents": ["unbounded", "current"]},
                        },
                        "prev_doc": {
                            "$shift": {"output": "$doc_id", "by": -1,
                                       "default": -1}
                        },
                        "source_chars": {"$sum": "$n_chars"},
                    },
                }},
                {"$match": {"rnk": {"$lte": 5}}},
                {"$project": {"doc_id": 1, "source": 1, "n_chars": 1,
                              "rnk": 1, "running_chars": 1,
                              "prev_doc": 1, "source_chars": 1}},
                # unique order before the (injected-or-explicit) limit
                # so the row SET is deterministic (driver contract)
                {"$sort": {"source": 1, "rnk": 1}},
                {"$limit": 500},
            ],
        }
    )
    return out.withColumn("prev_doc", F.col("prev_doc").cast("long"))


Q170_ORACLE_SQL = """
    SELECT doc_id, source, n_chars, rnk, running_chars, prev_doc,
           source_chars
    FROM (
      SELECT doc_id, source, n_chars,
             RANK() OVER w AS rnk,
             CAST(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS running_chars,
             COALESCE(LAG(doc_id, 1) OVER w, -1) AS prev_doc,
             CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT)
               AS source_chars
      FROM documents
      WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id)
    )
    WHERE rnk <= 5
"""


def q171_doc_densify_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$dateTrunc`` → ``$group`` → ``$densify`` → ``$fill`` end-to-end:
    daily counts+revenue of big purchases (the >= 300 filter leaves
    real day GAPS at every SF), densified to a gapless day axis
    (bounds "full", step 1 day), then filled — counts with the literal
    0, revenue carried forward (locf). The generated days prove both
    fill methods: n=0 rows exist only where $densify inserted them.
    Oracle: generate_series + LEFT JOIN + IGNORE NULLS window twin.
    Spark plan: partitions-sized bounds agg → sequence explode →
    16-byte anti-join → no-shuffle union → one window sort."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "events",
            "pipeline": [
                {"$match": {"event_type": "purchase",
                            "value": {"$gte": 300}}},
                {"$addFields": {
                    "day": {"$dateTrunc": {"date": "$ts", "unit": "day"}}
                }},
                {"$group": {"_id": "$day", "n": {"$sum": 1},
                            "total": {"$sum": "$value"}}},
                {"$densify": {"field": "_id",
                              "range": {"step": 1, "unit": "day",
                                        "bounds": "full"}}},
                {"$fill": {"sortBy": {"_id": 1},
                           "output": {"n": {"value": 0},
                                      "total": {"method": "locf"}}}},
                {"$sort": {"_id": 1}},
                {"$limit": 1000},
            ],
        }
    )
    return out.select(
        "_id", "n", F.round("total", 2).alias("total")
    )


Q171_ORACLE_SQL = """
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n, sum(value) AS total
      FROM events
      WHERE event_type = 'purchase' AND value >= 300
      GROUP BY 1
    ), spine AS (
      SELECT CAST(unnest(generate_series(
               (SELECT min(day) FROM d),
               (SELECT max(day) FROM d),
               INTERVAL 1 DAY)) AS DATE) AS day
    )
    SELECT spine.day AS _id,
           COALESCE(d.n, 0) AS n,
           ROUND(LAST_VALUE(d.total IGNORE NULLS) OVER (
             ORDER BY spine.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS total
    FROM spine LEFT JOIN d ON spine.day = d.day
"""


def q172_doc_graph_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$graphLookup`` end-to-end: ancestor chains in a derived 4-ary
    forest over the documents corpus (parent = (doc_id-1)//4, root 0 —
    a deterministic synthetic hierarchy, the standard org-chart shape).
    The 11 highest-id leaves walk their full ancestor chain (BFS ~4-6),
    then $unwind + $addFields flatten (leaf, ancestor, depth) rows.
    Oracle: WITH RECURSIVE twin over the same derivation. The tree has
    unique paths, so depths and row sets match exactly."""
    from ..sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    tree = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") > 0,
            F.floor((F.col("doc_id") - 1) / 4).cast("long"),
        ).alias("parent"),
        "source",
    )
    store = DocumentStore(spark)
    store.register("doc_tree", tree)
    out = store.execute(
        {
            "collection": "doc_tree",
            "pipeline": [
                {"$match": {"doc_id": {"$gte": n - 10}}},
                {"$graphLookup": {
                    "from": "doc_tree",
                    "startWith": "$parent",
                    "connectFromField": "parent",
                    "connectToField": "doc_id",
                    "as": "ancestors",
                    "depthField": "depth",
                }},
                {"$unwind": "$ancestors"},
                {"$addFields": {"anc": "$ancestors.doc_id",
                                "depth": "$ancestors.depth"}},
                {"$project": {"doc_id": 1, "anc": 1, "depth": 1}},
                {"$sort": {"doc_id": 1, "depth": 1}},
                {"$limit": 1000},
            ],
        }
    )
    return out


Q172_ORACLE_SQL = """
    WITH RECURSIVE tree AS (
      SELECT doc_id,
             CASE WHEN doc_id > 0
                  THEN CAST(floor((doc_id - 1) / 4) AS BIGINT) END AS parent
      FROM documents
    ), anc AS (
      SELECT t.doc_id AS doc_id, p.doc_id AS anc, 0 AS depth, p.parent AS up
      FROM tree t JOIN tree p ON p.doc_id = t.parent
      WHERE t.doc_id >= (SELECT max(doc_id) - 9 FROM documents)
      UNION ALL
      SELECT a.doc_id, p.doc_id, a.depth + 1, p.parent
      FROM anc a JOIN tree p ON p.doc_id = a.up
    )
    SELECT doc_id, anc, CAST(depth AS BIGINT) AS depth FROM anc
"""


def q173_doc_bucket_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$bucketAuto`` end-to-end: documents packed into 4 equi-depth
    buckets by length, counts + summed chars per bucket, boundaries
    flattened for display. Oracle: the same first-row-index integer
    formula in ANSI SQL (cumsum window + integer div + lead)."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {"$bucketAuto": {
                    "groupBy": "$n_chars",
                    "buckets": 4,
                    "output": {"n": {"$sum": 1},
                               "sum_chars": {"$sum": "$n_chars"}},
                }},
                {"$addFields": {"lo": "$_id.min", "hi": "$_id.max"}},
                {"$project": {"_id": 0, "lo": 1, "hi": 1, "n": 1,
                              "sum_chars": 1}},
                {"$sort": {"lo": 1}},
            ],
        }
    )
    return out


Q173_ORACLE_SQL = """
    WITH vals AS (
      SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1
    ), cum AS (
      SELECT v, c,
             SUM(c) OVER (ORDER BY v) - c AS start,
             SUM(c) OVER () AS total
      FROM vals
    ), assign AS (
      SELECT v, CAST((start * 4) // total AS BIGINT) AS b FROM cum
    ), bframe AS (
      SELECT b, min(v) AS lo, max(v) AS hi_in FROM assign GROUP BY b
    ), bounds AS (
      SELECT b, lo,
             COALESCE(LEAD(lo) OVER (ORDER BY b),
                      (SELECT max(hi_in) FROM bframe)) AS hi
      FROM bframe
    )
    SELECT bounds.lo AS lo, bounds.hi AS hi,
           count(*) AS n, CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
    FROM documents d
    JOIN assign ON d.n_chars = assign.v
    JOIN bounds ON assign.b = bounds.b
    GROUP BY 1, 2
"""


def q174_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$sample`` end-to-end: a deterministic uniform 25-document draw
    (md5-of-JSON order — the engine's reproducible-sampling contract,
    documented divergence from Mongo's randomness). Projected to the
    id first so the oracle can rebuild the exact hash key as a string
    concat. Oracle: ORDER BY md5('{"doc_id":' || doc_id || '}')."""
    return _store(spark, sf_dir).execute(
        {
            "collection": "documents",
            "pipeline": [
                {"$project": {"_id": 0, "doc_id": 1}},
                {"$sample": {"size": 25}},
            ],
        }
    )


Q174_ORACLE_SQL = """
    SELECT doc_id
    FROM documents
    ORDER BY md5('{"doc_id":' || doc_id || '}')
    LIMIT 25
"""


def q175_doc_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-unit range window end-to-end: per-day purchase revenue with
    a TRAILING 7-DAY rolling total ({"range": [-6, 0], "unit": "day"} —
    range, not rows: days absent from the data contribute nothing,
    which a documents-frame window would get wrong on sparse axes).
    Spark shape: the $group's day axis re-sorted on epoch seconds,
    rangeBetween(-6·86400, 0). Oracle: RANGE BETWEEN INTERVAL twin."""
    out = _store(spark, sf_dir).execute(
        {
            "collection": "events",
            "pipeline": [
                {"$match": {"event_type": "purchase"}},
                {"$addFields": {
                    "day": {"$dateTrunc": {"date": "$ts", "unit": "day"}}
                }},
                {"$group": {"_id": "$day", "daily": {"$sum": "$value"}}},
                {"$setWindowFields": {
                    "sortBy": {"_id": 1},
                    "output": {"trail7": {
                        "$sum": "$daily",
                        "window": {"range": [-6, 0], "unit": "day"},
                    }},
                }},
                {"$sort": {"_id": 1}},
                {"$limit": 1000},
            ],
        }
    )
    return out.select(
        "_id",
        F.round("daily", 2).alias("daily"),
        F.round("trail7", 2).alias("trail7"),
    )


Q175_ORACLE_SQL = """
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(value) AS daily
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT day AS _id,
           ROUND(daily, 2) AS daily,
           ROUND(SUM(daily) OVER (
             ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ), 2) AS trail7
    FROM d
"""


def q177_doc_lookup_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated ``$lookup`` with a per-group ``$sort + $limit`` — the
    "latest N related records" idiom (each of the 5 richest customers
    carries its 3 most recent orders, IN recency order). De-correlated
    to one equi-join + a row_number window on the local row id; the
    $unwind's includeArrayIndex proves the array preserved the
    sub-pipeline's sort. Oracle: ROW_NUMBER twin (idx = rn-1)."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("customer", load_table(spark, sf_dir, "customer"))
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "customer",
        [
            {"$sort": {"c_acctbal": -1, "c_custkey": 1}},
            {"$limit": 5},
            {"$lookup": {
                "from": "orders",
                "let": {"cid": "$c_custkey"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$o_custkey", "$$cid"]}}},
                    {"$sort": {"o_orderdate": -1, "o_orderkey": 1}},
                    {"$limit": 3},
                    {"$project": {"o_orderkey": 1, "o_totalprice": 1}},
                ],
                "as": "recent",
            }},
            {"$unwind": {"path": "$recent", "includeArrayIndex": "idx"}},
            {"$addFields": {"o_orderkey": "$recent.o_orderkey",
                            "price": "$recent.o_totalprice"}},
            {"$project": {"_id": 0, "c_custkey": 1, "idx": 1,
                          "o_orderkey": 1, "price": 1}},
            {"$sort": {"c_custkey": 1, "idx": 1}},
            {"$limit": 100},
        ],
    )
    return out.withColumn("price", F.round("price", 2))


Q177_ORACLE_SQL = """
    WITH top5 AS (
      SELECT c_custkey FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 5
    ), r AS (
      SELECT t.c_custkey, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY t.c_custkey
               ORDER BY o.o_orderdate DESC, o.o_orderkey
             ) AS rn
      FROM top5 t JOIN orders o ON o.o_custkey = t.c_custkey
    )
    SELECT c_custkey, CAST(rn - 1 AS BIGINT) AS idx, o_orderkey,
           ROUND(o_totalprice, 2) AS price
    FROM r WHERE rn <= 3
"""


def q178_doc_lookup_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated ``$lookup`` with a trailing per-correlation
    ``$group`` — "customers with their order count and total spend"
    WITHOUT materializing the order array: the de-correlation compiles
    to join + ONE regrouped aggregate (masked accumulators over each
    local row's matches), the textbook unnesting rewrite. Unmatched
    customers keep the empty array ($group over zero docs emits
    nothing), so the plain $unwind drops them — matching the INNER
    JOIN oracle."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("customer", load_table(spark, sf_dir, "customer"))
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "customer",
        [
            {"$sort": {"c_acctbal": -1, "c_custkey": 1}},
            {"$limit": 10},
            {"$lookup": {
                "from": "orders",
                "let": {"cid": "$c_custkey"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$o_custkey", "$$cid"]}}},
                    {"$group": {"_id": None, "n": {"$sum": 1},
                                "spend": {"$sum": "$o_totalprice"}}},
                ],
                "as": "stats",
            }},
            {"$unwind": "$stats"},
            {"$addFields": {"n": "$stats.n", "spend": "$stats.spend"}},
            {"$project": {"_id": 0, "c_custkey": 1, "n": 1, "spend": 1}},
            {"$sort": {"c_custkey": 1}},
            {"$limit": 100},
        ],
    )
    return out.withColumn("spend", F.round("spend", 2))


Q178_ORACLE_SQL = """
    WITH top10 AS (
      SELECT c_custkey FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    )
    SELECT t.c_custkey, count(*) AS n,
           ROUND(SUM(o.o_totalprice), 2) AS spend
    FROM top10 t JOIN orders o ON o.o_custkey = t.c_custkey
    GROUP BY 1
"""


def q179_doc_graph_lookup_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$graphLookup`` over an ARRAY-valued ``connectFromField`` — the
    adjacency-LIST shape Mongo walks element-wise (q172's scalar parent
    pointers inverted into per-node ``kids`` arrays: node k's children
    are 4k+1..4k+4 within the corpus). Three roots walk descendants to
    maxDepth 2 with an array ``startWith`` seeding depth 0; the frontier
    explodes each match's kids array into (row, node) pairs — the only
    change vs the scalar BFS. Oracle: WITH RECURSIVE twin over the
    EXPLODED edge list (parent BETWEEN-join). Tree paths are unique, so
    depths and row sets match exactly."""
    from ..sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    tree = docs.select(
        "doc_id",
        F.expr(
            "filter(array(doc_id*4+1, doc_id*4+2, doc_id*4+3, doc_id*4+4),"
            f" x -> x < {n})"
        ).alias("kids"),
    )
    store = DocumentStore(spark)
    store.register("doc_tree", tree)
    out = store.execute(
        {
            "collection": "doc_tree",
            "pipeline": [
                {"$match": {"doc_id": {"$lte": 2}}},
                {"$graphLookup": {
                    "from": "doc_tree",
                    "startWith": "$kids",
                    "connectFromField": "kids",
                    "connectToField": "doc_id",
                    "as": "descendants",
                    "depthField": "depth",
                    "maxDepth": 2,
                }},
                {"$unwind": "$descendants"},
                {"$addFields": {"node": "$descendants.doc_id",
                                "depth": "$descendants.depth"}},
                {"$project": {"doc_id": 1, "node": 1, "depth": 1}},
                {"$sort": {"doc_id": 1, "node": 1}},
                {"$limit": 2000},
            ],
        }
    )
    return out


Q179_ORACLE_SQL = """
    WITH RECURSIVE edges AS (
      SELECT p.doc_id AS parent, c.doc_id AS child
      FROM documents p
      JOIN documents c
        ON c.doc_id BETWEEN 4 * p.doc_id + 1 AND 4 * p.doc_id + 4
    ), walk AS (
      SELECT e.parent AS root, e.child AS node, 0 AS depth
      FROM edges e WHERE e.parent <= 2
      UNION ALL
      SELECT w.root, e.child, w.depth + 1
      FROM walk w JOIN edges e ON e.parent = w.node
      WHERE w.depth < 2
    )
    SELECT root AS doc_id, node, CAST(depth AS BIGINT) AS depth
    FROM walk ORDER BY doc_id, node LIMIT 2000
"""


def q180_doc_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$setWindowFields`` statistical + collecting accumulators: the
    40 priciest orders carry their status-partition sample stddev and
    custkey/price covariance (frame-less → whole partition) plus a
    trailing-3 $push of order keys (documents frame, sorted array per
    the dialect's determinism convention, flattened to a string so the
    hash compare stays scalar). Oracle: STDDEV_SAMP / COVAR_SAMP /
    list() window twins. One (partition, sort) pair → one exchange."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "orders",
        [
            {"$sort": {"o_totalprice": -1, "o_orderkey": 1}},
            {"$limit": 40},
            {"$setWindowFields": {
                "partitionBy": "$o_orderstatus",
                "sortBy": {"o_orderkey": 1},
                "output": {
                    "sd": {"$stdDevSamp": "$o_totalprice"},
                    "cov": {"$covarianceSamp": ["$o_custkey",
                                                "$o_totalprice"]},
                    "trail_ids": {
                        "$push": "$o_orderkey",
                        "window": {"documents": [-2, "current"]},
                    },
                },
            }},
            {"$project": {"o_orderkey": 1, "o_orderstatus": 1,
                          "sd": 1, "cov": 1, "trail_ids": 1}},
            {"$sort": {"o_orderkey": 1}},
            {"$limit": 100},
        ],
    )
    return out.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("sd", 4).alias("sd"),
        F.round("cov", 4).alias("cov"),
        F.concat_ws("|", F.col("trail_ids").cast("array<string>"))
        .alias("trail_ids"),
    )


Q180_ORACLE_SQL = """
    WITH t AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_custkey
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 40
    )
    SELECT o_orderkey, o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice) OVER
                 (PARTITION BY o_orderstatus), 4) AS sd,
           ROUND(COVAR_SAMP(o_custkey, o_totalprice) OVER
                 (PARTITION BY o_orderstatus), 4) AS cov,
           array_to_string(list_sort(list(o_orderkey) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           )), '|') AS trail_ids
    FROM t ORDER BY o_orderkey LIMIT 100
"""


def q181_doc_lookup_group_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated ``$lookup`` with a trailing KEYED ``$group`` — each of
    the 10 richest customers carries an array of per-status order
    aggregates ({_id: status, n, spend}, sorted by _id). De-correlated
    to groupBy(row_id, status) → regroup-to-array: two map-side-
    combinable aggregates, never a per-row re-execution. $unwind +
    flatten exposes (custkey, status, n, spend) rows; unmatched
    customers keep the empty array and drop out — matching the INNER
    JOIN + two-level GROUP BY oracle."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("customer", load_table(spark, sf_dir, "customer"))
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "customer",
        [
            {"$sort": {"c_acctbal": -1, "c_custkey": 1}},
            {"$limit": 10},
            {"$lookup": {
                "from": "orders",
                "let": {"cid": "$c_custkey"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$o_custkey", "$$cid"]}}},
                    {"$group": {"_id": "$o_orderstatus",
                                "n": {"$sum": 1},
                                "spend": {"$sum": "$o_totalprice"}}},
                ],
                "as": "by_status",
            }},
            {"$unwind": "$by_status"},
            {"$addFields": {"status": "$by_status._id",
                            "n": "$by_status.n",
                            "spend": "$by_status.spend"}},
            {"$project": {"_id": 0, "c_custkey": 1, "status": 1,
                          "n": 1, "spend": 1}},
            {"$sort": {"c_custkey": 1, "status": 1}},
            {"$limit": 200},
        ],
    )
    return out.withColumn("spend", F.round("spend", 2))


Q181_ORACLE_SQL = """
    WITH top10 AS (
      SELECT c_custkey FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    )
    SELECT t.c_custkey, o.o_orderstatus AS status, count(*) AS n,
           ROUND(SUM(o.o_totalprice), 2) AS spend
    FROM top10 t JOIN orders o ON o.o_custkey = t.c_custkey
    GROUP BY 1, 2
"""


def q184_doc_expr_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r8 expression-dialect surface end-to-end over one $addFields:
    HALF_EVEN $round (Spark bround — Mongo's banker's contract, NOT
    HALF_UP), $trunc-toward-zero with a place, $split + $arrayElemAt
    (0-based), $filter/$reduce with $$-variable bodies, $switch,
    $substrCP (0-based), $dateDiff (boundary-crossing day/month),
    $dateAdd, $year. Everything compiles to native Catalyst expressions
    inside one projection — zero UDFs, zero extra stages (the scan +
    one whole-stage-codegen project). Oracle: DuckDB's round_even /
    trunc / string_split / list_transform+list_sum / CASE twins."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_orderkey": {"$lte": 200}}},
            {"$addFields": {
                "sev": {"$round": [{"$divide": ["$o_totalprice", 7]}, 2]},
                "ktr": {"$trunc": [{"$divide": ["$o_totalprice", 7]}, 1]},
                "prio_word": {"$arrayElemAt": [
                    {"$split": ["$o_orderpriority", "-"]}, 1]},
                "n_parts": {"$size": {"$split": ["$o_orderpriority",
                                                 "-"]}},
                "long_parts": {"$size": {"$filter": {
                    "input": {"$split": ["$o_orderpriority", "-"]},
                    "as": "w",
                    "cond": {"$gte": [{"$strLenCP": "$$w"}, 5]}}}},
                "chars": {"$reduce": {
                    "input": {"$split": ["$o_orderpriority", "-"]},
                    "initialValue": 0,
                    "in": {"$add": ["$$value",
                                    {"$strLenCP": "$$this"}]}}},
                "status_word": {"$switch": {"branches": [
                    {"case": {"$eq": ["$o_orderstatus", "F"]},
                     "then": "finished"},
                    {"case": {"$eq": ["$o_orderstatus", "O"]},
                     "then": "open"}],
                    "default": "partial"}},
                "prio_tail": {"$substrCP": ["$o_orderpriority", 2, 3]},
                "age_days": {"$dateDiff": {"startDate": "$o_orderdate",
                                           "endDate": "1998-12-01",
                                           "unit": "day"}},
                "age_months": {"$dateDiff": {"startDate": "$o_orderdate",
                                             "endDate": "1998-12-01",
                                             "unit": "month"}},
                "follow_up": {"$dateAdd": {"startDate": "$o_orderdate",
                                           "unit": "month", "amount": 3}},
                "yr": {"$year": "$o_orderdate"},
            }},
            {"$project": {"o_orderkey": 1, "sev": 1, "ktr": 1,
                          "prio_word": 1, "n_parts": 1, "long_parts": 1,
                          "chars": 1, "status_word": 1, "prio_tail": 1,
                          "age_days": 1, "age_months": 1,
                          "follow_up": 1, "yr": 1}},
            {"$sort": {"o_orderkey": 1}},
            {"$limit": 100},
        ],
    )
    # date + year-month interval comes back TIMESTAMP on this plan;
    # the entry's contract (like Mongo's date-in/date-out for whole
    # units) is a date
    return out.withColumn("follow_up", F.col("follow_up").cast("date"))


Q184_ORACLE_SQL = """
    SELECT o_orderkey,
           round_even(o_totalprice / 7, 2) AS sev,
           trunc(o_totalprice / 7 * 10) / 10 AS ktr,
           string_split(o_orderpriority, '-')[2] AS prio_word,
           CAST(len(string_split(o_orderpriority, '-')) AS BIGINT)
             AS n_parts,
           CAST(len(list_filter(string_split(o_orderpriority, '-'),
                                w -> length(w) >= 5)) AS BIGINT)
             AS long_parts,
           CAST(list_sum(list_transform(string_split(o_orderpriority, '-'),
                                        w -> length(w))) AS BIGINT)
             AS chars,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_word,
           substring(o_orderpriority, 3, 3) AS prio_tail,
           CAST(datediff('day', o_orderdate, DATE '1998-12-01')
                AS BIGINT) AS age_days,
           CAST(datediff('month', o_orderdate, DATE '1998-12-01')
                AS BIGINT) AS age_months,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS follow_up,
           year(o_orderdate) AS yr
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    LIMIT 100
"""


def q185_doc_window_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$setWindowFields`` calculus accumulators: per event type,
    ``$derivative`` (value change per HOUR over a trailing-4 documents
    frame — Mongo's unit algebra on the ts sortBy) and ``$integral``
    (running trapezoid area in value·hours). Both ride native window
    functions: the derivative is four endpoint reads on ONE window; the
    integral is the cumulative-trapezoid endpoint diff (no UDF, no
    self-join). Oracle: lag-built trapezoids + first/last window twins
    over epoch_us — the arithmetic mirrors the Spark plan operation for
    operation, so the doubles agree bit-for-bit before rounding (the
    integral's running sum may associate differently in DuckDB's
    segment-tree windows; round(4) absorbs ulp drift). ts is unique at
    every SF (TESTDATA), so the sort order — and with it the trapezoid
    pairing — is deterministic."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("events", load_table(spark, sf_dir, "events"))
    out = store.aggregate(
        "events",
        [
            {"$match": {"event_id": {"$lt": 2000}}},
            {"$setWindowFields": {
                "partitionBy": "$event_type",
                "sortBy": {"ts": 1},
                "output": {
                    "rate": {
                        "$derivative": {"input": "$value", "unit": "hour"},
                        "window": {"documents": [-3, "current"]},
                    },
                    "area": {
                        "$integral": {"input": "$value", "unit": "hour"},
                        "window": {"documents": ["unbounded", "current"]},
                    },
                },
            }},
            {"$project": {"event_id": 1, "event_type": 1,
                          "rate": 1, "area": 1}},
            {"$sort": {"event_id": 1}},
            {"$limit": 500},
        ],
    )
    return out.select(
        "event_id",
        "event_type",
        F.round("rate", 6).alias("rate"),
        F.round("area", 4).alias("area"),
    )


Q185_ORACLE_SQL = """
    WITH base AS (
      SELECT event_id, event_type, value, epoch_us(ts) AS k
      FROM events WHERE event_id < 2000
    ), t AS (
      SELECT event_id, event_type, value, k,
             (value + lag(value) OVER ws) * 0.5
               * (k - lag(k) OVER ws) AS trap
      FROM base
      WINDOW ws AS (PARTITION BY event_type ORDER BY k)
    ), c AS (
      SELECT event_id, event_type, value, k,
             sum(coalesce(trap, 0.0)) OVER (
               PARTITION BY event_type ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT event_id, event_type,
           ROUND(CASE WHEN last(k) OVER w4 - first(k) OVER w4 <> 0 THEN
                   (last(value) OVER w4 - first(value) OVER w4)
                   / (last(k) OVER w4 - first(k) OVER w4)
                   * 3600000000.0
                 END, 6) AS rate,
           ROUND((last(cum) OVER wu - first(cum) OVER wu)
                 / 3600000000.0, 4) AS area
    FROM c
    WINDOW w4 AS (PARTITION BY event_type ORDER BY k
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
           wu AS (PARTITION BY event_type ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY event_id LIMIT 500
"""


def q186_doc_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$expMovingAvg`` in both Mongo forms (N=5 → α=1/3, and a raw
    α=0.25) per user over the ts order — the one $setWindowFields
    operator whose per-row recursion no Spark frame expresses, compiled
    to ONE Arrow-batched applyInPandas pass (_apply_ema) computing both
    fields per group. Rows-only to the driver; the harness value-checks
    it DIFFERENTIALLY against a pure-pandas groupby-ewm replay (same
    recursion, same library → bit-identical doubles before rounding)."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("events", load_table(spark, sf_dir, "events"))
    out = store.aggregate(
        "events",
        [
            {"$match": {"user_id": {"$lt": 40}}},
            {"$setWindowFields": {
                "partitionBy": "$user_id",
                "sortBy": {"ts": 1},
                "output": {
                    "ema5": {"$expMovingAvg": {"input": "$value", "N": 5}},
                    "ema_a": {"$expMovingAvg": {"input": "$value",
                                                "alpha": 0.25}},
                },
            }},
            {"$project": {"event_id": 1, "user_id": 1,
                          "ema5": 1, "ema_a": 1}},
            {"$sort": {"event_id": 1}},
            {"$limit": 800},
        ],
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("ema5", 6).alias("ema5"),
        F.round("ema_a", 6).alias("ema_a"),
    )


def q187_doc_selection_accs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Mongo 5.2/7.0 selection + percentile accumulator surface in
    one $group: $topN/$bottomN/$top (comparator-sorted collect with the
    output-ascending tie convention), $minN/$maxN (value order), and
    exact $median/$percentile (documented better-accuracy divergence
    from Mongo's t-digest 'approximate'). Oracle: DuckDB ORDER BY-list
    slices (bottomN = reversed ascending slice — the same element set
    the comparator picks under ties) and quantile_cont twins. One
    map-side-combinable aggregate per accumulator, one shuffle total."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_orderkey": {"$lte": 3000}}},
            {"$group": {
                "_id": "$o_orderstatus",
                "top3": {"$topN": {"output": "$o_orderkey",
                                   "sortBy": {"o_totalprice": -1},
                                   "n": 3}},
                "bottom3": {"$bottomN": {"output": "$o_orderkey",
                                         "sortBy": {"o_totalprice": -1},
                                         "n": 3}},
                "hi": {"$top": {"output": "$o_orderkey",
                                "sortBy": {"o_totalprice": -1}}},
                "cheap2": {"$minN": {"input": "$o_totalprice", "n": 2}},
                "rich2": {"$maxN": {"input": "$o_totalprice", "n": 2}},
                "med": {"$median": {"input": "$o_totalprice",
                                    "method": "approximate"}},
                "pct": {"$percentile": {"input": "$o_totalprice",
                                        "p": [0.25, 0.9],
                                        "method": "approximate"}},
            }},
            {"$sort": {"_id": 1}},
        ],
    )
    return out.select(
        "_id",
        F.concat_ws("|", F.col("top3").cast("array<string>")).alias("top3"),
        F.concat_ws("|", F.col("bottom3").cast("array<string>"))
        .alias("bottom3"),
        "hi",
        F.round(F.element_at("cheap2", 1), 2).alias("cheap1"),
        F.round(F.element_at("cheap2", 2), 2).alias("cheap2"),
        F.round(F.element_at("rich2", 1), 2).alias("rich1"),
        F.round(F.element_at("rich2", 2), 2).alias("rich2"),
        F.round("med", 4).alias("med"),
        F.round(F.element_at("pct", 1), 4).alias("p25"),
        F.round(F.element_at("pct", 2), 4).alias("p90"),
    )


Q187_ORACLE_SQL = """
    WITH t AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT o_orderstatus AS _id,
           array_to_string(
             (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3],
             '|') AS top3,
           array_to_string(list_reverse(
             (list(o_orderkey ORDER BY o_totalprice ASC, o_orderkey))[1:3]),
             '|') AS bottom3,
           (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1]
             AS hi,
           ROUND((list(o_totalprice ORDER BY o_totalprice))[1], 2)
             AS cheap1,
           ROUND((list(o_totalprice ORDER BY o_totalprice))[2], 2)
             AS cheap2,
           ROUND((list(o_totalprice ORDER BY o_totalprice DESC))[1], 2)
             AS rich1,
           ROUND((list(o_totalprice ORDER BY o_totalprice DESC))[2], 2)
             AS rich2,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS med,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM t GROUP BY o_orderstatus ORDER BY _id
"""


def q188_doc_window_nselect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Mongo 5.2 N-selection WINDOW forms in one $setWindowFields:
    $firstN/$lastN (sort-order slices of the frame — well-defined here,
    unlike $group where they are refused) and $minN/$maxN (value-order
    slices), over both the whole partition and a trailing documents
    frame. All four ride collect_list on the SAME (partition, sort)
    window — one exchange, one sort. Oracle: DuckDB window list()
    slices (lastN via the [-n:] negative slice; maxN via list_sort
    DESC)."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("events", load_table(spark, sf_dir, "events"))
    out = store.aggregate(
        "events",
        [
            {"$match": {"event_id": {"$lt": 1500}}},
            {"$setWindowFields": {
                "partitionBy": "$event_type",
                "sortBy": {"ts": 1},
                "output": {
                    "first2": {"$firstN": {"input": "$value", "n": 2}},
                    "last2": {"$lastN": {"input": "$value", "n": 2}},
                    "trail3min2": {
                        "$minN": {"input": "$value", "n": 2},
                        "window": {"documents": [-2, "current"]},
                    },
                    "trail3max2": {
                        "$maxN": {"input": "$value", "n": 2},
                        "window": {"documents": [-2, "current"]},
                    },
                    "top2ids": {
                        "$topN": {"output": "$event_id",
                                  "sortBy": {"value": -1}, "n": 2},
                        "window": {"documents": [-2, "current"]},
                    },
                    "bot1id": {
                        "$bottom": {"output": "$event_id",
                                    "sortBy": {"value": -1}},
                        "window": {"documents": [-2, "current"]},
                    },
                },
            }},
            {"$project": {"event_id": 1, "event_type": 1, "first2": 1,
                          "last2": 1, "trail3min2": 1, "trail3max2": 1,
                          "top2ids": 1, "bot1id": 1}},
            {"$sort": {"event_id": 1}},
            {"$limit": 400},
        ],
    )
    return out.select(
        "event_id",
        "event_type",
        F.concat_ws("|", F.col("first2").cast("array<string>"))
        .alias("first2"),
        F.concat_ws("|", F.col("last2").cast("array<string>"))
        .alias("last2"),
        F.concat_ws("|", F.col("trail3min2").cast("array<string>"))
        .alias("min2"),
        F.concat_ws("|", F.col("trail3max2").cast("array<string>"))
        .alias("max2"),
        F.concat_ws("|", F.col("top2ids").cast("array<string>"))
        .alias("top2ids"),
        "bot1id",
    )


Q188_ORACLE_SQL = """
    WITH t AS (
      SELECT event_id, event_type, ts, value
      FROM events WHERE event_id < 1500
    )
    SELECT event_id, event_type,
           array_to_string((list(value) OVER wp)[1:2], '|') AS first2,
           array_to_string((list(value) OVER wp)[-2:], '|') AS last2,
           array_to_string(list_sort(list(value) OVER w3)[1:2], '|')
             AS min2,
           array_to_string(
             list_reverse(list_sort(list(value) OVER w3))[1:2], '|')
             AS max2,
           array_to_string(list_transform(
             list_sort(list(struct_pack(s := -value, i := event_id))
                       OVER w3)[1:2],
             x -> x.i), '|') AS top2ids,
           list_transform(
             list_sort(list(struct_pack(s := value, i := event_id))
                       OVER w3)[1:1],
             x -> x.i)[1] AS bot1id
    FROM t
    WINDOW wp AS (PARTITION BY event_type ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING),
           w3 AS (PARTITION BY event_type ORDER BY ts
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY event_id LIMIT 400
"""


def q189_doc_window_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last four Mongo window operators, completing the
    $setWindowFields table: $locf (running last non-null), $linearFill
    (bracketing-neighbor interpolation along the ts axis — the $fill
    stage's math as a window op), and the 7.0 window forms of
    $median/$percentile (exact interpolated, framed and
    whole-partition). The gappy column is manufactured by a $cond so
    the fills have real nulls to bridge. Oracle: IGNORE NULLS
    last_value/first_value + quantile_cont window twins. Cost note: the
    framed percentile recomputes its buffer per row (O(frame) each) —
    the documented price of exact percentiles in sliding windows; at
    100 TB prefer the merge-only sketch tiers (q155/q156) for wide
    frames."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("events", load_table(spark, sf_dir, "events"))
    out = store.aggregate(
        "events",
        [
            {"$match": {"event_id": {"$lt": 1200}}},
            {"$addFields": {"gappy": {"$cond": [
                {"$gt": ["$value", 40]}, None, "$value"]}}},
            {"$setWindowFields": {
                "partitionBy": "$event_type",
                "sortBy": {"ts": 1},
                "output": {
                    "lo": {"$locf": "$gappy"},
                    "lf": {"$linearFill": "$gappy"},
                    "med10": {"$median": {"input": "$value",
                                          "method": "approximate"},
                              "window": {"documents": [-9, "current"]}},
                    "p90": {"$percentile": {"input": "$value",
                                            "p": [0.9],
                                            "method": "approximate"}},
                },
            }},
            {"$project": {"event_id": 1, "event_type": 1, "lo": 1,
                          "lf": 1, "med10": 1, "p90": 1}},
            {"$sort": {"event_id": 1}},
            {"$limit": 400},
        ],
    )
    return out.select(
        "event_id",
        "event_type",
        F.round("lo", 2).alias("lo"),
        F.round("lf", 6).alias("lf"),
        F.round("med10", 4).alias("med10"),
        F.round(F.element_at("p90", 1), 4).alias("p90"),
    )


Q189_ORACLE_SQL = """
    WITH t AS (
      SELECT event_id, event_type, value,
             CASE WHEN value > 40 THEN NULL ELSE value END AS gappy,
             epoch_us(ts)::DOUBLE AS k
      FROM events WHERE event_id < 1200
    ), f AS (
      SELECT event_id, event_type, value, gappy, k,
             last_value(gappy IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN gappy IS NOT NULL THEN k END
                        IGNORE NULLS) OVER wp AS prev_x,
             first_value(gappy IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN gappy IS NOT NULL THEN k END
                         IGNORE NULLS) OVER wf AS next_x,
             quantile_cont(value, 0.5) OVER w10 AS med10,
             quantile_cont(value, 0.9) OVER wall AS p90
      FROM t
      WINDOW wp AS (PARTITION BY event_type ORDER BY k
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY k
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
             w10 AS (PARTITION BY event_type ORDER BY k
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
             wall AS (PARTITION BY event_type ORDER BY k
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, event_type,
           ROUND(prev_v, 2) AS lo,
           ROUND(CASE WHEN gappy IS NOT NULL THEN gappy
                      WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                      THEN prev_v + (next_v - prev_v) * (k - prev_x)
                           / (next_x - prev_x)
                 END, 6) AS lf,
           ROUND(med10, 4) AS med10,
           ROUND(p90, 4) AS p90
    FROM f ORDER BY event_id LIMIT 400
"""


def q190_doc_group_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo's defining sort-then-group idiom: latest/earliest order
    per customer via $sort {date desc, key asc} → $group with
    $first/$last. Compiled to min_by/max_by over the direction-
    normalized key struct — ONE map-side-combinable aggregate riding
    the same shuffle as the $sum, never a window, self-join, or
    re-sort (the preceding $sort's global sort is still executed for
    stage fidelity; at 100 TB drop it and let the accumulators carry
    the ordering — they never needed the physical sort). Oracle:
    DuckDB ORDER BY-list endpoints."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_custkey": {"$lte": 300}}},
            {"$sort": {"o_orderdate": -1, "o_orderkey": 1}},
            {"$group": {
                "_id": "$o_custkey",
                "latest_key": {"$first": "$o_orderkey"},
                "latest_price": {"$first": "$o_totalprice"},
                "earliest_key": {"$last": "$o_orderkey"},
                "n": {"$sum": 1},
            }},
            {"$sort": {"_id": 1}},
        ],
    )
    return out.withColumn("latest_price", F.round("latest_price", 2))


Q190_ORACLE_SQL = """
    WITH t AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM orders WHERE o_custkey <= 300
    )
    SELECT o_custkey AS _id,
           (list(o_orderkey ORDER BY o_orderdate DESC, o_orderkey))[1]
             AS latest_key,
           ROUND((list(o_totalprice
                       ORDER BY o_orderdate DESC, o_orderkey))[1], 2)
             AS latest_price,
           (list(o_orderkey ORDER BY o_orderdate DESC, o_orderkey))[-1]
             AS earliest_key,
           count(*) AS n
    FROM t GROUP BY o_custkey ORDER BY _id
"""


def q193_doc_expr_dialect2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r9 expression-dialect surface in one $addFields projection:
    $dateToString/$dateFromString (Mongo %-formats translated to Spark
    datetime patterns, literal runs quoted, strict parse + onError),
    $regexMatch (with options) and $regexFind (match/idx/captures doc),
    $let ($$-scoped vars), $getField over struct results, $replaceAll,
    $indexOfCP (plain and [start, end)-bounded), and the object plane —
    document literals → $arrayToObject → map → $objectToArray round-trip.
    Everything compiles to native Catalyst (date_format, to_timestamp,
    regexp_like/extract/instr, locate, replace, map_* functions) inside
    ONE whole-stage-codegen projection — zero UDFs, zero extra stages.
    Oracle: DuckDB strftime/strptime/regexp/strpos/list twins.
    Reference parity: extends the expression dialect of the reference's
    Mongo surface (backend/app/ai/nl2mongo.py + backend/app/mongodb_adapter.py) the same way q184 does."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    kv_map = {"$arrayToObject": {"$map": {
        "input": {"$split": ["$o_orderpriority", "-"]},
        "as": "w",
        "in": {"k": "$$w", "v": {"$toLong": {"$strLenCP": "$$w"}}},
    }}}
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_orderkey": {"$lte": 300}}},
            {"$addFields": {
                "odate_str": {"$dateToString": {
                    "format": "%j/%Y %m-%d", "date": "$o_orderdate"}},
                "roundtrip": {"$toDate": {"$dateFromString": {
                    "dateString": {"$dateToString": {
                        "format": "%Y/%m/%d", "date": "$o_orderdate"}},
                    "format": "%Y/%m/%d"}}},
                "fallback_day": {"$toDate": {"$dateFromString": {
                    "dateString": "$o_orderpriority",
                    "onError": {"$toDate": "1999-01-01"}}}},
                "is_urgent": {"$regexMatch": {
                    "input": "$o_orderpriority", "regex": "^[1-2]-"}},
                "has_urgent_ci": {"$regexMatch": {
                    "input": "$o_orderpriority", "regex": "urgent",
                    "options": "i"}},
                "prio_num": {"$toInt": {"$arrayElemAt": [
                    {"$getField": {
                        "field": "captures",
                        "input": {"$regexFind": {
                            "input": "$o_orderpriority",
                            "regex": "^([0-9]+)-"}}}}, 0]}},
                "word_match": {"$getField": {
                    "field": "match",
                    "input": {"$regexFind": {
                        "input": "$o_orderpriority",
                        "regex": "[A-Z]{5,}"}}}},
                "word_idx": {"$ifNull": [
                    {"$getField": {
                        "field": "idx",
                        "input": {"$regexFind": {
                            "input": "$o_orderpriority",
                            "regex": "[A-Z]{5,}"}}}},
                    -1]},
                "capped": {"$let": {
                    "vars": {"t": {"$divide": ["$o_totalprice", 7]}},
                    "in": {"$round": [{"$add": ["$$t", "$$t"]}, 2]}}},
                "replaced": {"$replaceAll": {
                    "input": "$o_orderpriority", "find": "-",
                    "replacement": "::"}},
                "idx_e": {"$indexOfCP": ["$o_orderpriority", "E"]},
                "idx_e_bounded": {"$indexOfCP":
                                  ["$o_orderpriority", "E", 3, 7]},
                "n_keys": {"$size": {"$objectToArray": kv_map}},
                "first_k": {"$getField": {
                    "field": "k",
                    "input": {"$arrayElemAt":
                              [{"$objectToArray": kv_map}, 0]}}},
                "second_v": {"$getField": {
                    "field": "v",
                    "input": {"$arrayElemAt":
                              [{"$objectToArray": kv_map}, 1]}}},
            }},
            {"$project": {"o_orderkey": 1, "odate_str": 1, "roundtrip": 1,
                          "fallback_day": 1, "is_urgent": 1,
                          "has_urgent_ci": 1, "prio_num": 1,
                          "word_match": 1, "word_idx": 1, "capped": 1,
                          "replaced": 1, "idx_e": 1,
                          "idx_e_bounded": 1, "n_keys": 1,
                          "first_k": 1, "second_v": 1}},
            {"$sort": {"o_orderkey": 1}},
            {"$limit": 150},
        ],
    )
    return out


Q193_ORACLE_SQL = """
    SELECT o_orderkey,
           strftime(o_orderdate, '%j/%Y %m-%d') AS odate_str,
           CAST(strptime(strftime(o_orderdate, '%Y/%m/%d'),
                         '%Y/%m/%d') AS DATE) AS roundtrip,
           CAST(coalesce(TRY_CAST(o_orderpriority AS TIMESTAMP),
                         TIMESTAMP '1999-01-01') AS DATE)
             AS fallback_day,
           regexp_matches(o_orderpriority, '^[1-2]-') AS is_urgent,
           regexp_matches(o_orderpriority, 'urgent', 'i')
             AS has_urgent_ci,
           CAST(regexp_extract(o_orderpriority, '^([0-9]+)-', 1) AS INT)
             AS prio_num,
           CASE WHEN regexp_matches(o_orderpriority, '[A-Z]{5,}')
                THEN regexp_extract(o_orderpriority, '[A-Z]{5,}', 0)
           END AS word_match,
           CAST(CASE WHEN regexp_matches(o_orderpriority, '[A-Z]{5,}')
                     THEN strpos(o_orderpriority,
                          regexp_extract(o_orderpriority,
                                         '[A-Z]{5,}', 0)) - 1
                     ELSE -1
                END AS BIGINT) AS word_idx,
           round_even(o_totalprice / 7 * 2, 2) AS capped,
           replace(o_orderpriority, '-', '::') AS replaced,
           CAST(strpos(o_orderpriority, 'E') - 1 AS BIGINT) AS idx_e,
           CAST(CASE WHEN strpos(substring(o_orderpriority, 4, 4),
                                 'E') = 0
                     THEN -1
                     ELSE strpos(substring(o_orderpriority, 4, 4), 'E')
                          + 2
                END AS BIGINT) AS idx_e_bounded,
           CAST(len(string_split(o_orderpriority, '-')) AS BIGINT)
             AS n_keys,
           string_split(o_orderpriority, '-')[1] AS first_k,
           CAST(length(string_split(o_orderpriority, '-')[2]) AS BIGINT)
             AS second_v
    FROM orders
    WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    LIMIT 150
"""


def q194_doc_group_first_last_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$firstN``/``$lastN`` in ``$group`` under the sort-then-group
    idiom (r9: the refusal lifts when a preceding ``$sort`` defines
    document order): per customer, the latest-3 and earliest-2 order
    keys in (o_orderdate DESC, o_orderkey) order. Compiles to ONE
    map-side-combinable collect_list of direction-normalized key
    structs per accumulator, array_sort, head/tail slice — no window,
    no re-join; the unsorted form still refuses loudly. The list
    outputs ship as ``to_json`` strings: the driver's canonicalizer
    sorts raw pandas columns, so driver-checked entries must return
    SCALAR columns only (r11 contract) — Spark and DuckDB render
    identical JSON for integer lists. Oracle: DuckDB ordered-list
    slices (head / clamped negative tail), same ``to_json``.
    Reference parity: completes the $group accumulator table of the
    reference's Mongo surface (backend/app/ai/nl2mongo.py + backend/app/mongodb_adapter.py)."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_custkey": {"$lte": 200}}},
            {"$sort": {"o_orderdate": -1, "o_orderkey": 1}},
            {"$group": {
                "_id": "$o_custkey",
                "latest3": {"$firstN": {"input": "$o_orderkey", "n": 3}},
                "earliest2": {"$lastN": {"input": "$o_orderkey", "n": 2}},
                "n": {"$sum": 1},
            }},
            {"$sort": {"_id": 1}},
        ],
    )
    return out.select(
        "_id",
        F.to_json(F.col("latest3").cast("array<long>")).alias("latest3"),
        F.to_json(F.col("earliest2").cast("array<long>")).alias(
            "earliest2"),
        F.col("n").cast("long").alias("n"),
    )


Q194_ORACLE_SQL = """
    WITH t AS (
      SELECT o_custkey, o_orderkey, o_orderdate
      FROM orders WHERE o_custkey <= 200
    )
    SELECT o_custkey AS _id,
           to_json((list(o_orderkey
                         ORDER BY o_orderdate DESC, o_orderkey))[1:3])
             AS latest3,
           to_json((list(o_orderkey
                         ORDER BY o_orderdate DESC, o_orderkey))[-2:])
             AS earliest2,
           count(*) AS n
    FROM t GROUP BY o_custkey ORDER BY _id
"""


def q195_doc_expr_dialect3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r9 wave-2 expression surface in one $addFields projection:
    the date-part zoo ($dayOfYear/$week/$isoWeek/$isoDayOfWeek/
    $isoWeekYear/$dateToParts), trichotomy ($cmp/$strcasecmp), array
    construction and predicates ($range/$sortArray/$zip via $map
    flattening/$setIsSubset), arbitrary-base $log, bit ops,
    $strLenBytes, $replaceOne (first occurrence only), and chars-form
    $ltrim. All native Catalyst in one whole-stage-codegen projection.
    Oracle: DuckDB calendar/bit/list twins (dayofweek Sunday=0 matches
    Spark's dayofweek-1; both engines compare strings bytewise)."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    split = {"$split": ["$o_orderpriority", "-"]}
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_orderkey": {"$lte": 400}}},
            {"$addFields": {
                "doy": {"$toLong": {"$dayOfYear": "$o_orderdate"}},
                "wk": {"$toLong": {"$week": "$o_orderdate"}},
                "iw": {"$toLong": {"$isoWeek": "$o_orderdate"}},
                "idw": {"$toLong": {"$isoDayOfWeek": "$o_orderdate"}},
                "iwy": {"$isoWeekYear": "$o_orderdate"},
                "p_month": {"$toLong": {"$getField": {
                    "field": "month",
                    "input": {"$dateToParts": {"date": "$o_orderdate"}}}}},
                "cmp_hi": {"$cmp": ["$o_totalprice", 150000]},
                "sc": {"$strcasecmp": ["$o_orderstatus", "f"]},
                "rng": {"$range": [0, {"$toInt": {"$mod":
                                                  ["$o_orderkey", 5]}}]},
                "sorted_parts": {"$sortArray": {"input": split,
                                                "sortBy": -1}},
                "pairs": {"$map": {
                    "input": {"$zip": {"inputs":
                                       [split,
                                        {"$reverseArray": split}]}},
                    "as": "p",
                    "in": {"$concat": [{"$arrayElemAt": ["$$p", 0]},
                                       "|",
                                       {"$arrayElemAt": ["$$p", 1]}]}}},
                "has_urgent": {"$setIsSubset": [["URGENT"], split]},
                "lg2": {"$round": [{"$log": [{"$add": ["$o_orderkey", 2]},
                             2]}, 6]},
                "low_bits": {"$bitAnd": ["$o_orderkey", 255]},
                "neg_key": {"$bitNot": "$o_orderkey"},
                "blen": {"$toLong": {"$strLenBytes":
                                     "$o_orderpriority"}},
                "ro": {"$replaceOne": {"input": "$o_orderpriority",
                                       "find": "-",
                                       "replacement": ":"}},
                "lt": {"$ltrim": {"input": "$o_orderpriority",
                                  "chars": "0123456789-"}},
            }},
            {"$project": {"o_orderkey": 1, "doy": 1, "wk": 1, "iw": 1,
                          "idw": 1, "iwy": 1, "p_month": 1,
                          "cmp_hi": 1, "sc": 1, "rng": 1,
                          "sorted_parts": 1, "pairs": 1,
                          "has_urgent": 1, "lg2": 1, "low_bits": 1,
                          "neg_key": 1, "blen": 1, "ro": 1, "lt": 1}},
            {"$sort": {"o_orderkey": 1}},
            {"$limit": 200},
        ],
    )
    # driver-canon contract (r11): scalar columns only — the driver's
    # pandas canonicalizer cannot sort list cells, so the three array
    # outputs ship as to_json strings (identical rendering in DuckDB)
    return (out.withColumn("rng", F.to_json("rng"))
               .withColumn("sorted_parts", F.to_json("sorted_parts"))
               .withColumn("pairs", F.to_json("pairs")))


Q195_ORACLE_SQL = """
    SELECT o_orderkey,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(floor((dayofyear(o_orderdate) - 1
                       - dayofweek(o_orderdate) + 7) / 7) AS BIGINT)
             AS wk,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iw,
           CAST(isodow(o_orderdate) AS BIGINT) AS idw,
           CAST(isoyear(o_orderdate) AS BIGINT) AS iwy,
           CAST(month(o_orderdate) AS BIGINT) AS p_month,
           CASE WHEN o_totalprice = 150000 THEN 0
                WHEN o_totalprice < 150000 THEN -1 ELSE 1 END AS cmp_hi,
           CASE WHEN lower(o_orderstatus) = 'f' THEN 0
                WHEN lower(o_orderstatus) < 'f' THEN -1
                ELSE 1 END AS sc,
           to_json(range(0, CAST(o_orderkey % 5 AS INT))) AS rng,
           to_json(list_reverse_sort(string_split(o_orderpriority, '-')))
             AS sorted_parts,
           to_json(list_transform(
             range(1, len(string_split(o_orderpriority, '-')) + 1),
             i -> string_split(o_orderpriority, '-')[i] || '|'
                  || list_reverse(string_split(o_orderpriority, '-'))[i]
           )) AS pairs,
           list_has_all(string_split(o_orderpriority, '-'), ['URGENT'])
             AS has_urgent,
           round(ln(o_orderkey + 2) / ln(2), 6) AS lg2,
           o_orderkey & 255 AS low_bits,
           ~o_orderkey AS neg_key,
           strlen(o_orderpriority) AS blen,
           regexp_replace(o_orderpriority, '-', ':') AS ro,
           ltrim(o_orderpriority, '0123456789-') AS lt
    FROM orders
    WHERE o_orderkey <= 400
    ORDER BY o_orderkey
    LIMIT 200
"""


def q198_doc_expr_dialect4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 expression-dialect tail in one $addFields projection:
    $dateFromParts (make_timestamp — full parts, year-only defaults,
    and the try-mode onError tier where an out-of-range month falls
    back), $regexFindAll (all-match array with per-match offsets and
    capture groups — one regexp_extract_all scan per group plus a
    native left-fold for offsets), $substrBytes (binary-cast
    substring), and the $isNumber/$type introspection pair (typeof()
    + per-row null gate). All native Catalyst inside ONE
    whole-stage-codegen projection — zero UDFs. Oracle: DuckDB
    make_timestamp / regexp_extract_all / substring / CASE twins.
    Reference parity: extends the expression dialect of the
    reference's Mongo surface (backend/app/ai/nl2mongo.py +
    backend/app/mongodb_adapter.py) the same way q184/q193/q195 do."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    findall_words = {"$regexFindAll": {
        "input": "$o_orderpriority", "regex": "[A-Z]+"}}
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_orderkey": {"$lte": 300}}},
            {"$addFields": {
                "built_ts": {"$dateFromParts": {
                    "year": {"$year": "$o_orderdate"},
                    "month": {"$month": "$o_orderdate"},
                    "day": {"$dayOfMonth": "$o_orderdate"},
                    "hour": 6, "minute": 30, "second": 15}},
                "built_day": {"$dateFromParts": {
                    "year": {"$year": "$o_orderdate"}}},
                "carried": {"$dateFromParts": {
                    "year": {"$year": "$o_orderdate"},
                    "month": {"$add": [{"$month": "$o_orderdate"}, 6]},
                    "onError": {"$toDate": "1999-01-01"}}},
                "words": {"$map": {
                    "input": findall_words, "as": "m",
                    "in": {"$getField": {"field": "match",
                                         "input": "$$m"}}}},
                "word_idxs": {"$map": {
                    "input": findall_words, "as": "m",
                    "in": {"$getField": {"field": "idx",
                                         "input": "$$m"}}}},
                "n_words": {"$size": findall_words},
                "caps": {"$getField": {
                    "field": "captures",
                    "input": {"$arrayElemAt": [
                        {"$regexFindAll": {
                            "input": "$o_orderpriority",
                            "regex": "([0-9]+)-([A-Z]+)"}}, 0]}}},
                "sb": {"$substrBytes": ["$o_orderpriority", 2, 4]},
                "isnum_price": {"$isNumber": "$o_totalprice"},
                "isnum_prio": {"$isNumber": "$o_orderpriority"},
                "t_key": {"$type": "$o_orderkey"},
                "t_mixed": {"$type": {"$cond": [
                    {"$gte": ["$o_orderkey", 150]},
                    "$o_totalprice",
                    {"$literal": None}]}},
            }},
            {"$project": {"o_orderkey": 1, "built_ts": 1, "built_day": 1,
                          "carried": 1, "words": 1, "word_idxs": 1,
                          "n_words": 1, "caps": 1, "sb": 1,
                          "isnum_price": 1, "isnum_prio": 1,
                          "t_key": 1, "t_mixed": 1}},
            {"$sort": {"o_orderkey": 1}},
            {"$limit": 150},
        ],
    )
    # driver-canon contract (r11): scalar columns only — the driver's
    # pandas canonicalizer cannot sort list cells, so the three array
    # outputs ship as to_json strings (identical rendering in DuckDB)
    return (out.withColumn("words", F.to_json("words"))
               .withColumn("word_idxs", F.to_json("word_idxs"))
               .withColumn("caps", F.to_json("caps")))


Q198_ORACLE_SQL = """
    SELECT o_orderkey,
           make_timestamp(year(o_orderdate), month(o_orderdate),
                          day(o_orderdate), 6, 30, 15) AS built_ts,
           make_timestamp(year(o_orderdate), 1, 1, 0, 0, 0)
             AS built_day,
           CASE WHEN month(o_orderdate) + 6 <= 12
                THEN make_timestamp(year(o_orderdate),
                                    month(o_orderdate) + 6,
                                    1, 0, 0, 0)
                ELSE TIMESTAMP '1999-01-01' END AS carried,
           to_json(regexp_extract_all(o_orderpriority, '[A-Z]+'))
             AS words,
           to_json(list_transform(
             regexp_extract_all(o_orderpriority, '[A-Z]+'),
             w -> CAST(strpos(o_orderpriority, w) - 1 AS BIGINT)
           )) AS word_idxs,
           CAST(len(regexp_extract_all(o_orderpriority, '[A-Z]+'))
                AS INT) AS n_words,
           to_json(list_value(
             regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 1),
             regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 2)
           )) AS caps,
           substring(o_orderpriority, 3, 4) AS sb,
           TRUE AS isnum_price,
           FALSE AS isnum_prio,
           'long' AS t_key,
           CASE WHEN o_orderkey >= 150 THEN 'double' ELSE 'null' END
             AS t_mixed
    FROM orders
    WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    LIMIT 150
"""


def q201_doc_convert_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$convert`` — the general form of the $toX family (Mongo 4.0,
    NEW r12) in one $addFields projection: string→int parse of the
    split-first priority digit, truncation-toward-zero double→long,
    numeric→bool, numeric→date under Mongo's MILLIS convention (the
    try-parse cascade — a bare Spark cast would read seconds), the
    onError recovery tier (unparseable priority string → -1), and the
    onNull tier over a conditionally-null input. All native Catalyst
    in one whole-stage-codegen projection — zero UDFs. Oracle: DuckDB
    try_cast / trunc / make_timestamp(µs) twins. Reference parity:
    extends the expression dialect of the reference's Mongo surface
    (backend/app/ai/nl2mongo.py + backend/app/mongodb_adapter.py) the
    same way q184/q193/q195/q198 do."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_orderkey": {"$lte": 300}}},
            {"$addFields": {
                "pk_int": {"$convert": {
                    "input": {"$arrayElemAt": [
                        {"$split": ["$o_orderpriority", "-"]}, 0]},
                    "to": "int"}},
                "trunc_long": {"$convert": {
                    "input": "$o_totalprice", "to": "long"}},
                "nonzero": {"$convert": {
                    "input": "$o_orderkey", "to": "bool"}},
                "d": {"$convert": {
                    "input": {"$multiply": ["$o_orderkey", 86400000]},
                    "to": "date"}},
                "bad_int": {"$convert": {
                    "input": "$o_orderpriority", "to": 16,
                    "onError": -1}},
                "maybe_str": {"$convert": {
                    "input": {"$cond": [
                        {"$gte": ["$o_orderkey", 100]},
                        "$o_totalprice",
                        {"$literal": None}]},
                    "to": "string", "onNull": "absent"}},
            }},
            {"$project": {"o_orderkey": 1, "pk_int": 1,
                          "trunc_long": 1, "nonzero": 1, "d": 1,
                          "bad_int": 1, "maybe_str": 1}},
            {"$sort": {"o_orderkey": 1}},
            {"$limit": 150},
        ],
    )
    return out


Q201_ORACLE_SQL = """
    SELECT o_orderkey,
           CAST(string_split(o_orderpriority, '-')[1] AS INTEGER)
             AS pk_int,
           CAST(trunc(o_totalprice) AS BIGINT) AS trunc_long,
           (o_orderkey <> 0) AS nonzero,
           make_timestamp(o_orderkey * 86400000000) AS d,
           COALESCE(try_cast(o_orderpriority AS INTEGER), -1) AS bad_int,
           CASE WHEN o_orderkey >= 100
                THEN CAST(o_totalprice AS VARCHAR)
                ELSE 'absent' END AS maybe_str
    FROM orders
    WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    LIMIT 150
"""


def q202_doc_set_object_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set + object expression surface in one $addFields projection
    (NEW r12 — driver presence for the r12-swept ops): $setUnion /
    $setIntersection / $setDifference over the split priority tokens
    vs a literal set (deterministically sorted outputs, shipped as
    to_json scalars per the driver-canon contract), $setEquals /
    $setIsSubset booleans, the FIXED Mongo-truthiness
    $anyElementTrue/$allElementsTrue pair over a $map whose branches
    produce nulls (null elements are FALSY — the r12 set-sweep find,
    here on the driver plane), and a $getField over an
    $arrayToObject-built map (absent key → null). All native Catalyst
    in one codegen projection. Oracle: DuckDB list_sort/list_distinct/
    list_filter twins."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("orders", load_table(spark, sf_dir, "orders"))
    split = {"$split": ["$o_orderpriority", "-"]}
    lit_set = ["URGENT", "X"]
    out = store.aggregate(
        "orders",
        [
            {"$match": {"o_orderkey": {"$lte": 300}}},
            {"$addFields": {
                "su": {"$setUnion": [split, lit_set]},
                "si": {"$setIntersection": [split, lit_set]},
                "sd": {"$setDifference": [split, lit_set]},
                "seq": {"$setEquals": [split, split]},
                "ssub": {"$setIsSubset": [["URGENT"], split]},
                # null-bearing predicate arrays: the $cond's else arm
                # is null, so Mongo truthiness (null is FALSY) decides
                "any_urgent": {"$anyElementTrue": {"$map": {
                    "input": split, "as": "w",
                    "in": {"$cond": [{"$eq": ["$$w", "URGENT"]},
                                     True, {"$literal": None}]}}}},
                "all_long": {"$allElementsTrue": {"$map": {
                    "input": split, "as": "w",
                    "in": {"$cond": [
                        {"$gte": [{"$strLenCP": "$$w"}, 2]},
                        True, {"$literal": None}]}}}},
                # absent key -> null; -1 sentinel keeps the column
                # int-kind on both engines (a nullable int comes back
                # float64 from the oracle's pandas fetch)
                "val_urgent": {"$ifNull": [{"$getField": {
                    "field": "URGENT",
                    "input": {"$arrayToObject": {"$map": {
                        "input": split, "as": "w",
                        "in": {"k": "$$w",
                               "v": {"$strLenCP": "$$w"}}}}}}}, -1]},
            }},
            {"$project": {"o_orderkey": 1, "su": 1, "si": 1, "sd": 1,
                          "seq": 1, "ssub": 1, "any_urgent": 1,
                          "all_long": 1, "val_urgent": 1}},
            {"$sort": {"o_orderkey": 1}},
            {"$limit": 150},
        ],
    )
    # driver-canon contract: array outputs ship as to_json strings
    return (out.withColumn("su", F.to_json("su"))
               .withColumn("si", F.to_json("si"))
               .withColumn("sd", F.to_json("sd")))


Q202_ORACLE_SQL = """
    WITH t AS (
      SELECT o_orderkey,
             string_split(o_orderpriority, '-') AS sp
      FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           to_json(list_sort(list_distinct(sp || ['URGENT', 'X'])))
             AS su,
           to_json(list_sort(list_distinct(
             list_filter(sp, w -> list_contains(['URGENT', 'X'], w))
           ))) AS si,
           to_json(list_sort(list_distinct(
             list_filter(sp, w -> NOT list_contains(['URGENT', 'X'], w))
           ))) AS sd,
           TRUE AS seq,
           list_contains(sp, 'URGENT') AS ssub,
           list_contains(sp, 'URGENT') AS any_urgent,
           (len(list_filter(sp, w -> length(w) < 2)) = 0) AS all_long,
           COALESCE(CASE WHEN list_contains(sp, 'URGENT')
                         THEN CAST(length('URGENT') AS INTEGER) END,
                    -1) AS val_urgent
    FROM t
    ORDER BY o_orderkey
    LIMIT 150
"""


def q200_doc_documents_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$documents`` (Mongo 5.1 inline literal collection — the last
    applicable aggregate stage): a db-level ``aggregate(None, ...)``
    whose source is literal documents, seeding a $lookup probe against
    the real corpus — the prototyping shape a user hits first. Spark
    shape: the literal frame is driver-sized BY CONSTRUCTION (the docs
    live in the query text), so at 100 TB the $lookup equi-join keeps
    the literal side broadcast-sized and the corpus is scanned once
    with the join filter pushed to the probe; the sub-pipeline's
    include-$project narrows the lookup payload to doc_id, so COLUMN
    PRUNING reaches the corpus scan — counting matches never reads
    the text column (plan-pinned in pytest). Oracle: DuckDB VALUES +
    LEFT JOIN + COUNT. Reference parity: completes the aggregate-stage
    census of the reference's Mongo surface
    (backend/app/mongodb_adapter.py) — $collStats/$indexStats/$geoNear
    remain the only absences, all server/geo introspection."""
    from ..sources.parquet import load_table

    store = DocumentStore(spark)
    store.register("documents", load_table(spark, sf_dir, "documents"))
    return store.aggregate(None, [
        {"$documents": [
            {"src": "src1", "w": 2},
            {"src": "src7", "w": 3},
            {"src": "src19", "w": 5},
            {"src": "srcX", "w": 7},
        ]},
        {"$lookup": {"from": "documents", "localField": "src",
                     "foreignField": "source", "as": "hits",
                     "pipeline": [{"$project": {"doc_id": 1}}]}},
        {"$addFields": {"n_docs": {"$size": "$hits"}}},
        {"$project": {"src": 1, "w": 1, "n_docs": 1}},
        {"$sort": {"src": 1}},
    ])


Q200_ORACLE_SQL = """
    SELECT t.src AS src, CAST(t.w AS BIGINT) AS w,
           CAST(count(d.doc_id) AS INTEGER) AS n_docs
    FROM (VALUES ('src1', 2), ('src7', 3), ('src19', 5), ('srcX', 7))
         AS t(src, w)
    LEFT JOIN documents d ON d.source = t.src
    GROUP BY t.src, t.w
    ORDER BY src
"""
