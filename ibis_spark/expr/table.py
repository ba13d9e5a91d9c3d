"""The Table relation type.

Reference: ibis/expr/types/relations.py (Table API) +
ibis/expr/operations/relations.py:36-523 (Relation ops). Ours wraps a lazy
:class:`pyspark.sql.DataFrame`: every method is a declarative DataFrame
transformation, so Catalyst gets the whole plan (predicate pushdown,
column pruning, join reordering, AQE) for free — SURVEY.md §4's design.

Scale notes baked in:
- joins take optional broadcast hints; semi/anti lower to Spark's
  left_semi/left_anti (no materialized subquery);
- as-of join is a single-shuffle union-tag + running ``last(ignoreNulls)``
  window — never a cross/range product (SURVEY.md §2.4);
- nothing here ever calls ``.collect()`` except the explicit exports.
"""

from __future__ import annotations

import itertools
from typing import Any, Iterable, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import Window as SparkWindowSpec

from ibis_spark.expr.core import (
    AndPredicates,
    ExistsSubquery,
    InSubquery,
    ScalarExpr,
    ScalarValue,
    unwrap,
)
from ibis_spark.expr.core import Expr as CoreExpr
from ibis_spark.expr.deferred import Deferred
from ibis_spark.expr.window import Window

_alias_counter = itertools.count()


def asc(key, nulls_first: bool = False):
    """Sort-key helper (SortKey sortkeys.py:16)."""
    from ibis_spark.expr.core import SortKey

    c = F.col(key) if isinstance(key, str) else unwrap(key)
    return SortKey(
        c.asc_nulls_first() if nulls_first else c.asc_nulls_last(),
        child=c,
        ascending=True,
    )


def desc(key, nulls_first: bool = False):
    from ibis_spark.expr.core import SortKey

    c = F.col(key) if isinstance(key, str) else unwrap(key)
    return SortKey(
        c.desc_nulls_first() if nulls_first else c.desc_nulls_last(),
        child=c,
        ascending=False,
    )


class Table(CoreExpr):
    """A lazy relation; wraps a pyspark DataFrame
    (reference Table: expr/types/relations.py)."""

    __slots__ = ("_df",)

    # serializes Table.sql's register-view→analyze pair so concurrent
    # callers sharing the default view name can't read each other's table
    _SQL_LOCK = __import__("threading").Lock()

    def __init__(self, df: DataFrame):
        object.__setattr__(self, "_df", df)

    # -- plumbing ------------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def to_spark(self) -> DataFrame:
        return self._df

    def op(self):
        """Expr.op (reference core.py): the underlying node. Our IR is
        Spark's logical plan, so this is the pyspark DataFrame."""
        return self._df

    def as_table(self) -> "Table":
        """Table.as_table (relations.py): identity, for generic code that
        normalizes values to tables."""
        return self

    def get_name(self) -> str:
        """Table.get_name (relations.py): a stable name for this relation
        (the reference returns the op's name; ours derives from the plan).

        Uses the public ``DataFrame.semanticHash()`` (works on classic AND
        Spark Connect sessions — no ``_jdf``); falls back to a schema
        digest if even that is unavailable. NB: the schema-digest fallback
        is NOT plan-unique — two different plans with identical schemas
        share a name there; do not key caches on it in such sessions."""
        import hashlib

        try:
            digest = f"{self._df.semanticHash() & 0xFFFFFFFF:08x}"
        except Exception:
            digest = hashlib.md5(
                self._df.schema.json().encode()
            ).hexdigest()[:8]
        return f"ibis_spark_table_{digest}"

    @property
    def columns(self) -> list[str]:
        return list(self._df.columns)

    def schema(self):
        from ibis_spark.datatypes import from_spark
        from ibis_spark.schema import Schema

        return Schema(
            {
                f.name: from_spark(f.dataType, nullable=f.nullable)
                for f in self._df.schema.fields
            }
        )

    def __repr__(self):
        cols = ", ".join(f"{f.name}: {f.dataType.simpleString()}" for f in self._df.schema.fields)
        static = f"Table[{cols}]"
        from ibis_spark.config import options

        if not options.interactive:
            return static
        # interactive repr (reference config.py Interactive): a BOUNDED
        # fetch of max_rows+1 rows — never a full collect
        try:
            n = options.repr.interactive.max_rows
            pdf = self._df.limit(n + 1).toPandas()
            truncated = len(pdf) > n
            body = pdf.head(n).to_string()
            return f"{static}\n{body}" + ("\n…" if truncated else "")
        except Exception:
            return static

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self._df.columns:
            from ibis_spark.expr.column import Column

            return Column(self._df[name], name=name, source_df=self._df)
        raise AttributeError(f"Table has no column {name!r}")

    def __getitem__(self, key):
        from ibis_spark.expr.column import Column

        if isinstance(key, str):
            return Column(self._df[key], name=key, source_df=self._df)
        if isinstance(key, (list, tuple)):
            return self.select(*key)
        if isinstance(key, (Column, Deferred, InSubquery)):
            return self.filter(key)
        if isinstance(key, int):
            return self.limit(1, offset=key)
        raise TypeError(f"cannot index Table with {type(key).__name__}")

    def __contains__(self, name):
        return name in self._df.columns

    # -- expression resolution -------------------------------------------------
    def _resolve(self, expr, name: Optional[str] = None):
        """Turn any user-supplied expression into (spark Column, name)."""
        from ibis_spark.expr.column import Column

        if isinstance(expr, Deferred):
            expr = expr.resolve(self)
        elif callable(expr) and not isinstance(expr, (Column, Table)):
            expr = expr(self)
        if isinstance(expr, str):
            return self._df[expr], name or expr
        if isinstance(expr, Table):
            raise TypeError("expected a column expression, got a Table")
        if isinstance(expr, Column):
            col = self._apply_default_window(expr)
            return col.spark(), name or expr.get_name()
        # python literal
        return F.lit(expr), name

    def _apply_default_window(self, col):
        """ibis auto-windows bare analytic functions in projections
        (expr/rewrites.py:252-283).

        Scale guard: an analytic with neither an order hint nor an explicit
        window would need a global unordered window — a single-partition
        funnel at 100 TB. We raise instead (ibis raises for un-ordered rank
        too); use ``Table.with_row_number()`` for a bare row index.
        """
        if getattr(col, "_needs_window", False):
            w = Window()
            if col._order_hint is not None:
                w = w._replace(order_by=(col._order_hint,))
            else:
                raise ValueError(
                    "analytic function requires an ordered window: apply "
                    ".over(window(group_by=..., order_by=...)); for a bare "
                    "row index use Table.with_row_number() (distributed "
                    "zip-by-index, no global sort)"
                )
            return col.over(w)
        return col

    def _resolve_many(self, exprs, named):
        from ibis_spark.selectors import Across, Selector

        out = []
        for e in exprs:
            if isinstance(e, Selector):
                out.extend((self._df[n], n) for n in e.expand(self))
            elif isinstance(e, Across):
                out.extend(self._resolve(c, name=n) for c, n in e.expand(self))
            elif isinstance(e, (list, tuple)):
                out.extend(self._resolve(x) for x in e)
            else:
                out.append(self._resolve(e))
        for n, e in named.items():
            out.append(self._resolve(e, name=n))
        return out

    def bind(self, expr):
        """Resolve an expression against this table → Column."""
        from ibis_spark.expr.column import Column

        sc, name = self._resolve(expr)
        return Column(sc, name=name)

    def _lower_scalar_exprs(self, exprs, named):
        """Lower top-level ScalarValue/ScalarExpr projection arguments
        (scalar subqueries in select/mutate, mirroring the reference's
        rewrite coverage of projections) by broadcast-cross-joining each
        1-row aggregate and substituting its placeholder column. Returns
        (base_table, exprs, named, placeholder_names)."""
        from ibis_spark.expr.core import ScalarExpr, ScalarValue, wrap

        items = list(exprs) + list(named.values())
        svs = []
        for e in items:
            if isinstance(e, ScalarValue):
                svs.append(e)
            elif isinstance(e, ScalarExpr):
                svs.extend(e.scalars())
        if not svs:
            return self, exprs, named, ()
        df = self._df
        phs = []
        # group scalars by their source relation: ALL scalars over one
        # relation share a single 1-row aggregate (one scan + one broadcast
        # cross join per relation, not per scalar — at 100 TB, k scalar
        # stats over a table must not mean k scans)
        by_rel: dict = {}
        for sv in dict.fromkeys(svs):
            by_rel.setdefault(id(sv.df), (sv.df, []))[1].append(sv)
        for rel_df, group in by_rel.values():
            agg_df = rel_df.agg(
                *[unwrap(sv.sc).alias(sv.ph) for sv in group]
            )
            df = df.crossJoin(F.broadcast(agg_df))
            phs.extend(sv.ph for sv in group)

        def conv(e):
            if isinstance(e, ScalarValue):
                return wrap(F.col(e.ph))
            if isinstance(e, ScalarExpr):
                return wrap(e.build())
            return e

        return (
            Table(df),
            tuple(conv(e) for e in exprs),
            {k: conv(v) for k, v in named.items()},
            tuple(phs),
        )

    # -- projection (relations.py:121-160) ---------------------------------------
    def select(self, *exprs, **named) -> "Table":
        base, exprs, named, _phs = self._lower_scalar_exprs(exprs, named)
        cols = []
        for sc, name in base._resolve_many(exprs, named):
            cols.append(sc.alias(name) if name else sc)
        return Table(base._df.select(*cols))

    projection = select

    def mutate(self, *exprs, **named) -> "Table":
        """Add/replace columns (relations.py Project; API relations.py:2340)."""
        base, exprs, named, phs = self._lower_scalar_exprs(exprs, named)
        resolved = base._resolve_many(exprs, named)
        df = base._df
        existing = [c for c in df.columns if c not in phs]
        replacements = {}
        additions = []
        for i, (sc, name) in enumerate(resolved):
            name = name or f"col_{i}"
            if name in existing:
                replacements[name] = sc
            else:
                additions.append((name, sc))
        cols = [
            (replacements[c].alias(c) if c in replacements else df[c]) for c in existing
        ]
        cols.extend(sc.alias(n) for n, sc in additions)
        return Table(df.select(*cols))

    def drop(self, *names) -> "Table":
        """DropColumns (relations.py:149); accepts names, columns, or
        selectors."""
        from ibis_spark.selectors import Selector

        flat = []
        for n in names:
            if isinstance(n, Selector):
                flat.extend(n.expand(self))
            elif isinstance(n, str):
                flat.append(n)
            else:
                flat.append(self._resolve(n)[1])
        return Table(self._df.drop(*flat))

    def cast(self, schema) -> "Table":
        """Cast columns to new types: {col: dtype} (Table.cast
        relations.py:2740)."""
        from ibis_spark.functions.generic import _spark_type

        casts = {k: _spark_type(v) for k, v in dict(schema).items()}
        cols = [
            self._df[c].cast(casts[c]).alias(c) if c in casts else self._df[c]
            for c in self._df.columns
        ]
        return Table(self._df.select(*cols))

    def try_cast(self, schema) -> "Table":
        from ibis_spark.functions.generic import _spark_type

        casts = {k: _spark_type(v) for k, v in dict(schema).items()}
        cols = [
            F.try_cast(self._df[c], casts[c]).alias(c) if c in casts else self._df[c]
            for c in self._df.columns
        ]
        return Table(self._df.select(*cols))

    def rename(self, mapping=None, **kwargs) -> "Table":
        """Table.rename (relations.py:2646): new_name=old_name pairs, a
        callable old→new, or a format string like "prefix_{name}"."""
        df = self._df
        if callable(mapping):
            cols = [df[c].alias(mapping(c) or c) for c in df.columns]
            return Table(df.select(*cols))
        if isinstance(mapping, str):
            cols = [df[c].alias(mapping.format(name=c)) for c in df.columns]
            return Table(df.select(*cols))
        m = dict(mapping or {})
        m.update(kwargs)
        # ibis convention: {new: old}
        inverted = {old: new for new, old in m.items()}
        cols = [df[c].alias(inverted.get(c, c)) for c in df.columns]
        return Table(df.select(*cols))

    def relocate(self, *names, before=None, after=None) -> "Table":
        """Table.relocate (relations.py:5010)."""
        names = [n if isinstance(n, str) else self._resolve(n)[1] for n in names]
        rest = [c for c in self._df.columns if c not in names]
        if before is not None:
            i = rest.index(before)
            order = rest[:i] + names + rest[i:]
        elif after is not None:
            i = rest.index(after) + 1
            order = rest[:i] + names + rest[i:]
        else:
            order = names + rest
        return Table(self._df.select(*order))

    # -- filter (relations.py:271) -------------------------------------------------
    def filter(self, *predicates) -> "Table":
        df = self._df
        out = self
        conds = []
        for p in predicates:
            if isinstance(p, (list, tuple)):
                preds = list(p)
            else:
                preds = [p]
            while preds:
                pred = preds.pop(0)
                if isinstance(pred, AndPredicates):
                    preds = list(pred) + preds
                    continue
                if isinstance(pred, Deferred):
                    pred = pred.resolve(out)
                elif (
                    callable(pred)
                    and not hasattr(pred, "spark")
                    and not isinstance(pred, (InSubquery, ExistsSubquery, ScalarExpr))
                ):
                    pred = pred(out)
                if isinstance(pred, InSubquery):
                    out = out._apply_in_subquery(pred, conds)
                    continue
                if isinstance(pred, ExistsSubquery):
                    out = out._apply_exists(pred, conds)
                    continue
                if isinstance(pred, ScalarExpr):
                    out = out._apply_scalar_filter(pred, conds)
                    continue
                conds.append(unwrap(pred))
        df = out._df
        for c in conds:
            df = df.filter(c)
        return Table(df)

    where = filter

    def _apply_in_subquery(self, pred: InSubquery, pending_conds) -> "Table":
        """Lower InSubquery (subqueries.py:65) to a left-semi/anti join.

        NOT IN follows SQL three-valued logic: if the haystack contains any
        NULL, *no* row passes; a NULL needle never passes (unless the
        haystack is empty, in which case every row passes). The null/empty
        flags are a 1-row aggregate broadcast to every task — no extra
        shuffle at scale.
        """
        df = self._df
        for c in pending_conds:
            df = df.filter(c)
        pending_conds.clear()
        hay = pred.haystack
        if isinstance(hay, Table):
            hay_col = hay[hay.columns[0]]
        else:
            hay_col = hay
        hay_df = _owning_df(hay_col)
        needle_sc = unwrap(pred.needle)
        hay_sc = unwrap(hay_col)
        key_df = hay_df.select(hay_sc.alias("__isin_key__")).distinct()
        if not pred.negated:
            return Table(df.join(key_df, on=needle_sc == key_df["__isin_key__"], how="left_semi"))
        flags = hay_df.agg(
            F.coalesce(F.max(hay_sc.isNull()), F.lit(False)).alias("__hay_has_null__"),
            (F.count(F.lit(1)) > 0).alias("__hay_has_rows__"),
        )
        out = (
            df.crossJoin(F.broadcast(flags))
            .filter(~F.col("__hay_has_null__"))
            .filter(needle_sc.isNotNull() | ~F.col("__hay_has_rows__"))
            .drop("__hay_has_null__", "__hay_has_rows__")
            .join(key_df, on=needle_sc == key_df["__isin_key__"], how="left_anti")
        )
        return Table(out)

    def _apply_exists(self, pred: ExistsSubquery, pending_conds) -> "Table":
        """Lower ExistsSubquery (subqueries.py:28) to left-semi/anti join.

        The correlated predicate is called with (this table, other table)
        and becomes the join condition — Catalyst picks broadcast or
        shuffled semi join, so EXISTS is one distributed join at any scale.
        """
        df = self._df
        for c in pending_conds:
            df = df.filter(c)
        pending_conds.clear()
        other = pred.table
        odf = other._df if isinstance(other, Table) else other
        cond = pred.predicate(Table(df), Table(odf))
        how = "left_anti" if pred.negated else "left_semi"
        return Table(df.join(odf, on=unwrap(cond), how=how))

    def _apply_scalar_filter(self, pred: ScalarExpr, pending_conds) -> "Table":
        """Lower a predicate containing ScalarSubquery values
        (subqueries.py:36): broadcast cross-join each 1-row aggregate,
        apply the rebuilt condition, drop the placeholders."""
        df = self._df
        for c in pending_conds:
            df = df.filter(c)
        pending_conds.clear()
        phs = []
        for sv in pred.scalars():
            agg_df = sv.df.agg(unwrap(sv.sc).alias(sv.ph))
            df = df.crossJoin(F.broadcast(agg_df))
            phs.append(sv.ph)
        df = df.filter(pred.build()).drop(*phs)
        return Table(df)

    def to_scalar(self, expr=None) -> ScalarValue:
        """Turn an aggregate expression over this table into a scalar
        subquery value usable in another expression
        (reference ScalarSubquery subqueries.py:36 / Value.as_scalar).

        With no argument this is the reference's ``Table.as_scalar()``: the
        table must have exactly one column, and single-row-ness is asserted
        at execution (raise_error otherwise)."""
        if expr is None:
            if len(self.columns) != 1:
                raise ValueError(
                    "as_scalar() on a table requires exactly one column; "
                    "pass an aggregate expression otherwise"
                )
            sc = self._df[self.columns[0]]
            agg = F.when(F.count(F.lit(1)) <= 1, F.first(sc)).otherwise(
                F.raise_error(
                    F.lit("as_scalar: relation has more than one row")
                )
            )
            return ScalarValue(self._df, agg)
        sc, _ = self._resolve(expr)
        return ScalarValue(self._df, sc)

    as_scalar = to_scalar

    # -- sorting / limits (relations.py:260-305) --------------------------------------
    def order_by(self, *keys) -> "Table":
        cols = []
        for k in keys:
            if isinstance(k, (list, tuple)) and not isinstance(k, str):
                items = k
            else:
                items = [k]
            for item in items:
                if isinstance(item, Deferred):
                    item = item.resolve(self)
                if isinstance(item, str):
                    if item.startswith("-"):
                        cols.append(self._df[item[1:]].desc_nulls_last())
                    else:
                        # reference SortKey default: nulls_first=False
                        cols.append(self._df[item].asc_nulls_last())
                else:
                    cols.append(unwrap(item))
        return Table(self._df.orderBy(*cols))

    sort_by = order_by

    def limit(self, n: int, offset: int = 0) -> "Table":
        df = self._df
        if offset:
            df = df.offset(offset)
        return Table(df.limit(n))

    def head(self, n: int = 5) -> "Table":
        return self.limit(n)

    # -- dedup / nulls / sampling (relations.py:470-498) --------------------------------
    def distinct(self, on=None, keep: str = "first") -> "Table":
        """Distinct (relations.py:494) / distinct(on=..., keep=...).

        keep="first"/"last" keeps the first/last occurrence in row order
        (row order = file/partition order, tracked via
        monotonically_increasing_id — deterministic for a single source
        read); keep=None drops every row whose `on` key is duplicated.
        """
        if on is None:
            return Table(self._df.distinct())
        on = [on] if isinstance(on, str) else [c if isinstance(c, str) else self._resolve(c)[1] for c in on]
        if keep in ("first", "last"):
            # keep the first/last occurrence in row order (mono ids track
            # file/partition order) — dropDuplicates would keep an
            # arbitrary row, diverging from the reference semantics
            mid = F.monotonically_increasing_id()
            order = F.col("__mid__").asc() if keep == "first" else F.col("__mid__").desc()
            w = SparkWindowSpec.partitionBy(*on).orderBy(order)
            return Table(
                self._df.withColumn("__mid__", mid)
                .withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") == 1)
                .drop("__mid__", "__rn__")
            )
        if keep is None:
            w_cnt = F.count(F.lit(1)).over(SparkWindowSpec.partitionBy(*on))
            return Table(
                self._df.withColumn("__dup_n__", w_cnt)
                .filter(F.col("__dup_n__") == 1)
                .drop("__dup_n__")
            )
        raise ValueError(f"keep must be 'first', 'last' or None, got {keep!r}")

    def drop_duplicates_within_watermark(self, subset=None) -> "Table":
        """Streaming deduplication bounded by the event-time watermark
        (Spark ``dropDuplicatesWithinWatermark``): per-key state is
        dropped once the watermark passes it, so dedup memory stays
        BOUNDED at any stream length — the streaming counterpart of
        ``distinct(on=...)`` and the scale-safe shape for exact dedup in
        a continuous ingestion pipeline (reference streaming semantics;
        Spark structured-streaming dedup guide)."""
        if isinstance(subset, str):
            subset = [subset]
        if subset is None:
            return Table(self._df.dropDuplicatesWithinWatermark())
        return Table(self._df.dropDuplicatesWithinWatermark(list(subset)))

    def drop_null(self, subset=None, how: str = "any") -> "Table":
        """DropNull (relations.py:477)."""
        if isinstance(subset, str):
            subset = [subset]
        return Table(self._df.dropna(how=how, subset=subset))

    dropna = drop_null

    def fill_null(self, replacements) -> "Table":
        """FillNull (relations.py:470): scalar or {col: value}."""
        return Table(self._df.fillna(replacements))

    fillna = fill_null

    def sample(self, fraction: float, *, seed: Optional[int] = None, method: str = "row") -> "Table":
        """Sample (relations.py:485). ``method="row"`` is Bernoulli row
        sampling; ``method="block"`` lowers to SQL ``TABLESAMPLE (n
        PERCENT)`` (the reference's block-sample lowering,
        sql/rewrites.py:618-659), which in Spark samples whole input
        splits — cheaper than row sampling at scale because skipped
        blocks are never read."""
        if method == "row":
            return Table(self._df.sample(fraction=fraction, seed=seed))
        if method == "block":
            pct = float(fraction) * 100.0
            spark = self._df.sparkSession
            view = f"__ibis_sample_{next(_alias_counter)}__"
            self._df.createOrReplaceTempView(view)
            seed_sql = f" REPEATABLE ({int(seed)})" if seed is not None else ""
            return Table(
                spark.sql(f"SELECT * FROM {view} TABLESAMPLE ({pct} PERCENT){seed_sql}")
            )
        raise NotImplementedError(f"sample(method={method!r}); use 'row' or 'block'")

    # -- aggregation (relations.py:306) ---------------------------------------------------
    def aggregate(self, metrics=None, by=(), having=(), **named) -> "Table":
        return self.group_by(*_tuplize(by)).aggregate(
            *_tuplize(metrics), having=having, **named
        )

    agg = aggregate

    def group_by(self, *keys, **named_keys) -> "GroupedTable":
        from ibis_spark.selectors import Selector

        flat = []
        for k in keys:
            if isinstance(k, Selector):
                flat.extend(k.expand(self))
            elif isinstance(k, (list, tuple)):
                flat.extend(k)
            elif k is not None:
                flat.append(k)
        return GroupedTable(self, flat, named_keys)

    def cube(self, *keys, **named_keys) -> "GroupedTable":
        """GROUP BY CUBE — absent from the reference (SURVEY §2.5 notes no
        rollup/cube/grouping-sets anywhere in ibis/expr); Spark-native
        value-add via DataFrame.cube."""
        g = self.group_by(*keys, **named_keys)
        g._mode = "cube"
        return g

    def rollup(self, *keys, **named_keys) -> "GroupedTable":
        """GROUP BY ROLLUP (Spark-native value-add, SURVEY §2.5)."""
        g = self.group_by(*keys, **named_keys)
        g._mode = "rollup"
        return g

    def count(self, where=None) -> int:
        """Eager row count (CountStar relations.py:101).

        Note: divergence from the reference (which returns a lazy scalar);
        ours executes immediately — document in API docs.
        """
        df = self._df
        if where is not None:
            sc, _ = self._resolve(where)
            df = df.filter(sc)
        return df.count()

    def nunique(self, where=None) -> int:
        df = self._df
        if where is not None:
            sc, _ = self._resolve(where)
            df = df.filter(sc)
        return df.distinct().count()

    def value_counts(self, *cols, name: Optional[str] = None) -> "Table":
        """Table.value_counts (relations.py:5247)."""
        subset = [self._resolve(c)[1] for c in cols] or list(self._df.columns)
        out_name = name or ("_".join(subset) + "_count")
        return Table(
            self._df.groupBy(*subset).agg(F.count(F.lit(1)).alias(out_name))
        )

    def topk(self, k: int, by=None, name: Optional[str] = None) -> "Table":
        """Table.topk (relations.py:5320): most frequent whole rows, or the
        top-k by a metric — value_counts → order desc → limit. Catalyst
        plans this as TakeOrderedAndProject after a partial-agg count."""
        subset = list(self._df.columns)
        out_name = name or ("_".join(subset) + "_count")
        if by is None:
            metric = F.count(F.lit(1))
        else:
            sc, _ = self._resolve(by)
            metric = sc
        agg = self._df.groupBy(*subset).agg(metric.alias(out_name))
        return Table(agg.orderBy(F.col(out_name).desc()).limit(int(k)))

    # -- joins (relations.py:201-258; types/joins.py:34-113) ------------------------------
    def join(
        self,
        right: "Table",
        predicates=(),
        how: str = "inner",
        *,
        lname: str = "",
        rname: str = "{name}_right",
        broadcast: bool = False,
    ) -> "Table":
        how_map = {
            "inner": "inner",
            "left": "left",
            "right": "right",
            "outer": "full",
            "full": "full",
            "cross": "cross",
            "semi": "left_semi",
            "left_semi": "left_semi",
            "anti": "left_anti",
            "left_anti": "left_anti",
            "any_inner": "inner",
            "any_left": "left",
        }
        spark_how = how_map.get(how)
        if spark_how is None:
            if how == "asof":
                return self.asof_join(right, predicates)
            if how == "positional":
                return self.positional_join(right)
            raise ValueError(f"unsupported join kind {how!r}")

        rdf = right._df
        if broadcast:
            rdf = F.broadcast(rdf)
            right = Table(rdf)

        preds = _tuplize(predicates)
        name_keys = [p for p in preds if isinstance(p, str)]
        other = [p for p in preds if not isinstance(p, str)]

        if name_keys and not other:
            joined = self._df.join(rdf, on=name_keys, how=spark_how)
            return Table(joined) if spark_how in ("left_semi", "left_anti") else Table(
                _dedupe_right(joined, self._df, rdf, set(name_keys), lname, rname)
            )

        cond = None
        for p in other:
            if isinstance(p, tuple) and len(p) == 2:
                lc = self._resolve(p[0])[0]
                rc = right._resolve(p[1])[0]
                c = lc == rc
            else:
                if isinstance(p, Deferred):
                    p = p.resolve(self)
                c = unwrap(p)
            cond = c if cond is None else cond & c
        for k in name_keys:
            c = self._df[k] == rdf[k]
            cond = c if cond is None else cond & c

        if cond is None:
            joined = self._df.crossJoin(rdf)
        else:
            joined = self._df.join(rdf, on=cond, how=spark_how)
        if spark_how in ("left_semi", "left_anti"):
            return Table(joined)
        return Table(_dedupe_right(joined, self._df, rdf, set(), lname, rname))

    def inner_join(self, right, predicates=(), **kw):
        return self.join(right, predicates, how="inner", **kw)

    def left_join(self, right, predicates=(), **kw):
        return self.join(right, predicates, how="left", **kw)

    def right_join(self, right, predicates=(), **kw):
        return self.join(right, predicates, how="right", **kw)

    def outer_join(self, right, predicates=(), **kw):
        return self.join(right, predicates, how="outer", **kw)

    def semi_join(self, right, predicates=(), **kw):
        return self.join(right, predicates, how="semi", **kw)

    def anti_join(self, right, predicates=(), **kw):
        return self.join(right, predicates, how="anti", **kw)

    def cross_join(self, right, **kw):
        return self.join(right, (), how="cross", **kw)

    def salted_join(
        self,
        right: "Table",
        on,
        *,
        how: str = "inner",
        salt: int = 8,
        lname: str = "",
        rname: str = "{name}_right",
    ) -> "Table":
        """Skew-resistant equi-join: the left side gets a deterministic
        pseudo-random salt in [0, salt); the right side is replicated
        ``salt`` times; the join runs on (keys…, salt), splitting a hot
        key's rows across ``salt`` reducers. Reach for this when one key
        dominates and AQE's skew-join split isn't enough; costs ``salt``×
        duplication of the right side, so keep the right side the smaller
        input.

        Only ``how`` in {inner, left} is sound under this asymmetric
        salting: a right/full/outer join would emit each unmatched right
        key ``salt`` times, and semi/anti project no right columns to
        dedupe on — use a plain join (AQE skew handling) for those."""
        if how not in ("inner", "left", "left_outer"):
            raise ValueError(
                f"salted_join(how={how!r}): asymmetric salting supports "
                "'inner' and 'left' only; use join() with AQE skew "
                "handling for right/full/semi/anti joins"
            )
        pairs = [(k, k) if isinstance(k, str) else k for k in _tuplize(on)]
        ldf = self._df.withColumn("__salt__", (F.rand(42) * salt).cast("int"))
        salts = self._df.sparkSession.range(salt).select(
            F.col("id").cast("int").alias("__salt__")
        )
        rdf = right._df.crossJoin(F.broadcast(salts))
        cond = ldf["__salt__"] == rdf["__salt__"]
        for lk, rk in pairs:
            cond = cond & (ldf[lk] == rdf[rk])
        joined = ldf.join(rdf, on=cond, how=how)
        lcols = list(self._df.columns)
        rcols = list(right._df.columns)
        overlap = set(lcols) & set(rcols)
        sel = [
            ldf[c].alias(lname.format(name=c)) if (c in overlap and lname) else ldf[c]
            for c in lcols
        ]
        sel += [
            rdf[c].alias(rname.format(name=c)) if c in overlap else rdf[c]
            for c in rcols
        ]
        return Table(joined.select(*sel))

    def range_join(
        self,
        right: "Table",
        point: str,
        bounds,
        *,
        by=(),
        how: str = "inner",
        bucket=None,
        lname: str = "",
        rname: str = "{name}_right",
    ) -> "Table":
        """Interval-containment join: match each left row whose ``point``
        column falls inside a right row's ``[lo, hi]`` interval (both ends
        inclusive), ``bounds=(lo, hi)`` naming the right-side columns.
        Optional ``by`` adds equi-keys ANDed with the range predicate.

        SCALE — the naive plan is the classic Spark trap: a pure
        inequality predicate compiles to BroadcastNestedLoopJoin (or a
        cartesian product), O(|L|·|R|) comparisons. Passing ``bucket=``
        (a number for numeric points, ``datetime.timedelta`` for
        temporal ones) switches to a bucketed equi-join: the point maps
        to ``floor(point/bucket)``, each interval is exploded to the
        bucket range it overlaps, and the join runs as a plain hash join
        on (by…, bucket) with the range predicate as a residual filter.
        Each matching (point, interval) pair meets in EXACTLY one bucket
        (the point's), so no dedup pass is needed, ``how="left"`` keeps
        unmatched left rows exactly once, and ``how="anti"`` returns
        exactly the points inside NO interval (events outside every
        maintenance window, prices outside every band). Replication cost is
        ceil(interval_width / bucket) + 1 right rows per interval —
        choose ``bucket`` near the typical interval width. Bucket ids
        use exact integer arithmetic whenever the operands are integral
        (timestamps → microseconds; integer point/bounds with an integer
        bucket): double division can land a value one bucket off past
        2^53, silently dropping a true match at the bucket edge.

        The reference has no interval join either (its asof join is the
        nearest analogue; ibis/expr/types/joins.py:284); this is a scale
        extension in the same family as :meth:`salted_join`.
        """
        import datetime as _dt
        import warnings

        if how not in ("inner", "left", "left_outer", "anti", "left_anti"):
            raise ValueError(
                f"range_join(how={how!r}): only 'inner', 'left' and 'anti' "
                "are supported (an unmatched-interval outer join would need "
                "a dedup pass over the replicated side)"
            )
        if how in ("anti", "left_anti"):
            how = "left_anti"
        lo, hi = bounds
        by_pairs = [(b, b) if isinstance(b, str) else b for b in _tuplize(by)]
        ldf, rdf = self._df, right._df
        lcols, rcols = list(ldf.columns), list(rdf.columns)

        def _project(joined, l2, r2):
            if how == "left_anti":  # anti emits left columns only
                return Table(joined.select(*[l2[c] for c in lcols]))
            overlap = set(lcols) & set(rcols)
            sel = [
                l2[c].alias(lname.format(name=c)) if (c in overlap and lname) else l2[c]
                for c in lcols
            ]
            sel += [
                r2[c].alias(rname.format(name=c)) if c in overlap else r2[c]
                for c in rcols
            ]
            return Table(joined.select(*sel))

        if bucket is None:
            if not by_pairs:
                warnings.warn(
                    "range_join without `by` keys or `bucket=` executes as "
                    "a nested-loop join (O(n*m) comparisons) — pass "
                    "`bucket=` sized near the typical interval width for "
                    "the hash-join plan",
                    stacklevel=2,
                )
            cond = (ldf[point] >= rdf[lo]) & (ldf[point] <= rdf[hi])
            for lb, rb in by_pairs:
                cond = cond & (ldf[lb] == rdf[rb])
            return _project(ldf.join(rdf, cond, how), ldf, rdf)

        temporal = _is_temporal(ldf, point)
        _ints = ("tinyint", "smallint", "int", "bigint")
        if temporal:
            if not isinstance(bucket, _dt.timedelta) or bucket <= _dt.timedelta(0):
                raise ValueError(
                    "temporal range_join needs a positive datetime.timedelta bucket"
                )
            width = bucket // _dt.timedelta(microseconds=1)  # exact micros
            l2 = ldf.withColumn(
                "__rj_src__", F.unix_micros(ldf[point].cast("timestamp"))
            )
            r2 = rdf.withColumn(
                "__rj_lo__", F.unix_micros(rdf[lo].cast("timestamp"))
            ).withColumn("__rj_hi__", F.unix_micros(rdf[hi].cast("timestamp")))
            exact = True
        else:
            if isinstance(bucket, bool) or not isinstance(bucket, (int, float)) or bucket <= 0:
                raise ValueError("numeric range_join needs a positive numeric bucket")
            exact = (
                isinstance(bucket, int)
                and ldf.schema[point].dataType.simpleString() in _ints
                and rdf.schema[lo].dataType.simpleString() in _ints
                and rdf.schema[hi].dataType.simpleString() in _ints
            )
            width = bucket if exact else float(bucket)
            l2 = ldf.withColumn("__rj_src__", ldf[point])
            r2 = rdf.withColumn("__rj_lo__", rdf[lo]).withColumn("__rj_hi__", rdf[hi])

        if exact:
            # pure-integer floor division (pmod >= 0 for a positive divisor,
            # so the adjusted numerator divides exactly and `div` == floor)
            def _bkt(name):
                return F.expr(f"(({name}) - pmod(({name}), {width})) div {width}")
        else:
            def _bkt(name):
                return F.floor(F.col(name) / F.lit(width))

        l2 = l2.withColumn("__rj_bkt__", _bkt("__rj_src__"))
        r2 = (
            r2.withColumn("__rj_b0__", _bkt("__rj_lo__"))
            .withColumn("__rj_b1__", _bkt("__rj_hi__"))
            .filter(F.col("__rj_b0__") <= F.col("__rj_b1__"))
            .select(
                "*",
                F.explode(
                    F.sequence(F.col("__rj_b0__"), F.col("__rj_b1__"))
                ).alias("__rj_bkt__"),
            )
        )
        cond = (
            (l2["__rj_bkt__"] == r2["__rj_bkt__"])
            & (l2[point] >= r2[lo])
            & (l2[point] <= r2[hi])
        )
        for lb, rb in by_pairs:
            cond = cond & (l2[lb] == r2[rb])
        return _project(l2.join(r2, cond, how), l2, r2)

    def gap_fill(
        self,
        time_col: str,
        every,
        aggs: dict,
        *,
        by=(),
        fill: str = "ffill",
        fill_value=None,
    ) -> "Table":
        """Resample an event stream onto a regular time grid and fill the
        gaps — ``pandas .resample(every).agg(aggs).ffill()`` re-expressed
        as three keyed exchanges (the time-series densification step the
        reference leaves to pandas).

        ``every`` is a ``datetime.timedelta``; ``aggs`` maps column ->
        one of ``avg/sum/min/max/count`` (deterministic reductions — a
        "last observed" variant would need a tiebreak contract);
        ``fill="ffill"`` forward-fills empty buckets from the previous
        bucket per ``by`` group (``fill=None`` leaves them null);
        ``fill_value`` patches whatever remains null (leading gaps).

        ``count`` is special-cased to match pandas
        ``resample().count()``: an empty bucket has a count of 0 — a
        fact, not a missing observation — so count columns are pinned
        to 0 on the spine BEFORE any filling and are never forward-
        filled or ``fill_value``-patched (ADVICE r7: the previous
        behavior NULL-then-ffilled the prior bucket's count, which
        matches no resampling convention).

        Plan shape: (1) one groupBy(by, bucket) shuffle with map-side
        partial aggs; (2) one groupBy(by) min/max span agg; (3) the
        spine = sequence(lo, hi, every) exploded per group joined back on
        (by, bucket); (4) the forward fill is a running
        ``last(ignorenulls)`` window per group ordered by bucket — state
        is one value per column, buckets per group are span/every. The
        spine is generated as one in-memory array per group before
        exploding: size a group's span/``every`` accordingly (a year at
        1-second grain is 31M entries — use a coarser grid or finer
        ``by``). Buckets are epoch-aligned tumbling windows
        (``F.window(...).start`` — identical to DuckDB TIME_BUCKET).
        """
        import datetime as _dt
        import warnings

        if not isinstance(every, _dt.timedelta) or every <= _dt.timedelta(0):
            raise ValueError("every must be a positive datetime.timedelta")
        if fill not in ("ffill", None):
            raise ValueError("fill must be 'ffill' or None")
        allowed = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
                   "count": F.count}
        bad = [c for c, a in aggs.items() if a not in allowed]
        if bad:
            raise ValueError(
                f"unsupported agg for {bad}: choose from {sorted(allowed)}"
            )
        if time_col in aggs:
            raise ValueError("time_col cannot also be an agg column")
        by = list(_tuplize(by))
        if not by:
            warnings.warn(
                "gap_fill without `by` builds one global spine and fills "
                "through a single-partition window — fine for small "
                "inputs; pass `by=` group keys at scale",
                stacklevel=2,
            )
        micros = every // _dt.timedelta(microseconds=1)
        dur = f"{micros} microsecond"
        df = self._df
        bkt = F.window(F.col(time_col).cast("timestamp"), dur)["start"]
        bucketed = (
            df.withColumn("__gf_b__", bkt)
            .groupBy(*by, "__gf_b__")
            .agg(*[allowed[a](F.col(c)).alias(c) for c, a in aggs.items()])
        )
        span = bucketed.groupBy(*by).agg(
            F.min("__gf_b__").alias("__gf_lo__"), F.max("__gf_b__").alias("__gf_hi__")
        )
        spine = span.select(
            *by,
            F.explode(
                F.sequence(
                    F.col("__gf_lo__"), F.col("__gf_hi__"), F.expr(f"interval {dur}")
                )
            ).alias("__gf_b__"),
        )
        out = spine.join(bucketed, on=by + ["__gf_b__"], how="left")
        cols = list(aggs)
        # pandas resample().count() semantics: empty bucket -> 0, pinned
        # before filling so ffill/fill_value never touch count columns
        count_cols = [c for c, a in aggs.items() if a == "count"]
        for c in count_cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast("long")))
        if fill == "ffill":
            from pyspark.sql.window import Window as W

            w = (
                W.partitionBy(*by)
                .orderBy("__gf_b__")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            out = out.select(
                *by,
                "__gf_b__",
                *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in cols],
            )
        if fill_value is not None:
            out = out.select(
                *by,
                "__gf_b__",
                *[F.coalesce(F.col(c), F.lit(fill_value)).alias(c) for c in cols],
            )
        return Table(out.withColumnRenamed("__gf_b__", time_col).select(
            *by, time_col, *cols
        ))

    def grouped_topk(self, by, order_by: str, k: int, *, tiebreak=None) -> "Table":
        """Top-``k`` rows per group by ``order_by`` DESCENDING — the
        per-group companion of global ``topk``, in the skew-safe
        TWO-PHASE shape: a local window keyed on (by…,
        spark_partition_id) keeps each input partition's top-k first, so
        at most k × num_partitions rows per group ever reach the global
        group-keyed window. A billion-row hot group never lands its full
        occurrence list in one window partition, and the answer is
        provably identical (any global top-k row is in its partition's
        local top-k). Pass ``tiebreak`` (a column ordered ascending
        after the metric) to make results deterministic under metric
        ties — without it, tied rows at the k boundary are
        partition-order dependent, like any SQL top-k without a full
        ordering."""
        from pyspark.sql.window import Window as W

        if k <= 0:
            raise ValueError("k must be positive")
        by = list(_tuplize(by))
        if not by:
            raise ValueError("grouped_topk needs at least one group key")
        order = [F.col(order_by).desc()]
        if tiebreak is not None:
            order.append(F.col(tiebreak) if isinstance(tiebreak, str) else unwrap(tiebreak))
        wl = W.partitionBy(*by, F.spark_partition_id()).orderBy(*order)
        wg = W.partitionBy(*by).orderBy(*order)
        df = (
            self._df.withColumn("__ltk__", F.row_number().over(wl))
            .filter(F.col("__ltk__") <= k)
            .drop("__ltk__")
            .withColumn("__gtk__", F.row_number().over(wg))
            .filter(F.col("__gtk__") <= k)
            .drop("__gtk__")
        )
        return Table(df)

    def diff(self, other: "Table", on, *, include_equal: bool = False) -> "Table":
        """Reconcile two versions of a table — the data-validation step
        after a migration/backfill/pipeline change: full outer join on
        the ``on`` keys, emitting one row per key with ``diff_status``
        (``added`` = only in ``other``, ``removed`` = only in ``self``,
        ``changed`` = present in both with some non-key column
        differing, ``equal`` only when ``include_equal=True``) and
        ``changed_cols`` (sorted array of differing column names;
        comparisons are null-safe, so NULL == NULL). Both tables must
        share a schema.

        Plan: ONE key-partitioned full outer join; every comparison is
        a codegen'd null-safe equality — no collect, no per-column
        passes, linear at any scale."""
        on = list(_tuplize(on))
        if not on:
            raise ValueError("diff needs at least one key column")
        if set(self._df.columns) != set(other._df.columns):
            raise ValueError(
                "diff requires identical schemas; differing columns: "
                f"{sorted(set(self._df.columns) ^ set(other._df.columns))}"
            )
        vals = sorted(c for c in self._df.columns if c not in on)
        l = self._df.select(
            *[F.col(k).alias(f"__dk{i}__") for i, k in enumerate(on)],
            F.lit(True).alias("__in_l__"),
            *[F.col(c).alias(f"__l_{c}__") for c in vals],
        )
        r = other._df.select(
            *[F.col(k).alias(f"__dk{i}__") for i, k in enumerate(on)],
            F.lit(True).alias("__in_r__"),
            *[F.col(c).alias(f"__r_{c}__") for c in vals],
        )
        keys = [f"__dk{i}__" for i in range(len(on))]
        j = l.join(r, on=keys, how="full")
        neq = [
            F.when(
                ~F.col(f"__l_{c}__").eqNullSafe(F.col(f"__r_{c}__")), F.lit(c)
            )
            for c in vals
        ]
        changed = F.array_sort(
            F.filter(F.array(*neq), lambda x: x.isNotNull())
        ) if vals else F.array().cast("array<string>")
        status = (
            F.when(F.col("__in_l__").isNull(), F.lit("added"))
            .when(F.col("__in_r__").isNull(), F.lit("removed"))
            .when(F.size(changed) > 0, F.lit("changed"))
            .otherwise(F.lit("equal"))
        )
        out = j.select(
            *[F.col(f"__dk{i}__").alias(k) for i, k in enumerate(on)],
            status.alias("diff_status"),
            # only meaningful for 'changed' rows (an added/removed row
            # trivially "differs" in every non-null column)
            F.when(status == "changed", changed)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
        if not include_equal:
            out = out.filter(F.col("diff_status") != "equal")
        return Table(out)

    def positional_join(self, right) -> "Table":
        """Positional join (relations.py:213): zip rows by position.

        Uses the distributed zipWithIndex recipe (`_with_pos`): per-partition
        row_number + broadcast partition-offset join — parallelism equals the
        input partition count, never a single-partition global window.
        """
        ldf = _with_pos(self._df, "__pos__")
        rdf = _with_pos(right._df, "__pos__")
        joined = ldf.join(rdf, on="__pos__", how="inner").drop("__pos__")
        return Table(_dedupe_right(joined, ldf.drop("__pos__"), rdf.drop("__pos__"), set(), "", "{name}_right"))

    def with_row_number(self, name: str = "row_number") -> "Table":
        """Attach a 0-based global row index, scale-safely (zip-by-index:
        per-partition numbering + broadcast offsets; no global sort window)."""
        return Table(_with_pos(self._df, name))

    def rowid(self):
        """Table.rowid (reference relations.py:1348): a unique integer per
        row. Spark storage has no rowid; this is the distributed
        zip-by-index numbering (per-partition counts + broadcast offsets),
        which satisfies the uniqueness contract at any scale."""
        t = self.with_row_number("rowid")
        return t["rowid"]

    def to_array(self):
        """Deprecated reference spelling (relations.py:2330): a 1-column
        table viewed as a scalar subquery — use as_scalar."""
        return self.as_scalar()

    def __dataframe__(self, nan_as_null: bool = False, allow_copy: bool = True):
        """DataFrame interchange protocol (reference
        expr/types/dataframe_interchange.py): delegate to pyarrow's
        implementation over the executed table."""
        return self.to_pyarrow().__dataframe__(nan_as_null, allow_copy)

    def asof_join(
        self,
        right: "Table",
        on,
        by=(),
        tolerance=None,
        *,
        direction: str = "backward",
        rname: str = "{name}_right",
    ) -> "Table":
        """As-of join (expr/types/relations.py:3736, joins.py:284-344).

        The reference's Spark backend rejects asof (PC:496-504); we
        implement it natively with a union-tag + running
        ``last(ignoreNulls)`` window: one shuffle on the `by` keys, no
        range/cross product — the merge-asof plan that scales linearly
        with partition count at 100 TB.

        ``direction``: "backward" (nearest right row with rt <= lt),
        "forward" (nearest rt >= lt), or "nearest" (closer of the two;
        ties prefer backward). Forward is the same plan with a descending
        running window; nearest evaluates both windows inside the same
        exchange (one shuffle, two in-partition sorts).

        SCALE — tolerance pushdown: when ``tolerance`` is a plain number
        (numeric ``on``) or ``datetime.timedelta`` (temporal ``on``), both
        sides are bucketed into tolerance-width time buckets and the
        running window partitions on (by-keys, bucket): right rows are
        replicated into the adjacent bucket(s) that could still match, so
        window state is bounded by ~2 buckets instead of the whole key
        history, and a GLOBAL (no ``by``) asof parallelizes across buckets
        instead of funnelling into one partition. Results are identical to
        the unbucketed plan (any match found beyond the bucket horizon is
        provably outside tolerance and would be nulled anyway). A
        column-expression tolerance falls back to the global-window plan.
        """
        import datetime as _dt

        if direction not in ("backward", "forward", "nearest"):
            raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
        lt, rt = (on, on) if isinstance(on, str) else on
        by = _tuplize(by)
        _bucketable = tolerance is not None and (
            (
                isinstance(tolerance, _dt.timedelta)
                and tolerance.total_seconds() > 0
                and _is_temporal(self._df, lt)
            )
            or (
                isinstance(tolerance, (int, float))
                and not isinstance(tolerance, bool)
                and tolerance > 0
                and not _is_temporal(self._df, lt)
            )
        )
        if not by and not _bucketable:
            import warnings

            warnings.warn(
                "asof_join with no `by` keys uses a single global ordered "
                "window — fine for small inputs, a one-partition funnel at "
                "scale; pass `by=` partition keys for large tables (or a "
                "numeric/timedelta tolerance, which buckets the window)",
                stacklevel=2,
            )
        by_pairs = [(b, b) if isinstance(b, str) else b for b in by]

        ldf, rdf = self._df, right._df
        lcols = list(ldf.columns)
        rcols = list(rdf.columns)
        # right payload = everything except its join keys
        r_payload = [c for c in rcols if c != rt and c not in [rb for _, rb in by_pairs]]

        tag_l = ldf.select(
            *[ldf[lb].alias(f"__k{i}__") for i, (lb, _) in enumerate(by_pairs)],
            ldf[lt].cast("timestamp").alias("__t__") if _is_temporal(ldf, lt) else ldf[lt].alias("__t__"),
            F.lit(1).alias("__is_left__"),
            F.struct(*[ldf[c] for c in lcols]).alias("__lrow__"),
            F.lit(None).cast(rdf.select(F.struct(*[rdf[c] for c in r_payload] + [rdf[rt]]).alias("s")).schema["s"].dataType).alias("__rrow__"),
        )
        tag_r = rdf.select(
            *[rdf[rb].alias(f"__k{i}__") for i, (_, rb) in enumerate(by_pairs)],
            rdf[rt].cast("timestamp").alias("__t__") if _is_temporal(rdf, rt) else rdf[rt].alias("__t__"),
            F.lit(0).alias("__is_left__"),
            F.lit(None).cast(ldf.select(F.struct(*[ldf[c] for c in lcols]).alias("s")).schema["s"].dataType).alias("__lrow__"),
            F.struct(*[rdf[c] for c in r_payload] + [rdf[rt]]).alias("__rrow__"),
        )
        unioned = tag_l.unionByName(tag_r)
        keys = [f"__k{i}__" for i in range(len(by_pairs))]
        if _bucketable:
            # bucket id = floor(t / tolerance); a left row in bucket b can
            # only match (within tolerance) right rows in bucket b or its
            # direction-side neighbor, so right rows are replicated into
            # exactly those groups and the window partitions on the bucket.
            # Bucketing is EXACT integer arithmetic whenever both sides are
            # integral (timestamps→micros, integer `on` + integer tolerance):
            # double division can land a value one bucket off past 2^53 (or
            # on exact float quotients), and the one-neighbor replication
            # invariant would then silently drop a within-tolerance match.
            _int_types = ("tinyint", "smallint", "int", "bigint")  # simpleString() names
            if isinstance(tolerance, _dt.timedelta):
                # exact micros (total_seconds() float-truncates large tols)
                idiv = tolerance // _dt.timedelta(microseconds=1)
                unioned = unioned.withColumn(
                    "__tsrc__", F.unix_micros(F.col("__t__"))
                )
            elif (
                isinstance(tolerance, int)
                and unioned.schema["__t__"].dataType.simpleString() in _int_types
            ):
                idiv = tolerance
                unioned = unioned.withColumn("__tsrc__", F.col("__t__"))
            else:
                idiv = None
                div = F.lit(tolerance)
                src = F.col("__t__")
            if idiv is not None:
                # floor division in pure integer arithmetic: pmod is
                # nonnegative for a positive divisor, so the adjusted
                # numerator is exactly divisible and `div` (truncating
                # integral division) equals floor
                src = F.expr(
                    f"(__tsrc__ - pmod(__tsrc__, {idiv})) div {idiv}"
                )
                div = None
            offs = {
                "backward": (0, 1),
                "forward": (-1, 0),
                "nearest": (-1, 0, 1),
            }[direction]
            unioned = (
                unioned.withColumn(
                    "__bkt0__", src if idiv is not None else F.floor(src / div)
                )
                .select(
                    "*",
                    F.explode(
                        F.when(F.col("__is_left__") == 1, F.array(F.lit(0)))
                        .otherwise(F.array(*[F.lit(o) for o in offs]))
                    ).alias("__off__"),
                )
                .withColumn("__bkt__", F.col("__bkt0__") + F.col("__off__"))
                .drop("__bkt0__", "__off__", "__tsrc__")
            )
            keys = keys + ["__bkt__"]
        w_back = (
            Window(
                group_by=tuple(keys),
                order_by=(
                    F.col("__t__").asc_nulls_first(),
                    F.col("__is_left__").asc_nulls_first(),
                ),
            )
            .rows(None, 0)
            .to_spark()
        )
        w_fwd = (
            Window(
                group_by=tuple(keys),
                order_by=(
                    F.col("__t__").desc_nulls_last(),
                    F.col("__is_left__").asc_nulls_first(),
                ),
            )
            .rows(None, 0)
            .to_spark()
        )
        last_r = F.last("__rrow__", ignorenulls=True)
        if direction == "backward":
            filled = unioned.withColumn("__match__", last_r.over(w_back))
        elif direction == "forward":
            filled = unioned.withColumn("__match__", last_r.over(w_fwd))
        else:  # nearest: both running matches in one exchange, pick closer
            # compare in __t__'s exact type: the struct carries the un-cast
            # right time, so re-apply the temporal cast here — mixing
            # TIMESTAMP with TIMESTAMP_NTZ/DATE operands would fail or
            # coerce inconsistently under ANSI mode
            def _match_t(name):
                c = F.col(name)[rt]
                return c.cast("timestamp") if _is_temporal(rdf, rt) else c

            filled = (
                unioned.withColumn("__mb__", last_r.over(w_back))
                .withColumn("__mf__", last_r.over(w_fwd))
                .withColumn(
                    "__match__",
                    F.when(F.col("__mb__").isNull(), F.col("__mf__"))
                    .when(F.col("__mf__").isNull(), F.col("__mb__"))
                    .when(
                        F.col("__t__") - _match_t("__mb__")
                        <= _match_t("__mf__") - F.col("__t__"),
                        F.col("__mb__"),
                    )
                    .otherwise(F.col("__mf__")),
                )
            )
        result = filled.filter(F.col("__is_left__") == 1)

        out_cols = [F.col(f"__lrow__.{c}").alias(c) for c in lcols]
        for c in r_payload:
            out_name = c if c not in lcols else rname.format(name=c)
            out_cols.append(F.col(f"__match__.{c}").alias(out_name))
        rt_out = rt if rt not in lcols else rname.format(name=rt)
        out_cols.append(F.col(f"__match__.{rt}").alias(rt_out))
        result = result.select(*out_cols)
        if tolerance is not None:
            tol = unwrap(tolerance) if hasattr(tolerance, "spark") else tolerance
            lt_c = F.col(lt)
            rt_c = F.col(rt_out)
            if direction == "backward":
                delta = lt_c - rt_c
            elif direction == "forward":
                delta = rt_c - lt_c
            else:
                delta = F.greatest(lt_c - rt_c, rt_c - lt_c)
            within = rt_c.isNotNull() & (delta <= tol)
            # outside tolerance → null the right payload (left-join semantics,
            # joins.py:296-336)
            cleared = [F.col(c) for c in lcols]
            for c in r_payload:
                out_name = c if c not in lcols else rname.format(name=c)
                cleared.append(F.when(within, F.col(out_name)).alias(out_name))
            cleared.append(F.when(within, rt_c).alias(rt_out))
            result = result.select(*cleared)
        return Table(result)

    # -- set ops (relations.py:332-378); varargs per the reference API ------------------
    def union(self, *others: "Table", distinct: bool = False) -> "Table":
        out = self._df
        for other in others:
            out = out.unionByName(other._df)
        return Table(out.distinct() if distinct else out)

    def intersect(self, *others: "Table", distinct: bool = True) -> "Table":
        out = self._df
        for other in others:
            out = out.intersect(other._df) if distinct else out.intersectAll(other._df)
        return Table(out)

    def difference(self, *others: "Table", distinct: bool = True) -> "Table":
        """Difference (relations.py:378). distinct=True is SQL EXCEPT: any
        row present in `other` is removed entirely (Spark ``subtract``);
        distinct=False is EXCEPT ALL (multiset difference, ``exceptAll``)."""
        out = self._df
        for other in others:
            out = out.subtract(other._df) if distinct else out.exceptAll(other._df)
        return Table(out)

    # -- self-reference (relations.py:188) ------------------------------------------------
    def view(self) -> "Table":
        """SelfReference (relations.py:188) for self-joins."""
        return Table(self._df.alias(f"__view_{next(_alias_counter)}__"))

    alias_ = view

    # -- unnest (relations.py:499 TableUnnest) --------------------------------------------
    def unnest(self, column, offset=None, keep_empty: bool = False) -> "Table":
        """TableUnnest → LATERAL VIEW explode/posexplode (PC:516-586)."""
        sc, name = self._resolve(column)
        df = self._df
        others = [c for c in df.columns if c != name]
        if offset is not None:
            fn = F.posexplode_outer if keep_empty else F.posexplode
            exploded = df.select(*others, fn(sc).alias(str(offset), name))
            order = [c for c in df.columns if c != name] + [name, str(offset)]
            return Table(exploded.select(*[F.col(c) for c in order]))
        fn = F.explode_outer if keep_empty else F.explode
        return Table(df.select(*others, fn(sc).alias(name)).select(*df.columns))

    # -- struct expansion / introspection (relations.py:3262/3360/3408) --------------------
    def unpack(self, *cols) -> "Table":
        """Expand struct columns into top-level fields
        (Table.unpack relations.py:3262)."""
        from pyspark.sql.types import StructType

        df = self._df
        names = [c if isinstance(c, str) else self._resolve(c)[1] for c in cols]
        out = []
        for c in df.columns:
            if c in names:
                dt = df.schema[c].dataType
                if not isinstance(dt, StructType):
                    raise TypeError(f"column {c!r} is not a struct")
                out.extend(df[c].getField(f.name).alias(f.name) for f in dt.fields)
            else:
                out.append(df[c])
        return Table(df.select(*out))

    def info(self) -> "Table":
        """Per-column null/total summary (Table.info relations.py:3360).

        One pass: all per-column aggregates are computed in a single
        global aggregation row (an array of structs), then exploded —
        never k separate scans.
        """
        df = self._df
        structs = []
        for i, f in enumerate(df.schema.fields):
            structs.append(
                F.struct(
                    F.lit(f.name).alias("name"),
                    F.lit(f.dataType.simpleString()).alias("type"),
                    F.lit(f.nullable).alias("nullable"),
                    F.sum(df[f.name].isNull().cast("long")).alias("nulls"),
                    F.count(df[f.name]).alias("non_nulls"),
                    F.count(F.lit(1)).alias("total"),
                    F.lit(i).alias("pos"),
                )
            )
        one = df.agg(F.array(*structs).alias("__info__"))
        out = one.select(F.explode("__info__").alias("s")).select("s.*")
        return Table(
            out.withColumn(
                "null_frac",
                F.when(F.col("total") > 0, F.col("nulls") / F.col("total")).otherwise(
                    F.lit(0.0)
                ),
            )
        )

    def describe(self, quantile=(0.25, 0.5, 0.75)) -> "Table":
        """Summary statistics per column (Table.describe relations.py:3408):
        count/nulls/approx-unique for every column, moments+quantiles for
        numeric columns, mode for strings. Single-pass (one aggregation
        row, exploded), approximate distincts/quantiles — scale-safe."""
        from pyspark.sql.types import NumericType, StringType

        df = self._df
        q1, q2, q3 = quantile
        structs = []
        for i, f in enumerate(df.schema.fields):
            c = df[f.name]
            is_num = isinstance(f.dataType, NumericType)
            is_str = isinstance(f.dataType, StringType)
            d = c.cast("double") if is_num else F.lit(None).cast("double")
            structs.append(
                F.struct(
                    F.lit(f.name).alias("name"),
                    F.lit(i).alias("pos"),
                    F.lit(f.dataType.simpleString()).alias("type"),
                    F.count(c).alias("count"),
                    F.sum(c.isNull().cast("long")).alias("nulls"),
                    F.approx_count_distinct(c).alias("unique"),
                    (F.mode(c).cast("string") if is_str else F.lit(None).cast("string")).alias("mode"),
                    F.avg(d).alias("mean"),
                    F.stddev_samp(d).alias("std"),
                    F.min(d).alias("min"),
                    F.percentile_approx(d, float(q1)).alias("p25"),
                    F.percentile_approx(d, float(q2)).alias("p50"),
                    F.percentile_approx(d, float(q3)).alias("p75"),
                    F.max(d).alias("max"),
                )
            )
        one = df.agg(F.array(*structs).alias("__desc__"))
        return Table(one.select(F.explode("__desc__").alias("s")).select("s.*"))

    # -- streaming tumble/hop (temporal_windows.py WindowedTable) --------------------------
    def window_by(self, time_col) -> "WindowedTable":
        """Designate an event-time column for tumble/hop aggregation
        (expr/types/relations.py:5234 window_by)."""
        from ibis_spark.expr.temporal_windows import WindowedTable

        return WindowedTable(self, time_col)

    def map_groups_with_state(
        self,
        keys,
        fn,
        *,
        output_schema,
        state_schema,
        output_mode: str = "update",
        timeout: str = "NoTimeout",
    ) -> "Table":
        """Custom stateful streaming operator via Arrow-batched
        ``applyInPandasWithState`` (a Spark-native extension beyond the
        reference, which delegates all stateful processing to the engine —
        SURVEY §2.16). ``fn(key, pdf_iter, state)`` runs per key group with
        a ``GroupState``; watermark-driven timeouts evict state, so memory
        is bounded at any scale."""
        from ibis_spark.schema import Schema

        def to_spark_schema(s):
            from pyspark.sql.types import StructType

            if isinstance(s, StructType):
                return s
            if isinstance(s, Schema):
                return s.to_spark()
            if isinstance(s, dict):
                from ibis_spark.schema import schema as mk

                return mk(s).to_spark()
            return s  # DDL string is accepted by Spark directly

        gdf = self._df.groupBy(*_tuplize(keys))
        return Table(
            gdf.applyInPandasWithState(
                fn,
                to_spark_schema(output_schema),
                to_spark_schema(state_schema),
                output_mode,
                timeout,
            )
        )

    def transform_with_state(
        self,
        keys,
        processor,
        *,
        output_schema,
        output_mode: str = "Update",
        time_mode: str = "None",
        initial_state=None,
        event_time_col: str = "",
    ) -> "Table":
        """Spark 4 arbitrary stateful processing
        (``transformWithStateInPandas`` — the successor to
        ``applyInPandasWithState``): ``processor`` is a
        ``pyspark.sql.streaming.stateful_processor.StatefulProcessor``
        with typed per-key state (value/list/map), timers, TTL, and
        initial-state bootstrap — none of which the old GroupState API
        offers.

        Works on BOTH streaming and batch inputs (batch = one giant
        micro-batch with empty initial state — the basis of the
        batch-equivalence tests). Two runtime prerequisites this wrapper
        handles:

        * the operator requires the RocksDB state store provider — set
          before the SparkSession is created
          (``spark.sql.streaming.stateStore.providerClass`` =
          ``...state.RocksDBStateStoreProvider``); we raise a clear
          error if an incompatible provider is active;
        * on a BATCH query the StateStoreCoordinator RPC endpoint is
          only registered by the StreamingQueryManager, so we touch
          ``spark.streams`` first (otherwise:
          ``RpcEndpointNotFoundException: StateStoreCoordinator``).

        The Python worker's state client speaks protobuf to the JVM
        state server (``pyspark/sql/streaming/proto/StateMessage_pb2``).
        When the ``google.protobuf`` runtime is missing (as in this
        container), the vendored pure-Python wire codec
        (:mod:`ibis_spark._vendor.pbshim`) stands in for the generated
        module: the processor is wrapped so worker unpickling installs
        the shim before the state client's first proto import, and the
        JVM side keeps validating every byte with real protobuf-java
        (r10; the r9 NotImplementedError gate is retired).
        """
        from ibis_spark._vendor.tws import ShimProcessor

        processor = ShimProcessor(processor)
        spark = self._df.sparkSession
        provider = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", ""
        )
        if "RocksDB" not in (provider or ""):
            raise ValueError(
                "transformWithState requires the RocksDB state store: "
                "set spark.sql.streaming.stateStore.providerClass to "
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider when building the session"
            )
        if not self._df.isStreaming:
            # register the StateStoreCoordinator endpoint (created by the
            # streaming query manager; batch TWS fails without it)
            spark.streams  # noqa: B018
        gdf = self._df.groupBy(*_tuplize(keys))
        init = initial_state._df.groupBy(*_tuplize(keys)) if initial_state else None
        return Table(
            gdf.transformWithStateInPandas(
                processor,
                output_schema,
                output_mode,
                time_mode,
                initialState=init,
                eventTimeColumnName=event_time_col,
            )
        )

    # -- pivots (relations.py:4209/4540) ---------------------------------------------------
    def pivot_longer(self, cols, *, names_to: str = "name", values_to: str = "value") -> "Table":
        names = [c if isinstance(c, str) else self._resolve(c)[1] for c in _tuplize(cols)]
        keep = [c for c in self._df.columns if c not in names]
        pairs = []
        for n in names:
            pairs.extend([F.lit(n), self._df[n]])
        stacked = self._df.select(
            *keep,
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(n) for n in names]),
                    F.array(*[self._df[n] for n in names]),
                )
            ).alias(names_to, values_to),
        )
        return Table(stacked)

    def pivot_wider(
        self,
        *,
        names_from: str,
        values_from: str,
        values_agg="sum",
        names=None,
        names_sort: bool = False,
    ) -> "Table":
        """Spread ``names_from``'s values into columns (reference
        relations.py:4540).

        Pass ``names=`` (the explicit list of pivot keys) whenever it is
        known: without it Spark must run a distinct-values job over
        ``names_from`` *at plan time* — a hidden driver-side action that is
        unbounded at scale (at 100 TB that job scans the full table before
        the plan even exists). With ``names`` given, planning is pure — no
        job runs until the query executes. ``names_sort=True`` orders the
        generated columns lexicographically; otherwise they follow ``names``
        order (or Spark's discovery order when ``names`` is omitted).
        """
        keep = [c for c in self._df.columns if c not in (names_from, values_from)]
        if names is not None:
            names = list(names)
            if names_sort:
                names = sorted(names)
            gb = self._df.groupBy(*keep).pivot(names_from, names)
        else:
            gb = self._df.groupBy(*keep).pivot(names_from)
        aggfn = getattr(F, values_agg if values_agg != "arbitrary" else "first")
        out = gb.agg(aggfn(values_from))
        if names is None and names_sort:
            pivoted = [c for c in out.columns if c not in keep]
            out = out.select(*keep, *sorted(pivoted))
        return Table(out)

    # -- raw SQL escape hatch (relations.py:4004) ------------------------------------------
    def sql(self, query: str, *, table_name: str = "t") -> "Table":
        """Run raw SQL with this table visible as ``table_name``.

        The register→analyze pair runs under a process-wide lock and the
        result's schema is touched before returning, so two interleaved
        ``sql()`` calls binding the same ``table_name`` (the default
        ``"t"``) each resolve against their OWN table instead of silently
        reading whichever view registration landed last. The view binding
        is transient — use :meth:`alias` to keep a durable name.
        """
        with Table._SQL_LOCK:
            self._df.createOrReplaceTempView(table_name)
            out = self._df.sparkSession.sql(query)
            out.schema  # force analysis while our binding is live
        return Table(out)

    def alias(self, alias: str) -> "Table":
        """Table.alias (reference relations.py:3957): expose this
        expression to raw SQL under `alias` (temp view, same side-effect
        semantics as the reference documents). Takes the same lock as
        :meth:`sql` — an alias registration racing a ``sql()`` call on
        the same view name must not land between that call's register and
        analyze steps (every registration path sharing a name has to
        serialize for the resolve-against-your-OWN-table guarantee)."""
        with Table._SQL_LOCK:
            self._df.createOrReplaceTempView(alias)
            out = self._df.sparkSession.table(alias)
        return Table(out)

    # -- caching / execution ----------------------------------------------------------------
    def cache(self) -> "Table":
        return Table(self._df.cache())

    def repartition(self, num: int, *cols) -> "Table":
        """Spark-native partition-count control (``df.repartition``) —
        an engine-level scale knob with no reference analog.  The case
        that needs it: a SMALL scan (one input split — parquet's
        open-cost floor keeps files under ~4 MB unsplit) feeding
        CPU-heavy per-row work (geometry, codecs, UDFs); without the
        explicit exchange the whole pipeline runs on ONE core of the
        cluster.  The shuffle moves only the scan's bytes — trivial
        next to the per-row work it parallelizes.  At real scale the
        storage layout provides the splits and this is a no-op
        decision; prefer ``hint("rebalance")`` under AQE when the goal
        is evening out skew rather than forcing a count."""
        args = [c.spark() if hasattr(c, "spark") else c for c in cols]
        return Table(self._df.repartition(num, *args))

    def hint(self, name: str, *params) -> "Table":
        """Planner hint passthrough (``df.hint``): join-strategy
        (``broadcast``, ``merge``, ``shuffle_hash``,
        ``shuffle_replicate_nl``), ``repartition``/``rebalance``/
        ``coalesce``, or skew hints. A scale-tuning escape hatch:
        ``big.join(t.hint("shuffle_hash"), ...)`` forces a shuffled hash
        join where the sort-merge default loses; hints attach to the
        plan subtree, so Catalyst still owns everything else."""
        return Table(self._df.hint(name, *params))

    def release(self):
        """CachedTable.release (expr/types/relations.py): drop this
        table's cached blocks (unpersist; lazy plan stays valid)."""
        self._df.unpersist()
        return self

    def execute(self):
        """→ pandas DataFrame (BB:108 to_pandas)."""
        return self._df.toPandas()

    to_pandas = execute

    # -- expression conveniences (reference expr/types/core.py) ---------------
    def pipe(self, f, *args, **kwargs):
        """Expr.pipe (core.py:232): ``t.pipe(f, ...)`` == ``f(t, ...)``;
        a ``(f, "kwarg")`` tuple passes the table by keyword."""
        if isinstance(f, tuple):
            fn, kw = f
            if kw in kwargs:
                raise ValueError(f"{kw} is both the pipe target and a keyword")
            kwargs[kw] = self
            return fn(*args, **kwargs)
        return f(self, *args, **kwargs)

    def equals(self, other) -> bool:
        """Expr.equals (core.py:109): structural equality of the two plans.
        Uses Spark's semantic-equality check (canonicalized plans), which
        is strictly stronger than the reference's node-identity check.
        ``sameSemantics`` is a public API that works on classic AND Spark
        Connect sessions; if even it fails, the `_jdf` plan-text compare is
        tried, and the last resort is object identity (conservative: never
        a false positive, may under-report equality)."""
        if not isinstance(other, Table):
            return False
        try:
            return self._df.sameSemantics(other._df)
        except Exception:
            try:
                return str(self._df._jdf.queryExecution().logical()) == str(
                    other._df._jdf.queryExecution().logical()
                )
            except Exception:
                return self._df is other._df

    def get_backend(self):
        """Expr.get_backend (core.py): the Backend this table executes on —
        the REGISTERED backend instance when its session matches (identity
        matters for backend-keyed caches), else a fresh wrapper."""
        import ibis_spark

        for cand in (
            ibis_spark.options.default_backend,
            ibis_spark._default_backend,
        ):
            if cand is not None and cand.spark is self._df.sparkSession:
                return cand
        return ibis_spark.Backend(self._df.sparkSession)

    def preview(self, max_rows: int = 10):
        """Table.preview: first ``max_rows`` rows as pandas (the reference
        renders a rich grid; the contract — bounded fetch, never a full
        collect — is the same)."""
        return self._df.limit(max_rows).toPandas()

    def to_pandas_batches(self, chunk_size: int = 1_000_000):
        """Expr.to_pandas_batches (core.py:642): stream pandas chunks via
        the Arrow batch reader — same backpressure path as
        to_pyarrow_batches, driver holds one batch at a time."""
        for batch in self.to_pyarrow_batches(chunk_size=chunk_size):
            yield batch.to_pandas()

    def to_xlsx(self, path: str, sheet: str = "Sheet1"):
        """Expr.to_xlsx: write to an Excel sheet (requires openpyxl)."""
        try:
            import openpyxl  # noqa: F401
        except ImportError as e:
            raise NotImplementedError("to_xlsx requires the openpyxl package") from e
        self.execute().to_excel(path, sheet_name=sheet, index=False)

    def to_pyarrow(self):
        return self._df.toArrow()

    def to_pyarrow_batches(self, chunk_size: int = 1_000_000):
        """Streaming Arrow record-batch reader (BB:185 contract: a reader,
        not a materialized table). Each executor-side Arrow batch is
        IPC-serialized by ``mapInArrow`` into one binary row;
        ``toLocalIterator`` then streams those rows partition-by-partition
        with backpressure, so driver memory holds ONE batch at a time —
        a 100 TB table exports without a driver OOM (``toArrow()`` would
        collect everything first). Batch granularity executor-side follows
        ``spark.sql.execution.arrow.maxRecordsPerBatch``; batches larger
        than ``chunk_size`` are sliced client-side (zero-copy)."""
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        df = self._df
        arrow_schema = to_arrow_schema(df.schema)

        def _serialize(batches):
            for batch in batches:
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, batch.schema) as w:
                    w.write_batch(batch)
                yield pa.RecordBatch.from_pydict(
                    {"ipc": [sink.getvalue().to_pybytes()]}
                )

        shipped = df.mapInArrow(_serialize, schema="ipc binary")

        def _gen():
            for row in shipped.toLocalIterator():
                with pa.ipc.open_stream(row.ipc) as reader:
                    for batch in reader:
                        for start in range(0, batch.num_rows, chunk_size):
                            yield batch.slice(start, chunk_size)

        return pa.RecordBatchReader.from_batches(arrow_schema, _gen())

    def to_polars(self):
        """→ polars DataFrame (BB:305); requires polars installed."""
        try:
            import polars as pl
        except ImportError as e:
            raise NotImplementedError("to_polars requires the polars package") from e
        return pl.from_arrow(self.to_pyarrow())

    def to_torch(self):
        """→ dict[str, torch.Tensor] of the numeric columns (BB:343);
        requires torch installed."""
        try:
            import torch
        except ImportError as e:
            raise NotImplementedError("to_torch requires the torch package") from e
        pdf = self._df.toPandas()
        out = {}
        for c in pdf.columns:
            try:
                out[c] = torch.from_numpy(pdf[c].to_numpy())
            except TypeError:
                continue  # non-numeric columns are skipped, as the reference does
        return out

    def to_parquet(self, path: str, *, partition_by=None, **options) -> None:
        """Parquet sink (BB:479). ``partition_by`` writes hive-style
        partition directories — the layout that enables partition pruning
        on read at 100 TB."""
        w = self._df.write.mode("overwrite").options(**options)
        if partition_by:
            w = w.partitionBy(*_tuplize(partition_by))
        w.parquet(path)

    def to_csv(self, path: str, *, partition_by=None, **options) -> None:
        w = self._df.write.mode("overwrite").options(**options)
        if partition_by:
            w = w.partitionBy(*_tuplize(partition_by))
        w.csv(path)

    def to_json(self, path: str, **options) -> None:
        """JSON-lines sink (BB:629)."""
        self._df.write.mode("overwrite").options(**options).json(path)

    def to_delta(self, path: str, **options) -> None:
        self._df.write.format("delta").mode("overwrite").options(**options).save(path)

    def explain(self, mode: str = "formatted") -> str:
        try:
            jdf = self._df._jdf  # noqa: SLF001 — plan text, debug only
            jvm = self._df.sparkSession._jvm
            return jdf.queryExecution().explainString(
                jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
            )
        except Exception:
            # Spark Connect has no py4j handle — capture DataFrame.explain
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                self._df.explain(mode=mode)
            return buf.getvalue()

    def compile(self) -> str:
        """Entry point B (SURVEY §3): return the optimized Spark plan."""
        return self.explain("extended")


class GroupedTable:
    """GroupBy intermediary (reference: ibis/expr/types/groupby.py)."""

    __slots__ = ("_table", "_keys", "_named_keys", "_mode", "_window")

    def __init__(
        self,
        table: Table,
        keys,
        named_keys=None,
        mode: str = "groupby",
        window: Optional[Window] = None,
    ):
        self._table = table
        self._keys = list(keys)
        self._named_keys = dict(named_keys or {})
        self._mode = mode
        self._window = window

    def _group_window(self) -> Window:
        """The window subsequent mutate/select expressions bind to: the
        group keys as partition, merged with any over() spec."""
        keys = tuple(sc for sc, _ in self._key_cols())
        if self._window is None:
            return Window(group_by=keys)
        return self._window._replace(
            group_by=keys + tuple(self._window.group_by)
        )

    def _key_cols(self):
        out = []
        for k in self._keys:
            sc, name = self._table._resolve(k)
            out.append((sc, name))
        for n, k in self._named_keys.items():
            sc, _ = self._table._resolve(k)
            out.append((sc, n))
        return out

    def _grouping_cols(self):
        """Key columns as passed to groupBy/cube/rollup. A plain string
        key keeps its bare attribute (NO self-alias): aliasing would mint
        a fresh attribute id, and Spark's GROUPING()/GROUPING_ID() match
        their argument against the grouping expressions by attribute —
        a no-op rename breaks them (GROUPING_COLUMN_MISMATCH). Computed
        or renamed keys still alias.

        Mode matters, with two failure shapes pulling opposite ways:

        * rollup/cube: the bare key is passed as an UNRESOLVED ``F.col``
          — never a no-op self-alias (a fresh attribute id breaks
          GROUPING()/GROUPING_ID() matching: GROUPING_COLUMN_MISMATCH)
          and never the dataset-tagged ``df[name]`` (Dataset.rollup/cube
          — unlike groupBy — run the ambiguous-self-join check against
          tagged refs and fail after ANY join even though the name is
          unique). The unresolved spelling resolves to the same
          attribute, so GROUPING() matches.
        * plain groupBy: every key IS self-aliased — the minted fresh
          attribute id is what lets an aggregate be joined back onto
          its own base table (the scalar-subquery lift in TPC-H q2/q17)
          without tripping the self-join ambiguity check. GROUPING() is
          only legal under rollup/cube, so nothing is lost."""
        grouping_sets = self._mode in ("rollup", "cube")
        cols = []
        for k in self._keys:
            sc, name = self._table._resolve(k)
            if grouping_sets and isinstance(k, str) and name == k:
                cols.append(self._df_key_ref(k))
            else:
                cols.append(sc.alias(name))
        for n, k in self._named_keys.items():
            sc, _ = self._table._resolve(k)
            cols.append(sc.alias(n))
        return cols

    @staticmethod
    def _df_key_ref(name: str):
        """Unresolved reference to an existing column name; backtick-quote
        so names containing dots stay a single identifier."""
        return F.col("`" + name.replace("`", "``") + "`")

    def aggregate(self, *metrics, having=(), **named) -> Table:
        from ibis_spark.selectors import Across

        keys = self._key_cols()
        mets = []
        idx = 0
        for m in _flatten(metrics):
            if isinstance(m, Across):
                for c, n in m.expand(self._table):
                    sc, _ = self._table._resolve(c, name=n)
                    mets.append((sc, n))
                continue
            sc, name = self._table._resolve(m)
            mets.append((sc, name or f"metric_{idx}"))
            idx += 1
        for n, m in named.items():
            sc, _ = self._table._resolve(m, name=n)
            mets.append((sc, n))

        having = _tuplize(having)
        hid = []
        for i, h in enumerate(having):
            sc, _ = self._table._resolve(h)
            hid.append((sc, f"__having_{i}__"))

        grouper = {
            "groupby": self._table._df.groupBy,
            "cube": self._table._df.cube,
            "rollup": self._table._df.rollup,
        }[self._mode]
        gdf = grouper(*self._grouping_cols())
        agg_cols = [sc.alias(n) for sc, n in mets] + [sc.alias(n) for sc, n in hid]
        if not agg_cols:
            agg_cols = [F.count(F.lit(1)).alias("__n__")]
        out = gdf.agg(*agg_cols)
        for _, n in hid:
            out = out.filter(F.col(n))
        drop = [n for _, n in hid] + (["__n__"] if not mets and not hid else [])
        if drop:
            out = out.drop(*drop)
        return Table(out)

    agg = aggregate

    def having(self, *preds) -> "GroupedHaving":
        return GroupedHaving(self, preds)

    def count(self, name: str = "count") -> Table:
        grouper = {
            "groupby": self._table._df.groupBy,
            "cube": self._table._df.cube,
            "rollup": self._table._df.rollup,
        }[self._mode]
        gdf = grouper(*self._grouping_cols())
        return Table(gdf.agg(F.count(F.lit(1)).alias(name)))

    size = count

    def _resolve_windowed(self, exprs, named):
        """Resolve grouped projection expressions. Returns (pre, resolved):
        ``pre`` maps placeholder names to whole-group window aggregates —
        scalar-subquery lifts (``t.x / t.x.sum()``) re-bind to the group
        instead of a broadcast cross join, exactly the reference's grouped
        semantics."""
        from ibis_spark.expr.column import Column
        from ibis_spark.expr.core import ScalarExpr, ScalarValue

        w = self._group_window()
        group_spec = Window(
            group_by=tuple(sc for sc, _ in self._key_cols())
        ).to_spark()
        pre = {}
        resolved = []
        idx = 0

        def handle(e, name):
            nonlocal idx
            if isinstance(e, Deferred):
                e = e.resolve(self._table)
            elif callable(e) and not isinstance(e, (Column, ScalarExpr, ScalarValue)):
                e = e(self._table)
            if isinstance(e, ScalarValue):
                resolved.append((unwrap(e.sc).over(group_spec), name or f"col_{idx}"))
            elif isinstance(e, ScalarExpr):
                for sv in e.scalars():
                    pre[sv.ph] = unwrap(sv.sc).over(group_spec)
                resolved.append((e.build(), name or f"col_{idx}"))
            else:
                col = self._grouped_resolve(e, w)
                resolved.append(
                    (col.spark(), name or col.get_name() or f"col_{idx}")
                )
            idx += 1

        for e in _flatten(exprs):
            handle(e, None)
        for n, e in named.items():
            handle(e, n)
        return pre, resolved

    def mutate(self, *exprs, **named) -> Table:
        """Window-project: each metric over partitionBy(keys)
        (ibis grouped mutate → WindowFunction)."""
        pre, resolved = self._resolve_windowed(exprs, named)
        out = self._table._df
        for ph, sc in pre.items():
            out = out.withColumn(ph, sc)
        for sc, name in resolved:
            out = out.withColumn(name, sc)
        if pre:
            out = out.drop(*pre)
        return Table(out)

    def select(self, *exprs, **named) -> Table:
        """GroupedTable.select (groupby.py): project ONLY the grouped
        window expressions — mutate keeps the original columns, select
        does not."""
        pre, resolved = self._resolve_windowed(exprs, named)
        df = self._table._df
        for ph, sc in pre.items():
            df = df.withColumn(ph, sc)
        return Table(df.select(*[sc.alias(n) for sc, n in resolved]))

    def over(
        self,
        window: Optional[Window] = None,
        *,
        rows=None,
        range=None,  # noqa: A002 — reference parameter name
        group_by=None,
        order_by=None,
    ) -> "GroupedTable":
        """GroupedTable.over (groupby.py): attach a window spec (frame /
        extra ordering) that subsequent mutate/select expressions bind to,
        always partitioned by the group keys."""
        from ibis_spark.expr.window import window as _mk

        if window is None:
            window = _mk(
                group_by=group_by if group_by is not None else (),
                order_by=order_by if order_by is not None else (),
                rows=rows,
                range=range,
            )
        if not isinstance(window, Window):
            raise TypeError(f"expected a Window, got {type(window).__name__}")
        return GroupedTable(
            self._table, self._keys, self._named_keys, self._mode, window
        )

    def _grouped_resolve(self, expr, w: Window):
        from ibis_spark.expr.column import Column

        if isinstance(expr, Deferred):
            expr = expr.resolve(self._table)
        elif callable(expr) and not isinstance(expr, Column):
            expr = expr(self._table)
        if not isinstance(expr, Column):
            raise TypeError("grouped mutate expects column expressions")
        if getattr(expr, "_needs_window", False) or _is_agg(expr):
            win = w
            if expr._order_hint is not None:
                win = win._replace(order_by=(expr._order_hint,))
            if expr._cumulative:
                win = win.rows(None, 0)
            return expr.over(win)
        return expr

    def order_by(self, *keys) -> "GroupedTable":
        # ordering within group applies at window time; store as sorted table
        return GroupedTable(
            self._table.order_by(*keys),
            self._keys,
            self._named_keys,
            self._mode,
            self._window,
        )


class GroupedHaving:
    __slots__ = ("_grouped", "_preds")

    def __init__(self, grouped: GroupedTable, preds):
        self._grouped = grouped
        self._preds = tuple(preds)

    def aggregate(self, *metrics, **named) -> Table:
        return self._grouped.aggregate(*metrics, having=self._preds, **named)

    agg = aggregate


# -- helpers -----------------------------------------------------------------

def _tuplize(x):
    if x is None:
        return ()
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return (x,)


def _flatten(items):
    for x in items:
        if isinstance(x, (list, tuple)):
            yield from x
        else:
            yield x


def _dedupe_right(joined: DataFrame, ldf: DataFrame, rdf: DataFrame, shared_keys, lname, rname):
    """Disambiguate collided column names after a join
    (reference: ibis/expr/types/joins.py:34-113)."""
    lcols = list(ldf.columns)
    rcols = list(rdf.columns)
    overlap = (set(lcols) & set(rcols)) - set(shared_keys)
    if not overlap:
        return joined
    # left columns keep their names (optionally lname-templated); right-side
    # collisions rename via the rname template — ibis' default "{name}_right"
    sel = []
    for c in lcols:
        if c in shared_keys:
            sel.append(joined[c])
        elif c in overlap and lname:
            sel.append(ldf[c].alias(lname.format(name=c)))
        else:
            sel.append(ldf[c])
    for c in rcols:
        if c in shared_keys:
            continue
        if c in overlap:
            sel.append(rdf[c].alias(rname.format(name=c)))
        else:
            sel.append(rdf[c])
    return joined.select(*sel)


def _owning_df(col) -> DataFrame:
    """Recover the DataFrame a column belongs to (for in-subquery lowering)."""
    df = getattr(col, "_source_df", None)
    if df is not None:
        return df
    raise TypeError(
        "isin() with a column from another table requires the column to be "
        "table-bound (use t.col or pass a Table)"
    )


def _is_temporal(df: DataFrame, name: str) -> bool:
    t = dict(df.dtypes).get(name, "")
    return "timestamp" in t or t == "date"


def _is_agg(col) -> bool:
    """Detect a bare aggregate expression for grouped mutate — tracked as
    explicit Column metadata set by ReductionOps (no py4j string sniffing,
    works under Spark Connect)."""
    return bool(getattr(col, "_is_reduction", False))


def _with_pos(df: DataFrame, name: str = "__pos__") -> DataFrame:
    """Attach a 0-based global row position — the distributed zipWithIndex
    recipe: per-partition row_number (the window shuffles into one group per
    *input partition*, so parallelism is preserved) + a broadcast join
    against per-partition offsets (a tiny one-row-per-partition aggregate).
    Never funnels the data through a single-partition global window.
    """
    tmp = df.withColumn("__pid__", F.spark_partition_id()).withColumn(
        "__mid__", F.monotonically_increasing_id()
    )
    counts = tmp.groupBy("__pid__").agg(F.count(F.lit(1)).alias("__cnt__"))
    w = SparkWindowSpec.orderBy("__pid__").rowsBetween(
        SparkWindowSpec.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "__off__", F.coalesce(F.sum("__cnt__").over(w), F.lit(0))
    ).drop("__cnt__")
    pw = SparkWindowSpec.partitionBy("__pid__").orderBy("__mid__")
    return (
        tmp.withColumn("__prn__", F.row_number().over(pw) - 1)
        .join(F.broadcast(offsets), on="__pid__", how="inner")
        .withColumn(name, (F.col("__prn__") + F.col("__off__")).cast("long"))
        .drop("__pid__", "__mid__", "__prn__", "__off__")
    )


# ---------------------------------------------------------------------------
# ScalarParameter deferred execution (reference generic.py:161 + BC:624-626)
# ---------------------------------------------------------------------------

class ParamTable:
    """A pending Table operation chain referencing unbound ScalarParameters.

    Produced automatically when a Table method receives a deferred
    expression containing an unbound ``Param`` — e.g.
    ``expr = t.filter(_.x > p)``. The chain replays against the concrete
    parent Table at ``execute(params={p: value})`` time, substituting each
    Param with a typed literal, so ONE expression re-executes with
    different values and every execution still plants a constant the
    optimizer can fold and push down. Further chained calls
    (``expr.select(...)``) are recorded, not executed.
    """

    __slots__ = ("_parent", "_method", "_args", "_kwargs")

    def __init__(self, parent, method, args, kwargs):
        self._parent = parent
        self._method = method
        self._args = args
        self._kwargs = kwargs

    def __getattr__(self, name):
        if name.startswith("_") or name not in _PARAM_CHAINABLE:
            raise AttributeError(
                f"ParamTable has no attribute {name!r}; a parameterized "
                "expression defers Table methods only — reference columns "
                "via the deferred placeholder `_`"
            )

        def record(*args, **kwargs):
            return ParamTable(self, name, args, kwargs)

        return record

    def _replay(self):
        parent = self._parent
        if isinstance(parent, ParamTable):
            parent = parent._replay()
        return getattr(parent, self._method)(*self._args, **self._kwargs)

    def bind_params(self, params=None) -> "Table":
        """Substitute parameter values and return the concrete Table."""
        from ibis_spark.expr.column import _PARAM_BINDINGS, UnboundParamError

        tok = _PARAM_BINDINGS.set(dict(params or {}))
        try:
            out = self._replay()
        finally:
            _PARAM_BINDINGS.reset(tok)
        if isinstance(out, ParamTable):
            raise UnboundParamError(
                "expression still has unbound parameters after binding; "
                "pass values for every Param in params={...}"
            )
        return out

    def execute(self, params=None):
        return self.bind_params(params).execute()

    to_pandas = execute

    def to_spark(self, params=None):
        return self.bind_params(params).to_spark()


def _param_deferrable(fn):
    import functools

    @functools.wraps(fn)
    def inner(self, *args, **kwargs):
        from ibis_spark.expr.column import UnboundParamError

        try:
            return fn(self, *args, **kwargs)
        except UnboundParamError:
            return ParamTable(self, fn.__name__, args, kwargs)

    return inner


for _m in ("select", "filter", "mutate", "aggregate", "order_by"):
    setattr(Table, _m, _param_deferrable(getattr(Table, _m)))
Table.projection = Table.select
_PARAM_CHAINABLE = frozenset(n for n in dir(Table) if not n.startswith("_"))
del _m
