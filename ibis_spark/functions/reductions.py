"""Reductions / aggregate functions
(reference: ibis/expr/operations/reductions.py:28-429).

Every reduction supports an optional ``where`` filter (Filterable :28),
lowered as ``F.<agg>(F.when(cond, x))`` exactly as the reference's base
compiler does (backends/sql/compilers/base.py:139-146) — this keeps the
filter inside the partial (map-side) aggregation, so a filtered aggregate
costs no extra shuffle at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibis_spark.expr.core import unwrap
from ibis_spark.expr.core import wrap as _base_wrap


def wrap(sc, **meta):
    """Module-local wrap: every reduction built here marks itself with
    ``is_reduction=True`` Column metadata, so GroupedTable.mutate can
    window bare aggregates without string-sniffing the JVM expression."""
    meta.setdefault("is_reduction", True)
    return _base_wrap(sc, **meta)


def _filtered(col, where):
    """Apply the Filterable where-clause: F.when(cond, x) (BC:139-146)."""
    if where is None:
        return col
    return F.when(unwrap(where), col)


class ReductionOps:
    __slots__ = ()

    # -- counting (reductions.py:92-126, :401-414) ----------------------------
    def count(self, where=None):
        return wrap(F.count(_filtered(self.spark(), where)))

    def nunique(self, where=None):
        return wrap(F.count_distinct(_filtered(self.spark(), where)))

    def approx_nunique(self, where=None):
        return wrap(F.approx_count_distinct(_filtered(self.spark(), where)))

    def grouping(self):
        """SQL GROUPING(col): 1 when this rollup/cube output row is a
        subtotal that aggregates the column away, 0 for a detail row —
        the standard way DS-style reports label subtotal levels (no
        reference counterpart: ibis has no rollup/cube at all, SURVEY
        §2.5; Spark-native value-add via F.grouping). Only valid inside
        a ``Table.rollup(...)``/``Table.cube(...)`` aggregate."""
        return wrap(F.grouping(self.spark()).cast("int"))

    # -- basic stats (reductions.py:194-246, :363-380) -------------------------
    def sum(self, where=None):
        return wrap(F.sum(_filtered(self.spark(), where)))

    def mean(self, where=None):
        return wrap(F.avg(_filtered(self.spark(), where)))

    def min(self, where=None):
        return wrap(F.min(_filtered(self.spark(), where)))

    def max(self, where=None):
        return wrap(F.max(_filtered(self.spark(), where)))

    def argmax(self, key, where=None):
        """value of self at the max of key (ArgMax reductions.py:381)."""
        if where is None:
            return wrap(F.max_by(self.spark(), unwrap(key)))
        cond = unwrap(where)
        return wrap(F.max_by(F.when(cond, self.spark()), F.when(cond, unwrap(key))))

    def argmin(self, key, where=None):
        if where is None:
            return wrap(F.min_by(self.spark(), unwrap(key)))
        cond = unwrap(where)
        return wrap(F.min_by(F.when(cond, self.spark()), F.when(cond, unwrap(key))))

    # -- positional (reductions.py:39-58, :127-138) ----------------------------
    def first(self, where=None, order_by=None, include_null=False):
        c = _filtered(self.spark(), where)
        if order_by is not None:
            # PC:256-275: inject ordering via min_by/struct ordering.
            # all-asc → min_by, all-desc → max_by (global reversal); mixed
            # directions fall back to a comparator sort of collected pairs.
            ks = _sort_key_list(order_by)
            key = _filtered(F.struct(*[k for k, _ in ks]), where)
            if all(asc for _, asc in ks):
                return wrap(F.min_by(c, key))
            if all(not asc for _, asc in ks):
                return wrap(F.max_by(c, key))
            pairs = _sorted_pairs(self.spark(), ks, where)
            return wrap(F.get(pairs, 0)["v"])
        return wrap(F.first(c, ignorenulls=not include_null))

    def last(self, where=None, order_by=None, include_null=False):
        c = _filtered(self.spark(), where)
        if order_by is not None:
            ks = _sort_key_list(order_by)
            key = _filtered(F.struct(*[k for k, _ in ks]), where)
            if all(asc for _, asc in ks):
                return wrap(F.max_by(c, key))
            if all(not asc for _, asc in ks):
                return wrap(F.min_by(c, key))
            pairs = _sorted_pairs(self.spark(), ks, where)
            return wrap(F.get(pairs, F.size(pairs) - 1)["v"])
        return wrap(F.last(c, ignorenulls=not include_null))

    def arbitrary(self, where=None):
        """Arbitrary (reductions.py:127) → any non-null value (PC:276-281)."""
        return wrap(F.first(_filtered(self.spark(), where), ignorenulls=True))

    # -- collections (reductions.py:59-91) -------------------------------------
    def collect(self, where=None, order_by=None, include_null=False, distinct=False):
        """ArrayCollect (reductions.py:59)."""
        c = _filtered(self.spark(), where)
        if not include_null:
            c = F.when(c.isNotNull(), c)  # collect_list already drops nulls
        if distinct:
            out = F.collect_set(c)
        else:
            out = F.collect_list(c)
        if order_by is not None:
            # deterministic ordering: collect (key, value) structs, sort, project
            ks = _sort_key_list(order_by)
            if all(asc for _, asc in ks):
                # natural ascending struct sort (fast path)
                k = F.struct(*[kc for kc, _ in ks])
                pairs = F.collect_list(F.when(unwrap(where) if where is not None else F.lit(True), F.struct(k.alias("k"), self.spark().alias("v"))))
                out = F.transform(F.array_sort(pairs), lambda s: s["v"])
            else:
                # descending / mixed directions: comparator-driven sort
                out = F.transform(
                    _sorted_pairs(self.spark(), ks, where), lambda s: s["v"]
                )
        return wrap(out)

    def group_concat(self, sep=",", where=None, order_by=None):
        """GroupConcat (reductions.py:82) → array_join(collect_list) (PC:285-296)."""
        if order_by is not None:
            arr = self.collect(where=where, order_by=order_by)
            return wrap(F.array_join(arr.spark().cast("array<string>"), sep))
        c = _filtered(self.spark(), where)
        return wrap(F.array_join(F.collect_list(c.cast("string")), sep))

    # -- quantiles (reductions.py:247-306, :354) --------------------------------
    def median(self, where=None, approx=False):
        """Median (Median reductions.py:247).

        SCALE: the exact path (``F.median``) buffers every group's values
        in executor memory — at 100 TB a single hot group can OOM an
        executor. Pass ``approx=True`` (t-digest style sketch, constant
        memory per group, same contract as the reference's ApproxMedian)
        for large or skewed groups.
        """
        if approx:
            return self.approx_median(where=where)
        return wrap(F.median(_filtered(self.spark(), where)))

    def approx_median(self, where=None):
        return wrap(F.percentile_approx(_filtered(self.spark(), where), 0.5))

    def quantile(self, q, where=None, approx=False):
        """Exact quantile(s) (Quantile/MultiQuantile reductions.py:254-306).

        SCALE: ``F.percentile`` is exact and buffers each group's values in
        executor memory; a hot group at 100 TB OOMs. Pass ``approx=True``
        to use the constant-memory sketch (``percentile_approx``) instead —
        identical call shape, approximate rank."""
        if approx:
            return self.approx_quantile(q, where=where)
        c = _filtered(self.spark(), where)
        if isinstance(q, (list, tuple)):
            return wrap(F.percentile(c, F.array(*[F.lit(float(x)) for x in q])))
        return wrap(F.percentile(c, float(q)))

    def approx_quantile(self, q, where=None):
        c = _filtered(self.spark(), where)
        if isinstance(q, (list, tuple)):
            return wrap(F.percentile_approx(c, [float(x) for x in q]))
        return wrap(F.percentile_approx(c, float(q)))

    def mode(self, where=None):
        return wrap(F.mode(_filtered(self.spark(), where)))

    # -- dispersion (reductions.py:292-353) --------------------------------------
    def std(self, where=None, how="sample"):
        c = _filtered(self.spark(), where)
        return wrap(F.stddev_samp(c) if how == "sample" else F.stddev_pop(c))

    def var(self, where=None, how="sample"):
        c = _filtered(self.spark(), where)
        return wrap(F.var_samp(c) if how == "sample" else F.var_pop(c))

    def corr(self, other, where=None, how="pop"):
        # F.corr is population Pearson (PC:313-319 raises on how="sample")
        a, b = self.spark(), unwrap(other)
        if where is not None:
            cond = unwrap(where)
            a, b = F.when(cond, a), F.when(cond, b)
        return wrap(F.corr(a, b))

    def cov(self, other, where=None, how="sample"):
        a, b = self.spark(), unwrap(other)
        if where is not None:
            cond = unwrap(where)
            a, b = F.when(cond, a), F.when(cond, b)
        return wrap(F.covar_samp(a, b) if how == "sample" else F.covar_pop(a, b))

    def kurtosis(self, where=None):
        return wrap(F.kurtosis(_filtered(self.spark(), where)))

    def skew(self, where=None):
        return wrap(F.skewness(_filtered(self.spark(), where)))

    # -- bitwise aggs (reductions.py:139-193) -------------------------------------
    def bit_and(self, where=None):
        return wrap(F.bit_and(_filtered(self.spark(), where)))

    def bit_or(self, where=None):
        return wrap(F.bit_or(_filtered(self.spark(), where)))

    def bit_xor(self, where=None):
        return wrap(F.bit_xor(_filtered(self.spark(), where)))

    # -- boolean aggs (reductions.py:415-429) --------------------------------------
    def any(self, where=None):
        return wrap(F.bool_or(_filtered(self.spark(), where)))

    def all(self, where=None):
        return wrap(F.bool_and(_filtered(self.spark(), where)))

    def notany(self, where=None):
        """BooleanColumn.notany (expr/types/logical.py:346): NOT any()."""
        return wrap(~F.bool_or(_filtered(self.spark(), where)))

    def notall(self, where=None):
        """BooleanColumn.notall (expr/types/logical.py:421): NOT all()."""
        return wrap(~F.bool_and(_filtered(self.spark(), where)))

    # -- binning (histograms.py:18) -------------------------------------------------
    def bucket(self, buckets, closed="left", close_extreme=True, include_under=False, include_over=False):
        """Bucket → SearchedCase chain (sql/rewrites.py:552-603)."""
        c = self.spark()
        out = None
        idx = 0
        if include_under:
            pred = c < buckets[0] if closed == "left" else c <= buckets[0]
            out = F.when(pred, F.lit(idx))
            idx += 1
        n = len(buckets)
        for i in range(n - 1):
            lo, hi = buckets[i], buckets[i + 1]
            last = i == n - 2
            if closed == "left":
                upper_ok = (c <= hi) if (last and close_extreme) else (c < hi)
                pred = (c >= lo) & upper_ok
            else:
                lower_ok = (c >= lo) if (last is False and i == 0 and close_extreme) else (c > lo)
                if i == 0 and close_extreme:
                    lower_ok = c >= lo
                pred = lower_ok & (c <= hi)
            out = F.when(pred, F.lit(idx)) if out is None else out.when(pred, F.lit(idx))
            idx += 1
        if include_over:
            pred = c > buckets[-1] if closed == "left" else c > buckets[-1]
            out = out.when(pred, F.lit(idx))
        # bucket is a scalar when-chain, not a reduction
        return _base_wrap(out.cast("int"))


def _sort_key_list(order_by):
    """Normalize order_by into [(column, ascending)] pairs. A SortOrder
    expression cannot be evaluated inside a struct, so SortKey objects
    contribute their raw child column plus direction."""
    from ibis_spark.expr.core import SortKey

    keys = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    out = []
    for k in keys:
        if isinstance(k, SortKey):
            out.append((k.child, k.ascending))
        else:
            out.append((unwrap(k), True))
    return out


def _pair_comparator(ks):
    """array_sort comparator over (k0..kn, v) structs honoring per-key
    direction — works for ANY orderable type (strings included, which a
    negate-the-key struct trick cannot handle). Null keys sort first under
    asc and last under desc, mirroring Spark SQL's ORDER BY defaults."""

    def cmp(a, b):
        out = F.lit(0)
        for i in reversed(range(len(ks))):
            _, asc = ks[i]
            ka, kb = a[f"k{i}"], b[f"k{i}"]
            lt, gt = (-1, 1) if asc else (1, -1)
            ci = (
                F.when(ka.isNull() & kb.isNull(), F.lit(0))
                .when(ka.isNull(), F.lit(lt))
                .when(kb.isNull(), F.lit(gt))
                .when(ka < kb, F.lit(lt))
                .when(ka > kb, F.lit(gt))
                .otherwise(F.lit(0))
            )
            out = F.when(ci != 0, ci).otherwise(out)
        return out

    return cmp


def _sorted_pairs(value, ks, where):
    """Collect (keys..., value) structs of the rows passing ``where`` and
    sort them with the direction-aware comparator. Group-bounded memory —
    the same bound every ordered collect already pays."""
    fields = [k.alias(f"k{i}") for i, (k, _) in enumerate(ks)]
    fields.append(value.alias("v"))
    pair = F.struct(*fields)
    if where is not None:
        pair = F.when(unwrap(where), pair)
    return F.array_sort(F.collect_list(pair), _pair_comparator(ks))
