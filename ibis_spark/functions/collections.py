"""Array / Map / Struct / JSON operations
(reference: ibis/expr/operations/arrays.py, maps.py, structs.py, json.py).

Index semantics are 0-based per the reference (Spark is 1-based; the
reference compiler applies the same shifts — PC:406-425,
sql/rewrites.py:490-498). Higher-order ops use Spark SQL lambda functions
(``F.transform``/``F.filter``/``F.aggregate``) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibis_spark.expr.core import unwrap, wrap


def _lam(fn, with_index=False):
    """Adapt a user lambda over our Column into a Spark SQL lambda."""
    if with_index:
        return lambda x, i: unwrap(fn(wrap(x), wrap(i)))
    return lambda x: unwrap(fn(wrap(x)))


class ArrayOps:
    __slots__ = ()

    # -- basics (arrays.py:18-92) ---------------------------------------------
    def array_length(self):
        """ArrayLength (arrays.py:33) — null in, null out (not legacy -1)."""
        return wrap(F.array_size(self.spark()))

    def array_slice(self, start, stop=None):
        """ArraySlice (arrays.py:43), python-style half-open 0-indexed
        (1-index fixups per PC:415-425)."""
        c = self.spark()
        n = F.array_size(c)
        start_c = F.lit(int(start)) if not hasattr(start, "spark") else unwrap(start)
        norm_start = F.when(start_c < 0, F.greatest(n + start_c, F.lit(0))).otherwise(
            F.least(start_c, n)
        )
        if stop is None:
            stop_norm = n
        else:
            stop_c = F.lit(int(stop)) if not hasattr(stop, "spark") else unwrap(stop)
            stop_norm = F.when(stop_c < 0, F.greatest(n + stop_c, F.lit(0))).otherwise(
                F.least(stop_c, n)
            )
        length = F.greatest(stop_norm - norm_start, F.lit(0))
        return wrap(F.slice(c, norm_start + 1, length))

    def array_index(self, index):
        """ArrayIndex (arrays.py:55): 0-based, negative from end,
        NULL out-of-bounds (element_at 0→1 shift PC:406-408)."""
        c = self.spark()
        if isinstance(index, int):
            if index >= 0:
                return wrap(F.get(c, index))
            return wrap(
                F.when(F.array_size(c) + index >= 0, F.element_at(c, index))
            )
        i = unwrap(index)
        return wrap(
            F.when(i >= 0, F.get(c, i)).otherwise(
                F.when(F.array_size(c) + i >= 0, F.element_at(c, i))
            )
        )

    def array_concat(self, *others):
        return wrap(F.concat(self.spark(), *(unwrap(o) for o in others)))

    def array_repeat(self, n):
        """ArrayRepeat (arrays.py:82) → flatten(array_repeat) (PC:412-414)."""
        return wrap(F.flatten(F.array_repeat(self.spark(), int(n))))

    # -- higher-order (arrays.py:93-123) ----------------------------------------
    def array_map(self, fn):
        """ArrayMap (arrays.py:93) → F.transform; index param is 0-based in
        both ibis and Spark transform lambdas."""
        import inspect

        nparams = len(inspect.signature(fn).parameters)
        return wrap(F.transform(self.spark(), _lam(fn, with_index=nparams == 2)))

    def array_filter(self, fn):
        import inspect

        nparams = len(inspect.signature(fn).parameters)
        return wrap(F.filter(self.spark(), _lam(fn, with_index=nparams == 2)))

    def array_any(self, fn=None):
        """ArrayAny (arrays.py:312): true if any (non-null) element truthy."""
        c = self.spark()
        pred = _lam(fn) if fn is not None else (lambda x: x)
        return wrap(F.exists(c, pred))

    def array_all(self, fn=None):
        c = self.spark()
        pred = _lam(fn) if fn is not None else (lambda x: x)
        return wrap(F.forall(F.filter(c, lambda x: x.isNotNull()), pred))

    # -- membership / search (arrays.py:137-158) ---------------------------------
    def array_contains(self, value):
        """ArrayContains (arrays.py:137), null-safe (PC:426-432)."""
        return wrap(F.array_contains(self.spark(), unwrap(value)))

    def array_position(self, value):
        """ArrayPosition (arrays.py:148): 0-based, -1 absent
        (array_position − 1, rewrites.py:490-498)."""
        return wrap((F.array_position(self.spark(), unwrap(value)) - 1).cast("long"))

    def array_remove(self, value):
        return wrap(F.array_remove(self.spark(), unwrap(value)))

    # -- set-like (arrays.py:170-231) ----------------------------------------------
    def array_distinct(self):
        return wrap(F.array_distinct(self.spark()))

    unique = array_distinct

    def array_sort(self):
        return wrap(F.array_sort(self.spark()))

    def array_union(self, other):
        return wrap(F.array_union(self.spark(), unwrap(other)))

    def array_intersect(self, other):
        return wrap(F.array_intersect(self.spark(), unwrap(other)))

    def array_zip(self, *others):
        """ArrayZip (arrays.py:212): struct<f1..fN>, null-padded to the
        longest input (PC:385-387 renames arrays_zip fields; we fold
        zip_with, which already null-pads)."""
        cols = [self.spark(), *(unwrap(o) for o in others)]
        out = F.zip_with(
            cols[0],
            cols[1],
            lambda x, y: F.struct(x.alias("f1"), y.alias("f2")),
        )
        for i, c in enumerate(cols[2:], start=3):
            prev = i - 1

            def merge(s, y, prev=prev, i=i):
                fields = [s.getField(f"f{j}").alias(f"f{j}") for j in range(1, prev + 1)]
                return F.struct(*fields, y.alias(f"f{i}"))

            out = F.zip_with(out, c, merge)
        return wrap(out)

    def array_flatten(self):
        return wrap(F.flatten(self.spark()))

    # -- array aggregations (arrays.py:286-332) ---------------------------------------
    # PERF NOTE (measured round 7, sf0.1 documents): these reductions
    # reference their input array 2-3×, and HOF lambdas are interpreted
    # with no common-subexpression elimination — so callers reducing a
    # COMPUTED array (split/transform chains) should materialize it in its
    # own projection first (CollapseProject keeps non-cheap multi-referenced
    # projections separate), which cut the 6-reduction documents query from
    # 0.56 s to 0.38 s. A single-pass struct-accumulator fusion was tried
    # and REJECTED: per-element struct allocation in interpreted eval made
    # it 0.6+ s — slower than re-traversing a materialized array.
    def array_min(self):
        # Spark's array_min skips null elements natively (NULL only for
        # null/empty/all-null input) — exactly the reference semantics
        return wrap(F.array_min(self.spark()))

    def array_max(self):
        return wrap(F.array_max(self.spark()))

    def array_sum(self):
        """ArraySum (arrays.py:301): aggregate(filter(x, notnull)) lambda
        reduction (PC:661-697); sum of non-nulls, NULL when no non-null
        elements."""
        c = F.filter(self.spark(), lambda x: x.isNotNull())
        return wrap(
            F.when(
                F.array_size(c) > 0,
                F.aggregate(c, F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double")),
            )
        )

    def array_mean(self):
        c = F.filter(self.spark(), lambda x: x.isNotNull())
        total = F.aggregate(c, F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double"))
        return wrap(F.when(F.array_size(c) > 0, total / F.array_size(c)))

    def array_mode(self):
        c = F.filter(self.spark(), lambda x: x.isNotNull())
        # mode via sort of (count, value) pairs — JVM lambda, no UDF
        distinct = F.array_distinct(c)
        counted = F.transform(
            distinct,
            lambda v: F.struct(
                F.array_size(F.filter(c, lambda x: x == v)).alias("n"), v.alias("v")
            ),
        )
        return wrap(F.array_max(counted).getField("v"))

    def anys(self):
        """ArrayAny as the ibis ``anys`` reduction (arrays.py:1112): OR of
        the non-null elements; NULL if the array is empty or all-null."""
        c = F.filter(self.spark(), lambda x: x.isNotNull())
        return wrap(F.when(F.array_size(c) > 0, F.exists(c, lambda x: x)))

    def alls(self):
        """ArrayAll (arrays.py:1162): AND of non-null elements; NULL if
        empty or all-null."""
        c = F.filter(self.spark(), lambda x: x.isNotNull())
        return wrap(F.when(F.array_size(c) > 0, F.forall(c, lambda x: x)))

    # -- ibis-native spellings (expr/types/arrays.py ArrayValue user API) ----
    # `unique` is aliased above; these make every reference method name work
    # verbatim so an ibis user can switch without renames.
    mins = array_min
    maxs = array_max
    sums = array_sum
    means = array_mean
    modes = array_mode
    sort = array_sort
    flatten = array_flatten
    zip = array_zip
    remove = array_remove
    filter = array_filter


class MapOps:
    __slots__ = ()

    def map_length(self):
        """MapLength (maps.py:31)."""
        c = self.spark()
        return wrap(F.when(c.isNotNull(), F.size(c)))

    def map_get(self, key, default=None):
        """MapGet (maps.py:39) → element_at + coalesce default (PC:379-384)."""
        got = F.element_at(self.spark(), unwrap(key))
        if default is None:
            return wrap(got)
        return wrap(F.coalesce(got, unwrap(default)))

    def map_contains(self, key):
        return wrap(F.map_contains_key(self.spark(), unwrap(key)))

    def map_keys(self):
        return wrap(F.map_keys(self.spark()))

    def map_values(self):
        return wrap(F.map_values(self.spark()))

    def map_merge(self, other):
        """MapMerge (maps.py:87) → map_concat."""
        return wrap(F.map_concat(self.spark(), unwrap(other)))

    # ibis-native spellings (expr/types/maps.py MapValue user API).
    # `contains`/`length` stay map_-prefixed: those names are taken by the
    # string ops on this untyped Column (ibis dispatches on dtype).
    get = map_get
    keys = map_keys
    values = map_values


class StructOps:
    __slots__ = ()

    def get_field(self, name):
        """StructField (structs.py:15)."""
        return wrap(self.spark().getField(name), name=name)

    def struct_fields(self):
        """Field names of a struct column. The names are statically known
        from the plan schema — emit a literal array (zero per-row cost),
        never serialize rows to JSON."""
        from pyspark.sql.types import StructType

        df = getattr(self, "_source_df", None)
        name = self.get_name()
        if df is not None and name in getattr(df, "columns", ()):
            dt = df.schema[name].dataType
            if isinstance(dt, StructType):
                return wrap(F.array(*[F.lit(f.name) for f in dt.fields]))
        # fallback when the defining DataFrame isn't tracked: derive the
        # keys from a JSON round-trip (per-row cost; schema unavailable)
        return wrap(F.json_object_keys(F.to_json(self.spark())))

    @property
    def fields(self):
        """Mapping of field name → dtype for a struct column (reference
        StructValue.fields property, expr/types/structs.py). Statically
        derived from the plan schema — no execution."""
        from pyspark.sql.types import StructType

        from ibis_spark.datatypes import from_spark

        dt = self._plan_dtype()
        if not isinstance(dt, StructType):
            raise TypeError("fields requires a struct-typed column")
        return {f.name: from_spark(f.dataType) for f in dt.fields}

    def _plan_dtype(self):
        """The Spark data type this expression evaluates to, derived from
        the (lazy) plan schema of a 0-row projection — metadata only."""
        df = getattr(self, "_source_df", None)
        if df is None:
            raise TypeError(
                "type information requires a table-bound expression (t.col...)"
            )
        return df.select(self.spark().alias("__t__")).schema["__t__"].dataType

    def lift(self):
        """Project the fields of this struct into a Table (reference
        StructValue.lift, expr/types/structs.py). Pure projection —
        column pruning still reaches the scan."""
        from ibis_spark.expr.table import Table

        df = getattr(self, "_source_df", None)
        if df is None:
            raise TypeError("lift() requires a table-bound struct column")
        return Table(df.select(self.spark().alias("__s__")).select("__s__.*"))


class JsonOps:
    """JSON ops over string-typed JSON columns (json.py:14-87).

    The reference registers pandas UDFs on Spark for typed unwrap
    (backends/pyspark/__init__.py:75-113); we stay JVM-side with
    get_json_object + try_cast + a from_json type sniff.
    """

    __slots__ = ()

    def json_get(self, key):
        """JSONGetItem (json.py:14) → get_json_object (PC:472-479)."""
        if isinstance(key, int):
            path = f"$[{key}]"
        else:
            path = f"$.{key}"
        return wrap(F.get_json_object(self.spark(), path))

    def json_path(self, path):
        return wrap(F.get_json_object(self.spark(), path))

    def json_array(self):
        """ToJSONArray (json.py:25)."""
        return wrap(F.from_json(self.spark(), "array<string>"))

    def json_map(self):
        """ToJSONMap (json.py:38)."""
        return wrap(F.from_json(self.spark(), "map<string,string>"))

    def unwrap_as(self, dtype: str):
        """UnwrapJSONString/Int64/Float64/Boolean (json.py:51-87):
        typed extraction, NULL on type mismatch."""
        c = self.spark()
        if dtype in ("string", "str"):
            # only unwrap actual JSON strings: reject objects/arrays/numbers.
            # from_json needs a container schema in Spark 4, so parse the
            # scalar as a 1-element array — correctly handles \" escapes.
            # size==1 guards the greedy regex: '"a","b"' would bracket-wrap
            # to a 2-element array and must stay NULL, not unwrap to 'a'.
            is_str = c.rlike(r'^\s*".*"\s*$')
            parsed = F.from_json(
                F.concat(F.lit("["), c, F.lit("]")), "array<string>"
            )
            ok = is_str & parsed.isNotNull() & (F.array_size(parsed) == 1)
            return wrap(F.when(ok, F.get(parsed, 0)))
        if dtype in ("int64", "int"):
            is_num = c.rlike(r"^\s*-?\d+\s*$")
            return wrap(F.when(is_num, c.cast("long")))
        if dtype in ("float64", "float"):
            is_num = c.rlike(r"^\s*-?\d+(\.\d+)?([eE][+-]?\d+)?\s*$")
            return wrap(F.when(is_num, c.cast("double")))
        if dtype in ("bool", "boolean"):
            is_bool = c.rlike(r"^\s*(true|false)\s*$")
            return wrap(F.when(is_bool, c.cast("boolean")))
        raise ValueError(f"unsupported json unwrap type {dtype}")

    # -- ibis-native accessors (expr/types/json.py JSONValue properties) -----
    @property
    def str(self):
        """JSONValue.str — unwrap JSON strings, NULL on non-strings."""
        return self.unwrap_as("string")

    @property
    def int(self):
        return self.unwrap_as("int64")

    @property
    def float(self):
        return self.unwrap_as("float64")

    @property
    def bool(self):
        return self.unwrap_as("bool")

    @property
    def array(self):
        """JSONValue.array — NULL for non-array JSON (from_json already
        yields NULL on mismatch)."""
        return self.json_array()

    @property
    def map(self):
        """Dual-role accessor: as a property it is JSONValue.map (the JSON
        object as map<string,string>); called with a lambda it is
        ArrayValue.map (element-wise transform) — ibis dispatches these two
        by dtype, our untyped Column dispatches by usage."""
        from ibis_spark.expr.column import _MapAccessor

        out = _MapAccessor(self.json_map().spark())
        object.__setattr__(out, "_map_parent", self)
        return out


# -- constructors (functions/__init__ re-exports) -----------------------------

def array(*values):
    """ibis.array (Array ctor, arrays.py:18)."""
    if len(values) == 1 and isinstance(values[0], (list, tuple)):
        values = tuple(values[0])
    return wrap(F.array(*(unwrap(v) for v in values)))


def map_(keys, values=None):
    """ibis.map (Map ctor, maps.py:14) → map_from_arrays."""
    if values is None and isinstance(keys, dict):
        ks = array(*keys.keys())
        vs = array(*keys.values())
        return wrap(F.map_from_arrays(ks.spark(), vs.spark()))
    return wrap(F.map_from_arrays(unwrap(keys), unwrap(values)))


def struct(fields=None, **kwargs):
    """ibis.struct (StructColumn, structs.py:35)."""
    items = dict(fields or {}, **kwargs)
    return wrap(F.struct(*[unwrap(v).alias(k) for k, v in items.items()]))
