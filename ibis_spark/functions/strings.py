"""String operations (reference: ibis/expr/operations/strings.py:26-390).

Semantic shims vs raw Spark, mirroring the reference's lowering
(ibis/backends/sql/compilers/pyspark.py [PC], .../base.py [BC]):

- ``substr``/``find`` are 0-indexed (BC:1019); Spark is 1-indexed.
- ``strip`` removes ALL whitespace, not just spaces (PC:447-455).
- ``capitalize`` is first-char-upper + rest-lower, NOT initcap
  (sql/rewrites.py:606-615).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibis_spark.expr.core import unwrap, wrap

# ASCII whitespace only (string.whitespace incl. VT/FF), matching the
# reference trim charset (PC:447-455) — Java regex \s is exactly this set.
_WS = r"\s"


class StringOps:
    __slots__ = ()

    # -- case / trim family (strings.py:26-60) --------------------------------
    def lower(self):
        return wrap(F.lower(self.spark()))

    def upper(self):
        return wrap(F.upper(self.spark()))

    def reverse(self):
        return wrap(F.reverse(self.spark()))

    def strip(self):
        return wrap(F.regexp_replace(self.spark(), f"^{_WS}+|{_WS}+$", ""))

    def lstrip(self):
        return wrap(F.regexp_replace(self.spark(), f"^{_WS}+", ""))

    def rstrip(self):
        return wrap(F.regexp_replace(self.spark(), f"{_WS}+$", ""))

    def capitalize(self):
        c = self.spark()
        return wrap(
            F.concat(
                F.upper(c.substr(F.lit(1), F.lit(1))),
                F.lower(c.substr(F.lit(2), F.length(c))),
            )
        )

    # -- slicing (strings.py:61-95) -------------------------------------------
    def substr(self, start, length=None):
        """0-indexed substring (reference Substring, strings.py:61; BC:1019)."""
        c = self.spark()
        start_c = unwrap(start)
        # negative start counts from the end, python-style
        pos = F.when(start_c >= 0, start_c + 1).otherwise(
            F.greatest(F.length(c) + start_c + 1, F.lit(1))
        )
        if length is None:
            length_c = F.length(c)
        else:
            length_c = unwrap(length)
        return wrap(c.substr(pos, length_c))

    def left(self, n):
        return self.substr(0, n)

    def right(self, n):
        """StrRight (strings.py:85); ``n`` may be an expression."""
        if isinstance(n, int):
            return wrap(F.substring(self.spark(), -n, n))
        n_c = unwrap(n)
        c = self.spark()
        return wrap(c.substr(F.greatest(F.length(c) - n_c + 1, F.lit(1)), n_c))

    def repeat(self, n):
        return wrap(F.repeat(self.spark(), n))

    # -- search (strings.py:107-130) -------------------------------------------
    def find(self, substr, start=None, end=None):
        """0-indexed locate; -1 when absent (StringFind, strings.py:107).

        ``start`` may be an int or a Column expression (ADVICE r2: build
        the offset with column arithmetic, not int()).
        """
        c = self.spark()
        sub = unwrap(substr)
        if start is not None or end is not None:
            start_c = (
                F.lit(0)
                if start is None
                else (F.lit(start) if isinstance(start, int) else unwrap(start))
            )
            if end is not None:
                end_c = F.lit(end) if isinstance(end, int) else unwrap(end)
                region_len = F.greatest(end_c - start_c, F.lit(0))
            else:
                region_len = F.length(c)
            # search the bounded region, shift the hit to full-string coords
            region = c.substr(start_c + 1, region_len)
            hit = F.instr(region, sub)
            return wrap(F.when(hit > 0, hit + start_c - 1).otherwise(F.lit(-1)))
        return wrap(F.instr(c, sub) - 1)

    def translate(self, from_str: str, to_str: str):
        return wrap(F.translate(self.spark(), from_str, to_str))

    def lpad(self, length, pad=" "):
        return wrap(F.lpad(self.spark(), length, pad))

    def rpad(self, length, pad=" "):
        return wrap(F.rpad(self.spark(), length, pad))

    def find_in_set(self, values):
        """FindInSet (strings.py:156): 0-based index of self in list, -1 absent."""
        return wrap(F.find_in_set(self.spark(), F.lit(",".join(values))) - 1)

    # -- predicates (strings.py:192-242) ----------------------------------------
    def startswith(self, prefix):
        return wrap(self.spark().startswith(unwrap(prefix)))

    def endswith(self, suffix):
        return wrap(self.spark().endswith(unwrap(suffix)))

    def like(self, pattern):
        c = self.spark()
        if isinstance(pattern, (list, tuple)):
            out = c.like(pattern[0])
            for p in pattern[1:]:
                out = out | c.like(p)
            return wrap(out)
        return wrap(c.like(pattern))

    def ilike(self, pattern):
        c = self.spark()
        if isinstance(pattern, (list, tuple)):
            out = c.ilike(pattern[0])
            for p in pattern[1:]:
                out = out | c.ilike(p)
            return wrap(out)
        return wrap(c.ilike(pattern))

    def contains(self, substr):
        return wrap(self.spark().contains(unwrap(substr)))

    # -- regex (strings.py:243-294) ----------------------------------------------
    def re_search(self, pattern):
        return wrap(self.spark().rlike(pattern))

    def re_extract(self, pattern, index: int = 0):
        """RegexExtract (strings.py:248): NULL on no-match — Spark's
        regexp_extract returns '' instead, so gate on rlike (VERDICT r2 #6)."""
        c = self.spark()
        return wrap(
            F.when(c.rlike(pattern), F.regexp_extract(c, pattern, index))
        )

    def re_split(self, pattern):
        return wrap(F.split(self.spark(), pattern))

    def re_replace(self, pattern, replacement):
        return wrap(F.regexp_replace(self.spark(), pattern, replacement))

    def replace(self, pattern, replacement):
        """Literal (non-regex) replace (StringReplace, strings.py:283)."""
        return wrap(F.replace(self.spark(), unwrap(pattern), unwrap(replacement)))

    def split(self, delimiter):
        return wrap(F.split(self.spark(), _regex_escape(delimiter)))

    # -- concat / join (strings.py:167-190, :306) ---------------------------------
    def concat(self, *others):
        return wrap(F.concat(self.spark(), *(unwrap(o) for o in others)))

    def join(self, parts):
        """Join strings with self as separator (StringJoin strings.py:167,
        ArrayStringJoin :181 when ``parts`` is an array column)."""
        return _join_sep(self, parts)

    # -- url extraction (strings.py:316-357) ----------------------------------------
    def protocol(self):
        return wrap(F.parse_url(self.spark(), F.lit("PROTOCOL")))

    def authority(self):
        return wrap(F.parse_url(self.spark(), F.lit("AUTHORITY")))

    def userinfo(self):
        return wrap(F.parse_url(self.spark(), F.lit("USERINFO")))

    def host(self):
        return wrap(F.parse_url(self.spark(), F.lit("HOST")))

    def file(self):
        return wrap(F.parse_url(self.spark(), F.lit("FILE")))

    def path(self):
        return wrap(F.parse_url(self.spark(), F.lit("PATH")))

    def query(self, key=None):
        if key is None:
            return wrap(F.parse_url(self.spark(), F.lit("QUERY")))
        return wrap(F.parse_url(self.spark(), F.lit("QUERY"), unwrap(key)))

    def fragment(self):
        return wrap(F.parse_url(self.spark(), F.lit("REF")))

    # -- misc (strings.py:358-390) -----------------------------------------------
    def length(self):
        """StringLength / ArrayLength / MapLength — ibis dispatches
        ``.length()`` by dtype; we consult the (lazy) plan schema when the
        column is table-bound, else default to string length."""
        df = getattr(self, "_source_df", None)
        if df is not None:
            from pyspark.sql.types import ArrayType, MapType

            try:
                dt = self._plan_dtype()
            except Exception:
                dt = None
            if isinstance(dt, ArrayType):
                return self.array_length()
            if isinstance(dt, MapType):
                return self.map_length()
        return wrap(F.length(self.spark()))

    def ascii_str(self):
        return wrap(F.ascii(self.spark()))

    def levenshtein(self, other):
        return wrap(F.levenshtein(self.spark(), unwrap(other)))

    def to_date(self, fmt: str):
        from ibis_spark.functions.temporal import _strptime_to_java

        return wrap(F.to_date(self.spark(), _strptime_to_java(fmt)))

    def to_timestamp(self, fmt: str):
        from ibis_spark.functions.temporal import _strptime_to_java

        return wrap(F.to_timestamp(self.spark(), _strptime_to_java(fmt)))

    # ibis-native spellings (StringValue.as_date/as_time/as_timestamp,
    # expr/types/strings.py:1285-1343) — strptime-style format strings
    as_date = to_date

    def as_timestamp(self, fmt: str = "s"):
        """StringValue.as_timestamp(format) / IntegerValue.as_timestamp(unit)
        — ibis dispatches on dtype; our untyped Column dispatches on the
        argument: a bare epoch unit ("s"/"ms"/"us") takes the integer path,
        anything else is a strptime format."""
        if fmt in ("s", "ms", "us"):
            from ibis_spark.functions.temporal import timestamp_from_unix

            return timestamp_from_unix(self, fmt)
        return self.to_timestamp(fmt)

    def as_time(self, fmt: str):
        """StringValue.as_time (strings.py:1343): parse with a strptime
        format → our time representation (HH:mm:ss string; Spark has no
        TimeType — temporal.py time() ctor contract)."""
        from ibis_spark.functions.temporal import _strptime_to_java

        parsed = F.to_timestamp(self.spark(), _strptime_to_java(fmt))
        return wrap(F.date_format(parsed, "HH:mm:ss"))


def _regex_escape(s):
    import re as _re

    if isinstance(s, str):
        return _re.escape(s)
    return s


def _join_sep(sep, parts):
    # concat_ws / array_join need a literal python separator; a Column
    # separator carries its literal value when built via literal()
    sep_str = sep if isinstance(sep, str) else getattr(sep, "_lit", None)
    if isinstance(parts, (list, tuple)):
        cols = [unwrap(p) for p in parts]
        if isinstance(sep_str, str):
            return wrap(F.concat_ws(sep_str, *cols))
        # column separator: intersperse (nulls propagate, unlike concat_ws)
        sep_c = unwrap(sep)
        out = cols[0]
        for c in cols[1:]:
            out = F.concat(out, sep_c, c)
        return wrap(out)
    # array column: array_join (ArrayStringJoin strings.py:181; PC:433)
    if not isinstance(sep_str, str):
        raise TypeError("array join separator must be a literal string")
    return wrap(F.array_join(unwrap(parts), sep_str))
