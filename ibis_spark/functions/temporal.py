"""Temporal operations (reference: ibis/expr/operations/temporal.py:20-480).

Semantic shims vs raw Spark, mirroring the reference's pyspark lowering
(ibis/backends/sql/compilers/pyspark.py [PC]):

- ``day_of_week.index()`` is Monday=0 — Spark ``dayofweek`` is Sunday=1,
  so ``(dayofweek(x) + 5) % 7`` (PC:182-190).
- ``strftime`` takes C/strptime directives, translated to Java
  SimpleDateFormat patterns (PC compiles via a format mapping).
- epoch extraction via ``unix_timestamp`` (PC:202-204); milli/micro via
  fractional-second date_format (PC:194-201).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibis_spark.expr.core import unwrap, wrap

# C/strptime directive → Java SimpleDateFormat/DateTimeFormatter pattern
_STRPTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%a": "EEE",
    "%A": "EEEE",
    "%b": "MMM",
    "%B": "MMMM",
    "%j": "DDD",
    "%z": "ZZZZZ",
    "%Z": "zzz",
    "%G": "YYYY",
    "%V": "ww",
    "%%": "%",
}

_TRUNC_UNITS = {
    "Y": "year", "year": "year", "yr": "year",
    "Q": "quarter", "quarter": "quarter",
    "M": "month", "month": "month", "mo": "month",
    "W": "week", "week": "week", "w": "week",
    "D": "day", "day": "day", "d": "day",
    "h": "hour", "hour": "hour",
    "m": "minute", "minute": "minute", "min": "minute",
    "s": "second", "second": "second",
}

_INTERVAL_UNITS = {
    "Y": "year", "Q": "quarter", "M": "month", "W": "week", "D": "day",
    "h": "hour", "m": "minute", "s": "second", "ms": "millisecond",
    "us": "microsecond",
    "year": "year", "quarter": "quarter", "month": "month", "week": "week",
    "day": "day", "hour": "hour", "minute": "minute", "second": "second",
    "millisecond": "millisecond", "microsecond": "microsecond",
    # plural kwarg forms (interval(days=1))
    "years": "year", "quarters": "quarter", "months": "month", "weeks": "week",
    "days": "day", "hours": "hour", "minutes": "minute", "seconds": "second",
    "milliseconds": "millisecond", "microseconds": "microsecond",
}


def _strptime_to_java(fmt: str) -> str:
    """Translate a C/strptime format string to a Java datetime pattern.

    Literal ASCII letters must be single-quoted in Java patterns; literal
    single quotes double up.
    """
    out = []
    i = 0
    n = len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "%" and i + 1 < n:
            directive = fmt[i : i + 2]
            java = _STRPTIME_TO_JAVA.get(directive)
            if java is None:
                raise ValueError(f"unsupported strftime directive {directive!r}")
            out.append(java)
            i += 2
        elif ch == "'":
            out.append("''")
            i += 1
        elif ch.isalpha():
            # quote runs of literal letters
            j = i
            while j < n and fmt[j].isalpha():
                j += 1
            out.append("'" + fmt[i:j] + "'")
            i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class TemporalOps:
    __slots__ = ()

    # -- truncation (temporal.py:20-52) ---------------------------------------
    def truncate(self, unit):
        """Timestamp/DateTruncate → F.date_trunc (unit map PC:207-225)."""
        spark_unit = _TRUNC_UNITS.get(unit)
        if spark_unit is None:
            raise ValueError(f"unsupported truncation unit {unit!r}")
        return wrap(F.date_trunc(spark_unit, self.spark()))

    def bucket(self, interval=None, offset=None, **kwargs):
        """TimestampBucket (temporal.py:53) via F.window start
        (reference Spark marks unsupported, PC:70 — we support it).

        When called with a list of numeric boundaries, dispatches to the
        histogram Bucket reduction (histograms.py:18) instead.
        """
        if isinstance(interval, (list, tuple)):
            from ibis_spark.functions.reductions import ReductionOps

            return ReductionOps.bucket(self, interval, **kwargs)
        dur = interval if isinstance(interval, str) else _duration_str(**kwargs)
        win = F.window(self.spark(), dur)
        return wrap(win.getField("start"))

    # -- formatting / parsing (temporal.py:65-108) -----------------------------
    def strftime(self, fmt: str):
        return wrap(F.date_format(self.spark(), _strptime_to_java(fmt)))

    # -- extraction (temporal.py:131-213) --------------------------------------
    def year(self):
        return wrap(F.year(self.spark()))

    def quarter(self):
        return wrap(F.quarter(self.spark()))

    def month(self):
        return wrap(F.month(self.spark()))

    def week_of_year(self):
        return wrap(F.weekofyear(self.spark()))

    def day(self):
        return wrap(F.dayofmonth(self.spark()))

    def day_of_year(self):
        return wrap(F.dayofyear(self.spark()))

    @property
    def day_of_week(self):
        return DayOfWeek(self)

    def hour(self):
        return wrap(F.hour(self.spark()))

    def minute(self):
        return wrap(F.minute(self.spark()))

    def second(self):
        return wrap(F.second(self.spark()))

    def millisecond(self):
        """Extract millis within the second (PC:194-201)."""
        return wrap(F.date_format(self.spark(), "SSS").cast("int"))

    def microsecond(self):
        return wrap(
            (F.unix_micros(self.spark().cast("timestamp")) % 1_000_000).cast("int")
        )

    def epoch_seconds(self):
        """ExtractEpochSeconds → unix_timestamp (PC:202-204)."""
        return wrap(F.unix_timestamp(self.spark()).cast("long"))

    def epoch_days(self):
        """DateValue.epoch_days (expr/types/temporal.py:736): days since
        1970-01-01."""
        return wrap(
            F.datediff(self.spark().cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
        )

    def iso_year(self):
        """ExtractIsoYear (temporal.py) → ISO-8601 week-numbering year
        (Spark's YEAROFWEEK field; matches DuckDB isoyear)."""
        return wrap(F.date_part(F.lit("YEAROFWEEK"), self.spark()).cast("int"))

    # -- interval unit views (IntervalValue properties,
    #    expr/types/temporal.py:1281-1333): the TOTAL length of the
    #    interval expressed in the unit (truncating), per the documented
    #    "number of <unit> (IntegerValue)" contract. Spark lowering:
    #    CAST(iv AS INTERVAL <unit>) converts, CAST(... AS BIGINT) counts.
    @property
    def years(self):
        return wrap(self.spark().cast("interval year").cast("long"))

    @property
    def quarters(self):
        return wrap((self.spark().cast("interval month").cast("long") / 3).cast("long"))

    @property
    def months(self):
        return wrap(self.spark().cast("interval month").cast("long"))

    @property
    def weeks(self):
        return wrap((self.spark().cast("interval day").cast("long") / 7).cast("long"))

    @property
    def days(self):
        return wrap(self.spark().cast("interval day").cast("long"))

    @property
    def hours(self):
        return wrap(self.spark().cast("interval hour").cast("long"))

    @property
    def minutes(self):
        return wrap(self.spark().cast("interval minute").cast("long"))

    @property
    def seconds(self):
        return wrap(self.spark().cast("interval second").cast("long"))

    @property
    def milliseconds(self):
        return wrap(
            (self.spark().cast("interval second").cast("decimal(25,6)") * 1000)
            .cast("long")
        )

    @property
    def microseconds(self):
        return wrap(
            (self.spark().cast("interval second").cast("decimal(25,6)") * 1_000_000)
            .cast("long")
        )

    @property
    def nanoseconds(self):
        """Sub-microsecond intervals don't exist in Spark; the count is
        exact (micros × 1000)."""
        return wrap(
            (self.spark().cast("interval second").cast("decimal(25,6)") * 1_000_000)
            .cast("long") * 1000
        )

    def as_unit(self, target_unit: str):
        """IntervalValue.as_unit (expr/types/temporal.py:1257): this
        interval converted to `target_unit`, still as an interval. Spark
        has interval end-fields only for Y/M/D/h/m/s — for Q/W/ms/us/ns
        use the integer accessor properties instead."""
        spark_field = {
            "Y": "interval year",
            "M": "interval month",
            "D": "interval day",
            "h": "interval hour",
            "m": "interval minute",
            "s": "interval second",
        }.get(target_unit)
        if spark_field is None:
            raise ValueError(
                f"no Spark interval field for unit {target_unit!r}; use the "
                "integer accessors (.quarters/.weeks/.milliseconds/...) for "
                "a count in that unit"
            )
        return wrap(self.spark().cast(spark_field))

    to_unit = as_unit

    def as_interval(self, unit: str = "s"):
        """IntegerValue.as_interval (expr/types/numeric.py:1549): integer
        count → interval. Year-month units build YearMonthInterval, the
        rest DayTimeInterval (make_* functions; exact decimal seconds for
        the sub-second units)."""
        c = self.spark().cast("long")
        zero = F.lit(0)
        if unit == "Y":
            return wrap(F.make_ym_interval(c.cast("int"), zero))
        if unit == "Q":
            return wrap(F.make_ym_interval(zero, (c * 3).cast("int")))
        if unit == "M":
            return wrap(F.make_ym_interval(zero, c.cast("int")))
        if unit == "W":
            return wrap(F.make_dt_interval((c * 7).cast("int")))
        if unit == "D":
            return wrap(F.make_dt_interval(c.cast("int")))
        if unit == "h":
            return wrap(F.make_dt_interval(zero, c.cast("int")))
        if unit == "m":
            return wrap(F.make_dt_interval(zero, zero, c.cast("int")))
        if unit == "s":
            return wrap(F.make_dt_interval(zero, zero, zero, c.cast("decimal(25,6)")))
        if unit == "ms":
            return wrap(
                F.make_dt_interval(
                    zero, zero, zero, (c.cast("decimal(25,6)") / 1000)
                )
            )
        if unit == "us":
            return wrap(
                F.make_dt_interval(
                    zero, zero, zero, (c.cast("decimal(25,6)") / 1_000_000)
                )
            )
        raise ValueError(f"unsupported interval unit {unit!r}")

    # -- conversions (temporal.py:214-227) --------------------------------------
    def date(self):
        return wrap(F.to_date(self.spark()))

    def time(self):
        """Time-of-day as string HH:mm:ss (Spark has no TimeType; SURVEY §1.2)."""
        return wrap(F.date_format(self.spark(), "HH:mm:ss"))

    # -- arithmetic (temporal.py:282-421) -----------------------------------------
    def add(self, other):
        return self + other

    def sub(self, other):
        return self - other

    def delta(self, other, unit):
        """TemporalDelta (temporal.py:448-480): number of `unit`
        boundaries crossed between other and self (signed, self - other) —
        i.e. the difference of unit-truncated values, matching the
        reference and SQL date_diff. Implemented via date_trunc + epoch
        arithmetic (pyspark.sql.functions has no timestampdiff)."""
        part = _INTERVAL_UNITS.get(unit, unit)
        a, b = self.spark(), unwrap(other)

        def epoch(c):
            # NTZ cannot cast to long directly
            return c.cast("timestamp").cast("long")

        if part in ("year", "quarter", "month"):
            months = F.months_between(
                F.date_trunc(part, a), F.date_trunc(part, b), roundOff=True
            )
            div = {"year": 12, "quarter": 3, "month": 1}[part]
            return wrap((months / div).cast("long"))
        if part in ("millisecond", "microsecond"):
            scale = {"millisecond": 1000, "microsecond": 1}[part]
            ua = F.unix_micros(a.cast("timestamp"))
            ub = F.unix_micros(b.cast("timestamp"))
            return wrap(((ua - ub) / scale).cast("long"))
        secs = {"week": 604800, "day": 86400, "hour": 3600, "minute": 60, "second": 1}[part]
        return wrap(
            ((epoch(F.date_trunc(part, a)) - epoch(F.date_trunc(part, b))) / secs).cast(
                "long"
            )
        )

    def date_diff(self, other):
        """DateDiff (temporal.py:302): days between, self - other."""
        return wrap(F.datediff(self.spark(), unwrap(other)))

    def between_time(self, lower, upper):
        """BetweenTime (temporal.py:440)."""
        t = F.date_format(self.spark(), "HH:mm:ss")
        return wrap(t.between(F.lit(lower), F.lit(upper)))


class DayOfWeek:
    """col.day_of_week.index() / .full_name() (temporal.py:196-213)."""

    def __init__(self, col):
        self._col = col

    def index(self):
        """Monday=0 (Spark dayofweek is Sunday=1 → (d+5)%7, PC:182-190)."""
        return wrap(((F.dayofweek(self._col.spark()) + 5) % 7).cast("int"))

    def full_name(self):
        return wrap(F.date_format(self._col.spark(), "EEEE"))


def _duration_str(years=0, quarters=0, months=0, weeks=0, days=0, hours=0, minutes=0, seconds=0):
    parts = []
    months_total = years * 12 + quarters * 3 + months
    if months_total:
        raise ValueError("timestamp bucket by calendar months is not fixed-width")
    days_total = weeks * 7 + days
    if days_total:
        parts.append(f"{days_total} days")
    if hours:
        parts.append(f"{hours} hours")
    if minutes:
        parts.append(f"{minutes} minutes")
    if seconds:
        parts.append(f"{seconds} seconds")
    if not parts:
        raise ValueError("empty bucket width")
    return " ".join(parts)


# -- module-level constructors ------------------------------------------------

def date(value, month=None, day=None):
    """ibis.date: from string/components (DateFromYMD temporal.py:228)."""
    if month is not None:
        return wrap(F.make_date(unwrap(value), unwrap(month), unwrap(day)))
    return wrap(F.to_date(unwrap(value)))


def time(hour, minute=None, second=None):
    """TimeFromHMS (temporal.py:240) — string repr (no Spark TimeType)."""
    if minute is None:
        return wrap(F.date_format(unwrap(hour), "HH:mm:ss"))
    return wrap(
        F.format_string("%02d:%02d:%02d", unwrap(hour), unwrap(minute), unwrap(second))
    )


def timestamp(value, *rest):
    """ibis.timestamp: from string or Y,M,D,h,m,s components
    (TimestampFromYMDHMS temporal.py:252).

    The reference's timezone-less Timestamp maps to TimestampNTZ, so
    components build via make_timestamp_ntz — wall-clock construction that
    is independent of the session/JVM timezone (make_timestamp would
    interpret the components in a zone)."""
    if rest:
        y, mo, d, h, mi, s = (unwrap(x) for x in (value, *rest))
        return wrap(F.make_timestamp_ntz(y, mo, d, h, mi, s))
    return wrap(F.to_timestamp_ntz(unwrap(value)))


def timestamp_from_unix(value, unit="s"):
    """TimestampFromUNIX (temporal.py:267), unit-scaled (PC:205-216).

    Built as TimestampNTZ holding the UTC wall time via tz-free interval
    arithmetic (epoch + make_dt_interval with exact decimal seconds) —
    ``timestamp_seconds`` would yield a zoned TimestampType whose
    collected value depends on the session timezone."""
    c = unwrap(value)
    scale = {"s": 1, "ms": 1_000, "us": 1_000_000}.get(unit)
    if scale is None:
        raise ValueError(f"unsupported unix timestamp unit {unit!r}")
    secs = c.cast("decimal(25,6)") / F.lit(scale)
    epoch = F.expr("CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)")
    zero = F.lit(0)
    return wrap(epoch + F.call_function("make_dt_interval", zero, zero, zero, secs))


def interval(value=None, unit="s", **kwargs):
    """ibis.interval → Spark interval literal
    (IntervalFromInteger temporal.py:422; PC:177-181)."""
    if value is None:
        if len(kwargs) != 1:
            raise ValueError("interval() takes exactly one unit kwarg")
        (unit, value), = kwargs.items()
    part = _INTERVAL_UNITS.get(unit)
    if part is None:
        raise ValueError(f"unsupported interval unit {unit!r}")
    if not isinstance(value, int):
        raise TypeError("interval value must be a Python int literal")
    # record the spec string in _lit so ibis.watermark() can recover the
    # Spark delay string from an interval literal
    return wrap(F.expr(f"INTERVAL '{value}' {part}"), lit=f"{value} {part.lower()}")


def integer_range(start, stop=None, step=1):
    """IntegerRange (arrays.py:258) → F.sequence, empty on bad step
    (PC:320-340)."""
    if stop is None:
        start, stop = 0, start
    s, e, st = unwrap(start), unwrap(stop), unwrap(step)
    # half-open [start, stop); empty array on zero/overshooting step
    step_sign = F.signum(st.cast("double")).cast("int")
    end_incl = (e - step_sign).cast("long")
    out = F.when(
        (st != 0) & (((e - s) * st) > 0),
        F.sequence(s.cast("long"), end_incl, st.cast("long")),
    ).otherwise(F.array().cast("array<bigint>"))
    return wrap(out)


def timestamp_range(start, stop, step):
    """TimestampRange (arrays.py:267): half-open sequence of timestamps;
    ``step`` is an interval Column (from :func:`interval`)."""
    s, e, st = unwrap(start), unwrap(stop), unwrap(step)
    out = F.when(
        e > s,
        F.filter(F.sequence(s, e, st), lambda x: x < e),
    ).otherwise(F.array().cast("array<timestamp>"))
    return wrap(out)
