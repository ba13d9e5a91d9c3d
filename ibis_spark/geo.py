"""Geospatial operations — the subset Spark 4.1 core supports.

The reference exposes ~60 PostGIS-style ops (ibis/expr/operations/
geospatial.py:28-497). Core Spark ships exactly five ST functions (WKB
ingestion/serialization and SRID handling — `SHOW FUNCTIONS` probe:
st_geomfromwkb, st_geogfromwkb, st_asbinary, st_srid, st_setsrid); the
analytical surface (distance/contains/buffer/…) requires Apache Sedona,
which is not in this environment. Per SURVEY.md §2.17 the rest is
deferred; these wrappers cover ingestion/round-trip so geometry columns
can at least be carried, repartitioned, and re-serialized at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibis_spark.expr.core import unwrap, wrap

__all__ = ["geom_from_wkb", "geog_from_wkb", "as_binary", "srid", "set_srid"]


def _enable():
    """Geospatial expressions are behind a feature flag in Spark 4.1
    (runtime-settable)."""
    from pyspark.sql import SparkSession

    session = SparkSession.getActiveSession()
    if session is not None:
        session.conf.set("spark.sql.geospatial.enabled", "true")


def geom_from_wkb(col):
    """Parse WKB bytes into a GEOMETRY value (reference GeomFromWKB-style
    ingestion)."""
    _enable()
    return wrap(F.call_function("st_geomfromwkb", unwrap(col)))


def geog_from_wkb(col):
    _enable()
    return wrap(F.call_function("st_geogfromwkb", unwrap(col)))


def as_binary(col):
    """Serialize a GEOMETRY/GEOGRAPHY back to WKB bytes."""
    _enable()
    return wrap(F.call_function("st_asbinary", unwrap(col)))


def srid(col):
    _enable()
    return wrap(F.call_function("st_srid", unwrap(col)))


def set_srid(col, srid_value: int):
    _enable()
    return wrap(F.call_function("st_setsrid", unwrap(col), F.lit(srid_value)))
