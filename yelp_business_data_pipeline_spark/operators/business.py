"""Business-domain ETL.

Re-expresses reference ``ETL-script/Business_ETL.py`` as one lazy DataFrame
chain (the reference interleaves ``display`` actions that re-execute the
prefix; SURVEY.md §3). Semantics reproduced exactly:

- drop ``address`` (ref :61); require ``categories``/``hours`` non-null
  (ref :62-63); keep only ``is_open == 1`` (ref :64), then drop ``is_open``.
- flatten 14 attribute flags to booleans via string cast (ref :82-95) —
  Yelp encodes them as Python-literal strings ``"True"``/``"False"``.
- ``noise_level``: unwrap ``u'average'`` -> ``average`` via regexp + lower
  (ref :96); ``wifi`` (ref :97); ``price_range`` int cast (ref :98).
- parse doubly-encoded JSON-string ``Ambience``/``BusinessParking`` with
  ``from_json`` into typed structs (ref :72-81), surfaced as boolean flags.
- hours features with overnight wrap (ref :107-139) via functions.hours.
- one output row per (business, category): split + explode + trim
  (ref :65,144-150). Output grain documented: joins against this table
  multiply by category count.
- flat output schema: no struct/array columns survive
  (ref README.md:160-162; test_cases/business.py:17-20).

Scale: everything is a single Project/Filter chain over the scan — no
shuffle at all until the sink; the explode fan-out happens after column
pruning so the shuffle-free pipeline carries only kept columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hours import hours_features
from ..schemas import AMBIENCE_SCHEMA, BUSINESS_BOOL_ATTRS, PARKING_SCHEMA


def _snake(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and not name[i - 1].isupper():
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def flatten_attributes(df: DataFrame, attrs_col: str = "attributes") -> DataFrame:
    """Attribute struct -> flat typed columns (ref ``Business_ETL.py:72-101``)."""
    a = F.col(attrs_col)
    new_cols: dict[str, F.Column] = {}
    for field in BUSINESS_BOOL_ATTRS:
        new_cols[f"{_snake(field)}_flag"] = a.getField(field).cast("boolean")
    new_cols["noise_level"] = F.lower(F.regexp_extract(a.getField("NoiseLevel"), r"'([^']+)'", 1))
    new_cols["wifi"] = F.lower(F.regexp_extract(a.getField("WiFi"), r"'([^']+)'", 1))
    new_cols["price_range"] = a.getField("RestaurantsPriceRange2").cast("int")

    ambience = F.from_json(a.getField("Ambience"), AMBIENCE_SCHEMA)
    parking = F.from_json(a.getField("BusinessParking"), PARKING_SCHEMA)
    for f_ in AMBIENCE_SCHEMA.fieldNames():
        new_cols[f"ambience_{f_}"] = ambience.getField(f_).cast("boolean")
    for f_ in PARKING_SCHEMA.fieldNames():
        new_cols[f"parking_{f_}"] = parking.getField(f_).cast("boolean")
    return df.withColumns(new_cols)


def business_etl(raw: DataFrame) -> DataFrame:
    """Raw business JSON DataFrame -> cleaned flat (business x category) table."""
    df = (
        raw.drop("address", "postal_code")
        .filter(F.col("categories").isNotNull())
        .filter(F.col("hours").isNotNull())
        .filter(F.col("is_open") == 1)
    )
    df = flatten_attributes(df)
    df = hours_features(df)
    # The reference drops corkage_flag from the final table (ref :148-149).
    df = df.drop("attributes", "hours", "is_open", "corkage_flag")
    df = (
        df.withColumn("business_id", F.trim(F.col("business_id")))
        .withColumn("category", F.explode(F.split(F.col("categories"), r",\s*")))
        .withColumn("category", F.trim(F.col("category")))
        .drop("categories")
    )
    return df
