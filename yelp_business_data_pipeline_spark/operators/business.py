"""Business-domain ETL.

Re-expresses reference ``ETL-script/Business_ETL.py`` as one lazy DataFrame
chain (the reference interleaves ``display`` actions that re-execute the
prefix; SURVEY.md §3). Output schema and semantics reproduced exactly:

- drop ``address`` (ref :61); require ``categories``/``hours`` non-null
  (ref :62-63); keep only ``is_open == 1`` (ref :64), then drop ``is_open``.
- 14 attribute flags cast string->boolean with the REFERENCE'S column names
  (ref :82-95): ``accepts_insurance`` and ``accepts_credit_cards`` carry no
  ``_flag`` suffix; ``BusinessAcceptsBitcoin`` becomes
  ``bitcoin_accepted_flag``. Yelp encodes values as Python-literal strings
  ("True"/"False"/"None"); the reference's Spark 3 cast returned null for
  "None", so under Spark 4's default ANSI mode this engine uses try_cast to
  preserve that null-on-invalid behavior.
- ``noise_level``: unwrap ``u'average'`` -> ``average`` via regexp + lower
  (ref :96); ``wifi`` is a RAW passthrough of ``attributes.WiFi`` (ref :97
  applies no unwrapping); ``price_range`` int cast (ref :98).
- ``Ambience``/``BusinessParking`` JSON-strings are parsed with from_json
  and then DROPPED (ref :80-81,148) — the reference never flattens them
  into output columns, so neither does the default here; the typed
  flattening is available as the :func:`flatten_attribute_structs`
  extension for pipelines that want it.
- hours features with overnight wrap (ref :107-139) via functions.hours.
  NOTE a reference bug reproduced-as-intended: ref :135 builds ``days_open``
  with ``reduce(lambda a, b: ..., hrs_cols)`` and no initializer, so the
  first element (the string ``"Monday_hrs"``) is coerced to a numeric lit
  -> NULL, making days_open NULL for every row and never counting Monday.
  This engine computes the documented intent (count of days with > 0
  hours) — same repaired-intent policy as the two broken reference tests
  (SURVEY.md §5).
- one output row per (business, category): trim -> split -> explode -> trim
  (ref :65,144-150). Grain documented: joins multiply by category count.
- flat output schema: no struct/array columns survive
  (ref README.md:160-162; test_cases/business.py:17-20).

Scale: a single Project/Filter chain over the scan — no shuffle until the
sink; the explode fan-out happens after column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hours import hours_features
from ..schemas import AMBIENCE_SCHEMA, PARKING_SCHEMA

#: attribute field -> output column, exactly as the reference names them
#: (Business_ETL.py:82-95).
BOOL_ATTR_COLUMNS: dict[str, str] = {
    "AcceptsInsurance": "accepts_insurance",
    "BusinessAcceptsCreditCards": "accepts_credit_cards",
    "BikeParking": "bike_parking_flag",
    "BusinessAcceptsBitcoin": "bitcoin_accepted_flag",
    "ByAppointmentOnly": "by_appointment_only_flag",
    "Caters": "caters_flag",
    "CoatCheck": "coat_check_flag",
    "Corkage": "corkage_flag",
    "DriveThru": "drive_thru_flag",
    "DogsAllowed": "dogs_allowed_flag",
    "GoodForDancing": "good_for_dancing_flag",
    "GoodForKids": "good_for_kids_flag",
    "HappyHour": "happy_hour_flag",
    "HasTV": "has_tv_flag",
}


def flatten_attributes(df: DataFrame, attrs_col: str = "attributes") -> DataFrame:
    """Attribute struct -> the reference's flat typed columns
    (``Business_ETL.py:82-98``)."""
    a = F.col(attrs_col)
    new_cols: dict[str, F.Column] = {}
    for field, out in BOOL_ATTR_COLUMNS.items():
        new_cols[out] = a.getField(field).try_cast("boolean")
    new_cols["noise_level"] = F.lower(F.regexp_extract(a.getField("NoiseLevel"), r"'([^']+)'", 1))
    new_cols["wifi"] = a.getField("WiFi")
    new_cols["price_range"] = a.getField("RestaurantsPriceRange2").try_cast("int")
    return df.withColumns(new_cols)


def flatten_attribute_structs(df: DataFrame, attrs_col: str = "attributes") -> DataFrame:
    """EXTENSION (not reference output): flatten the doubly-encoded
    ``Ambience``/``BusinessParking`` JSON-strings into typed boolean columns
    (``ambience_*``, ``parking_*``). The reference parses these with
    from_json (Business_ETL.py:80-81) but drops the parsed structs (:148);
    this keeps the useful signal for pipelines that want it."""
    a = F.col(attrs_col)
    ambience = F.from_json(a.getField("Ambience"), AMBIENCE_SCHEMA)
    parking = F.from_json(a.getField("BusinessParking"), PARKING_SCHEMA)
    new_cols: dict[str, F.Column] = {}
    for f_ in AMBIENCE_SCHEMA.fieldNames():
        new_cols[f"ambience_{f_}"] = ambience.getField(f_).try_cast("boolean")
    for f_ in PARKING_SCHEMA.fieldNames():
        new_cols[f"parking_{f_}"] = parking.getField(f_).try_cast("boolean")
    return df.withColumns(new_cols)


def business_etl(raw: DataFrame, include_attribute_structs: bool = False) -> DataFrame:
    """Raw business JSON DataFrame -> cleaned flat (business x category) table.

    ``include_attribute_structs=True`` additionally flattens Ambience/
    BusinessParking (extension; default output matches the reference schema).
    """
    df = (
        # null business_id drop: stated in README.md:167 and asserted by
        # test_cases/business.py:6 but absent from the notebook code — the
        # engine enforces the documented rule (same policy as review F4).
        raw.filter(F.col("business_id").isNotNull())
        .drop("address")
        .filter(F.col("categories").isNotNull())
        .filter(F.col("hours").isNotNull())
        .filter(F.col("is_open") == 1)
        .withColumn("categories_array", F.split(F.trim(F.col("categories")), r",\s*"))
    )
    df = flatten_attributes(df)
    if include_attribute_structs:
        df = flatten_attribute_structs(df)
    df = hours_features(df)
    # Final cleanup (ref :144-149): corkage_flag is computed then dropped.
    df = (
        df.withColumn("business_id", F.trim(F.col("business_id")))
        .withColumn("category", F.explode(F.col("categories_array")))
        .withColumn("category", F.trim(F.col("category")))
        .drop("categories", "categories_array", "corkage_flag", "is_open", "hours", "attributes")
    )
    return df
