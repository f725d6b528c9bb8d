"""Explicit schemas.

The reference relies on ``spark.read.json`` inference (reference
``ETL-script/Business_ETL.py:53``, ``Review_ETL.py:51``, ``User_ETL.py:50``).
At 100 TB, inference means an extra sampling scan and schema drift between
batches, so this engine pins explicit ``StructType`` schemas derived from
every field access in the reference (see ``FIXTURES.md``); inference remains
available as a dev-mode fallback in ``sources.readers``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Yelp raw JSON-lines schemas
# ---------------------------------------------------------------------------

#: Boolean-flag attribute fields (reference Business_ETL.py:82-95). Values are
#: Python-literal strings: "True" / "False" / "None".
BUSINESS_BOOL_ATTRS: tuple[str, ...] = (
    "AcceptsInsurance",
    "BusinessAcceptsCreditCards",
    "BikeParking",
    "BusinessAcceptsBitcoin",
    "ByAppointmentOnly",
    "Caters",
    "CoatCheck",
    "Corkage",
    "DriveThru",
    "DogsAllowed",
    "GoodForDancing",
    "GoodForKids",
    "HappyHour",
    "HasTV",
)

#: Days in the reference's hand-unrolled hours handling (Business_ETL.py:109).
WEEKDAYS: tuple[str, ...] = (
    "Monday",
    "Tuesday",
    "Wednesday",
    "Thursday",
    "Friday",
    "Saturday",
    "Sunday",
)

#: Ambience JSON-string sub-schema (reference Business_ETL.py:72-77 parses
#: these doubly-encoded dict strings with from_json).
AMBIENCE_FIELDS: tuple[str, ...] = (
    "touristy",
    "hipster",
    "romantic",
    "divey",
    "intimate",
    "trendy",
    "upscale",
    "classy",
    "casual",
)

PARKING_FIELDS: tuple[str, ...] = ("garage", "street", "validated", "lot", "valet")


def _string_struct(fields: tuple[str, ...]) -> T.StructType:
    return T.StructType([T.StructField(f, T.StringType(), True) for f in fields])


AMBIENCE_SCHEMA = _string_struct(AMBIENCE_FIELDS)
PARKING_SCHEMA = _string_struct(PARKING_FIELDS)

ATTRIBUTES_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in BUSINESS_BOOL_ATTRS]
    + [
        T.StructField("NoiseLevel", T.StringType(), True),
        T.StructField("WiFi", T.StringType(), True),
        T.StructField("RestaurantsPriceRange2", T.StringType(), True),
        # Doubly-encoded JSON-string dicts, parsed later with from_json:
        T.StructField("Ambience", T.StringType(), True),
        T.StructField("BusinessParking", T.StringType(), True),
        # Present in raw data, dropped by the ETL (Business_ETL.py:99):
        T.StructField("Music", T.StringType(), True),
        T.StructField("RestaurantsCounterService", T.StringType(), True),
    ]
)

HOURS_SCHEMA = _string_struct(WEEKDAYS)

BUSINESS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("business_id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("postal_code", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("stars", T.DoubleType(), True),
        T.StructField("review_count", T.LongType(), True),
        T.StructField("is_open", T.LongType(), True),
        T.StructField("categories", T.StringType(), True),
        T.StructField("hours", HOURS_SCHEMA, True),
        T.StructField("attributes", ATTRIBUTES_SCHEMA, True),
    ]
)

REVIEW_RAW_SCHEMA = T.StructType(
    [
        T.StructField("review_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("business_id", T.StringType(), True),
        T.StructField("stars", T.DoubleType(), True),
        T.StructField("useful", T.LongType(), True),
        T.StructField("funny", T.LongType(), True),
        T.StructField("cool", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
    ]
)

#: compliment_* columns in raw user JSON; the ETL keeps only the KEEP subset
#: (reference User_ETL.py:72-74; README.md:181).
USER_COMPLIMENT_COLS: tuple[str, ...] = (
    "compliment_hot",
    "compliment_more",
    "compliment_profile",
    "compliment_cute",
    "compliment_list",
    "compliment_note",
    "compliment_plain",
    "compliment_cool",
    "compliment_funny",
    "compliment_writer",
    "compliment_photos",
)

USER_COMPLIMENT_KEEP: tuple[str, ...] = (
    "compliment_list",
    "compliment_writer",
    "compliment_note",
    "compliment_photos",
)

USER_RAW_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("review_count", T.LongType(), True),
        T.StructField("yelping_since", T.StringType(), True),
        T.StructField("useful", T.LongType(), True),
        T.StructField("funny", T.LongType(), True),
        T.StructField("cool", T.LongType(), True),
        T.StructField("fans", T.LongType(), True),
        T.StructField("elite", T.StringType(), True),
        T.StructField("friends", T.StringType(), True),
    ]
    + [T.StructField(c, T.LongType(), True) for c in USER_COMPLIMENT_COLS]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TPC-H-ish; see TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
