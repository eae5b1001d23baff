"""Scalar function surface (SURVEY §2.6) — every reference helper as a
Catalyst column expression; zero Python UDFs by design (SURVEY §2.8)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BotUtils.java:44-54
INDIAN_STATES = (
    "Delhi", "Jammu and Kashmir", "Himachal Pradesh", "Chandigarh",
    "Haryana", "Punjab", "Rajasthan", "Ladakh",
    "Chhattisgarh", "Madhya Pradesh", "Uttar Pradesh", "Uttarakhand",
    "Bihar", "Jharkhand", "Odisha", "West Bengal",
    "Arunachal Pradesh", "Assam", "Manipur", "Meghalaya",
    "Mizoram", "Nagaland", "Tripura", "Sikkim",
    "Goa", "Gujarat", "Maharashtra", "Dadra and Nagar Haveli", "Daman and Diu",
    "Andhra Pradesh", "Karnataka", "Kerala", "Puducherry",
    "Tamil Nadu", "Telangana", "Andaman and Nicobar Islands", "Lakshadweep",
    "State Unassigned",
)


def best_news_source(source1: Column, source2: Column, source3: Column) -> Column:
    """First non-empty of source3 > source2 > source1 (P8,
    ``Covid19PatientAnalyzer.java:112-123``)."""
    return F.coalesce(
        F.nullif(source3, F.lit("")),
        F.nullif(source2, F.lit("")),
        F.nullif(source1, F.lit("")),
    )


def is_within_past_week(date_str: Column, today: Column | None = None) -> Column:
    """``dateannounced`` (dd/MM/yyyy) within the past week (P2,
    ``Covid19PatientAnalyzer.java:101-110``). Boundary semantics from
    ``UtilTests.java:11-20``: exactly 6 days ago is IN range.

    The reference evaluates "today" in Asia/Kolkata; pass ``today``
    explicitly (e.g. ``F.current_date()`` under a session configured with
    ``spark.sql.session.timeZone=Asia/Kolkata``) — SURVEY §7.5.6 says never
    rely on the session default silently.
    """
    today = F.current_date() if today is None else today
    d = F.to_date(date_str, "dd/MM/yyyy")
    return d.between(F.date_sub(today, 6), today)
